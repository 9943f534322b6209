"""Estimate TRUE HBM traffic of a compiled step from its optimized HLO text
(VERDICT r4 item 1: XLA's cost-analysis "bytes accessed" counts
fusion-INTERNAL operand reads, so it overstates HBM traffic — 40 GB at a
wall time that 819 GB/s could not serve).

Counts, over the ENTRY computation only (fusions are single nodes there):

* one WRITE of every op's output buffer(s);
* one READ per operand occurrence (an operand consumed by k ops is read k
  times — conservative: same-buffer reads could hit in CMEM, and XLA may
  rematerialize instead).

Aliasing pseudo-ops (tuple, get-tuple-element, bitcast, parameter,
constant, after-all &c.) move no bytes and are skipped on the write side;
reads THROUGH them are attributed to the underlying buffer by treating
their output as zero-cost and counting the read at the consumer.

Usage: python scripts/hlo_bytes.py /tmp/step_b8.hlo
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8, "token": 0,
    "s4": 1, "u4": 1, "f8e4m3fn": 1, "f8e5m2": 1,
}

NO_TRAFFIC_OPS = {
    "tuple", "get-tuple-element", "bitcast", "parameter", "constant",
    "after-all", "iota",  # iota writes, but is usually fused; keep free
}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(type_str: str) -> int:
    """Bytes of 'bf16[8,256,512,64]{...}' or '(a, b, ...)' tuple types."""
    total = 0
    for m in SHAPE_RE.finditer(type_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(path: str):
    in_entry = False
    # op name -> (output bytes, opcode)
    ops = {}
    op_line = re.compile(
        r"^\s+(ROOT\s+)?%([\w.\-]+)\s*=\s*((?:\([^=]*?\)|[\w\[\],{}():#*\s]+?))\s+"
        r"([\w\-]+)\(")
    operand_re = re.compile(r"%([\w.\-]+)")

    reads = 0
    writes = 0
    uniq_read = {}  # operand name -> bytes (each buffer counted once)
    by_op = defaultdict(float)
    with open(path) as f:
        for line in f:
            if line.startswith("ENTRY"):
                in_entry = True
                continue
            if in_entry and line.startswith("}"):
                break
            if not in_entry:
                continue
            m = op_line.match(line)
            if not m:
                continue
            name, type_str, opcode = m.group(2), m.group(3), m.group(4)
            out_b = shape_bytes(type_str)
            ops[name] = (out_b, opcode)
            if opcode in NO_TRAFFIC_OPS:
                continue
            # async/copy start-done pairs: the start's output type bundles
            # (operands, results, scratch) and the done aliases the result —
            # count reads at the start, the result write at the done, and
            # skip the start's tuple "write" entirely
            if opcode.endswith("-start"):
                out_b = 0
            if not opcode.endswith("-start"):
                writes += out_b
                by_op[opcode] += out_b
            if opcode.endswith("-done"):
                continue  # operands alias the start's buffers: no new reads
            # operands: everything after the opcode's open paren up to the
            # first "), " boundary is close enough — conservative: count
            # every %ref whose producer we know, resolving aliases
            body = line[m.end():]
            body = body.split("metadata=")[0].split("backend_config=")[0]
            for o in operand_re.finditer(body):
                oname = o.group(1)
                if oname == name or oname not in ops:
                    continue
                ob, oop = ops[oname]
                reads += ob
                uniq_read[oname] = ob
                by_op[opcode] += ob

    total = reads + writes
    uniq = sum(uniq_read.values())
    print(f"entry-computation HBM traffic estimate: "
          f"{total / 1e9:.2f} GB (reads {reads / 1e9:.2f} + "
          f"writes {writes / 1e9:.2f})")
    print(f"lower bound (every buffer read once + written once): "
          f"{(uniq + writes) / 1e9:.2f} GB "
          f"(unique reads {uniq / 1e9:.2f})")
    print("\ntop opcodes by traffic:")
    for op, b in sorted(by_op.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {op:<28} {b / 1e9:7.2f} GB")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_b8.hlo")
