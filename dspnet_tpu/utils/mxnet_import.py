"""MXNet checkpoint import — read `.params` files without MXNet.

The reference trains/saves MXNet checkpoints (`prefix-epoch.params`,
multi_train.py:370); validating "within 0.5% of the reference" requires
loading those weights here. This module implements the dmlc NDArray-list
binary format reader and the name map from the reference's parameter names
(multi_init.py:74-158 / symbol names) to this framework's flax trees.

Format (mxnet src/ndarray/ndarray.cc NDArray::Save / MXNDArrayLoad):

    uint64 kMXAPINDArrayListMagic = 0x112
    uint64 reserved = 0
    uint64 ndarray_count
    per array:
        uint32 magic —
          0xF993fac8 (V1, "with int64_t TShape"): uint32 ndim + int64 dims
          0xF993fac9 (V2, "with storage type"):   int32 stype (0 = dense;
              sparse records carry aux payloads and are rejected), then
              uint32 ndim + int64 dims
          0xF993faca (V3, numpy shape semantics): same layout as V2
          anything else = legacy, where that word IS the ndim and the dims
              are uint32
        int32 dev_type, int32 dev_id
        int32 type_flag (0 f32, 1 f64, 2 f16, 3 u8, 4 i32, 5 i8, 6 i64)
        raw data bytes
    uint64 name_count
    per name: uint64 length + bytes (keys like "arg:conv0_weight",
              "aux:bn0_moving_mean")

A writer for the same format is included so the reader is round-trip tested
in CI; real-checkpoint validation needs an actual MXNet file.
"""

from __future__ import annotations

import re
import struct
from typing import Dict, Tuple

import numpy as np

_LIST_MAGIC = 0x112
_V1_MAGIC = 0xF993FAC8
_V2_MAGIC = 0xF993FAC9
_V3_MAGIC = 0xF993FACA

_DTYPES = {0: np.float32, 1: np.float64, 2: np.float16, 3: np.uint8,
           4: np.int32, 5: np.int8, 6: np.int64}
_DTYPE_FLAGS = {np.dtype(v): k for k, v in _DTYPES.items()}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        out = struct.unpack_from(fmt, self.data, self.pos)
        self.pos += size
        return out if len(out) > 1 else out[0]

    def read_bytes(self, n: int) -> bytes:
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out


def _read_ndarray(r: _Reader) -> np.ndarray:
    magic = r.read("<I")
    dims64 = False
    if magic in (_V2_MAGIC, _V3_MAGIC):
        # V2+ carries an int32 storage type right after the magic;
        # kDefaultStorage == 0, sparse types carry aux payloads we can't
        # parse as dense
        stype = r.read("<i")
        assert stype == 0, f"sparse NDArray (stype {stype}) unsupported"
        dims64 = True
        ndim = r.read("<I")
    elif magic == _V1_MAGIC:
        dims64 = True  # V1 = "with int64_t TShape"
        ndim = r.read("<I")
    else:
        ndim = magic  # legacy: first word was the ndim, dims are uint32
    fmt = ("q" if dims64 else "I") * ndim
    if ndim == 0:
        shape = ()
    else:
        dims = r.read("<" + fmt)
        shape = (dims,) if ndim == 1 else tuple(dims)
    r.read("<ii")  # dev_type, dev_id
    type_flag = r.read("<i")
    dtype = _DTYPES[type_flag]
    count = int(np.prod(shape)) if shape else 0
    raw = r.read_bytes(count * np.dtype(dtype).itemsize)
    return np.frombuffer(raw, dtype=dtype).reshape(shape).copy()


def load_params(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Read a .params file -> (arg_params, aux_params) name->array dicts."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    magic = r.read("<Q")
    assert magic == _LIST_MAGIC, f"not an MXNet NDArray list (magic {magic:#x})"
    r.read("<Q")  # reserved
    n = r.read("<Q")
    arrays = [_read_ndarray(r) for _ in range(n)]
    n_names = r.read("<Q")
    names = []
    for _ in range(n_names):
        ln = r.read("<Q")
        names.append(r.read_bytes(ln).decode())
    assert len(names) == len(arrays)
    args, auxs = {}, {}
    for name, arr in zip(names, arrays):
        if name.startswith("arg:"):
            args[name[4:]] = arr
        elif name.startswith("aux:"):
            auxs[name[4:]] = arr
        else:
            args[name] = arr
    return args, auxs


def save_params(path: str, args: Dict[str, np.ndarray], auxs: Dict[str, np.ndarray] = None):
    """Write the same format (V2 dense records) — used for round-trip tests
    and for exporting weights back toward MXNet tooling."""
    auxs = auxs or {}
    items = [("arg:" + k, v) for k, v in args.items()] + [
        ("aux:" + k, v) for k, v in auxs.items()
    ]
    with open(path, "wb") as f:
        f.write(struct.pack("<QQ", _LIST_MAGIC, 0))
        f.write(struct.pack("<Q", len(items)))
        for _, arr in items:
            arr = np.ascontiguousarray(arr)
            f.write(struct.pack("<I", _V2_MAGIC))
            f.write(struct.pack("<i", 0))  # stype: kDefaultStorage
            f.write(struct.pack("<I", arr.ndim))
            f.write(struct.pack("<" + "q" * arr.ndim, *arr.shape))
            f.write(struct.pack("<ii", 1, 0))  # cpu(0)
            f.write(struct.pack("<i", _DTYPE_FLAGS[arr.dtype]))
            f.write(arr.tobytes())
        f.write(struct.pack("<Q", len(items)))
        for name, _ in items:
            b = name.encode()
            f.write(struct.pack("<Q", len(b)))
            f.write(b)


# ------------------------------------------------------------- name mapping


def _conv_kernel(arr: np.ndarray) -> np.ndarray:
    """MXNet OIHW conv weight -> flax HWIO."""
    return np.transpose(arr, (2, 3, 1, 0))


def map_resnet_backbone(args: Dict[str, np.ndarray], auxs: Dict[str, np.ndarray]):
    """Reference resnet param names -> (params, batch_stats) trees for
    models/resnet.ResNet (subtree contents for 'backbone').

    Name contract (symbol/resnet.py): conv0, bn_data, bn0,
    stage{i}_unit{j}_{bn1,bn2,bn3,conv1,conv2,conv3,sc}.
    """
    params: Dict = {}
    stats: Dict = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf

    bn_rx = re.compile(r"^(?P<mod>bn_data|bn0|(stage\d+_unit\d+)_(bn\d))_(?P<p>gamma|beta)$")
    bnaux_rx = re.compile(
        r"^(?P<mod>bn_data|bn0|(stage\d+_unit\d+)_(bn\d))_moving_(?P<p>mean|var)$"
    )
    conv_rx = re.compile(r"^(?P<mod>conv0|(stage\d+_unit\d+)_(conv\d|sc))_weight$")

    def module_path(mod: str):
        if "_" in mod and mod.startswith("stage"):
            unit, sub = mod.rsplit("_", 1)
            return (unit, sub)
        return (mod,)

    for name, arr in args.items():
        m = bn_rx.match(name)
        if m:
            mod = module_path(m.group("mod"))
            p = m.group("p")
            # fix_gamma BNs (bn_data) have no scale param in our modules
            if p == "gamma" and m.group("mod") == "bn_data":
                continue
            put(params, mod + ("BatchNorm_0", "scale" if p == "gamma" else "bias"), arr)
            continue
        m = conv_rx.match(name)
        if m:
            put(params, module_path(m.group("mod")) + ("kernel",), _conv_kernel(arr))
            continue
    for name, arr in auxs.items():
        m = bnaux_rx.match(name)
        if m:
            mod = module_path(m.group("mod"))
            p = "mean" if m.group("p") == "mean" else "var"
            put(stats, mod + ("BatchNorm_0", p), arr)
    return params, stats
