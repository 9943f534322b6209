#!/usr/bin/env bash
# Round-3 TPU work queue — run when the axon tunnel is back.
# STATUS: fully drained 2026-08-18/19. Benches + profile + grad-accum
# smoke + async-ckpt measurements are in PARITY.md/CLAUDE.md; the
# 19-class convergence run completed (docs/CONVERGENCE_r3.md). Kept as
# the template for future hardware-session queues.
# Sequential (the chip serves one heavy process well); each stage logs to
# $LOGDIR and failures don't block later stages. The long convergence run
# goes LAST so the quick evidence lands first.
#
# Usage: scripts/tpu_session_r3.sh [logdir]
set -u
LOGDIR=${1:-/tmp/tpu_r3}
mkdir -p "$LOGDIR"
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ)) ==="
  timeout "$to" "$@" > "$LOGDIR/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "$LOGDIR/$name.log"
}

# 1. bench evidence (VERDICT item 1): default (seg_fast), reference-exact,
#    train. Cold exact lowering on axon ~8.6 min -> generous timeouts.
run bench_default 1800 python bench.py
run bench_exact 2400 env BENCH_SEG_EXACT=1 python bench.py
run bench_train 1800 env BENCH_TRAIN=1 python bench.py

# 2. roofline / MFU re-profile (item 2)
run profile_train 1800 python scripts/profile_train.py

# 3. phase_conv A/B ran 2026-08-18: DELETED the variant (train 55.7 vs
#    54.2 ms, inference within noise) — see models/layers.py Deconv2x.

# 4. int8 feasibility probe (item 8)
run probe_int8 1800 python scripts/probe_int8.py

# 5. --grad-accum TPU smoke (r2 queue)
run grad_accum_smoke 1800 python -m dspnet_tpu.cli.multi_train \
  --network resnet-18_multi --data-shape 3,128,256 --batch-size 2 \
  --grad-accum 2 --synthetic 6 --end-epoch 2 --model-dir /tmp/m_ga \
  --seg-normalize valid

# 6. async-checkpoint stall measurement: canonical state, per-epoch saves
run ckpt_async 1800 python - <<'EOF'
import time, jax, jax.numpy as jnp
from dspnet_tpu.api import create_model
from dspnet_tpu.train.solver import MultiTaskSolver
from dspnet_tpu.utils.checkpoint import CheckpointManagerWrapper
b = create_model("resnet-50_multi", (512, 1024), num_classes=8)
s = MultiTaskSolver(b.model, b.anchors, compute_dtype="bfloat16", batch_size=4)
state = s.init_state(jax.random.PRNGKey(0), jnp.zeros((1, 512, 1024, 3)))
m = CheckpointManagerWrapper("/tmp/ck_async_r3")
t0 = time.perf_counter(); m.save(0, state, block=False)
print(f"async save returned in {time.perf_counter()-t0:.2f}s (target <1s)")
t0 = time.perf_counter(); m._join()
print(f"background write took {time.perf_counter()-t0:.1f}s")
t0 = time.perf_counter(); m.save(1, state, block=True)
print(f"sync save: {time.perf_counter()-t0:.1f}s")
m.close()
EOF

echo "=== quick stages done; start the 19-class convergence run with:"
echo "  nohup scripts/run_resumable.sh --network resnet-50_multi \\"
echo "    --data-shape 3,512,1024 --batch-size 16 --synthetic 512 \\"
echo "    --synthetic-val 48 --synthetic-dir /tmp/dspnet_synth19 \\"
echo "    --end-epoch 200 --compute-dtype bfloat16 --model-dir /tmp/conv19 \\"
echo "    --checkpoint-every 10 --eval-every 10 --lr 0.002 --seg-normalize valid \\"
echo "    --metrics-jsonl /tmp/conv19_metrics.jsonl \\"
echo "    --loader native --native-u8 > $LOGDIR/conv19.log 2>&1 &"
