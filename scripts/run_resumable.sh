#!/usr/bin/env bash
# Auto-resuming training driver — failure recovery for long runs on flaky
# transports (remote-TPU tunnel drops, host OOM kills). Restarts
# multi_train with --resume 0 (restore latest checkpoint, or start fresh on
# an empty model dir) until it exits cleanly; each death costs at most the
# epochs since the last --checkpoint-every save.
#
# Usage: scripts/run_resumable.sh <multi_train args...>   # no --resume
#   MAX_RETRIES=20 (env) bounds restarts; a retry only counts when the run
#   dies within BACKOFF_RESET_S (it made no progress), so a run that
#   trained for hours before dropping restarts with a fresh budget.
set -u
max=${MAX_RETRIES:-20}
reset_s=${BACKOFF_RESET_S:-300}
tries=0

probe() {
  # a fresh process HANGS on backend init while the tunnel is down (it
  # doesn't error) — gate each attempt on a bounded device probe so a dead
  # transport parks us here instead of wedging a training process
  timeout "${PROBE_TIMEOUT_S:-180}" python -c \
    "import jax; jax.devices()" >/dev/null 2>&1
}

while true; do
  until probe; do
    echo "run_resumable: device backend unreachable; re-probing in 60s" >&2
    sleep 60
  done
  start=$(date +%s)
  python -m dspnet_tpu.cli.multi_train "$@" --resume 0 && exit 0
  dur=$(( $(date +%s) - start ))
  if [ "$dur" -ge "$reset_s" ]; then tries=0; else tries=$((tries + 1)); fi
  if [ "$tries" -ge "$max" ]; then
    echo "run_resumable: giving up after $max rapid failures" >&2
    exit 1
  fi
  echo "run_resumable: train exited nonzero after ${dur}s; retry $tries/$max in 30s" >&2
  sleep 30
done
