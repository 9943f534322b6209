"""Command-line entry points (parity with the reference's multi_train.py,
multi_eval.py, multi_demo.py at the repo root)."""
