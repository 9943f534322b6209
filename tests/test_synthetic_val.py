"""--synthetic-val: independent validation-set size for synthetic runs.

Epoch-scale convergence runs want a large train set but a small val set so
per-epoch eval stays cheap; resolve_dataset sizes the non-train split from
--synthetic-val when given (0 keeps the legacy same-size behavior)."""

import argparse


def _args(tmp_path, **kw):
    ns = argparse.Namespace(
        synthetic=6,
        synthetic_val=kw.get("synthetic_val", 0),
        synthetic_dir=str(tmp_path),
        data_shape=(64, 128),
        dataset_root="",
    )
    return ns


def test_val_split_sized_independently(tmp_path):
    from dspnet_tpu.cli.common import resolve_dataset

    args = _args(tmp_path, synthetic_val=2)
    train = resolve_dataset(args, "train")
    val = resolve_dataset(args, "val")
    assert len(train) == 6
    assert len(val) == 2


def test_val_split_defaults_to_train_size(tmp_path):
    from dspnet_tpu.cli.common import resolve_dataset

    args = _args(tmp_path)
    assert len(resolve_dataset(args, "train")) == 6
    assert len(resolve_dataset(args, "val")) == 6
