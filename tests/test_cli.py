"""End-to-end CLI smoke: train -> resume -> eval -> demo on synthetic data.

Locks the user-facing entry-point surface (reference multi_train.py /
multi_eval.py / multi_demo.py call patterns) and the checkpoint/resume
contract on the CPU mesh.
"""

import glob
import os

import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("cli")


NET = ["--network", "resnet-18_multi", "--data-shape", "3,128,256",
       "--num-classes", "8"]
DEV = ["--num-devices", "2"]  # 8 virtual CPU devices; batch 2 must divide


def test_train_writes_checkpoint(workdir):
    from dspnet_tpu.cli import multi_train

    multi_train.main(NET + DEV + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "1", "--eval-every", "0",
        "--model-dir", str(workdir / "model"), "--seg-normalize", "valid",
        "--log-every", "1",
    ])
    ckpts = glob.glob(str(workdir / "model" / "*"))
    assert ckpts, "no checkpoint written"


def test_resume_continues(workdir):
    from dspnet_tpu.cli import multi_train

    multi_train.main(NET + DEV + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "2", "--resume", "0", "--eval-every", "0",
        "--model-dir", str(workdir / "model"), "--seg-normalize", "valid",
    ])


def test_eval_cli(workdir):
    from dspnet_tpu.cli import multi_eval

    res = multi_eval.main(NET + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--model-dir", str(workdir / "model"),
    ])
    for key in ("mAP", "mIoU", "accuracy", "ms_per_batch"):
        assert key in res, f"missing metric {key}"


def test_demo_cli(workdir):
    from dspnet_tpu.cli import multi_demo

    img = sorted(glob.glob(str(workdir / "synth" / "train" / "JPEGImages" / "*.jpg")))[0]
    out_dir = str(workdir / "demo_out")
    multi_demo.main(NET + [
        "--images", img, "--model-dir", str(workdir / "model"),
        "--out-dir", out_dir, "--vis-thresh", "0.01",
    ])
    assert glob.glob(os.path.join(out_dir, "*")), "demo wrote no output"


def test_eval_cli_device_loader(workdir):
    from dspnet_tpu.cli import multi_eval

    res = multi_eval.main(NET + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--model-dir", str(workdir / "model"), "--loader", "device",
    ])
    assert "ms_per_batch" in res


def test_train_spatial_mesh(workdir):
    """--model-parallel 2: 2x2 mesh (dp x spatial width partitioning)."""
    from dspnet_tpu.cli import multi_train

    multi_train.main(NET + [
        "--num-devices", "4", "--model-parallel", "2",
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "1", "--eval-every", "0",
        "--model-dir", str(workdir / "model_sp"), "--seg-normalize", "valid",
    ])


@pytest.mark.parametrize("task_net", ["resnet-18_det", "resnet-18_seg"])
def test_train_single_task(workdir, task_net):
    """det-only / seg-only training paths (reference det_solver/seg_solver)."""
    from dspnet_tpu.cli import multi_train

    multi_train.main([
        "--network", task_net, "--data-shape", "3,128,256",
        "--num-classes", "8", "--num-devices", "2",
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "1", "--eval-every", "1",
        "--model-dir", str(workdir / f"model_{task_net}"),
        "--seg-normalize", "valid",
    ])


def test_checkpoint_every(workdir):
    # --checkpoint-every N skips intermediate epochs but always saves the last
    from dspnet_tpu.cli import multi_train

    mdir = str(workdir / "model_ckpt_every")
    multi_train.main(NET + DEV + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "3", "--eval-every", "0", "--checkpoint-every", "2",
        "--model-dir", mdir, "--seg-normalize", "valid",
    ])
    steps = sorted(
        int(os.path.basename(p))
        for p in glob.glob(os.path.join(mdir, "multitask_*", "[0-9]*"))
        if os.path.basename(p).isdigit()
    )
    assert steps == [1, 2], steps  # epoch 1 (every-2) + final epoch 2


def test_monitor_flag(workdir, caplog):
    """--monitor/--pattern logs param stats every N batches (reference
    mx.mon.Monitor surface, multi_train.py:76-79,379)."""
    import logging

    from dspnet_tpu.cli import multi_train

    with caplog.at_level(logging.INFO):
        multi_train.main(NET + DEV + [
            "--batch-size", "2", "--synthetic", "4",
            "--synthetic-dir", str(workdir / "synth"),
            "--end-epoch", "1", "--eval-every", "0",
            "--model-dir", str(workdir / "model_mon"),
            "--seg-normalize", "valid",
            "--monitor", "1", "--pattern", r"backbone/conv0",
        ])
    lines = [r.message for r in caplog.records if r.message.startswith("monitor ")]
    assert lines and all("backbone/conv0" in l for l in lines)
    assert any("mean=" in l and "shape=" in l for l in lines)


def test_metrics_jsonl(workdir):
    import json

    from dspnet_tpu.cli import multi_train

    path = str(workdir / "metrics.jsonl")
    multi_train.main(NET + DEV + [
        "--batch-size", "2", "--synthetic", "4",
        "--synthetic-dir", str(workdir / "synth"),
        "--end-epoch", "1", "--eval-every", "1",
        "--model-dir", str(workdir / "model_mj"), "--seg-normalize", "valid",
        "--metrics-jsonl", path,
    ])
    rows = [json.loads(l) for l in open(path)]
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val"}
    tr = next(r for r in rows if r["split"] == "train")
    assert tr["epoch"] == 0 and "loss" in tr
    va = next(r for r in rows if r["split"] == "val")
    assert "mAP" in va and "ms_per_batch" in va
