"""MXNet .params reader round-trip + resnet name-map tests."""

import numpy as np
import pytest

from dspnet_tpu.utils.mxnet_import import (
    load_params,
    map_resnet_backbone,
    save_params,
)


def test_params_roundtrip(tmp_path, rng):
    args = {
        "conv0_weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "bn0_gamma": rng.randn(64).astype(np.float32),
        "fc_weight_f16": rng.randn(4, 4).astype(np.float16),
    }
    auxs = {"bn0_moving_mean": rng.randn(64).astype(np.float32)}
    p = str(tmp_path / "x.params")
    save_params(p, args, auxs)
    a2, x2 = load_params(p)
    assert set(a2) == set(args) and set(x2) == set(auxs)
    for k in args:
        np.testing.assert_array_equal(a2[k], args[k])
    np.testing.assert_array_equal(x2["bn0_moving_mean"], auxs["bn0_moving_mean"])


def _fake_resnet18_mxnet(rng):
    """Minimal subset of reference resnet-18 param names with OIHW shapes."""
    args, auxs = {}, {}
    args["conv0_weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    for bn, c in [("bn_data", 3), ("bn0", 64), ("stage1_unit1_bn1", 64)]:
        args[bn + "_gamma"] = rng.randn(c).astype(np.float32)
        args[bn + "_beta"] = rng.randn(c).astype(np.float32)
        auxs[bn + "_moving_mean"] = rng.randn(c).astype(np.float32)
        auxs[bn + "_moving_var"] = np.abs(rng.randn(c)).astype(np.float32)
    args["stage1_unit1_conv1_weight"] = rng.randn(64, 64, 3, 3).astype(np.float32)
    args["stage1_unit1_sc_weight"] = rng.randn(64, 64, 1, 1).astype(np.float32)
    return args, auxs


def test_map_resnet_backbone_into_model(rng):
    import jax
    import jax.numpy as jnp

    from dspnet_tpu.models.resnet import ResNet
    from dspnet_tpu.utils.transfer import merge_param_subtree

    args, auxs = _fake_resnet18_mxnet(rng)
    mapped_params, mapped_stats = map_resnet_backbone(args, auxs)

    m = ResNet(18)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=True)
    params = {"backbone": v["params"]}
    merged = merge_param_subtree(params, {"backbone": mapped_params})
    # conv kernel transposed OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["conv0"]["kernel"]),
        np.transpose(args["conv0_weight"], (2, 3, 1, 0)),
    )
    # BN affine mapped (fix_gamma bn_data keeps only beta)
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["bn_data"]["BatchNorm_0"]["bias"]),
        args["bn_data_beta"],
    )
    assert "scale" not in mapped_params["bn_data"]["BatchNorm_0"]
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["stage1_unit1"]["bn1"]["BatchNorm_0"]["scale"]),
        args["stage1_unit1_bn1_gamma"],
    )
    # untouched params keep their fresh values
    fresh = np.asarray(v["params"]["stage4_unit2"]["conv2"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(merged["backbone"]["stage4_unit2"]["conv2"]["kernel"]), fresh
    )
    # running stats mapped
    stats = {"backbone": v["batch_stats"]}
    merged_stats = merge_param_subtree(stats, {"backbone": mapped_stats})
    np.testing.assert_allclose(
        np.asarray(merged_stats["backbone"]["bn0"]["BatchNorm_0"]["var"]),
        auxs["bn0_moving_var"],
    )


def test_import_mxnet_cli(tmp_path, rng):
    """Synthetic .params -> Orbax checkpoint -> multi_eval restores it."""
    import glob

    from dspnet_tpu.tools import import_mxnet
    from dspnet_tpu.utils.mxnet_import import save_params

    # synthesize a resnet-18 backbone checkpoint with the reference names
    import jax
    import jax.numpy as jnp
    from dspnet_tpu.api import create_model

    bundle = create_model("resnet-18_multi", (128, 256), num_classes=8)
    v = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(7), jnp.zeros((1, 128, 256, 3)))
    # export just conv0 (enough to verify the merge path touches the tree)
    conv0 = np.asarray(v["params"]["backbone"]["conv0"]["kernel"])  # HWIO
    args_ = {"conv0_weight": np.transpose(conv0, (3, 2, 0, 1)) + 1.0}  # OIHW
    params_file = str(tmp_path / "ref-0000.params")
    save_params(params_file, args_, {})

    import_mxnet.main([
        "--params", params_file, "--network", "resnet-18_multi",
        "--data-shape", "3,128,256", "--model-dir", str(tmp_path / "model"),
        "--epoch", "0",
    ])
    assert glob.glob(str(tmp_path / "model" / "multitask_resnet-18_multi_128" / "*"))


def test_load_params_v1_and_legacy_layouts(tmp_path):
    """Lock the on-disk layout against hand-crafted bytes (independent of our
    writer): V1 = int64 dims; V2 = int32 stype then int64 dims; legacy =
    first word is ndim with uint32 dims (mxnet src/ndarray/ndarray.cc)."""
    import struct

    buf = struct.pack("<QQQ", 0x112, 0, 3)
    # V1 record: (2, 3) f32
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    buf += struct.pack("<I", 0xF993FAC8) + struct.pack("<I", 2)
    buf += struct.pack("<qq", 2, 3) + struct.pack("<iii", 1, 0, 0) + a.tobytes()
    # V2 record: stype 0, (4,) f32
    b = np.arange(4, dtype=np.float32)
    buf += struct.pack("<I", 0xF993FAC9) + struct.pack("<i", 0)
    buf += struct.pack("<I", 1) + struct.pack("<q", 4)
    buf += struct.pack("<iii", 1, 0, 0) + b.tobytes()
    # legacy record: first word = ndim 1, uint32 dims
    c = np.arange(5, dtype=np.float32)
    buf += struct.pack("<II", 1, 5) + struct.pack("<iii", 1, 0, 0) + c.tobytes()
    buf += struct.pack("<Q", 3)
    for name in (b"arg:w1", b"arg:w2", b"aux:m1"):
        buf += struct.pack("<Q", len(name)) + name
    p = tmp_path / "x.params"
    p.write_bytes(buf)
    from dspnet_tpu.utils import mxnet_import

    args, auxs = mxnet_import.load_params(str(p))
    np.testing.assert_array_equal(args["w1"], a)
    np.testing.assert_array_equal(args["w2"], b)
    np.testing.assert_array_equal(auxs["m1"], c)
