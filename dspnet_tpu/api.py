"""High-level construction API (the factory entry points users call).

Mirrors the reference's `get_{det,seg,multi}_symbol[_train](network,
data_shape, ...)` factory surface (symbol/multitask_symbol_factory.py:104-224)
with one function: ``create_model`` resolves a network name like
'resnet-50_multi' (the suffix dispatch of multi_train.py:309-317) into a
ready bundle of module + anchors + config.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from dspnet_tpu.models import factory
from dspnet_tpu.models.dspnet import DSPNet, SSDNet


@dataclasses.dataclass
class ModelBundle:
    name: str
    task: str  # det | seg | multi | ssd
    model: object  # flax module
    cfg: factory.NetConfig
    anchors: Optional[np.ndarray]  # (A, 4) or None for seg-only
    data_shape: Tuple[int, int]
    num_classes: int

    @property
    def num_anchors(self) -> int:
        return 0 if self.anchors is None else self.anchors.shape[0]


def parse_network_name(name: str) -> Tuple[str, str]:
    """'resnet-50_multi' -> ('resnet-50', 'multi'); no suffix -> 'ssd'.

    Legacy names (reference symbol/legacy_vgg16_ssd_{300,512}.py, reachable
    via the factory's `legacy*` bypass, multitask_symbol_factory.py:116-118)
    get their own factory config: at 300 it equals the vgg16_reduced preset
    layer-for-layer; at 512 the last extra layer is the legacy 4x4 conv
    (1x1 anchor grid), which the preset does not reproduce."""
    if name.startswith("legacy_vgg16_ssd"):
        return "legacy_vgg16_ssd", "ssd"
    for suffix in ("_det", "_seg", "_multi"):
        if name.endswith(suffix):
            return name[: -len(suffix)], suffix[1:]
    return name, "ssd"


def create_model(
    network: str,
    data_shape,
    num_classes: int = 8,
    seg_classes: int = 19,
    remat: bool = False,
    seg_fast: bool = False,
) -> ModelBundle:
    """Build a model bundle.

    Args:
      network: e.g. 'resnet-50_multi', 'resnet-18_det', 'resnet-50_seg',
        'vgg16_reduced' (plain SSD), 'inceptionv3'.
      data_shape: (H, W) input resolution (int means square).
    """
    if isinstance(data_shape, int):
        data_shape = (data_shape, data_shape)
    data_shape = (int(data_shape[0]), int(data_shape[1]))
    base, task = parse_network_name(network)
    if task in ("seg", "multi"):
        # the seg head emits 2*(H//8) logits vs H//4 labels; they only agree
        # when both dims divide by 8 (the reference hardcodes /8-divisible
        # grids, multitask_symbol_builder.py:574-575)
        assert data_shape[0] % 8 == 0 and data_shape[1] % 8 == 0, (
            f"seg/multi tasks need data shapes divisible by 8, got {data_shape}")
    cfg = factory.get_config(base, data_shape[0])
    if task == "ssd":
        model = SSDNet(cfg=cfg, num_classes=num_classes, remat=remat)
        anchors = factory.build_anchors(cfg, data_shape)
    else:
        model = DSPNet(cfg=cfg, num_classes=num_classes, seg_classes=seg_classes,
                       task=task, remat=remat, seg_fast=seg_fast)
        anchors = (
            factory.build_anchors(cfg.drop_first_tap(), data_shape) if task != "seg" else None
        )
    return ModelBundle(
        name=network,
        task=task,
        model=model,
        cfg=cfg,
        anchors=anchors,
        data_shape=data_shape,
        num_classes=num_classes,
    )
