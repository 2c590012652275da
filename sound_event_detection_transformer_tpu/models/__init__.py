"""Model zoo: SEDT, SP-SEDT, audio-tag backbone (reference sedt/__init__.py:8-63)."""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn

from ..config import SEDTConfig
from .criterion import (
    DenseTargets,
    build_weight_dict,
    empty_targets,
    set_criterion,
    total_loss,
)
from .postprocess import PostProcessResult, postprocess
from .resnet import AudioTagBackbone, ResNetBackbone, num_backbone_channels
from .sedt import MLP, SEDT, SPSEDT
from .transformer import Transformer, block_diagonal_bias

__all__ = [
    "SEDT",
    "SPSEDT",
    "MLP",
    "AudioTagBackbone",
    "ResNetBackbone",
    "Transformer",
    "DenseTargets",
    "empty_targets",
    "set_criterion",
    "total_loss",
    "build_weight_dict",
    "postprocess",
    "PostProcessResult",
    "build_model",
    "num_backbone_channels",
    "block_diagonal_bias",
]


def build_model(cfg: SEDTConfig) -> Tuple[nn.Module, Dict[str, float]]:
    """(model module, loss-weight dict).  For self_sup configs the model is
    SP-SEDT with num_classes=1 (reference sedt/__init__.py:9-26)."""
    mcfg = cfg.model
    if mcfg.self_sup:
        import dataclasses

        mcfg = dataclasses.replace(mcfg, num_classes=1, dec_at=False)
        model = SPSEDT(mcfg)
    else:
        model = SEDT(mcfg)
    weight_dict = build_weight_dict(mcfg, cfg.loss)
    return model, weight_dict
