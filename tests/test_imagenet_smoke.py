"""End-to-end ImageNet-initialization smoke (VERDICT r3 weak #6).

The unit-level torchvision mapping is covered by tests/test_torch_import.py;
this exercises the full production seam: a torchvision-format ``resnet50``
``.pth`` on disk -> ``--imagenet_backbone`` -> weight surgery into the live
param/frozen trees -> one supervised train epoch + eval.  No pretrained
weights exist in this container, so the state_dict carries random values in
the exact torchvision schema (keys, shapes, dtypes) — the seam under test is
the mapping/merge/training plumbing, not the features.

Asserts the imported leaves actually land: the run must log the merged-leaf
report and train to a finite loss.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# torchvision resnet50: bottleneck blocks [3, 4, 6, 3], expansion 4
_LAYERS = {1: (3, 64, 256), 2: (4, 128, 512), 3: (6, 256, 1024), 4: (3, 512, 2048)}


def _bn(sd, prefix, c, rng):
    sd[f"{prefix}.weight"] = torch.tensor(rng.rand(c).astype(np.float32) + 0.5)
    sd[f"{prefix}.bias"] = torch.tensor(rng.randn(c).astype(np.float32) * 0.1)
    sd[f"{prefix}.running_mean"] = torch.tensor(
        rng.randn(c).astype(np.float32) * 0.1
    )
    sd[f"{prefix}.running_var"] = torch.tensor(
        rng.rand(c).astype(np.float32) + 0.5
    )


def make_random_resnet50_state_dict(seed=0):
    rng = np.random.RandomState(seed)
    conv = lambda o, i, k: torch.tensor(
        (rng.randn(o, i, k, k) * (2.0 / (i * k * k)) ** 0.5).astype(np.float32)
    )
    sd = {"conv1.weight": conv(64, 3, 7)}
    _bn(sd, "bn1", 64, rng)
    in_c = 64
    for li, (blocks, width, out_c) in _LAYERS.items():
        for b in range(blocks):
            p = f"layer{li}.{b}"
            sd[f"{p}.conv1.weight"] = conv(width, in_c if b == 0 else out_c, 1)
            _bn(sd, f"{p}.bn1", width, rng)
            sd[f"{p}.conv2.weight"] = conv(width, width, 3)
            _bn(sd, f"{p}.bn2", width, rng)
            sd[f"{p}.conv3.weight"] = conv(out_c, width, 1)
            _bn(sd, f"{p}.bn3", out_c, rng)
            if b == 0:
                sd[f"{p}.downsample.0.weight"] = conv(out_c, in_c, 1)
                _bn(sd, f"{p}.downsample.1", out_c, rng)
        in_c = out_c
    sd["fc.weight"] = torch.tensor(rng.randn(1000, 2048).astype(np.float32))
    sd["fc.bias"] = torch.tensor(rng.randn(1000).astype(np.float32))
    return sd


def test_merge_covers_backbone_tree():
    """Every conv kernel / FrozenBN stat of the live resnet50 tree must be
    replaced by the .pth (conv0 excluded by design — it is this framework's
    1->3 lifting conv, reference backbone.py:102 analogue)."""
    import jax

    from sound_event_detection_transformer_tpu.models.resnet import ResNetBackbone
    from sound_event_detection_transformer_tpu.models.torch_import import (
        torch_resnet_to_tree,
    )

    sd = make_random_resnet50_state_dict()
    t_params, t_frozen = torch_resnet_to_tree(sd)
    bb = ResNetBackbone(arch="resnet50")
    variables = bb.init(jax.random.PRNGKey(0), np.zeros((1, 32, 32, 1), np.float32))
    flat_p = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    missing = []
    for path, leaf in flat_p:
        keys = tuple(k.key for k in path)
        if keys[0] == "conv0":
            continue
        node = t_params
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                missing.append("/".join(keys))
                node = None
                break
            node = node[k]
        if node is not None and tuple(np.shape(node)) != tuple(np.shape(leaf)):
            missing.append("/".join(keys) + " (shape)")
    assert not missing, f"torchvision import misses params: {missing[:8]}"
    flat_f = jax.tree_util.tree_flatten_with_path(variables["frozen"])[0]
    missing_f = []
    for path, leaf in flat_f:
        keys = tuple(k.key for k in path)
        node = t_frozen
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                missing_f.append("/".join(keys))
                node = None
                break
            node = node[k]
        if node is not None and tuple(np.shape(node)) != tuple(np.shape(leaf)):
            missing_f.append("/".join(keys) + " (shape)")
    assert not missing_f, f"torchvision import misses frozen stats: {missing_f[:8]}"


@pytest.mark.slow
def test_imagenet_backbone_e2e(tmp_path):
    pth = tmp_path / "resnet50_random.pth"
    torch.save(make_random_resnet50_state_dict(), str(pth))

    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    env.update(PYTHONPATH="", JAX_PLATFORM_NAME="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "train_sedt.py"),
         "--dataname", "urbansed", "--synthetic_smoke", "--smoke_clips", "8",
         "--epochs", "1", "--batch_size", "4",
         "--enc_layers", "1", "--dec_layers", "1", "--backbone", "resnet50",
         "--dec_at", "--imagenet_backbone", str(pth),
         "--exp_root", str(tmp_path)],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "imagenet" in r.stdout.lower(), r.stdout[-2000:]
    loss = float(r.stdout.split("Epoch 0: loss", 1)[1].split()[0])
    assert np.isfinite(loss)
