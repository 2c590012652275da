"""ResNet backbones with frozen batch norm, NHWC / TPU-native.

Re-designs the reference backbone (/root/reference/sedt/backbone.py:17-141):
  * ``conv0``: a trainable 1x1 conv lifting the 1-channel spectrogram to the
    3-channel stem (backbone.py:102).
  * FrozenBatchNorm: affine+stats folded to a per-channel scale/offset
    (backbone.py:43-53); stored in the ``frozen`` variable collection so they
    are constants to the optimizer — the JAX analogue of torch buffers.
  * optional dilation in the last stage (replace stride with dilation,
    backbone.py:99), giving ~16x rather than ~32x time downsampling.
  * freeze policy (stem + layer1 frozen; conv0/layer2/3/4 trainable,
    backbone.py:61) is implemented in the optimizer mask
    (``parallel/optim.py``), not by mutating modules.

Layout is NHWC (TPU conv-native): input [B, T, F, 1]; output [B, T', F', C].
Weights can be imported from a torchvision ``resnet*.pth`` state_dict via
``models/torch_import.py`` to reproduce the reference's ImageNet init.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_EPS = 1e-5


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed statistics and affine parameters.

    Variables live in the ``frozen`` collection: (scale, bias, mean, var),
    matching the reference buffers (backbone.py:26-31).  Forward folds them
    into one multiply-add (backbone.py:43-53).
    """

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.variable(
            "frozen", "scale", lambda: jnp.ones((self.features,), jnp.float32)
        )
        bias = self.variable(
            "frozen", "bias", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        mean = self.variable(
            "frozen", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        var = self.variable(
            "frozen", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )
        w = scale.value * jnp.reciprocal(jnp.sqrt(var.value + BN_EPS))
        b = bias.value - mean.value * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


def _conv(
    features: int,
    kernel: int,
    stride: int = 1,
    dilation: int = 1,
    name: str = None,
    use_bias: bool = False,
    dtype=None,
) -> nn.Conv:
    pad = dilation * (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        kernel_dilation=(dilation, dilation),
        use_bias=use_bias,
        name=name,
        kernel_init=nn.initializers.he_normal(),
        dtype=dtype,
    )


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride, dilation) -> 1x1(x4)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = _conv(self.planes, 1, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        out = _conv(self.planes * 4, 1, name="conv3", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)
        if self.downsample:
            sc = _conv(self.planes * 4, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            sc = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


class BasicBlock(nn.Module):
    """torchvision BasicBlock (resnet18/34): 3x3 -> 3x3."""

    planes: int
    stride: int = 1
    dilation: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = _conv(self.planes, 3, self.stride, self.dilation, name="conv1", dtype=self.dtype)(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, name="conv2", dtype=self.dtype)(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.downsample:
            sc = _conv(self.planes, 1, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            sc = FrozenBatchNorm(self.planes, name="downsample_bn")(sc)
        else:
            sc = x
        return nn.relu(out + sc)


_ARCHS = {
    # name: (block, blocks_per_stage, expansion)
    "resnet18": (BasicBlock, (2, 2, 2, 2), 1),
    "resnet34": (BasicBlock, (3, 4, 6, 3), 1),
    "resnet50": (Bottleneck, (3, 4, 6, 3), 4),
    "resnet101": (Bottleneck, (3, 4, 23, 3), 4),
}


def num_backbone_channels(name: str) -> int:
    _, _, exp = _ARCHS[name]
    return 512 * exp


class _ConvParams(nn.Module):
    """Bare (kernel[, bias]) parameters with nn.Conv-compatible naming.

    Lets the composed stem below keep the exact param tree paths
    (``conv0/kernel``, ``conv0/bias``, ``conv1/kernel``) that checkpoints,
    the freeze policy (parallel/optim.param_label) and the torchvision
    import (models/torch_import.py) all key on.
    """

    kernel_shape: tuple
    use_bias: bool = False
    kernel_init: object = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kernel_shape)
        b = (
            self.param("bias", nn.initializers.zeros, (self.kernel_shape[-1],))
            if self.use_bias
            else None
        )
        return k, b


class ResNetBackbone(nn.Module):
    """conv0 + torch-layout ResNet trunk, tapping layer4.

    [B, T, F, 1] -> [B, ceil(T/16 or /32), ceil(F/16 or /32), num_channels]
    (stride 16 with ``dilation=True``, reference DC5 mode).
    ``dtype``: computation dtype (e.g. bfloat16); params stay float32.

    The stem computes ``conv1(pad(conv0(x)))`` (reference backbone.py:102)
    in *composed* form: conv0 is a pointwise 1->3 linear map, so
    ``conv1_eff[h,w,1,o] = sum_c w0[c] * W1[h,w,c,o]`` applied directly to the
    1-channel input, plus a bias response map ``conv1(pad(b0 inside-ones))``
    computed on a single [1,T,F,3] tensor.  Mathematically exact (convs are
    linear; conv1's zero padding is preserved because the pad region of
    conv0's output is zero, not b0), with identical parameters — but conv0's
    gradients now flow through the tiny weight composition instead of a
    [B,T,F,3] activation, which deletes the MXU-hostile 3-channel 7x7
    transposed convolution from the backward pass (~9% of the train step)
    and runs the stem forward at 1/3 the FLOPs.
    """

    arch: str = "resnet50"
    dilation: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block, stages, _ = _ARCHS[self.arch]
        cdt = jnp.dtype(self.dtype) if self.dtype is not None else x.dtype
        # conv0: 1 -> 3 channels, 1x1, with bias (torch Conv2d default inits:
        # lecun for nn.Conv kernel, zeros bias — unchanged from the previous
        # nn.Conv formulation); conv1: 7x7/2, he_normal, frozen
        w0, b0 = _ConvParams((1, 1, 1, 3), use_bias=True, name="conv0")()
        w1, _ = _ConvParams(
            (7, 7, 3, 64), kernel_init=nn.initializers.he_normal(), name="conv1"
        )()
        # compose in f32, cast once
        w_eff = jnp.einsum("hwco,c->hwo", w1, w0[0, 0, 0])[:, :, None, :]
        T, F = x.shape[1], x.shape[2]
        inside = jnp.broadcast_to(b0[None, None, None, :], (1, T, F, 3))
        dn = ("NHWC", "HWIO", "NHWC")
        bias_map = jax.lax.conv_general_dilated(
            inside.astype(cdt), w1.astype(cdt), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn,
        )
        x = jax.lax.conv_general_dilated(
            x.astype(cdt), w_eff.astype(cdt), (2, 2), ((3, 3), (3, 3)),
            dimension_numbers=dn,
        ) + bias_map
        x = FrozenBatchNorm(64, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = (64, 128, 256, 512)
        strides = (1, 2, 2, 1 if self.dilation else 2)
        dilations = (1, 1, 1, 2 if self.dilation else 1)
        for li, (n_blocks, p, s, d) in enumerate(
            zip(stages, planes, strides, dilations)
        ):
            for bi in range(n_blocks):
                x = block(
                    planes=p,
                    dtype=self.dtype,
                    stride=s if bi == 0 else 1,
                    # torchvision applies the new dilation from the stage's
                    # *first* block when replace_stride_with_dilation is set
                    # (previous_dilation semantics): first block uses the old
                    # dilation (1) for its 3x3, later blocks use d.
                    dilation=1 if (bi == 0 and d > 1) else d,
                    downsample=(bi == 0 and (s != 1 or li > 0 or block is Bottleneck)),
                    name=f"layer{li + 1}_{bi}",
                )(x)
        return x


class AudioTagBackbone(nn.Module):
    """Clip-tagging model: ResNet -> global pool -> MLP 2048->1000->C -> sigmoid.

    Re-implements /root/reference/audio_tag/backbone.py:13-70; used to
    initialize the SP-SEDT backbone (train_spsedt.py:133-142).
    """

    arch: str = "resnet50"
    dilation: bool = True
    pooling: str = "max"  # 'max' | 'avg'
    num_classes: int = 10
    # logits_out: return pre-sigmoid logits so the trainer can use the
    # numerically-stable log-space BCE.  The reference trains probabilities
    # through torch BCELoss (train_at.py:208) — safe there only because its
    # ImageNet-initialized backbone never saturates; from a cold start the
    # clipped probability-space BCE has zero gradient wherever the sigmoid
    # saturates and the model never recovers (observed: loss frozen at init).
    logits_out: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feats = ResNetBackbone(self.arch, self.dilation, name="backbone")(x)
        if self.pooling == "max":
            pooled = feats.max(axis=(1, 2))
        else:
            pooled = feats.mean(axis=(1, 2))
        h = nn.Dense(1000, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dense(self.num_classes, name="fc2")(h)
        return h if self.logits_out else nn.sigmoid(h)
