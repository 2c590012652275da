"""SEDT model: backbone + transformer + set-prediction heads (flax).

Functional re-design of /root/reference/sedt/sedt.py:17-131.  Differences from
the reference driven by JAX/XLA:
  * outputs are a dict of dense arrays; auxiliary decoder-layer outputs are
    stacked tensors ``aux_logits [A, B, Q, C+1]`` / ``aux_boxes`` instead of a
    list of dicts (sedt.py:126-131) so the criterion can vmap over layers;
  * the padding mask enters as a per-frame [B, T] boolean and is
    nearest-resized to the feature grid (reference interpolates the 2-D mask,
    backbone.py:81);
  * ``at`` keeps its batch dim (the reference's ``.squeeze()`` at sedt.py:92
    would drop it for batch size 1).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.attention import make_key_padding_bias
from .position_encoding import PositionEmbeddingLearned, sine_position_encoding
from .resnet import ResNetBackbone, num_backbone_channels
from .transformer import Transformer, block_diagonal_bias


class MLP(nn.Module):
    """num_layers-deep ReLU MLP (reference sedt.py:398-409)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers - 1):
            x = nn.relu(
                nn.Dense(
                    self.hidden_dim,
                    kernel_init=nn.initializers.xavier_uniform(),
                    name=f"layer{i}",
                )(x)
            )
        return nn.Dense(
            self.output_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name=f"layer{self.num_layers - 1}",
        )(x)


def downsample_mask(pad_mask: jnp.ndarray, t_out: int, f_out: int) -> jnp.ndarray:
    """[B, T] frame padding mask -> [B, T', F'] at the backbone's output grid.

    Nearest-neighbor, matching ``F.interpolate(mask)`` (backbone.py:81); the
    frequency axis carries no padding so it broadcasts.
    """
    b, t = pad_mask.shape
    m = jax.image.resize(pad_mask.astype(jnp.float32), (b, t_out), method="nearest")
    m = m > 0.5
    return jnp.broadcast_to(m[:, :, None], (b, t_out, f_out))


class SEDT(nn.Module):
    """Sound Event Detection Transformer.

    ``__call__(feats [B, T, F, 1], pad_mask [B, T], deterministic)`` returns::

        {"pred_logits": [B, Q, C+1], "pred_boxes": [B, Q, 2],
         "at": [B, C] (dec_at), "at_p": [B, C] (pooling),
         "aux_logits": [A, B, Q, C+1], "aux_boxes": [A, B, Q, 2] (aux_loss)}
    """

    cfg: ModelConfig

    def setup(self):
        cfg = self.cfg
        dtype = (
            jnp.dtype(cfg.compute_dtype)
            if cfg.compute_dtype != "float32"
            else None
        )
        self.backbone = ResNetBackbone(
            cfg.backbone, cfg.dilation, dtype=dtype, name="backbone"
        )
        self.transformer = Transformer(
            d_model=cfg.hidden_dim,
            nhead=cfg.nheads,
            num_encoder_layers=cfg.enc_layers,
            num_decoder_layers=cfg.dec_layers,
            dim_feedforward=cfg.dim_feedforward,
            dropout=cfg.dropout,
            pre_norm=cfg.pre_norm,
            dtype=dtype,
            name="transformer",
        )
        n_queries = cfg.num_queries + 1 if cfg.dec_at else cfg.num_queries
        self.query_embed = nn.Embed(
            n_queries, cfg.hidden_dim, name="query_embed"
        )
        self.input_proj = nn.Conv(
            cfg.hidden_dim, (1, 1), use_bias=True, name="input_proj"
        )
        self.class_embed = nn.Dense(
            cfg.num_classes + 1,
            kernel_init=nn.initializers.xavier_uniform(),
            name="class_embed",
        )
        self.bbox_embed = MLP(cfg.hidden_dim, 2, 3, name="bbox_embed")
        if cfg.dec_at:
            self.weak_class_embed = nn.Dense(
                cfg.num_classes,
                kernel_init=nn.initializers.xavier_uniform(),
                name="weak_class_embed",
            )
        if cfg.pooling is not None and "attn" in cfg.pooling:
            self.attn_dense_softmax = nn.Dense(
                cfg.num_classes, name="attn_dense_softmax"
            )
        if cfg.position_embedding == "learned":
            self.pos_embed_learned = PositionEmbeddingLearned(
                cfg.hidden_dim, name="pos_embed_learned"
            )

    def encode(self, feats, pad_mask, deterministic=True, query_override=None,
               decoder_self_bias=None):
        """Shared trunk: backbone -> flatten -> transformer.

        Returns (hs [L, B, Q, D], memory [B, S, D], feature-grid shape).
        """
        cfg = self.cfg
        x = self.backbone(feats.astype(jnp.dtype(cfg.compute_dtype)))
        b, tp, fp, c = x.shape
        mask3 = downsample_mask(pad_mask, tp, fp)
        if cfg.position_embedding == "learned":
            pos = self.pos_embed_learned(mask3)
        else:
            pos = sine_position_encoding(mask3, cfg.hidden_dim)
        src = self.input_proj(x)  # [B, T', F', D]
        src = src.reshape(b, tp * fp, cfg.hidden_dim)
        pos = pos.reshape(b, tp * fp, cfg.hidden_dim).astype(src.dtype)
        key_bias = make_key_padding_bias(mask3.reshape(b, tp * fp))
        if query_override is None:
            queries = jnp.broadcast_to(
                self.query_embed.embedding[None],
                (b,) + self.query_embed.embedding.shape,
            ).astype(src.dtype)
        else:
            queries = query_override.astype(src.dtype)
        hs, memory = self.transformer(
            src, pos, key_bias, queries, decoder_self_bias, deterministic
        )
        return hs, memory, (tp, fp)

    def __call__(self, feats, pad_mask, deterministic: bool = True):
        cfg = self.cfg
        hs, memory, _ = self.encode(feats, pad_mask, deterministic)
        hs = hs.astype(jnp.float32)
        out = {}
        if cfg.dec_at:
            hs_events = hs[:, :, 1:, :]  # queries 1: are event slots (sedt.py:90)
            at = nn.sigmoid(self.weak_class_embed(hs[-1, :, 0, :]))
            out["at"] = at
        else:
            hs_events = hs
        logits = self.class_embed(hs_events)  # [L, B, Q, C+1]
        boxes = nn.sigmoid(self.bbox_embed(hs_events))  # [L, B, Q, 2]
        out["pred_logits"] = logits[-1]
        out["pred_boxes"] = boxes[-1]
        if cfg.pooling is not None:
            out["at_p"] = self._pool(hs_events[-1], logits[-1], boxes[-1])
        if cfg.aux_loss:
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]
        return out

    def _pool(self, hs_last, logits, boxes):
        """Query-pooling audio-tag branch (reference sedt.py:96-119)."""
        cfg = self.cfg
        class_pro = jax.nn.softmax(logits, axis=-1)[..., :-1]  # [B, Q, C]
        if "weighted_sum" in cfg.pooling:
            w = boxes[:, :, 1]  # event lengths
            return jnp.clip((class_pro * w[:, :, None]).sum(1), 0.0, 1.0)
        if "attn" in cfg.pooling:
            sof = jax.nn.softmax(self.attn_dense_softmax(hs_last), axis=-1)
            sof = jnp.clip(sof, 1e-7, 1.0)
            return (sof * class_pro).sum(1) / sof.sum(1)
        if "max" in cfg.pooling:
            return class_pro.max(1)
        return class_pro.mean(1)  # 'avg'


class SPSEDT(SEDT):
    """Self-supervised patch-query SEDT (reference spsedt.py:14-95).

    ``__call__(feats, pad_mask, patches [B, P, ph, pw, 1], deterministic,
    rng-collection 'patch_mask')`` adds: a second backbone pass over the
    patches, patch2query projection, per-patch block-diagonal decoder masking,
    10% random query masking during training, and optional feature
    reconstruction targets.
    """

    def setup(self):
        super().setup()
        cfg = self.cfg
        self.patch2query = nn.Dense(
            cfg.hidden_dim,
            kernel_init=nn.initializers.xavier_uniform(),
            name="patch2query",
        )
        if cfg.feature_recon:
            self.feature_align = MLP(
                cfg.hidden_dim,
                num_backbone_channels(cfg.backbone),
                2,
                name="feature_align",
            )

    def __call__(self, feats, pad_mask, patches, deterministic: bool = True):
        cfg = self.cfg
        b, p = patches.shape[:2]
        assert cfg.num_queries % cfg.num_patches == 0
        per_patch = cfg.num_queries // cfg.num_patches

        patch_flat = patches.reshape((b * p,) + patches.shape[2:])
        pfeat = self.backbone(patch_flat.astype(jnp.dtype(cfg.compute_dtype)))
        patches_gt = pfeat.mean(axis=(1, 2))  # avgpool (spsedt.py:50)
        pq = self.patch2query(patches_gt).reshape(b, p, 1, cfg.hidden_dim)
        pq = jnp.tile(pq, (1, 1, per_patch, 1)).reshape(b, p * per_patch, cfg.hidden_dim)

        start = 1 if cfg.dec_at else 0
        base_q = self.query_embed.embedding[start:, :]
        if not deterministic:
            # 10% random query masking (spsedt.py:65-67); the reference's
            # ``decoder_input += patches * mask + decoder_input`` doubles the
            # query embedding — reproduced faithfully.
            rng = self.make_rng("patch_mask")
            r_mask, r_shuf = jax.random.split(rng)
            if cfg.query_shuffle:
                # shuffle only the event queries, one permutation per step
                # (spsedt.py:60 torch.randperm)
                base_q = base_q[jax.random.permutation(r_shuf, cfg.num_queries)]
            keep = (
                jax.random.uniform(r_mask, (b, cfg.num_queries, 1)) > cfg.mask_ratio
            ).astype(pq.dtype)
            queries = 2.0 * base_q[None] + pq * keep
            nq = cfg.num_queries
        else:
            nq = p * per_patch  # variable patch count at eval (spsedt.py:70-75)
            queries = pq + base_q[None, :nq, :]

        bias = block_diagonal_bias(cfg.num_queries, cfg.num_patches)[:nq, :nq]
        hs, memory, _ = self.encode(
            feats, pad_mask, deterministic, query_override=queries,
            decoder_self_bias=bias,
        )
        hs = hs.astype(jnp.float32)
        logits = self.class_embed(hs)
        boxes = nn.sigmoid(self.bbox_embed(hs))
        out = {"pred_logits": logits[-1], "pred_boxes": boxes[-1]}
        if cfg.feature_recon:
            feat_out = self.feature_align(hs)  # [L, B, Q, C_backbone]
            out["pred_feature"] = feat_out[-1]
            out["gt_feature"] = patches_gt.reshape(b, p, -1)
            if cfg.aux_loss:
                out["aux_feature"] = feat_out[:-1]
        if cfg.aux_loss:
            out["aux_logits"] = logits[:-1]
            out["aux_boxes"] = boxes[:-1]
        return out
