"""DETR-style encoder-decoder transformer, batch-first, flax.

Functional re-design of /root/reference/sedt/transformer.py:18-431:
  * positional embeddings are added to Q/K at every attention (not to V);
  * pre-norm or post-norm layers (``pre_norm`` default True,
    train_sedt.py:98);
  * the decoder returns the *stack of all layers'* normed outputs
    (transformer.py:140-150, return_intermediate_dec=True);
  * self-sup branch accepts per-sample query tensors plus a block-diagonal
    decoder self-attention mask (transformer.py:49-60, spsedt.py:29-32).

The dead reference paths (encoder AT token, transformer.py:70-80, and
TransformerDecoderLayerParallelAttn, 300-402) are intentionally not ported.

Attention dispatches through ``ops.attention.scaled_dot_attention`` which
selects the Pallas flash kernel for long sequences on TPU.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import scaled_dot_attention
from ..ops.dropout import Dropout

def _dense(d, name, dtype=None):
    return nn.Dense(
        d, kernel_init=nn.initializers.xavier_uniform(), name=name, dtype=dtype
    )


class MultiHeadAttention(nn.Module):
    """q/k/v/out projection + fused SDPA (replaces torch.nn.MultiheadAttention)."""

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        q_in: jnp.ndarray,  # [B, Sq, D]
        k_in: jnp.ndarray,  # [B, Sk, D]
        v_in: jnp.ndarray,  # [B, Sk, D]
        bias: Optional[jnp.ndarray] = None,  # broadcastable [B, H, Sq, Sk]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        b, sq, _ = q_in.shape
        sk = k_in.shape[1]
        hd = self.d_model // self.nhead
        q = _dense(self.d_model, "q_proj", self.dtype)(q_in).reshape(b, sq, self.nhead, hd)
        k = _dense(self.d_model, "k_proj", self.dtype)(k_in).reshape(b, sk, self.nhead, hd)
        v = _dense(self.d_model, "v_proj", self.dtype)(v_in).reshape(b, sk, self.nhead, hd)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        rate = self.dropout if not deterministic else 0.0
        rng = self.make_rng("dropout") if rate > 0.0 else None
        out = scaled_dot_attention(q, k, v, bias, dropout_rate=rate, dropout_rng=rng)
        out = out.transpose(0, 2, 1, 3).reshape(b, sq, self.d_model)
        return _dense(self.d_model, "out_proj", self.dtype)(out)


def _activation(name: str):
    return {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}[name]


class FFN(nn.Module):
    d_model: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"
    dtype: object = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = _dense(self.dim_feedforward, "linear1", self.dtype)(x)
        h = _activation(self.activation)(h)
        h = Dropout(self.dropout)(h, deterministic=deterministic)
        return _dense(self.d_model, "linear2", self.dtype)(h)


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"
    pre_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(self, src, pos, key_bias, deterministic=True):
        drop = lambda x: Dropout(self.dropout)(x, deterministic=deterministic)
        attn = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                  self.dtype, name="self_attn")
        ffn = FFN(self.d_model, self.dim_feedforward, self.dropout,
                  self.activation, self.dtype, name="ffn")
        n1 = nn.LayerNorm(name="norm1")
        n2 = nn.LayerNorm(name="norm2")
        if self.pre_norm:  # transformer.py:192-204
            s2 = n1(src)
            qk = s2 + pos
            src = src + drop(attn(qk, qk, s2, key_bias, deterministic))
            s2 = n2(src)
            src = src + drop(ffn(s2, deterministic))
            return src
        else:  # transformer.py:177-190
            qk = src + pos
            src = n1(src + drop(attn(qk, qk, src, key_bias, deterministic)))
            src = n2(src + drop(ffn(src, deterministic)))
            return src


class DecoderLayer(nn.Module):
    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    activation: str = "relu"
    pre_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(
        self, tgt, memory, query_pos, pos, mem_key_bias, self_attn_bias, deterministic=True
    ):
        drop = lambda x: Dropout(self.dropout)(x, deterministic=deterministic)
        sa = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                self.dtype, name="self_attn")
        ca = MultiHeadAttention(self.d_model, self.nhead, self.dropout,
                                self.dtype, name="cross_attn")
        ffn = FFN(self.d_model, self.dim_feedforward, self.dropout,
                  self.activation, self.dtype, name="ffn")
        n1 = nn.LayerNorm(name="norm1")
        n2 = nn.LayerNorm(name="norm2")
        n3 = nn.LayerNorm(name="norm3")
        if self.pre_norm:  # transformer.py:263-284
            t2 = n1(tgt)
            qk = t2 + query_pos
            tgt = tgt + drop(sa(qk, qk, t2, self_attn_bias, deterministic))
            t2 = n2(tgt)
            tgt = tgt + drop(
                ca(t2 + query_pos, memory + pos, memory, mem_key_bias, deterministic)
            )
            t2 = n3(tgt)
            tgt = tgt + drop(ffn(t2, deterministic))
            return tgt
        else:  # transformer.py:240-261
            qk = tgt + query_pos
            tgt = n1(tgt + drop(sa(qk, qk, tgt, self_attn_bias, deterministic)))
            tgt = n2(
                tgt
                + drop(ca(tgt + query_pos, memory + pos, memory, mem_key_bias, deterministic))
            )
            tgt = n3(tgt + drop(ffn(tgt, deterministic)))
            return tgt


class Transformer(nn.Module):
    """Encoder-decoder over flattened [B, S, D] sequences.

    ``__call__(src, pos, key_padding_bias, query, decoder_self_bias)`` returns
    (hs [L, B, Q, D] — all decoder layers, normed — and memory [B, S, D]).
    """

    d_model: int = 256
    nhead: int = 8
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = True
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        src: jnp.ndarray,  # [B, S, D]
        pos: jnp.ndarray,  # [B, S, D]
        key_padding_bias: Optional[jnp.ndarray],  # [B, 1, 1, S] additive
        query: jnp.ndarray,  # [B, Q, D] query (positional) embeddings
        decoder_self_bias: Optional[jnp.ndarray] = None,  # [Q, Q] additive
        deterministic: bool = True,
    ):
        out = src
        for i in range(self.num_encoder_layers):
            out = EncoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.pre_norm,
                self.dtype,
                name=f"encoder_layer_{i}",
            )(out, pos, key_padding_bias, deterministic)
        if self.pre_norm:  # encoder_norm exists only when normalize_before
            out = nn.LayerNorm(name="encoder_norm")(out)
        memory = out

        tgt = jnp.zeros_like(query)  # transformer.py:56,69
        sa_bias = None
        if decoder_self_bias is not None:
            sa_bias = decoder_self_bias[None, None, :, :]
        decoder_norm = nn.LayerNorm(name="decoder_norm")
        intermediate = []
        for i in range(self.num_decoder_layers):
            tgt = DecoderLayer(
                self.d_model,
                self.nhead,
                self.dim_feedforward,
                self.dropout,
                self.activation,
                self.pre_norm,
                self.dtype,
                name=f"decoder_layer_{i}",
            )(tgt, memory, query, pos, key_padding_bias, sa_bias, deterministic)
            intermediate.append(decoder_norm(tgt))
        hs = jnp.stack(intermediate, axis=0)  # [L, B, Q, D]
        return hs, memory


def block_diagonal_bias(num_queries: int, num_groups: int) -> jnp.ndarray:
    """SP-SEDT decoder self-attn mask: -inf off the per-patch diagonal blocks
    (reference spsedt.py:29-32).  Returns additive [Q, Q] f32."""
    per = num_queries // num_groups
    group = jnp.arange(num_queries) // per
    same = group[:, None] == group[None, :]
    return jnp.where(same, 0.0, -1.0e9).astype(jnp.float32)
