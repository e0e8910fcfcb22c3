"""DETR-style point-token transformer (encoder/decoder + encoder-only vote).

Parity targets: ``common/nets/transformer.py:15-459`` — post-norm layers,
4 heads on d=256, FFN 1024, per-layer normed encoder intermediates, decoder
intermediates with the last entry re-normalized by the final norm, and the
cross-attention weights (head-averaged) returned per decoder layer.

TPU design: batch-first [B, T, C] layouts, one fused attention einsum per
layer (800 tokens x 256 dims sits comfortably in VMEM), boolean masks folded
in as additive -inf.  All shapes static; masks are compile-time constants.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """torch ``nn.MultiheadAttention``-compatible attention.

    Packed qkv projection (one [3C, C] weight), scaled dot-product, optional
    boolean ``attn_mask`` [T,S] (True = disallowed), returns the output and
    the head-averaged attention weights [B,T,S].
    """

    d_model: int
    nhead: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(
        self,
        query: jax.Array,  # [B, T, C]
        key: jax.Array,  # [B, S, C]
        value: jax.Array,  # [B, S, C]
        attn_mask: Optional[jax.Array] = None,  # [T, S] bool
        *,
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        c = self.d_model
        hd = c // self.nhead
        in_w = self.param(
            "in_proj_weight", nn.initializers.xavier_uniform(), (3 * c, c), jnp.float32
        )
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * c,), jnp.float32)

        def proj(x, i):
            w = in_w[i * c : (i + 1) * c].astype(x.dtype)
            b = in_b[i * c : (i + 1) * c].astype(x.dtype)
            return x @ w.T + b

        q = proj(query, 0)
        k = proj(key, 1)
        v = proj(value, 2)

        bsz, tgt, _ = q.shape
        src = k.shape[1]
        q = q.reshape(bsz, tgt, self.nhead, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, src, self.nhead, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, src, self.nhead, hd).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(hd).astype(q.dtype)
        if attn_mask is not None:
            logits = jnp.where(attn_mask[None, None], NEG_INF, logits)
        weights = jax.nn.softmax(logits, axis=-1)
        weights = nn.Dropout(self.dropout, deterministic=not train)(weights)
        out = jnp.einsum("bhts,bhsd->bhtd", weights, v)
        out = out.transpose(0, 2, 1, 3).reshape(bsz, tgt, c)
        out = nn.Dense(c, dtype=self.dtype, name="out_proj")(out)
        return out, weights.mean(axis=1)


class EncoderLayer(nn.Module):
    """Post-norm transformer encoder layer (transformer.py:257-331)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, src_mask=None, *, train: bool = False):
        qk = src + pos
        attn_out, _ = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="self_attn"
        )(qk, qk, src, attn_mask=src_mask, train=train)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(attn_out)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(src)
        ff = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        src = src + nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm2")(src)


class DecoderLayer(nn.Module):
    """Post-norm decoder layer with cross-attention weights returned
    (transformer.py:334-459)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    dtype: Any = None

    @nn.compact
    def __call__(
        self, tgt, memory, pos, query_pos, tgt_mask=None, memory_mask=None,
        *, train: bool = False,
    ):
        qk = tgt + query_pos
        sa, _ = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype, name="self_attn"
        )(qk, qk, tgt, attn_mask=tgt_mask, train=train)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(sa)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)
        ca, attn_wts = MultiheadAttention(
            self.d_model, self.nhead, self.dropout, self.dtype,
            name="multihead_attn",
        )(tgt + query_pos, memory + pos, memory, attn_mask=memory_mask, train=train)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(ca)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(tgt)
        ff = nn.Dropout(self.dropout, deterministic=not train)(nn.relu(ff))
        ff = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(ff)
        tgt = tgt + nn.Dropout(self.dropout, deterministic=not train)(ff)
        return nn.LayerNorm(dtype=self.dtype, name="norm3")(tgt), attn_wts


class Encoder(nn.Module):
    """Encoder stack returning (output, per-layer inter-normed intermediates)
    (transformer.py:158-202)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, src_mask=None, *, train: bool = False):
        inter_norm = nn.LayerNorm(dtype=self.dtype, name="inter_norm")
        out = src
        intermediates = []
        for i in range(self.num_layers):
            out = EncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.dtype, name=f"layer{i}",
            )(out, pos, src_mask, train=train)
            intermediates.append(inter_norm(out))
        return out, jnp.stack(intermediates)  # [L, B, S, C]


class Decoder(nn.Module):
    """Decoder stack with return_intermediate semantics: per-layer normed
    outputs, the final entry replaced by the final-norm output
    (transformer.py:205-254)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    dropout: float
    num_layers: int
    dtype: Any = None

    @nn.compact
    def __call__(
        self, tgt, memory, pos, query_pos, tgt_mask=None, memory_mask=None,
        *, train: bool = False,
    ):
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        out = tgt
        intermediates = []
        attn_all = []
        for i in range(self.num_layers):
            out, attn = DecoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, self.dropout,
                self.dtype, name=f"layer{i}",
            )(out, memory, pos, query_pos, tgt_mask, memory_mask, train=train)
            intermediates.append(norm(out))
            attn_all.append(attn)
        final = norm(out)
        intermediates[-1] = final
        return jnp.stack(intermediates), jnp.stack(attn_all)  # [L,B,Q,C], [L,B,Q,S]


class Transformer(nn.Module):
    """Hand transformer: encoder over 800 point tokens + decoder with 17 MANO
    queries (transformer.py:68-155).  Batch-first; positions are zeros in the
    reference (main/model.py:542-544) but kept as inputs for generality."""

    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 6
    num_decoder_layers: int = 4
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(
        self, src, pos, query_embed, tgt_mask=None, memory_mask=None,
        src_mask=None, *, train: bool = False,
    ):
        bsz = src.shape[0]
        memory, enc_intermediate = Encoder(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            self.num_encoder_layers, self.dtype, name="encoder",
        )(src + pos, pos, src_mask, train=train)
        query = jnp.broadcast_to(
            query_embed[None], (bsz, *query_embed.shape)
        ).astype(src.dtype)
        tgt = jnp.zeros_like(query)
        hs, attn_wts = Decoder(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            self.num_decoder_layers, self.dtype, name="decoder",
        )(tgt, memory, pos, query, tgt_mask, memory_mask, train=train)
        return hs, memory, enc_intermediate, attn_wts


class VoteTransformer(nn.Module):
    """Object transformer: encoder-only over 800 point tokens
    (transformer.py:15-65)."""

    d_model: int = 256
    nhead: int = 4
    num_encoder_layers: int = 3
    dim_feedforward: int = 1024
    dropout: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, src, pos, src_mask=None, *, train: bool = False):
        return Encoder(
            self.d_model, self.nhead, self.dim_feedforward, self.dropout,
            self.num_encoder_layers, self.dtype, name="encoder",
        )(src + pos, pos, src_mask, train=train)


def get_mano_tgt_mask(num_queries: int = 17, shape_idx: int = 16) -> jnp.ndarray:
    """Decoder self-attention mask (common/utils/misc.py:11-31).

    True = disallowed.  Query 0 (global rot) attends only to itself; each
    finger's 3 queries attend within the finger; the shape query to itself.
    """
    mask = np.zeros((num_queries, num_queries), dtype=bool)
    mask[0, :] = True
    mask[0, 0] = False
    for i in range(5):
        s, e = 3 * i + 1, 3 * i + 4
        mask[s:e, :] = True
        mask[s:e, s:e] = False
    mask[shape_idx, :] = True
    mask[shape_idx, shape_idx] = False
    return jnp.asarray(mask)


def get_mano_memory_mask(
    num_queries: int = 17, num_hand: int = 600, num_obj: int = 200
) -> jnp.ndarray:
    """Cross-attention mask hiding object tokens from MANO queries
    (common/utils/misc.py:42-47)."""
    mask = np.zeros((num_queries, num_hand + num_obj), dtype=bool)
    mask[:, num_hand:] = True
    return jnp.asarray(mask)


def get_manoshape_memory_mask(num_hand: int = 600, num_obj: int = 200) -> jnp.ndarray:
    """Single-query variant for the IK/shape-only head
    (common/utils/misc.py:34-39)."""
    mask = np.zeros((1, num_hand + num_obj), dtype=bool)
    mask[:, num_hand:] = True
    return jnp.asarray(mask)
