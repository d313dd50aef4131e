"""Pre-norm transformer decoder for the second (global) branch.

Reference ``libs/models/utils/transformer.py:92-127, 226-320``
(``TransformerDecoder`` of 2 ``TransformerDecoderLayer``s, pre-norm, gelu,
d_model = 2*hidden, nhead=8, ffn=256, used without positional arguments —
the anchor positional encoding is concatenated into the features before the
decoder, ``RouterV4.py:255-258``). Cross-attention memory is the bank of
positive-lane features from previous frames.

TPU-native: memory is a fixed-shape [M, D] buffer with a validity mask;
masked softmax replaces the torch ragged concatenation, and the
"no memory yet -> pass features through" branch (``RouterV4.py:311-315``)
becomes a mask-counted select, keeping the whole decoder traceable inside
``lax.scan``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

NEG_INF = -1e9


class MultiHeadAttention(nn.Module):
    """Projections are fused per source tensor — q==k==v (self-attention)
    runs one Dense(3D); distinct query/memory (cross-attention) runs
    Dense(D) + Dense(2D). The scan body is latency-bound, so one wide
    matmul beats three narrow ones; math is identical to separate q/k/v."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, key_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True):
        """q: [B, Nq, D]; k/v: [B, Nk, D]; key_mask: [B, Nk] bool (True=keep)."""
        h = self.num_heads
        hd = self.dim // h
        b, nq, _ = q.shape
        nk = k.shape[1]
        assert v is k, "fused projections assume shared key/value source"
        if q is k:
            qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(q)
            qp, kp, vp = jnp.split(qkv, 3, axis=-1)
        else:
            qp = nn.Dense(self.dim, dtype=self.dtype, name="q")(q)
            kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(k)
            kp, vp = jnp.split(kv, 2, axis=-1)
        qp = qp.reshape(b, nq, h, hd)
        kp = kp.reshape(b, nk, h, hd)
        vp = vp.reshape(b, nk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp, kp).astype(jnp.float32) / jnp.sqrt(float(hd))
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
        weights = nn.softmax(logits, axis=-1)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(self.dropout)(weights, deterministic=False)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(vp.dtype), vp).reshape(b, nq, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(out)


class DecoderLayer(nn.Module):
    dim: int
    num_heads: int = 8
    ffn_dim: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, deterministic: bool = True,
                 tgt_mask: Optional[jnp.ndarray] = None):
        """``tgt_mask``: [B, Nt] bool — target rows valid as self-attention
        KEYS (True=keep). Padded/dead target rows (e.g. empty propagated
        prior slots) must not leak into valid rows' self-attention; the
        reference only ever self-attends over real ragged rows."""
        # pre-norm self attention
        x = nn.LayerNorm(name="norm1")(tgt)
        sa = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                dtype=self.dtype,
                                name="self_attn")(x, x, x, key_mask=tgt_mask,
                                                  deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            sa = nn.Dropout(self.dropout)(sa, deterministic=False)
        tgt = tgt + sa
        # pre-norm cross attention over the temporal memory bank
        x = nn.LayerNorm(name="norm2")(tgt)
        ca = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                dtype=self.dtype,
                                name="cross_attn")(
            x, memory, memory, key_mask=memory_mask,
            deterministic=deterministic)
        if self.dropout > 0.0 and not deterministic:
            ca = nn.Dropout(self.dropout)(ca, deterministic=False)
        tgt = tgt + ca
        # pre-norm FFN (gelu)
        x = nn.LayerNorm(name="norm3")(tgt)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn1")(x)
        y = nn.gelu(y)
        if self.dropout > 0.0 and not deterministic:
            y = nn.Dropout(self.dropout)(y, deterministic=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="ffn2")(y)
        if self.dropout > 0.0 and not deterministic:
            y = nn.Dropout(self.dropout)(y, deterministic=False)
        return tgt + y


class TemporalDecoder(nn.Module):
    """2-layer pre-norm decoder + final LayerNorm; falls back to identity on
    an empty memory bank (all keys masked)."""

    dim: int
    num_layers: int = 2
    num_heads: int = 8
    ffn_dim: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, memory_mask, deterministic: bool = True,
                 tgt_mask: Optional[jnp.ndarray] = None):
        """tgt: [B, A, D]; memory: [B, M, D]; memory_mask: [B, M] bool;
        tgt_mask: optional [B, A] bool self-attention key validity."""
        x = tgt.astype(self.dtype)
        memory = memory.astype(self.dtype)
        for i in range(self.num_layers):
            x = DecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                             self.dropout, dtype=self.dtype,
                             name=f"layer{i}")(
                x, memory, memory_mask, deterministic, tgt_mask=tgt_mask)
        x = nn.LayerNorm(name="final_norm")(x.astype(jnp.float32))
        # no valid memory for a batch element -> pass tgt through unchanged
        # (RouterV4.py:311-315: decoder is skipped when last_cut is empty)
        has_memory = jnp.any(memory_mask, axis=-1)  # [B]
        return jnp.where(has_memory[:, None, None], x, tgt)
