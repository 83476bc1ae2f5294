"""Modality fusion modules: attention fusion, ReDAF, positional encoding.

Functional ports of the intent of /root/reference/biomedkg/utils/fusion.py:
10-112. Inputs are (N, M, D) stacks of per-modality LM embeddings (M = 2 for
PrimeKG++); outputs are fused (N, D) node features. The attention here is a
2-token sequence, so plain einsum + softmax compiles to a couple of fused MXU
calls — no flash kernel needed (SURVEY §2.9).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .. import nn


class AttentionFusion:
    """Self-attention over the modality axis, mean-pooled (fusion.py:10-31)."""

    def __init__(self, embed_dim: int):
        self.embed_dim = embed_dim

    def init(self, rng) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        d = self.embed_dim
        return {
            "q": nn.linear_init(r1, d, d),
            "k": nn.linear_init(r2, d, d),
            "v": nn.linear_init(r3, d, d),
        }

    def apply(self, params, x, *, rng: Optional[jax.Array] = None,
              training: bool = False):
        q = nn.linear_apply(params["q"], x)
        k = nn.linear_apply(params["k"], x)
        v = nn.linear_apply(params["v"], x)
        scale = 1.0 / math.sqrt(q.shape[-1])
        attn = jax.nn.softmax(
            jnp.einsum("...md,...nd->...mn", q, k) * scale, axis=-1)
        out = jnp.einsum("...mn,...nd->...md", attn, v)
        if out.ndim == 3:
            out = jnp.mean(out, axis=1)
        return out


class ReDAF:
    """Relation-aware dynamic fusion (fusion.py:34-90).

    Learned per-modality weights × a sigmoid relational-context gate applied
    to a transformed input, dropout 0.1, ReLU, mean over modalities.
    """

    def __init__(self, embed_dim: int, num_modalities: int = 2):
        self.embed_dim = embed_dim
        self.num_modalities = num_modalities

    def init(self, rng) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        d = self.embed_dim
        return {
            "modal_weights": jnp.ones((self.num_modalities, 1, d)),
            "sub_type_emb": nn.embedding_init(r1, self.num_modalities, d),
            "transform": nn.linear_init(r2, d, d),
            "rel_context": nn.linear_init(r3, d, d),
        }

    def apply(self, params, x, relational_context: float = 0.2,
              sub_type_ids: Optional[jax.Array] = None, *,
              rng: Optional[jax.Array] = None, training: bool = False):
        d = self.embed_dim
        ctx = jnp.full((1, d), relational_context, dtype=x.dtype)
        zeta = jax.nn.sigmoid(nn.linear_apply(params["rel_context"], ctx))

        if sub_type_ids is not None:
            sub = nn.embedding_apply(params["sub_type_emb"], sub_type_ids)
        else:
            sub = jnp.zeros_like(x)

        transformed = jax.nn.relu(
            nn.linear_apply(params["transform"], x + sub))
        weights = jnp.swapaxes(params["modal_weights"], 0, 1)  # (1, M, d)
        weighted = transformed * weights * zeta[None]
        h = nn.dropout(rng, weighted, 0.1, deterministic=not training)
        h = jax.nn.relu(h)
        if h.ndim == 3:
            h = jnp.mean(h, axis=1)
        return h


class PositionalEncoding:
    """Sinusoidal PE (fusion.py:93-112; defined but unused by the pipeline)."""

    def __init__(self, embed_dim: int, dropout: float = 0.1,
                 max_len: int = 5000):
        # even dims only: the cosine slice has floor(d/2) slots vs the
        # ceil(d/2)-column div table (the torch reference crashes the
        # same way on odd dims — surface it clearly instead)
        assert embed_dim % 2 == 0, \
            f"PositionalEncoding requires an even embed_dim, got {embed_dim}"
        self.dropout = dropout
        position = jnp.arange(max_len)[:, None].astype(jnp.float32)
        div = jnp.exp(jnp.arange(0, embed_dim, 2).astype(jnp.float32)
                      * (-math.log(10000.0) / embed_dim))
        pe = jnp.zeros((1, max_len, embed_dim))
        pe = pe.at[0, :, 0::2].set(jnp.sin(position * div))
        pe = pe.at[0, :, 1::2].set(jnp.cos(position * div))
        self.pe = pe

    def apply(self, x, *, rng: Optional[jax.Array] = None,
              training: bool = False):
        x = x + self.pe[:, : x.shape[1]]
        return nn.dropout(rng, x, self.dropout, deterministic=not training)
