"""Graph-contrastive-learning models: DGI, GRACE, GGD.

Functional re-designs of /root/reference/biomedkg/model/gcl.py:8-93 for
static-shape padded batches. Augmentations are mask-native:

  * feature masking (PyG mask_feature mode='all') → entrywise Bernoulli mask
  * edge dropout (PyG dropout_edge)               → edge_mask &= bernoulli
  * row-permutation corruption                    → masked argsort permutation
    that only shuffles real node rows (padding rows stay padding)

so no shapes ever change and one compiled step serves all batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import nn
from .encoders import GCNEncoder


def _masked_permutation(rng, node_mask):
    """Random permutation of the real (first) rows; padding rows fixed.

    Real nodes occupy rows [0, num_real) by the batch contract
    (sampling/batch.py), so sorting random keys for real rows before ordered
    keys for padded rows yields exactly a permutation of the real block.
    """
    n = node_mask.shape[0]
    scores = jax.random.uniform(rng, (n,))
    tail_order = 2.0 + jnp.arange(n, dtype=jnp.float32) / n
    keys = jnp.where(node_mask, scores, tail_order)
    return jnp.argsort(keys)


def _drop_edges(rng, edge_mask, p):
    keep = jax.random.bernoulli(rng, 1.0 - p, edge_mask.shape)
    return jnp.logical_and(edge_mask, keep)


class DGI:
    """Deep Graph Infomax (reference model/gcl.py:8-27).

    z = enc(x); summary g = project(sigmoid(masked-mean(z))); negatives from
    row-permuted features.
    """

    def __init__(self, encoder: GCNEncoder, hidden_dim: int):
        self.encoder = encoder
        self.hidden_dim = hidden_dim

    def init(self, rng) -> dict:
        r1, r2 = jax.random.split(rng)
        proj = nn.linear_init(r2, self.hidden_dim, self.hidden_dim)
        # PyG's `uniform(hidden_dim, weight)` init (model/gcl.py:13).
        r3 = jax.random.fold_in(r2, 1)
        proj["w"] = nn.uniform_fan(r3, proj["w"].shape, fan=self.hidden_dim)
        return {"encoder": self.encoder.init(r1), "project": proj}

    def apply(self, params, x, edge_index, edge_mask, node_mask, *,
              rng: jax.Array, training: bool = False):
        r_perm, r_enc1, r_enc2 = jax.random.split(rng, 3)
        z = self.encoder.apply(params["encoder"], x, edge_index, edge_mask,
                               rng=r_enc1, training=training)
        denom = jnp.maximum(jnp.sum(node_mask), 1.0)
        mean = jnp.sum(z * node_mask[:, None], axis=0, keepdims=True) / denom
        g = nn.linear_apply(params["project"], jax.nn.sigmoid(mean))
        xn = jnp.take(x, _masked_permutation(r_perm, node_mask), axis=0)
        zn = self.encoder.apply(params["encoder"], xn, edge_index, edge_mask,
                                rng=r_enc2, training=training)
        return z, g, zn


class GRACE:
    """GRACE two-view contrastive model (reference model/gcl.py:31-51)."""

    def __init__(self, encoder: GCNEncoder, hidden_dim: int, proj_dim: int):
        self.encoder = encoder
        self.hidden_dim = hidden_dim
        self.proj_dim = proj_dim

    def init(self, rng) -> dict:
        r1, r2, r3 = jax.random.split(rng, 3)
        return {
            "encoder": self.encoder.init(r1),
            "fc1": nn.linear_init(r2, self.hidden_dim, self.proj_dim),
            "fc2": nn.linear_init(r3, self.proj_dim, self.hidden_dim),
        }

    def apply(self, params, x, edge_index, edge_mask, node_mask, *,
              rng: jax.Array, training: bool = False):
        rs = jax.random.split(rng, 7)
        x1 = nn.mask_feature(rs[0], x, 0.4)
        x2 = nn.mask_feature(rs[1], x, 0.4)
        em1 = _drop_edges(rs[2], edge_mask, 0.4)
        em2 = _drop_edges(rs[3], edge_mask, 0.4)
        z = self.encoder.apply(params["encoder"], x, edge_index, edge_mask,
                               rng=rs[4], training=training)
        z1 = self.encoder.apply(params["encoder"], x1, edge_index, em1,
                                rng=rs[5], training=training)
        z2 = self.encoder.apply(params["encoder"], x2, edge_index, em2,
                                rng=rs[6], training=training)
        return z, z1, z2

    def project(self, params, z):
        h = jax.nn.elu(nn.linear_apply(params["fc1"], z))
        return nn.linear_apply(params["fc2"], h)


class GGD:
    """Group Graph Discrimination (reference model/gcl.py:54-93).

    With prob ``aug_p`` applies feature-mask + edge-dropout, then scores
    clean vs row-permuted embeddings through an n_proj-layer MLP summed over
    features.
    """

    def __init__(self, encoder: GCNEncoder, hidden_dim: int, n_proj: int,
                 aug_p: float):
        self.encoder = encoder
        self.hidden_dim = hidden_dim
        self.n_proj = n_proj
        self.aug_p = aug_p

    def init(self, rng) -> dict:
        rngs = jax.random.split(rng, self.n_proj + 1)
        mlp = [nn.linear_init(r, self.hidden_dim, self.hidden_dim)
               for r in rngs[1:]]
        return {"encoder": self.encoder.init(rngs[0]), "mlp": mlp}

    def _project(self, params, h):
        for lp in params["mlp"][:-1]:
            h = jax.nn.relu(nn.linear_apply(lp, h))
        h = nn.linear_apply(params["mlp"][-1], h)
        return jnp.sum(h, axis=1)

    def apply(self, params, x, edge_index, edge_mask, node_mask, *,
              rng: jax.Array, training: bool = False):
        rs = jax.random.split(rng, 6)
        do_aug = jax.random.uniform(rs[0]) < self.aug_p

        x_aug = jnp.where(do_aug, nn.mask_feature(rs[1], x, 0.4), x)
        em_aug = jnp.where(do_aug, _drop_edges(rs[2], edge_mask, 0.4),
                           edge_mask)

        pos_z = self.encoder.apply(params["encoder"], x_aug, edge_index,
                                   em_aug, rng=rs[3], training=training)
        xn = jnp.take(x_aug, _masked_permutation(rs[4], node_mask), axis=0)
        neg_z = self.encoder.apply(params["encoder"], xn, edge_index, em_aug,
                                   rng=rs[5], training=training)
        return self._project(params, pos_z), self._project(params, neg_z)
