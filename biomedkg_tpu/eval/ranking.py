"""Filtered-ranking evaluation: MRR / Hits@K over all candidate entities.

The north-star metric (BASELINE.md): the reference only evaluates binary
classification against sampled negatives (kge_module.py:174-194) and never
computes filtered MRR/Hits@K — this module adds the standard KGE protocol:

  for each test triple (h, r, t), score every candidate tail t' (and head
  h'), mask out candidates forming a *known true* triple other than the
  test triple itself ("filtered" setting), and rank the true entity.

TPU design: candidate scoring is a (chunk, N) matmul-shaped kernel per
decoder (decoders.score_all_tails/heads → MXU), the filter lands as a
scatter of -inf from host-built (row, col) pairs, and ranks reduce on
device. Ties use the mean-rank convention.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _build_filter(all_triples: np.ndarray) -> Dict[Tuple[int, int], np.ndarray]:
    """(h, r) → sorted array of true tails (used for both directions by
    passing reversed triples)."""
    order = np.lexsort((all_triples[:, 2], all_triples[:, 1],
                        all_triples[:, 0]))
    t = all_triples[order]
    out: Dict[Tuple[int, int], np.ndarray] = {}
    keys = t[:, 0].astype(np.int64) * (t[:, 1].max() + 1) + t[:, 1]
    boundaries = np.concatenate([[0], np.nonzero(np.diff(keys))[0] + 1,
                                 [len(t)]])
    for lo, hi in zip(boundaries[:-1], boundaries[1:]):
        out[(int(t[lo, 0]), int(t[lo, 1]))] = t[lo:hi, 2]
    return out


# filter-scatter pad sizes: at most four compiled scatter shapes per
# (decoder, chunk) program; oversized filter sets split across multiple
# 16k scatters
_BUCKET_LADDER = (256, 1024, 4096, 16384)


@jax.jit
def _rank_chunk(scores, true_scores, valid):
    """Mean-tie filtered ranks from a (C, N) score matrix with the filter
    already applied as -inf (the true entity included in the filter)."""
    higher = jnp.sum(scores > true_scores[:, None], axis=1)
    ties = jnp.sum(scores == true_scores[:, None], axis=1)
    rank = 1.0 + higher + 0.5 * ties
    return jnp.where(valid, rank, 0.0)


def _direction_ranks(score_all_fn, score_fn, dec_params, z, anchors, rels,
                     targets, filt, chunk: int) -> np.ndarray:
    num = len(anchors)
    num_pad = ((num + chunk - 1) // chunk) * chunk
    pad = num_pad - num
    anchors_p = np.concatenate([anchors, np.zeros(pad, anchors.dtype)])
    rels_p = np.concatenate([rels, np.zeros(pad, rels.dtype)])
    targets_p = np.concatenate([targets, np.zeros(pad, targets.dtype)])
    valid = np.concatenate([np.ones(num, bool), np.zeros(pad, bool)])

    score_all = jax.jit(score_all_fn)
    score_one = jax.jit(score_fn)

    ranks = []
    neg_inf = np.float32(-np.inf)
    for lo in range(0, num_pad, chunk):
        a = anchors_p[lo:lo + chunk]
        r = rels_p[lo:lo + chunk]
        t = targets_p[lo:lo + chunk]
        v = valid[lo:lo + chunk]

        true_s = score_one(dec_params, z, jnp.asarray(a), jnp.asarray(t),
                           jnp.asarray(r))
        scores = score_all(dec_params, z, jnp.asarray(a), jnp.asarray(r))

        # host-built filter pairs (row in chunk, candidate id), padded to
        # a FIXED bucket ladder so the scatter compiles once per ladder
        # rung (variable shapes recompiled every chunk — ~15 s each over
        # the tunneled chip), and CAPPED: filter sets larger than the top
        # rung split across multiple max-bucket scatters, bounding both
        # the number of distinct compiled shapes (≤ len(ladder)) and the
        # single-scatter size under pathological (h, r) fan-out (advisor
        # round-2 item). Pads target (0, 0) with +inf through a
        # scatter-MIN, which is a no-op on real scores.
        rows, cols = [], []
        for i in range(chunk):
            if not v[i]:
                continue
            known = filt.get((int(a[i]), int(r[i])))
            if known is not None:
                rows.append(np.full(len(known), i))
                cols.append(known)
        if rows:
            rows_np = np.concatenate(rows)
            cols_np = np.concatenate(cols)
            for lo2 in range(0, len(rows_np), _BUCKET_LADDER[-1]):
                rpart = rows_np[lo2:lo2 + _BUCKET_LADDER[-1]]
                cpart = cols_np[lo2:lo2 + _BUCKET_LADDER[-1]]
                n_real = len(rpart)
                bucket = next(b for b in _BUCKET_LADDER if b >= n_real)
                rpart = np.concatenate(
                    [rpart, np.zeros(bucket - n_real, rpart.dtype)])
                cpart = np.concatenate(
                    [cpart, np.zeros(bucket - n_real, cpart.dtype)])
                vals = np.full(bucket, neg_inf, np.float32)
                vals[n_real:] = np.inf
                scores = scores.at[jnp.asarray(rpart),
                                   jnp.asarray(cpart)].min(jnp.asarray(vals))
        ranks.append(np.asarray(
            _rank_chunk(scores, true_s, jnp.asarray(v))))
    out = np.concatenate(ranks)
    return out[np.concatenate([np.ones(num, bool), np.zeros(pad, bool)])]


def filtered_ranking_metrics(decoder, dec_params, z,
                             test_triples: np.ndarray,
                             all_triples: np.ndarray,
                             ks: Sequence[int] = (1, 3, 10),
                             chunk: int = 1024,
                             both_sides: bool = True) -> Dict[str, float]:
    """Compute filtered MRR / Hits@K.

    Args:
      decoder: a decoders.* instance (score / score_all_tails / _heads).
      dec_params: decoder parameter dict.
      z: (N, d) full-graph node embeddings.
      test_triples: (T, 3) int array of (head, rel, tail).
      all_triples: (A, 3) known-true triples (train ∪ val ∪ test) to filter.
    """
    test_triples = np.asarray(test_triples, dtype=np.int64)
    all_triples = np.asarray(all_triples, dtype=np.int64)

    tail_filter = _build_filter(all_triples)
    head_filter = _build_filter(all_triples[:, [2, 1, 0]])

    def tails_fn(p, zz, h, t, r):
        return decoder.score(p, zz, h, t, r)

    tail_ranks = _direction_ranks(
        decoder.score_all_tails, tails_fn, dec_params, z,
        test_triples[:, 0], test_triples[:, 1], test_triples[:, 2],
        tail_filter, chunk)

    ranks = [tail_ranks]
    if both_sides:
        def heads_fn(p, zz, t, h, r):
            return decoder.score(p, zz, h, t, r)

        head_ranks = _direction_ranks(
            decoder.score_all_heads, heads_fn, dec_params, z,
            test_triples[:, 2], test_triples[:, 1], test_triples[:, 0],
            head_filter, chunk)
        ranks.append(head_ranks)

    all_ranks = np.concatenate(ranks)
    out = {
        "mrr": float(np.mean(1.0 / all_ranks)),
        "mean_rank": float(np.mean(all_ranks)),
    }
    for k in ks:
        out[f"hits@{k}"] = float(np.mean(all_ranks <= k))
    return out
