"""Filtered-ranking evaluation: MRR / Hits@K over all candidate entities.

The north-star metric (BASELINE.md): the reference only evaluates binary
classification against sampled negatives (kge_module.py:174-194) and never
computes filtered MRR/Hits@K — this module adds the standard KGE protocol:

  for each test triple (h, r, t), score every candidate tail t' (and head
  h'), mask out candidates forming a *known true* triple other than the
  test triple itself ("filtered" setting), and rank the true entity.

TPU design (round-3 redesign, measured end-to-end at PrimeKG++ scale):
one jitted ``lax.scan`` over triple chunks runs the WHOLE direction in a
single device dispatch — candidate scoring is a (chunk, N) matmul per
step (decoders.score_all_tails/heads → MXU), the filter is a flat
(pair_rows, pair_cols) array uploaded ONCE whose per-chunk slice is
gathered (never scattered) and its comparison counts subtracted from the
all-candidate counts, and ranks stream out (T,). The round-2 per-chunk
host loop (eager scatter-min chain over the tunnel) measured
6.0 ms/triple-dir at real fan-outs; this path measures ~0.03-0.1.
Ties use the mean-rank convention.
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
        # unique: duplicate known triples must not double-subtract in the
        # gather-based filter counts (_filter_counts)
        out[(int(t[lo, 0]), int(t[lo, 1]))] = np.unique(t[lo:hi, 2])
    return out


# filter-pair pad sizes: at most these many compiled count programs per
# (decoder, chunk) shape; oversized filter sets split across multiple
# top-rung calls
_BUCKET_LADDER = (4096, 16384, 65536, 262144)


@jax.jit
def _total_counts(scores, true_scores):
    """(higher, ties) against ALL candidates — one (C, N) pass."""
    higher = jnp.sum((scores > true_scores[:, None]).astype(jnp.float32),
                     axis=1)
    ties = jnp.sum((scores == true_scores[:, None]).astype(jnp.float32),
                   axis=1)
    return higher, ties


@jax.jit
def _filter_counts(scores, true_scores, rows, cols, pair_valid):
    """Per-row (higher, ties) contributed by the FILTERED candidates: a
    flat GATHER of the scores at the (row, col) filter pairs + masked
    segment-sums — no scatter into the (C, N) matrix ever happens.

    Round-3 redesign: the round-2 filter application rewrote the 211 MB
    score matrix through a chain of eager scatter-min ops (~26/chunk at
    PrimeKG++ fan-outs, ~560 ms each over the tunnel → 6.0 ms/triple-dir
    measured end-to-end). Rank arithmetic only needs the filtered
    candidates' comparison COUNTS, so gather-and-subtract replaces
    scatter-and-recompare: measured 0.24 ms/triple-dir (25×)."""
    n = scores.shape[1]
    flat = rows * n + cols
    vals = jnp.take(scores.reshape(-1), flat, mode="clip")
    ts = jnp.take(true_scores, rows, mode="clip")
    ok = pair_valid.astype(jnp.float32)
    higher = jax.ops.segment_sum((vals > ts) * ok, rows,
                                 num_segments=scores.shape[0])
    ties = jax.ops.segment_sum((vals == ts) * ok, rows,
                               num_segments=scores.shape[0])
    return higher, ties


def _direction_ranks(score_all_fn, score_fn, dec_params, z, anchors, rels,
                     targets, filt, chunk: int) -> np.ndarray:
    """Single-dispatch scanned ranking (see module docstring); falls back
    to the per-chunk host loop when the flat filter-pair table would not
    fit device memory."""
    num = len(anchors)
    # the filter gathers index the (chunk, N) score matrix FLAT in int32
    # (x64 disabled): keep chunk*N < 2^31 or the index wraps negative and
    # mode="clip" silently counts against scores[0, 0]
    chunk = max(1, min(chunk, (2**31 - 1) // max(z.shape[0], 1)))
    num_pad = ((num + chunk - 1) // chunk) * chunk
    pad = num_pad - num
    anchors_p = np.concatenate([anchors, np.zeros(pad, anchors.dtype)])
    rels_p = np.concatenate([rels, np.zeros(pad, rels.dtype)])
    targets_p = np.concatenate([targets, np.zeros(pad, targets.dtype)])
    valid = np.concatenate([np.ones(num, bool), np.zeros(pad, bool)])
    n_chunks = num_pad // chunk

    # host: per-chunk filter pairs (row-in-chunk, candidate), built ONCE
    # and reused verbatim by whichever path runs below
    offs = np.zeros(n_chunks, np.int32)
    cnts = np.zeros(n_chunks, np.int32)
    chunk_rows, chunk_cols = [], []
    total = 0
    for ci in range(n_chunks):
        offs[ci] = total
        base = ci * chunk
        rl, cl = [], []
        for i in range(chunk):
            if not valid[base + i]:
                continue
            known = filt.get((int(anchors_p[base + i]),
                              int(rels_p[base + i])))
            if known is not None:
                rl.append(np.full(len(known), i, np.int32))
                cl.append(known.astype(np.int32))
        cr = np.concatenate(rl) if rl else np.zeros(0, np.int32)
        chunk_rows.append(cr)
        chunk_cols.append(np.concatenate(cl) if cl
                          else np.zeros(0, np.int32))
        total += len(cr)
        cnts[ci] = len(cr)
    maxp = int(cnts.max()) if n_chunks else 0
    maxp = max(8, 1 << (maxp - 1).bit_length()) if maxp else 8

    if total * 4 * 2 <= 2 << 30:   # flat pair table fits device memory
        frows = np.concatenate(chunk_rows) if chunk_rows \
            else np.zeros(0, np.int32)
        fcols = np.concatenate(chunk_cols) if chunk_cols \
            else np.zeros(0, np.int32)
        # dynamic_slice pads: slices of size maxp never run out of bounds
        frows = np.concatenate([frows, np.zeros(maxp, np.int32)])
        fcols = np.concatenate([fcols, np.zeros(maxp, np.int32)])
        return _scanned_direction(
            score_all_fn, score_fn, dec_params, z, chunk, maxp,
            anchors_p.reshape(n_chunks, chunk),
            rels_p.reshape(n_chunks, chunk),
            targets_p.reshape(n_chunks, chunk),
            valid.reshape(n_chunks, chunk), frows, fcols, offs, cnts)[:num]

    score_all = jax.jit(score_all_fn)
    score_one = jax.jit(score_fn)

    ranks = []
    for ci, lo in enumerate(range(0, num_pad, chunk)):
        a = anchors_p[lo:lo + chunk]
        r = rels_p[lo:lo + chunk]
        t = targets_p[lo:lo + chunk]
        v = valid[lo:lo + chunk]

        true_s = score_one(dec_params, z, jnp.asarray(a), jnp.asarray(t),
                           jnp.asarray(r))
        scores = score_all(dec_params, z, jnp.asarray(a), jnp.asarray(r))

        # the pre-built per-chunk filter pairs, padded to a FIXED bucket
        # ladder (≤ len(ladder) compiled count programs; variable shapes
        # recompiled every chunk — ~15 s each over the tunneled chip);
        # the filtered-candidate counts subtract from the all-candidate
        # counts (_filter_counts — scatter-free, the round-2 scatter
        # chain measured 6.0 ms/triple-dir at PrimeKG++ fan-outs). Pads
        # carry pair_valid=0.
        rows_np, cols_np = chunk_rows[ci], chunk_cols[ci]
        higher, ties = _total_counts(scores, true_s)
        if len(rows_np):
            for lo2 in range(0, len(rows_np), _BUCKET_LADDER[-1]):
                rpart = rows_np[lo2:lo2 + _BUCKET_LADDER[-1]]
                cpart = cols_np[lo2:lo2 + _BUCKET_LADDER[-1]]
                n_real = len(rpart)
                bucket = next(b for b in _BUCKET_LADDER if b >= n_real)
                ok = np.zeros(bucket, bool)
                ok[:n_real] = True
                rpart = np.concatenate(
                    [rpart, np.zeros(bucket - n_real, rpart.dtype)])
                cpart = np.concatenate(
                    [cpart, np.zeros(bucket - n_real, cpart.dtype)])
                fh, ft = _filter_counts(scores, true_s,
                                        jnp.asarray(rpart),
                                        jnp.asarray(cpart),
                                        jnp.asarray(ok))
                higher = higher - fh
                ties = ties - ft
        rank = 1.0 + higher + 0.5 * ties
        ranks.append(np.asarray(
            jnp.where(jnp.asarray(v), rank, 0.0)))
    return np.concatenate(ranks)[:num]


def _scanned_direction(score_all_fn, score_fn, dec_params, z, chunk, maxp,
                       anchors2, rels2, targets2, valid2, frows, fcols,
                       offs, cnts) -> np.ndarray:
    """All chunks of one direction in ONE jitted lax.scan dispatch."""

    @jax.jit
    def run(dec_params, z, A, R, T, V, frows, fcols, offs, cnts):
        n = z.shape[0]

        def body(_, xs):
            a, r, t, v, off, cnt = xs
            ts = score_fn(dec_params, z, a, t, r)
            s = score_all_fn(dec_params, z, a, r)
            hi = jnp.sum((s > ts[:, None]).astype(jnp.float32), axis=1)
            ti = jnp.sum((s == ts[:, None]).astype(jnp.float32), axis=1)
            pr = jax.lax.dynamic_slice(frows, (off,), (maxp,))
            pc = jax.lax.dynamic_slice(fcols, (off,), (maxp,))
            ok = (jnp.arange(maxp, dtype=jnp.int32)
                  < cnt).astype(jnp.float32)
            vals = jnp.take(s.reshape(-1), pr * n + pc, mode="clip")
            tsp = jnp.take(ts, pr, mode="clip")
            fh = jax.ops.segment_sum((vals > tsp) * ok, pr,
                                     num_segments=chunk)
            fe = jax.ops.segment_sum((vals == tsp) * ok, pr,
                                     num_segments=chunk)
            rank = 1.0 + (hi - fh) + 0.5 * (ti - fe)
            return None, jnp.where(v, rank, 0.0)

        _, ranks = jax.lax.scan(body, None, (A, R, T, V, offs, cnts))
        return ranks.reshape(-1)

    return np.asarray(run(dec_params, z, jnp.asarray(anchors2),
                          jnp.asarray(rels2), jnp.asarray(targets2),
                          jnp.asarray(valid2), jnp.asarray(frows),
                          jnp.asarray(fcols), jnp.asarray(offs),
                          jnp.asarray(cnts)))


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
