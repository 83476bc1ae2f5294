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

import os
import sys
import time
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# BIOMEDKG_RANK_TIMING=1 → per-phase wall-clock breakdown on stderr
# (filter build / pair assembly / upload / compile / execute) — the
# knob that attributed the round-5 full-scale eval regression
_TIMING = os.environ.get("BIOMEDKG_RANK_TIMING", "") not in ("", "0")


def _tlog(msg: str) -> None:
    if _TIMING:
        print(f"[rank-timing] {msg}", file=sys.stderr, flush=True)


def _build_filter(all_triples: np.ndarray, num_nodes: int,
                  num_keys: int) -> Tuple[np.ndarray, np.ndarray]:
    """→ (keys, tails): DEDUPED known (anchor·K + rel, target) pairs,
    key-major sorted.

    Round-5 rewrite (VERDICT r4 weak #2): the old dict build python-looped
    over every distinct (h, r) group — ~1–2 M iterations at full
    PrimeKG++ scale, 10+ s of pure host time that dwarfed the device scan
    (12.8 s chip vs 13.9 s CPU for the same probe was the tell). One
    int64 sort replaces it: pack (key, tail) into key·N + tail, np.unique
    dedups AND sorts, unpack. ~0.3 s at 3.5 M triples."""
    keys = all_triples[:, 0].astype(np.int64) * num_keys \
        + all_triples[:, 1]
    packed = np.unique(keys * num_nodes + all_triples[:, 2])
    return (packed // num_nodes).astype(np.int64), \
        (packed % num_nodes).astype(np.int32)


def _assemble_filter_pairs(anchors_p, rels_p, valid, chunk, n_chunks,
                           filt, num_keys):
    """Vectorized per-chunk filter-pair assembly.

    For every (padded) test row, the filtered candidates are the known
    targets sharing its (anchor, rel) key — a searchsorted range in the
    sorted filter table. Returns flat ``rows`` (row-in-chunk), ``cols``
    (candidate ids), per-chunk ``offs``/``cnts``, grouped chunk-major.
    Replaces a per-row python loop (dict gets + per-chunk concatenates)
    that at 231k test triples cost minutes of host time."""
    fkeys, ftails = filt
    qk = anchors_p.astype(np.int64) * num_keys + rels_p
    lo = np.searchsorted(fkeys, qk, side="left")
    hi = np.searchsorted(fkeys, qk, side="right")
    counts = np.where(valid, hi - lo, 0).astype(np.int64)
    total = int(counts.sum())
    starts = np.repeat(lo, counts)
    cum0 = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - np.repeat(cum0, counts)
    cols = ftails[starts + within].astype(np.int32)
    row_global = np.repeat(np.arange(len(anchors_p), dtype=np.int64),
                           counts)
    rows = (row_global % chunk).astype(np.int32)
    cnts = np.bincount(row_global // chunk,
                       minlength=n_chunks).astype(np.int32)
    offs = np.concatenate([[0], np.cumsum(cnts)[:-1]]).astype(np.int32)
    # per-ROW pair windows [bounds[i], bounds[i+1]) into the flat pair
    # table — the scanned path reduces each row's comparison flags by
    # prefix-sum difference at these boundaries (see _scanned_direction)
    bounds = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return (rows, cols, offs, cnts,
            row_global.astype(np.int32), bounds.astype(np.int32))


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


def _f32_matmuls(fn):
    """Trace ``fn`` under full-f32 matmul precision.

    On TPU the DEFAULT matmul precision truncates f32 operands to bf16
    (one MXU pass), so scan 1's (chunk, N) score matmul and scan 2's
    elementwise f32 re-score disagreed at bf16-error level — far past
    the ulp skew the tie-cancellation argument tolerates. Chip-measured
    (scripts/diag_rank_inf.py): 19/20000 tail ranks < 1 (min −3, true
    rank 1) and all-candidate counts off by ~±12 at rank ~12k. HIGHEST
    precision restores exact-f32 products in the matmul; the remaining
    cross-computation skew (reduction order) is back to last-ulp,
    measure-zero for trained continuous embeddings."""
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


def _direction_ranks(score_all_fn, score_fn, dec_params, z, anchors, rels,
                     targets, filt, chunk: int, num_keys: int,
                     mesh=None) -> np.ndarray:
    """Single-dispatch scanned ranking (see module docstring); falls back
    to the per-chunk host loop when the flat filter-pair table would not
    fit device memory. With ``mesh`` the chunks are sharded data-parallel
    over the mesh's devices (ranking is embarrassingly parallel over
    triples) via shard_map."""
    score_all_fn = _f32_matmuls(score_all_fn)
    score_fn = _f32_matmuls(score_fn)
    num = len(anchors)
    # the filter gathers index the (chunk, N) score matrix FLAT in int32
    # (x64 disabled): keep chunk*N < 2^31 or the index wraps negative and
    # mode="clip" silently counts against scores[0, 0]
    chunk = max(1, min(chunk, (2**31 - 1) // max(z.shape[0], 1)))
    n_dev = int(np.prod(list(mesh.shape.values()))) if mesh is not None \
        else 1
    num_pad = ((num + chunk * n_dev - 1) // (chunk * n_dev)) \
        * (chunk * n_dev)
    pad = num_pad - num
    anchors_p = np.concatenate([anchors, np.zeros(pad, anchors.dtype)])
    rels_p = np.concatenate([rels, np.zeros(pad, rels.dtype)])
    targets_p = np.concatenate([targets, np.zeros(pad, targets.dtype)])
    valid = np.concatenate([np.ones(num, bool), np.zeros(pad, bool)])
    n_chunks = num_pad // chunk

    t0 = time.time()
    rows, cols, offs, cnts, rowg, bounds = _assemble_filter_pairs(
        anchors_p, rels_p, valid, chunk, n_chunks, filt, num_keys)
    total = len(rows)
    _tlog(f"assemble pairs: {time.time() - t0:.2f}s total={total} "
          f"n_chunks={n_chunks}")

    if total * 4 * 2 <= 2 << 30:   # flat pair table fits device memory
        return _scanned_direction(
            score_all_fn, score_fn, dec_params, z, chunk,
            anchors_p.reshape(n_chunks, chunk),
            rels_p.reshape(n_chunks, chunk),
            targets_p.reshape(n_chunks, chunk),
            valid.reshape(n_chunks, chunk),
            anchors_p, rels_p, rowg, cols, bounds, mesh=mesh)[:num]

    score_all = jax.jit(score_all_fn)

    ranks = []
    for ci, lo in enumerate(range(0, num_pad, chunk)):
        a = anchors_p[lo:lo + chunk]
        r = rels_p[lo:lo + chunk]
        t = targets_p[lo:lo + chunk]
        v = valid[lo:lo + chunk]

        scores = score_all(dec_params, z, jnp.asarray(a), jnp.asarray(r))
        # true score from the matrix ITSELF (not score_fn): every
        # comparison in this path — _total_counts and the _filter_counts
        # gathers — then reads the same computed values, so the self tie
        # and duplicate ties are bitwise regardless of matmul precision
        true_s = jnp.take_along_axis(scores, jnp.asarray(t)[:, None],
                                     axis=1)[:, 0]

        # the pre-built per-chunk filter pairs, padded to a FIXED bucket
        # ladder (≤ len(ladder) compiled count programs; variable shapes
        # recompiled every chunk — ~15 s each over the tunneled chip);
        # the filtered-candidate counts subtract from the all-candidate
        # counts (_filter_counts — scatter-free, the round-2 scatter
        # chain measured 6.0 ms/triple-dir at PrimeKG++ fan-outs). Pads
        # carry pair_valid=0.
        rows_np = rows[offs[ci]:offs[ci] + cnts[ci]]
        cols_np = cols[offs[ci]:offs[ci] + cnts[ci]]
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
        rank = jnp.maximum(1.0 + higher + 0.5 * ties, 1.0)
        ranks.append(np.asarray(
            jnp.where(jnp.asarray(v), rank, 0.0)))
    return np.concatenate(ranks)[:num]


# pair-tile width for the filter-correction scan: small enough that the
# per-tile working set (a few (PT,) int32/fp32 vectors + a (PT, d) score
# gather) tiles cleanly, large enough to amortize scan overhead
_PAIR_TILE = 1 << 16


def _scanned_direction(score_all_fn, score_fn, dec_params, z, chunk,
                       anchors2, rels2, targets2, valid2, anchors_f,
                       rels_f, rowg, cols, bounds,
                       mesh=None) -> np.ndarray:
    """One direction in TWO jitted lax.scan dispatches.

    Scan 1 (over triple chunks): per-row ALL-candidate comparison counts
    — a (chunk, N) score matmul per step (MXU) plus row reductions.

    Scan 2 (over fixed-width pair tiles): the filtered-candidate
    corrections. Earlier designs indexed the per-chunk score matrix at
    the filter pairs, padding every chunk to the GLOBAL max pair count —
    but at PrimeKG++ scale one hub (h, r) key holds ~1M known targets,
    and both reduction forms hit XLA pathologies at that width
    (segment_sum: colliding-scatter serialization, 29.7 s/direction
    chip-measured; associative_scan at 2^20: 92 s). Instead the flat
    pair table is cut into 2^16-wide tiles; each tile RE-SCORES its
    pairs directly with ``score_fn`` (gather + elementwise + row-sum —
    no dependence on scan 1's transient matrix), prefix-sums the
    comparison flags (int32, exact), and every row accumulates
    P[hi]-P[lo] over its boundary window clamped to the tile — a dense
    (num_pad,) vector add, no scatter anywhere. Work ∝ real pairs.

    Tie consistency: each pass compares LIKE against LIKE. Scan 1 takes
    the true score out of its own score matrix (take_along_axis), so the
    self-tie and any exact-duplicate candidate tie bitwise. Scan 2
    scores each pair's TRUE counterpart in the same tile batch as the
    pair itself — same op at the same shape, so the self-pair correction
    ties bitwise too — and the two cancel exactly in ``ti - fe``.
    Cross-computation ulp skew (matmul reduction order vs elementwise
    dot) can only affect a filtered non-duplicate candidate landing
    within 1 ulp of the true score — measure-zero for continuous
    embeddings. (Two earlier drafts measured the cost of weaker
    invariants: comparing scan 2's re-scores against scan 1's
    ``score_fn`` true score skewed MRR 5% — ``score_fn`` at chunk shape
    and at tile shape compile to different reduction orders, so "same
    function, same inputs" is NOT bitwise across batch shapes.)

    With ``mesh``: scan 1 shards the chunk axis, scan 2 the tile axis
    (z / decoder params / row vectors replicated; per-row corrections
    psum across devices — ranking is embarrassingly parallel, SURVEY
    §2.9 NCCL row)."""
    num_pad = anchors2.size
    total = len(rowg)
    n_dev = 1
    specs = None
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from biomedkg_tpu.parallel.dp import shard_map

        n_dev = int(np.prod(list(mesh.shape.values())))
        axes = tuple(mesh.axis_names)
        specs = (P(axes), P())

    def run_chunks(dec_params, z, A, R, T, V):
        def body(_, xs):
            a, r, t, v = xs
            s = score_all_fn(dec_params, z, a, r)
            # true score from the matrix ITSELF: self/duplicate ties are
            # bitwise (see docstring); score_fn lives in scan 2 only
            ts = jnp.take_along_axis(s, t[:, None], axis=1)[:, 0]
            hi = jnp.sum((s > ts[:, None]).astype(jnp.float32), axis=1)
            ti = jnp.sum((s == ts[:, None]).astype(jnp.float32), axis=1)
            return None, (hi, ti, jnp.where(v, 1.0, 0.0))

        _, (hi, ti, vm) = jax.lax.scan(body, None, (A, R, T, V))
        return hi.reshape(-1), ti.reshape(-1), vm.reshape(-1)

    def run_pairs(dec_params, z, af, rf, tf, blo, bhi, prow, pcol, toff):
        def body(acc, xs):
            prow_t, pcol_t, off = xs
            a = jnp.take(af, prow_t, mode="clip")
            r = jnp.take(rf, prow_t, mode="clip")
            vals = score_fn(dec_params, z, a, pcol_t, r)
            # true-pair scores at the SAME batch shape as the candidate
            # pairs — identical codegen ⇒ the self-pair ties bitwise
            tsp = score_fn(dec_params, z, a,
                           jnp.take(tf, prow_t, mode="clip"), r)
            # int32 prefix sums stay exact past fp32's 2^24 flag
            # ceiling; associative_scan, NOT jnp.cumsum (reduce_window
            # lowering is quadratic at these widths)
            ph = jnp.concatenate([
                jnp.zeros(1, jnp.int32),
                jax.lax.associative_scan(
                    jnp.add, (vals > tsp).astype(jnp.int32))])
            pe = jnp.concatenate([
                jnp.zeros(1, jnp.int32),
                jax.lax.associative_scan(
                    jnp.add, (vals == tsp).astype(jnp.int32))])
            lo = jnp.clip(blo - off, 0, _PAIR_TILE)
            hi = jnp.clip(bhi - off, 0, _PAIR_TILE)
            fh = jnp.take(ph, hi) - jnp.take(ph, lo)
            fe = jnp.take(pe, hi) - jnp.take(pe, lo)
            return (acc[0] + fh.astype(jnp.float32),
                    acc[1] + fe.astype(jnp.float32)), None

        acc0 = (jnp.zeros(af.shape[0], jnp.float32),
                jnp.zeros(af.shape[0], jnp.float32))
        (fh, fe), _ = jax.lax.scan(body, acc0, (prow, pcol, toff))
        if mesh is not None:
            fh = jax.lax.psum(fh, specs[0][0])
            fe = jax.lax.psum(fe, specs[0][0])
        return fh, fe

    if mesh is None:
        fn1, fn2 = jax.jit(run_chunks), jax.jit(run_pairs)
    else:
        sh, rep = specs
        fn1 = jax.jit(shard_map(
            run_chunks, mesh=mesh,
            in_specs=(rep, rep, sh, sh, sh, sh), out_specs=(sh,) * 3))
        fn2 = jax.jit(shard_map(
            run_pairs, mesh=mesh,
            in_specs=(rep, rep, rep, rep, rep, rep, rep, sh, sh, sh),
            out_specs=(rep, rep)))

    # pad the pair table to whole tiles (pad pairs live past every row's
    # boundary window, so their flags are never gathered); tile count a
    # multiple of the device count for the sharded scan
    n_tiles = max(1, -(-total // _PAIR_TILE))
    n_tiles = -(-n_tiles // n_dev) * n_dev
    padded = n_tiles * _PAIR_TILE
    prow = np.zeros(padded, np.int32)
    prow[:total] = rowg
    pcol = np.zeros(padded, np.int32)
    pcol[:total] = cols
    toff = np.arange(n_tiles, dtype=np.int32) * _PAIR_TILE

    t0 = time.time()
    args1 = (dec_params, z, jnp.asarray(anchors2), jnp.asarray(rels2),
             jnp.asarray(targets2), jnp.asarray(valid2))
    args2_tail = (jnp.asarray(anchors_f.astype(np.int32)),
                  jnp.asarray(rels_f.astype(np.int32)),
                  jnp.asarray(bounds[:-1]), jnp.asarray(bounds[1:]),
                  jnp.asarray(prow.reshape(n_tiles, _PAIR_TILE)),
                  jnp.asarray(pcol.reshape(n_tiles, _PAIR_TILE)),
                  jnp.asarray(toff))
    jax.block_until_ready((args1, args2_tail))
    _tlog(f"upload: {time.time() - t0:.2f}s "
          f"(pairs {2 * padded * 4 / 2**20:.1f} MiB, {n_tiles} tiles)")

    def timed(tag, f, *a):
        if not _TIMING:
            return f(*a)
        t0 = time.time()
        compiled = f.lower(*a).compile()
        _tlog(f"compile {tag}: {time.time() - t0:.2f}s")
        t0 = time.time()
        out = compiled(*a)
        # device_get, not block_until_ready: the tunneled-TPU plugin's
        # block_until_ready returns before execution finishes — only a
        # D2H actually synchronizes (outputs here are small row vectors)
        jax.device_get(out)
        _tlog(f"execute {tag}: {time.time() - t0:.2f}s")
        return out

    hi, ti, vm = timed("chunks", fn1, *args1)
    tf = jnp.asarray(np.asarray(targets2).reshape(-1).astype(np.int32))
    fh, fe = timed("pairs", fn2, dec_params, z, args2_tail[0],
                   args2_tail[1], tf, *args2_tail[2:])
    # floor at 1: the true entity always ranks ≥ 1; a residual last-ulp
    # disagreement between the scan-1 matmul and a scan-2 re-score of a
    # candidate EXACTLY tied with the true score could otherwise push a
    # rank-1 triple to 0 and blow up mean(1/rank)
    rank = jnp.maximum(1.0 + (hi - fh) + 0.5 * (ti - fe), 1.0)
    return np.asarray(jnp.where(vm > 0, rank, 0.0))


def filtered_ranking_metrics(decoder, dec_params, z,
                             test_triples: np.ndarray,
                             all_triples: np.ndarray,
                             ks: Sequence[int] = (1, 3, 10),
                             chunk: int = 1024,
                             both_sides: bool = True,
                             mesh=None) -> Dict[str, float]:
    """Compute filtered MRR / Hits@K.

    Args:
      decoder: a decoders.* instance (score / score_all_tails / _heads).
      dec_params: decoder parameter dict.
      z: (N, d) full-graph node embeddings.
      test_triples: (T, 3) int array of (head, rel, tail).
      all_triples: (A, 3) known-true triples (train ∪ val ∪ test) to filter.
      mesh: optional jax Mesh — shards the test triples data-parallel
        over its devices (z + decoder params replicated).
    """
    test_triples = np.asarray(test_triples, dtype=np.int64)
    all_triples = np.asarray(all_triples, dtype=np.int64)

    num_nodes = int(z.shape[0])
    num_keys = int(max(all_triples[:, 1].max(initial=0),
                       test_triples[:, 1].max(initial=0))) + 1
    t0 = time.time()
    tail_filter = _build_filter(all_triples, num_nodes, num_keys)
    head_filter = _build_filter(all_triples[:, [2, 1, 0]], num_nodes,
                                num_keys)
    _tlog(f"build filters: {time.time() - t0:.2f}s "
          f"({len(all_triples)} known triples)")

    t0 = time.time()
    z = jnp.asarray(z)
    jax.block_until_ready(z)
    _tlog(f"z upload: {time.time() - t0:.2f}s "
          f"({z.size * z.dtype.itemsize / 2**20:.0f} MiB)")

    def tails_fn(p, zz, h, t, r):
        return decoder.score(p, zz, h, t, r)

    t0 = time.time()
    tail_ranks = _direction_ranks(
        decoder.score_all_tails, tails_fn, dec_params, z,
        test_triples[:, 0], test_triples[:, 1], test_triples[:, 2],
        tail_filter, chunk, num_keys, mesh=mesh)
    _tlog(f"tail direction total: {time.time() - t0:.2f}s")

    ranks = [tail_ranks]
    if both_sides:
        def heads_fn(p, zz, t, h, r):
            return decoder.score(p, zz, h, t, r)

        t0 = time.time()
        head_ranks = _direction_ranks(
            decoder.score_all_heads, heads_fn, dec_params, z,
            test_triples[:, 2], test_triples[:, 1], test_triples[:, 0],
            head_filter, chunk, num_keys, mesh=mesh)
        _tlog(f"head direction total: {time.time() - t0:.2f}s")
        ranks.append(head_ranks)

    all_ranks = np.concatenate(ranks)
    out = {
        "mrr": float(np.mean(1.0 / all_ranks)),
        "mean_rank": float(np.mean(all_ranks)),
    }
    for k in ks:
        out[f"hits@{k}"] = float(np.mean(all_ranks <= k))
    return out
