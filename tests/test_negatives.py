"""Negative-sampling semantics: counts, type shuffling, and the collision
rate of rejection-free corruption vs PyG's observed-pair exclusion
(SURVEY §7 hard-parts: quantify the distribution difference)."""

import jax
import numpy as np

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph


def test_collision_rate_is_negligible():
    """Uniform corrupted pairs hitting a true edge: ≈ E/N² on the synthetic
    PrimeKG-schema graph; must stay well under 1%."""
    df = synthetic_triplets(num_gene=2000, num_drug=600, num_disease=400,
                            num_edges=40000, seed=0)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=4))
    g = tg.graph
    true = set(zip(g.edge_index[0].tolist(), g.edge_index[1].tolist()))
    rng = np.random.default_rng(1)
    m = 200_000
    src = rng.integers(0, g.num_nodes, m)
    dst = rng.integers(0, g.num_nodes, m)
    collisions = sum((s, d) in true for s, d in zip(src, dst))
    assert collisions / m < 0.01
    # analytic bound: E / N²
    assert collisions / m < 5 * g.num_edges / g.num_nodes ** 2 + 1e-3


def test_negative_count_and_type_shuffle():
    """neg_ratio=r → r·E negatives whose type multiset equals r repeats of
    the batch types (kge_module.py:86-102 semantics)."""
    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import KGEModule

    rng = np.random.default_rng(0)
    n, e, r = 50, 200, 3
    x = rng.standard_normal((n, 8)).astype(np.float32)
    ei = rng.integers(0, n, (2, e))
    et = rng.integers(0, r, e)
    batch = pad_graph_batch(x, ei, et, num_relations=r, node_budget=64,
                            edge_budget=384, block_size=64)
    assert int(batch.edge_mask.sum()) == e  # nothing dropped

    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=8, hidden_dim=8,
        out_dim=8, num_hidden_layers=0, num_relation=r, num_heads=1,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    params = module.init(jax.random.PRNGKey(0))
    _, aux = module._forward_loss(params, batch, jax.random.PRNGKey(1),
                                  training=False)
    e_pad = batch.edge_index.shape[1]
    # predictions: E_pad positives + 2·E_pad negatives
    assert aux["pred"].shape[0] == 3 * e_pad
    w = np.asarray(aux["weights"])
    # real positives + real negatives = E + 2E
    assert int(w.sum()) == 3 * e
    # negative type multiset (over real negatives) = 2 repeats of batch types
    neg_w = w[e_pad:]
    # reconstruct neg types from the loss aux is not exposed; instead check
    # the weighted count matches: each real edge contributes its type twice.
    assert int(neg_w.sum()) == 2 * e


def test_filtered_negatives_exclude_observed_pairs():
    """filter_negatives=True: sampled negatives collide with batch edges at
    (near) zero rate — the PyG negative_sampling eval protocol — while the
    default rejection-free path keeps its quantified small collision rate.
    A dense small graph makes unfiltered collisions frequent enough to
    detect the difference."""
    import jax.numpy as jnp

    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import KGEModule

    rng = np.random.default_rng(3)
    n, e, r = 32, 400, 2  # ~40% of all pairs are edges → collisions certain
    x = rng.standard_normal((n, 8)).astype(np.float32)
    ei = rng.integers(0, n, (2, e))
    et = rng.integers(0, r, e)
    batch = pad_graph_batch(x, ei, et, num_relations=r, node_budget=64,
                            edge_budget=512, block_size=64)

    def collisions(module, key):
        """Count sampled-negative hits on real batch edges by replaying
        the module's rng stream (same splits as _forward_loss)."""
        params = module.init(jax.random.PRNGKey(0))
        # run the real loss once to make sure the path executes
        loss, _ = module._forward_loss(params, batch, key, training=False)
        assert np.isfinite(float(loss))
        # replicate sampling (+ the same filtering rounds if enabled)
        _, _, r_neg, r_perm = jax.random.split(key, 4)
        r_s, r_d = jax.random.split(r_neg)
        ratio, num_edges = module.neg_ratio, batch.edge_type.shape[0]
        nreal = int(batch.node_mask.sum())
        ns = (jax.random.uniform(r_s, (ratio, num_edges)) * nreal
              ).astype(jnp.int32)
        nd = (jax.random.uniform(r_d, (ratio, num_edges)) * nreal
              ).astype(jnp.int32)
        if module.filter_negatives:
            n_pad = batch.node_mask.shape[0]
            big = np.iinfo(np.int32).max
            keys = np.where(batch.edge_mask,
                            batch.edge_index[0].astype(np.int64) * n_pad
                            + batch.edge_index[1], big)
            keys = np.sort(keys)

            def observed(a, b):
                cand = np.asarray(a).astype(np.int64) * n_pad + np.asarray(b)
                pos = np.searchsorted(keys, cand.reshape(-1)).reshape(
                    cand.shape)
                found = keys[np.minimum(pos, len(keys) - 1)]
                return (pos < len(keys)) & (found == cand)

            ns, nd = np.asarray(ns), np.asarray(nd)
            for i in range(3):
                hit = observed(ns, nd)
                rr = jax.random.fold_in(r_perm, i)
                rs2, rd2 = jax.random.split(rr)
                res_s = np.asarray((jax.random.uniform(rs2, ns.shape)
                                    * nreal)).astype(np.int32)
                res_d = np.asarray((jax.random.uniform(rd2, nd.shape)
                                    * nreal)).astype(np.int32)
                ns = np.where(hit, res_s, ns)
                nd = np.where(hit, res_d, nd)
        true = set(zip(batch.edge_index[0][batch.edge_mask].tolist(),
                       batch.edge_index[1][batch.edge_mask].tolist()))
        ns, nd = np.asarray(ns).ravel(), np.asarray(nd).ravel()
        return sum((a, b) in true for a, b in zip(ns, nd)) / len(ns)

    def make(filtered):
        m = KGEModule(
            encoder_name="rgcn", decoder_name="dismult", in_dim=8,
            hidden_dim=8, out_dim=8, num_hidden_layers=0, num_relation=r,
            num_heads=1, scheduler_type="cosine", learning_rate=1e-3,
            warm_up_ratio=0.2, fuse_method="none", neg_ratio=4,
            node_init_method="random")
        m.filter_negatives = filtered
        return m

    key = jax.random.PRNGKey(7)
    rate_plain = collisions(make(False), key)
    rate_filtered = collisions(make(True), key)
    assert rate_plain > 0.1, rate_plain          # dense graph → many hits
    # 3 rejection rounds at hit-rate p leave ~p^4 residue
    assert rate_filtered < rate_plain ** 3, (rate_filtered, rate_plain)


def test_filtered_negatives_gradient_path():
    """The filtering rounds sit inside the jitted train step — the grad
    path must stay finite and collision-free sampling must not detach the
    negatives from the loss."""
    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import KGEModule

    rng = np.random.default_rng(4)
    n, e, r = 48, 300, 2
    x = rng.standard_normal((n, 8)).astype(np.float32)
    batch = pad_graph_batch(x, rng.integers(0, n, (2, e)),
                            rng.integers(0, r, e), num_relations=r,
                            node_budget=64, edge_budget=384, block_size=64)
    m = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=8, hidden_dim=8,
        out_dim=8, num_hidden_layers=0, num_relation=r, num_heads=1,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    m.filter_negatives = True
    m.configure_optimizers(2)
    state = m.init_state(jax.random.PRNGKey(0))
    state, logs = m.train_step(state, jax.device_put(batch),
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_loss"]))


def test_sorted_sampler_uniform_marginals_and_stratification():
    """The stratified-sorted sampler (kge_module.sample_negatives_sorted):

    * per-slot source marginals are exactly uniform across steps (mixture
      of all order statistics of an iid sample = sampling distribution);
    * sources are sorted (the Pallas fast-scatter precondition);
    * each edge's K negatives stratify across K node bands per step.
    """
    import jax

    from biomedkg_tpu.training.kge_module import sample_negatives_sorted

    K, E, N = 4, 250, 200
    counts = np.zeros(N)
    edge17_srcs = []
    for step in range(200):
        r = jax.random.fold_in(jax.random.PRNGKey(7), step)
        r1, r2, r3 = jax.random.split(r, 3)
        ns, nd, off = sample_negatives_sorted(r1, r2, r3, K, E, N)
        ns, off = np.asarray(ns), np.asarray(off)
        slot_edge = (np.arange(E)[None, :] + off[:, None]) % E
        assert np.all(np.diff(ns) >= 0)          # sorted
        assert ns.min() >= 0 and ns.max() < N
        np.add.at(counts, ns, 1)
        # edge 17's K sources, one per band
        rows, cols = np.where(slot_edge == 17)
        srcs = ns.reshape(K, E)[rows, cols]
        edge17_srcs.append(np.sort(srcs))
    # uniform marginals: chi-square-ish bound on per-node counts
    total = counts.sum()
    expected = total / N
    assert abs(counts.mean() - expected) < 1e-9
    z = (counts - expected) / np.sqrt(expected)
    assert np.abs(z).max() < 5.0, "per-node source frequency not uniform"
    # stratification: the k-th (sorted) source lies in band k
    arr = np.stack(edge17_srcs)                   # (steps, K)
    band = N / K
    in_band = np.abs(arr / band - (np.arange(K) + 0.5)) <= 0.5 + 0.05
    assert in_band.mean() > 0.95
    # dst iid sanity
    nd = np.asarray(nd)
    assert nd.min() >= 0 and nd.max() < N


def _circular_span(vals, N):
    """Smallest arc of the id circle [0, N) containing all values —
    wrap-agnostic band width."""
    u = np.unique(vals)
    if len(u) == 1:
        return 1
    gaps = np.diff(np.concatenate([u, [u[0] + N]]))
    return N - gaps.max()


def test_sorted2_dual_sampler_marginals():
    """The dual-banded ("sorted2") sampler: nd is per-BLOCK-chunk iid
    uniform inside a randomly-placed narrow band (the `_ds` kernel
    precondition is a narrow span, NOT sorted order), per-slot dst
    marginals are uniform across steps, dst is independent of src, and
    band placements are mutually independent (2-D support patches, not
    the single global curve of the round-2 lattice-sampler failure
    mode)."""
    import jax

    from biomedkg_tpu.ops.pallas.negscore import BLOCK
    from biomedkg_tpu.training.kge_module import sample_negatives_sorted

    K, N = 4, 200
    E = BLOCK // 2  # ke = 2 chunks → exercises the aligned per-chunk path
    ke = K * E
    nc = ke // BLOCK
    assert ke % BLOCK == 0
    counts = np.zeros(N)
    probe_slots = [0, 137, BLOCK + 17, ke - 1]
    slot_vals = {j: [] for j in probe_slots}
    slot0 = {"ns": [], "nd": []}
    band_mins = []
    steps = 200
    for step in range(steps):
        r = jax.random.fold_in(jax.random.PRNGKey(11), step)
        r1, r2, r3 = jax.random.split(r, 3)
        ns, nd, off = sample_negatives_sorted(r1, r2, r3, K, E, N,
                                              dual=True)
        nd = np.asarray(nd)
        assert nd.min() >= 0 and nd.max() < N
        for c in range(nc):
            chunk = nd[c * BLOCK:(c + 1) * BLOCK]
            # narrow band: circular span ≤ N/nc (+1 rounding slack)
            assert _circular_span(chunk, N) <= N // nc + 1
            if c == 0:
                band_mins.append(int(chunk.min()))
        np.add.at(counts, nd, 1)
        for j in probe_slots:
            slot_vals[j].append(int(nd[j]))
        slot0["ns"].append(int(np.asarray(ns)[137]))
        slot0["nd"].append(int(nd[137]))
    # Per-SLOT marginal uniformity across (independent) steps — the
    # exact-uniform mixture claim. Per-step per-NODE counts are
    # cluster-over-dispersed by design (each chunk covers one narrow
    # band), so a pooled-count chi-square bound would be wrong.
    nbins = 8
    for j, vals in slot_vals.items():
        hist = np.bincount(np.asarray(vals) * nbins // N, minlength=nbins)
        zb = (hist - steps / nbins) / np.sqrt(steps / nbins)
        assert np.abs(zb).max() < 5.0, (j, hist)
    # every node reachable (aggregate coverage over steps)
    assert (counts > 0).all()
    # src/dst independence at a fixed slot across steps
    a = np.asarray(slot0["ns"], float)
    b = np.asarray(slot0["nd"], float)
    corr = np.corrcoef(a, b)[0, 1]
    assert abs(corr) < 0.3, corr
    # band placement varies across steps (fresh randomness per step)
    assert len(set(band_mins)) > 20


def test_sorted2_unaligned_degrades_to_iid():
    """ke not divisible by BLOCK (never reaches the fused kernels): the
    sampler degrades to a single full-range band = plain iid uniform —
    the fallback decoder path's contract."""
    import jax

    from biomedkg_tpu.training.kge_module import sample_negatives_sorted

    K, E, N = 4, 250, 200
    r1, r2, r3 = jax.random.split(jax.random.PRNGKey(5), 3)
    ns, nd, off = sample_negatives_sorted(r1, r2, r3, K, E, N, dual=True)
    nd = np.asarray(nd)
    assert nd.min() >= 0 and nd.max() < N
    assert len(np.unique(nd)) > N // 2  # full-range coverage in one draw
