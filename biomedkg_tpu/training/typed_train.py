"""Typed-table full-batch KGE training (models/typed.py; VERDICT #9).

``train_kge.py typed_tables=true`` routes here: encode per-type tables
through the typed RGCN (exact homogeneous parity, tests/test_typed.py),
score with the standard decoder on the concatenated tables, train
full-batch with iid corruption, and report the reference's binary test
metrics. The train split's edges drive both message passing and
supervision (the reference's own protocol, kge_module.py:109-206)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.typed import (concat_tables, to_typed, typed_encode,
                            typed_encode_batch)
from .metrics import BootstrappedBinaryMetrics


def typed_full_train(model, data_module, cfg):
    tg = data_module.data
    enc = model.model.encoder
    dec = model.model.decoder
    neg_ratio = model.neg_ratio or 1

    # typed view restricted to the train split's message-passing edges
    class _View:
        graph = data_module.train_data.graph
        type_offset = tg.type_offset
        node_type_of = tg.node_type_of

    typed = to_typed(_View)
    n = typed.num_nodes

    r1, r2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    params = {"encoder": enc.init(r1), "decoder": dec.init(r2)}
    steps = int(cfg.get("typed_steps", 300)) * max(1, cfg.epochs)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(model.lr))
    opt = tx.init(params)

    g = data_module.train_data.graph
    src = jnp.asarray(g.edge_index[0].astype(np.int32))
    dst = jnp.asarray(g.edge_index[1].astype(np.int32))
    rel = jnp.asarray(g.edge_type.astype(np.int32))

    @jax.jit
    def step(params, opt, rng):
        def loss_fn(p):
            z = concat_tables(typed_encode(p["encoder"], typed),
                              typed.type_names)
            pos = dec.score(p["decoder"], z, src, dst, rel)
            r_s, r_d = jax.random.split(rng)
            ns = jax.random.randint(r_s, (neg_ratio,) + rel.shape, 0, n)
            nd = jax.random.randint(r_d, (neg_ratio,) + rel.shape, 0, n)
            neg = dec.score_neg(p["decoder"], z, ns, nd, rel).reshape(-1)
            pred = jnp.concatenate([pos, neg])
            gt = jnp.concatenate([jnp.ones_like(pos),
                                  jnp.zeros_like(neg)])
            bce = jnp.mean(-(gt * jax.nn.log_sigmoid(pred)
                             + (1 - gt) * jax.nn.log_sigmoid(-pred)))
            reg = sum(jnp.mean(v ** 2) for v in
                      jax.tree_util.tree_leaves(p["decoder"]))
            return bce + 1e-2 * (jnp.mean(z ** 2) + reg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(cfg.seed + 1)
    t0 = time.perf_counter()
    for i in range(steps):
        key, r = jax.random.split(key)
        params, opt, loss = step(params, opt, r)
        if i % 100 == 0 or i == steps - 1:
            print(f"[typed {i}/{steps}] loss={float(loss):.4f}",
                  flush=True)
    print(f"typed full-batch training: {steps} steps in "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    return _typed_binary_test(params, typed, enc, dec, data_module,
                              neg_ratio, cfg.seed)


def _typed_binary_test(params, typed, enc, dec, data_module, neg_ratio,
                       seed):
    """Binary test metrics, reference protocol (sampled negatives),
    scored on the full-graph typed encode."""
    n = typed.num_nodes
    z = concat_tables(typed_encode(params["encoder"], typed),
                      typed.type_names)
    te = data_module.test_data
    tsrc = jnp.asarray(te.label_edge_index[0].astype(np.int32))
    tdst = jnp.asarray(te.label_edge_index[1].astype(np.int32))
    trel = jnp.asarray(te.label_edge_type.astype(np.int32))
    pos = np.asarray(dec.score(params["decoder"], z, tsrc, tdst, trel))
    rng = np.random.default_rng(seed)
    negs = []
    for _ in range(max(1, neg_ratio)):
        ns = jnp.asarray(rng.integers(0, n, len(pos)).astype(np.int32))
        nd = jnp.asarray(rng.integers(0, n, len(pos)).astype(np.int32))
        negs.append(np.asarray(dec.score(params["decoder"], z, ns, nd,
                                         trel)))
    neg = np.concatenate(negs)
    m = BootstrappedBinaryMetrics(prefix="test_")
    m.update(np.concatenate([pos, neg]),
             np.concatenate([np.ones_like(pos), np.zeros_like(neg)]))
    out = m.compute()
    print("typed-table test metrics:")
    for k in sorted(out):
        print(f"  {k}: {out[k]:.6f}")
    return out


def make_typed_batch_loss(encoder, decoder, neg_ratio: int):
    """Shared typed-SAINT loss: masked BCE over the pos+neg concat on the
    concatenated per-type tables, iid corruption over the real batch
    rows, decoder/table L2. Used by BOTH the single-device jitted step
    (typed_saint_train) and the GSPMD row-sharded step
    (parallel/typed_shard.make_typed_spmd_step) so the two paths cannot
    drift. Honors ``encoder.drop_out`` (inter-layer dropout(0.2), same
    placement as the homogeneous RGCN path)."""

    def loss_fn(p, rng, batch, flat_real, n_real):
        r_drop, r_s, r_d = jax.random.split(rng, 3)
        tables = typed_encode_batch(p["encoder"], batch, rng=r_drop,
                                    training=True,
                                    drop_out=encoder.drop_out)
        z = concat_tables(tables, list(batch.x.keys()))
        src, dst, rel = batch.pos[0], batch.pos[1], batch.pos[2]
        w = batch.pos[3].astype(jnp.float32)
        pos = decoder.score(p["decoder"], z, src, dst, rel)
        shape = (neg_ratio,) + rel.shape
        js = jax.random.randint(r_s, shape, 0, n_real)
        jd = jax.random.randint(r_d, shape, 0, n_real)
        neg = decoder.score_neg(p["decoder"], z, flat_real[js],
                                flat_real[jd], rel)
        # masked BCE over the pos+neg concat (same element weighting as
        # the full-batch path / KGEModule)
        wsum = jnp.maximum(w.sum(), 1.0) * (1 + neg_ratio)
        bce = (jnp.sum(-jax.nn.log_sigmoid(pos) * w)
               + jnp.sum(-jax.nn.log_sigmoid(-neg) * w[None, :])) / wsum
        reg = sum(jnp.mean(v ** 2) for v in
                  jax.tree_util.tree_leaves(p["decoder"]))
        return bce + 1e-2 * (jnp.mean(z ** 2) + reg)

    return loss_fn


def typed_saint_train(model, data_module, cfg):
    """Typed-table SAINT sub-batch training (ROADMAP #7):
    ``train_kge.py typed_tables=true typed_loader=saint``.

    The reference's GraphSAINT regime (random-walk roots, induced
    subgraph, batch edges as both message passing and supervision,
    data_module.py:100-107) over the hetero-native layout: every batch
    is per-type tables + per-signature single-relation edge blocks in
    ONE static envelope, so a single compiled step serves the run. Test
    metrics are computed on the full-graph typed encode, identical to
    the full-batch path."""
    from ..sampling.typed_batch import TypedSaintSampler

    tg = data_module.data
    enc = model.model.encoder
    dec = model.model.decoder
    neg_ratio = model.neg_ratio or 1

    sampler = TypedSaintSampler(
        data_module.train_data.graph, tg.node_type_of, tg.node_type_names,
        batch_size=data_module.batch_size,
        walk_length=data_module.SAINT_WALK_LENGTH,
        num_steps=int(cfg.get("typed_steps", 300)),
        seed=cfg.seed,
        sig_graph=data_module._probe_graph())

    r1, r2 = jax.random.split(jax.random.PRNGKey(cfg.seed))
    params = {"encoder": enc.init(r1), "decoder": dec.init(r2)}
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(model.lr))
    opt = tx.init(params)

    batch_loss = make_typed_batch_loss(enc, dec, neg_ratio)

    @jax.jit
    def step(params, opt, rng, batch, flat_real, n_real):
        loss, grads = jax.value_and_grad(batch_loss)(
            params, rng, batch, flat_real, n_real)
        updates, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt, loss

    key = jax.random.PRNGKey(cfg.seed + 1)
    t0 = time.perf_counter()
    n_steps = 0
    for epoch in range(max(1, cfg.epochs)):
        sampler.set_epoch(epoch)
        for batch in sampler:
            flat, n_real = sampler.flat_real(batch)
            key, r = jax.random.split(key)
            params, opt, loss = step(params, opt, r, batch,
                                     jnp.asarray(flat), n_real)
            if n_steps % 100 == 0:
                print(f"[typed-saint {n_steps}] loss={float(loss):.4f}",
                      flush=True)
            n_steps += 1
    print(f"typed SAINT training: {n_steps} steps in "
          f"{time.perf_counter() - t0:.1f}s "
          f"(dropped_edges={sampler.dropped_edges})", flush=True)

    class _View:
        graph = data_module.train_data.graph
        type_offset = tg.type_offset
        node_type_of = tg.node_type_of

    typed = to_typed(_View)
    return _typed_binary_test(params, typed, enc, dec, data_module,
                              neg_ratio, cfg.seed)
