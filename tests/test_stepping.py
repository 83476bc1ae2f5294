"""Fused multi-step execution (lax.scan) and trainer integration."""

import jax
import numpy as np

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.parallel.dp import stack_batches
from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader
from biomedkg_tpu.training.kge_module import KGEModule
from biomedkg_tpu.training.trainer import Trainer

DIM = 16


def _setup():
    df = synthetic_triplets(num_gene=100, num_drug=40, num_disease=30,
                            num_edges=1500, seed=9)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=DIM))
    loader = SaintRandomWalkLoader(tg.graph, batch_size=8, walk_length=5,
                                   num_steps=8, block_size=64, seed=1)
    module = KGEModule(
        encoder_name="rgcn", decoder_name="dismult", in_dim=DIM,
        hidden_dim=DIM, out_dim=DIM, num_hidden_layers=1,
        num_relation=tg.num_edge_types, num_heads=2,
        scheduler_type="cosine", learning_rate=1e-3, warm_up_ratio=0.2,
        fuse_method="none", neg_ratio=2, node_init_method="random")
    return tg, loader, module


def test_train_steps_scan_advances_k_steps():
    _, loader, module = _setup()
    module.configure_optimizers(16)
    state = module.init_state(jax.random.PRNGKey(0))
    batches = [b for b in loader][:4]
    stacked = stack_batches(batches)
    state, logs = module.train_steps(state, stacked,
                                     jax.random.PRNGKey(1))
    assert int(state.step) == 4
    assert np.isfinite(logs["train_loss"])


def test_trainer_steps_per_execution_matches_per_step_count():
    _, loader, module = _setup()
    trainer = Trainer(max_epochs=1, enable_progress_bar=False,
                      steps_per_execution=3)
    trainer.fit(module, loader, None)
    # 8 batches → 2 fused groups of 3 + 2 leftover singles
    assert trainer.global_step == 8
    assert int(trainer.state.step) == 8
    assert np.isfinite(trainer.history[0]["train_loss_epoch"])


def test_dst_bwd_perm_whole_step_parity():
    """dst_bwd="perm" (sorted-kernel gradient reduction via the shipped
    copy, encoder h_all + pos-path head) must reproduce the scatter
    path's loss and grads on a full KGE forward/backward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from biomedkg_tpu.sampling.batch import pad_graph_batch
    from biomedkg_tpu.training.kge_module import KGEModule

    rng = np.random.default_rng(0)
    N, E, R, D = 60, 400, 4, 16
    x = rng.standard_normal((N, D)).astype(np.float32)
    ei = rng.integers(0, N, (2, E)).astype(np.int64)
    et = rng.integers(0, R, E).astype(np.int32)
    batch = pad_graph_batch(x, ei, et, num_relations=R, node_budget=64,
                            edge_budget=512, block_size=64, layout="dst")

    mod = KGEModule(encoder_name="rgcn", decoder_name="dismult", in_dim=D,
                    hidden_dim=32, out_dim=16, num_hidden_layers=1,
                    num_relation=R, num_heads=2, scheduler_type="cosine",
                    learning_rate=1e-3, warm_up_ratio=0.1,
                    fuse_method="none", neg_ratio=4,
                    node_init_method="random")
    mod.edge_layout = "dst"
    params = mod.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    outs = {}
    for mode in ("scatter", "perm"):
        mod.dst_bwd = mode

        def loss_fn(p):
            loss, _ = mod._forward_loss(p, batch, key, training=True)
            return loss

        v, g = jax.value_and_grad(loss_fn)(params)
        outs[mode] = (float(v), g)
    assert abs(outs["perm"][0] - outs["scatter"][0]) < 1e-5
    for a, b in zip(jax.tree_util.tree_leaves(outs["perm"][1]),
                    jax.tree_util.tree_leaves(outs["scatter"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
