"""Unseen-node / inductive generalization protocol (round-2 VERDICT #1).

The BASELINE.json north star requires "unseen-node generalization from
LM-derived attributes"; the reference repo carries the enabling mechanism
(attribute features for nodes absent from training, node.py:33-41 /
embed.py:27-50) but never holds out nodes or measures transfer. These
tests cover the new protocol end-to-end:

  * split invariants (no train edge touches an unseen node; every held
    edge does; the eval graph is seen-only);
  * the paper's core claim, offline: a model trained with INFORMATIVE
    attributes (cluster one-hots / tiny-BERT embeddings of cluster
    tokens) scores high AUROC on edges of held-out nodes, while the same
    model with per-node random init sits at chance;
  * the Stage-A variant routes the attributes through the REAL HF
    tokenizer→model→CLS path (tests/test_stage_a.py fixture);
  * the DPI warm-start path (fix_edge_id) evaluates on unseen drugs.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from biomedkg_tpu.data.inductive import node_pool_for_types, unseen_node_split
from biomedkg_tpu.data.synthetic import (cluster_token, clustered_triplets,
                                         synthetic_dpi)
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.eval.inductive import inductive_eval
from biomedkg_tpu.training.kge_module import KGEModule

N, C, R = 300, 6, 4


def _graph(features: np.ndarray, seed: int = 0):
    df, cluster, _ = clustered_triplets(num_nodes=N, num_clusters=C,
                                        num_relations=R, num_edges=6000,
                                        seed=seed)

    def encoder(names):
        idx = np.array([int(n.split("_")[1]) for n in names])
        return features[idx]

    return TripletGraph(df, encoder=encoder), cluster


def _train_inductive(graph, split, in_dim, seed=0, epochs=400):
    from biomedkg_tpu.sampling.loaders import FullGraphLoader

    mod = KGEModule(encoder_name="rgcn", decoder_name="dismult",
                    in_dim=in_dim, hidden_dim=64, out_dim=32,
                    num_hidden_layers=1, num_relation=R, num_heads=2,
                    scheduler_type="cosine", learning_rate=1e-2,
                    warm_up_ratio=0.05, fuse_method="none", neg_ratio=8,
                    node_init_method="random", cold_start_dropout=0.25)
    mod.configure_optimizers(epochs)
    state = mod.init_state(jax.random.PRNGKey(seed))
    batch = jax.device_put(FullGraphLoader(split.train.graph).batch())
    state, _ = mod.train_fullbatch(state, batch, jax.random.PRNGKey(seed + 1),
                                   epochs)
    return mod, state


def test_split_invariants():
    feats = np.eye(C, dtype=np.float32)[np.zeros(N, int)]
    tg, _ = _graph(feats)
    g = tg.graph
    split = unseen_node_split(g, unseen_ratio=0.15, val_ratio=0.1,
                              test_ratio=0.1, seed=3)
    um = split.unseen_mask
    assert um.sum() == len(split.unseen_nodes) == max(1, round(0.15 * N))

    for sg in (split.train, split.val, split.test):
        s, d = sg.graph.edge_index
        assert not (um[s] | um[d]).any(), "MP edge touches an unseen node"
    s, d = split.eval_graph.edge_index
    assert not (um[s] | um[d]).any()

    for ei in (split.val_edge_index, split.test_edge_index):
        if ei.shape[1]:
            assert (um[ei[0]] | um[ei[1]]).all(), \
                "held-out edge touches no unseen node"

    # conservation: every original edge lands in exactly one bucket
    n_seen = split.eval_graph.num_edges
    n_held = split.val_edge_index.shape[1] + split.test_edge_index.shape[1]
    assert n_seen + n_held == g.num_edges
    # val:test proportion of held edges follows the ratios (0.1 : 0.1)
    assert abs(split.val_edge_index.shape[1]
               - split.test_edge_index.shape[1]) <= n_held * 0.5 + 1


def test_node_pool_restriction():
    df, _, feats = clustered_triplets(num_nodes=60, num_clusters=3,
                                      num_relations=2, num_edges=600, seed=1)
    df.loc[:, "x_type"] = "drug"          # heads drugs, tails genes
    df.loc[:, "y_type"] = "gene"
    tg = TripletGraph(df)
    pool = node_pool_for_types(tg.node_type_of, tg.node_type_names, ["drug"])
    split = unseen_node_split(tg.graph, 0.2, 0.1, 0.1, seed=0,
                              node_pool=pool)
    drug_type = tg.node_type_names.index("drug")
    assert (tg.node_type_of[split.unseen_nodes] == drug_type).all()
    with pytest.raises(ValueError):
        node_pool_for_types(tg.node_type_of, tg.node_type_names, ["nosuch"])


@pytest.mark.slow
def test_lm_features_generalize_random_do_not():
    """The paper's core claim: informative attributes transfer to unseen
    nodes; per-node random init cannot."""
    rng = np.random.default_rng(7)
    df_feats = {}
    _, cluster, onehot = clustered_triplets(num_nodes=N, num_clusters=C,
                                            num_relations=R, num_edges=6000,
                                            seed=0)
    df_feats["informative"] = (
        onehot + rng.standard_normal((N, C)).astype(np.float32) * 0.05)
    df_feats["random"] = rng.standard_normal((N, C)).astype(np.float32)

    auroc = {}
    for kind, feats in df_feats.items():
        tg, _ = _graph(feats)
        split = unseen_node_split(tg.graph, unseen_ratio=0.15,
                                  val_ratio=0.1, test_ratio=0.1, seed=3)
        mod, state = _train_inductive(tg.graph, split, in_dim=C)
        out = inductive_eval(mod, state.params, split, tg.graph,
                             neg_ratio=8, seed=5, ranking=False)
        auroc[kind] = out["unseen_AUROC_mean"]

    # observed: informative 0.87, random 0.48 (cold_start_dropout=0.25;
    # without the augmentation the informative model sits at 0.58 — the
    # encoder ignores features when neighborhoods suffice transductively)
    assert auroc["informative"] >= 0.78, auroc
    assert auroc["random"] <= 0.62, auroc
    assert auroc["informative"] - auroc["random"] >= 0.2, auroc


@pytest.mark.slow
def test_unseen_ranking_beats_chance_with_lm_features():
    rng = np.random.default_rng(11)
    _, cluster, onehot = clustered_triplets(num_nodes=N, num_clusters=C,
                                            num_relations=R, num_edges=6000,
                                            seed=0)
    feats = onehot + rng.standard_normal((N, C)).astype(np.float32) * 0.05
    tg, _ = _graph(feats)
    split = unseen_node_split(tg.graph, 0.15, 0.1, 0.1, seed=3)
    mod, state = _train_inductive(tg.graph, split, in_dim=C)
    out = inductive_eval(mod, state.params, split, tg.graph, neg_ratio=4,
                         seed=5, ranking=True, max_rank_triples=256)
    # cluster structure bounds exact ranking: within the correct cluster
    # (~N/C = 50 equivalent candidates) tails are random, so the
    # perfect-cluster-knowledge MRR is ≈ H(50)/50 ≈ 0.09 and chance is
    # ≈ H(300)/300 ≈ 0.02. Observed 0.045 — solidly between.
    assert out["unseen_mrr"] >= 0.035, out
    assert out["unseen_hits@10"] >= 0.06, out
    assert out["unseen_num_test_edges"] > 0


@pytest.mark.slow
def test_stage_a_lm_path_inductive(tmp_path, monkeypatch):
    """Attributes routed through the REAL HF tokenizer→model→CLS path:
    unseen nodes with the same cluster token inherit their cluster's LM
    embedding and the model transfers (cold start through Stage A)."""
    import pandas as pd
    import yaml

    from tests.test_stage_a import _write_tiny_bert

    model_dir = _write_tiny_bert(str(tmp_path / "tiny-bert"))
    df, cluster, _ = clustered_triplets(num_nodes=N, num_clusters=C,
                                        num_relations=R, num_edges=6000,
                                        seed=0)
    names = [f"ent_{i:06d}" for i in range(N)]
    csv_path = str(tmp_path / "nodes.csv")
    pd.DataFrame({
        "name": names,
        "desc": [cluster_token(int(c)) for c in cluster],
    }).to_csv(csv_path, index=False)
    conf_path = str(tmp_path / "modality.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump({"entity": {
            "file_name": csv_path,
            "idetifier_column": "name",
            "modality_columns": ["desc"],
            "model_name_for_each_modality": [model_dir],
        }}, f)
    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from biomedkg_tpu.data.node_encoders import LMMultiModalsEncode

    enc = LMMultiModalsEncode(config_file=conf_path, embed_dim=768)
    lm = np.asarray(enc(names), np.float32)     # (N, 1, 768)
    # project to a cheap input width and CENTER: the singleton-modality
    # L2 norm turns each CLS vector into a ±1 sign pattern; a fixed
    # random projection (vs slicing — two clusters' signs can agree on
    # any 16 fixed coords) keeps distinct patterns distinct, and
    # removing the across-node mean leaves the cluster signal dominant.
    proj = np.random.default_rng(0).standard_normal((768, 16)) \
        .astype(np.float32) / np.sqrt(768)
    feats = lm[:, 0, :] @ proj
    feats = feats - feats.mean(axis=0, keepdims=True)
    feats = feats / np.maximum(feats.std(axis=0, keepdims=True), 1e-6)
    same = cluster[:, None] == cluster[None, :]
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    assert d2[same].max() < d2[~same][d2[~same] > 0].min() + 1e-4, \
        "tiny-BERT cluster embeddings are not separable"

    tg, _ = _graph(feats)
    split = unseen_node_split(tg.graph, 0.15, 0.1, 0.1, seed=3)
    mod, state = _train_inductive(tg.graph, split, in_dim=16)
    out = inductive_eval(mod, state.params, split, tg.graph, neg_ratio=8,
                         seed=5, ranking=False)
    assert out["unseen_AUROC_mean"] >= 0.75, out


@pytest.mark.slow
def test_dpi_warm_start_unseen_drugs():
    """fix_edge_id warm-start path (reference train_dpi.py:24-36) trains
    and cold-start-evaluates on held-out drug nodes."""
    rng = np.random.default_rng(2)
    df = synthetic_dpi(num_drug=120, num_gene=200, num_edges=2500, seed=4)
    tg = TripletGraph(df, encoder=lambda ns: rng.standard_normal(
        (len(ns), 12)).astype(np.float32))
    pool = node_pool_for_types(tg.node_type_of, tg.node_type_names, ["drug"])
    split = unseen_node_split(tg.graph, 0.2, 0.1, 0.1, seed=0,
                              node_pool=pool)

    from biomedkg_tpu.sampling.loaders import FullGraphLoader

    mod = KGEModule(encoder_name="rgcn", decoder_name="transe", in_dim=12,
                    hidden_dim=32, out_dim=16, num_hidden_layers=1,
                    num_relation=tg.graph.num_relations, num_heads=2,
                    scheduler_type="cosine", learning_rate=5e-3,
                    warm_up_ratio=0.05, fuse_method="none", neg_ratio=4,
                    node_init_method="random", cold_start_dropout=0.25)
    mod.fix_edge_id = 0
    mod.configure_optimizers(50)
    state = mod.init_state(jax.random.PRNGKey(0))
    batch = jax.device_put(FullGraphLoader(split.train.graph).batch())
    state, loss = mod.train_fullbatch(state, batch, jax.random.PRNGKey(1),
                                      50)
    assert float(loss) < 0.69  # below the untrained-BCE starting point
    out = inductive_eval(mod, state.params, split, tg.graph, neg_ratio=3,
                         seed=1, ranking=False)
    assert "unseen_AUROC_mean" in out
    assert out["unseen_num_test_edges"] > 0
