"""Data layer: triplet construction, splits, samplers, data modules."""

import numpy as np
import pytest

from biomedkg_tpu.data.split import random_link_split
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.sampling.csr import CSRGraph
from biomedkg_tpu.sampling.loaders import FullGraphLoader
from biomedkg_tpu.sampling.neighbor import NeighborBatchLoader
from biomedkg_tpu.sampling.loaders import SaintRandomWalkLoader


@pytest.fixture(scope="module")
def small_graph():
    df = synthetic_triplets(num_gene=200, num_drug=80, num_disease=50,
                            num_edges=3000, seed=7)
    tg = TripletGraph(df, encoder=RandomEncode(embed_dim=32))
    return tg


def test_triplet_construction(small_graph):
    tg = small_graph
    g = tg.graph
    assert g.num_nodes == len(tg.node_list)
    assert g.x.shape == (g.num_nodes, 32)
    assert g.num_relations == len(tg.edge_map_index)
    # node names sorted within each type, types in np.unique order
    # (reference _base.py:44-47 sorted-unique semantics)
    assert g.edge_index.max() < g.num_nodes
    assert g.edge_index.min() >= 0
    # every edge respects its relation's (head_type, tail_type) signature
    df = tg.df
    for edge_id, rel in tg.edge_map_index.items():
        sel = g.edge_type == edge_id
        assert sel.sum() > 0
        sub = df[df["relation"] == rel]
        assert sel.sum() == len(sub.drop_duplicates(
            subset=["x_name", "y_name"]))


def test_random_link_split(small_graph):
    g = small_graph.graph
    train, val, test = random_link_split(g, 0.2, 0.2, seed=0)
    E = g.num_edges
    assert val.label_edge_index.shape[1] == int(E * 0.2)
    assert test.label_edge_index.shape[1] == int(E * 0.2)
    assert train.label_edge_index.shape[1] == E - 2 * int(E * 0.2)
    # PyG semantics: train/val message passing over train edges;
    # test over train+val
    assert train.graph.num_edges == train.label_edge_index.shape[1]
    assert val.graph.num_edges == train.graph.num_edges
    assert test.graph.num_edges == (train.graph.num_edges
                                    + val.label_edge_index.shape[1])
    # disjoint supervision sets
    def keyset(ei, et):
        return set(zip(ei[0], ei[1], et))
    k_train = keyset(train.label_edge_index, train.label_edge_type)
    k_val = keyset(val.label_edge_index, val.label_edge_type)
    k_test = keyset(test.label_edge_index, test.label_edge_type)
    # synthetic graph deduplicates triples so keys are unique
    assert not (k_val & k_test)


def test_saint_loader_shapes(small_graph):
    g = small_graph.graph
    loader = SaintRandomWalkLoader(g, batch_size=16, walk_length=10,
                                   num_steps=5, block_size=64, seed=3)
    shapes = set()
    for batch in loader:
        shapes.add((batch.x.shape, batch.edge_index.shape))
        assert batch.edge_mask.any()
        # real edges all connect real nodes
        real = batch.edge_mask
        assert batch.node_mask[batch.edge_index[0, real]].all()
        assert batch.node_mask[batch.edge_index[1, real]].all()
    assert len(shapes) == 1  # static shapes across the epoch


def test_saint_induced_subgraph_correct(small_graph):
    g = small_graph.graph
    loader = SaintRandomWalkLoader(g, batch_size=8, walk_length=5,
                                   num_steps=1, block_size=64, seed=4)
    batch, nodes = loader.sample()
    # every real edge exists in the global graph with the same relation
    global_edges = set(zip(g.edge_index[0], g.edge_index[1], g.edge_type))
    real = batch.edge_mask
    for s, d, t in zip(batch.edge_index[0, real], batch.edge_index[1, real],
                       batch.edge_type[real]):
        assert (nodes[s], nodes[d], t) in global_edges


def test_neighbor_loader(small_graph):
    g = small_graph.graph
    loader = NeighborBatchLoader(g, batch_size=32, fanouts=[5, 5],
                                 shuffle=True, block_size=64, seed=5)
    seen_seeds = 0
    shapes = set()
    for batch in loader:
        shapes.add(batch.x.shape)
        seen_seeds += int(batch.num_seed)
        real = batch.edge_mask
        if real.any():
            # in-neighbor sampling: fanout bound respected per hop-node
            dst_counts = np.bincount(batch.edge_index[1, real])
            assert dst_counts.max() <= 10  # ≤ 5 per hop, node in ≤2 hops
    assert seen_seeds == g.num_nodes
    assert len(shapes) == 1


def test_full_graph_loader(small_graph):
    g = small_graph.graph
    batch = FullGraphLoader(g, block_size=64).batch()
    assert int(batch.edge_mask.sum()) == g.num_edges
    assert int(batch.node_mask.sum()) == g.num_nodes


def test_modules_setup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    from biomedkg_tpu.data.modules import PrimeKGModule

    dm = PrimeKGModule(data_dir=str(tmp_path / "primekg"), embed_dim=16,
                       node_type=["gene/protein", "drug", "disease"],
                       batch_size=8, val_ratio=0.2, test_ratio=0.2,
                       node_init_method="random", block_size=64)
    dm.setup(stage="split")
    assert dm.graph.num_nodes > 0
    assert len(dm.edge_map_index) == dm.graph.num_relations
    loader = dm.val_dataloader(loader_type="saint")
    assert len(loader) == 100
    batch = next(iter(loader))
    assert batch.x.shape[1] == 16


def test_user_supplied_kg_csv(tmp_path, monkeypatch):
    """Real-data on-ramp (round-2 VERDICT #8): BIOMEDKG_KG_CSV +
    checksum validation drives PrimeKG from a handcrafted csv with the
    real column schema — day-one real data needs zero new code."""
    import hashlib

    import pandas as pd

    from biomedkg_tpu.data.primekg import PrimeKG

    csv = tmp_path / "kg.csv"
    pd.DataFrame({
        "relation": ["protein_protein", "drug_protein"],
        "display_relation": ["ppi", "target"],
        "x_index": [0, 1], "x_id": ["9796", "DB01"],
        "x_type": ["gene/protein", "drug"],
        "x_name": ["PHYHIP", "aspirin"], "x_source": ["NCBI", "DrugBank"],
        "y_index": [1, 0], "y_id": ["56992", "9796"],
        "y_type": ["gene/protein", "gene/protein"],
        "y_name": ["KIF15", "PHYHIP"], "y_source": ["NCBI", "NCBI"],
    }).to_csv(csv, index=False)
    sha = hashlib.sha256(csv.read_bytes()).hexdigest()

    monkeypatch.setenv("BIOMEDKG_KG_CSV", str(csv))
    monkeypatch.setenv("BIOMEDKG_KG_CSV_SHA256", sha)
    kg = PrimeKG(data_dir=str(tmp_path / "nowhere"),
                 node_type=["gene/protein", "drug"])
    assert kg.graph.num_edges == 2
    assert set(kg.edge_map_index.values()) == {"protein_protein",
                                               "drug_protein"}

    # checksum mismatch fails loudly
    monkeypatch.setenv("BIOMEDKG_KG_CSV_SHA256", "0" * 64)
    with pytest.raises(ValueError, match="checksum"):
        PrimeKG(data_dir=str(tmp_path / "nowhere"))

    # schema violation fails loudly
    bad = tmp_path / "bad.csv"
    pd.DataFrame({"foo": [1]}).to_csv(bad, index=False)
    monkeypatch.setenv("BIOMEDKG_KG_CSV", str(bad))
    monkeypatch.delenv("BIOMEDKG_KG_CSV_SHA256")
    with pytest.raises(ValueError, match="columns"):
        PrimeKG(data_dir=str(tmp_path / "nowhere"))


def test_user_supplied_dpi_csv(tmp_path, monkeypatch):
    import pandas as pd

    from biomedkg_tpu.data.dpi import DPI

    csv = tmp_path / "dpi.csv"
    pd.DataFrame({
        "x_type": ["drug"] * 3, "x_name": ["d1", "d2", "d1"],
        "relation": ["drug_protein_interaction"] * 3,
        "y_type": ["gene/protein"] * 3, "y_name": ["g1", "g2", "g2"],
    }).to_csv(csv, index=False)
    monkeypatch.setenv("BIOMEDKG_DPI_CSV", str(csv))
    dpi = DPI(data_dir=str(tmp_path / "nowhere.csv"))
    assert dpi.graph.num_edges == 3
