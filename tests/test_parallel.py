"""Parallel layer on the virtual 8-device CPU mesh: DP shard_map, GSPMD
dp×tp, graph-partitioned full-graph forward, and the graft dryrun."""

import jax
import numpy as np
import pytest

from biomedkg_tpu.data.node_encoders import RandomEncode
from biomedkg_tpu.data.synthetic import synthetic_triplets
from biomedkg_tpu.data.triplet import TripletGraph
from biomedkg_tpu.models.encoders import RGCN
from biomedkg_tpu.parallel.graph_shard import (partition_graph,
                                               sharded_rgcn_encode)
from biomedkg_tpu.parallel.mesh import make_mesh
from biomedkg_tpu.sampling.loaders import FullGraphLoader

DIM = 16


@pytest.fixture(scope="module")
def graph():
    df = synthetic_triplets(num_gene=100, num_drug=40, num_disease=30,
                            num_edges=1200, seed=5)
    return TripletGraph(df, encoder=RandomEncode(embed_dim=DIM))


def test_mesh_devices():
    assert len(jax.devices()) == 8  # conftest virtual mesh
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}


def test_graph_sharded_forward_matches_single_device(graph):
    tg = graph
    enc = RGCN(in_dim=DIM, hidden_dim=DIM, out_dim=DIM,
               num_hidden_layers=1, num_relations=tg.num_edge_types,
               drop_out=False)
    params = enc.init(jax.random.PRNGKey(0))

    batch = FullGraphLoader(tg.graph, block_size=64).batch()
    ref = np.asarray(enc.apply(params, batch.x, batch.edge_index,
                               batch.edge_type, batch.edge_mask,
                               batch.block_rel, training=False))

    mesh = make_mesh(dp=8, tp=1)
    sharded = partition_graph(batch, num_shards=8,
                              num_relations=tg.num_edge_types,
                              block_size=64)
    out = np.asarray(sharded_rgcn_encode(enc, params, sharded, mesh))
    real = batch.node_mask
    np.testing.assert_allclose(out[real], ref[real], rtol=2e-4, atol=2e-4)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
