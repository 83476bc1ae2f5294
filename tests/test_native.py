"""Native C++ sampler: build + parity with the numpy fallback paths."""

import numpy as np
import pytest

from biomedkg_tpu.sampling import native
from biomedkg_tpu.sampling.csr import CSRGraph
from biomedkg_tpu.sampling.neighbor import sample_in_neighbors
from biomedkg_tpu.sampling.saint import random_walk


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native sampler unavailable (no g++)")
    return lib


@pytest.fixture
def graph(rng):
    N, E, R = 80, 600, 4
    ei = rng.integers(0, N, (2, E)).astype(np.int64)
    et = rng.integers(0, R, E).astype(np.int32)
    return CSRGraph(num_nodes=N, edge_index=ei, edge_type=et,
                    num_relations=R)


def _numpy_graph(graph, monkeypatch):
    """Clone with the native path disabled."""
    import biomedkg_tpu.sampling.native as nat

    g = CSRGraph(num_nodes=graph.num_nodes, edge_index=graph.edge_index,
                 edge_type=graph.edge_type,
                 num_relations=graph.num_relations)
    monkeypatch.setattr(nat, "get_lib", lambda: None)
    g.out_csr(), g.in_csr()  # build under the numpy path
    monkeypatch.undo()
    return g


def test_csr_build_parity(lib, graph, monkeypatch):
    g_np = _numpy_graph(graph, monkeypatch)
    for which in ("out_csr", "in_csr"):
        ip_n, nbr_n, et_n, _ = getattr(graph, which)()
        ip_p, nbr_p, et_p, _ = getattr(g_np, which)()
        np.testing.assert_array_equal(ip_n, ip_p)
        # per-node neighbor multisets match (order within a node may differ)
        for v in range(graph.num_nodes):
            sl = slice(ip_n[v], ip_n[v + 1])
            got = sorted(zip(nbr_n[sl], et_n[sl]))
            want = sorted(zip(nbr_p[sl], et_p[sl]))
            assert got == want


def test_induced_subgraph_parity(lib, graph, monkeypatch, rng):
    nodes = np.unique(rng.integers(0, graph.num_nodes, 30))
    ei_n, et_n = graph.induced_subgraph(nodes)
    g_np = _numpy_graph(graph, monkeypatch)
    import biomedkg_tpu.sampling.native as nat

    monkeypatch.setattr(nat, "get_lib", lambda: None)
    ei_p, et_p = g_np.induced_subgraph(nodes)
    got = sorted(zip(ei_n[0], ei_n[1], et_n))
    want = sorted(zip(ei_p[0], ei_p[1], et_p))
    assert got == want


def test_random_walk_native(lib, graph, rng):
    roots = rng.integers(0, graph.num_nodes, 50)
    walks = random_walk(graph, roots, 8, rng)
    assert walks.shape == (50, 9)
    np.testing.assert_array_equal(walks[:, 0], roots)
    # every consecutive pair is a real edge or a dead-end repeat
    indptr, nbr, _, _ = graph.out_csr()
    for i in range(50):
        for k in range(8):
            u, v = walks[i, k], walks[i, k + 1]
            neigh = nbr[indptr[u]:indptr[u + 1]]
            assert (v in neigh) or (len(neigh) == 0 and v == u)


def test_sample_neighbors_native(lib, graph, rng):
    frontier = np.unique(rng.integers(0, graph.num_nodes, 20))
    src, fpos, et = sample_in_neighbors(graph, frontier, 3, rng)
    indptr, nbr, etypes, _ = graph.in_csr()
    counts = np.bincount(fpos, minlength=len(frontier))
    for i, v in enumerate(frontier):
        deg = indptr[v + 1] - indptr[v]
        assert counts[i] == min(deg, 3)
    # sampled edges are real in-edges
    for s, fp, t in zip(src, fpos, et):
        v = frontier[fp]
        sl = slice(indptr[v], indptr[v + 1])
        assert any((nbr[sl] == s) & (etypes[sl] == t))
