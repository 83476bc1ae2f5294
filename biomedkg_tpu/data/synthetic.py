"""Synthetic PrimeKG++-schema graph generator.

The real PrimeKG csv downloads from Harvard Dataverse
(/root/reference/biomedkg/data/dataset/primekg.py:23-31); this environment
has no egress, so tests and benchmarks run on a structurally-faithful
synthetic graph: same triplet dataframe schema (x_type, x_name, relation,
y_type, y_name), same three node types, a realistic relation signature set,
and power-law-ish degree distributions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# (relation, x_type, y_type, relative edge share) — mirrors the PrimeKG
# relation signatures surviving the gene/drug/disease node-type filter.
PRIMEKG_RELATIONS = [
    ("protein_protein", "gene/protein", "gene/protein", 0.55),
    ("drug_protein", "drug", "gene/protein", 0.06),
    ("contraindication", "drug", "disease", 0.04),
    ("indication", "drug", "disease", 0.02),
    ("off-label use", "drug", "disease", 0.01),
    ("drug_drug", "drug", "drug", 0.25),
    ("disease_protein", "disease", "gene/protein", 0.06),
    ("disease_disease", "disease", "disease", 0.01),
]

DPI_RELATION = [("drug_protein_interaction", "drug", "gene/protein", 1.0)]

# The UNFILTERED PrimeKG++ schema: all 10 node types and the full ~30
# relation-signature vocabulary (the reference trains only the filtered
# gene/drug/disease subgraph, configs/data/primekg.yaml:5 — this is the
# scale-past-it stress surface, VERDICT round-3 item #4). Shares
# approximate the real edge-count distribution (anatomy_protein_present
# dominates, then protein_protein / GO-annotation relations).
PRIMEKG_FULL_NODE_SIZES = {
    "gene/protein": 27000, "drug": 8000, "disease": 17000,
    "effect/phenotype": 15000, "anatomy": 14000,
    "biological_process": 28000, "molecular_function": 11000,
    "cellular_component": 4000, "pathway": 2500, "exposure": 900,
}

PRIMEKG_FULL_RELATIONS = [
    ("anatomy_protein_present", "anatomy", "gene/protein", 0.380),
    ("protein_protein", "gene/protein", "gene/protein", 0.160),
    ("disease_phenotype_positive", "disease", "effect/phenotype", 0.075),
    ("bioprocess_protein", "biological_process", "gene/protein", 0.070),
    ("cellcomp_protein", "cellular_component", "gene/protein", 0.040),
    ("disease_protein", "disease", "gene/protein", 0.040),
    ("molfunc_protein", "molecular_function", "gene/protein", 0.035),
    ("drug_effect", "drug", "effect/phenotype", 0.032),
    ("bioprocess_bioprocess", "biological_process",
     "biological_process", 0.026),
    ("pathway_protein", "pathway", "gene/protein", 0.021),
    ("disease_disease", "disease", "disease", 0.016),
    ("drug_drug", "drug", "drug", 0.650 * 0.04),
    ("phenotype_protein", "effect/phenotype", "gene/protein", 0.012),
    ("anatomy_protein_absent", "anatomy", "gene/protein", 0.010),
    ("drug_protein", "drug", "gene/protein", 0.0125),
    ("anatomy_anatomy", "anatomy", "anatomy", 0.0070),
    ("molfunc_molfunc", "molecular_function", "molecular_function", 0.0067),
    ("phenotype_phenotype", "effect/phenotype", "effect/phenotype", 0.0055),
    ("contraindication", "drug", "disease", 0.0053),
    ("cellcomp_cellcomp", "cellular_component", "cellular_component",
     0.0023),
    ("indication", "drug", "disease", 0.0045),
    ("pathway_pathway", "pathway", "pathway", 0.0013),
    ("exposure_disease", "exposure", "disease", 0.0010),
    ("off-label use", "drug", "disease", 0.0007),
    ("exposure_protein", "exposure", "gene/protein", 0.0005),
    ("disease_phenotype_negative", "disease", "effect/phenotype", 0.0004),
    ("exposure_bioprocess", "exposure", "biological_process", 0.0004),
    ("exposure_exposure", "exposure", "exposure", 0.0002),
    ("exposure_molfunc", "exposure", "molecular_function", 0.0001),
    ("exposure_cellcomp", "exposure", "cellular_component", 0.0001),
]


def synthetic_primekg_full(num_edges: int = 4_000_000, seed: int = 0,
                           node_sizes=None) -> pd.DataFrame:
    """Full-scale unfiltered PrimeKG++-shaped triplets (~127k nodes,
    ``num_edges`` edges, 10 node types, 30 relation signatures)."""
    sizes = dict(node_sizes or PRIMEKG_FULL_NODE_SIZES)
    return synthetic_triplets_from_schema(sizes, PRIMEKG_FULL_RELATIONS,
                                          num_edges=num_edges, seed=seed)


def synthetic_triplets_from_schema(sizes, relations, num_edges, seed=0,
                                   name_fn=None) -> pd.DataFrame:
    """Schema-driven generator shared by the filtered and full variants.

    ``name_fn(type, i)`` controls node naming — each variant keeps its
    historical scheme so seeded fixtures/caches keep their sorted node
    order (full: 4-char type prefix to disambiguate the 10-type
    vocabulary; filtered: full first segment)."""
    rng = np.random.default_rng(seed)
    if name_fn is None:
        def name_fn(t, i):
            return f"{t.split('/')[0][:4]}_{i:06d}"
    names = {t: np.array([name_fn(t, i) for i in range(n)])
             for t, n in sizes.items()}
    shares = np.array([r[3] for r in relations], dtype=np.float64)
    shares /= shares.sum()
    rows = []
    for (rel, xt, yt, _), share in zip(relations, shares):
        m = max(1, int(num_edges * share))
        src = _power_law_targets(rng, sizes[xt], m)
        dst = _power_law_targets(rng, sizes[yt], m)
        rows.append(pd.DataFrame({
            "x_type": xt, "x_name": names[xt][src],
            "relation": rel,
            "y_type": yt, "y_name": names[yt][dst],
        }))
    df = pd.concat(rows, ignore_index=True)
    return df.drop_duplicates(
        subset=["x_name", "relation", "y_name"]).reset_index(drop=True)


def _power_law_targets(rng, n, size, alpha=0.8):
    """Sample node ids with a heavy-tailed preference (hub structure)."""
    w = (1.0 + np.arange(n)) ** (-alpha)
    w /= w.sum()
    return rng.choice(n, size=size, p=w)


def synthetic_triplets(
    num_gene: int = 2000,
    num_drug: int = 600,
    num_disease: int = 400,
    num_edges: int = 40000,
    relations=None,
    seed: int = 0,
) -> pd.DataFrame:
    relations = relations or PRIMEKG_RELATIONS
    sizes = {"gene/protein": num_gene, "drug": num_drug,
             "disease": num_disease}
    return synthetic_triplets_from_schema(
        sizes, relations, num_edges=num_edges, seed=seed,
        name_fn=lambda t, i: f"{t.split('/')[0]}_{i:06d}")


def synthetic_dpi(num_drug: int = 300, num_gene: int = 500,
                  num_edges: int = 4000, seed: int = 1) -> pd.DataFrame:
    return synthetic_triplets(
        num_gene=num_gene, num_drug=num_drug, num_disease=1,
        num_edges=num_edges, relations=DPI_RELATION, seed=seed)


def clustered_triplets(num_nodes: int = 300, num_clusters: int = 6,
                       num_relations: int = 4, num_edges: int = 6000,
                       seed: int = 0):
    """Cluster-structured graph whose edges are PREDICTABLE FROM NODE
    ATTRIBUTES — the fixture for the unseen-node/inductive protocol
    (data/inductive.py; BASELINE.json north star).

    Nodes get uniform cluster labels; relation ``r`` connects cluster ``c``
    heads to cluster ``σ_r(c)`` tails (σ_r = fixed per-relation cyclic
    shift), edges sampled uniformly over allowed pairs.  A node's cluster
    is recoverable from its attribute (``cluster_token(i)`` text / the
    one-hot rows of ``features``), so a model fed informative attributes
    generalizes to held-out nodes, while per-node random init provably
    cannot (the paper's core claim, arXiv:2501.01644 §4; reference
    mechanism node.py:33-41 / embed.py:27-50).

    Returns ``(df, cluster, features)``: reference-schema triplets over one
    node type, the (N,) cluster labels, and (N, num_clusters) one-hot
    float32 features aligned with the sorted-name node order.
    """
    rng = np.random.default_rng(seed)
    cluster = rng.integers(0, num_clusters, size=num_nodes)
    names = np.array([f"ent_{i:06d}" for i in range(num_nodes)])
    members = [np.nonzero(cluster == c)[0] for c in range(num_clusters)]

    rows = []
    per_rel = max(1, num_edges // num_relations)
    for r in range(num_relations):
        shift = (r % (num_clusters - 1)) + 1   # σ_r(c) = (c + shift) % C
        heads = rng.integers(0, num_nodes, size=per_rel)
        tails = np.empty(per_rel, np.int64)
        for c in range(num_clusters):
            sel = cluster[heads] == c
            tgt = members[(c + shift) % num_clusters]
            if len(tgt) == 0:
                tgt = np.arange(num_nodes)
            tails[sel] = rng.choice(tgt, size=int(sel.sum()))
        rows.append(pd.DataFrame({
            "x_type": "entity", "x_name": names[heads],
            "relation": f"rel_{r}",
            "y_type": "entity", "y_name": names[tails],
        }))
    df = pd.concat(rows, ignore_index=True).drop_duplicates(
        ["x_name", "relation", "y_name"]).reset_index(drop=True)
    feats = np.eye(num_clusters, dtype=np.float32)[cluster]
    return df, cluster, feats


def cluster_token(cluster_id: int) -> str:
    """The attribute text of a node in ``cluster_id`` (Stage-A LM path:
    same text ⇒ same LM embedding ⇒ unseen nodes inherit their cluster's
    representation).  Letters only — the test-time char-level WordPiece
    vocabulary has no ``##<digit>`` continuations, so digit suffixes
    would all collapse to [UNK]."""
    word = chr(ord("a") + cluster_id % 26) * (3 + cluster_id // 26)
    return f"cluster {word} marker"


def planted_triplets(num_nodes: int = 400, num_relations: int = 4,
                     latent_dim: int = 8, edges_per_head: int = 4,
                     seed: int = 0):
    """Latent-factor graph with a KNOWN-GOOD filtered-ranking ceiling
    (VERDICT round-1 item #4 — the power-law synthetic cannot distinguish
    a learned decoder from a broken one; filtered MRR on it is ~0.06
    regardless).

    Generative model == the DistMult model class: node factors
    u_i ~ N(0, I_k)/sqrt(k), relation factors d_r ~ N(0, I_k); the edges of
    relation r are each head's top-``edges_per_head`` tails by the bilinear
    score (u_i * d_r)·u_j.  A model that recovers (u, d) ranks every true
    tail above only *other true tails* (the filtered protocol removes
    those), so exact recovery ⇒ tail-side MRR = 1.0, and a broken
    encoder/decoder provably cannot reach it by chance (~1/N).

    Returns ``(df, features)``: a reference-schema triplet dataframe over a
    single node type and an (N, latent_dim) float32 array aligned with the
    sorted node-name order TripletGraph uses (node ``ent_%06d`` sorts to
    index order).
    """
    rng = np.random.default_rng(seed)
    u = rng.standard_normal((num_nodes, latent_dim)).astype(np.float32)
    u /= np.sqrt(latent_dim)
    d = rng.standard_normal((num_relations, latent_dim)).astype(np.float32)

    names = np.array([f"ent_{i:06d}" for i in range(num_nodes)])
    rows = []
    for r in range(num_relations):
        scores = (u * d[r]) @ u.T                        # (N, N)
        np.fill_diagonal(scores, -np.inf)                # no self-loops
        tails = np.argpartition(-scores, edges_per_head,
                                axis=1)[:, :edges_per_head]
        heads = np.repeat(np.arange(num_nodes), edges_per_head)
        rows.append(pd.DataFrame({
            "x_type": "entity", "x_name": names[heads],
            "relation": f"rel_{r}",
            "y_type": "entity", "y_name": names[tails.reshape(-1)],
        }))
    df = pd.concat(rows, ignore_index=True)
    return df, u
