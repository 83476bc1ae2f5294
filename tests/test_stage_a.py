"""Stage-A LM embedding executed FOR REAL (VERDICT round-1 item #9).

Previous rounds only ever seeded the pickle cache by hand; these tests run
`LMMultiModalsEncode._build_cache` through the genuine HF
tokenizer→model→CLS path (reference embed.py:9-50) using a tiny
randomly-initialized BERT written to disk at test time — no egress, no
committed binary blob. Covers: batch encoding, NaN→xavier rows, the
modality-axis L2 normalization, cache round-trip, and the "DNA" BertConfig
model branch (embed.py:19-26).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import yaml


def _write_tiny_bert(d: str, seed: int = 0) -> str:
    """Random-weights 1-layer BERT + char-level WordPiece tokenizer saved
    via the real `save_pretrained` machinery."""
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    os.makedirs(d, exist_ok=True)
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [chr(c) for c in range(ord("a"), ord("z") + 1)]
             + [str(i) for i in range(10)]
             + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)])
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    tok = BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt"),
                            do_lower_case=True)
    tok.save_pretrained(d)
    torch.manual_seed(seed)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=768,
                     num_hidden_layers=1, num_attention_heads=4,
                     intermediate_size=64, max_position_embeddings=512)
    BertModel(cfg).save_pretrained(d, safe_serialization=True)
    return d


@pytest.mark.slow
def test_stage_a_real_hf_path(tmp_path, monkeypatch):
    model_dir = _write_tiny_bert(str(tmp_path / "tiny-bert"))

    # node-attribute table: one NaN description → xavier fallback row
    csv_path = str(tmp_path / "nodes.csv")
    pd.DataFrame({
        "name": ["alpha", "beta", "gamma", "delta"],
        "seq": ["acgtacgt", "ggcata", "tttt", "acacac"],
        "desc": ["first protein", None, "third one", "fourth"],
    }).to_csv(csv_path, index=False)

    conf_path = str(tmp_path / "test_modality.yaml")
    with open(conf_path, "w") as f:
        yaml.safe_dump({
            "gene": {
                "file_name": csv_path,
                "idetifier_column": "name",   # reference schema typo kept
                "modality_columns": ["seq", "desc"],
                "model_name_for_each_modality": [model_dir, model_dir],
            },
        }, f)

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from biomedkg_tpu.data.node_encoders import LMMultiModalsEncode

    enc = LMMultiModalsEncode(config_file=conf_path, embed_dim=768)
    cache = os.path.join("data", "embed", "test_modality_lm.pickle")
    assert os.path.exists(cache), "Stage-A cache not produced"

    # lookup returns (N, 2, 768) with L2 normalization ACROSS the modality
    # axis (reference node.py:113-117): per (node, dim), the 2-vector of
    # modality values has unit norm
    feats = enc(["alpha", "beta", "gamma", "delta"])
    assert feats.shape == (4, 2, 768)
    assert enc.random_init_ratio == 0
    norms = np.linalg.norm(feats, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    # real LM output: the two nodes with distinct sequences must embed
    # differently, and rebuilding the cache reproduces it exactly
    assert not np.allclose(feats[0], feats[1])
    enc2 = LMMultiModalsEncode(config_file=conf_path, embed_dim=768)
    np.testing.assert_array_equal(enc(["alpha"]), enc2(["alpha"]))

    # unknown node → xavier row + random_init_ratio accounting
    miss = enc(["alpha", "unknown_node"])
    assert miss.shape == (2, 2, 768)
    assert enc.random_init_ratio == 0.5


@pytest.mark.slow
def test_stage_a_dna_branch(tmp_path, monkeypatch):
    """Model paths containing 'DNA' take the BertConfig.from_pretrained
    branch (reference embed.py:19-26)."""
    model_dir = _write_tiny_bert(str(tmp_path / "DNA-tiny"))
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    from biomedkg_tpu.data.lm_embed import NodeEmbedding

    ne = NodeEmbedding(model_dir)
    out = ne(["acgt", "ggca"])
    assert out.shape == (2, 768)
    assert np.isfinite(out).all()
    # CLS embeddings, deterministic for fixed weights
    np.testing.assert_array_equal(out, ne(["acgt", "ggca"]))


@pytest.mark.slow
def test_lm_embed_flax_backend_matches_torch(tmp_path):
    """ROADMAP #8: the flax (TPU-native, jitted, static-bucket) Stage-A
    forward produces the same CLS vectors as the reference torch path,
    including the ragged-batch row/length padding."""
    from biomedkg_tpu.data.lm_embed import NodeEmbedding

    model_dir = _write_tiny_bert(str(tmp_path / "tiny-bert-flax"))
    texts = ["first protein", "a much longer description " * 10, "x"]

    ne_t = NodeEmbedding(model_dir, batch_size=4, backend="torch")
    ne_f = NodeEmbedding(model_dir, batch_size=4, backend="flax")
    assert ne_f.backend == "flax"
    out_t = ne_t(texts)
    out_f = ne_f(texts)
    assert out_f.shape == out_t.shape == (3, 768)
    np.testing.assert_allclose(out_f, out_t, rtol=2e-4, atol=2e-4)
    # second call with a different ragged length reuses the same compile
    out2 = ne_f(["abc", "def longer text here"])
    assert out2.shape == (2, 768)
    assert np.isfinite(out2).all()
