"""Stage-A LM-embedding throughput probe (VERDICT round-3 #10).

Times the NodeEmbedding sweep — tokenizer -> padded static buckets ->
CLS forward (data/lm_embed.py, parity with reference embed.py:27-50) —
at a BioBERT-sized config (BERT-base: 12 layers, hidden 768, heads 12,
intermediate 3072) with random weights written locally via
save_pretrained, so the probe needs no egress. Reports tokens/s for:

  * flax backend on the default JAX device (the TPU under axon),
  * torch backend on CPU (the reference's only offline option),

over the same text workload. Usage:

  python scripts/stage_a_probe.py [n_texts] [--torch-texts N]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def write_bert_base(d: str, seed: int = 0) -> str:
    import torch
    from transformers import BertConfig, BertModel, BertTokenizerFast

    if os.path.exists(os.path.join(d, "model.safetensors")):
        return d
    os.makedirs(d, exist_ok=True)
    vocab = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
             + [chr(c) for c in range(ord("a"), ord("z") + 1)]
             + [str(i) for i in range(10)]
             + ["##" + chr(c) for c in range(ord("a"), ord("z") + 1)])
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    BertTokenizerFast(vocab_file=os.path.join(d, "vocab.txt"),
                      do_lower_case=True).save_pretrained(d)
    torch.manual_seed(seed)
    cfg = BertConfig(vocab_size=len(vocab), hidden_size=768,
                     num_hidden_layers=12, num_attention_heads=12,
                     intermediate_size=3072, max_position_embeddings=512)
    BertModel(cfg).save_pretrained(d, safe_serialization=True)
    return d


def make_texts(n: int, seed: int = 0):
    """Protein-description-like texts; char tokenizer -> ~60-180 tokens."""
    rng = np.random.default_rng(seed)
    alpha = "acdefghiklmnpqrstvwy"
    return ["".join(rng.choice(list(alpha), size=int(rng.integers(60, 180))))
            for _ in range(n)]


def sweep(emb, texts, batch: int) -> tuple[float, int]:
    """Run the Stage-A sweep; returns (seconds, real tokens processed)."""
    toks = 0
    t0 = time.perf_counter()
    for i in range(0, len(texts), batch):
        chunk = texts[i:i + batch]
        out = emb(chunk)
        assert out.shape == (len(chunk), 768), out.shape
        toks += sum(len(emb.tokenizer(t)["input_ids"]) for t in chunk)
    return time.perf_counter() - t0, toks


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(argv[0]) if argv else 1024
    n_torch = n
    for i, a in enumerate(sys.argv):
        if a == "--torch-texts":
            n_torch = int(sys.argv[i + 1])

    from biomedkg_tpu.data.lm_embed import NodeEmbedding

    model_dir = write_bert_base("/tmp/bert-base-probe")
    texts = make_texts(n)
    batch = 32

    emb = NodeEmbedding(model_dir, batch_size=batch, backend="flax")
    import jax
    print(f"flax device: {jax.devices()[0]}", flush=True)
    sweep(emb, texts[:batch], batch)                      # compile
    dt, toks = sweep(emb, texts, batch)
    flax_tps = toks / dt
    print(f"flax  : {n} texts, {toks} tokens in {dt:6.2f} s  "
          f"-> {flax_tps:,.0f} tokens/s", flush=True)

    emb_t = NodeEmbedding(model_dir, batch_size=batch, backend="torch")
    assert emb_t.device == "cpu"
    sweep(emb_t, texts[:batch], batch)                    # warm caches
    dt_t, toks_t = sweep(emb_t, texts[:n_torch], batch)
    torch_tps = toks_t / dt_t
    print(f"torch : {n_torch} texts, {toks_t} tokens in {dt_t:6.2f} s  "
          f"-> {torch_tps:,.0f} tokens/s", flush=True)
    print(f"speedup (flax-TPU / torch-CPU): {flax_tps / torch_tps:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
