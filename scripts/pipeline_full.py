"""End-to-end three-stage pipeline at PrimeKG++ scale, per-stage timed
(VERDICT r4 next #5).

Chains the reference's production flow (README.md:8-18) through the real
artifact caches at the real node/edge counts (52k nodes / 1.3M edges —
the synthetic PrimeKG++-schema graph; the real csv needs egress):

  Stage A  LM modality embedding: the FULL LMMultiModalsEncode path
           (modality csvs -> per-modality NodeEmbedding flax forwards on
           the TPU -> L2-normalized (M=2, 768) rows -> reference pickle
           cache data/embed/<stem>_lm.pickle). The LM is a BERT-base
           written locally with random weights (no egress; same compute
           as BioBERT — scripts/stage_a_probe.py measured 18,850 tok/s).
  Stage B  GCL pretraining per node type (train_gcl.py, ggd+attention,
           node_init_method=lm) -> ckpt/gcl/<type>/... exactly where
           GCLEncode globs.
  Stage C  KGE (train_kge.py, rgcn+dismult, node_init_method=gcl,
           dst/bf16/fill-packed production config) -> rank_eval.py
           filtered MRR -> KGEScorer serving smoke.

Usage:  python scripts/pipeline_full.py [--epochs-gcl 2] [--epochs-kge 4]
            [--cpu] [--tiny]     (--tiny: default small synthetic, for a
                                  CPU smoke of the plumbing)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

TIMES: dict[str, float] = {}


def timed(tag):
    class _T:
        def __enter__(self):
            self.t0 = time.time()
            print(f"\n=== [{tag}] start ===", flush=True)

        def __exit__(self, *exc):
            TIMES[tag] = round(time.time() - self.t0, 1)
            print(f"=== [{tag}] {TIMES[tag]}s ===", flush=True)

    return _T()


def run(cmd):
    print("+ " + " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True)


def synth_text(name: str, kind: str) -> str:
    """Deterministic pseudo-description; length ~ the real modality
    snippets so the tokenizer/bucket mix is realistic."""
    h = abs(hash((name, kind)))
    words = [name.replace("_", " ")]
    for i in range(8 + h % 12):
        words.append("abcdefghijklmnopqrstuvwxyz"[(h >> i) % 26]
                     * (2 + (h >> (i + 3)) % 6))
    return " ".join(words)


def stage_a(embed_dim: int, subset: int | None = None):
    import numpy as np
    import pandas as pd
    import yaml

    from biomedkg_tpu.data.primekg import PrimeKG
    from scripts.stage_a_probe import write_bert_base

    kg = PrimeKG(data_dir="./data/primekg",
                 node_type=["gene/protein", "drug", "disease"])
    df = kg.df
    names_by_type = {
        t: sorted(set(df.loc[df.x_type == t, "x_name"])
                  | set(df.loc[df.y_type == t, "y_name"]))
        for t in ("gene/protein", "drug", "disease")}
    if subset:
        # plumbing smoke: cover only `subset` names per type — the rest
        # take the encoder's xavier missing-row path (node.py:118-136)
        names_by_type = {t: v[:subset] for t, v in names_by_type.items()}
    print({t: len(v) for t, v in names_by_type.items()}, flush=True)

    model_dir = write_bert_base("data/lm_local_bert")
    os.makedirs("data/modalities", exist_ok=True)
    rng = np.random.default_rng(7)

    def write_csv(path, id_col, cols, names):
        rows = {id_col: names}
        for c in cols:
            vals = [synth_text(n, c) for n in names]
            # ~3% NaN rows exercise the xavier fallback (node.py:103-117)
            for i in rng.choice(len(vals), max(1, len(vals) // 33),
                                replace=False):
                vals[i] = None
            rows[c] = vals
        pd.DataFrame(rows).to_csv(path, index=False)

    write_csv("data/modalities/pipeline_protein.csv", "protein_name",
              ["protein_seq", "ncbi_summary"],
              names_by_type["gene/protein"])
    write_csv("data/modalities/pipeline_drug.csv", "generic_name",
              ["smiles", "description"], names_by_type["drug"])
    write_csv("data/modalities/pipeline_disease.csv", "mondo_name",
              ["mondo_definition", "umls_description"],
              names_by_type["disease"])

    conf = {
        "gene/protein": {
            "file_name": "data/modalities/pipeline_protein.csv",
            "idetifier_column": "protein_name",
            "modality_columns": ["protein_seq", "ncbi_summary"],
            "model_name_for_each_modality": [model_dir, model_dir]},
        "drug": {
            "file_name": "data/modalities/pipeline_drug.csv",
            "idetifier_column": "generic_name",
            "modality_columns": ["smiles", "description"],
            "model_name_for_each_modality": [model_dir, model_dir]},
        "disease": {
            "file_name": "data/modalities/pipeline_disease.csv",
            "idetifier_column": "mondo_name",
            "modality_columns": ["mondo_definition", "umls_description"],
            "model_name_for_each_modality": [model_dir, model_dir]},
    }
    cfg_path = "data/modalities/pipeline_modality.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(conf, f)

    cache = "data/embed/pipeline_modality_lm.pickle"
    if os.path.exists(cache) and not os.environ.get(
            "BIOMEDKG_PIPELINE_KEEP_CACHE"):
        os.remove(cache)                       # time a REAL build
    from biomedkg_tpu.data.node_encoders import LMMultiModalsEncode
    enc = LMMultiModalsEncode(config_file=cfg_path, embed_dim=embed_dim)
    all_names = [n for v in names_by_type.values() for n in v]
    out = enc(all_names)
    n_tok = sum(len(synth_text(n, "x").split()) for n in all_names[:512])
    print(f"Stage A cache: {len(all_names)} nodes -> {out.shape} "
          f"(~{n_tok * len(all_names) // 512} words x 2 modalities)",
          flush=True)
    return cfg_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs-gcl", type=int, default=2)
    ap.add_argument("--epochs-kge", type=int, default=4)
    ap.add_argument("--hidden-dim", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="small synthetic graph (plumbing smoke)")
    args = ap.parse_args()

    if not args.tiny:
        os.environ["BIOMEDKG_SYNTHETIC_SCALE"] = "primekg"
    if args.cpu:
        os.environ["BIOMEDKG_PLATFORM"] = "cpu"

    d = 768                       # LM CLS width — Stage A's native dim
    hd = args.hidden_dim
    with timed("stage_A_lm_embed"):
        cfg_path = stage_a(d, subset=200 if args.tiny else None)
    # GCLEncode (Stage C) reconstructs the Stage-B data module itself —
    # point it at the pipeline's modality config
    os.environ["BIOMEDKG_MODALITY_CONFIG"] = cfg_path

    # Stage B consumes the (M=2, 768) LM rows; Stage C consumes the
    # (1, hd) GCL rows — data.embed_dim follows the cache being read
    common_lm = ["devices=[0]", f"data.embed_dim={d}",
                 f"data.modality_config_path={cfg_path}",
                 "val_every_epoch=1"]
    common_gcl = ["devices=[0]", f"data.embed_dim={hd}",
                  f"data.modality_config_path={cfg_path}",
                  "val_every_epoch=1"]
    dims_lm = [f"model.in_dim={d}", f"model.hidden_dim={hd}",
               f"model.out_dim={hd}"]
    dims_gcl = [f"model.in_dim={hd}", f"model.hidden_dim={hd}",
                f"model.out_dim={hd}"]

    # clear prior Stage-B artifacts: GCLEncode globs ckpt/gcl/** and
    # reuses data/gcl_embed/*.pickle — stale ones would alias this run
    import shutil
    shutil.rmtree("ckpt/gcl", ignore_errors=True)
    for p in ("data/gcl_embed/ggd_attention.pickle",):
        if os.path.exists(p):
            os.remove(p)

    with timed("stage_B_gcl_x3"):
        for nt in ("gene", "drug", "disease"):
            run([sys.executable, "train_gcl.py", *common_lm, *dims_lm,
                 f"epochs={args.epochs_gcl}",
                 f"data.node_type={nt}", "data.node_init_method=lm",
                 "model.model_name=ggd", "model.fuse_method=attention"])

    with timed("stage_C_kge"):
        run([sys.executable, "train_kge.py", *common_gcl, *dims_gcl,
             f"epochs={args.epochs_kge}", "neg_ratio=10",
             "saint_fill=0.92", "data.node_init_method=gcl",
             "gcl_model=ggd", "gcl_fuse_method=attention",
             "model.encoder_name=rgcn", "model.decoder_name=dismult"])

    import glob
    best = max(glob.glob("ckpt/kge/*/last.ckpt"), key=os.path.getmtime)

    with timed("rank_eval"):
        run([sys.executable, "rank_eval.py", *common_gcl, *dims_gcl,
             f"pretrained_path={best}", "data.node_init_method=gcl",
             "gcl_model=ggd", "gcl_fuse_method=attention"])

    with timed("serve_smoke"):
        code = (
            "import sys; sys.path.insert(0, '.')\n"
            "from biomedkg_tpu.serving import KGEScorer\n"
            "from biomedkg_tpu.data.modules import PrimeKGModule\n"
            f"dm = PrimeKGModule(data_dir='./data/primekg', embed_dim={hd},\n"
            "    node_type=['gene/protein', 'drug', 'disease'],\n"
            "    batch_size=128, val_ratio=0.2, test_ratio=0.2,\n"
            "    node_init_method='gcl', gcl_model='ggd',\n"
            "    gcl_fuse_method='attention',\n"
            f"    modality_config_path={cfg_path!r})\n"
            f"s = KGEScorer({best!r}, dm)\n"
            "g = s.dm.data.graph\n"
            "inv = {v: k for k, v in s.rel_to_id.items()}\n"
            "h = s.id_to_name[int(g.edge_index[0, 0])]\n"
            "r = inv[int(g.edge_type[0])]\n"
            "t = s.id_to_name[int(g.edge_index[1, 0])]\n"
            "print('score', h, r, t, '->', s.score(h, r, t))\n"
            "print('topk', s.topk_tails(h, r, 5))\n")
        run([sys.executable, "-c", code])

    print("\nPIPELINE_TIMES " + json.dumps(TIMES), flush=True)


if __name__ == "__main__":
    main()
