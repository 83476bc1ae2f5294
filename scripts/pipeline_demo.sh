#!/bin/bash
# Executable documentation: the full three-stage BioMedKG pipeline on the
# synthetic PrimeKG-schema graph, end to end, with tiny settings.
#
#   Stage A is represented by a pre-seeded LM cache (no egress for the real
#   HF checkpoints); Stage B pretrains one GCL model per node type; Stage C
#   trains KGE from the GCL embeddings, then evaluates with test_kge.py and
#   the filtered-ranking protocol.
#
# Run from the repo root: bash scripts/pipeline_demo.sh
set -e

export BIOMEDKG_PLATFORM=${BIOMEDKG_PLATFORM:-}  # set to "cpu" to force CPU

DIM=64
COMMON="devices=[0] epochs=2 val_every_epoch=1 data.batch_size=16 data.embed_dim=$DIM"

# ---- Stage A stand-in: seed the LM pickle cache with synthetic vectors ----
python3 - <<PY
import os, pickle
import numpy as np
from biomedkg_tpu.data.primekg import PrimeKG
kg = PrimeKG(data_dir="./data/primekg",
             node_type=["gene/protein", "drug", "disease"])
rng = np.random.default_rng(0)
os.makedirs("data/embed", exist_ok=True)
cache = {n: rng.standard_normal((2, $DIM)).astype(np.float32)
         for n in kg.node_list}
with open("data/embed/primekg_modality_lm.pickle", "wb") as f:
    pickle.dump(cache, f)
print("Stage A cache:", len(cache), "nodes")
PY

# ---- Stage B: GCL pretraining per node type ----
for NT in gene drug disease; do
    # checkpoints land in ckpt/gcl/$NT/ggd_attention_lm_*/ — exactly the
    # layout GCLEncode globs (node_encoders.py)
    python3 train_gcl.py $COMMON \
        data.node_type=$NT \
        data.node_init_method=lm \
        model.model_name=ggd \
        model.in_dim=$DIM model.hidden_dim=$DIM model.out_dim=$DIM \
        model.fuse_method=attention
done

# ---- Stage C: KGE from GCL embeddings ----
python3 train_kge.py $COMMON \
    neg_ratio=2 \
    gcl_model=ggd gcl_fuse_method=attention \
    data.node_init_method=gcl \
    model.in_dim=$DIM model.hidden_dim=$DIM model.out_dim=$DIM \
    model.encoder_name=rgcn model.decoder_name=dismult

# ---- Evaluate the best checkpoint with the filtered-ranking protocol ----
BEST=$(ls -t ckpt/kge/*/last.ckpt | head -1)
python3 rank_eval.py $COMMON \
    pretrained_path=$BEST \
    gcl_model=ggd gcl_fuse_method=attention \
    data.node_init_method=gcl \
    model.in_dim=$DIM model.hidden_dim=$DIM model.out_dim=$DIM

echo "pipeline demo complete"
