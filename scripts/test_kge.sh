#!/bin/bash
# KGE evaluation from checkpoint — same knobs as the reference scripts/test_kge.sh.

ENCODER="rgcn"
DECODER="dismult"
NODE_INIT_METHOD="random"

if [[ "$NODE_INIT_METHOD" == "random" || "$NODE_INIT_METHOD" == "lm" ]]; then
    INIT_DIM=768
else
    INIT_DIM=256
fi

GCL_MODEL="ggd"
GCL_FUSE_METHOD="attention"
PRETRAINED_PATH="ckpt/kge/best.ckpt"
NEG_RATIO=3
BATCH_SIZE=64
DEVICES="[0]"

python3 test_kge.py \
    devices=$DEVICES \
    neg_ratio=$NEG_RATIO \
    gcl_model=$GCL_MODEL \
    gcl_fuse_method=$GCL_FUSE_METHOD \
    pretrained_path=$PRETRAINED_PATH \
    data.batch_size=$BATCH_SIZE \
    data.embed_dim=$INIT_DIM \
    data.node_init_method=$NODE_INIT_METHOD \
    model.in_dim=$INIT_DIM \
    model.encoder_name=$ENCODER \
    model.decoder_name=$DECODER
