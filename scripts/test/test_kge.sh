#!/bin/bash
# Smoke test: KGE training with debug=true (fast_dev_run — one train + one
# val batch, no checkpointing), mirroring reference scripts/test/test_kge.sh.

python3 train_kge.py \
    devices="[0]" \
    epochs=1 \
    debug=true \
    neg_ratio=1 \
    data.batch_size=16 \
    data.embed_dim=64 \
    data.node_init_method=random \
    model.in_dim=64 \
    model.hidden_dim=64 \
    model.out_dim=64 \
    model.encoder_name=rgcn \
    model.decoder_name=dismult
