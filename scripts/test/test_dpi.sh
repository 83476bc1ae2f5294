#!/bin/bash
# Smoke test: DPI training with debug=true, mirroring reference
# scripts/test/test_dpi.sh.

python3 train_dpi.py \
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
