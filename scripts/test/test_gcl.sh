#!/bin/bash
# Smoke test: GCL training with debug=true, mirroring reference
# scripts/test/test_gcl.sh.

python3 train_gcl.py \
    devices="[0]" \
    epochs=1 \
    debug=true \
    data.node_type=drug \
    data.node_init_method=random \
    data.embed_dim=64 \
    data.batch_size=16 \
    model.model_name=ggd \
    model.in_dim=64 \
    model.hidden_dim=32 \
    model.out_dim=32 \
    model.fuse_method=none
