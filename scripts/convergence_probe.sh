#!/usr/bin/env bash
# Seed-paired convergence A/B: fused Pallas negative kernels vs the
# unfused sorted path, full train_kge cycle at PrimeKG++ scale on the
# chip. Usage: bash scripts/convergence_probe.sh [decoder ...]
set -u
cd "$(dirname "$0")/.."
DECODERS=${@:-transe rotate}
EPOCHS=${EPOCHS:-4}
for dec in $DECODERS; do
  for fused in 1 0; do
    tag="${dec}_fused${fused}"
    echo "=== $tag ==="
    BIOMEDKG_SYNTHETIC_SCALE=primekg \
    BIOMEDKG_NO_FUSED_NEG=$((1-fused)) \
    python train_kge.py model.decoder_name=$dec model.in_dim=768 \
      model.compute_dtype=bfloat16 epochs=$EPOCHS val_every_epoch=2 \
      steps_per_execution=8 neg_ratio=10 seed=42 \
      2>&1 | grep -E "test_AUROC|test_AveragePrecision_mean|test_F1_mean|epoch .* loss|test_loss" \
      | sed "s/^/[$tag] /"
  done
done
