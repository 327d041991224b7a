#!/usr/bin/env bash
# Mirror of reference scripts/train_mask_detector.sh
epoch=5
batch_size=8

python train_mask_detector.py \
  --epoch $epoch \
  --batch-size $batch_size \
  --scale 0.25
