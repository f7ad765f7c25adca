#!/bin/bash
# GaussCtrl face edit, TPU edition (mirrors /root/reference/scripts/face.sh):
# 1. pretrain a 3DGS scene (the reference delegates this to `ns-train splatfacto`;
#    here the same trainer covers it), 2. edit + finetune with the paper prompts.
set -e
DATA=${DATA:-/root/reference/data/face}
OUT=${OUT:-outputs/face}

# stage 1: splatfacto-style pretrain (30k steps in the paper; shorten via STEPS)
python -m gaussctrl_exp_tpu.cli.train \
  --data "$DATA" --output-dir "$OUT" --experiment-name pretrain \
  --max-num-iterations "${STEPS:-30000}" --pipeline.render-rate "${STEPS:-30000}"

# stage 2: GaussCtrl edit + finetune (requires converted SD+ControlNet weights
# in $SD_CKPT; see gaussctrl_exp_tpu/diffusion/convert.py)
python -m gaussctrl_exp_tpu.cli.train \
  --data "$DATA" --output-dir "$OUT" --experiment-name edit \
  --load-checkpoint "$OUT/pretrain/ckpts" \
  --pipeline.edit-prompt "a photo of the face of a clown" \
  --pipeline.reverse-prompt "a photo of the face of a man" \
  --pipeline.langsam-obj "face" \
  --pipeline.guidance-scale 3 \
  --pipeline.diffusion-ckpt "${SD_CKPT:-}" \
  --max-num-iterations 1000 --pipeline.render-rate 500
