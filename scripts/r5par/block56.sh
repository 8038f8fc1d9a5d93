#!/bin/bash
# Round-5 blocks 5+6: rescue artifact + window-depth showcase.
set -x
cd /root/repo
R8=artifacts/campaign_r8
TN=artifacts/campaign_r2/tnet_ckpt2
mkdir -p artifacts/rescue_r5
python scripts/eval_rescue.py --ckpt $R8/ckpt_ema --tnet-ckpt $TN \
  --out artifacts/rescue_r5/rescue_eval.json \
  > artifacts/rescue_r5.log 2>&1
python -m banet_tpu.cli depth /tmp/heldout_hard_r8 --stride 3 \
  --num-points 512 --max-pairs 8 --window 4 \
  --checkpoint $R8/ckpt_ema > $R8/depth_window_hard.json \
  2>$R8/depth_window_hard.log
echo BLOCK56_DONE
