#!/bin/bash
# Round-5 blocks 2+3: domain triage A/B/P + r5c same-harness triage.
set -x
cd /root/repo
R8=artifacts/campaign_r8
for dom in A B P; do
  python scripts/eval_trajectory_campaign.py \
    --ckpt $R8/ckpt --ckpt-ema $R8/ckpt_ema \
    --seq-dir /tmp/heldout_dom$dom --frames 60 --size 256 320 \
    --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
    --domain $dom --triage \
    --out $R8/triage_domain$dom.json > $R8/triage_domain$dom.log 2>&1
done
python scripts/eval_trajectory_campaign.py \
  --ckpt artifacts/campaign_r5c/ckpt \
  --ckpt-ema artifacts/campaign_r5c/ckpt_ema \
  --seq-dir /tmp/heldout_seq_r8 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
  --triage --out $R8/triage_r5c.json > $R8/triage_r5c.log 2>&1
echo BLOCK23_DONE
