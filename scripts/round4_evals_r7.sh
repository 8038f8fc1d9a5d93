#!/bin/bash
# campaign_r7 domain-generalization evals (after r7 trains).
set -x
cd "$(dirname "$0")/.."
R7=artifacts/campaign_r7

# 6. campaign_r7 domain evals: in-domain (A) + HELD-OUT domain (B).
for dom in A B; do
  python scripts/eval_trajectory_campaign.py \
    --ckpt $R7/ckpt --ckpt-ema $R7/ckpt_ema \
    --seq-dir /tmp/heldout_dom$dom --frames 60 --size 256 320 \
    --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
    --domain $dom --triage \
    --out $R7/triage_domain$dom.json > $R7/triage_domain$dom.log 2>&1
done


echo R7_EVALS_DONE
