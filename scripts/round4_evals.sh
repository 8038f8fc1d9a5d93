#!/bin/bash
# Round-4 TPU eval queue (run serially after campaign_r7 finishes).
# Every block is independently resumable; logs under artifacts/.
set -x
cd "$(dirname "$0")/.."
R6=artifacts/campaign_r6
R7=artifacts/campaign_r7
TN=artifacts/campaign_r2/tnet_ckpt2

# 1. campaign_r6 FULL easy eval (pairs + depth per condition).
python scripts/eval_trajectory_campaign.py \
  --ckpt $R6/ckpt --ckpt-ema $R6/ckpt_ema \
  --seq-dir /tmp/heldout_seq_r6 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
  --out $R6/trajectory_eval.json > $R6/eval_easy.log 2>&1

# 2. campaign_r6 hard eval (+ hybrid conditions via the trained tnet).
python scripts/eval_trajectory_campaign.py \
  --ckpt $R6/ckpt --ckpt-ema $R6/ckpt_ema \
  --seq-dir /tmp/heldout_hard_r6 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.03 --step-trans 0.04 --num-points 512 \
  --tnet-ckpt $TN \
  --out $R6/trajectory_eval_hard.json > $R6/eval_hard.log 2>&1

# 3. Window-BA trajectory evals (VERDICT item 3): single + multi on
#    easy + hard, trained-EMA condition only (the baseline no-window
#    numbers are in the artifacts above).
for seq in /tmp/heldout_seq_r6 /tmp/heldout_hard_r6; do
  base=$(basename $seq)
  for mode in single multi; do
    python -m banet_tpu.cli odometry $seq \
      --out $seq/traj_winba_$mode.txt --num-points 512 \
      --max-frames 60 --checkpoint $R6/ckpt_ema \
      --window-ba --window-ba-mode $mode \
      > $R6/winba_${base}_${mode}.log 2>&1
    python -m banet_tpu.cli evaluate $seq/groundtruth.txt \
      $seq/traj_winba_$mode.txt --rpe-delta 1 --rpe-unit f \
      > $R6/winba_${base}_${mode}_ate.json 2>/dev/null
  done
done

# 4. Rescue artifact (VERDICT item 8).
python scripts/eval_rescue.py --ckpt $R6/ckpt_ema --tnet-ckpt $TN \
  --out artifacts/rescue_r4/rescue_eval.json \
  > artifacts/rescue_r4.log 2>&1

# 5. Window-depth showcase (VERDICT item 7) on the hard sequence.
python -m banet_tpu.cli depth /tmp/heldout_hard_r6 --stride 3 \
  --num-points 512 --max-pairs 8 --window 4 \
  --checkpoint $R6/ckpt_ema > $R6/depth_window_hard.json 2>$R6/depth_window_hard.log

# 5b. r5c same-harness triage (completes the 3-way postmortem table).
python scripts/eval_trajectory_campaign.py \
  --ckpt artifacts/campaign_r5c/ckpt \
  --ckpt-ema artifacts/campaign_r5c/ckpt_ema \
  --seq-dir /tmp/heldout_seq_r6 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
  --triage --out $R6/triage_r5c_today.json > $R6/triage_r5c_today.log 2>&1

# 7. On-chip microbench A/Bs: feature layouts + multi-iteration kernel.
python benchmarks/microbench.py feature_ab \
  > artifacts/PROFILE_r04_feature_ab.jsonl 2>artifacts/PROFILE_r04_feature_ab.log
python benchmarks/microbench.py tail_multi \
  > artifacts/PROFILE_r04_tail_multi.jsonl 2>artifacts/PROFILE_r04_tail_multi.log

echo ROUND4_EVALS_DONE
