#!/bin/bash
# Round-5 TPU eval queue (run serially; campaign_r8 must be trained
# first, the window-BA finetune campaign_r9 before block 4).  Every
# block is independently resumable; logs under artifacts/.
set -x
cd "$(dirname "$0")/.."
R8=artifacts/campaign_r8
R9=artifacts/campaign_r9
TN=artifacts/campaign_r2/tnet_ckpt2

# 1. campaign_r8 easy + hard trajectory evals (same protocol as r6:
#    held-out seed 9999, 60 frames, 256x320).
python scripts/eval_trajectory_campaign.py \
  --ckpt $R8/ckpt --ckpt-ema $R8/ckpt_ema \
  --seq-dir /tmp/heldout_seq_r8 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
  --out $R8/trajectory_eval.json > $R8/eval_easy.log 2>&1
python scripts/eval_trajectory_campaign.py \
  --ckpt $R8/ckpt --ckpt-ema $R8/ckpt_ema \
  --seq-dir /tmp/heldout_hard_r8 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.03 --step-trans 0.04 --num-points 512 \
  --out $R8/trajectory_eval_hard.json > $R8/eval_hard.log 2>&1

# 2. Domain-generalization triage (VERDICT item 2): in-domain A,
#    held-out-statistics B, photographic-statistics P.
for dom in A B P; do
  python scripts/eval_trajectory_campaign.py \
    --ckpt $R8/ckpt --ckpt-ema $R8/ckpt_ema \
    --seq-dir /tmp/heldout_dom$dom --frames 60 --size 256 320 \
    --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
    --domain $dom --triage \
    --out $R8/triage_domain$dom.json > $R8/triage_domain$dom.log 2>&1
done

# 3. r5c same-harness triage (completes the round-4 3-way postmortem
#    table; VERDICT r4 weak #7).
python scripts/eval_trajectory_campaign.py \
  --ckpt artifacts/campaign_r5c/ckpt \
  --ckpt-ema artifacts/campaign_r5c/ckpt_ema \
  --seq-dir /tmp/heldout_seq_r8 --frames 60 --size 256 320 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 512 \
  --triage --out $R8/triage_r5c.json > $R8/triage_r5c.log 2>&1

# 4. Window-BA trajectory evals with the window-TRAINED finetune
#    (campaign_r9) AND the r8 base, single + multi, easy + hard
#    (VERDICT item 3: does training through the window solve make
#    window BA earn its keep?).
for ck in $R8 $R9; do
  [ -d $ck/ckpt_ema ] || continue
  tag=$(basename $ck)
  for seq in /tmp/heldout_seq_r8 /tmp/heldout_hard_r8; do
    base=$(basename $seq | sed s/heldout_//)
    for mode in single multi; do
      python -m banet_tpu.cli odometry $seq \
        --out $seq/traj_winba_${tag}_$mode.txt --num-points 512 \
        --max-frames 60 --checkpoint $ck/ckpt_ema \
        --window-ba --window-ba-mode $mode \
        > $R8/winba_${tag}_${base}_${mode}.log 2>&1
      python -m banet_tpu.cli evaluate $seq/groundtruth.txt \
        $seq/traj_winba_${tag}_$mode.txt --rpe-delta 1 --rpe-unit f \
        > $R8/winba_${tag}_${base}_${mode}_ate.json 2>/dev/null
    done
    # No-window baseline for the same checkpoint.
    python -m banet_tpu.cli odometry $seq \
      --out $seq/traj_nowin_${tag}.txt --num-points 512 \
      --max-frames 60 --checkpoint $ck/ckpt_ema \
      > $R8/nowin_${tag}_${base}.log 2>&1
    python -m banet_tpu.cli evaluate $seq/groundtruth.txt \
      $seq/traj_nowin_${tag}.txt --rpe-delta 1 --rpe-unit f \
      > $R8/nowin_${tag}_${base}_ate.json 2>/dev/null
  done
done

# 5. Rescue artifact (VERDICT item 4; eval_rescue's samples default
#    fixed in 8d8c1ae).
mkdir -p artifacts/rescue_r5
python scripts/eval_rescue.py --ckpt $R8/ckpt_ema --tnet-ckpt $TN \
  --out artifacts/rescue_r5/rescue_eval.json \
  > artifacts/rescue_r5.log 2>&1

# 6. Window-depth showcase on the hard sequence (VERDICT item 4).
python -m banet_tpu.cli depth /tmp/heldout_hard_r8 --stride 3 \
  --num-points 512 --max-pairs 8 --window 4 \
  --checkpoint $R8/ckpt_ema > $R8/depth_window_hard.json \
  2>$R8/depth_window_hard.log

# 7. Reference eval operating point (VERDICT item 5): bench at
#    480x640 / N=4096, and a trajectory eval at 480x640.
BANET_BENCH_H=480 BANET_BENCH_W=640 BANET_BENCH_N=4096 \
  python bench.py > artifacts/BENCH_480x640_r5.json 2>artifacts/BENCH_480x640_r5.log
python scripts/eval_trajectory_campaign.py \
  --ckpt $R8/ckpt --ckpt-ema $R8/ckpt_ema \
  --seq-dir /tmp/heldout_480 --frames 40 --size 480 640 \
  --seed 9999 --step-rot 0.01 --step-trans 0.02 --num-points 4096 \
  --out $R8/trajectory_eval_480x640.json > $R8/eval_480.log 2>&1

echo ROUND5_EVALS_DONE
