#!/bin/bash
# Round-5 block 4 for ONE checkpoint dir ($1): window-BA evals.
set -x
cd /root/repo
R8=artifacts/campaign_r8
ck=$1
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
  python -m banet_tpu.cli odometry $seq \
    --out $seq/traj_nowin_${tag}.txt --num-points 512 \
    --max-frames 60 --checkpoint $ck/ckpt_ema \
    > $R8/nowin_${tag}_${base}.log 2>&1
  python -m banet_tpu.cli evaluate $seq/groundtruth.txt \
    $seq/traj_nowin_${tag}.txt --rpe-delta 1 --rpe-unit f \
    > $R8/nowin_${tag}_${base}_ate.json 2>/dev/null
done
echo BLOCK4_${tag}_DONE
