#!/bin/bash
# Round-3 perf measurement session (serial; the chip is behind a relay
# so nothing else should run concurrently).  Produces
# artifacts/PROFILE_r03/* and BENCH-style stdout logs.
set -x
cd /root/repo
OUT=artifacts/PROFILE_r03

# 1. fused-damping A/B (per-GN-iteration slope)
ITER_SLOPE_ONLY=chol_mlp,pallasmlp,mlp_only \
  python benchmarks/microbench.py iter_slope \
  > $OUT/iter_slope_fused_damping.log 2>&1

# 2. per-stage table at the SHIPPED inference config, B=1
python scripts/pyramid_stage_bench.py --per-stage --s2d \
  --pad-mode zero --feature-dtype bfloat16 \
  --out $OUT/stage_b1.json > $OUT/stage_b1.log 2>&1

# 3. same at B=8 (batch-efficiency table; shorter chain, 8x work/call)
python scripts/pyramid_stage_bench.py --per-stage --s2d \
  --pad-mode zero --feature-dtype bfloat16 --batch 8 \
  --k-small 1 --k-big 5 \
  --out $OUT/stage_b8.json > $OUT/stage_b8.log 2>&1

# 4. headline bench at the shipped checkpoint/config
python bench.py > $OUT/bench_r03.log 2>&1

# 5. reference EVAL shape (480x640, N=4096)
BANET_BENCH_H=480 BANET_BENCH_W=640 BANET_BENCH_N=4096 \
  python bench.py > $OUT/bench_evalscale.log 2>&1

echo DONE
