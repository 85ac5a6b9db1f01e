#!/bin/sh
# Round-4 TPU queue #2: headline refresh + host-inclusive pipeline +
# eval-tail re-dissection + in-stack attention-core A/B.
set -x
cd /root/repo

# 1. Headline bench (int8-static default) WITH the host-inclusive pipeline
BENCH_HOST=1 BENCH_DATA_ROOT=/tmp/synth_r4 timeout 4000 \
  python bench.py > /tmp/r4_bench_detr.log 2>&1

# 2. RT-DETR arch headline
BENCH_ARCH=rtdetr timeout 4000 python bench.py \
  > /tmp/r4_bench_rtdetr.log 2>&1

# 3. Train-mode bench @64 and @128 (the rotation-bmm win end-to-end)
BENCH_MODE=train BENCH_BATCH=64 timeout 3000 python bench.py \
  > /tmp/r4_bench_train64.log 2>&1
BENCH_MODE=train BENCH_BATCH=128 timeout 3000 python bench.py \
  > /tmp/r4_bench_train128.log 2>&1

# 4. Eval-tail re-dissection (VERDICT item 9)
timeout 3000 python tools_dev/rtdetr_breakdown.py \
  > /tmp/r4_rtdetr_breakdown.log 2>&1

# 5. In-stack fused vs XLA vs flash attention-core train A/B (proper patch)
timeout 3000 python tools_dev/bwd_dissect4.py \
  > /tmp/r4_bwd_dissect4.log 2>&1

echo QUEUE2_DONE
