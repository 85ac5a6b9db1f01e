#!/bin/sh
# Round-5 TPU work queue, part 2 (run AFTER r5_tpu_queue.sh):
# PTQ drift at DEPLOYMENT shapes (VERDICT r4 item 3), decoder floor
# dissection (item 8), det-task CDN A/B (item 5), host-inclusive bench
# validation (items 1+6).
set -x
cd /root/repo

# 0. CDN seed-1 rerun: the queue-1 run was killed by its timeout under
#    host contention (dn arm done, baseline arm incomplete, no jsonl row).
timeout 3000 python tools_dev/cdn_hw_ab.py --root /tmp/synth_r4 --seed 1 \
  --json_out /root/repo/assets/cdn_hw_ab_r5.jsonl \
  > /tmp/r5_cdn_s1b.log 2>&1

# 1. PTQ accuracy at the shapes the int8-static headline ships:
#    DETR @224 on the converged checkpoint, RT-DETR @256.
PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn timeout 4000 \
  python tools_dev/ptq_accuracy_ab.py --arch detr \
  --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_detr/checkpoint_best \
  --resize 224 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r5.jsonl \
  > /tmp/r5_ptq_detr224.log 2>&1

PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn timeout 4000 \
  python tools_dev/ptq_accuracy_ab.py --arch rtdetr --preset flagship \
  --ema --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_rt_flag/checkpoint_best \
  --resize 256 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r5.jsonl \
  > /tmp/r5_ptq_rtdetr256.log 2>&1

PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn,attn_proj,dec timeout 4000 \
  python tools_dev/ptq_accuracy_ab.py --arch detr \
  --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_detr/checkpoint_best \
  --resize 224 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r5.jsonl \
  > /tmp/r5_ptq_detr224_wide.log 2>&1

PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn,attn_proj,dec timeout 4000 \
  python tools_dev/ptq_accuracy_ab.py --arch rtdetr --preset flagship \
  --ema --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_rt_flag/checkpoint_best \
  --resize 256 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r5.jsonl \
  > /tmp/r5_ptq_rtdetr256_wide.log 2>&1

# 2. Decoder floor dissection (sub-op timings + traffic model).
timeout 3000 python tools_dev/decoder_floor.py > /tmp/r5_decoder_floor.log 2>&1

# 3. Det-task CDN A/B on hardware (synthetic COCO selfcheck, dn on/off).
timeout 2400 python -m satellite_pose_estimation_tpu.tools.synthetic_det_selfcheck \
  --root /tmp/synth_det_r5 --out /tmp/synth_det_r5/out_dn --n_images 200 \
  --epochs 16 --batch 8 --resize 96 --num_denoising 16 --seed 0 \
  > /tmp/r5_detcdn_dn.log 2>&1
timeout 2400 python -m satellite_pose_estimation_tpu.tools.synthetic_det_selfcheck \
  --root /tmp/synth_det_r5 --out /tmp/synth_det_r5/out_base --n_images 200 \
  --epochs 16 --batch 8 --resize 96 --num_denoising 0 --seed 0 \
  > /tmp/r5_detcdn_base.log 2>&1

# 4. Bench with auto host-inclusive keys (packed-cache val pipeline).
timeout 3000 python bench.py > /tmp/r5_bench_host.json 2>/tmp/r5_bench_host.log

echo QUEUE2_DONE
