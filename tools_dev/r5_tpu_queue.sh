#!/bin/sh
# Round-5 TPU work queue, part 1 (measurement hardening; VERDICT r4 items
# 3 and 5). One step at a time on the single chip; logs to /tmp/r5_*.log.
set -x
cd /root/repo

# 1. CDN speed-task A/B at two more seeds (seed 0 = assets/cdn_hw_ab_r4.json).
timeout 2400 python tools_dev/cdn_hw_ab.py --root /tmp/synth_r4 --seed 1 \
  --json_out /root/repo/assets/cdn_hw_ab_r5.jsonl \
  > /tmp/r5_cdn_s1.log 2>&1

timeout 2400 python tools_dev/cdn_hw_ab.py --root /tmp/synth_r4 --seed 2 \
  --json_out /root/repo/assets/cdn_hw_ab_r5.jsonl \
  > /tmp/r5_cdn_s2.log 2>&1

# 2. Finish the R1 DETR flagship run (round 4 hit its timeout at epoch 39
#    of 60, best 0.772 and still improving; resume through the lr drops so
#    the PTQ drift re-measure uses a converged checkpoint).
SPE_DECODE_CACHE=2048 timeout 4500 \
  python -m satellite_pose_estimation_tpu.tools.main \
  --data_root /tmp/synth_r4 --train_index_file train_s.txt \
  --val_index_file val_s.txt --backbone resnet50s8 --enc_layers 4 \
  --dec_layers 4 --num_queries 20 --input_size 128 --batch_size 24 \
  --dropout 0.0 --bn bn --compute_dtype bfloat16 --epochs 60 \
  --lr_drop 45 55 --output_dir /tmp/synth_r4/out_detr --seed 0 \
  --resume /tmp/synth_r4/out_detr/checkpoint0039 \
  > /tmp/r5_detr_resume.log 2>&1

echo QUEUE1_DONE
