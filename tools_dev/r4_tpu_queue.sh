#!/bin/sh
# Round-4 TPU work queue (run AFTER the RT-DETR flagship selfcheck ends).
# Each step logs to /tmp/r4_*.log; one step at a time on the single chip.
set -x
cd /root/repo

# 1. PTQ accuracy A/B on the RT-DETR flagship checkpoint (500-image val),
#    deployment scope and widest scope (TPU eval mode).
PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn timeout 3000 \
  python tools_dev/ptq_accuracy_ab.py --arch rtdetr --preset flagship \
  --ema --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_rt_flag/checkpoint_best \
  --resize 128 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r4.jsonl \
  > /tmp/r4_ptq_rtdetr_default.log 2>&1

PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn,attn_proj,dec timeout 3000 \
  python tools_dev/ptq_accuracy_ab.py --arch rtdetr --preset flagship \
  --ema --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_rt_flag/checkpoint_best \
  --resize 128 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r4.jsonl \
  > /tmp/r4_ptq_rtdetr_wide.log 2>&1

# 2. Train the R1 DETR flagship checkpoint on the same dataset.
SPE_DECODE_CACHE=2048 timeout 4200 \
  python -m satellite_pose_estimation_tpu.tools.main \
  --data_root /tmp/synth_r4 --train_index_file train_s.txt \
  --val_index_file val_s.txt --backbone resnet50s8 --enc_layers 4 \
  --dec_layers 4 --num_queries 20 --input_size 128 --batch_size 24 \
  --dropout 0.0 --bn bn --compute_dtype bfloat16 --epochs 60 \
  --lr_drop 45 55 --output_dir /tmp/synth_r4/out_detr --seed 0 \
  > /tmp/r4_detr_train.log 2>&1

# 3. PTQ accuracy A/B on the DETR checkpoint (same two scopes).
PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn timeout 3000 \
  python tools_dev/ptq_accuracy_ab.py --arch detr \
  --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_detr/checkpoint_best \
  --resize 128 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r4.jsonl \
  > /tmp/r4_ptq_detr_default.log 2>&1

PTQ_AB_TPU=1 SPE_INT8_SCOPE=conv,ffn,attn_proj,dec timeout 3000 \
  python tools_dev/ptq_accuracy_ab.py --arch detr \
  --root /tmp/synth_r4 --ckpt /tmp/synth_r4/out_detr/checkpoint_best \
  --resize 128 --batch 25 --json_out /root/repo/assets/ptq_accuracy_r4.jsonl \
  > /tmp/r4_ptq_detr_wide.log 2>&1

echo QUEUE_DONE
