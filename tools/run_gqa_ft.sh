#!/bin/bash
# GQA recovery finetune (VERDICT round-2 "Next round" #3).
#
# Warm-starts from the flagship MHA checkpoint, mean-pools the 6 KV
# heads to 1 (checkpoint.convert_mha_to_gqa), and finetunes briefly on
# the same corpus so the 313 audio-s/s GQA decode configuration applies
# to reference-derived models.  Gate afterwards with:
#   python tools/quality_gates.py --checkpoint runs/mt3_flagship/ckpt \
#     --data corpus/test --num 24 --gqa --gqa_checkpoint runs/gqa_ft/ckpt
#
# Usage: setsid nohup bash tools/run_gqa_ft.sh >> runs/gqa_ft/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/gqa_ft
mkdir -p $RUN
STEPS=${STEPS:-1500}

python -m mt3_tpu.cli.train --model mt3 \
  --data polysynth:16384:1000 --cache_dir corpus/cache \
  --eval_data corpus/validation --eval_examples 24 --eval_period 500 \
  --steps "$STEPS" --batch_size 256 --remat --attention flash --bf16 \
  --preload_cache --init_from runs/mt3_flagship/ckpt --gqa_kv_heads 1 \
  --lr 5e-4 --checkpoint_dir $RUN/ckpt --checkpoint_period 500 \
  --log_dir $RUN/logs --log_every 20 --exit_rss_gb 70 \
  >> $RUN/train.log 2>&1
echo "$(date -u +%FT%TZ) gqa finetune exited code $?"
