#!/bin/bash
# Pretrain-style mixing probe on device (VERDICT round-3 "Next round" #9).
#
# The reference pretrain recipe mixes 1..8 random examples per training
# example (gin/ismir2022/pretrain.gin:3-10 -> mixing.py:29-91).  The
# mixing path is CPU-tested; this probe runs a short real TPU training
# segment through cli/train with --max_examples_per_mix 8 to prove the
# k-way RLE merge + waveform mix survive the single-core host pipeline
# at speed (loss decreasing, no stall).
#
# Usage: setsid nohup bash tools/run_mixing_probe.sh >> runs/mixing_probe/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/mixing_probe
mkdir -p $RUN
STEPS=${STEPS:-500}

python -m mt3_tpu.cli.train --model mt3 \
  --data polysynth:16384:1000 --cache_dir corpus/cache \
  --steps "$STEPS" --batch_size 256 --remat --attention flash --bf16 \
  --preload_cache --max_examples_per_mix 8 \
  --checkpoint_dir $RUN/ckpt --checkpoint_period 500 \
  --log_dir $RUN/logs --log_every 20 --exit_rss_gb 70 \
  >> $RUN/train.log 2>&1
echo "$(date -u +%FT%TZ) mixing probe exited code $?"
