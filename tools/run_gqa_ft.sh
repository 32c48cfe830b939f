#!/bin/bash
# GQA recovery finetune (VERDICT round-3 "Next round" #2).
#
# Warm-starts from the flagship MHA checkpoint, mean-pools the 6 KV
# heads to 1 (checkpoint.convert_mha_to_gqa), and finetunes on the same
# corpus so the GQA decode configuration (PERF.md ledger) is
# quality-legal for reference-derived models.  Gate afterwards with:
#   python tools/quality_gates.py --checkpoint runs/mt3_flagship/ckpt \
#     --data corpus/test --num 24 --gqa --gqa_checkpoint runs/gqa_ft/ckpt
#
# Like run_flagship.sh this must survive the axon relay transfer leak:
# the trainer self-exits 75 at --exit_rss_gb and the loop relaunches
# with --resume (which takes precedence over --init_from once a GQA
# checkpoint exists, so finetune progress is never discarded).
#
# Usage: setsid nohup bash tools/run_gqa_ft.sh >> runs/gqa_ft/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/gqa_ft
LOG=$RUN/train.log
mkdir -p $RUN
STEPS=${STEPS:-5000}
TEACHER=${TEACHER:-runs/mt3_flagship/ckpt}
MAX_RESTARTS=${MAX_RESTARTS:-20}

restarts=0
while [ $restarts -lt $MAX_RESTARTS ]; do
  python -m mt3_tpu.cli.train --model mt3 \
    --data polysynth:16384:1000 --cache_dir corpus/cache \
    --eval_data corpus/validation --eval_examples 24 --eval_period 500 \
    --steps "$STEPS" --batch_size 256 --remat --attention flash --bf16 \
    --preload_cache --init_from "$TEACHER" --gqa_kv_heads 1 \
    --lr 5e-4 --checkpoint_dir $RUN/ckpt --checkpoint_period 500 \
    --log_dir $RUN/logs --log_every 20 --resume --exit_rss_gb 70 \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "$(date -u +%FT%TZ) launched gqa finetune pid $PID (restart $restarts)"
  echo $PID > /tmp/gqa_ft.pid

  launch_ts=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    # Init-phase wedge detector: after an exit-75 recycle the next
    # process sometimes hangs at TPU init (tiny RSS, no log progress).
    # Preload alone pushes RSS into the GBs within minutes, so a
    # several-minute-old process under 1.2 GB is wedged - kill a bit early
    # instead of waiting out the 20-min stale watchdog.
    age=$(( $(date +%s) - launch_ts ))
    rss_kb=$(ps -o rss= -p $PID 2>/dev/null | tr -d ' ')
    if [ -n "$rss_kb" ] && [ $age -gt 1080 ] && [ "$rss_kb" -lt 1200000 ]; then
      echo "$(date -u +%FT%TZ) watchdog: init wedge (age ${age}s, rss ${rss_kb}kB), killing $PID"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
    if [ -f "$LOG" ]; then
      stale=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
      if [ $stale -gt 1200 ]; then
        echo "$(date -u +%FT%TZ) watchdog: log stale ${stale}s, killing $PID"
        kill -9 $PID 2>/dev/null
        sleep 5
        break
      fi
    fi
  done

  wait $PID
  code=$?
  echo "$(date -u +%FT%TZ) gqa finetune exited code $code"
  if [ $code -eq 0 ]; then
    echo "$(date -u +%FT%TZ) finetune complete"
    exit 0
  fi
  restarts=$((restarts + 1))
  sleep 15
done
echo "$(date -u +%FT%TZ) giving up after $MAX_RESTARTS restarts"
exit 1
