#!/bin/bash
# Flagship training wrapper.
#
# The tunneled axon TPU relay leaks every host->device transfer buffer
# (measured ~bytes-sent per step of host RSS; PERF.md "relay transfer
# leak"), so a long training run must be recycled before the OOM killer
# takes it (which is what ended the first flagship attempt at step 3280
# / 130 GB RSS).  The trainer self-exits with code 75 when RSS crosses
# --exit_rss_gb (checkpointing first); this wrapper relaunches it with
# --resume until the target step count is reached.  A watchdog also
# kills + relaunches if the log goes stale >20 min (the relay can wedge
# after heavy host contention).
#
# Usage: setsid nohup bash tools/run_flagship.sh >> runs/mt3_flagship/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/mt3_flagship
LOG=$RUN/train.log
STEPS=${STEPS:-12000}
MAX_RESTARTS=${MAX_RESTARTS:-40}

restarts=0
while [ $restarts -lt $MAX_RESTARTS ]; do
  python -m mt3_tpu.cli.train --model mt3 \
    --data polysynth:16384:1000 --cache_dir corpus/cache \
    --eval_data corpus/validation --eval_examples 24 --eval_period 1000 \
    --steps "$STEPS" --batch_size 256 --remat --attention flash --bf16 \
    --preload_cache --checkpoint_dir $RUN/ckpt --checkpoint_period 1000 \
    --log_dir $RUN/logs --log_every 20 --resume --exit_rss_gb 70 \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "$(date -u +%FT%TZ) launched trainer pid $PID (restart $restarts)"
  echo $PID > /tmp/train.pid

  while kill -0 $PID 2>/dev/null; do
    sleep 120
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
  echo "$(date -u +%FT%TZ) trainer exited code $code"
  if [ $code -eq 0 ]; then
    echo "$(date -u +%FT%TZ) training complete"
    exit 0
  fi
  restarts=$((restarts + 1))
  sleep 15
done
echo "$(date -u +%FT%TZ) giving up after $MAX_RESTARTS restarts"
exit 1
