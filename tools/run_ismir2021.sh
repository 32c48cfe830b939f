#!/bin/bash
# ismir2021 piano-flavor training run (VERDICT round-3 "Next round" #6).
#
# The second published model flavor (512-frame inputs, 127 velocity
# bins, flat programs, no ties — /root/reference/mt3/gin/ismir2021.gin)
# trained end to end on TPU on a piano-only synthetic corpus slice
# (tools/make_corpus.py --programs 0 --velocity_bins 127 --no_ties).
# Short by design: proves the flavor trains and gives the first real
# velocity-modeling datapoint (tools/velocity_diagnosis.py afterwards).
#
# Usage: setsid nohup bash tools/run_ismir2021.sh >> runs/ismir2021/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/ismir2021
LOG=$RUN/train.log
mkdir -p $RUN
STEPS=${STEPS:-6000}
BATCH=${BATCH:-64}
MAX_RESTARTS=${MAX_RESTARTS:-10}

# The 3072-segment TRAIN split lives only in corpus_piano/cache (built by
# tools/make_corpus.py, see corpus_piano/build.log).  --data below is the
# cache-miss fallback source; if the cache were missing, cli/train would
# silently rebuild it from the 24 *validation* clips and then evaluate on
# the same clips (train/eval contamination).  Refuse to start instead.
if ! ls corpus_piano/cache/cache-*.tfrecord >/dev/null 2>&1; then
  echo "ERROR: corpus_piano/cache is empty - regenerate the train cache with:"
  echo "  python tools/make_corpus.py --out corpus_piano --num 3072 \\"
  echo "      --programs 0 --velocity_bins 127 --no_ties  (see corpus_piano/build.log)"
  exit 1
fi

restarts=0
while [ $restarts -lt $MAX_RESTARTS ]; do
  python -m mt3_tpu.cli.train --model ismir2021 \
    --data corpus_piano/validation --cache_dir corpus_piano/cache \
    --eval_data corpus_piano/validation --eval_examples 16 \
    --eval_period 1000 \
    --steps "$STEPS" --batch_size "$BATCH" --remat --attention flash \
    --bf16 --preload_cache --checkpoint_dir $RUN/ckpt \
    --checkpoint_period 1000 --log_dir $RUN/logs --log_every 20 \
    --resume --exit_rss_gb 70 \
    >> "$LOG" 2>&1 &
  PID=$!
  echo "$(date -u +%FT%TZ) launched ismir2021 trainer pid $PID (restart $restarts)"
  echo $PID > /tmp/ismir2021.pid

  launch_ts=$(date +%s)
  while kill -0 $PID 2>/dev/null; do
    sleep 60
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
      # First eval compiles a fresh 512-frame decode program through the
      # relay (5-30 min); keep the watchdog above that.
      if [ $stale -gt 2400 ]; then
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
