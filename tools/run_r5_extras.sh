#!/bin/bash
# Optional round-5 extras, run ONLY after tools/run_r5_queue.sh prints
# QUEUE COMPLETE (chained by the waiter below).  Closes the remaining
# PERF.md "Open experiments" item that is measurable this round:
# flash vs XLA attention at the ismir2021 512-frame training length,
# where score materialization is 4x the mt3 length.  Also re-runs the
# default bench once so the driver's end-of-round BENCH_r05 hits a warm
# compile cache.
#
# Usage: setsid nohup bash tools/run_r5_extras.sh > runs/r5_queue/extras_wrapper.log 2>&1 &

cd /root/repo
RUN=runs/r5_queue
LOG=$RUN/queue.log
say() { echo "$(date -u +%FT%TZ) $*" | tee -a $LOG; }

# Wait (up to 10 h) for the main queue to finish; never overlap TPU jobs.
for i in $(seq 1 600); do
  grep -q "QUEUE COMPLETE" $LOG 2>/dev/null && break
  sleep 60
done
grep -q "QUEUE COMPLETE" $LOG || { say "extras: main queue never completed; aborting"; exit 1; }

step() {
  local name=$1; shift
  if [ -f $RUN/done.$name ]; then say "SKIP $name (done)"; return; fi
  say "START $name: $*"
  "$@" >> $RUN/$name.log 2>&1
  local rc=$?
  say "END $name rc=$rc"
  [ $rc -eq 0 ] && touch $RUN/done.$name
}

step i21_xla   python tools/train_bench.py --model ismir2021 --batch 64 --bf16 --remat
step i21_flash python tools/train_bench.py --model ismir2021 --batch 64 --bf16 --remat --flash
step bench_warm python bench.py

say "EXTRAS COMPLETE"
