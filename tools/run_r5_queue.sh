#!/bin/bash
# Round-5 TPU measurement queue (ROUND5_NOTES items 5-8), serialized.
#
# Order is risk-managed: the chip wedged for >3 h after the int4 beam
# gather crash (round-5 /tmp/pe_beam*.log), so every crash-safe
# measurement runs first and the int4 beam-fix verification runs LAST,
# with the whole remaining window as recovery margin.
#
# Each step is a fresh python process (CLAUDE.md: post-abort runs can
# fail in the same chain).  Progress and results append to
# runs/r5_queue/queue.log; a step that exits nonzero is recorded and the
# queue continues (measurements are independent).
#
# Usage: setsid nohup bash tools/run_r5_queue.sh > runs/r5_queue/wrapper.log 2>&1 &

cd /root/repo
RUN=runs/r5_queue
mkdir -p $RUN
LOG=$RUN/queue.log

say() { echo "$(date -u +%FT%TZ) $*" | tee -a $LOG; }

step() {
  local name=$1; shift
  if [ -f $RUN/done.$name ]; then say "SKIP $name (done)"; return; fi
  say "START $name: $*"
  "$@" >> $RUN/$name.log 2>&1
  local rc=$?
  say "END $name rc=$rc"
  [ $rc -eq 0 ] && touch $RUN/done.$name
}

# 0. Wait for the chip to come back (fresh process per attempt;
#    init after a wedge can legitimately take ~15 min, so each probe
#    gets 20 min before we recycle it).
probe_ok=0
for i in $(seq 1 20); do
  say "probe attempt $i"
  timeout 1200 python - <<'EOF' >> $RUN/probe.log 2>&1
import numpy as np, jax
x = jax.device_put(np.ones((256, 256), np.float32))
print('probe ok', np.asarray(jax.numpy.dot(x, x))[0, 0], flush=True)
EOF
  if [ $? -eq 0 ]; then probe_ok=1; say "chip healthy"; break; fi
  say "probe failed/timed out; retrying in 60s"
  sleep 60
done
[ $probe_ok -eq 1 ] || { say "ABORT: chip never came back"; exit 1; }

# 1. Trained-weights bench (ROUND5_NOTES #7 / VERDICT #7): realistic
#    throughput with EOS early exit on real corpus audio, vs the
#    shipped forbid_eos worst case 317.1.
step trained_bench python bench.py --checkpoint runs/gqa_ft/ckpt --audio corpus/test

# 2. Bandwidth accounting (VERDICT #6): profile the production config,
#    fit the per-bucket model, and run the residual-attribution patterns.
step bw_profile python tools/perf_experiments.py --variant int4_cross_gqa1 \
  --batch 1024 --steps_per_iter 16 --cache_carry stacked --profile /tmp/prof_r5
step bw_fit python tools/bucket_fit.py /tmp/prof_r5 --batch 1024 --spi 16 --kv_heads 1
step bw_patterns python tools/cache_bw_bench.py --patterns masked,written,interleaved --batch 1024

# 3. Beam cost (VERDICT #5), crash-safe int8 cache first.  Greedy
#    baseline at the same batch/variant for the ratio; int4_cross greedy
#    b256 spi16 is already on record (209.9 audio-s/s, pe_greedy256).
step beam_g8 python tools/perf_experiments.py --variant int8_cross --batch 256 --steps_per_iter 16 --cache_carry stacked
step beam2_8 python tools/perf_experiments.py --variant int8_cross --batch 256 --num_beams 2
step beam4_8 python tools/perf_experiments.py --variant int8_cross --batch 256 --num_beams 4

# 4. Mixing probe (VERDICT #8): 500-step pretrain-style mix<=8 training
#    segment on device.
step mixing bash tools/run_mixing_probe.sh

# 5. LAST (crash risk): verify the int4 beam gather fix (commit
#    6c22da8).  If this wedges the chip again, everything above is
#    already banked and the remaining window is recovery margin.
step beam2_4 python tools/perf_experiments.py --variant int4_cross --batch 256 --num_beams 2
step beam4_4 python tools/perf_experiments.py --variant int4_cross --batch 256 --num_beams 4

# 6. Post-risk health check so the end-of-round driver bench isn't the
#    first thing to discover a wedge.
step posthealth timeout 1200 python -c "
import numpy as np, jax
x = jax.device_put(np.ones((256,256), np.float32))
print('post ok', np.asarray(jax.numpy.dot(x,x))[0,0])"

say "QUEUE COMPLETE"
