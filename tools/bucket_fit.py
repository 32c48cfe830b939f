"""Decode bucket-time linear fit from an xplane profile (PERF.md ledger).

Closes the decode bandwidth accounting (VERDICT round-3 "Next round"
#3): given a profiler trace of one transcription iteration (captured by
`tools/perf_experiments.py --profile DIR`), extract the per-bucket
decode while-loop times, fit time-per-step vs live cache length, and
convert the slope to effective HBM cache-read bandwidth.

The decode program grows its KV cache in 128-slot buckets
(infer/decode.py): each bucket runs its own while loop over
steps_per_iter-unrolled decode steps, so the trace contains one
"while" region per bucket whose average step time scales with the
bucket's cache length.  The fit's slope (us per cache slot) times the
per-slot K+V byte count gives the achieved read bandwidth to compare
with the isolated ceiling (tools/cache_bw_bench.py: ~450 GB/s int4,
~740 GB/s int8).

Usage:
  python tools/perf_experiments.py --variant int4_cross --batch 1024 \
      --steps_per_iter 16 --cache_carry stacked --profile /tmp/prof
  python tools/bucket_fit.py /tmp/prof --batch 1024 --spi 16
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import os
import re
import sys

import numpy as np


def _import_xplane_pb2():
  # The xplane proto moved between TF builds; this machine's TF ships
  # it under tensorflow.tsl (verified round 5).
  errors = []
  for mod in ('tensorflow.tsl.profiler.protobuf.xplane_pb2',
              'tensorflow.core.profiler.protobuf.xplane_pb2',
              'tsl.profiler.protobuf.xplane_pb2'):
    try:
      import importlib
      return importlib.import_module(mod)
    except ImportError as e:
      errors.append(str(e))
  raise SystemExit('no xplane_pb2 module available: ' + '; '.join(errors))


def load_xplanes(profile_dir: str):
  xplane_pb2 = _import_xplane_pb2()
  paths = glob.glob(os.path.join(profile_dir, '**', '*.xplane.pb'),
                    recursive=True)
  if not paths:
    raise SystemExit(f'no .xplane.pb under {profile_dir}')
  spaces = []
  for path in paths:
    xspace = xplane_pb2.XSpace()
    with open(path, 'rb') as f:
      data = f.read()
    if data[:2] == b'\x1f\x8b':
      data = gzip.decompress(data)
    xspace.ParseFromString(data)
    spaces.append(xspace)
  return spaces


def device_line_events(xspace):
  """Yield (plane_name, event_name, duration_ps, occurrences) on TPU/device planes."""
  for plane in xspace.planes:
    name = plane.name
    if not ('TPU' in name or 'Device' in name or '/device' in name):
      continue
    metadata = plane.event_metadata
    for line in plane.lines:
      durations = collections.Counter()
      counts = collections.Counter()
      for event in line.events:
        md = metadata.get(event.metadata_id)
        ev_name = md.name if md else str(event.metadata_id)
        durations[ev_name] += event.duration_ps
        counts[ev_name] += 1
      for ev_name, dur in durations.items():
        yield name, line.name, ev_name, dur, counts[ev_name]


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('profile_dir')
  parser.add_argument('--batch', type=int, default=1024)
  parser.add_argument('--spi', type=int, default=16,
                      help='decode steps per while-loop iteration')
  parser.add_argument('--bucket', type=int, default=128)
  parser.add_argument('--max_len', type=int, default=1024)
  parser.add_argument('--layers', type=int, default=8)
  parser.add_argument('--kv_heads', type=int, default=6)
  parser.add_argument('--head_dim', type=int, default=64)
  parser.add_argument('--kv_bits', type=int, default=4)
  parser.add_argument('--top', type=int, default=0,
                      help='also dump the top-N device ops by time')
  args = parser.parse_args()

  spaces = load_xplanes(args.profile_dir)
  agg = collections.Counter()
  cnt = collections.Counter()
  for xspace in spaces:
    for plane, line, name, dur, n in device_line_events(xspace):
      agg[name] += dur
      cnt[name] += n

  if args.top:
    print('top device events by total time:')
    for name, dur in agg.most_common(args.top):
      print(f'  {dur / 1e9:10.3f} ms  x{cnt[name]:<6d} {name[:100]}')

  # Bucket while loops: one fusion/while region per bucket. Decode
  # emits buckets as separate while ops whose trip counts differ
  # (bucket/spi iterations each); identify them by name pattern and
  # sort by duration-per-iteration after dividing by trip count.
  whiles = {n: d for n, d in agg.items()
            if re.search(r'while', n, re.I) and d > 0}
  if not whiles:
    print('no while-loop events found; rerun with --top 40 to inspect',
          file=sys.stderr)
    return
  num_buckets = args.max_len // args.bucket
  # Each bucket loop runs bucket/spi iterations; every while in the
  # decode program shares that trip count, so per-STEP time is
  # duration / bucket steps.
  rows = []
  for name, dur in sorted(whiles.items(), key=lambda kv: -kv[1]):
    rows.append((name, dur))
  if len(rows) < num_buckets:
    print(f'found {len(rows)} while regions (< {num_buckets} buckets); '
          'dumping all — identify buckets manually', file=sys.stderr)
    for name, dur in rows:
      print(f'  {dur / 1e9:10.3f} ms  x{cnt[name]:<6d} {name[:110]}')
    return

  # Heuristic: the num_buckets largest while regions are the bucket
  # loops; map them to cache lengths by ascending duration (longer
  # prefix => longer loop).
  bucket_rows = sorted(rows[:num_buckets], key=lambda kv: kv[1])
  lengths = [(i + 1) * args.bucket for i in range(num_buckets)]
  per_step_ms = []
  for (name, dur), length in zip(bucket_rows, lengths):
    ms_per_step = dur / 1e9 / args.bucket
    per_step_ms.append(ms_per_step)
    print(f'bucket len={length:5d}: total {dur / 1e9:8.2f} ms '
          f'-> {ms_per_step:6.3f} ms/step   [{name[:60]}]')

  # Linear fit: ms/step = fixed + slope * (live slots / bucket).
  # Live prefix during bucket b averages length - bucket/2.
  live = np.array(lengths, np.float64) - args.bucket / 2
  y = np.array(per_step_ms, np.float64)
  slope, fixed = np.polyfit(live, y, 1)
  print(f'\nfit: fixed {fixed:.3f} ms/step + {slope * 128 * 1e3:.2f} us '
        f'per 128 cache slots')

  # Effective K+V read bandwidth from the slope.
  bytes_per_slot = (args.layers * args.batch * args.kv_heads *
                    args.head_dim * 2 * args.kv_bits / 8)
  scale_bytes = (args.layers * args.batch * args.kv_heads * 2 * 4
                 / args.bucket)  # fp32 scale per (b,h,pos) amortized
  gbps = (bytes_per_slot + scale_bytes) / (slope * 1e-3) / 1e9
  print(f'effective cache-read BW: {gbps:.0f} GB/s '
        f'({bytes_per_slot / 1e3:.1f} kB K+V per slot-step, '
        f'batch {args.batch})')


if __name__ == '__main__':
  main()
