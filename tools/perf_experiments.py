"""Decode-throughput experiment runner (real TPU).

Usage:
  python tools/perf_experiments.py --variant xla_bucket --batch 256
  python tools/perf_experiments.py --variant pallas --batch 256

Each variant measures the full transcription device program (log-mel ->
encoder -> full-length decode) and prints ms/iter and audio-s/s.
Results log: PERF.md.
"""

import argparse
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir',
                  '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from mt3_tpu.core import config as config_lib  # noqa: E402
from mt3_tpu.infer import decode  # noqa: E402
from mt3_tpu.models import t5  # noqa: E402
from mt3_tpu.ops import spectrogram  # noqa: E402

VARIANTS = {
    # (cache_update, attention_impl, bucket_size[, kv_quantize])
    'onehot_nobucket': ('onehot', 'xla', 1024),
    'onehot_bucket': ('onehot', 'xla', 128),
    'xla_bucket': ('dus', 'xla', 128),
    'xla_nobucket': ('dus', 'xla', 1024),
    'pallas_v3': ('dus', 'pallas_v3', 1024),
    'xla_bucket64': ('dus', 'xla', 64),
    'int8': ('dus', 'xla', 128, True),
    'int8_bucket256': ('dus', 'xla', 256, True),
    # int8 self-attn cache AND int8 cross-attention K/V (the fixed
    # per-step HBM read).
    'int8_cross': ('dus', 'xla', 128, True, True),
    # Grouped-query attention (from-scratch training only): 1 KV head
    # shared by all 6 query heads -> 6x less self-attn cache traffic.
    'int8_cross_gqa1': ('dus', 'xla', 128, True, True, 1),
    'gqa1': ('dus', 'xla', 128, False, False, 1),
    # int4 self-attn cache (+ int8 cross K/V).
    'int4_cross': ('dus', 'xla', 128, True, True, None, 4),
    # s8 x s8 -> s32 MXU attention einsums (no cache upconversion).
    'int8dot_cross': ('dus', 'xla_int8dot', 128, True, True),
    # From-scratch ceiling: GQA (1 KV head) + int4 cache + int8 cross.
    'int4_cross_gqa1': ('dus', 'xla', 128, True, True, 1, 4),
}


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--variant', default='xla_bucket',
                      choices=sorted(VARIANTS))
  parser.add_argument('--batch', type=int, default=256)
  parser.add_argument('--iters', type=int, default=2)
  parser.add_argument('--bucket', type=int, default=None,
                      help='override the variant cache-growth bucket size')
  parser.add_argument('--steps_per_iter', type=int, default=1,
                      help='decode steps unrolled per while_loop iteration')
  parser.add_argument('--profile', default=None,
                      help='capture a jax profiler trace to this directory '
                           'around one timed iteration')
  parser.add_argument('--cache_carry', default=None,
                      choices=['scan', 'stacked'],
                      help='decode_cache_carry override (stacked = '
                           'in-place column writes to the stacked cache)')
  parser.add_argument('--num_beams', type=int, default=0,
                      help='>1: decode with beam search (forbid_eos, '
                           'full-length worst case) instead of greedy; '
                           'the reference default decode fn '
                           '(models.py:127) — cost table in PERF.md')
  args = parser.parse_args()

  variant = VARIANTS[args.variant]
  cache_update, attn_impl, bucket = variant[:3]
  if args.bucket:
    bucket = args.bucket
  kv_quantize = len(variant) > 3 and variant[3]
  cross_quantize = len(variant) > 4 and variant[4]
  num_kv_heads = variant[5] if len(variant) > 5 else None
  kv_bits = variant[6] if len(variant) > 6 else 8
  config = config_lib.mt3_config()
  model_config = config_lib.ModelConfig(**{
      **config.model.__dict__, 'dtype': 'bfloat16',
      'decode_cache_update': cache_update,
      'decode_attention_impl': attn_impl,
      'decode_kv_quantize': kv_quantize,
      'decode_cross_kv_quantize': cross_quantize,
      'num_kv_heads': num_kv_heads,
      'decode_kv_bits': kv_bits,
      **({'decode_cache_carry': args.cache_carry}
         if args.cache_carry else {})})
  spec_config = config.spectrogram
  run = config.run
  params, _ = t5.init_params(jax.random.PRNGKey(0), model_config)
  rng = np.random.RandomState(0)
  frames = jnp.asarray(rng.randn(
      args.batch, run.inputs_length,
      spec_config.hop_width).astype(np.float32))

  if args.num_beams > 1:
    from mt3_tpu.infer import beam_search

    @jax.jit
    def transcribe(params, frames):
      mel = spectrogram.compute_logmel(
          spectrogram.flatten_frames(frames), spec_config)
      encoded = t5.encode(params, model_config, mel)
      return beam_search.beam_search(params, model_config, encoded,
                                     run.targets_length,
                                     num_beams=args.num_beams,
                                     forbid_eos=True)
  else:
    @jax.jit
    def transcribe(params, frames):
      mel = spectrogram.compute_logmel(
          spectrogram.flatten_frames(frames), spec_config)
      encoded = t5.encode(params, model_config, mel)
      return decode.decode_tokens(params, model_config, encoded,
                                  run.targets_length, forbid_eos=True,
                                  bucket_size=bucket,
                                  steps_per_iter=args.steps_per_iter)

  tag = (f'{args.variant} batch={args.batch} spi={args.steps_per_iter}'
         + (f' beams={args.num_beams}' if args.num_beams > 1 else ''))
  t0 = time.perf_counter()
  np.asarray(transcribe(params, frames)[0])
  print(f'{tag}: compile+run {time.perf_counter() - t0:.1f}s', flush=True)
  times = []
  for _ in range(args.iters):
    t0 = time.perf_counter()
    np.asarray(transcribe(params, frames)[0])
    times.append(time.perf_counter() - t0)
  dt = min(times)
  print(f'{tag}: {dt * 1000:.0f} ms '
        f'-> {args.batch * 2.048 / dt:.1f} audio_s/s', flush=True)

  if args.profile:
    jax.profiler.start_trace(args.profile)
    t0 = time.perf_counter()
    np.asarray(transcribe(params, frames)[0])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f'{tag}: profiled iter {dt * 1000:.0f} ms -> trace in '
          f'{args.profile}', flush=True)


if __name__ == '__main__':
  main()
