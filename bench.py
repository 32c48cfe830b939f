"""Benchmark: audio-seconds transcribed per second per chip.

Measures the BASELINE.json config #3 workload: batched sliding-window
inference with 64 chunks of 256 frames (2.048 s audio each) per step —
log-mel frontend + encoder + full KV-cached autoregressive decode — on the
flagship mt3 model.

Default (driver mode, no args): randomly initialized weights with
`forbid_eos` — the conservative worst case, since greedy decode runs the
full token budget.  With `--checkpoint DIR` the trained flagship weights
are loaded, real held-out corpus audio is transcribed, and EOS early exit
is live — the realistic production number (PERF.md "trained-model bench").

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against the north-star target of 50x real time
per chip (BASELINE.md: the reference publishes no benchmark numbers).
"""

import argparse
import json
import os
import time

import jax

# Persistent compile cache: decode-loop programs take minutes to build.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          '.jax_cache')
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', _CACHE_DIR)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_SEC_PER_SEC = 50.0  # north star: 50x real time per chip

# BASELINE.json config #3 specifies 64 chunks/step; 1024 is the same
# workload at the production batch size (throughput metric unchanged:
# audio-seconds per wall-clock second per chip).
NUM_SEGMENTS = 1024
STEPS_PER_ITER = 16  # decode tokens per while-loop iteration (PERF.md)
WARMUP_ITERS = 1
TIMED_ITERS = 3


def _corpus_frames(data_dir, spec_config, inputs_length, num_segments):
  """Real held-out audio, framed and tiled to the bench batch."""
  from mt3_tpu.data import datasets
  from mt3_tpu.data import pipeline
  source = datasets.resolve_data_source(
      data_dir, spec_config, num_examples=num_segments)
  segs = []
  for ex in source.examples():
    frames, _ = pipeline.audio_to_frames(ex['audio'], spec_config)
    for start in range(0, len(frames) - inputs_length + 1, inputs_length):
      segs.append(frames[start:start + inputs_length])
      if len(segs) >= num_segments:
        break
    if len(segs) >= num_segments:
      break
  if not segs:
    raise SystemExit(
        f'no usable segments in --audio dir {data_dir!r}: need clips with '
        f'>= {inputs_length} frames ({inputs_length / spec_config.frames_per_second:.1f} s)')
  reps = -(-num_segments // len(segs))
  return np.concatenate([np.stack(segs)] * reps)[:num_segments]


def main(argv=None):
  parser = argparse.ArgumentParser()
  parser.add_argument('--checkpoint', default=None,
                      help='trained checkpoint dir: realistic mode '
                           '(real audio + EOS early exit) instead of '
                           'the random-weights worst case')
  parser.add_argument('--audio', default='corpus/validation',
                      help='corpus dir for --checkpoint mode audio')
  parser.add_argument('--kv_heads', type=int, default=1,
                      help='GQA KV heads for the decode config; the '
                           'default 1 is the production configuration, '
                           'quality-gated on the finetuned GQA '
                           'checkpoint (gqa1_ft onset F1 -0.006 vs the '
                           'MHA teacher on held-out test clips, '
                           'quality_gates.jsonl checkpoint_21061 rows). '
                           '0 = plain MHA.  A --checkpoint must be '
                           'shaped to match (runs/gqa_ft/ckpt for 1, '
                           'runs/mt3_flagship/ckpt for 0)')
  args = parser.parse_args(argv)

  from mt3_tpu.core import config as config_lib
  from mt3_tpu.infer import decode
  from mt3_tpu.models import t5
  from mt3_tpu.ops import spectrogram

  config = config_lib.mt3_config()
  # bfloat16 activations; int4-quantized self-attention KV cache, int8
  # cross-attention K/V, and GQA with 1 KV head (decode is HBM-bound on
  # cache reads; GQA cuts self-attn cache traffic 6x).  Onset-F1
  # preservation of every knob is gated on the trained flagship
  # checkpoint_21061 by tools/quality_gates.py (int4_cross +0.005,
  # stacked +0.004, gqa1_ft -0.006 vs bf16 — quality_gates.jsonl) +
  # tests/test_int8_quality.py.
  model_config = config_lib.ModelConfig(
      **{**config.model.__dict__, 'dtype': 'bfloat16',
         'decode_kv_quantize': True,
         'decode_kv_bits': 4,
         'decode_cross_kv_quantize': True,
         # In-place stacked-cache column writes instead of scan-ys
         # rebuilds: +9.7% at this batch (PERF.md round 3), onset-F1
         # gated on the trained flagship model (TRAINING.md).
         'decode_cache_carry': 'stacked',
         **({'num_kv_heads': args.kv_heads} if args.kv_heads else {})})
  spec_config = config.spectrogram
  run = config.run

  n_devices = jax.local_device_count()
  if args.checkpoint:
    from mt3_tpu.train import checkpoint as ckpt_lib
    template, _ = t5.init_params(jax.random.PRNGKey(0), model_config)
    path = (ckpt_lib.latest_checkpoint(args.checkpoint)
            or args.checkpoint)
    params = ckpt_lib.restore_checkpoint(path, {'params': template})['params']
  else:
    params, _ = t5.init_params(jax.random.PRNGKey(0), model_config)

  seg_seconds = run.inputs_length / spec_config.frames_per_second
  audio_seconds_per_iter = NUM_SEGMENTS * seg_seconds

  if args.checkpoint:
    frames = jnp.asarray(_corpus_frames(
        args.audio, spec_config, run.inputs_length,
        NUM_SEGMENTS).astype(np.float32))
  else:
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.randn(
        NUM_SEGMENTS, run.inputs_length, spec_config.hop_width
    ).astype(np.float32))

  # Trained-weights mode lets the batched EOS early exit stop the while
  # loop once every segment has finished (real music ends well before
  # the 1024-token budget); random-weights mode forbids EOS to force the
  # worst-case full-length decode.
  forbid_eos = not args.checkpoint

  @jax.jit
  def transcribe(params, frames):
    mel = spectrogram.compute_logmel(
        spectrogram.flatten_frames(frames), spec_config)
    encoded = t5.encode(params, model_config, mel)
    tokens, lengths = decode.decode_tokens(
        params, model_config, encoded, run.targets_length,
        forbid_eos=forbid_eos, steps_per_iter=STEPS_PER_ITER)
    return tokens, lengths

  # Warmup / compile.  Fetch results to host: on the tunneled platform
  # block_until_ready alone does not reliably synchronize.
  for _ in range(WARMUP_ITERS):
    tokens, lengths = transcribe(params, frames)
    np.asarray(tokens)

  # The full tokens fetch stays inside the timed region (CLAUDE.md relay
  # quirk: small fetches under-report; the ledger in PERF.md was measured
  # with the tokens transfer included).
  start = time.perf_counter()
  for _ in range(TIMED_ITERS):
    tokens, lengths = transcribe(params, frames)
    np.asarray(tokens)
  elapsed = time.perf_counter() - start
  mean_len = float(np.mean(np.asarray(lengths)))

  seconds_per_iter = elapsed / TIMED_ITERS
  audio_sec_per_sec = audio_seconds_per_iter / seconds_per_iter
  per_chip = audio_sec_per_sec / max(1, n_devices)

  result = {
      'metric': 'audio_sec_transcribed_per_sec_per_chip',
      'value': round(per_chip, 3),
      'unit': 'audio_s/s/chip',
      'vs_baseline': round(per_chip / BASELINE_AUDIO_SEC_PER_SEC, 3),
  }
  if args.checkpoint:
    result['mode'] = 'trained+eos_exit'
    result['mean_decode_len'] = round(mean_len, 1)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
