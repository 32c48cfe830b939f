"""Training-step throughput benchmark (real TPU).

Measures jit'd train-step wall time for the flagship mt3 model and
reports steps/s, tokens/s, and model FLOP/s utilization.

Usage: python tools/train_bench.py --batch 64 [--bf16] [--remat]
"""

import argparse
import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from mt3_tpu.core import config as config_lib  # noqa: E402
from mt3_tpu.train import trainer as trainer_lib  # noqa: E402


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--model', default='mt3',
                      choices=['mt3', 'ismir2021'])
  parser.add_argument('--batch', type=int, default=64)
  parser.add_argument('--bf16', action='store_true')
  parser.add_argument('--remat', action='store_true')
  parser.add_argument('--remat_policy', default='full',
                      choices=['full', 'dots'])
  parser.add_argument('--flash', action='store_true',
                      help='stock TPU Pallas flash attention (no score '
                           'materialization); attention dropout is '
                           'applied as a pre-kernel V rescale')
  parser.add_argument('--no_dropout', action='store_true',
                      help='dropout_rate=0')
  parser.add_argument('--iters', type=int, default=5)
  parser.add_argument('--profile', default=None,
                      help='capture a jax profiler trace of one step')
  args = parser.parse_args()

  config = (config_lib.ismir2021_config() if args.model == 'ismir2021'
            else config_lib.mt3_config())
  model_config = config_lib.ModelConfig(**{
      **config.model.__dict__,
      'dtype': 'bfloat16' if args.bf16 else 'float32',
      'remat': args.remat, 'remat_policy': args.remat_policy,
      'train_attention_impl': 'flash' if args.flash else 'xla',
      'dropout_rate': (0.0 if args.no_dropout
                       else config.model.dropout_rate)})
  run = config.run

  tr = trainer_lib.Trainer(model_config=model_config, run_config=run)
  rng = np.random.RandomState(0)
  batch = trainer_lib.make_train_batch(
      rng, args.batch, run.inputs_length, run.targets_length,
      model_config.input_depth, model_config.vocab_size)
  # Spectrogram is upstream of this benchmark; feed mel directly.
  batch['encoder_input_tokens'] = rng.randn(
      args.batch, run.inputs_length,
      model_config.input_depth).astype(np.float32)

  # Stage the batch on device once: the host->device transfer of ~35 MB
  # per step through the remote tunnel otherwise dominates wall time
  # (trace: 366 ms device vs 915 ms wall at batch 64).  Real training
  # overlaps transfers with compute via the prefetch pipeline.
  batch = jax.device_put(batch)

  t0 = time.perf_counter()
  m = tr.step(batch)
  jax.block_until_ready(tr.state.params)
  float(m['loss'])
  print(f'compile+first step: {time.perf_counter() - t0:.1f}s',
        flush=True)

  t0 = time.perf_counter()
  for _ in range(args.iters):
    m = tr.step(batch)
  jax.block_until_ready(tr.state.params)
  float(m['loss'])
  dt = (time.perf_counter() - t0) / args.iters

  # Rough FLOP model: 6 * params * target-tokens + encoder share.
  n_params = sum(x.size for x in jax.tree_util.tree_leaves(
      tr.state.params))
  tokens = args.batch * (run.inputs_length + run.targets_length)
  flops = 6 * n_params * tokens
  print(f'{args.model} batch={args.batch} bf16={args.bf16} '
        f'remat={args.remat}'
        f'/{args.remat_policy} flash={args.flash}: '
        f'{dt * 1000:.0f} ms/step, {1 / dt:.2f} steps/s, '
        f'{tokens / dt / 1e6:.2f}M tokens/s, '
        f'~{flops / dt / 1e12:.1f} TFLOP/s', flush=True)


  if args.profile:
    jax.profiler.start_trace(args.profile)
    m = tr.step(batch)
    jax.block_until_ready(tr.state.params)
    float(m['loss'])
    jax.profiler.stop_trace()
    print(f'trace written to {args.profile}', flush=True)


if __name__ == '__main__':
  main()
