"""CLI: train a model.

Usage:
  python -m mt3_tpu.cli.train --model tiny --data synthetic --steps 100

Rebuild of the t5x train binary flow (reference gin/train.gin) with
dataclass configs instead of gin: dataset -> pipeline -> jit'd sharded
train step -> periodic checkpoint + eval.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


from mt3_tpu.core.config import CONFIG_FACTORIES


def _rss_gb() -> float:
  with open('/proc/self/status') as f:
    for line in f:
      if line.startswith('VmRSS'):
        return int(line.split()[1]) / 1024 / 1024
  return 0.0


def main(argv=None):
  parser = argparse.ArgumentParser(description='Train a transcription model')
  parser.add_argument('--model', default='tiny',
                      choices=sorted(CONFIG_FACTORIES))
  parser.add_argument('--data', default='synthetic',
                      help="'synthetic', a directory of wav+midi pairs, "
                           'or reference-schema .tfrecord file(s)')
  parser.add_argument('--dataset', default='maestrov3',
                      help='corpus schema for .tfrecord inputs')
  parser.add_argument('--steps', type=int, default=None)
  parser.add_argument('--batch_size', type=int, default=None)
  parser.add_argument('--checkpoint_dir', default=None)
  parser.add_argument('--checkpoint_period', type=int, default=None)
  parser.add_argument('--resume', action='store_true',
                      help='resume from latest checkpoint in '
                           'checkpoint_dir')
  parser.add_argument('--init_from', default=None,
                      help='warm-start parameters from a checkpoint '
                           'directory/path with a fresh optimizer (the '
                           'reference finetune recipe, '
                           'gin/ismir2022/finetune.gin:21-24)')
  parser.add_argument('--gqa_kv_heads', type=int, default=0,
                      help='with --init_from: convert the (MHA) '
                           'checkpoint to grouped-query attention with '
                           'N KV heads before finetuning')
  parser.add_argument('--eval_period', type=int, default=0,
                      help='run transcription eval every N steps')
  parser.add_argument('--eval_data', default=None,
                      help='held-out eval data (same formats as --data); '
                           'defaults to a held-out synthetic split')
  parser.add_argument('--eval_examples', type=int, default=4)
  parser.add_argument('--cache_dir', default=None,
                      help='offline tokenization cache directory; built '
                           'on first use if empty (reference tasks.py:150 '
                           'CacheDatasetPlaceholder analog)')
  parser.add_argument('--log_dir', default=None,
                      help='TensorBoard event + metrics.jsonl directory')
  parser.add_argument('--num_model_partitions', type=int, default=1)
  parser.add_argument('--log_every', type=int, default=10)
  parser.add_argument('--seed', type=int, default=0)
  # Model/run overrides for production runs (the gin-override analog).
  parser.add_argument('--remat', action='store_true',
                      help='rematerialize transformer layers (required '
                           'for batch 256 on a 16 GB chip)')
  parser.add_argument('--attention', default=None,
                      choices=['xla', 'flash'],
                      help='training attention impl override')
  parser.add_argument('--dropout', type=float, default=None,
                      help='dropout rate override')
  parser.add_argument('--lr', type=float, default=None)
  parser.add_argument('--bf16', action='store_true',
                      help='bfloat16 activations')
  parser.add_argument('--preload_cache', action='store_true',
                      help='decode the segment cache into RAM once '
                           '(recommended at large batch sizes)')
  parser.add_argument('--compile_cache', default='/root/repo/.jax_cache',
                      help='persistent XLA compile cache dir '
                           '(empty string disables)')
  parser.add_argument('--max_examples_per_mix', type=int, default=None,
                      help='override the preset: mix 1..N random '
                           'examples per training example (the '
                           'reference pretrain recipe uses 8, '
                           'gin/ismir2022/pretrain.gin:3-10)')
  parser.add_argument('--exit_rss_gb', type=float, default=0,
                      help='if >0: when host RSS exceeds this many GB, '
                           'checkpoint and exit with code 75 so a '
                           'wrapper can relaunch with --resume (works '
                           'around the axon relay leaking every '
                           'host->device transfer buffer)')
  args = parser.parse_args(argv)

  import jax
  if args.compile_cache:
    jax.config.update('jax_compilation_cache_dir', args.compile_cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
  from mt3_tpu.codec import vocabulary
  from mt3_tpu.core import config as config_lib
  from mt3_tpu.data import datasets, pipeline
  from mt3_tpu.parallel import partitioning
  from mt3_tpu.train import checkpoint as ckpt_lib
  from mt3_tpu.train import trainer as trainer_lib

  import dataclasses
  config = config_lib.CONFIG_FACTORIES[args.model]()
  model_overrides = {}
  if args.remat:
    model_overrides['remat'] = True
  if args.attention is not None:
    model_overrides['train_attention_impl'] = args.attention
  if args.dropout is not None:
    model_overrides['dropout_rate'] = args.dropout
  if args.bf16:
    model_overrides['dtype'] = 'bfloat16'
  if args.gqa_kv_heads:
    model_overrides['num_kv_heads'] = args.gqa_kv_heads
  if model_overrides:
    config = dataclasses.replace(
        config, model=dataclasses.replace(config.model, **model_overrides))
  if args.lr is not None:
    config = dataclasses.replace(
        config, run=dataclasses.replace(config.run, learning_rate=args.lr))
  run = config.run
  steps = args.steps if args.steps is not None else run.train_steps
  batch_size = args.batch_size or run.batch_size

  codec = vocabulary.build_codec(config.vocab)
  vocab = vocabulary.vocabulary_from_codec(codec)

  source = datasets.resolve_data_source(
      args.data, config.spectrogram, dataset=args.dataset,
      is_training=True, num_examples=8, seed=args.seed)
  print(f'dataset: {len(source)} examples', file=sys.stderr)

  pipe_cfg = pipeline.TrainPipelineConfig(
      inputs_length=run.inputs_length, targets_length=run.targets_length,
      batch_size=batch_size, onsets_only=run.onsets_only,
      include_ties=run.use_ties,
      program_granularity=run.program_granularity,
      max_examples_per_mix=(args.max_examples_per_mix
                            if args.max_examples_per_mix is not None
                            else run.max_examples_per_mix),
      seed=args.seed)
  if args.cache_dir:
    import os
    if not any(f.startswith('cache-') for f in (
        os.listdir(args.cache_dir) if os.path.isdir(args.cache_dir)
        else ())):
      n = pipeline.build_segment_cache(
          source.examples(), config.spectrogram, codec, args.cache_dir,
          onsets_only=run.onsets_only, include_ties=run.use_ties)
      print(f'built segment cache: {n} segments -> {args.cache_dir}',
            file=sys.stderr)
    raw_batches = pipeline.train_batches_from_cache(
        args.cache_dir, codec, vocab, pipe_cfg,
        preload=args.preload_cache)
  else:
    raw_batches = pipeline.train_batches(
        source.examples(), config.spectrogram, codec, vocab, pipe_cfg)

  mesh = None
  if len(jax.devices()) > 1:
    mesh = partitioning.make_mesh(args.num_model_partitions)
    print(f'mesh: {dict(mesh.shape)}', file=sys.stderr)

  tr = trainer_lib.Trainer(model_config=config.model, run_config=run,
                           mesh=mesh, seed=args.seed)
  start_step = 0
  if args.init_from:
    from mt3_tpu.models import t5
    load_config = dataclasses.replace(config.model, num_kv_heads=None)
    template, _ = t5.init_params(jax.random.PRNGKey(0), load_config)
    path = (ckpt_lib.latest_checkpoint(args.init_from) or args.init_from)
    loaded = ckpt_lib.restore_checkpoint(path, {'params': template})
    params = loaded['params']
    if args.gqa_kv_heads:
      print(f'converting to GQA: {config.model.num_heads} -> '
            f'{args.gqa_kv_heads} KV heads', file=sys.stderr)
      # Recovery finetune follows immediately, so the unfinetuned
      # warm start is legitimate here.
      params = ckpt_lib.convert_mha_to_gqa(
          params, config.model.num_heads, config.model.head_dim,
          args.gqa_kv_heads, allow_unfinetuned=True)
    tr.load_params(params)
    print(f'warm-started params from {path}', file=sys.stderr)
  if args.resume and args.checkpoint_dir:
    try:
      start_step = tr.restore(args.checkpoint_dir)
      print(f'resumed from step {start_step}', file=sys.stderr)
    except Exception as e:  # no checkpoint yet
      print(f'no checkpoint to resume ({e}); starting fresh',
            file=sys.stderr)

  from mt3_tpu.ops import spectrogram as spec_lib
  import jax.numpy as jnp

  spec_config = config.spectrogram

  # The spectrogram runs inside the jitted step: convert raw audio frames
  # to encoder inputs on device.  This runs on the prefetch thread so
  # host->device transfer overlaps the previous step.
  #
  # Transfers use compact dtypes (int16 audio at 96 dB SNR, int16 tokens
  # — vocab 1536 << 32767 — and uint8 loss weights): the tunneled axon
  # relay leaks every host->device transfer buffer (~RSS += bytes sent;
  # see PERF.md "relay transfer leak"), so halving bytes/step doubles
  # how long a training process lives before --exit_rss_gb recycles it.
  @jax.jit
  def _expand_batch(frames_i16, targets_i16, inputs_i16, weights_u8):
    frames = frames_i16.astype(jnp.float32) / 32767.0
    return {
        'encoder_input_tokens': spec_lib.frames_to_logmel(
            frames, spec_config),
        'decoder_target_tokens': targets_i16.astype(jnp.int32),
        'decoder_input_tokens': inputs_i16.astype(jnp.int32),
        'decoder_loss_weights': weights_u8.astype(jnp.float32),
    }

  _clip_warned = []

  def to_model_batch(batch):
    frames = np.asarray(batch['encoder_input_frames'])
    peak = float(np.max(np.abs(frames))) if frames.size else 0.0
    if peak > 1.0 and not _clip_warned:
      # int16 compact transfer assumes full-scale audio (synth corpus
      # peaks <=0.96); louder sources would be silently distorted.
      _clip_warned.append(True)
      print(f'WARNING: audio batch peak {peak:.3f} > 1.0 will be '
            'clipped by the int16 compact-transfer quantization; '
            'normalize the data source', file=sys.stderr)
    frames_i16 = np.clip(np.round(frames * 32767.0), -32768,
                         32767).astype(np.int16)
    return _expand_batch(
        jnp.asarray(frames_i16),
        jnp.asarray(np.asarray(
            batch['decoder_target_tokens']).astype(np.int16)),
        jnp.asarray(np.asarray(
            batch['decoder_input_tokens']).astype(np.int16)),
        jnp.asarray(np.asarray(
            batch['decoder_loss_weights']).astype(np.uint8)))

  batches = pipeline.prefetch(raw_batches, transform=to_model_batch)

  # Held-out eval split (reference gin/train.gin:89-97: seqio.Evaluator
  # every eval_period steps over the eval tasks, logging the full metric
  # family to TensorBoard + JSON).
  if args.eval_data:
    # Offset the default seed so 'polysynth[:N]' eval specs (without an
    # explicit seed) never collide with the training clips.
    eval_source = datasets.resolve_data_source(
        args.eval_data, config.spectrogram, dataset=args.dataset,
        num_examples=args.eval_examples, seed=args.seed + 1_000_000)
  elif args.data == 'synthetic':
    eval_source = datasets.SyntheticDataSource(
        num_examples=args.eval_examples, duration=4.0,
        sample_rate=config.spectrogram.sample_rate, seed=args.seed + 1)
  elif args.data.startswith('polysynth'):
    from mt3_tpu.data.synth import PolyphonicSynthDataSource
    eval_source = PolyphonicSynthDataSource(
        num_examples=args.eval_examples, seed=args.seed + 1_000_000,
        max_instruments=4,
        sample_rate=config.spectrogram.sample_rate)
  else:
    eval_source = source

  tb_writer = None
  metrics_path = None
  if args.log_dir:
    import os
    from mt3_tpu.utils import tensorboard as tb_lib
    os.makedirs(args.log_dir, exist_ok=True)
    tb_writer = tb_lib.SummaryWriter(args.log_dir)
    metrics_path = os.path.join(args.log_dir, 'metrics.jsonl')

  def run_eval(step):
    from mt3_tpu.eval import evaluator
    from mt3_tpu.infer import transcribe as transcribe_lib
    transcriber = transcribe_lib.Transcriber(config, tr.state.params)
    eval_examples = list(eval_source.examples())[:args.eval_examples]
    scores = evaluator.evaluate_dataset(eval_examples, transcriber)
    print(f'eval@{step}: onset F1 = {scores.get("Onset F1", 0):.4f} '
          f'onset+offset F1 = '
          f'{scores.get("Onset + offset F1", 0):.4f}', file=sys.stderr)
    if tb_writer is not None:
      tb_writer.add_scalars(
          {f'eval/{k}': float(v) for k, v in scores.items()}, step)
    print(evaluator.write_metrics(scores, metrics_path, step=step),
          file=sys.stderr)

  ckpt_period = args.checkpoint_period or run.checkpoint_period
  last_saved_step = start_step
  start = time.time()
  for step in range(start_step, steps):
    batch = next(batches)
    metrics = tr.step(batch)
    if step % args.log_every == 0 or step == steps - 1:
      elapsed = time.time() - start
      print(f'step {step}: loss={float(metrics["loss"]):.4f} '
            f'acc={float(metrics["accuracy"]):.3f} '
            f'lr={float(metrics["learning_rate"]):.2e} '
            f'({(step - start_step + 1) / max(elapsed, 1e-9):.2f} '
            f'steps/s)', file=sys.stderr)
      if tb_writer is not None:
        tb_writer.add_scalars(
            {f'train/{k}': float(v) for k, v in metrics.items()}, step)
    if args.checkpoint_dir and (step + 1) % ckpt_period == 0:
      # Async: the write overlaps subsequent steps (finalized at exit).
      print(f'saving checkpoint: '
            f'{tr.save(args.checkpoint_dir, asynchronous=True)}',
            file=sys.stderr)
      last_saved_step = step + 1
    if args.eval_period and (step + 1) % args.eval_period == 0:
      run_eval(step + 1)
    if (args.exit_rss_gb and step % args.log_every == 0
        and _rss_gb() > args.exit_rss_gb):
      print(f'RSS {_rss_gb():.1f} GB > --exit_rss_gb '
            f'{args.exit_rss_gb}; checkpointing and exiting 75 for '
            f'relaunch', file=sys.stderr)
      if args.checkpoint_dir:
        tr.finalize_saves()
        print(f'saved restart checkpoint: {tr.save(args.checkpoint_dir)}',
              file=sys.stderr)
      sys.exit(75)

  tr.finalize_saves()
  if args.checkpoint_dir and last_saved_step != steps:
    print(f'saved final checkpoint: {tr.save(args.checkpoint_dir)}',
          file=sys.stderr)
  del ckpt_lib


if __name__ == '__main__':
  main()
