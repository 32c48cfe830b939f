"""CLI: transcribe audio files to MIDI.

Usage:
  python -m mt3_tpu.cli.transcribe --model mt3 --checkpoint DIR \
      input1.wav [input2.wav ...] --output_dir out/

Rebuild of the reference colab inference entry point
(music_transcription_with_transformers.ipynb) as a command-line tool.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import numpy as np


from mt3_tpu.core.config import CONFIG_FACTORIES


def main(argv=None):
  parser = argparse.ArgumentParser(description='Audio -> MIDI transcription')
  parser.add_argument('inputs', nargs='+', help='input .wav files')
  parser.add_argument('--model', default='mt3',
                      choices=sorted(CONFIG_FACTORIES))
  parser.add_argument('--checkpoint', default=None,
                      help='checkpoint directory (latest step used)')
  parser.add_argument('--t5x_checkpoint', default=None,
                      help='published T5X checkpoint directory '
                           '(gs://mt3/checkpoints layout: msgpack + '
                           'TensorStore); converted on load')
  parser.add_argument('--output_dir', default='.')
  parser.add_argument('--temperature', type=float, default=0.0)
  parser.add_argument('--num_beams', type=int, default=0,
                      help='>1 enables beam search (the reference t5x '
                           'default decoder, models.py:127); 0 = greedy')
  parser.add_argument('--int8_kv', action='store_true',
                      help='int8-quantize the decode KV caches (the '
                           'bench.py production configuration)')
  parser.add_argument('--gqa_kv_heads', type=int, default=0,
                      help='run grouped-query attention with N KV '
                           'heads.  The checkpoint must already be '
                           'GQA-shaped (produced by the recovery '
                           'finetune, cli/train --gqa_kv_heads); to '
                           'convert an MHA checkpoint on the fly add '
                           '--convert_gqa_unfinetuned')
  parser.add_argument('--convert_gqa_unfinetuned', action='store_true',
                      help='mean-pool an MHA checkpoint to GQA at load '
                           'time WITHOUT the required recovery '
                           'finetune.  Quality collapses (onset F1 '
                           '~0.01, TRAINING.md) — debugging only')
  args = parser.parse_args(argv)

  from mt3_tpu.core import config as config_lib
  from mt3_tpu.core import midi_io
  from mt3_tpu.data.datasets import read_wav
  from mt3_tpu.infer import transcribe as transcribe_lib
  from mt3_tpu.models import t5
  from mt3_tpu.train import checkpoint as ckpt_lib

  config = config_lib.CONFIG_FACTORIES[args.model]()
  model_config = config_lib.ModelConfig(
      **{**config.model.__dict__, 'dtype': 'bfloat16',
         'decode_kv_quantize': args.int8_kv,
         'decode_cross_kv_quantize': args.int8_kv,
         **({'num_kv_heads': args.gqa_kv_heads}
            if args.gqa_kv_heads else {})})
  config = config_lib.MT3Config(
      config.name, config.spectrogram, config.vocab, model_config,
      config.run)

  # Finetuned GQA checkpoints are GQA-shaped and restore directly; with
  # --convert_gqa_unfinetuned the checkpoint is MHA-shaped and gets
  # mean-pooled after load (debugging only — see the flag help).
  convert_gqa = args.gqa_kv_heads and args.convert_gqa_unfinetuned
  load_model_config = (config_lib.ModelConfig(
      **{**config.model.__dict__, 'num_kv_heads': None})
      if (convert_gqa or not args.gqa_kv_heads) else config.model)
  if args.t5x_checkpoint:
    from mt3_tpu.train import t5x_loader
    print(f'converting t5x checkpoint {args.t5x_checkpoint}',
          file=sys.stderr)
    params = t5x_loader.load_t5x_params(
        args.t5x_checkpoint,
        num_encoder_layers=config.model.num_encoder_layers,
        num_decoder_layers=config.model.num_decoder_layers)
  elif args.checkpoint:
    template, _ = t5.init_params(jax.random.PRNGKey(0), load_model_config)
    path = ckpt_lib.latest_checkpoint(args.checkpoint) or args.checkpoint
    print(f'restoring checkpoint from {path}', file=sys.stderr)
    state = ckpt_lib.restore_checkpoint(path, {'params': template})
    params = state['params']
  else:
    print('WARNING: no checkpoint given; using random weights',
          file=sys.stderr)
    params, _ = t5.init_params(jax.random.PRNGKey(0), load_model_config)

  if convert_gqa:
    print(f'converting to GQA: {config.model.num_heads} -> '
          f'{args.gqa_kv_heads} KV heads (mean-pooled, UNFINETUNED — '
          'expect collapsed quality)', file=sys.stderr)
    params = ckpt_lib.convert_mha_to_gqa(
        params, config.model.num_heads, config.model.head_dim,
        args.gqa_kv_heads, allow_unfinetuned=True)

  transcriber = transcribe_lib.Transcriber(config, params,
                                           temperature=args.temperature,
                                           num_beams=args.num_beams)
  os.makedirs(args.output_dir, exist_ok=True)
  for path in args.inputs:
    audio = read_wav(path, config.spectrogram.sample_rate)
    start = time.time()
    ns = transcriber(audio)
    elapsed = time.time() - start
    out_path = os.path.join(
        args.output_dir,
        os.path.splitext(os.path.basename(path))[0] + '.mid')
    midi_io.note_sequence_to_midi_file(ns, out_path)
    audio_sec = len(audio) / config.spectrogram.sample_rate
    print(f'{path}: {audio_sec:.1f}s audio, {len(ns.notes)} notes, '
          f'{elapsed:.1f}s ({audio_sec / max(elapsed, 1e-9):.1f}x RT) '
          f'-> {out_path}')


if __name__ == '__main__':
  main()
