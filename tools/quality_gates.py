"""Quality gates on a trained flagship checkpoint (held-out clips).

VERDICT round 2 (weak #2): the int8/int4/GQA quality gates were anchored
to a toy model evaluated on its own training clips.  This tool re-runs
every decode-configuration gate against a real trained checkpoint on the
held-out test split:

  bf16        unquantized decode (the quality reference point)
  int8        int8 self-attention KV cache
  int4_cross  int4 self-attn cache + int8 cross K/V (bench.py production)
  int8dot     s8 x s8 -> s32 MXU attention einsums
  stacked     int4_cross with decode_cache_carry='stacked'
  beam4       beam search, num_beams=4 (the reference default decode fn)
  gqa1        mean-pooled 1-KV-head conversion (no finetune)

Prints one table of onset F1 / onset+offset F1 per configuration and the
delta vs bf16.  Gate: |delta onset F1| <= 0.02 for the quantized
configurations (the same threshold as tests/test_int8_quality.py).

Usage:
  python tools/quality_gates.py --checkpoint runs/mt3_flagship/ckpt \
      --data corpus/test --num 32 [--gqa_checkpoint runs/gqa_ft/ckpt]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from mt3_tpu.core import config as config_lib  # noqa: E402
from mt3_tpu.data import datasets  # noqa: E402
from mt3_tpu.eval import evaluator  # noqa: E402
from mt3_tpu.infer import transcribe as transcribe_lib  # noqa: E402
from mt3_tpu.models import t5  # noqa: E402
from mt3_tpu.train import checkpoint as ckpt_lib  # noqa: E402

VARIANTS = {
    'bf16': {},
    'int8': {'decode_kv_quantize': True},
    'int4_cross': {'decode_kv_quantize': True, 'decode_kv_bits': 4,
                   'decode_cross_kv_quantize': True},
    'int8dot': {'decode_kv_quantize': True,
                'decode_attention_impl': 'xla_int8dot'},
    'stacked': {'decode_kv_quantize': True, 'decode_kv_bits': 4,
                'decode_cross_kv_quantize': True,
                'decode_cache_carry': 'stacked'},
}


def load_params(checkpoint_dir: str, model_config):
  template, _ = t5.init_params(jax.random.PRNGKey(0), model_config)
  path = ckpt_lib.latest_checkpoint(checkpoint_dir) or checkpoint_dir
  print(f'restoring {path}', file=sys.stderr)
  return ckpt_lib.restore_checkpoint(path, {'params': template})['params']


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument('--checkpoint', required=True)
  parser.add_argument('--model', default='mt3')
  parser.add_argument('--data', default='corpus/test')
  parser.add_argument('--num', type=int, default=32)
  parser.add_argument('--variants',
                      default=','.join(VARIANTS) + ',beam4')
  parser.add_argument('--gqa', action='store_true',
                      help='also gate the mean-pooled 1-KV-head '
                           'conversion (no finetune)')
  parser.add_argument('--gqa_checkpoint', default=None,
                      help='a finetuned GQA checkpoint to gate as '
                           "'gqa1_ft' (params stored with 1 KV head)")
  parser.add_argument('--out', default=None,
                      help='append one JSON line per variant here')
  parser.add_argument('--tag', default=None,
                      help='checkpoint tag recorded in each output row '
                           '(e.g. checkpoint_21061)')
  args = parser.parse_args()

  base = config_lib.CONFIG_FACTORIES[args.model]()
  source = datasets.resolve_data_source(args.data, base.spectrogram,
                                        num_examples=args.num)
  examples = list(source.examples())[:args.num]
  print(f'{len(examples)} held-out clips from {args.data}',
        file=sys.stderr)

  mha_params = load_params(args.checkpoint,
                           dataclasses.replace(base.model,
                                               num_kv_heads=None))

  def run(name, overrides, params=None, num_beams=1):
    model_config = config_lib.ModelConfig(
        **{**base.model.__dict__, 'dtype': 'bfloat16', **overrides})
    config = config_lib.MT3Config(base.name, base.spectrogram, base.vocab,
                                  model_config, base.run)
    transcriber = transcribe_lib.Transcriber(
        config, params if params is not None else mha_params,
        num_beams=num_beams)
    scores = evaluator.evaluate_dataset(examples, transcriber)
    return {'variant': name,
            **({'checkpoint': args.tag} if args.tag else {}),
            'onset_f1': scores['Onset F1'],
            'onset_offset_f1': scores['Onset & offset F1']
            if 'Onset & offset F1' in scores
            else scores.get('Onset + offset F1', 0.0),
            'frame_f1': scores.get('Frame F1', 0.0),
            'onset_velocity_f1': scores.get('Onset + velocity F1', 0.0)}

  rows = []
  for name in args.variants.split(','):
    if name == 'beam4':
      # Beam search (the reference model's default decode fn,
      # /root/reference/mt3/models.py:127) on the unquantized cache.
      rows.append(run(name, {}, num_beams=4))
    else:
      rows.append(run(name, VARIANTS[name]))
    print(json.dumps(rows[-1]), flush=True)

  if args.gqa:
    # Deliberately measures the unfinetuned conversion collapse.
    gqa_params = ckpt_lib.convert_mha_to_gqa(
        mha_params, base.model.num_heads, base.model.head_dim, 1,
        allow_unfinetuned=True)
    rows.append(run('gqa1', {'num_kv_heads': 1,
                             'decode_kv_quantize': True,
                             'decode_kv_bits': 4,
                             'decode_cross_kv_quantize': True},
                    params=gqa_params))
    print(json.dumps(rows[-1]), flush=True)
  if args.gqa_checkpoint:
    gqa_ft = load_params(
        args.gqa_checkpoint,
        dataclasses.replace(base.model, num_kv_heads=1))
    rows.append(run('gqa1_ft', {'num_kv_heads': 1,
                                'decode_kv_quantize': True,
                                'decode_kv_bits': 4,
                                'decode_cross_kv_quantize': True},
                    params=gqa_ft))
    print(json.dumps(rows[-1]), flush=True)

  ref = next((r for r in rows if r['variant'] == 'bf16'), rows[0])
  print(f'\n{"variant":12s} {"onset F1":>9s} {"on+off F1":>9s} '
        f'{"frame F1":>9s} {"d(onset)":>9s}')
  for r in rows:
    print(f'{r["variant"]:12s} {r["onset_f1"]:9.4f} '
          f'{r["onset_offset_f1"]:9.4f} {r["frame_f1"]:9.4f} '
          f'{r["onset_f1"] - ref["onset_f1"]:+9.4f}')
  if args.out:
    with open(args.out, 'a') as f:
      for r in rows:
        f.write(json.dumps(r) + '\n')


if __name__ == '__main__':
  main()
