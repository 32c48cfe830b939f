"""Quickstart: train a small model on synthetic music and transcribe it.

The self-contained analog of the reference inference colab
(music_transcription_with_transformers.ipynb): no checkpoints or
datasets needed — a tiny model is overfit to procedurally generated
audio, then run through the full transcription stack (log-mel ->
encoder -> KV-cached decode -> tie-aware stitching -> MIDI file).

Run:  python examples/quickstart.py [output_dir]
"""

import sys

import jax
import numpy as np

from mt3_tpu.codec import vocabulary
from mt3_tpu.core import midi_io
from mt3_tpu.core.config import (MT3Config, ModelConfig, RunConfig,
                                 SpectrogramConfig, VocabularyConfig)
from mt3_tpu.data import datasets, pipeline
from mt3_tpu.eval import evaluator, summaries
from mt3_tpu.infer import transcribe as transcribe_lib
from mt3_tpu.ops import spectrogram as spec_lib
from mt3_tpu.train import trainer as trainer_lib


def main(output_dir='quickstart_out'):
  import os
  os.makedirs(output_dir, exist_ok=True)

  spec_config = SpectrogramConfig()
  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=128,
      num_heads=4, num_encoder_layers=2, num_decoder_layers=2,
      head_dim=16, mlp_dim=256, dropout_rate=0.0, input_depth=512,
      max_positions=512)
  run_config = RunConfig(inputs_length=256, targets_length=160,
                         batch_size=4, learning_rate=3e-3,
                         warmup_steps=10, use_ties=True)
  config = MT3Config('quickstart', spec_config, vocab_config,
                     model_config, run_config)

  source = datasets.SyntheticDataSource(num_examples=1, duration=2.0,
                                        seed=11, polyphony=1)
  example = next(source.examples())
  summaries.write_wav(f'{output_dir}/input.wav', example['audio'])

  pipe_cfg = pipeline.TrainPipelineConfig(
      inputs_length=run_config.inputs_length,
      targets_length=run_config.targets_length,
      batch_size=run_config.batch_size)
  batches = pipeline.train_batches([example], spec_config, codec, vocab,
                                   pipe_cfg)
  tr = trainer_lib.Trainer(model_config=model_config,
                           run_config=run_config)

  batch = next(batches)
  model_batch = {
      'encoder_input_tokens': np.asarray(spec_lib.frames_to_logmel(
          batch['encoder_input_frames'], spec_config)),
      'decoder_target_tokens': batch['decoder_target_tokens'],
      'decoder_input_tokens': batch['decoder_input_tokens'],
      'decoder_loss_weights': batch['decoder_loss_weights'],
  }
  print('training (overfit on one clip)...')
  for step in range(150):
    metrics = tr.step(model_batch)
    if step % 30 == 0:
      print(f'  step {step}: loss={float(metrics["loss"]):.3f} '
            f'acc={float(metrics["accuracy"]):.3f}')

  print('transcribing...')
  transcriber = transcribe_lib.Transcriber(config, tr.state.params)
  ns = transcriber(example['audio'])
  midi_io.note_sequence_to_midi_file(ns, f'{output_dir}/transcribed.mid')
  summaries.write_wav(f'{output_dir}/resynth.wav',
                      summaries.synthesize(ns))
  summaries.save_png(f'{output_dir}/pianoroll.png',
                     summaries.pianoroll_image(ns, example['sequence']))

  scores = evaluator.evaluate_dataset([example], transcriber)
  print(f'{len(ns.notes)} notes; onset F1 = {scores["Onset F1"]:.3f}')
  print(f'outputs in {output_dir}/')


if __name__ == '__main__':
  main(*sys.argv[1:2])
