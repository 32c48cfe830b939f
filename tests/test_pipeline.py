"""Data pipeline tests + the end-to-end overfit integration test."""

import numpy as np
import pytest

from mt3_tpu.codec import vocabulary
from mt3_tpu.core.config import (ModelConfig, RunConfig, SpectrogramConfig,
                                 VocabularyConfig)
from mt3_tpu.data import datasets, mixing, pipeline


@pytest.fixture(scope='module')
def spec_config():
  return SpectrogramConfig()


@pytest.fixture(scope='module')
def codec():
  return vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))


@pytest.fixture(scope='module')
def vocab(codec):
  return vocabulary.vocabulary_from_codec(codec)


@pytest.fixture(scope='module')
def example(spec_config, codec):
  source = datasets.SyntheticDataSource(num_examples=1, duration=3.0,
                                        seed=7)
  ex = next(source.examples())
  return pipeline.tokenize_example(ex['sequence'], ex['audio'],
                                   spec_config, codec)


def test_tokenize_example_shapes(example, spec_config):
  n_frames = len(example['inputs'])
  assert example['inputs'].shape == (n_frames, spec_config.hop_width)
  assert len(example['input_times']) == n_frames
  assert len(example['input_event_start_indices']) == n_frames
  assert len(example['input_event_end_indices']) == n_frames
  # end[i] == start[i+1] (reference encode_and_index_events contract).
  np.testing.assert_array_equal(example['input_event_end_indices'][:-1],
                                example['input_event_start_indices'][1:])


def test_split_tokens(example):
  chunks = pipeline.split_tokens(example, max_tokens=100)
  assert sum(len(c['inputs']) for c in chunks) == len(example['inputs'])
  assert all(len(c['inputs']) <= 100 for c in chunks)
  # Passthrough features untouched.
  assert all(len(c['targets']) == len(example['targets']) for c in chunks)


def test_select_random_chunk(example):
  rng = np.random.RandomState(0)
  chunk = pipeline.select_random_chunk(example, 50, rng)
  assert len(chunk['inputs']) == 50
  assert len(chunk['input_event_start_indices']) == 50


def test_prepare_train_example(example, codec, vocab):
  rng = np.random.RandomState(0)
  ex = pipeline.prepare_train_example(
      example, codec, vocab, inputs_length=128, targets_length=512,
      rng=rng)
  assert ex is not None
  assert ex['encoder_input_frames'].shape == (128, 128)
  assert ex['decoder_target_tokens'].shape == (512,)
  # EOS present, decoder inputs are shifted targets.
  targets = ex['decoder_target_tokens']
  n = int((targets > 0).sum())
  assert targets[n - 1] == vocab.eos_id
  np.testing.assert_array_equal(ex['decoder_input_tokens'][1:n],
                                targets[:n - 1])
  assert ex['decoder_input_tokens'][0] == 0


def test_train_batches_iterator(spec_config, codec, vocab):
  source = datasets.SyntheticDataSource(num_examples=2, duration=2.0,
                                        seed=3)
  cfg = pipeline.TrainPipelineConfig(
      inputs_length=64, targets_length=384, batch_size=3)
  it = pipeline.train_batches(source.examples(), spec_config, codec,
                              vocab, cfg)
  batch = next(it)
  assert batch['encoder_input_frames'].shape == (3, 64, 128)
  assert batch['decoder_target_tokens'].shape == (3, 384)
  batch2 = next(it)
  assert not np.array_equal(batch['encoder_input_frames'],
                            batch2['encoder_input_frames'])


def test_mixing(codec):
  ex1 = {'inputs': np.ones(100, np.float32),
         'targets': np.array([3, 161, 162, 5, 163], np.int32)}
  ex2 = {'inputs': 0.5 * np.ones(80, np.float32),
         'targets': np.array([160, 164, 3, 165], np.int32)}
  mixed = mixing.mix_examples([ex1, ex2], codec)
  assert mixed['inputs'].shape == (100,)
  assert np.max(np.abs(mixed['inputs'])) == pytest.approx(1.0)
  assert len(mixed['targets']) > 0


def test_mixture_source_rates():
  a = datasets.SyntheticDataSource(num_examples=8, duration=0.5, seed=0)
  b = datasets.SyntheticDataSource(num_examples=1, duration=0.5, seed=1)
  mix = datasets.MixtureSource([a, b], temperature=10 / 3)
  # rate ratio = (8/1)^(3/10) ~ 1.87
  assert mix.probs[0] / mix.probs[1] == pytest.approx(8 ** 0.3, rel=1e-6)
  it = mix.examples()
  for _ in range(5):
    ex = next(it)
    assert 'sequence' in ex and 'audio' in ex


def test_local_pairs_round_trip(tmp_path, spec_config):
  import wave
  from mt3_tpu.core import midi_io
  from mt3_tpu.core.note_sequence import NoteSequence
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=90, start_time=0.1, end_time=0.4)
  ns.total_time = 0.5
  midi_io.note_sequence_to_midi_file(ns, str(tmp_path / 'x.mid'))
  samples = (np.sin(np.linspace(0, 440 * 2 * np.pi, 8000)) * 0.5
             * 32767).astype(np.int16)
  with wave.open(str(tmp_path / 'x.wav'), 'wb') as w:
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes(samples.tobytes())
  source = datasets.LocalPairsDataSource(str(tmp_path), spec_config)
  assert len(source) == 1
  ex = next(source.examples())
  assert len(ex['sequence'].notes) == 1
  assert ex['audio'].shape == (8000,)


def test_overfit_and_transcribe_end_to_end(spec_config):
  """Train a tiny model to memorize one clip, then transcribe it back.

  The full loop: synthetic audio -> pipeline -> train step (spectrogram
  on device) -> KV-cached decode -> stitching -> note F1.
  """
  import jax
  from mt3_tpu.core.config import MT3Config
  from mt3_tpu.core.note_sequence import sequence_to_valued_intervals
  from mt3_tpu.eval import transcription
  from mt3_tpu.infer import transcribe as transcribe_lib
  from mt3_tpu.ops import spectrogram as spec_lib
  from mt3_tpu.train import trainer as trainer_lib

  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=128,
      num_heads=4, num_encoder_layers=2, num_decoder_layers=2, head_dim=16,
      mlp_dim=256, dropout_rate=0.0, input_depth=512, max_positions=512)
  run_config = RunConfig(inputs_length=256, targets_length=160,
                         batch_size=4, learning_rate=3e-3,
                         warmup_steps=10, use_ties=True)

  source = datasets.SyntheticDataSource(num_examples=1, duration=2.0,
                                        seed=11, polyphony=1)
  example = next(source.examples())

  pipe_cfg = pipeline.TrainPipelineConfig(
      inputs_length=run_config.inputs_length,
      targets_length=run_config.targets_length,
      batch_size=run_config.batch_size)
  batches = pipeline.train_batches([example], spec_config, codec, vocab,
                                   pipe_cfg)

  tr = trainer_lib.Trainer(model_config=model_config,
                           run_config=run_config)

  def to_model_batch(batch):
    return {
        'encoder_input_tokens': np.asarray(spec_lib.frames_to_logmel(
            batch['encoder_input_frames'], spec_config)),
        'decoder_target_tokens': batch['decoder_target_tokens'],
        'decoder_input_tokens': batch['decoder_input_tokens'],
        'decoder_loss_weights': batch['decoder_loss_weights'],
    }

  batch = to_model_batch(next(batches))
  for step in range(150):
    metrics = tr.step(batch)
  assert float(metrics['accuracy']) > 0.9, float(metrics['accuracy'])

  config = MT3Config('test', spec_config, vocab_config, model_config,
                     run_config)
  transcriber = transcribe_lib.Transcriber(config, tr.state.params)
  est_ns = transcriber(example['audio'])

  ref_intervals, ref_pitches, _ = sequence_to_valued_intervals(
      example['sequence'])
  est_intervals, est_pitches, _ = sequence_to_valued_intervals(est_ns)
  _, _, f1, _ = transcription.precision_recall_f1_overlap(
      ref_intervals, ref_pitches, est_intervals, est_pitches,
      offset_ratio=None)
  assert f1 > 0.8, f'onset F1 too low after overfit: {f1}'


def test_tfrecord_data_source(tmp_path, spec_config):
  from mt3_tpu.core import midi_io
  from mt3_tpu.core.note_sequence import NoteSequence
  from mt3_tpu.data import tfrecord

  ns = NoteSequence()
  ns.add_note(pitch=64, velocity=90, start_time=0.2, end_time=0.8)
  ns.total_time = 1.0
  audio = np.random.RandomState(0).randn(16000).astype(np.float32)
  rec = tfrecord.make_example({
      'audio': audio,
      'sequence': [midi_io.note_sequence_to_midi(ns)],
      'id': [b'ex0'],
  })
  path = str(tmp_path / 'data.tfrecord')
  tfrecord.write_records(path, [rec, rec])

  source = datasets.TFRecordDataSource(path, spec_config)
  assert len(source) == 2
  ex = next(source.examples())
  assert ex['sequence'].id == 'ex0'
  assert len(ex['sequence'].notes) == 1
  np.testing.assert_allclose(ex['audio'], audio, atol=1e-6)


def test_maestro_data_source(tmp_path, spec_config):
  import json
  import wave
  from mt3_tpu.core import midi_io
  from mt3_tpu.core.note_sequence import NoteSequence

  root = tmp_path / 'maestro'
  (root / '2020').mkdir(parents=True)
  for i, split in enumerate(['train', 'validation']):
    ns = NoteSequence()
    ns.add_note(pitch=60 + i, velocity=90, start_time=0.1, end_time=0.4)
    ns.total_time = 0.5
    midi_io.note_sequence_to_midi_file(ns, str(root / f'2020/x{i}.midi'))
    samples = np.zeros(4000, np.int16)
    with wave.open(str(root / f'2020/x{i}.wav'), 'wb') as w:
      w.setnchannels(1)
      w.setsampwidth(2)
      w.setframerate(16000)
      w.writeframes(samples.tobytes())
  # v3-style column-oriented metadata.
  meta = {
      'split': {'0': 'train', '1': 'validation'},
      'audio_filename': {'0': '2020/x0.wav', '1': '2020/x1.wav'},
      'midi_filename': {'0': '2020/x0.midi', '1': '2020/x1.midi'},
  }
  with open(root / 'maestro-v3.0.0.json', 'w') as f:
    json.dump(meta, f)

  train = datasets.MaestroDataSource(str(root), 'train', spec_config)
  val = datasets.MaestroDataSource(str(root), 'validation', spec_config)
  assert len(train) == 1 and len(val) == 1
  ex = next(train.examples())
  assert ex['sequence'].notes[0].pitch == 60
  assert next(val.examples())['sequence'].notes[0].pitch == 61


def test_prefetch_preserves_order():
  items = list(pipeline.prefetch(iter(range(20)), size=3))
  assert items == list(range(20))


def test_overfit_transcribe_int8_cache(spec_config):
  """int8 KV cache preserves transcription quality on a trained model."""
  import jax
  from mt3_tpu.core.config import MT3Config
  from mt3_tpu.core.note_sequence import sequence_to_valued_intervals
  from mt3_tpu.eval import transcription
  from mt3_tpu.infer import transcribe as transcribe_lib
  from mt3_tpu.ops import spectrogram as spec_lib
  from mt3_tpu.train import trainer as trainer_lib

  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=128,
      num_heads=4, num_encoder_layers=2, num_decoder_layers=2, head_dim=16,
      mlp_dim=256, dropout_rate=0.0, input_depth=512, max_positions=512)
  run_config = RunConfig(inputs_length=256, targets_length=160,
                         batch_size=4, learning_rate=3e-3,
                         warmup_steps=10, use_ties=True)
  source = datasets.SyntheticDataSource(num_examples=1, duration=2.0,
                                        seed=11, polyphony=1)
  example = next(source.examples())
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
  for _ in range(150):
    tr.step(model_batch)

  q_model = ModelConfig(**{**model_config.__dict__,
                           'decode_kv_quantize': True})
  config = MT3Config('test', spec_config, vocab_config, q_model,
                     run_config)
  transcriber = transcribe_lib.Transcriber(config, tr.state.params)
  est_ns = transcriber(example['audio'])
  ref_intervals, ref_pitches, _ = sequence_to_valued_intervals(
      example['sequence'])
  est_intervals, est_pitches, _ = sequence_to_valued_intervals(est_ns)
  _, _, f1, _ = transcription.precision_recall_f1_overlap(
      ref_intervals, ref_pitches, est_intervals, est_pitches,
      offset_ratio=None)
  assert f1 > 0.8, f'onset F1 with int8 cache: {f1}'


def test_train_batches_deterministic_by_seed(spec_config, codec, vocab):
  def batches_with_seed(seed):
    source = datasets.SyntheticDataSource(num_examples=2, duration=1.5,
                                          seed=3)
    cfg = pipeline.TrainPipelineConfig(
        inputs_length=64, targets_length=384, batch_size=2, seed=seed)
    it = pipeline.train_batches(source.examples(), spec_config, codec,
                                vocab, cfg)
    return [next(it) for _ in range(3)]

  a = batches_with_seed(7)
  b = batches_with_seed(7)
  c = batches_with_seed(8)
  for x, y in zip(a, b):
    for k in x:
      np.testing.assert_array_equal(x[k], y[k])
  assert any(not np.array_equal(x['decoder_target_tokens'],
                                y['decoder_target_tokens'])
             for x, y in zip(a, c))


def test_tokenize_onsets_only(spec_config):
  codec = vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))
  source = datasets.SyntheticDataSource(num_examples=1, duration=1.0,
                                        seed=2)
  ex = next(source.examples())
  features = pipeline.tokenize_example(
      ex['sequence'], ex['audio'], spec_config, codec,
      onsets_only=True, include_ties=False)
  # Onsets-only: every non-shift event is a pitch.
  pitch_lo, pitch_hi = codec.event_type_range('pitch')
  targets = features['targets']
  non_shift = targets[targets > codec.max_shift_steps]
  assert len(non_shift) == len(ex['sequence'].notes)
  assert np.all((non_shift >= pitch_lo) & (non_shift <= pitch_hi))
  with pytest.raises(ValueError):
    pipeline.tokenize_example(ex['sequence'], ex['audio'], spec_config,
                              codec, onsets_only=True, include_ties=True)


def test_train_batches_with_mixing():
  """max_examples_per_mix wires mixing into the train chain (reference
  tasks.py:161-166: mix between RLE and state-change dedup)."""
  from mt3_tpu.core.config import SpectrogramConfig, VocabularyConfig
  from mt3_tpu.data import datasets

  spec = SpectrogramConfig()
  codec = vocabulary.build_codec(VocabularyConfig())
  vocab = vocabulary.vocabulary_from_codec(codec)
  source = datasets.SyntheticDataSource(num_examples=4, duration=2.0,
                                        seed=3)
  cfg = pipeline.TrainPipelineConfig(
      inputs_length=64, targets_length=512, batch_size=4,
      max_examples_per_mix=2, seed=1)
  batch = next(pipeline.train_batches(source.examples(), spec, codec,
                                      vocab, cfg))
  assert batch['encoder_input_frames'].shape == (4, 64, spec.hop_width)
  # Mixed audio is inf-norm normalized: amplitudes stay within [-1, 1].
  assert float(np.abs(batch['encoder_input_frames']).max()) <= 1.0 + 1e-6
  # Targets are a valid time-ordered RLE stream: decoded shift values
  # never decrease within a segment.
  tgt = batch['decoder_target_tokens'][0]
  decoded = vocab.decode(tgt[tgt > 0].tolist())
  shifts = [i for i in decoded if 0 <= i <= codec.max_shift_steps
            and codec.is_shift_event_index(i)]
  assert shifts == sorted(shifts)


def test_overfit_transcribe_gqa_end_to_end(spec_config):
  """Grouped-query attention end to end: train a 1-KV-head model from
  scratch, transcribe, assert perfect onset recovery.  The from-scratch
  GQA + int4 story behind the 313 audio-s/s decode ceiling (PERF.md)."""
  import jax
  from mt3_tpu.core.config import MT3Config
  from mt3_tpu.core.note_sequence import sequence_to_valued_intervals
  from mt3_tpu.eval import transcription
  from mt3_tpu.infer import transcribe as transcribe_lib
  from mt3_tpu.ops import spectrogram as spec_lib
  from mt3_tpu.train import trainer as trainer_lib

  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=128,
      num_heads=4, num_kv_heads=1, num_encoder_layers=2,
      num_decoder_layers=2, head_dim=16, mlp_dim=256, dropout_rate=0.0,
      input_depth=512, max_positions=512, dtype='bfloat16',
      decode_kv_quantize=True, decode_kv_bits=4,
      decode_cross_kv_quantize=True)
  run_config = RunConfig(inputs_length=256, targets_length=160,
                         batch_size=4, learning_rate=3e-3,
                         warmup_steps=10, use_ties=True)

  source = datasets.SyntheticDataSource(num_examples=1, duration=2.0,
                                        seed=13, polyphony=1)
  example = next(source.examples())
  pipe_cfg = pipeline.TrainPipelineConfig(
      inputs_length=run_config.inputs_length,
      targets_length=run_config.targets_length,
      batch_size=run_config.batch_size)
  batches = pipeline.train_batches([example], spec_config, codec, vocab,
                                   pipe_cfg)
  tr = trainer_lib.Trainer(model_config=model_config,
                           run_config=run_config)
  batch = next(batches)
  batch['encoder_input_tokens'] = np.asarray(spec_lib.frames_to_logmel(
      batch['encoder_input_frames'], spec_config))
  for _ in range(150):
    metrics = tr.step(batch)
  assert float(metrics['accuracy']) > 0.9, float(metrics['accuracy'])

  config = MT3Config('gqa', spec_config, vocab_config, model_config,
                     run_config)
  transcriber = transcribe_lib.Transcriber(config, tr.state.params)
  est_ns = transcriber(example['audio'])
  ref_intervals, ref_pitches, _ = sequence_to_valued_intervals(
      example['sequence'])
  est_intervals, est_pitches, _ = sequence_to_valued_intervals(est_ns)
  _, _, f1, _ = transcription.precision_recall_f1_overlap(
      ref_intervals, ref_pitches, est_intervals, est_pitches,
      offset_ratio=None)
  assert f1 > 0.9, f1
