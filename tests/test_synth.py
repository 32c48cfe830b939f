"""Tests for the polyphonic procedural corpus (mt3_tpu/data/synth.py)."""

import numpy as np

from mt3_tpu.codec import event_codec, vocabulary
from mt3_tpu.core.config import SpectrogramConfig, VocabularyConfig
from mt3_tpu.data import datasets, pipeline, synth


def test_compose_deterministic():
  a = synth.compose_example(seed=7, duration=4.0)
  b = synth.compose_example(seed=7, duration=4.0)
  assert a == b
  c = synth.compose_example(seed=8, duration=4.0)
  assert a != c


def test_render_deterministic_and_bounded():
  ns = synth.compose_example(seed=3, duration=4.0)
  a1 = synth.render_note_sequence(ns, 4.0, seed=3)
  a2 = synth.render_note_sequence(ns, 4.0, seed=3)
  np.testing.assert_array_equal(a1, a2)
  assert a1.dtype == np.float32
  assert np.abs(a1).max() <= 1.0
  assert np.abs(a1).max() > 0.1


def test_programs_have_distinct_timbres():
  """Same note, different programs -> different spectra (program identity
  is audible, the property the pure-sine SyntheticDataSource lacks)."""
  from mt3_tpu.core.note_sequence import NoteSequence
  spectra = []
  for program in (0, 40, 56):
    ns = NoteSequence()
    ns.add_note(pitch=60, velocity=100, start_time=0.1, end_time=0.9,
                program=program)
    ns.total_time = 1.0
    audio = synth.render_note_sequence(ns, 1.0, seed=0)
    mag = np.abs(np.fft.rfft(audio[1600:9600]))
    spectra.append(mag / np.linalg.norm(mag))
  for i in range(len(spectra)):
    for j in range(i + 1, len(spectra)):
      cos = float(np.dot(spectra[i], spectra[j]))
      assert cos < 0.98, f'programs {i},{j} spectrally identical ({cos})'


def test_timbre_stable_across_calls():
  t1 = synth.timbre_for_program(40)
  t2 = synth.timbre_for_program(40)
  assert t1 == t2


def test_examples_are_polyphonic_multiprogram():
  src = synth.PolyphonicSynthDataSource(num_examples=16, duration=6.0,
                                        seed=0, max_instruments=4)
  programs = set()
  max_poly = 0
  any_drums = False
  for ex in src.examples():
    ns = ex['sequence']
    assert len(ex['audio']) == 6 * 16000
    for note in ns.notes:
      if note.is_drum:
        any_drums = True
      else:
        programs.add(note.program)
    # polyphony: max simultaneous non-drum notes
    events = sorted([(n.start_time, 1) for n in ns.notes if not n.is_drum]
                    + [(n.end_time, -1) for n in ns.notes if not n.is_drum])
    live = 0
    for _, delta in events:
      live += delta
      max_poly = max(max_poly, live)
  assert len(programs) >= 4, f'program diversity too low: {programs}'
  assert max_poly >= 3, f'corpus not polyphonic (max polyphony {max_poly})'
  assert any_drums


def test_tokenizes_through_pipeline_with_program_events():
  spec = SpectrogramConfig()
  codec = vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))
  vocab = vocabulary.vocabulary_from_codec(codec)
  src = synth.PolyphonicSynthDataSource(num_examples=2, duration=4.096,
                                        seed=5, max_instruments=3)
  ex = next(src.examples())
  feats = pipeline.tokenize_example(ex['sequence'], ex['audio'], spec, codec)
  lo, hi = codec.event_type_range('program')
  assert np.any((feats['targets'] >= lo) & (feats['targets'] <= hi))

  train_ex = pipeline.prepare_train_example(
      feats, codec, vocab, inputs_length=256, targets_length=1024,
      rng=np.random.RandomState(0))
  assert train_ex is not None
  assert train_ex['encoder_input_frames'].shape == (256, 128)
  assert train_ex['decoder_target_tokens'].shape == (1024,)
  assert train_ex['decoder_loss_weights'].sum() > 0


def test_resolve_polysynth_spec():
  src = datasets.resolve_data_source('polysynth:4:7')
  assert isinstance(src, synth.PolyphonicSynthDataSource)
  assert len(src) == 4
  assert src.seed == 7
