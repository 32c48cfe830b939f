"""Tests for per-dataset program lookup and multi-track assembly."""

import numpy as np
import pytest

from mt3_tpu.codec import note_events, vocabulary
from mt3_tpu.core.config import SpectrogramConfig, VocabularyConfig
from mt3_tpu.core.note_sequence import NoteSequence, PitchBend
from mt3_tpu.data import program_maps


def test_lookup_tables():
  assert program_maps.guitarset_instrument_to_program('Clean Guitar') == 24
  with pytest.raises(ValueError):
    program_maps.guitarset_instrument_to_program('Banjo')
  assert program_maps.urmp_instrument_to_program('vn') == 40
  assert program_maps.urmp_instrument_to_program('fl') == 73
  with pytest.raises(ValueError):
    program_maps.urmp_instrument_to_program('kazoo')
  assert program_maps.slakh_class_to_program_and_is_drum('Drums') == (0,
                                                                      True)
  assert program_maps.slakh_class_to_program_and_is_drum(
      'Acoustic Piano') == (0, False)
  assert program_maps.slakh_class_to_program_and_is_drum(
      'Electric Bass') == (33, False)


def _track(pitch, start=0.0, end=1.0):
  ns = NoteSequence()
  ns.add_note(pitch=pitch, velocity=100, start_time=start, end_time=end)
  ns.total_time = end
  return ns


def test_assemble_multitrack_slakh():
  tracks = [_track(60), _track(36, 0.5, 0.6)]
  ns = program_maps.assemble_multitrack(
      tracks, ['Acoustic Piano', 'Drums'], slakh_classes=True)
  programs = sorted((n.program, n.is_drum) for n in ns.notes)
  assert programs == [(0, False), (0, True)]
  drum_notes = [n for n in ns.notes if n.is_drum]
  assert drum_notes[0].instrument == 9


def test_assemble_multitrack_track_specs():
  specs = [note_events.TrackSpec('bass', program=32),
           note_events.TrackSpec('drums', is_drum=True)]
  tracks = [_track(40), _track(38)]
  ns = program_maps.assemble_multitrack(
      tracks, ['bass', 'drums'], track_specs=specs)
  assert {(n.program, n.is_drum) for n in ns.notes} == {(32, False),
                                                        (0, True)}


def test_pitch_bend_drops_example():
  track = _track(60)
  track.pitch_bends.append(PitchBend(time=0.5, bend=100))
  out = program_maps.assemble_multitrack(
      [track], ['Acoustic Piano'], slakh_classes=True,
      ignore_pitch_bends=False)
  assert out is None
  # Ignoring pitch bends keeps the example.
  out = program_maps.assemble_multitrack(
      [track], ['Acoustic Piano'], slakh_classes=True,
      ignore_pitch_bends=True)
  assert out is not None


def test_training_trims_overlaps():
  track = NoteSequence()
  track.add_note(pitch=60, velocity=100, start_time=0.0, end_time=2.0)
  track.add_note(pitch=60, velocity=100, start_time=1.0, end_time=3.0)
  track.total_time = 3.0
  ns = program_maps.assemble_multitrack(
      [track], ['Acoustic Piano'], slakh_classes=True,
      is_training_data=True)
  times = sorted((n.start_time, n.end_time) for n in ns.notes)
  assert times == [(0.0, 1.0), (1.0, 3.0)]


def test_tokenize_multitrack_example():
  codec = vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))
  config = SpectrogramConfig()
  tracks = [_track(60), _track(64, 0.5, 1.5)]
  samples = np.zeros(2 * config.sample_rate, np.float32)
  features = program_maps.tokenize_multitrack_example(
      tracks, ['Acoustic Piano', 'Electric Bass'], samples, config, codec,
      slakh_classes=True)
  assert features is not None
  assert len(features['targets']) > 0
  assert features['inputs'].shape[1] == config.hop_width
