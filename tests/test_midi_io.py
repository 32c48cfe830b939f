"""MIDI I/O round-trip and sustain pedal tests."""

import numpy as np

from mt3_tpu.core import midi_io, sustain
from mt3_tpu.core.note_sequence import (ControlChange, NoteSequence,
                                        sequences_approx_equal)


def _example_ns():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=0.5,
              program=0, instrument=0)
  ns.add_note(pitch=64, velocity=80, start_time=0.25, end_time=1.0,
              program=0, instrument=0)
  ns.add_note(pitch=40, velocity=90, start_time=0.5, end_time=1.5,
              program=32, instrument=1)
  ns.add_note(pitch=36, velocity=120, start_time=0.0, end_time=0.01,
              is_drum=True, instrument=9)
  ns.total_time = 1.5
  return ns


def test_midi_round_trip():
  ns = _example_ns()
  midi_bytes = midi_io.note_sequence_to_midi(ns)
  ns2 = midi_io.midi_to_note_sequence(midi_bytes)
  assert len(ns2.notes) == len(ns.notes)
  # Tick quantization at 220 ppq, 120 qpm -> 1/440 s resolution.
  assert sequences_approx_equal(ns, ns2, time_tol=1 / 440 + 1e-9)
  drums = [n for n in ns2.notes if n.is_drum]
  assert len(drums) == 1 and drums[0].pitch == 36
  programs = sorted(set(n.program for n in ns2.notes if not n.is_drum))
  assert programs == [0, 32]


def test_midi_round_trip_file(tmp_path):
  ns = _example_ns()
  path = str(tmp_path / 'test.mid')
  midi_io.note_sequence_to_midi_file(ns, path)
  ns2 = midi_io.midi_file_to_note_sequence(path)
  assert sequences_approx_equal(ns, ns2, time_tol=1 / 440 + 1e-9)


def test_midi_tempo_map():
  # Write at 90 qpm; times must still round-trip (reader uses tempo map).
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=1.0, end_time=2.0)
  ns.total_time = 2.0
  midi_bytes = midi_io.note_sequence_to_midi(ns, qpm=90.0)
  ns2 = midi_io.midi_to_note_sequence(midi_bytes)
  assert abs(ns2.notes[0].start_time - 1.0) < 1e-2
  assert abs(ns2.notes[0].end_time - 2.0) < 1e-2


def test_sustain_extends_notes():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=0.5)
  ns.control_changes.append(
      ControlChange(time=0.25, control_number=64, control_value=127))
  ns.control_changes.append(
      ControlChange(time=2.0, control_number=64, control_value=0))
  ns.total_time = 2.0
  out = sustain.apply_sustain_control_changes(ns)
  # Note release deferred to pedal lift.
  assert out.notes[0].end_time == 2.0
  assert not out.control_changes


def test_sustain_reonset_truncates():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=0.2)
  ns.add_note(pitch=60, velocity=100, start_time=1.0, end_time=1.2)
  ns.control_changes.append(
      ControlChange(time=0.0, control_number=64, control_value=127))
  ns.control_changes.append(
      ControlChange(time=3.0, control_number=64, control_value=0))
  ns.total_time = 3.0
  out = sustain.apply_sustain_control_changes(ns)
  notes = sorted(out.notes, key=lambda n: n.start_time)
  # First note truncated at re-onset; second extended to pedal lift.
  assert notes[0].end_time == 1.0
  assert notes[1].end_time == 3.0


def test_sustain_no_pedal_noop():
  ns = _example_ns()
  out = sustain.apply_sustain_control_changes(ns)
  assert sequences_approx_equal(ns, out)


def test_sustain_key_held_past_pedal():
  # Note still held by the key when pedal lifts: duration unchanged.
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=2.0)
  ns.control_changes.append(
      ControlChange(time=0.1, control_number=64, control_value=100))
  ns.control_changes.append(
      ControlChange(time=1.0, control_number=64, control_value=0))
  ns.total_time = 2.0
  out = sustain.apply_sustain_control_changes(ns)
  assert out.notes[0].end_time == 2.0
