"""Note-event state machine tests; parity with note_sequences_test.py."""

import numpy as np
import pytest

from mt3_tpu.codec import event_codec, note_events, run_length
from mt3_tpu.core.note_sequence import Note, NoteSequence

Event = event_codec.Event


@pytest.fixture
def codec():
  return event_codec.Codec(
      max_shift_steps=100,
      steps_per_second=100,
      event_ranges=[
          event_codec.EventRange('pitch', 0, 127),
          event_codec.EventRange('velocity', 0, 127),
          event_codec.EventRange('drum', 0, 127),
          event_codec.EventRange('program', 0, 127),
          event_codec.EventRange('tie', 0, 0),
      ])


def _assert_notes(ns, expected):
  got = [(n.pitch, n.velocity, round(n.start_time, 6), round(n.end_time, 6),
          n.program, n.is_drum) for n in ns.sorted_notes()]
  want = [(n.pitch, n.velocity, round(n.start_time, 6), round(n.end_time, 6),
           n.program, n.is_drum)
          for n in sorted(expected, key=lambda n: (n.start_time, n.end_time,
                                                   n.pitch, n.velocity))]
  assert got == want


def test_encode_and_index_note_sequence(codec):
  ns = NoteSequence()
  ns.add_note(start_time=1.0, end_time=1.1, pitch=61, velocity=100)
  ns.add_note(start_time=2.0, end_time=2.1, pitch=62, velocity=100)
  ns.add_note(start_time=3.0, end_time=3.1, pitch=63, velocity=100)
  ns.total_time = 3.1

  frame_times = np.arange(0, 4, step=.001)
  event_times, event_values = note_events.note_sequence_to_onsets(ns)
  events, starts, ends, _, _ = run_length.encode_and_index_events(
      state=None, event_times=event_times, event_values=event_values,
      encode_event_fn=note_events.note_event_data_to_events,
      codec=codec, frame_times=frame_times)

  assert len(starts) == len(frame_times)
  assert len(ends) == len(frame_times)
  expected = ([1] * 100 + [162] + [1] * 100 + [163] + [1] * 100 + [164]
              + [1] * 100)
  np.testing.assert_array_equal(events, expected)
  assert (starts[0], ends[0]) == (0, 0)
  assert events[100] == 162 and starts[1000] == 100 and ends[1000] == 100
  assert events[201] == 163 and starts[2000] == 201 and ends[2000] == 201
  assert events[302] == 164 and starts[3000] == 302 and ends[3000] == 302
  assert starts[-1] == 402 and ends[-1] == len(expected)


def test_encode_and_index_note_sequence_velocity(codec):
  ns = NoteSequence()
  ns.add_note(start_time=1.0, end_time=3.0, pitch=61, velocity=1)
  ns.add_note(start_time=2.0, end_time=4.0, pitch=62, velocity=127)
  ns.total_time = 4.0

  frame_times = np.arange(0, 4, step=.001)
  event_times, event_values = (
      note_events.note_sequence_to_onsets_and_offsets(ns))
  events, starts, ends, _, _ = run_length.encode_and_index_events(
      state=None, event_times=event_times, event_values=event_values,
      encode_event_fn=note_events.note_event_data_to_events,
      codec=codec, frame_times=frame_times)

  expected = ([1] * 100 + [230, 162] + [1] * 100 + [356, 163]
              + [1] * 100 + [229, 162] + [1] * 100 + [229, 163])
  np.testing.assert_array_equal(events, expected)
  assert starts[1000] == 100 and ends[1000] == 100
  assert starts[2000] == 202 and ends[2000] == 202
  assert starts[3000] == 304 and ends[3000] == 304
  assert starts[-1] == 405 and ends[-1] == len(expected)


def test_encode_and_index_note_sequence_multitrack(codec):
  ns = NoteSequence()
  ns.add_note(start_time=0.0, end_time=1.0, pitch=37, velocity=127,
              is_drum=True)
  ns.add_note(start_time=1.0, end_time=3.0, pitch=61, velocity=127,
              program=0)
  ns.add_note(start_time=2.0, end_time=4.0, pitch=62, velocity=127,
              program=40)
  ns.total_time = 4.0

  frame_times = np.arange(0, 4, step=.001)
  event_times, event_values = (
      note_events.note_sequence_to_onsets_and_offsets_and_programs(ns))
  tokens, starts, ends, state_tokens, state_idx = (
      run_length.encode_and_index_events(
          state=note_events.NoteEncodingState(),
          event_times=event_times, event_values=event_values,
          encode_event_fn=note_events.note_event_data_to_events,
          codec=codec, frame_times=frame_times,
          encoding_state_to_events_fn=(
              note_events.note_encoding_state_to_events)))

  expected_events = (
      [Event('velocity', 127), Event('drum', 37)]
      + [Event('shift', 1)] * 100
      + [Event('program', 0), Event('velocity', 127), Event('pitch', 61)]
      + [Event('shift', 1)] * 100
      + [Event('program', 40), Event('velocity', 127), Event('pitch', 62)]
      + [Event('shift', 1)] * 100
      + [Event('program', 0), Event('velocity', 0), Event('pitch', 61)]
      + [Event('shift', 1)] * 100
      + [Event('program', 40), Event('velocity', 0), Event('pitch', 62)])
  np.testing.assert_array_equal(
      tokens, [codec.encode_event(e) for e in expected_events])

  expected_state_events = [
      Event('tie', 0),
      Event('tie', 0),
      Event('program', 0), Event('pitch', 61), Event('tie', 0),
      Event('program', 0), Event('pitch', 61),
      Event('program', 40), Event('pitch', 62), Event('tie', 0),
      Event('program', 40), Event('pitch', 62), Event('tie', 0),
  ]
  np.testing.assert_array_equal(
      state_tokens, [codec.encode_event(e) for e in expected_state_events])

  assert starts[1000] == 102 and ends[1000] == 102 and state_idx[1000] == 1
  assert starts[2000] == 205 and ends[2000] == 205 and state_idx[2000] == 2
  assert starts[3000] == 308 and ends[3000] == 308 and state_idx[3000] == 5
  assert starts[-1] == 410 and ends[-1] == len(expected_events)
  assert state_idx[-1] == 10


def test_encode_and_index_last_token_alignment(codec):
  ns = NoteSequence()
  ns.add_note(start_time=0.0, end_time=0.1, pitch=60, velocity=100)
  ns.total_time = 0.1

  frame_times = np.arange(0, 1.008, step=.008)
  event_times, event_values = note_events.note_sequence_to_onsets(ns)
  events, starts, ends, _, _ = run_length.encode_and_index_events(
      state=None, event_times=event_times, event_values=event_values,
      encode_event_fn=note_events.note_event_data_to_events,
      codec=codec, frame_times=frame_times)

  expected = [161] + [1] * 101
  np.testing.assert_array_equal(events, expected)
  assert starts[0] == 0 and ends[0] == 0
  assert starts[125] == 101 and ends[125] == 102


def _decode(codec, events, decode_fn, start_time=0, max_time=None):
  state = note_events.NoteDecodingState()
  invalid, dropped = run_length.decode_events(
      state=state, tokens=np.array(events), start_time=start_time,
      max_time=max_time, codec=codec, decode_event_fn=decode_fn)
  ns = note_events.flush_note_decoding_state(state)
  return ns, invalid, dropped


def test_decode_note_sequence_events(codec):
  ns, invalid, dropped = _decode(codec, [25, 161, 50, 162],
                                 note_events.decode_note_onset_event)
  assert invalid == 0 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=100, start_time=0.25, end_time=0.26),
      Note(pitch=61, velocity=100, start_time=0.50, end_time=0.51)])
  assert ns.total_time == pytest.approx(0.51)


def test_decode_events_velocity(codec):
  ns, invalid, dropped = _decode(codec, [5, 356, 161, 25, 229, 161],
                                 note_events.decode_note_event)
  assert invalid == 0 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=127, start_time=0.05, end_time=0.25)])


def test_decode_events_missing_offset(codec):
  ns, invalid, dropped = _decode(codec, [5, 356, 161, 10, 161, 25, 229, 161],
                                 note_events.decode_note_event)
  assert invalid == 0 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=127, start_time=0.05, end_time=0.10),
      Note(pitch=60, velocity=127, start_time=0.10, end_time=0.25)])


def test_decode_events_multitrack(codec):
  ns, invalid, dropped = _decode(
      codec, [5, 525, 356, 161, 15, 356, 394, 25, 525, 229, 161],
      note_events.decode_note_event)
  assert invalid == 0 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=37, velocity=127, start_time=0.15, end_time=0.16,
           is_drum=True, instrument=9),
      Note(pitch=60, velocity=127, start_time=0.05, end_time=0.25,
           program=40)])


def test_decode_events_invalid_tokens(codec):
  ns, invalid, dropped = _decode(codec, [5, -1, 161, -2, 25, 162, 9999],
                                 note_events.decode_note_onset_event)
  assert invalid == 3 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=100, start_time=0.05, end_time=0.06),
      Note(pitch=61, velocity=100, start_time=0.25, end_time=0.26)])


def test_decode_events_event_at_exactly_max_time_allowed(codec):
  ns, invalid, dropped = _decode(codec, [161, 25, 162],
                                 note_events.decode_note_onset_event,
                                 start_time=1.0, max_time=1.25)
  assert invalid == 0 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=100, start_time=1.00, end_time=1.01),
      Note(pitch=61, velocity=100, start_time=1.25, end_time=1.26)])


def test_decode_events_dropped(codec):
  ns, invalid, dropped = _decode(codec, [5, 161, 30, 162],
                                 note_events.decode_note_onset_event,
                                 start_time=1.0, max_time=1.25)
  assert invalid == 0 and dropped == 2
  _assert_notes(ns, [
      Note(pitch=60, velocity=100, start_time=1.05, end_time=1.06)])


def test_decode_events_invalid_velocity_event_for_onsets(codec):
  ns, invalid, dropped = _decode(codec, [25, 230, 50, 161],
                                 note_events.decode_note_onset_event)
  assert invalid == 1 and dropped == 0
  _assert_notes(ns, [
      Note(pitch=60, velocity=100, start_time=0.50, end_time=0.51)])


def test_trim_overlapping_notes():
  ns = NoteSequence()
  ns.add_note(start_time=0.0, end_time=2.0, pitch=60, velocity=100)
  ns.add_note(start_time=1.0, end_time=3.0, pitch=60, velocity=100)
  ns.add_note(start_time=1.5, end_time=1.5, pitch=60, velocity=100)
  trimmed = note_events.trim_overlapping_notes(ns)
  # Each note trimmed to the next one's start; zero-length notes dropped.
  assert len(trimmed.notes) == 2
  times = sorted((n.start_time, n.end_time) for n in trimmed.notes)
  assert times == [(0.0, 1.0), (1.0, 1.5)]


def test_assign_instruments():
  ns = NoteSequence()
  for program in range(11):
    ns.add_note(start_time=0, end_time=1, pitch=60, velocity=10,
                program=program)
  ns.add_note(start_time=0, end_time=1, pitch=36, velocity=10, is_drum=True)
  note_events.assign_instruments(ns)
  instruments = [n.instrument for n in ns.notes]
  # Programs 0..10 get instruments 0..8, 10, 11 (9 reserved for drums).
  assert instruments == [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 9]


def test_validate_note_sequence():
  ns = NoteSequence()
  ns.add_note(start_time=1.0, end_time=0.5, pitch=60, velocity=100)
  with pytest.raises(ValueError):
    note_events.validate_note_sequence(ns)
  ns2 = NoteSequence()
  ns2.add_note(start_time=0.0, end_time=0.5, pitch=60, velocity=0)
  with pytest.raises(ValueError):
    note_events.validate_note_sequence(ns2)
