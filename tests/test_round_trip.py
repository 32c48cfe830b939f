"""End-to-end codec round trip: notes -> tokens -> segments -> notes.

Exercises the full target-encoding pipeline (encode_and_index_events, RLE,
tie sections) against the full decoding pipeline (segment stitching with
max_decode_time overlap resolution), with no model in the loop.
"""

import numpy as np
import pytest

from mt3_tpu.codec import note_events, run_length, vocabulary
from mt3_tpu.core.config import VocabularyConfig
from mt3_tpu.core.note_sequence import NoteSequence, sequences_approx_equal
from mt3_tpu.infer import postprocess


@pytest.fixture
def codec():
  return vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))


def _example_ns():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.1, end_time=2.5,
              program=0)
  ns.add_note(pitch=64, velocity=80, start_time=0.5, end_time=3.5,
              program=0)
  ns.add_note(pitch=40, velocity=90, start_time=1.0, end_time=4.0,
              program=32)
  ns.add_note(pitch=36, velocity=120, start_time=2.0, end_time=2.01,
              is_drum=True)
  ns.add_note(pitch=60, velocity=70, start_time=3.0, end_time=4.5,
              program=0)
  ns.total_time = 4.5
  return ns


def _encode_with_ties(ns, codec, frame_times):
  times, values = (
      note_events.note_sequence_to_onsets_and_offsets_and_programs(ns))
  return run_length.encode_and_index_events(
      state=note_events.NoteEncodingState(),
      event_times=times, event_values=values,
      encode_event_fn=note_events.note_event_data_to_events,
      codec=codec, frame_times=frame_times,
      encoding_state_to_events_fn=note_events.note_encoding_state_to_events)


def test_round_trip_single_segment(codec):
  ns = _example_ns()
  frame_times = np.arange(0, 5.0, step=0.008)
  events, starts, ends, state_events, state_idx = _encode_with_ties(
      ns, codec, frame_times)
  tie_token = codec.encode_event(note_events.Event('tie', 0))
  features = run_length.extract_target_sequence_with_indices(
      {'input_event_start_indices': starts,
       'input_event_end_indices': ends,
       'input_state_event_indices': state_idx,
       'state_events': state_events,
       'targets': events},
      state_events_end_token=tie_token)
  tokens = run_length.run_length_encode_shifts(features['targets'], codec)
  tokens = run_length.remove_redundant_state_changes(
      tokens, codec, ['velocity', 'program'])

  predictions = [{
      'unique_id': 0, 'raw_inputs': None, 'est_tokens': tokens,
      'start_time': 0.0,
  }]
  result = postprocess.event_predictions_to_ns(
      predictions, codec, note_events.NoteEncodingWithTiesSpec)
  est = result['est_ns']
  assert result['est_invalid_events'] == 0
  assert result['est_dropped_events'] == 0
  # Velocity is quantized to 1 bin (all -> 127); compare times/pitches.
  got = sorted((n.pitch, round(n.start_time, 2), round(n.end_time, 2),
                n.program, n.is_drum) for n in est.notes)
  want = sorted((n.pitch, round(n.start_time, 2),
                 round(max(n.end_time, n.start_time + 0.01), 2),
                 n.program, n.is_drum) for n in ns.notes)
  assert got == want


def test_round_trip_multi_segment_with_ties(codec):
  """Notes spanning segment boundaries survive via tie sections."""
  ns = _example_ns()
  fps = 125.0
  frame_times = np.arange(0, 5.0, step=1 / fps)
  (events, starts, ends, state_events, state_idx) = _encode_with_ties(
      ns, codec, frame_times)
  tie_token = codec.encode_event(note_events.Event('tie', 0))

  # Split the frame axis into 4 segments and extract per-segment targets
  # exactly like the training/eval pipeline does.
  seg_frames = len(frame_times) // 4
  predictions = []
  for s in range(4):
    lo, hi = s * seg_frames, (s + 1) * seg_frames
    features = {
        'input_event_start_indices': starts[lo:hi],
        'input_event_end_indices': ends[lo:hi],
        'input_state_event_indices': state_idx[lo:hi],
        'state_events': state_events,
        'targets': events,
    }
    features = run_length.extract_target_sequence_with_indices(
        features, state_events_end_token=tie_token)
    tokens = run_length.run_length_encode_shifts(features['targets'], codec)
    tokens = run_length.remove_redundant_state_changes(
        tokens, codec, ['velocity', 'program'])
    predictions.append({
        'unique_id': 0, 'raw_inputs': None, 'est_tokens': tokens,
        'start_time': lo / fps,
    })

  result = postprocess.event_predictions_to_ns(
      predictions, codec, note_events.NoteEncodingWithTiesSpec)
  est = result['est_ns']
  assert result['est_invalid_events'] == 0

  expected = NoteSequence()
  for n in ns.notes:
    expected.add_note(pitch=n.pitch, velocity=127,
                      start_time=n.start_time,
                      end_time=max(n.end_time, n.start_time + 0.01),
                      program=n.program, is_drum=n.is_drum)
  # Times quantized to 10 ms steps.
  assert sequences_approx_equal(
      NoteSequence(notes=[n for n in expected.notes]), est,
      time_tol=0.011)


def test_round_trip_with_velocity_bins():
  """ismir2021-style config: 127 velocity bins survive the round trip."""
  codec = vocabulary.build_codec(VocabularyConfig(num_velocity_bins=127))
  ns = NoteSequence()
  for i, velocity in enumerate([1, 33, 64, 100, 127]):
    ns.add_note(pitch=60 + i, velocity=velocity, start_time=0.1 * (i + 1),
                end_time=0.1 * (i + 1) + 0.5)
  ns.total_time = 1.5

  times, values = note_events.note_sequence_to_onsets_and_offsets(ns)
  frame_times = np.arange(0, 2.0, 1 / 125.0)
  events, _, _, _, _ = run_length.encode_and_index_events(
      state=None, event_times=times, event_values=values,
      encode_event_fn=note_events.note_event_data_to_events,
      codec=codec, frame_times=frame_times)
  tokens = run_length.run_length_encode_shifts(events, codec)
  tokens = run_length.remove_redundant_state_changes(
      tokens, codec, ['velocity'])

  result = postprocess.event_predictions_to_ns(
      [{'unique_id': 0, 'raw_inputs': None, 'est_tokens': tokens,
        'start_time': 0.0}],
      codec, note_events.NoteEncodingSpec)
  est = result['est_ns']
  got = sorted((n.pitch, n.velocity) for n in est.notes)
  want = sorted((n.pitch, n.velocity) for n in ns.notes)
  assert got == want  # 127 bins round-trip velocities exactly


@pytest.mark.parametrize('seed', list(range(10)))
def test_round_trip_fuzz_random_sequences(seed):
  """Randomized round trip: arbitrary multi-program/drum NoteSequences
  survive tokenize -> random segment slicing -> stitch with exact note
  recovery (10 ms quantization tolerance).

  Hits the rewritten encode_and_index_events / tie-section machinery
  with irregular segment boundaries and dense polyphony.
  """
  rng = np.random.RandomState(seed)
  vocab_config = VocabularyConfig(num_velocity_bins=127)
  codec = vocabulary.build_codec(vocab_config)

  # Random corpus: up to 40 notes, 4 programs + drums.
  ns = NoteSequence()
  programs = [0, 24, 32, 40]
  for _ in range(int(rng.randint(10, 40))):
    start = float(rng.uniform(0, 7.5))
    if rng.rand() < 0.2:
      ns.add_note(pitch=int(rng.randint(35, 60)),
                  velocity=int(rng.randint(1, 128)),
                  start_time=start, end_time=start + 0.01, is_drum=True)
    else:
      ns.add_note(pitch=int(rng.randint(21, 108)),
                  velocity=int(rng.randint(1, 128)),
                  start_time=start,
                  end_time=start + float(rng.uniform(0.05, 3.0)),
                  program=int(programs[rng.randint(len(programs))]))
  ns.total_time = max(n.end_time for n in ns.notes)
  # The event vocabulary cannot represent overlapping same-pitch notes.
  ns = note_events.trim_overlapping_notes(ns)

  frame_times = np.arange(int(ns.total_time * 125) + 2) / 125.0
  (events, start_indices, end_indices, state_events,
   state_indices) = _encode_with_ties(ns, codec, frame_times)

  # Random segmentation: 2-5 segments at random frame boundaries.
  n_frames = len(frame_times)
  cuts = sorted(rng.choice(np.arange(1, n_frames - 1),
                           size=int(rng.randint(1, 5)), replace=False))
  bounds = [0] + [int(c) for c in cuts] + [n_frames]

  tie_token = codec.encode_event(note_events.Event('tie', 0))
  predictions = []
  for lo, hi in zip(bounds[:-1], bounds[1:]):
    # The production per-segment chain (pipeline.prepare_train_example):
    # slice targets by the frame->event index maps, prepend the tie
    # section, collapse shifts to absolute steps.
    features = {
        'targets': events,
        'input_event_start_indices': start_indices[lo:hi],
        'input_event_end_indices': end_indices[lo:hi],
        'state_events': state_events,
        'input_state_event_indices': state_indices[lo:hi],
    }
    features = run_length.extract_target_sequence_with_indices(
        features, state_events_end_token=tie_token)
    seg_tokens = run_length.run_length_encode_shifts(
        np.asarray(features['targets'], np.int32), codec)
    seg_tokens = run_length.remove_redundant_state_changes(
        seg_tokens, codec, state_change_event_types=['velocity',
                                                     'program'])
    predictions.append({
        'est_tokens': np.asarray(seg_tokens, np.int32),
        'start_time': frame_times[lo],
        'raw_inputs': np.zeros(0, np.float32),
        'unique_id': 0,
    })

  result = postprocess.event_predictions_to_ns(
      predictions, codec, note_events.NoteEncodingWithTiesSpec)
  est = result['est_ns']
  assert result['est_invalid_events'] == 0
  assert result['est_dropped_events'] == 0
  assert sequences_approx_equal(
      _quantized(ns), _quantized(est), time_tol=0.011), (
          len(ns.notes), len(est.notes))


def _quantized(ns):
  out = ns.copy()
  for note in out.notes:
    note.start_time = round(note.start_time * 100) / 100
    note.end_time = round(note.end_time * 100) / 100
    # Drums decode with the fixed default duration.
    if note.is_drum:
      note.end_time = note.start_time + 0.01
  return out
