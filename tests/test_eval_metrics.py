"""Tests for the self-contained transcription metric harness."""

import numpy as np
import pytest

from mt3_tpu.codec import note_events, run_length, vocabulary
from mt3_tpu.core.config import VocabularyConfig
from mt3_tpu.core.note_sequence import NoteSequence
from mt3_tpu.eval import metrics, transcription
from mt3_tpu.infer import postprocess


def test_perfect_match():
  ref = np.array([[0.0, 1.0], [1.0, 2.0]])
  ref_p = np.array([60, 64])
  p, r, f1, avg = transcription.precision_recall_f1_overlap(
      ref, ref_p, ref.copy(), ref_p.copy())
  assert (p, r, f1) == (1.0, 1.0, 1.0)
  assert avg == pytest.approx(1.0)


def test_onset_tolerance():
  ref = np.array([[0.0, 1.0]])
  ref_p = np.array([60])
  est = np.array([[0.04, 1.0]])
  p, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est, ref_p.copy())
  assert p == 1.0
  est_late = np.array([[0.06, 1.0]])
  p, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est_late, ref_p.copy())
  assert p == 0.0


def test_offset_tolerance_ratio():
  # Duration 2.0 -> offset tolerance max(0.2*2, 0.05) = 0.4.
  ref = np.array([[0.0, 2.0]])
  ref_p = np.array([60])
  est_ok = np.array([[0.0, 2.35]])
  est_bad = np.array([[0.0, 2.45]])
  p_ok, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est_ok, ref_p.copy())
  p_bad, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est_bad, ref_p.copy())
  assert (p_ok, p_bad) == (1.0, 0.0)
  # With offsets disabled, both match.
  p, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est_bad, ref_p.copy(), offset_ratio=None)
  assert p == 1.0


def test_pitch_mismatch_low_register():
  """In the low register MIDI-numbers-as-Hz are > 50 cents apart."""
  ref = np.array([[0.0, 1.0]])
  p, _, _, _ = transcription.precision_recall_f1_overlap(
      ref, np.array([20]), ref.copy(), np.array([21]))
  assert p == 0.0


def test_bipartite_matching_count():
  # Two refs, two ests, both ests within tolerance of both refs:
  # maximum matching must pair them 1:1.
  ref = np.array([[0.0, 1.0], [0.02, 1.0]])
  ref_p = np.array([60, 60])
  est = np.array([[0.01, 1.0], [0.03, 1.0]])
  p, r, f1, _ = transcription.precision_recall_f1_overlap(
      ref, ref_p, est, ref_p.copy(), offset_ratio=None)
  assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_velocity_matching_rescale_invariance():
  """Global velocity scaling should not hurt the velocity metric."""
  ref = np.array([[0.0, 1.0], [1.0, 2.0], [2.0, 3.0]])
  ref_p = np.array([60, 64, 67])
  ref_v = np.array([40, 80, 120])
  est_v = np.array([20, 40, 60])  # exactly half
  p, r, f1, _ = transcription.precision_recall_f1_overlap_velocity(
      ref, ref_p, ref_v, ref.copy(), ref_p.copy(), est_v)
  assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_velocity_outlier_dropped():
  n = 32
  ref = np.stack([np.arange(n, dtype=float),
                  np.arange(n, dtype=float) + 1.0], axis=1)
  ref_p = np.full(n, 60)
  rng = np.random.RandomState(0)
  ref_v = rng.randint(30, 120, size=n)
  est_v = ref_v.copy()
  est_v[-1] = 75
  ref_v[-1] = 119  # one wildly wrong velocity among 32 exact matches
  p, r, _, _ = transcription.precision_recall_f1_overlap_velocity(
      ref, ref_p, ref_v, ref.copy(), ref_p.copy(), est_v)
  assert p == pytest.approx(31 / 32)
  assert r == pytest.approx(31 / 32)


def test_frame_metrics_identical():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=1.0)
  roll = metrics.get_pianoroll(ns, 62.5)
  p, r, f1 = metrics.frame_metrics(roll, roll, velocity_threshold=30)
  assert (p, r, f1) == (1.0, 1.0, 1.0)


def test_frame_metrics_quiet_ref_ignored():
  ns_quiet = NoteSequence()
  ns_quiet.add_note(pitch=60, velocity=10, start_time=0.0, end_time=1.0)
  ns_empty = NoteSequence()
  roll_q = metrics.get_pianoroll(ns_quiet, 62.5)
  roll_e = metrics.get_pianoroll(ns_empty, 62.5)
  p, r, f1 = metrics.frame_metrics(roll_q, roll_e, velocity_threshold=30)
  # Quiet ref below threshold -> no positives anywhere.
  assert (p, r, f1) == (0.0, 0.0, 0.0)


def _tokens_for(ns, codec, use_ties=True):
  times, values = (
      note_events.note_sequence_to_onsets_and_offsets_and_programs(ns))
  frame_times = np.arange(0, ns.total_time + 0.5, 1 / 125.0)
  events, starts, ends, state_events, state_idx = (
      run_length.encode_and_index_events(
          state=note_events.NoteEncodingState(),
          event_times=times, event_values=values,
          encode_event_fn=note_events.note_event_data_to_events,
          codec=codec, frame_times=frame_times,
          encoding_state_to_events_fn=(
              note_events.note_encoding_state_to_events)))
  tie_token = codec.encode_event(note_events.Event('tie', 0))
  features = run_length.extract_target_sequence_with_indices(
      {'input_event_start_indices': starts,
       'input_event_end_indices': ends,
       'input_state_event_indices': state_idx,
       'state_events': state_events, 'targets': events},
      state_events_end_token=tie_token)
  tokens = run_length.run_length_encode_shifts(features['targets'], codec)
  return run_length.remove_redundant_state_changes(
      tokens, codec, ['velocity', 'program'])


def test_transcription_metrics_end_to_end_perfect():
  """Ground-truth tokens through the full metric harness -> F1 = 1."""
  codec = vocabulary.build_codec(VocabularyConfig(num_velocity_bins=1))
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=127, start_time=0.1, end_time=1.0)
  ns.add_note(pitch=64, velocity=127, start_time=0.5, end_time=1.5,
              program=40)
  ns.add_note(pitch=36, velocity=127, start_time=0.25, end_time=0.26,
              is_drum=True)
  ns.total_time = 1.5
  note_events.assign_instruments(ns)

  tokens = _tokens_for(ns, codec)
  targets = [{'unique_id': 0, 'ref_ns': ns}]
  predictions = [{'unique_id': 0, 'raw_inputs': None,
                  'est_tokens': tokens, 'start_time': 0.0}]
  scores = metrics.transcription_metrics(
      targets, predictions, codec=codec, onsets_only=False, use_ties=True)
  assert scores['Onset F1'] == 1.0
  assert scores['Onset + offset F1'] == 1.0
  assert scores['Onset + offset + program F1 (full)'] == 1.0
  assert scores['Drum onset F1 (full)'] == 1.0
  assert scores['Invalid events'] == 0
  assert scores['Frame F1'] > 0.95
