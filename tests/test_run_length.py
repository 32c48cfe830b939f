"""RLE tests; parity contract with reference run_length_encoding_test.py."""

import numpy as np
import pytest

from mt3_tpu.codec import event_codec, run_length


@pytest.fixture
def codec():
  # Same fixture layout as the reference test (pitch at 101, velocity at
  # 229, drum at 357, program at 485, tie at 613).
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


def test_remove_redundant_state_changes(codec):
  tokens = np.array([3, 525, 356, 161, 2, 525, 356, 161, 355, 394])
  out = run_length.remove_redundant_state_changes(
      tokens, codec, state_change_event_types=['velocity', 'program'])
  np.testing.assert_array_equal(out, [3, 525, 356, 161, 2, 161, 355, 394])


def test_run_length_encode_shifts(codec):
  tokens = np.array([1, 1, 1, 161, 1, 1, 1, 162, 1, 1, 1])
  out = run_length.run_length_encode_shifts(tokens, codec)
  np.testing.assert_array_equal(out, [3, 161, 6, 162])


def test_run_length_encode_shifts_beyond_max_length(codec):
  tokens = np.array([1] * 202 + [161, 1, 1, 1])
  out = run_length.run_length_encode_shifts(tokens, codec)
  np.testing.assert_array_equal(out, [100, 100, 2, 161])


def test_run_length_encode_shifts_simultaneous(codec):
  tokens = np.array([1, 1, 1, 161, 162, 1, 1, 1])
  out = run_length.run_length_encode_shifts(tokens, codec)
  np.testing.assert_array_equal(out, [3, 161, 162])


def test_run_length_encode_shifts_empty_and_no_shift(codec):
  np.testing.assert_array_equal(
      run_length.run_length_encode_shifts(np.array([], dtype=np.int32),
                                          codec), [])
  np.testing.assert_array_equal(
      run_length.run_length_encode_shifts(np.array([161, 162]), codec),
      [161, 162])


def test_merge_run_length_encoded_targets(codec):
  targets = np.array([
      [3, 161, 162, 5, 163],
      [160, 164, 3, 165, 0],
  ])
  merged = run_length.merge_run_length_encoded_targets(targets, codec)
  np.testing.assert_array_equal(merged, [160, 164, 3, 161, 162, 165, 5, 163])


def test_extract_target_sequence_with_indices():
  features = {
      'input_event_start_indices': np.array([2, 3, 4]),
      'input_event_end_indices': np.array([3, 4, 6]),
      'targets': np.arange(10, 20, dtype=np.int32),
      'state_events': np.array([100, 101, 613, 102, 613], dtype=np.int32),
      'input_state_event_indices': np.array([0, 3, 3]),
  }
  out = run_length.extract_target_sequence_with_indices(dict(features))
  np.testing.assert_array_equal(out['targets'], [12, 13, 14, 15])

  out = run_length.extract_target_sequence_with_indices(
      dict(features), state_events_end_token=613)
  # Prepends state events [0:3) = [100, 101, 613].
  np.testing.assert_array_equal(out['targets'],
                                [100, 101, 613, 12, 13, 14, 15])
