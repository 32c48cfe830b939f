"""Randomized equivalence oracles for the optimized RLE hot paths.

run_length_encode_shifts / merge_run_length_encoded_targets are the two
dominant host-pipeline costs at pretrain mixing (tools/mixing_host_bench).
The optimized versions must be bit-identical to the straightforward
loop implementations below (snapshots of the pre-optimization code,
which test_run_length.py already pins to the reference semantics of
run_length_encoding.py:242-368).
"""

import numpy as np

from mt3_tpu.codec import run_length
from mt3_tpu.codec import vocabulary
from mt3_tpu.core import config as config_lib


def _codec():
  return vocabulary.build_codec(config_lib.mt3_config().vocab)


# --- snapshot oracles (pre-optimization implementations) -----------------
def _encode_shifts_oracle(tokens, codec):
  tokens = np.asarray(tokens, dtype=np.int32)
  if tokens.size == 0:
    return tokens
  is_shift = (tokens >= 0) & (tokens <= codec.max_shift_steps)
  total_steps = np.cumsum(is_shift)
  output = []
  prev_emitted = -1
  for idx in np.nonzero(~is_shift)[0]:
    steps = int(total_steps[idx])
    if steps > 0 and steps != prev_emitted:
      remaining = steps
      while remaining > 0:
        emit = min(codec.max_shift_steps, remaining)
        output.append(emit)
        remaining -= emit
      prev_emitted = steps
    output.append(int(tokens[idx]))
  return np.array(output, dtype=np.int32)


def _merge_oracle(targets, codec):
  targets = np.asarray(targets, dtype=np.int32)
  num_tracks, targets_length = targets.shape
  current_step = 0
  current_offsets = [0] * num_tracks
  output = []
  while True:
    next_step = codec.max_shift_steps + 1
    next_track = -1
    for i in range(num_tracks):
      off = current_offsets[i]
      if off == targets_length or targets[i][off] == 0:
        continue
      tok = int(targets[i][off])
      if not codec.is_shift_event_index(tok):
        next_step = 0
        next_track = i
      elif tok < next_step:
        next_step = tok
        next_track = i
    if next_track == -1:
      break
    if next_step == current_step and next_step > 0:
      start_offset = current_offsets[next_track] + 1
    else:
      start_offset = current_offsets[next_track]
    end_offset = start_offset + 1
    while (end_offset < targets_length
           and not codec.is_shift_event_index(
               int(targets[next_track][end_offset]))
           and targets[next_track][end_offset] != 0):
      end_offset += 1
    output.extend(targets[next_track][start_offset:end_offset].tolist())
    current_step = next_step
    current_offsets[next_track] = end_offset
  return np.array(output, dtype=np.int32)


# --- randomized stream generators ----------------------------------------
def _random_unencoded_stream(rng, codec, n):
  """Single-step shifts (token 1) interleaved with event tokens, the
  encode_and_index_events output shape."""
  toks = []
  while len(toks) < n:
    if rng.rand() < 0.6:
      toks.extend([1] * int(rng.randint(1, 7)))
    else:
      toks.append(int(rng.randint(codec.max_shift_steps + 1,
                                  codec.num_classes)))
  return np.array(toks[:n], dtype=np.int32)


def _random_rle_track(rng, codec, n, pad_to):
  """An RLE-encoded track (ascending chunked shifts + event groups),
  zero-padded — the merge input shape."""
  toks = list(_encode_shifts_oracle(
      _random_unencoded_stream(rng, codec, n), codec))
  toks = toks[:pad_to]
  return np.array(toks + [0] * (pad_to - len(toks)), dtype=np.int32)


def test_encode_shifts_matches_oracle():
  codec = _codec()
  rng = np.random.RandomState(0)
  for n in [0, 1, 3, 17, 120, 700]:
    for _ in range(8):
      toks = _random_unencoded_stream(rng, codec, n)
      np.testing.assert_array_equal(
          run_length.run_length_encode_shifts(toks, codec),
          _encode_shifts_oracle(toks, codec))


def test_encode_shifts_matches_oracle_chunked():
  """Totals past max_shift_steps force multi-token chunked emission."""
  codec = _codec()
  rng = np.random.RandomState(1)
  for _ in range(6):
    # enough single-step shifts to exceed max_shift_steps several times
    toks = _random_unencoded_stream(rng, codec, 4000)
    np.testing.assert_array_equal(
        run_length.run_length_encode_shifts(toks, codec),
        _encode_shifts_oracle(toks, codec))


def test_encode_shifts_event_only_and_shift_only():
  codec = _codec()
  events = np.array([1205, 1300, 1299], dtype=np.int32)
  np.testing.assert_array_equal(
      run_length.run_length_encode_shifts(events, codec),
      _encode_shifts_oracle(events, codec))
  shifts = np.ones(50, dtype=np.int32)
  np.testing.assert_array_equal(
      run_length.run_length_encode_shifts(shifts, codec),
      _encode_shifts_oracle(shifts, codec))


def test_merge_matches_oracle():
  codec = _codec()
  rng = np.random.RandomState(2)
  for num_tracks in [1, 2, 4, 8]:
    for _ in range(6):
      pad = 260
      tracks = np.stack([
          _random_rle_track(rng, codec, int(rng.randint(5, 200)), pad)
          for _ in range(num_tracks)])
      np.testing.assert_array_equal(
          run_length.merge_run_length_encoded_targets(tracks, codec),
          _merge_oracle(tracks, codec))


def test_merge_matches_oracle_edge_cases():
  codec = _codec()
  # all-padding tracks; identical tracks; one empty one full
  empty = np.zeros((3, 16), dtype=np.int32)
  np.testing.assert_array_equal(
      run_length.merge_run_length_encoded_targets(empty, codec),
      _merge_oracle(empty, codec))
  rng = np.random.RandomState(3)
  t = _random_rle_track(rng, codec, 40, 64)
  dup = np.stack([t, t, np.zeros_like(t)])
  np.testing.assert_array_equal(
      run_length.merge_run_length_encoded_targets(dup, codec),
      _merge_oracle(dup, codec))
  # track that fills the pad width exactly (no trailing zero)
  full = _random_rle_track(rng, codec, 400, 64)
  pair = np.stack([full, t[:64]])
  np.testing.assert_array_equal(
      run_length.merge_run_length_encoded_targets(pair, codec),
      _merge_oracle(pair, codec))


def test_merge_duplicate_shift_at_last_column_terminates():
  """A track whose final column is a shift equal to the current step
  used to push the offset past the row width (IndexError in the
  pre-optimization code); it must now read as exhausted."""
  codec = _codec()
  e = codec.max_shift_steps + 205  # some event token
  targets = np.array([
      [5, e, 0],
      [e, e, 5],
  ], dtype=np.int32)
  out = run_length.merge_run_length_encoded_targets(targets, codec)
  np.testing.assert_array_equal(out, np.array([e, e, 5, e], np.int32))
