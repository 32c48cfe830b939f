"""Run-length encoding of event streams.

Capability-parity rebuild of /root/reference/mt3/run_length_encoding.py with
the TF/autograph dataset plumbing replaced by vectorized NumPy operating on
plain arrays.  Semantics contracts (verified by tests):

  * encode_and_index_events: expands inter-event gaps into 1-step shifts and
    indexes every audio frame to (event_start, event_end, state_event)
    positions (reference :63-167).
  * run_length_encode_shifts: collapses runs of 1-step shifts into *absolute*
    step values within the segment, chunked at max_shift_steps, trimming
    trailing shifts (reference :242-295).
  * remove_redundant_state_changes: drops state-change tokens (velocity /
    program) equal to the current state (reference :194-239).
  * merge_run_length_encoded_targets: k-way time-ordered merge of multiple
    RLE streams, for audio mixing (reference :298-368).
  * decode_events: token -> event replay with start_time offset and max_time
    dropping (reference :371-423).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Any, Callable, Optional, Sequence, Tuple

import numpy as np

from mt3_tpu.codec import event_codec

Event = event_codec.Event

EventData = Any
EncodingState = Any
DecodingState = Any
DecodeResult = Any


@dataclasses.dataclass
class EventEncodingSpec:
  """Spec bundling the callbacks that define an event encoding."""
  init_encoding_state_fn: Callable[[], EncodingState]
  encode_event_fn: Callable[
      [EncodingState, EventData, event_codec.Codec], Sequence[Event]]
  encoding_state_to_events_fn: Optional[
      Callable[[EncodingState], Sequence[Event]]]
  init_decoding_state_fn: Callable[[], DecodingState]
  begin_decoding_segment_fn: Callable[[DecodingState], None]
  decode_event_fn: Callable[
      [DecodingState, float, Event, event_codec.Codec], None]
  flush_decoding_state_fn: Callable[[DecodingState], DecodeResult]


def encode_and_index_events(
    state: EncodingState,
    event_times: Sequence[float],
    event_values: Sequence[EventData],
    encode_event_fn: Callable[
        [EncodingState, EventData, event_codec.Codec], Sequence[Event]],
    codec: event_codec.Codec,
    frame_times: Sequence[float],
    encoding_state_to_events_fn: Optional[
        Callable[[EncodingState], Sequence[Event]]] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
  """Encode timed events as tokens plus per-frame index maps.

  Time shifts are emitted as repeated single-step shifts for later
  run-length encoding.  Returns (events, event_start_indices,
  event_end_indices, state_events, state_event_indices); see the reference
  docstring (run_length_encoding.py:74-110) for the exact contract.
  """
  indices = np.argsort(event_times, kind='stable')
  event_steps = [round(event_times[i] * codec.steps_per_second)
                 for i in indices]
  event_values = [event_values[i] for i in indices]

  shift_token = codec.encode_event(Event('shift', 1))

  events = []
  state_events = []
  event_start_indices = []
  state_event_indices = []

  cur_step = 0
  cur_event_idx = 0
  cur_state_event_idx = 0

  def fill_event_start_indices_to_cur_step():
    while (len(event_start_indices) < len(frame_times)
           and frame_times[len(event_start_indices)]
           < cur_step / codec.steps_per_second):
      event_start_indices.append(cur_event_idx)
      state_event_indices.append(cur_state_event_idx)

  for event_step, event_value in zip(event_steps, event_values):
    while event_step > cur_step:
      events.append(shift_token)
      cur_step += 1
      fill_event_start_indices_to_cur_step()
      cur_event_idx = len(events)
      cur_state_event_idx = len(state_events)
    if encoding_state_to_events_fn:
      # Capture the state *before* the event occurs.
      for e in encoding_state_to_events_fn(state):
        state_events.append(codec.encode_event(e))
    for e in encode_event_fn(state, event_value, codec):
      events.append(codec.encode_event(e))

  # Continue filling out event_start_indices past the last event.  The
  # inequality is not strict: a step landing exactly on a frame start needs
  # one more shift to "cover" that frame.
  while cur_step / codec.steps_per_second <= frame_times[-1]:
    events.append(shift_token)
    cur_step += 1
    fill_event_start_indices_to_cur_step()
    cur_event_idx = len(events)

  event_end_indices = event_start_indices[1:] + [len(events)]

  return (np.array(events, dtype=np.int32),
          np.array(event_start_indices, dtype=np.int32),
          np.array(event_end_indices, dtype=np.int32),
          np.array(state_events, dtype=np.int32),
          np.array(state_event_indices, dtype=np.int32))


def extract_target_sequence_with_indices(
    features: dict, state_events_end_token: Optional[int] = None) -> dict:
  """Slice `targets` to the audio-token segment; optionally prepend ties.

  Reference: run_length_encoding.py:170-191.  `features` must carry
  'input_event_start_indices' / 'input_event_end_indices' aligned to the
  (already-cropped) 'inputs' frame axis.
  """
  target_start_idx = int(features['input_event_start_indices'][0])
  target_end_idx = int(features['input_event_end_indices'][-1])

  features['targets'] = features['targets'][target_start_idx:target_end_idx]

  if state_events_end_token is not None:
    state_event_start_idx = int(features['input_state_event_indices'][0])
    state_event_end_idx = state_event_start_idx + 1
    while (features['state_events'][state_event_end_idx - 1]
           != state_events_end_token):
      state_event_end_idx += 1
    features['targets'] = np.concatenate([
        features['state_events'][state_event_start_idx:state_event_end_idx],
        features['targets']], axis=0)
  return features


def remove_redundant_state_changes(
    tokens: np.ndarray,
    codec: event_codec.Codec,
    state_change_event_types: Sequence[str] = (),
) -> np.ndarray:
  """Remove redundant state-change tokens (e.g. duplicate velocities).

  Vectorized: for each state-change type, a token is redundant iff it equals
  the previous token of the same type.  Reference semantics:
  run_length_encoding.py:194-239.
  """
  tokens = np.asarray(tokens, dtype=np.int32)
  keep = np.ones(len(tokens), dtype=bool)
  for event_type in state_change_event_types:
    min_index, max_index = codec.event_type_range(event_type)
    in_range = (tokens >= min_index) & (tokens <= max_index)
    (positions,) = np.nonzero(in_range)
    if len(positions) > 1:
      redundant = tokens[positions[1:]] == tokens[positions[:-1]]
      keep[positions[1:][redundant]] = False
  return tokens[keep]


def run_length_encode_shifts(
    tokens: np.ndarray, codec: event_codec.Codec) -> np.ndarray:
  """Collapse runs of shift tokens into absolute step values.

  Each shift token in the input counts as one step (inputs are single-step
  shifts from encode_and_index_events).  Before each non-shift event that
  follows at least one shift, the *total* step count so far is emitted,
  chunked at max_shift_steps.  Trailing shifts are trimmed.  Reference:
  run_length_encoding.py:242-295; vectorized here.
  """
  tokens = np.asarray(tokens, dtype=np.int32)
  if tokens.size == 0:
    return tokens
  is_shift = np.array([codec.is_shift_event_index(int(t)) for t in tokens])
  # Cheaper vectorized equivalent (shift range is [0, max_shift_steps]):
  is_shift = (tokens >= 0) & (tokens <= codec.max_shift_steps)

  total_steps = np.cumsum(is_shift)
  output = []
  prev_emitted = -1  # last total-step value emitted before an event
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


def merge_run_length_encoded_targets(
    targets: np.ndarray, codec: event_codec.Codec) -> np.ndarray:
  """Merge multiple RLE target tracks into one time-ordered stream.

  `targets` is [num_tracks, padded_length] with zero padding (zero is never
  a real token here).  Reference: run_length_encoding.py:298-368.
  """
  targets = np.asarray(targets, dtype=np.int32)
  num_tracks, targets_length = targets.shape

  current_step = 0
  current_offsets = [0] * num_tracks
  output = []

  while True:
    # Find the track with the earliest next step.
    next_step = codec.max_shift_steps + 1
    next_track = -1
    for i in range(num_tracks):
      off = current_offsets[i]
      if off == targets_length or targets[i][off] == 0:
        continue  # track exhausted (zero is always padding)
      tok = int(targets[i][off])
      if not codec.is_shift_event_index(tok):
        # Non-shift head means we haven't reached the first shift: step 0.
        next_step = 0
        next_track = i
      elif tok < next_step:
        next_step = tok
        next_track = i

    if next_track == -1:
      break

    if next_step == current_step and next_step > 0:
      # Same step as previous shift; skip the duplicate shift token.
      start_offset = current_offsets[next_track] + 1
    else:
      start_offset = current_offsets[next_track]

    # Merge events up to but not including the next shift.
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


def decode_events(
    state: DecodingState,
    tokens: np.ndarray,
    start_time: float,
    max_time: Optional[float],
    codec: event_codec.Codec,
    decode_event_fn: Callable[
        [DecodingState, float, Event, event_codec.Codec], None],
) -> Tuple[int, int]:
  """Replay a token stream through a decoding state machine.

  Returns (invalid_events, dropped_events).  Reference:
  run_length_encoding.py:371-423.
  """
  invalid_events = 0
  dropped_events = 0
  cur_steps = 0
  cur_time = start_time
  for token_idx, token in enumerate(tokens):
    try:
      event = codec.decode_event_index(int(token))
    except ValueError:
      invalid_events += 1
      continue
    if event.type == 'shift':
      cur_steps += event.value
      cur_time = start_time + cur_steps / codec.steps_per_second
      if max_time and cur_time > max_time:
        dropped_events = len(tokens) - token_idx
        break
    else:
      cur_steps = 0
      try:
        decode_event_fn(state, cur_time, event, codec)
      except ValueError:
        invalid_events += 1
        logging.debug(
            'Invalid event %s at time %f; invalid count now %d',
            event, cur_time, invalid_events)
        continue
  return invalid_events, dropped_events
