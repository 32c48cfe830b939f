"""End-to-end transcription: audio waveform -> NoteSequence.

The canonical inference path, rebuilding the reference colab
`InferenceModel.__call__` (music_transcription_with_transformers.ipynb,
cell 2) without T5X:

  audio -> hop-width frames -> contiguous segments of inputs_length frames
  -> batched (log-mel -> encoder -> KV-cached decode) on device
  -> vocabulary decode -> host-side segment stitching with tie sections.

The device program per batch is one jit: spectrogram + encoder + the whole
autoregressive decode loop, so segments stream through with no host
round-trips inside a batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mt3_tpu.codec import note_events, run_length, vocabulary
from mt3_tpu.core.config import MT3Config
from mt3_tpu.core.note_sequence import NoteSequence
from mt3_tpu.infer import decode, postprocess
from mt3_tpu.models import t5
from mt3_tpu.ops import spectrogram


@dataclasses.dataclass
class SegmentBatch:
  """A batch of audio segments ready for the device program."""
  frames: np.ndarray        # [b, inputs_length, hop_width] float32
  start_times: List[float]  # segment start time (seconds) per row
  valid: List[bool]         # False for rows that are batch padding


def audio_to_segments(audio: np.ndarray, config: MT3Config,
                      overlap_frames: int = 0) -> Sequence[SegmentBatch]:
  """Split audio into batches of inputs_length-frame segments.

  overlap_frames > 0 strides segments by (inputs_length - overlap), so
  each boundary is covered with context on both sides; the stitcher's
  max_decode_time rule (postprocess.decode_and_combine_predictions)
  resolves the overlapping event streams.  0 matches the reference's
  contiguous tiling.
  """
  hop = config.spectrogram.hop_width
  fps = config.spectrogram.frames_per_second
  seg_len = config.run.inputs_length
  batch_size = config.run.infer_batch_size
  stride = seg_len - overlap_frames
  if stride <= 0:
    raise ValueError('overlap must be smaller than the segment length')

  frames = spectrogram.split_audio(np.asarray(audio, np.float32),
                                   config.spectrogram)
  n_frames = frames.shape[0]
  n_segments = max(1, -(-max(n_frames - overlap_frames, 1) // stride))

  # Pad the frame axis so the last segment is full length.
  needed = (n_segments - 1) * stride + seg_len
  if needed > n_frames:
    frames = np.pad(frames, [(0, needed - n_frames), (0, 0)])

  segments = np.stack([frames[i * stride:i * stride + seg_len]
                       for i in range(n_segments)])
  start_times = [i * stride / fps for i in range(n_segments)]

  batches = []
  for i in range(0, n_segments, batch_size):
    chunk = segments[i:i + batch_size]
    times = start_times[i:i + batch_size]
    valid = [True] * len(chunk)
    if len(chunk) < batch_size:
      pad = batch_size - len(chunk)
      chunk = np.pad(chunk, [(0, pad), (0, 0), (0, 0)])
      times = times + [0.0] * pad
      valid = valid + [False] * pad
    batches.append(SegmentBatch(frames=chunk, start_times=times,
                                valid=valid))
  return batches


@functools.partial(jax.jit,
                   static_argnames=('model_config', 'spec_config',
                                    'max_decode_len', 'temperature',
                                    'num_beams'))
def _transcribe_batch(params, model_config, spec_config, frames,
                      max_decode_len, temperature, rng,
                      num_beams: int = 0):
  """Device program: frames -> logmel -> encode -> decode tokens."""
  mel = spectrogram.compute_logmel(
      spectrogram.flatten_frames(frames), spec_config)
  encoded = t5.encode(params, model_config, mel)
  if num_beams > 1:
    from mt3_tpu.infer import beam_search
    tokens, scores = beam_search.beam_search(
        params, model_config, encoded, max_decode_len,
        num_beams=num_beams)
    lengths = jnp.sum(tokens > 0, axis=-1)
    del scores
    return tokens, lengths
  return decode.decode_tokens(
      params, model_config, encoded, max_decode_len,
      temperature=temperature, rng=rng,
      steps_per_iter=getattr(model_config, 'decode_steps_per_iter', 1))


class Transcriber:
  """Audio -> NoteSequence transcription engine.

  With a mesh, parameters are placed by their logical axes (replicated or
  tensor-parallel over 'model') and each segment batch is sharded over
  'data' — the TPU-native sequence-scaling story: segments of the sliding
  window are embarrassingly parallel, so the segment axis is a batch axis
  on the mesh (SURVEY.md section 5.7).
  """

  def __init__(self, config: MT3Config, params,
               temperature: float = 0.0, mesh=None, params_axes=None,
               num_beams: int = 0):
    self.config = config
    self.mesh = mesh
    if mesh is not None:
      from mt3_tpu.parallel import partitioning
      if params_axes is not None:
        params = partitioning.shard_params(params, params_axes, mesh)
      else:
        params = jax.device_put(
            params, jax.tree_util.tree_map(
                lambda _: partitioning.replicated(mesh), params))
    self.params = params
    self.temperature = temperature
    self.num_beams = num_beams
    self.codec = vocabulary.build_codec(config.vocab)
    self.vocab = vocabulary.vocabulary_from_codec(self.codec)
    if config.run.onsets_only:
      self.encoding_spec = note_events.NoteOnsetEncodingSpec
    elif config.run.use_ties:
      self.encoding_spec = note_events.NoteEncodingWithTiesSpec
    else:
      self.encoding_spec = note_events.NoteEncodingSpec

  def __call__(self, audio: np.ndarray,
               rng: Optional[jax.Array] = None) -> NoteSequence:
    return self.transcribe(audio, rng=rng)['est_ns']

  def predict_segments(self, audio: np.ndarray,
                       rng: Optional[jax.Array] = None,
                       unique_id: int = 0):
    """Per-segment token predictions for a waveform (public batched path).

    Returns the list of postprocessed per-segment prediction dicts —
    the shared plumbing under transcribe() and the evaluator
    (eval/evaluator.py): batched EOS early exit, async dispatch, and
    mesh sharding all live here.
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    # Phase 1: dispatch every batch asynchronously; the device works
    # through them while the host decodes/stitches earlier results
    # (SURVEY.md section 7.3 item 6: keep host postprocessing off the
    # device critical path).
    in_flight = []
    for batch in audio_to_segments(audio, self.config):
      rng, batch_rng = jax.random.split(rng)
      frames = jnp.asarray(batch.frames)
      if self.mesh is not None:
        from mt3_tpu.parallel import partitioning
        frames = jax.device_put(
            frames, partitioning.data_sharding(self.mesh, frames.ndim))
      tokens, _ = _transcribe_batch(
          self.params, self.config.model, self.config.spectrogram,
          frames, self.config.run.targets_length,
          self.temperature, batch_rng, num_beams=self.num_beams)
      in_flight.append((batch, tokens))

    # Phase 2: fetch and decode on host.
    predictions = []
    for batch, tokens in in_flight:
      decoded = self.vocab.decode_array(np.asarray(tokens))
      for row, start_time, valid in zip(decoded, batch.start_times,
                                        batch.valid):
        if not valid:
          continue
        predictions.append(postprocess.postprocess_prediction(
            row, start_time, self.codec,
            raw_inputs=np.zeros((0,), np.float32),
            unique_id=unique_id))
    return predictions

  def transcribe(self, audio: np.ndarray,
                 rng: Optional[jax.Array] = None):
    """Transcribe a full waveform; returns the combined result dict."""
    predictions = self.predict_segments(audio, rng=rng)
    return postprocess.event_predictions_to_ns(
        predictions, self.codec, self.encoding_spec)
