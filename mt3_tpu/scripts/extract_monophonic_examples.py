"""Extract monophonic transcription examples from raw audio.

Rebuild of /root/reference/mt3/scripts/extract_monophonic_examples.py:
an f0 tracker feeds an HMM over {128 pitches + rest} whose Viterbi path
becomes a NoteSequence; clips judged monophonic (by f0-confidence
heuristic) are written as (audio, NoteSequence) training examples in
TFRecord form.

The reference's f0 tracker is CREPE (a neural model, unavailable here);
this implementation substitutes a normalized-autocorrelation tracker with
a periodicity-based confidence.  The HMM (observation/transition
structure, octave-error modeling, confidence exponent, Viterbi) follows
the reference exactly.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from typing import List, Optional, Tuple

import numpy as np

F0_SAMPLE_RATE = 16000
F0_FRAME_RATE = 100

MONOPHONIC_CONFIDENCE_THRESHOLD = 0.95
MONOPHONIC_CONFIDENCE_FRAC = 0.2
CLIP_LENGTH_SECONDS = 5

# HMM parameters (reference values).
F0_MIDI_SIGMA = 0.2
OCTAVE_ERROR_PROB = 0.05
NOTES_PER_SECOND = 2
NOTE_CHANGE_PROB = NOTES_PER_SECOND / F0_FRAME_RATE
F0_CONFIDENCE_EXP = 7.5

NUM_PITCHES = 128
NUM_STATES = NUM_PITCHES + 1  # + rest


def hz_to_midi(hz: np.ndarray) -> np.ndarray:
  hz = np.maximum(np.asarray(hz, np.float64), 1e-6)
  return 69.0 + 12.0 * np.log2(hz / 440.0)


# ---------------------------------------------------------------------------
# f0 tracking (CREPE substitute)
# ---------------------------------------------------------------------------
def track_f0(audio: np.ndarray, sample_rate: int = F0_SAMPLE_RATE,
             fmin: float = 50.0, fmax: float = 2000.0
             ) -> Tuple[np.ndarray, np.ndarray]:
  """Frame-wise f0 (Hz) and confidence in [0, 1].

  Normalized autocorrelation over 64 ms windows at 100 fps; confidence is
  the autocorrelation peak value scaled by frame energy salience.
  """
  hop = sample_rate // F0_FRAME_RATE
  win = 1024
  lag_min = int(sample_rate / fmax)
  lag_max = min(int(sample_rate / fmin), win - 1)
  n_frames = max(0, (len(audio) - win) // hop + 1)
  f0 = np.zeros(n_frames)
  confidence = np.zeros(n_frames)
  window = np.hanning(win)
  for i in range(n_frames):
    frame = audio[i * hop:i * hop + win] * window
    energy = np.sqrt(np.mean(frame ** 2))
    if energy < 1e-4:
      continue
    spec = np.fft.rfft(frame, 2 * win)
    ac = np.fft.irfft(np.abs(spec) ** 2)[:win]
    if ac[0] <= 0:
      continue
    ac = ac / ac[0]
    seg = ac[lag_min:lag_max]
    if len(seg) == 0:
      continue
    peak = int(np.argmax(seg)) + lag_min
    # Parabolic interpolation around the peak.
    if 1 <= peak < win - 1:
      alpha, beta, gamma = ac[peak - 1], ac[peak], ac[peak + 1]
      denom = alpha - 2 * beta + gamma
      shift = 0.5 * (alpha - gamma) / denom if abs(denom) > 1e-12 else 0.0
      lag = peak + np.clip(shift, -1, 1)
    else:
      lag = peak
    f0[i] = sample_rate / lag
    confidence[i] = float(np.clip(ac[peak], 0.0, 1.0))
  return f0, confidence


def is_monophonic_heuristic(f0_confidence: np.ndarray) -> bool:
  """Reference heuristic: enough frames with very confident f0."""
  if len(f0_confidence) == 0:
    return False
  return (np.sum(f0_confidence >= MONOPHONIC_CONFIDENCE_THRESHOLD)
          / len(f0_confidence) >= MONOPHONIC_CONFIDENCE_FRAC)


# ---------------------------------------------------------------------------
# HMM (reference-exact structure)
# ---------------------------------------------------------------------------
def f0_hmm_matrices(f0_hz: np.ndarray, f0_confidence: np.ndarray
                    ) -> Tuple[np.ndarray, np.ndarray]:
  """Observation/transition log-likelihood matrices."""
  from scipy.stats import norm

  f0_midi = hz_to_midi(f0_hz)
  f0_midi_diff = f0_midi[:, np.newaxis] - np.arange(NUM_PITCHES)[None, :]

  prob_correct = norm.pdf(f0_midi_diff, scale=F0_MIDI_SIGMA)
  prob_low = norm.pdf(f0_midi_diff + 12, scale=F0_MIDI_SIGMA)
  prob_high = norm.pdf(f0_midi_diff - 12, scale=F0_MIDI_SIGMA)

  f0_midi_loglik = ((1 - OCTAVE_ERROR_PROB) * prob_correct
                    + 0.5 * OCTAVE_ERROR_PROB * prob_low
                    + 0.5 * OCTAVE_ERROR_PROB * prob_high)
  f0_midi_rest_loglik = -np.log(NUM_PITCHES)

  conf = np.power(np.clip(f0_confidence, 1e-9, 1 - 1e-9),
                  F0_CONFIDENCE_EXP)[:, np.newaxis]

  obs_loglik = np.concatenate([
      f0_midi_loglik + np.log(conf) - np.log(NUM_PITCHES),
      f0_midi_rest_loglik + np.log(1.0 - conf),
  ], axis=1)
  obs_loglik += np.log(NUM_STATES)

  trans_prob = ((NOTE_CHANGE_PROB / NUM_PITCHES) * np.ones(NUM_STATES)
                + (1 - NOTE_CHANGE_PROB - NOTE_CHANGE_PROB / NUM_PITCHES)
                * np.eye(NUM_STATES))
  return obs_loglik, np.log(trans_prob)


def hmm_forward(obs_loglik: np.ndarray,
                trans_loglik: np.ndarray) -> float:
  """Forward-algorithm log likelihood."""
  from scipy.special import logsumexp
  n, k = obs_loglik.shape
  trans = np.exp(trans_loglik)
  loglik = 0.0
  l = obs_loglik[0] - np.log(k)
  c = logsumexp(l)
  loglik += c
  for i in range(1, n):
    p = np.exp(l - c)
    l = np.log(np.dot(p, trans)) + obs_loglik[i]
    c = logsumexp(l)
    loglik += c
  return float(loglik)


def hmm_viterbi(obs_loglik: np.ndarray,
                trans_loglik: np.ndarray) -> List[Optional[int]]:
  """Viterbi path; None marks rest frames."""
  n, k = obs_loglik.shape
  loglik_matrix = np.zeros_like(obs_loglik)
  path_matrix = np.zeros_like(obs_loglik, dtype=np.int32)
  loglik_matrix[0, :] = obs_loglik[0, :] - np.log(k)
  for i in range(1, n):
    mat = loglik_matrix[i - 1][:, np.newaxis] + trans_loglik
    path_matrix[i, :] = mat.argmax(axis=0)
    loglik_matrix[i, :] = (mat[path_matrix[i, :], range(k)]
                           + obs_loglik[i])
  path = [int(np.argmax(loglik_matrix[-1]))]
  for i in range(n, 1, -1):
    path.append(int(path_matrix[i - 1, path[-1]]))
  return [(pitch if pitch < NUM_PITCHES else None)
          for pitch in path[::-1]]


def pitches_to_notesequence(pitches: List[Optional[int]]):
  """Viterbi pitch path -> NoteSequence."""
  from mt3_tpu.core.note_sequence import NoteSequence
  ns = NoteSequence(ticks_per_quarter=220)
  current_pitch = None
  start_time = 0.0
  for frame, pitch in enumerate(pitches):
    time = frame / F0_FRAME_RATE
    if pitch != current_pitch:
      if current_pitch is not None:
        ns.add_note(pitch=current_pitch, velocity=100,
                    start_time=start_time, end_time=time)
      current_pitch = pitch
      start_time = time
  if current_pitch is not None:
    ns.add_note(pitch=current_pitch, velocity=100,
                start_time=start_time,
                end_time=len(pitches) / F0_FRAME_RATE)
  if ns.notes:
    ns.total_time = ns.notes[-1].end_time
  return ns


@dataclasses.dataclass
class MonophonicClip:
  audio: np.ndarray
  sequence: 'NoteSequence'
  start_seconds: float


def extract_clips(audio: np.ndarray,
                  sample_rate: int = F0_SAMPLE_RATE
                  ) -> List[MonophonicClip]:
  """Split audio into 5 s clips; keep monophonic ones with transcripts."""
  clip_samples = CLIP_LENGTH_SECONDS * sample_rate
  clips = []
  for start in range(0, len(audio) - clip_samples + 1, clip_samples):
    clip = audio[start:start + clip_samples]
    f0, confidence = track_f0(clip, sample_rate)
    if not is_monophonic_heuristic(confidence):
      continue
    obs, trans = f0_hmm_matrices(f0, confidence)
    pitches = hmm_viterbi(obs, trans)
    ns = pitches_to_notesequence(pitches)
    if not ns.notes:
      continue
    clips.append(MonophonicClip(audio=clip, sequence=ns,
                                start_seconds=start / sample_rate))
  return clips


def main(argv=None):
  parser = argparse.ArgumentParser(
      description='Extract monophonic examples to TFRecord')
  parser.add_argument('inputs', nargs='+', help='input .wav files')
  parser.add_argument('--output', required=True, help='output TFRecord')
  args = parser.parse_args(argv)

  from mt3_tpu.core import midi_io
  from mt3_tpu.data import tfrecord
  from mt3_tpu.data.datasets import read_wav

  records = []
  for path in args.inputs:
    audio = read_wav(path, F0_SAMPLE_RATE)
    clips = extract_clips(audio)
    print(f'{path}: {len(clips)} monophonic clips', file=sys.stderr)
    for clip in clips:
      records.append(tfrecord.make_example({
          'audio': clip.audio.astype(np.float32),
          'sequence': [midi_io.note_sequence_to_midi(clip.sequence)],
          'id': [f'{path}:{clip.start_seconds}'.encode()],
      }))
  tfrecord.write_records(args.output, records)
  print(f'wrote {len(records)} examples to {args.output}',
        file=sys.stderr)


if __name__ == '__main__':
  main()
