"""Tests for audio synthesis and pianoroll summaries."""

import os

import numpy as np

from mt3_tpu.core.note_sequence import NoteSequence
from mt3_tpu.eval import summaries


def _ns():
  ns = NoteSequence()
  ns.add_note(pitch=60, velocity=100, start_time=0.0, end_time=0.5)
  ns.add_note(pitch=36, velocity=120, start_time=0.25, end_time=0.26,
              is_drum=True, instrument=9)
  ns.total_time = 0.5
  return ns


def test_synthesize():
  audio = summaries.synthesize(_ns(), sample_rate=8000)
  assert audio.ndim == 1
  assert len(audio) > 8000 * 0.5
  assert np.max(np.abs(audio)) <= 1.0
  assert np.max(np.abs(audio)) > 0.01


def test_pianoroll_image():
  img = summaries.pianoroll_image(_ns(), _ns(),
                                  segment_start_times=[0.25])
  assert img.ndim == 3 and img.shape[0] == 128 and img.shape[2] == 3
  # est == ref -> red and green channels identical (yellow).
  np.testing.assert_array_equal(img[..., 0], img[..., 1])
  assert img[..., 2].any()  # segment boundary marker


def test_write_transcription_summaries(tmp_path):
  results = {0: {'est_ns': _ns(), 'start_times': [0.0]}}
  targets = {0: {'ref_ns': _ns()}}
  out = str(tmp_path / 'summaries')
  summaries.write_transcription_summaries(results, targets, out,
                                          sample_rate=8000)
  files = sorted(os.listdir(out))
  assert files == ['0_est.wav', '0_pianoroll.png', '0_ref.wav']
