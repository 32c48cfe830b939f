"""Fused Pallas log-mel kernel vs the jnp reference path.

Runs in Pallas interpret mode on CPU (compiled mode is covered on real
TPU by bench.py / the transcription path).
"""

import numpy as np
import pytest

from mt3_tpu.core.config import SpectrogramConfig
from mt3_tpu.ops import spectrogram


@pytest.fixture
def config():
  return SpectrogramConfig()


def test_fused_logmel_matches_reference(config, monkeypatch):
  from jax.experimental.pallas import tpu as pltpu
  from mt3_tpu.ops.pallas import logmel

  rng = np.random.RandomState(0)
  n = 16 * config.hop_width
  t = np.arange(n) / config.sample_rate
  audio = (0.5 * np.sin(2 * np.pi * 440 * t)
           + 0.05 * rng.randn(n)).astype(np.float32)

  ref = np.asarray(spectrogram.compute_logmel(audio, config))
  with pltpu.force_tpu_interpret_mode():
    fused = np.asarray(logmel.logmel_fused(audio, config))
  assert fused.shape == ref.shape
  np.testing.assert_allclose(fused, ref, atol=5e-3)


def test_fused_logmel_batched(config):
  from jax.experimental.pallas import tpu as pltpu
  from mt3_tpu.ops.pallas import logmel

  rng = np.random.RandomState(1)
  audio = rng.randn(2, 8 * config.hop_width).astype(np.float32)
  ref = np.asarray(spectrogram.compute_logmel(audio, config))
  with pltpu.force_tpu_interpret_mode():
    fused = np.asarray(logmel.logmel_fused(audio, config))
  assert fused.shape == (2, 8, config.num_mel_bins)
  np.testing.assert_allclose(fused, ref, atol=5e-3)
