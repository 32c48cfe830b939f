"""Golden tests: audio frontend vs tf.signal reference semantics.

TF is available in the dev environment only as a test oracle; the framework
itself never imports it.
"""

import numpy as np
import pytest

from mt3_tpu.core.config import SpectrogramConfig
from mt3_tpu.ops import mel, spectrogram

tf = pytest.importorskip('tensorflow')


def _tf_logmel(samples, config):
  """Reference computation, mirroring spectral_ops.compute_logmel."""
  overlap = 1 - config.hop_width / config.fft_size
  s = tf.signal.stft(
      signals=tf.convert_to_tensor(samples, tf.float32),
      frame_length=config.fft_size,
      frame_step=int(config.fft_size * (1.0 - overlap)),
      fft_length=None,
      pad_end=True)
  mag = tf.abs(s)
  mel_matrix = tf.signal.linear_to_mel_weight_matrix(
      config.num_mel_bins, int(mag.shape[-1]), config.sample_rate,
      config.mel_lo_hz, config.mel_hi_hz)
  mel_spec = tf.tensordot(mag, mel_matrix, 1)
  safe = tf.where(mel_spec <= 0.0, 1e-5, mel_spec)
  return tf.math.log(safe).numpy()


@pytest.fixture
def config():
  return SpectrogramConfig()


@pytest.fixture
def audio(config):
  rng = np.random.RandomState(42)
  n = 32 * config.hop_width  # 32 frames
  t = np.arange(n) / config.sample_rate
  # A few tones plus noise, roughly unit scale like normalized audio.
  x = (0.5 * np.sin(2 * np.pi * 440 * t)
       + 0.3 * np.sin(2 * np.pi * 1234.5 * t)
       + 0.1 * rng.randn(n))
  return x.astype(np.float32)


def test_mel_matrix_matches_tf(config):
  ours = mel.linear_to_mel_weight_matrix(
      num_mel_bins=config.num_mel_bins,
      num_spectrogram_bins=config.fft_size // 2 + 1,
      sample_rate=config.sample_rate,
      lower_edge_hertz=config.mel_lo_hz,
      upper_edge_hertz=config.mel_hi_hz)
  theirs = tf.signal.linear_to_mel_weight_matrix(
      config.num_mel_bins, config.fft_size // 2 + 1, config.sample_rate,
      config.mel_lo_hz, config.mel_hi_hz).numpy()
  # Differences are float32 rounding (linspace/log evaluation order); the
  # band structure is identical and end-to-end logmel agrees to 5e-3.
  np.testing.assert_allclose(ours, theirs, atol=2e-4)


@pytest.mark.parametrize('method', ['matmul', 'fft'])
def test_stft_magnitude_matches_tf(config, audio, method):
  ours = np.asarray(spectrogram.stft_magnitude(audio, config, method=method))
  theirs = tf.abs(tf.signal.stft(
      tf.convert_to_tensor(audio), frame_length=config.fft_size,
      frame_step=config.hop_width, pad_end=True)).numpy()
  assert ours.shape == theirs.shape
  np.testing.assert_allclose(ours, theirs, atol=2e-3, rtol=1e-4)


@pytest.mark.parametrize('method', ['matmul', 'fft'])
def test_logmel_matches_tf(config, audio, method):
  ours = np.asarray(spectrogram.compute_logmel(audio, config, method=method))
  theirs = _tf_logmel(audio, config)
  assert ours.shape == (32, config.num_mel_bins)
  assert ours.shape == theirs.shape
  # log-domain comparison; silence floor is log(1e-5) ~ -11.5.
  np.testing.assert_allclose(ours, theirs, atol=5e-3)


def test_logmel_batched(config, audio):
  batch = np.stack([audio, 0.5 * audio])
  out = np.asarray(spectrogram.compute_logmel(batch, config))
  assert out.shape == (2, 32, config.num_mel_bins)
  single = np.asarray(spectrogram.compute_logmel(audio, config))
  # Batched vs single matmul accumulation order differs slightly.
  np.testing.assert_allclose(out[0], single, atol=1e-3)


def test_frame_signal_pad_end(config):
  # Last frames read past the end and must be zero-padded.
  n = 4 * config.hop_width
  x = np.ones(n, dtype=np.float32)
  frames = np.asarray(
      spectrogram.frame_signal(x, config.fft_size, config.hop_width))
  assert frames.shape == (4, config.fft_size)
  np.testing.assert_array_equal(frames[0][:n], np.ones(n))
  np.testing.assert_array_equal(frames[0][n:], np.zeros(config.fft_size - n))
  np.testing.assert_array_equal(frames[3][:config.hop_width * 1],
                                np.ones(config.hop_width))
  np.testing.assert_array_equal(frames[3][config.hop_width:],
                                np.zeros(config.fft_size - config.hop_width))


def test_split_and_flatten_round_trip(config):
  x = np.random.RandomState(0).randn(1000).astype(np.float32)
  frames = spectrogram.split_audio(x, config)
  assert frames.shape == (8, config.hop_width)  # padded to 1024
  flat = np.asarray(spectrogram.flatten_frames(frames))
  np.testing.assert_array_equal(flat[:1000], x)
  np.testing.assert_array_equal(flat[1000:], np.zeros(24))


def test_int16_transfer_logmel_equivalence(config):
  """The train CLI's compact int16 batch transfer (cli/train.py
  to_model_batch, working around the relay transfer leak) must not move
  the log-mel features: int16 audio quantization is -96 dB, far below
  the safe_log floor of the spectrogram (eps 1e-5)."""
  rng = np.random.RandomState(0)
  frames = (0.9 * rng.randn(4, 64, config.hop_width)).clip(-1, 1)
  frames = frames.astype(np.float32)
  frames_i16 = np.clip(np.round(frames * 32767.0), -32768,
                       32767).astype(np.int16)
  dequant = frames_i16.astype(np.float32) / 32767.0

  ref = spectrogram.frames_to_logmel(frames, config)
  got = spectrogram.frames_to_logmel(dequant, config)
  np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                             atol=5e-3, rtol=1e-3)
