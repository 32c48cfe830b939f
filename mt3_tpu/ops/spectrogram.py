"""Jittable log-mel spectrogram frontend.

TPU-native rebuild of the reference spectral frontend
(/root/reference/mt3/spectral_ops.py:35-88, spectrograms.py:55-82), which
uses tf.signal.stft + linear_to_mel_weight_matrix.  Instead of translating
those TF ops, the whole frontend is expressed as MXU-friendly matrix math:

    frame (strided row gather) -> windowed real DFT as two matmuls
    -> |.| -> mel projection matmul -> safe log

The Hann window is folded into the DFT matrices so the hot path is exactly
three matmuls plus cheap elementwise ops, which XLA fuses.  An rfft-based
path is also provided (`method='fft'`) and both are golden-tested against
tf.signal in tests/test_spectrogram.py.

Shapes are fully static: for input samples of length n (a multiple of
hop_width), the output has n // hop_width spectrogram frames, matching
tf.signal.stft(pad_end=True) semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mt3_tpu.core.config import SpectrogramConfig
from mt3_tpu.ops import mel


def hann_window(size: int) -> np.ndarray:
  """Periodic Hann window (tf.signal.hann_window default)."""
  return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(size) / size)).astype(
      np.float64)


@functools.lru_cache(maxsize=None)
def _windowed_dft_matrices(frame_size: int, fft_size: int):
  """Real-DFT basis with the Hann window folded in.

  Returns (cos, sin) matrices of shape [frame_size, fft_size // 2 + 1] such
  that for a frame x: re = x @ cos, im = x @ sin gives rfft(window * x).
  """
  n = np.arange(frame_size)[:, np.newaxis].astype(np.float64)
  k = np.arange(fft_size // 2 + 1)[np.newaxis, :].astype(np.float64)
  angle = 2.0 * np.pi * n * k / fft_size
  window = hann_window(frame_size)[:, np.newaxis]
  w_cos = (window * np.cos(angle)).astype(np.float32)
  w_sin = (-window * np.sin(angle)).astype(np.float32)
  return w_cos, w_sin


@functools.lru_cache(maxsize=None)
def _mel_matrix(config: SpectrogramConfig) -> np.ndarray:
  return mel.linear_to_mel_weight_matrix(
      num_mel_bins=config.num_mel_bins,
      num_spectrogram_bins=config.fft_size // 2 + 1,
      sample_rate=config.sample_rate,
      lower_edge_hertz=config.mel_lo_hz,
      upper_edge_hertz=config.mel_hi_hz)


def frame_signal(samples: jnp.ndarray, frame_size: int,
                 hop: int) -> jnp.ndarray:
  """Frame [..., n] samples into [..., n // hop, frame_size] windows.

  Matches tf.signal.stft(pad_end=True) framing for n a multiple of hop:
  frame i covers samples [i*hop, i*hop + frame_size), zero-padded past the
  end.  Implemented as a row gather over the [n // hop, hop] view so the
  gather operates on aligned rows, not scalars.
  """
  if samples.shape[-1] % hop != 0:
    raise ValueError('sample count must be a multiple of the hop width')
  if frame_size % hop != 0:
    raise ValueError('frame_size must be a multiple of the hop width')
  n_frames = samples.shape[-1] // hop
  ratio = frame_size // hop
  pad = [(0, 0)] * (samples.ndim - 1) + [(0, frame_size - hop)]
  padded = jnp.pad(samples, pad)
  rows = padded.reshape(samples.shape[:-1] + (n_frames + ratio - 1, hop))
  idx = np.arange(n_frames)[:, None] + np.arange(ratio)[None, :]
  framed = jnp.take(rows, idx, axis=-2)  # [..., n_frames, ratio, hop]
  return framed.reshape(samples.shape[:-1] + (n_frames, frame_size))


def stft_magnitude(samples: jnp.ndarray, config: SpectrogramConfig,
                   method: str = 'matmul') -> jnp.ndarray:
  """|STFT| of [..., n] samples -> [..., n // hop, fft_size // 2 + 1]."""
  frames = frame_signal(samples.astype(jnp.float32), config.fft_size,
                        config.hop_width)
  if method == 'matmul':
    w_cos, w_sin = _windowed_dft_matrices(config.fft_size, config.fft_size)
    re = jnp.matmul(frames, w_cos, precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(frames, w_sin, precision=jax.lax.Precision.HIGHEST)
    return jnp.sqrt(re * re + im * im)
  elif method == 'fft':
    window = jnp.asarray(hann_window(config.fft_size), dtype=jnp.float32)
    return jnp.abs(jnp.fft.rfft(frames * window, n=config.fft_size))
  raise ValueError(f'unknown stft method: {method}')


def safe_log(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
  """log(x) with non-positive values clamped to eps (spectral_ops.py:29-32)."""
  return jnp.log(jnp.where(x <= 0.0, eps, x))


def compute_logmel(samples: jnp.ndarray, config: SpectrogramConfig,
                   method: str = 'matmul') -> jnp.ndarray:
  """Log-mel spectrogram of [..., n] samples -> [..., n//hop, mel_bins]."""
  magnitude = stft_magnitude(samples, config, method=method)
  mel_matrix = jnp.asarray(_mel_matrix(config))
  mel_spec = jnp.matmul(magnitude, mel_matrix,
                        precision=jax.lax.Precision.HIGHEST)
  return safe_log(mel_spec)


# ---------------------------------------------------------------------------
# Frame-level helpers mirroring spectrograms.py:55-82.
# ---------------------------------------------------------------------------
def split_audio(samples: np.ndarray,
                config: SpectrogramConfig) -> np.ndarray:
  """Split 1-D audio into non-overlapping hop-width frames (host-side)."""
  samples = np.asarray(samples, dtype=np.float32)
  remainder = len(samples) % config.hop_width
  if remainder:
    samples = np.pad(samples, (0, config.hop_width - remainder))
  return samples.reshape(-1, config.hop_width)


def flatten_frames(frames: jnp.ndarray) -> jnp.ndarray:
  """Convert [..., n_frames, hop] frames back to flat samples."""
  return frames.reshape(frames.shape[:-2] + (-1,))


def compute_spectrogram(samples: jnp.ndarray,
                        config: SpectrogramConfig) -> jnp.ndarray:
  """Reference-equivalent mel spectrogram entry point."""
  return compute_logmel(samples, config)


@functools.partial(jax.jit, static_argnums=(1,))
def frames_to_logmel(frames: jnp.ndarray,
                     config: SpectrogramConfig) -> jnp.ndarray:
  """Jitted [..., n_frames, hop] audio frames -> [..., n_frames, mel]."""
  return compute_logmel(flatten_frames(frames), config)
