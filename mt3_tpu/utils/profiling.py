"""Profiling and throughput instrumentation.

Equivalent of the tracing surface the reference inherits from t5x/jax
(SURVEY.md section 5.1): jax.profiler traces around the train step and the
decode loop, plus simple step-time / audio-seconds-per-second counters
(the north-star metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
  """Capture a jax profiler trace (xplane) around a code block."""
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


class Timer:
  """Wall-clock timer with device synchronization via block-on-result."""

  def __init__(self):
    self.start = time.perf_counter()

  def elapsed(self, result=None) -> float:
    if result is not None:
      jax.block_until_ready(result)
    return time.perf_counter() - self.start


class ThroughputMeter:
  """Tracks steps/sec and audio-seconds/sec over a sliding window."""

  def __init__(self, window: int = 50):
    self.window = window
    self.times = []
    self.audio_seconds = []

  def update(self, audio_seconds: float = 0.0):
    self.times.append(time.perf_counter())
    self.audio_seconds.append(audio_seconds)
    if len(self.times) > self.window:
      self.times.pop(0)
      self.audio_seconds.pop(0)

  @property
  def steps_per_second(self) -> Optional[float]:
    if len(self.times) < 2:
      return None
    return (len(self.times) - 1) / (self.times[-1] - self.times[0])

  @property
  def audio_seconds_per_second(self) -> Optional[float]:
    if len(self.times) < 2:
      return None
    return sum(self.audio_seconds[1:]) / (self.times[-1] - self.times[0])
