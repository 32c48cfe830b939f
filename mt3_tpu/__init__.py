"""mt3_tpu: a TPU-native JAX framework for audio -> MIDI transcription.

A from-scratch rebuild of the capabilities of magenta/mt3 (T5-style
encoder-decoder over log-mel spectrograms emitting MIDI-like event tokens)
with no T5X / seqio / flaxformer / TensorFlow dependency.

Layers (bottom-up):
  core      -- configs, NoteSequence data model, MIDI I/O, sustain handling
  codec     -- event codec, token vocabulary, run-length encoding,
               note-event state machines (pure Python/NumPy, host-side)
  ops       -- jittable audio frontend (framing -> STFT -> mel -> log) and
               Pallas TPU kernels
  models    -- pure-JAX (functional, flax-free) T5-style encoder-decoder
  parallel  -- jax.sharding Mesh construction + logical-axis partitioning
  train     -- Adafactor, loss, jit'd train step, checkpointing
  infer     -- KV-cached autoregressive decode, sliding-window transcription
  data      -- dataset pipeline: tokenization, chunking, mixing, batching
  eval      -- transcription metrics (mir_eval-equivalent, self-contained)
"""

__version__ = '0.1.0'
