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


def load_transcriber(model: str = 'mt3', checkpoint_dir=None,
                     bfloat16: bool = True, **kwargs):
  """Convenience constructor: config preset + params -> Transcriber.

  The two-line user path:
      import mt3_tpu
      notes = mt3_tpu.load_transcriber('mt3', 'ckpts/')(audio)
  """
  import jax
  from mt3_tpu.core import config as config_lib
  from mt3_tpu.infer.transcribe import Transcriber
  from mt3_tpu.models import t5
  from mt3_tpu.train import checkpoint as ckpt_lib

  config = config_lib.CONFIG_FACTORIES[model]()
  if bfloat16:
    model_config = config_lib.ModelConfig(
        **{**config.model.__dict__, 'dtype': 'bfloat16'})
    config = config_lib.MT3Config(config.name, config.spectrogram,
                                  config.vocab, model_config, config.run)
  params, params_axes = t5.init_params(jax.random.PRNGKey(0),
                                       config.model)
  if checkpoint_dir:
    path = ckpt_lib.latest_checkpoint(checkpoint_dir) or checkpoint_dir
    params = ckpt_lib.restore_checkpoint(path, {'params': params})[
        'params']
  return Transcriber(config, params, params_axes=params_axes, **kwargs)
