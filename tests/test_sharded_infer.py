"""Sharded inference over an 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from mt3_tpu.codec import vocabulary
from mt3_tpu.core.config import (MT3Config, ModelConfig, RunConfig,
                                 SpectrogramConfig, VocabularyConfig)
from mt3_tpu.infer import transcribe as transcribe_lib
from mt3_tpu.models import t5
from mt3_tpu.parallel import partitioning


@pytest.fixture(scope='module')
def tiny_setup():
  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=64,
      num_heads=2, num_encoder_layers=2, num_decoder_layers=2, head_dim=32,
      mlp_dim=64, dropout_rate=0.0, input_depth=512, max_positions=256)
  run_config = RunConfig(inputs_length=64, targets_length=32,
                         batch_size=8, infer_batch_size=8, use_ties=True)
  config = MT3Config('test', SpectrogramConfig(), vocab_config,
                     model_config, run_config)
  params, params_axes = t5.init_params(jax.random.PRNGKey(0), model_config)
  return config, params, params_axes


def test_sharded_transcription_matches_single_device(tiny_setup):
  config, params, params_axes = tiny_setup
  assert len(jax.devices()) == 8
  rng = np.random.RandomState(0)
  audio = rng.randn(config.spectrogram.sample_rate * 2).astype(np.float32)

  single = transcribe_lib.Transcriber(config, params)
  result_single = single.transcribe(audio)

  mesh = partitioning.make_mesh(num_model_partitions=2)
  sharded = transcribe_lib.Transcriber(config, params, mesh=mesh,
                                       params_axes=params_axes)
  result_sharded = sharded.transcribe(audio)

  # Same segment structure and (numerically) same decoded notes.
  assert (result_single['start_times']
          == result_sharded['start_times'])
  ns_a, ns_b = result_single['est_ns'], result_sharded['est_ns']
  notes_a = [(n.pitch, round(n.start_time, 3)) for n in ns_a.sorted_notes()]
  notes_b = [(n.pitch, round(n.start_time, 3)) for n in ns_b.sorted_notes()]
  assert notes_a == notes_b


def test_beam_transcriber(tiny_setup):
  config, params, _ = tiny_setup
  rng = np.random.RandomState(1)
  audio = rng.randn(config.spectrogram.sample_rate).astype(np.float32)
  greedy = transcribe_lib.Transcriber(config, params)
  beam = transcribe_lib.Transcriber(config, params, num_beams=3)
  r1 = greedy.transcribe(audio)
  r2 = beam.transcribe(audio)
  # Both produce well-formed results (random weights: content arbitrary).
  assert 'est_ns' in r1 and 'est_ns' in r2


def test_sharded_quantized_transcription(tiny_setup):
  """The production quantization config (int4 self-attn + int8 cross)
  compiles and runs under a DP+TP mesh, matching the unsharded result."""
  import dataclasses
  config, params, params_axes = tiny_setup
  model_config = dataclasses.replace(
      config.model, decode_kv_quantize=True, decode_kv_bits=4,
      decode_cross_kv_quantize=True)
  config = dataclasses.replace(config, model=model_config)
  rng = np.random.RandomState(1)
  audio = rng.randn(config.spectrogram.sample_rate * 2).astype(np.float32)

  single = transcribe_lib.Transcriber(config, params)
  ns_single = single.transcribe(audio)['est_ns']

  mesh = partitioning.make_mesh(num_model_partitions=2)
  sharded = transcribe_lib.Transcriber(config, params, mesh=mesh,
                                       params_axes=params_axes)
  ns_sharded = sharded.transcribe(audio)['est_ns']

  assert len(ns_sharded.notes) == len(ns_single.notes)
  for a, b in zip(ns_single.sorted_notes(), ns_sharded.sorted_notes()):
    assert (a.pitch, a.program, a.is_drum) == (b.pitch, b.program,
                                               b.is_drum)
