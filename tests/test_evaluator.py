"""Evaluator driver smoke test on a tiny model (random weights)."""

import jax
import numpy as np

from mt3_tpu.core.config import (MT3Config, ModelConfig, RunConfig,
                                 SpectrogramConfig, VocabularyConfig)
from mt3_tpu.codec import vocabulary
from mt3_tpu.data import datasets
from mt3_tpu.eval import evaluator
from mt3_tpu.infer import transcribe as transcribe_lib
from mt3_tpu.models import t5


def test_evaluate_dataset_smoke(tmp_path):
  vocab_config = VocabularyConfig(num_velocity_bins=1)
  codec = vocabulary.build_codec(vocab_config)
  vocab = vocabulary.vocabulary_from_codec(codec)
  model_config = ModelConfig(
      vocab_size=vocabulary.num_embeddings(vocab), emb_dim=32,
      num_heads=2, num_encoder_layers=1, num_decoder_layers=1, head_dim=16,
      mlp_dim=32, dropout_rate=0.0, input_depth=512, max_positions=128)
  run_config = RunConfig(inputs_length=32, targets_length=16,
                         infer_batch_size=4, use_ties=True)
  config = MT3Config('t', SpectrogramConfig(), vocab_config, model_config,
                     run_config)
  params, _ = t5.init_params(jax.random.PRNGKey(0), model_config)
  transcriber = transcribe_lib.Transcriber(config, params)

  source = datasets.SyntheticDataSource(num_examples=2, duration=1.0,
                                        seed=5)
  scores = evaluator.evaluate_dataset(list(source.examples()), transcriber)
  # Random weights -> garbage transcription, but the full metric family
  # must be produced and finite.
  assert 'Onset F1' in scores
  assert 'Onset + offset + program F1 (full)' in scores
  assert 'Frame F1' in scores
  assert 'Onset + offset F1 (0.05)' in scores
  for value in scores.values():
    assert np.isfinite(value)

  line = evaluator.write_metrics(scores, str(tmp_path / 'm.jsonl'),
                                 step=7)
  assert '"step": 7' in line
  assert (tmp_path / 'm.jsonl').exists()
