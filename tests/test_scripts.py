"""Tests for the monophonic extractor and checkpointing."""

import numpy as np
import pytest

from mt3_tpu.scripts import extract_monophonic_examples as mono


def _tone(freq, duration=5.0, sr=16000):
  t = np.arange(int(duration * sr)) / sr
  return (0.8 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_track_f0_pure_tone():
  audio = _tone(440.0)
  f0, conf = mono.track_f0(audio)
  voiced = conf > 0.9
  assert voiced.mean() > 0.8
  np.testing.assert_allclose(np.median(f0[voiced]), 440.0, rtol=0.02)


def test_monophonic_heuristic():
  assert mono.is_monophonic_heuristic(np.full(100, 0.99))
  assert not mono.is_monophonic_heuristic(np.full(100, 0.5))


def test_hmm_viterbi_tracks_pitch_change():
  # 1 s of A4 (midi 69) then 1 s of C5 (midi 72) at 100 fps.
  f0 = np.concatenate([np.full(100, 440.0), np.full(100, 523.25)])
  conf = np.full(200, 0.99)
  obs, trans = mono.f0_hmm_matrices(f0, conf)
  path = mono.hmm_viterbi(obs, trans)
  assert path[50] == 69
  assert path[150] == 72
  ns = mono.pitches_to_notesequence(path)
  pitches = [n.pitch for n in ns.sorted_notes()]
  assert pitches == [69, 72]
  # hmm_forward runs and returns a finite log-likelihood.
  assert np.isfinite(mono.hmm_forward(obs, trans))


def test_hmm_rest_detection():
  f0 = np.full(100, 440.0)
  conf = np.concatenate([np.full(50, 0.99), np.full(50, 0.01)])
  obs, trans = mono.f0_hmm_matrices(f0, conf)
  path = mono.hmm_viterbi(obs, trans)
  assert path[25] == 69
  assert path[90] is None  # low confidence -> rest


def test_extract_clips_end_to_end():
  audio = np.concatenate([_tone(261.63, 2.5), _tone(329.63, 2.5)])
  clips = mono.extract_clips(audio)
  assert len(clips) == 1
  pitches = sorted(set(n.pitch for n in clips[0].sequence.notes))
  assert 60 in pitches and 64 in pitches


def test_checkpoint_save_restore(tmp_path):
  import jax
  from mt3_tpu.core.config import ModelConfig
  from mt3_tpu.models import t5
  from mt3_tpu.train import checkpoint as ckpt

  config = ModelConfig(vocab_size=128, emb_dim=16, num_heads=2,
                       num_encoder_layers=2, num_decoder_layers=2,
                       head_dim=8, mlp_dim=32, input_depth=8)
  params, _ = t5.init_params(jax.random.PRNGKey(0), config)
  directory = str(tmp_path / 'ckpts')
  path = ckpt.save_checkpoint(directory, 7, {'params': params})
  assert ckpt.latest_checkpoint(directory) == path
  ckpt.save_checkpoint(directory, 12, {'params': params})
  assert ckpt.latest_checkpoint(directory).endswith('checkpoint_12')

  params2, _ = t5.init_params(jax.random.PRNGKey(1), config)
  restored = ckpt.restore_checkpoint(path, {'params': params2})
  flat_a = jax.tree_util.tree_leaves(params)
  flat_b = jax.tree_util.tree_leaves(restored['params'])
  for a, b in zip(flat_a, flat_b):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_t5x_param_conversion():
  from mt3_tpu.train import checkpoint as ckpt

  rng = np.random.RandomState(0)
  emb, mlp, joined, vocab, mel = 8, 16, 8, 32, 12
  n_layers = 2

  t5x_params = {
      'encoder/continuous_inputs_projection/kernel': rng.randn(mel, emb),
      'encoder/encoder_norm/scale': rng.randn(emb),
      'decoder/token_embedder/embedding': rng.randn(vocab, emb),
      'decoder/decoder_norm/scale': rng.randn(emb),
      'decoder/logits_dense/kernel': rng.randn(emb, vocab),
  }
  for layer in range(n_layers):
    for rel in ckpt._T5X_ENCODER_LAYER:
      shape = (emb,) if rel.endswith('scale') else (emb, mlp)
      t5x_params[f'encoder/layers_{layer}/{rel}'] = rng.randn(*shape)
    for rel in ckpt._T5X_DECODER_LAYER:
      shape = (emb,) if rel.endswith('scale') else (emb, joined)
      t5x_params[f'decoder/layers_{layer}/{rel}'] = rng.randn(*shape)

  params = ckpt.convert_t5x_param_dict(t5x_params, n_layers, n_layers)
  assert params['encoder']['input_proj'].shape == (mel, emb)
  assert params['encoder']['layers']['attention']['query'].shape == (
      n_layers, emb, mlp)
  assert params['decoder']['layers']['cross_attention']['out'].shape == (
      n_layers, emb, joined)
  # Stacking preserves per-layer values.
  np.testing.assert_array_equal(
      params['decoder']['layers']['mlp']['wi_0'][1],
      t5x_params['decoder/layers_1/mlp/wi_0/kernel'])


def test_dump_task_decoded_output(tmp_path, capsys):
  """dump_task prints tokenized targets whose decoded event names match
  the known content of a reference-schema TFRecord fixture."""
  import io
  import wave as wave_mod

  import numpy as np

  from mt3_tpu.core import noteseq_proto
  from mt3_tpu.core.note_sequence import Note, NoteSequence
  from mt3_tpu.data import tfrecord
  from mt3_tpu.scripts import dump_task

  # One clearly-identifiable note: pitch 60, velocity 100, 0.0-0.5 s.
  ns = NoteSequence(id='fixture', total_time=1.0)
  ns.notes = [Note(pitch=60, velocity=100, start_time=0.0, end_time=0.5)]
  t = np.arange(16000) / 16000
  audio = (0.2 * np.sin(2 * np.pi * 261.63 * t)).astype(np.float32)
  buf = io.BytesIO()
  with wave_mod.open(buf, 'wb') as w:
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(16000)
    w.writeframes((audio * 32767).astype('<i2').tobytes())
  record = tfrecord.make_example({
      'audio': buf.getvalue(),
      'sequence': noteseq_proto.notesequence_to_bytes(ns),
      'id': b'fixture',
  })
  path = str(tmp_path / 'fixture.tfrecord')
  tfrecord.write_records(path, [record])

  dump_task.main(['--model', 'tiny', '--data', path,
                  '--dataset', 'maestrov3', '--num_examples', '1',
                  '--decode_targets'])
  out = capsys.readouterr().out
  assert 'decoded:' in out
  # The tiny config crops 8 frames (64 ms); wherever the crop lands the
  # stream must contain valid event names and terminate with EOS.
  decoded_line = next(l for l in out.splitlines() if 'decoded:' in l)
  assert 'EOS' in decoded_line
  assert 'INVALID' not in decoded_line
  # A crop overlapping the note onset or its tied continuation must
  # reference pitch 60 (program 0 piano).
  if 'pitch' in decoded_line:
    assert 'pitch:60' in decoded_line
