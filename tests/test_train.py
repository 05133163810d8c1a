"""Tests for the example trainer (models/train.py)."""

import json

import numpy as np

from last_torch_tpu.models import gnat, train


def tiny_model_config():
  return gnat.GNATConfig(
      feature_size=8,
      vocab_size=4,
      context_size=1,
      encoder_size=16,
      encoder_layers=1,
      encoder_heads=2,
      encoder_ffn_size=32,
      hidden_size=16,
      embedding_size=16,
      max_expansions=1,
      locally_normalized=True)


def tiny_data_config():
  return train.DataConfig(
      batch_size=8, max_num_frames=10, max_num_labels=3, feature_size=8,
      vocab_size=4)


def test_process_local_slice():
  # 4 hosts x global batch 32: contiguous even slices.
  slices = [train.process_local_slice(32, 4, i) for i in range(4)]
  assert slices == [(0, 8), (8, 8), (16, 8), (24, 8)]
  # Single process: the whole batch.
  assert train.process_local_slice(8, 1, 0) == (0, 8)
  # Uneven splits are an error (device steps need identical shapes).
  import pytest
  with pytest.raises(ValueError, match='divisible'):
    train.process_local_slice(10, 4, 0)


def test_maybe_initialize_distributed_is_noop_without_coordinator(
    monkeypatch):
  monkeypatch.delenv('JAX_COORDINATOR_ADDRESS', raising=False)
  monkeypatch.delenv('COORDINATOR_ADDRESS', raising=False)
  assert not train.maybe_initialize_distributed()
  # With a coordinator configured, the standard initialize call is made
  # with env-derived arguments (stubbed: no real cluster in tests).
  calls = {}
  monkeypatch.setattr(
      'jax.distributed.initialize',
      lambda **kw: calls.update(kw))
  monkeypatch.setenv('COORDINATOR_ADDRESS', 'localhost:1234')
  monkeypatch.setenv('NUM_PROCESSES', '2')
  monkeypatch.setenv('PROCESS_ID', '1')
  assert train.maybe_initialize_distributed()
  assert calls == {'coordinator_address': 'localhost:1234',
                   'num_processes': 2, 'process_id': 1}


def test_synthetic_batches_shapes():
  config = tiny_data_config()
  batch = next(train.synthetic_batches(config))
  assert batch['frames'].shape == (8, 10, 8)
  assert batch['labels'].shape == (8, 3)
  assert np.all(np.asarray(batch['num_labels']) >= 1)
  assert np.all(
      np.asarray(batch['num_frames']) >= np.asarray(batch['num_labels']))


def test_train_loop_with_eval_and_resume(tmp_path):
  logs = []
  state = train.train(
      tiny_model_config(),
      tiny_data_config(),
      num_steps=4,
      workdir=str(tmp_path / 'run'),
      checkpoint_every=2,
      log_every=2,
      eval_every=2,
      log_fn=lambda s: logs.append(json.loads(s)))
  assert int(state.step) == 4
  train_events = [l for l in logs if l['event'] == 'train']
  assert train_events and all(np.isfinite(l['loss']) for l in train_events)
  assert any('eval_label_accuracy' in l for l in train_events)
  ler = [l['eval_label_error_rate'] for l in train_events
         if 'eval_label_error_rate' in l]
  assert ler and all(np.isfinite(x) and x >= 0 for x in ler)

  # Resume continues from the checkpoint.
  logs2 = []
  state2 = train.train(
      tiny_model_config(),
      tiny_data_config(),
      num_steps=6,
      workdir=str(tmp_path / 'run'),
      checkpoint_every=2,
      log_every=2,
      log_fn=lambda s: logs2.append(json.loads(s)))
  assert logs2[0] == {'event': 'restored', 'step': 4}
  assert int(state2.step) == 6


def test_train_loop_model_parallel():
  """The tensor-parallel trainer branch runs on a dp x tp virtual mesh."""
  logs = []
  state = train.train(
      tiny_model_config(),
      tiny_data_config(),
      num_steps=2,
      checkpoint_every=0,
      log_every=1,
      model_parallel=2,
      log_fn=lambda s: logs.append(json.loads(s)))
  assert int(state.step) == 2
  assert all(np.isfinite(l['loss']) for l in logs if l['event'] == 'train')


def test_train_with_bucketed_batch_iterator(tmp_path):
  """The trainer consumes a data.bucket_batches pipeline end-to-end."""
  from last_torch_tpu import data as data_lib

  rng = np.random.default_rng(0)
  cfg = tiny_model_config()

  def examples():
    while True:
      t = int(rng.integers(3, 7))
      u = int(rng.integers(1, 3))
      yield (rng.normal(size=(t, cfg.feature_size)).astype(np.float32),
             rng.integers(1, cfg.vocab_size + 1, size=(u,)).astype(
                 np.int32))

  # The CPU-mesh trainer takes the 8-device data-parallel branch, so
  # the global batch must divide across devices.
  batches = data_lib.bucket_batches(
      examples(), batch_size=8, frame_buckets=(8,), label_buckets=(4,))
  logs = []
  state = train.train(
      cfg,
      tiny_data_config(),
      num_steps=3,
      log_every=1,
      batch_iterator=batches,
      log_fn=lambda s: logs.append(json.loads(s)))
  assert int(state.step) == 3
  losses = [l['loss'] for l in logs if l['event'] == 'train']
  assert losses and all(np.isfinite(x) for x in losses)
