# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Restartable GNAT training loop (example trainer).

The reference has no trainer, checkpointing, or metrics (SURVEY §5). This
module supplies the standard TPU-native training harness around the GNAT
model family: mesh-sharded train steps, orbax checkpoint/resume, JSON-line
metrics, and a synthetic alignment-friendly data source for smoke training
and benchmarking.

Run directly for a smoke training session:

  python -m last_torch_tpu.models.train --steps 50 --workdir /tmp/gnat_run
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from last_torch_tpu.models import gnat
from last_torch_tpu.parallel import sharding
from last_torch_tpu.utils import checkpoint as checkpoint_lib
from last_torch_tpu.utils import profiling


def maybe_initialize_distributed() -> bool:
  """Standard JAX multi-host initialization, driven by the environment.

  Calls ``jax.distributed.initialize`` when a coordinator address is
  configured (the standard ``JAX_COORDINATOR_ADDRESS`` /
  ``COORDINATOR_ADDRESS`` variables, with ``NUM_PROCESSES`` /
  ``PROCESS_ID`` when the launcher does not provide them
  automatically, e.g. outside TPU pods). On single-process runs — no
  coordinator configured — this is a no-op, so the trainer can always
  call it unconditionally.

  Returns:
    True if multi-host initialization ran.
  """
  coordinator = (os.environ.get('JAX_COORDINATOR_ADDRESS') or
                 os.environ.get('COORDINATOR_ADDRESS'))
  if not coordinator:
    return False
  if jax.distributed.is_initialized():
    # Idempotent: jax.distributed.initialize raises if called twice, and
    # the trainer may run several times in one process (train, inspect,
    # resume).
    return True
  kwargs = {'coordinator_address': coordinator}
  # Accept the conventional JAX_-prefixed launcher variables as well as
  # the bare names.
  num_processes = (os.environ.get('JAX_NUM_PROCESSES') or
                   os.environ.get('NUM_PROCESSES'))
  process_id = (os.environ.get('JAX_PROCESS_ID') or
                os.environ.get('PROCESS_ID'))
  if bool(num_processes) != bool(process_id):
    raise ValueError(
        'NUM_PROCESSES and PROCESS_ID (or their JAX_-prefixed variants) '
        'must be provided together (or both omitted for launchers that '
        f'supply them automatically); got num_processes={num_processes!r}, '
        f'process_id={process_id!r}')
  if num_processes:
    kwargs['num_processes'] = int(num_processes)
    kwargs['process_id'] = int(process_id)
  jax.distributed.initialize(**kwargs)
  return True


def process_local_slice(global_batch_size: int, num_processes: int,
                        process_index: int) -> tuple[int, int]:
  """This host's (start, size) slice of the global batch.

  Multi-host data loading is process-local in JAX: each host feeds only
  its own shard of the global batch and ``jax.make_array_from_process_
  local_data`` (or equivalent) assembles the global array. The global
  batch must divide evenly so every device step sees identical shapes.

  Args:
    global_batch_size: Total batch size across all hosts.
    num_processes: ``jax.process_count()``.
    process_index: ``jax.process_index()``.

  Returns:
    (start, size): this process's contiguous slice of the batch axis.
  """
  if global_batch_size % num_processes != 0:
    raise ValueError(
        f'global_batch_size={global_batch_size} must be divisible by '
        f'num_processes={num_processes}')
  size = global_batch_size // num_processes
  return process_index * size, size


@dataclasses.dataclass(frozen=True)
class DataConfig:
  """Synthetic data configuration.

  Frames are random features weakly correlated with the label sequence, so
  the loss is meaningfully learnable (unlike pure noise).
  """
  batch_size: int = 8
  max_num_frames: int = 48
  max_num_labels: int = 12
  feature_size: int = 80
  vocab_size: int = 32
  seed: int = 0


def synthetic_batches(config: DataConfig) -> Iterator[dict]:
  """Yields batches of (frames, num_frames, labels, num_labels)."""
  rng = np.random.default_rng(config.seed)
  # A fixed random "embedding" of labels into feature space: frames around
  # a label's embedding make the mapping learnable.
  label_emb = rng.normal(
      size=(config.vocab_size + 1, config.feature_size)).astype(np.float32)
  while True:
    num_labels = rng.integers(
        1, config.max_num_labels + 1, size=(config.batch_size,))
    num_frames = np.minimum(
        num_labels + rng.integers(
            1, config.max_num_frames // 2, size=(config.batch_size,)),
        config.max_num_frames)
    labels = np.zeros((config.batch_size, config.max_num_labels), np.int32)
    frames = np.zeros(
        (config.batch_size, config.max_num_frames, config.feature_size),
        np.float32)
    for b in range(config.batch_size):
      seq = rng.integers(1, config.vocab_size + 1, size=(num_labels[b],))
      labels[b, :num_labels[b]] = seq
      # Stretch labels over the frame axis and add noise.
      positions = np.linspace(0, num_labels[b], num_frames[b],
                              endpoint=False).astype(np.int32)
      stretched = np.concatenate([[0], seq])[np.minimum(
          positions + 1, num_labels[b])]
      frames[b, :num_frames[b]] = (
          label_emb[stretched] +
          0.5 * rng.normal(size=(num_frames[b], config.feature_size)))
    yield {
        'frames': jnp.asarray(frames),
        'num_frames': jnp.asarray(num_frames, jnp.int32),
        'labels': jnp.asarray(labels),
        'num_labels': jnp.asarray(num_labels, jnp.int32),
    }


def train(model_config: gnat.GNATConfig,
          data_config: DataConfig,
          num_steps: int = 100,
          workdir: Optional[str] = None,
          learning_rate: float = 1e-3,
          checkpoint_every: int = 50,
          log_every: int = 10,
          eval_every: int = 0,
          model_parallel: int = 1,
          seed: int = 0,
          batch_iterator: Optional[Iterator[dict]] = None,
          prefetch: int = 2,
          log_fn=print) -> gnat.GNATTrainState:
  """Trains a GNAT model; resumes from workdir checkpoints when present.

  Args (beyond the obvious): ``batch_iterator`` overrides the synthetic
  data source with any iterator of trainer batches — e.g.
  ``last_torch_tpu.data.bucket_batches(...)`` over a real corpus (it must
  yield at least ``num_steps + 1`` batches; the first is held out for
  eval). ``prefetch`` stages that many upcoming batches on-device from a
  background thread while the current step computes.

  Returns the final train state.
  """
  maybe_initialize_distributed()
  model = gnat.GNATModel(model_config)
  optimizer = gnat.make_optimizer(learning_rate=learning_rate)
  state = gnat.init_train_state(model, jax.random.PRNGKey(seed), optimizer)

  manager = None
  if workdir:
    manager = checkpoint_lib.CheckpointManager(workdir)
    if manager.latest_step() is not None:
      state = manager.restore(template=state)
      log_fn(json.dumps({'event': 'restored',
                         'step': int(manager.latest_step())}))

  if model_parallel > 1:
    from last_torch_tpu.ops import sharded_scan
    mesh = sharding.make_mesh(model_parallel=model_parallel)
    tp_interpret = sharded_scan.tp_plan(
        model.lattice, model_config.vocab_size, model_parallel,
        jax.default_backend())
    if tp_interpret is not None:
      # Vocab-sharded lattice island: per-frame Pallas reduce kernels on
      # each device's head shard, per-frame reductions over ICI.
      step_fn, shard_state = sharding.make_tp_train_step(
          model, optimizer, mesh, interpret=tp_interpret)
    else:
      # Fallback: XLA auto-partitioner (cannot split the fused Pallas
      # kernels, so the lattice takes the XLA scan path).
      model.lattice.fused = 'never'
      step_fn, shard_state = sharding.make_sharded_train_step(
          model, optimizer, mesh)
    state = shard_state(state)
    place = lambda b: sharding.shard_batch(b, mesh)
  elif len(jax.devices()) > 1:
    # Pure data parallelism: shard_map runs the loss (and its Pallas
    # kernels) per device on the local batch shard.
    mesh = sharding.make_mesh(model_parallel=1)
    step_fn = sharding.make_shard_map_train_step(model, optimizer, mesh)
    state = jax.device_put(state, sharding.replicated(mesh))
    place = lambda b: sharding.shard_batch(b, mesh)
  else:
    step_fn = jax.jit(
        lambda s, f, nf, l, nl: gnat.train_step(model, optimizer, s, f, nf,
                                                l, nl),
        donate_argnums=(0,))
    place = jax.device_put  # stage on the chip (prefetch runs it early)

  timer = profiling.StepTimer(skip_first=1)
  source = (batch_iterator if batch_iterator is not None else
            synthetic_batches(data_config))
  eval_batch = next(source)
  if prefetch:
    from last_torch_tpu import data as data_lib
    staged = data_lib.prefetch_to_device(source, size=prefetch,
                                         place=place)
  else:
    staged = (place(b) for b in source)
  decode_fn = jax.jit(lambda p, f, nf: model.decode(p, f, nf))
  start = int(state.step)
  for step in range(start, num_steps):
    batch = next(staged)
    with timer:
      state, loss = step_fn(state, batch['frames'], batch['num_frames'],
                            batch['labels'], batch['num_labels'])
      loss = float(loss)
    do_eval = eval_every and (step + 1) % eval_every == 0
    if ((log_every and (step + 1) % log_every == 0) or do_eval
        or step + 1 == num_steps):
      record = {
          'event': 'train',
          'step': step + 1,
          'loss': round(loss, 4),
          **{k: round(v, 2) for k, v in timer.summary().items()
             if k != 'steps'},
      }
      if do_eval:
        eval_params = jax.device_get(state).params
        record['eval_label_accuracy'] = round(
            label_accuracy(model, decode_fn, eval_params, eval_batch), 4)
        record['eval_label_error_rate'] = round(
            label_error_rate(model, decode_fn, eval_params, eval_batch), 4)
      log_fn(json.dumps(record))
    if manager and ((checkpoint_every and (step + 1) % checkpoint_every == 0)
                    or step + 1 == num_steps):
      manager.save(step + 1, jax.device_get(state))
  if manager:
    manager.close()
  return state


def label_accuracy(model, decode_fn, params, batch) -> float:
  """Fraction of reference labels recovered by greedy Viterbi decoding.

  Blank slots are stripped from the decoded alignment; the remaining
  lexical labels are compared position-wise against the (unpadded)
  reference sequence.
  """
  alignment_labels, _, _ = decode_fn(params, batch['frames'],
                                     batch['num_frames'])
  alignment_labels = np.asarray(alignment_labels)
  labels = np.asarray(batch['labels'])
  num_labels = np.asarray(batch['num_labels'])
  correct, total = 0, 0
  for b in range(labels.shape[0]):
    decoded = alignment_labels[b][alignment_labels[b] > 0]
    reference = labels[b, :num_labels[b]]
    n = min(len(decoded), len(reference))
    correct += int(np.sum(decoded[:n] == reference[:n]))
    total += int(len(reference))
  return correct / max(total, 1)


def label_error_rate(model, decode_fn, params, batch) -> float:
  """Corpus label error rate (Levenshtein) of greedy Viterbi decoding.

  The standard recognizer quality metric: total edit distance between the
  decoded lexical label sequences (blanks stripped from the alignment)
  and the references, over total reference labels. Uses the batched DP in
  ``models.metrics``.
  """
  from last_torch_tpu.models import metrics

  alignment_labels, _, _ = decode_fn(params, batch['frames'],
                                     batch['num_frames'])
  alignment_labels = np.asarray(alignment_labels)
  batch_size, width = alignment_labels.shape
  hyp = np.zeros((batch_size, max(width, 1)), np.int32)
  num_hyp = np.zeros((batch_size,), np.int32)
  for b in range(batch_size):
    decoded = alignment_labels[b][alignment_labels[b] > 0]
    hyp[b, :len(decoded)] = decoded
    num_hyp[b] = len(decoded)
  state = metrics.update_error_rate(
      metrics.empty_error_rate_state(), jnp.asarray(hyp),
      jnp.asarray(num_hyp), batch['labels'], batch['num_labels'])
  return float(metrics.error_rate(state))


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('--steps', type=int, default=100)
  parser.add_argument('--workdir', type=str, default=None)
  parser.add_argument('--batch-size', type=int, default=8)
  parser.add_argument('--vocab-size', type=int, default=32)
  parser.add_argument('--context-size', type=int, default=1)
  parser.add_argument('--locally-normalized', action='store_true')
  parser.add_argument('--model-parallel', type=int, default=1)
  parser.add_argument('--learning-rate', type=float, default=1e-3)
  parser.add_argument('--eval-every', type=int, default=0,
                      help='decode the eval batch every N steps and log '
                           'label accuracy')
  args = parser.parse_args(argv)

  model_config = gnat.GNATConfig(
      feature_size=80,
      vocab_size=args.vocab_size,
      context_size=args.context_size,
      locally_normalized=args.locally_normalized)
  data_config = DataConfig(
      batch_size=args.batch_size, vocab_size=args.vocab_size)
  train(model_config, data_config, num_steps=args.steps,
        workdir=args.workdir, learning_rate=args.learning_rate,
        eval_every=args.eval_every, model_parallel=args.model_parallel)


if __name__ == '__main__':
  main()
