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

"""End-to-end production-shaped training pipeline on synthetic data.

Demonstrates the full framework surface in one runnable script:

1. a length-bucketed input pipeline with device prefetch
   (``last_torch_tpu.data``) over variable-length synthetic utterances;
2. a streaming-Conformer GNAT preset trained with warmup + gradient
   accumulation (``models.presets`` / ``models.gnat``);
3. corpus label-error-rate evaluation with the batched edit-distance
   metrics (``models.metrics``), using the ``valid`` mask for the padded
   final batch;
4. forced alignment of the references (``RecognitionLattice.align``).

Runs in ~a minute on CPU::

    PYTHONPATH=/root/repo python examples/train_full_pipeline.py
"""

import os

import jax

# Small-model demo: run on CPU even when a TPU platform is preconfigured
# (environment variables are too late once jax is imported; the config
# update is the reliable switch).
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from last_torch_tpu import data  # noqa: E402
from last_torch_tpu.models import gnat, metrics, presets  # noqa: E402


VOCAB, FEATURE = 6, 8
TEMPLATE = [1, 4, 2, 5, 3, 6]  # the synthetic "language": label k at
                               # position k, two frames per label


def synthetic_examples(rng, count=None):
  """Variable-length utterances whose frames encode their labels."""
  n = 0
  while count is None or n < count:
    num_labels = int(rng.integers(2, len(TEMPLATE) + 1))
    labels = np.asarray(TEMPLATE[:num_labels], np.int32)
    t = 2 * num_labels
    frames = np.zeros((t, FEATURE), np.float32)
    for u, y in enumerate(labels):
      frames[2 * u:2 * u + 2, y % FEATURE] = 1.0
    frames += 0.05 * rng.normal(size=frames.shape).astype(np.float32)
    yield frames, labels
    n += 1


def main():
  config = presets.streaming_conformer_gnat(
      vocab_size=VOCAB, feature_size=FEATURE, encoder_size=32,
      encoder_layers=2, encoder_heads=2, encoder_ffn_size=64,
      hidden_size=32, embedding_size=32, max_expansions=1,
      locally_normalized=True, encoder_window=8, encoder_conv_kernel=3)
  model = gnat.GNATModel(config)
  optimizer = gnat.make_optimizer(learning_rate=3e-3, warmup_steps=20,
                                  total_steps=400, accumulate_steps=2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  step = jax.jit(lambda s, *b: gnat.train_step(model, optimizer, s, *b))

  rng = np.random.default_rng(0)
  batches = data.prefetch_to_device(
      data.bucket_batches(synthetic_examples(rng), batch_size=8,
                          frame_buckets=(8, 12),
                          label_buckets=(4, 6)),
      size=2)
  num_micro_steps = 400
  for i, batch in enumerate(batches):
    if i >= num_micro_steps:
      break
    state, loss = step(state, batch['frames'], batch['num_frames'],
                       batch['labels'], batch['num_labels'])
    if (i + 1) % 80 == 0:
      print(f'micro-step {i + 1}: loss {float(loss):.3f}')

  # Corpus label error rate on held-out data, padded-final-batch masked.
  decode = jax.jit(lambda p, f, nf: model.decode(p, f, nf))
  er_state = metrics.empty_error_rate_state()
  eval_rng = np.random.default_rng(1)
  for batch in data.bucket_batches(
      synthetic_examples(eval_rng, count=33), batch_size=8,
      frame_buckets=(8, 12), label_buckets=(4, 6), pad_final=True):
    alignment_labels, _, _ = decode(state.params, batch['frames'],
                                    batch['num_frames'])
    alignment_labels = np.asarray(alignment_labels)
    hyp = np.zeros_like(alignment_labels)
    num_hyp = np.zeros((hyp.shape[0],), np.int32)
    for b in range(hyp.shape[0]):
      dec = alignment_labels[b][alignment_labels[b] > 0]
      hyp[b, :len(dec)] = dec
      num_hyp[b] = len(dec)
    er_state = metrics.update_error_rate(
        er_state, jnp.asarray(hyp), jnp.asarray(num_hyp),
        batch['labels'], batch['num_labels'],
        valid=batch.get('valid'))
  ler = float(metrics.error_rate(er_state))
  print(f'eval: {int(er_state.num_sequences)} utterances, '
        f'label error rate {ler:.2%}')

  # Forced alignment of one reference: label u should sit near frame 2u+1
  # (each label spans two frames).
  frames, labels = next(synthetic_examples(np.random.default_rng(2)))
  emit, scores = model.lattice.align(
      state.params['lattice'],
      model.encoder.apply(state.params['encoder'],
                          jnp.asarray(frames)[None], jnp.array([len(frames)])),
      jnp.array([len(frames)]), jnp.asarray(labels)[None],
      jnp.array([len(labels)]))
  print('forced alignment (label -> frame):',
        {int(y): int(t) for y, t in zip(labels, np.asarray(emit)[0])},
        f'score {float(scores[0]):.2f}')
  assert ler < 0.5, 'training should beat chance on this synthetic task'
  print('PIPELINE OK')


if __name__ == '__main__':
  main()
