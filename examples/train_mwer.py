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

"""MWER fine-tuning: minimize expected edit distance, not NLL.

The standard production recipe: train a transducer on likelihood, then
fine-tune on the metric you are actually judged by — expected label/word
error — using sequence-level discriminative training. Here that is
``gnat.risk_train_step``: EXACT i.i.d. posterior alignment paths from
``RecognitionLattice.sample_paths`` (FFBS — no n-best search bias),
scored against the reference with the batched edit distance, with the
provably unbiased REINFORCE gradient (leave-one-out baseline) and a small
interpolated NLL term keeping the posterior calibrated.

This demo trains a small bigram GNAT on likelihood, measures the label
error rate, then MWER-fine-tunes and shows both the Monte Carlo expected
edit distance and the Viterbi-decode error rate on the fine-tuning data
improving (at this toy scale — 16 fixed batches — the held-out rate is
reported for reference; generalization needs real data volume). Runs in
a few minutes on CPU::

    PYTHONPATH=/root/repo python examples/train_mwer.py
"""

import jax

# Small-model demo: run on CPU even when a TPU platform is preconfigured.
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from last_torch_tpu.models import gnat  # noqa: E402
from last_torch_tpu.models import metrics  # noqa: E402
from last_torch_tpu import risk  # noqa: E402


def synthetic_batch(rng, batch, feature, vocab, max_u=5):
  """Noisy one-hot frames, two per label; ambiguous enough to leave
  errors for MWER to clean up (label y lights feature y-1, so every
  label is separable in principle but the noise keeps the posterior
  soft)."""
  max_t = 2 * max_u
  num_labels = rng.integers(2, max_u + 1, size=(batch,))
  num_frames = 2 * num_labels
  labels = np.zeros((batch, max_u), np.int32)
  frames = rng.normal(size=(batch, max_t, feature)) * 0.45
  for b in range(batch):
    seq = rng.integers(1, vocab + 1, size=num_labels[b])
    labels[b, :num_labels[b]] = seq
    for u, y in enumerate(seq):
      frames[b, 2 * u:2 * u + 2, y - 1] += 1.0
  return (jnp.asarray(frames, jnp.float32),
          jnp.asarray(num_frames, jnp.int32),
          jnp.asarray(labels), jnp.asarray(num_labels, jnp.int32))


def label_error_rate(model, params, batches):
  state = metrics.empty_error_rate_state()
  for frames, num_frames, labels, num_labels in batches:
    aligned, _, _ = model.decode(params, frames, num_frames)
    hyp, num_hyp = risk.labels_from_alignment(aligned)
    state = metrics.update_error_rate(state, hyp, num_hyp, labels,
                                      num_labels)
  return float(metrics.error_rate(state))


def main():
  vocab, feature = 6, 8
  config = gnat.GNATConfig(
      vocab_size=vocab,
      feature_size=feature,
      context_size=1,
      encoder_size=32,
      encoder_layers=2,
      encoder_heads=2,
      encoder_ffn_size=64,
      hidden_size=32,
      embedding_size=16,
      max_expansions=1,
      locally_normalized=True)
  model = gnat.GNATModel(config)

  rng = np.random.default_rng(0)
  train_batches = [synthetic_batch(rng, 8, feature, vocab)
                   for _ in range(16)]
  eval_batches = [synthetic_batch(np.random.default_rng(99), 16, feature,
                                  vocab)]

  # Phase 1: likelihood training.
  optimizer = gnat.make_optimizer(learning_rate=3e-3, warmup_steps=20)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  nll_step = jax.jit(lambda s, *b: gnat.train_step(model, optimizer, s, *b))
  for step in range(300):
    state, loss = nll_step(state, *train_batches[step % len(train_batches)])
  ler_nll = label_error_rate(model, state.params, train_batches)
  ler_nll_eval = label_error_rate(model, state.params, eval_batches)
  print(f'after NLL training: loss {float(loss):.3f}, label error rate '
        f'{ler_nll:.3f} (held-out {ler_nll_eval:.3f})')

  # Phase 2: MWER fine-tuning on expected edit distance.
  ft_optimizer = gnat.make_optimizer(learning_rate=1e-3)
  ft_state = gnat.GNATTrainState(params=state.params,
                                 opt_state=ft_optimizer.init(state.params),
                                 step=jnp.zeros((), jnp.int32))
  risk_step = jax.jit(lambda s, k, *b: gnat.risk_train_step(
      model, ft_optimizer, s, *b, key=k, num_samples=8,
      estimator='reinforce', nll_weight=0.1))
  first_risk = None
  for step in range(300):
    key = jax.random.fold_in(jax.random.PRNGKey(1), step)
    ft_state, m = risk_step(ft_state, key,
                            *train_batches[step % len(train_batches)])
    if first_risk is None:
      first_risk = float(m['mean_risk'])
    if step % 50 == 0:
      print(f'mwer step {step:3d}  expected edit distance '
            f"{float(m['mean_risk']):.3f}  nll {float(m['nll']):.3f}")
  ler_mwer = label_error_rate(model, ft_state.params, train_batches)
  ler_mwer_eval = label_error_rate(model, ft_state.params, eval_batches)
  print(f"expected edit distance {first_risk:.3f} -> "
        f"{float(m['mean_risk']):.3f}")
  print(f'label error rate: NLL {ler_nll:.3f} -> MWER {ler_mwer:.3f} '
        f'(held-out {ler_nll_eval:.3f} -> {ler_mwer_eval:.3f})')
  # Soft checks: this is a demo, and the exact trajectory depends on the
  # PRNG bit stream (which can change across jax versions). The pinned,
  # seed-robust version of these claims lives in tests/test_risk.py.
  if not float(m['mean_risk']) < first_risk:
    print('WARNING: expected risk did not drop on this seed/config')
  if not ler_mwer <= ler_nll:
    print('WARNING: decode error rate regressed on this seed/config')


if __name__ == '__main__':
  main()
