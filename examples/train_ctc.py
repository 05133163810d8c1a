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

"""CTC training: the context-free corner of the GNAT family.

``FullNGram(context_size=0)`` gives a single context state — the
lattice loses label-history conditioning and the loss specializes to a
CTC-like objective (per-frame weights independent of the output
history). Textbook CTC is this topology with ``FrameDependent``
alignment (``max_expansions=0``: each frame emits exactly one arc,
blank or label) and per-frame local normalization.

Topology note (measured, not hypothetical): with the
``FrameLabelDependent(k)`` alignment instead, a LOCALLY normalized
context-free model is probability-deficient — every emission must
co-occur with that frame's blank arc, so an emitting frame contributes
at most ``max_b (1-b)·p_y·b = 1/4`` and the achievable NLL is bounded
away from 0 (a fixed 8-sequence batch plateaus at ~4.1 nats instead of
memorizing to ~0). With ``context_size >= 1`` the context state lets
the blank probability condition on "already emitted", so FLD trains
fine; at ``context_size=0`` use ``FrameDependent`` (as here) or global
normalization.

On TPU, single-context-state lattices take the scan-free factorized
S=1 machinery (``lattices._forward_s1`` + the one-apply string-weights
fast path): one batched weight-fn application instead of T small ones
inside a sequential scan. The globally-normalized variant of this
config (``bench.py --full`` config 11, B=32 T=1600 V=1024) runs the
full loss fwd+bwd in ~8.8 ms (~5.8M frames/s/chip) on one v5e chip.

This demo trains a small Transformer-encoder CTC model on synthetic
data, checks the loss drops, and decodes with offline Viterbi. Runs in
~a minute on CPU::

    PYTHONPATH=/root/repo python examples/train_ctc.py
"""

import jax

# Small-model demo: run on CPU even when a TPU platform is preconfigured
# (environment variables are too late once jax is imported; the config
# update is the reliable switch).
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from last_torch_tpu.models import gnat  # noqa: E402
from last_torch_tpu.models import metrics  # noqa: E402


TEMPLATE = [1, 4, 2, 5, 3, 6]  # the synthetic "language": label k at
                               # position k, two frames per label


def synthetic_batch(rng, batch, feature):
  """Variable-length template prefixes whose frames one-hot-encode the
  labels (two frames per label, light noise)."""
  max_u = len(TEMPLATE)
  max_t = 2 * max_u
  num_labels = rng.integers(2, max_u + 1, size=(batch,))
  num_frames = 2 * num_labels
  labels = np.zeros((batch, max_u), np.int32)
  frames = rng.normal(size=(batch, max_t, feature)) * 0.05
  for b in range(batch):
    labels[b, :num_labels[b]] = TEMPLATE[:num_labels[b]]
    for u in range(num_labels[b]):
      frames[b, 2 * u:2 * u + 2, labels[b, u] % feature] += 1.0
  return (jnp.asarray(frames, jnp.float32),
          jnp.asarray(num_frames, jnp.int32),
          jnp.asarray(labels), jnp.asarray(num_labels, jnp.int32))


def main():
  vocab, feature = 6, 8
  config = gnat.GNATConfig(
      vocab_size=vocab,
      feature_size=feature,
      context_size=0,          # CTC topology: a single context state.
      encoder_size=32,
      encoder_layers=2,
      encoder_heads=2,
      encoder_ffn_size=64,
      hidden_size=32,
      embedding_size=16,
      max_expansions=0,          # FrameDependent: one arc per frame.
      locally_normalized=True)   # classic CTC: per-frame normalization.
  model = gnat.GNATModel(config)
  optimizer = gnat.make_optimizer(learning_rate=3e-3, warmup_steps=20)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)

  rng = np.random.default_rng(0)
  step_fn = jax.jit(
      lambda s, *b: gnat.train_step(model, optimizer, s, *b))

  first = None
  for step in range(400):
    batch = synthetic_batch(rng, batch=8, feature=feature)
    state, loss = step_fn(state, *batch)
    if first is None:
      first = float(loss)
    if step % 100 == 0:
      print(f'step {step:3d}  loss {float(loss):.3f}')
  print(f'loss {first:.3f} -> {float(loss):.3f}')
  assert float(loss) < first, 'loss must drop'

  # Offline Viterbi decode vs the references, on held-out data.
  frames, num_frames, labels, num_labels = synthetic_batch(
      np.random.default_rng(1), batch=8, feature=feature)
  alignment_labels, num_alignment_labels, _ = model.decode(
      state.params, frames, num_frames)
  print(f'decode route: {model.lattice.last_path}')
  # Lexical labels only (blank = 0), compacted per sequence.
  hyp = [[int(y) for y in row if y > 0] for row in
         np.asarray(alignment_labels)]
  ref = [list(map(int, np.asarray(labels)[b, :int(num_labels[b])]))
         for b in range(labels.shape[0])]
  max_h = max(1, max(len(h) for h in hyp))
  hyp_pad = np.zeros((len(hyp), max_h), np.int32)
  for b, h in enumerate(hyp):
    hyp_pad[b, :len(h)] = h
  num_hyp = jnp.asarray([len(h) for h in hyp], jnp.int32)
  er_state = metrics.update_error_rate(
      metrics.empty_error_rate_state(), jnp.asarray(hyp_pad), num_hyp,
      labels, num_labels)
  print(f'label error rate: '
        f'{float(metrics.error_rate(er_state)):.2f}')
  print('sample hyp vs ref:', hyp[0], 'vs', ref[0])


if __name__ == '__main__':
  main()
