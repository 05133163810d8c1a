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

"""Interpret-mode tests for the fused numerator kernel (ops/numerator_scan).

Oracle: the XLA frame-major scan route in
``LocallyNormalizedWeightFn.label_weights`` (itself tested against the
generic per-position route), per the reference numerator-only loss
design (reference ``lattices.py:178-179``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from last_torch_tpu import alignments, contexts, weight_fns
from last_torch_tpu.ops import numerator_scan
import last_torch_tpu


@pytest.fixture
def interpret_kernel(monkeypatch):
  monkeypatch.setattr(numerator_scan, 'FORCE_INTERPRET', True)


def _make(vocab, hidden, normalize, compute_dtype=None):
  return weight_fns.LocallyNormalizedWeightFn(
      weight_fns.JointWeightFn(vocab_size=vocab, hidden_size=hidden,
                               compute_dtype=compute_dtype),
      normalize=normalize)


def _inputs(seed, batch, max_t, u1, num_states, emb, hidden, vocab):
  rng = np.random.default_rng(seed)
  cache = jnp.asarray(rng.normal(size=(num_states, emb)), jnp.float32)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)),
                       jnp.float32)
  states = jnp.asarray(rng.integers(0, num_states, size=(batch, u1)),
                       jnp.int32)
  next_labels = jnp.asarray(rng.integers(0, vocab + 1, size=(batch, u1)),
                            jnp.int32)
  return cache, frames, states, next_labels


def _routes(wfn, params, cache, frames, states, next_labels):
  kernel = wfn.label_weights(params, cache, frames, states, next_labels)
  assert kernel is not None
  disabled = numerator_scan.DISABLE
  numerator_scan.DISABLE = True
  try:
    xla = wfn.label_weights(params, cache, frames, states, next_labels)
  finally:
    numerator_scan.DISABLE = disabled
  assert xla is not None
  return kernel, xla


@pytest.mark.parametrize('normalize', [weight_fns.hat_normalize,
                                       weight_fns.log_softmax_normalize])
@pytest.mark.parametrize('u1', [3, 8])
@pytest.mark.parametrize('vocab', [128, 70])
def test_values_match_xla_route(interpret_kernel, normalize, u1, vocab):
  hidden, emb, batch, max_t, num_states = 128, 16, 2, 4, 9
  wfn = _make(vocab, hidden, normalize)
  cache, frames, states, next_labels = _inputs(
      0, batch, max_t, u1, num_states, emb, hidden, vocab)
  params = wfn.init(jax.random.PRNGKey(0), cache, frames[:, 0])
  assert numerator_scan.supported(wfn.weight_fn, cache, frames, states,
                                  next_labels)
  (bk, lk), (bx, lx) = _routes(wfn, params, cache, frames, states,
                               next_labels)
  assert bk.shape == bx.shape == (batch, u1, max_t)
  assert lk.shape == lx.shape == (batch, u1, max_t)
  np.testing.assert_allclose(bk, bx, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(lk, lx, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('normalize', [weight_fns.hat_normalize,
                                       weight_fns.log_softmax_normalize])
@pytest.mark.parametrize('batch_split', [1, 2])
def test_gradients_match_xla_route(interpret_kernel, monkeypatch, normalize,
                                   batch_split):
  # batch_split=2 pins the independent-batch-tile interleave path (a
  # measured perf wash on hardware, kept as probe machinery — see the
  # BATCH_SPLIT comment in numerator_scan.py).
  monkeypatch.setattr(numerator_scan, 'BATCH_SPLIT', batch_split)
  vocab, hidden, emb, batch, max_t, u1, num_states = 70, 128, 16, 2, 3, 5, 7
  wfn = _make(vocab, hidden, normalize)
  cache, frames, states, next_labels = _inputs(
      1, batch, max_t, u1, num_states, emb, hidden, vocab)
  params = wfn.init(jax.random.PRNGKey(1), cache, frames[:, 0])
  rng = np.random.default_rng(2)
  cb = jnp.asarray(rng.normal(size=(batch, u1, max_t)), jnp.float32)
  cl = jnp.asarray(rng.normal(size=(batch, u1, max_t)), jnp.float32)

  def loss(params, cache, frames):
    blank, lexical = wfn.label_weights(params, cache, frames, states,
                                       next_labels)
    return jnp.sum(blank * cb) + jnp.sum(lexical * cl)

  gk = jax.grad(loss, argnums=(0, 1, 2))(params, cache, frames)
  disabled = numerator_scan.DISABLE
  numerator_scan.DISABLE = True
  try:
    gx = jax.grad(loss, argnums=(0, 1, 2))(params, cache, frames)
  finally:
    numerator_scan.DISABLE = disabled
  flat_k, tree_k = jax.tree.flatten(gk)
  flat_x, tree_x = jax.tree.flatten(gx)
  assert tree_k == tree_x
  for a, b in zip(flat_k, flat_x):
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5)


def test_end_to_end_hat_loss_and_grads(interpret_kernel):
  """Full numerator-only lattice loss: kernel route equals XLA route."""
  vocab, hidden, emb = 6, 128, 8
  batch, max_t, max_u = 2, 4, 3
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=1),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=vocab, hidden_size=hidden)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  rng = np.random.default_rng(3)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)), jnp.float32)
  num_frames = jnp.asarray([max_t, max_t - 1], jnp.int32)
  labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                       jnp.int32)
  num_labels = jnp.asarray([max_u, max_u - 1], jnp.int32)

  def total(params, frames):
    return jnp.sum(lattice(params, frames, num_frames, labels, num_labels))

  vk, gk = jax.value_and_grad(total, argnums=(0, 1))(params, frames)
  disabled = numerator_scan.DISABLE
  numerator_scan.DISABLE = True
  try:
    vx, gx = jax.value_and_grad(total, argnums=(0, 1))(params, frames)
  finally:
    numerator_scan.DISABLE = disabled
  np.testing.assert_allclose(vk, vx, rtol=1e-5, atol=1e-5)
  for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
    np.testing.assert_allclose(a, b, rtol=3e-5, atol=3e-5)


def test_bf16_compute_dtype_close(interpret_kernel):
  vocab, hidden, emb, batch, max_t, u1, num_states = 128, 128, 16, 2, 3, 4, 6
  wfn = _make(vocab, hidden, weight_fns.hat_normalize,
              compute_dtype=jnp.bfloat16)
  cache, frames, states, next_labels = _inputs(
      4, batch, max_t, u1, num_states, emb, hidden, vocab)
  params = wfn.init(jax.random.PRNGKey(4), cache, frames[:, 0])

  def total(params):
    blank, lexical = wfn.label_weights(params, cache, frames, states,
                                       next_labels)
    return jnp.sum(blank) + jnp.sum(lexical)

  vk, gk = jax.value_and_grad(total)(params)
  disabled = numerator_scan.DISABLE
  numerator_scan.DISABLE = True
  try:
    vx, gx = jax.value_and_grad(total)(params)
  finally:
    numerator_scan.DISABLE = disabled
  assert abs(float(vk) - float(vx)) <= 2e-2 * max(abs(float(vx)), 1.0)
  scale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(gx))
  for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx)):
    assert float(jnp.abs(a - b).max()) <= 2e-2 * scale


def test_time_sharded_loss_composition(interpret_kernel):
  """The kernel engages inside the time-sharded relay's per-block
  _string_weights (shard_map) and still equals the single-device loss."""
  import numpy as onp
  from last_torch_tpu.parallel import sequence
  if len(jax.devices()) < 4:
    pytest.skip('needs 4 (virtual) devices')
  vocab, hidden, emb = 4, 128, 8
  batch, max_t, max_u = 2, 8, 3
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=1),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=vocab, hidden_size=hidden)),
      fused='never')
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  rng = np.random.default_rng(7)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)), jnp.float32)
  num_frames = jnp.asarray([max_t, max_t - 3], jnp.int32)
  labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                       jnp.int32)
  num_labels = jnp.asarray([max_u, max_u - 1], jnp.int32)
  mesh = jax.sharding.Mesh(onp.array(jax.devices()[:4]),
                           axis_names=('seq',))

  def single(params):
    return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                           labels=labels, num_labels=num_labels))

  def sharded(params):
    return jnp.sum(sequence.loss_time_sharded(
        lattice, params, frames, num_frames, labels, num_labels, mesh,
        'seq'))

  np.testing.assert_allclose(sharded(params), single(params), rtol=1e-5)
  gs = jax.grad(single)(params)
  gk = jax.grad(sharded)(params)
  for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gs)):
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_supported_gate():
  wfn = weight_fns.JointWeightFn(vocab_size=8, hidden_size=128)
  cache = jnp.zeros((4, 8))
  frames = jnp.zeros((2, 3, 128))
  states = jnp.zeros((2, 3), jnp.int32)
  nl = jnp.zeros((2, 3), jnp.int32)
  on_tpu = jax.default_backend() in ('tpu', 'axon')
  assert numerator_scan.supported(wfn, cache, frames, states, nl) == on_tpu
  try:
    numerator_scan.FORCE_INTERPRET = True
    assert numerator_scan.supported(wfn, cache, frames, states, nl)
    # Multi-dim batch falls back.
    assert not numerator_scan.supported(
        wfn, cache, jnp.zeros((2, 2, 3, 128)), jnp.zeros((2, 2, 3), int),
        nl)
    # Odd hidden falls back.
    wf_odd = weight_fns.JointWeightFn(vocab_size=8, hidden_size=96)
    assert not numerator_scan.supported(wf_odd, cache,
                                        jnp.zeros((2, 3, 96)), states, nl)
    # VMEM plan bound falls back.
    big = jnp.zeros((2, 4096), jnp.int32)
    wf_big = weight_fns.JointWeightFn(vocab_size=8192, hidden_size=1024)
    assert not numerator_scan.supported(
        wf_big, cache, jnp.zeros((64, 3, 1024)), big, big)
    # float32-compute at production scale spills on Mosaic (measured:
    # the backward kernel needs 131.4 MB of scoped VMEM — 91 MB of
    # register-allocator spill slots — against the chip's 128 MB at
    # B=32, U+1=101, h=512, V=1024, where the bf16 variant fits and
    # runs). The gate must reject the f32 variant there and keep the
    # bf16 production contract covered.
    states_big = jnp.zeros((32, 101), jnp.int32)
    frames_big = jnp.zeros((32, 3, 512))
    wf_f32 = weight_fns.JointWeightFn(vocab_size=1024, hidden_size=512)
    assert not numerator_scan.supported(wf_f32, cache, frames_big,
                                        states_big, states_big)
    wf_bf16 = weight_fns.JointWeightFn(
        vocab_size=1024, hidden_size=512, compute_dtype=jnp.bfloat16)
    assert numerator_scan.supported(wf_bf16, cache, frames_big,
                                    states_big, states_big)
    numerator_scan.DISABLE = True
    assert not numerator_scan.supported(wfn, cache, frames, states, nl)
  finally:
    numerator_scan.FORCE_INTERPRET = False
    numerator_scan.DISABLE = False
