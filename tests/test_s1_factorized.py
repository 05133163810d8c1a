"""Tests for the scan-free S=1 (single context state) factorized route.

``RecognitionLattice._forward_s1`` replaces the sequential alpha scan for
``num_context_states == 1`` lattices (CTC-topology ``context_size=0``) by
a fully parallel per-frame factorization (see its docstring). These tests
A/B the route against the generic scan (``lattice._factorize_s1 = False``)
across semirings, alignments, masks, weight_lift and weight functions.
Reference behavioral anchor: the torch reference runs context_size=0
through the same per-frame loop as every topology
(``/root/reference/last_torch/lattices.py:560-580``); values must agree
with the scan route up to float reassociation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns

VOCAB, HIDDEN, EMB = 6, 64, 8
B, T, U = 3, 9, 4


def make_lattice(alignment=None, weight_fn_factory=None):
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=0)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment or alignments.FrameLabelDependent(
          max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=EMB),
      weight_fn_factory=weight_fn_factory or (
          lambda ctx: weight_fns.JointWeightFn(
              vocab_size=VOCAB, hidden_size=HIDDEN)),
      fused='never')


@pytest.fixture
def batch():
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(B, T, HIDDEN)), jnp.float32)
  num_frames = jnp.asarray([T, T - 4, 0], jnp.int32)
  labels = jnp.asarray(rng.integers(1, VOCAB + 1, size=(B, U)), jnp.int32)
  num_labels = jnp.asarray([U, U - 2, 0], jnp.int32)
  return frames, num_frames, labels, num_labels


def _ab_forward(lattice, params, frames, num_frames, semiring, **kwargs):
  cache = lattice.build_cache(params)
  lattice._factorize_s1 = True
  d1, h1 = lattice._forward(params, cache, frames, num_frames, semiring,
                            **kwargs)
  assert lattice.last_path == 'xla-s1'
  lattice._factorize_s1 = False
  d0, h0 = lattice._forward(params, cache, frames, num_frames, semiring,
                            **kwargs)
  assert lattice.last_path == 'xla'
  lattice._factorize_s1 = True
  return (d1, h1), (d0, h0)


@pytest.mark.parametrize('semiring', [semirings.Log, semirings.Real,
                                      semirings.MaxTropical])
@pytest.mark.parametrize('alignment', [
    alignments.FrameDependent(),
    alignments.FrameLabelDependent(max_expansions=1),
    alignments.FrameLabelDependent(max_expansions=2),
])
def test_distance_and_history_match_scan(batch, semiring, alignment):
  frames, num_frames, _, _ = batch
  lattice = make_lattice(alignment=alignment)
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)
  (d1, h1), (d0, h0) = _ab_forward(lattice, params, frames, num_frames,
                                   semiring)
  np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(h1, h0, rtol=1e-5, atol=1e-5)


def test_gradients_match_scan(batch):
  frames, num_frames, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

  def log_z(params, frames):
    cache = lattice.build_cache(params)
    d, _ = lattice._forward(params, cache, frames, num_frames,
                            semirings.Log)
    return jnp.sum(d)

  lattice._factorize_s1 = True
  g1 = jax.grad(log_z, argnums=(0, 1))(params, frames)
  lattice._factorize_s1 = False
  g0 = jax.grad(log_z, argnums=(0, 1))(params, frames)
  for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_mask_gradients_match_scan(batch):
  """The mask-VJP trick (arc marginals / shortest path) stays exact."""
  frames, num_frames, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)
  cache = lattice.build_cache(params)
  num_align = lattice.alignment.num_states()
  bm = [jnp.zeros((B, T, 1)) for _ in range(num_align)]
  lm = [jnp.zeros((B, T, 1, VOCAB)) for _ in range(num_align)]

  def distance(bm, lm, semiring):
    d, _ = lattice._forward(params, cache, frames, num_frames, semiring,
                            blank_mask=bm, lexical_mask=lm)
    return jnp.sum(d)

  for semiring in (semirings.Log, semirings.MaxTropical):
    lattice._factorize_s1 = True
    g1 = jax.grad(distance, argnums=(0, 1))(bm, lm, semiring)
    lattice._factorize_s1 = False
    g0 = jax.grad(distance, argnums=(0, 1))(bm, lm, semiring)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
      np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_expectation_weight_lift_matches_scan(batch):
  """Tuple semiring + weight_lift (the entropy route) factorizes too."""
  frames, num_frames, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)
  cache = lattice.build_cache(params)
  sr = semirings.LogLogExpectation
  lift = lambda w: sr.weighted(w, jnp.log(jnp.maximum(-w, 1e-30)))

  lattice._factorize_s1 = True
  d1, _ = lattice._forward(params, cache, frames, num_frames, sr,
                           weight_lift=lift)
  assert lattice.last_path == 'xla-s1'
  lattice._factorize_s1 = False
  d0, _ = lattice._forward(params, cache, frames, num_frames, sr,
                           weight_lift=lift)
  for a, b in zip(jax.tree.leaves(d1), jax.tree.leaves(d0)):
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_table_weight_fn_matches_scan():
  """TableWeightFn pins its batch shape in apply; the vmap-over-time
  batched application must preserve its exact-gather semantics."""
  rng = np.random.default_rng(1)
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=0)
  num_input_labels = 5
  table = jnp.asarray(
      rng.normal(size=(B, num_input_labels, 1, 1 + VOCAB)), jnp.float32)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(table),
      fused='never')
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  frames = jnp.asarray(
      rng.integers(0, num_input_labels, size=(B, T, 1)), jnp.float32)
  num_frames = jnp.asarray([T, T - 2, 1], jnp.int32)
  cache = lattice.build_cache(params)

  lattice._factorize_s1 = True
  d1, h1 = lattice._forward(params, cache, frames, num_frames,
                            semirings.Log)
  lattice._factorize_s1 = False
  d0, h0 = lattice._forward(params, cache, frames, num_frames,
                            semirings.Log)
  np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-6)
  np.testing.assert_allclose(h1, h0, rtol=1e-6, atol=1e-6)


def test_loss_and_grads_match_scan(batch):
  frames, num_frames, labels, num_labels = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

  def loss(params):
    return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                           labels=labels, num_labels=num_labels))

  lattice._factorize_s1 = True
  v1, g1 = jax.value_and_grad(loss)(params)
  assert lattice.last_path == 'xla-s1'
  lattice._factorize_s1 = False
  v0, g0 = jax.value_and_grad(loss)(params)
  np.testing.assert_allclose(v1, v0, rtol=1e-6)
  # blank_b's gradient cancels structurally to zero under FLD: both
  # routes hold only rounding residue there, so normalize by the global
  # gradient scale rather than per-leaf (see CLAUDE.md parity trap).
  scale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g0))
  for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
    assert float(jnp.abs(a - b).max()) <= 1e-4 * scale


def test_shortest_path_matches_scan(batch):
  frames, num_frames, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(1), feature_size=HIDDEN)

  lattice._factorize_s1 = True
  l1, n1, w1 = lattice.shortest_path(params, frames, num_frames)
  lattice._factorize_s1 = False
  l0, n0, w0 = lattice.shortest_path(params, frames, num_frames)
  np.testing.assert_array_equal(l1, l0)
  np.testing.assert_array_equal(n1, n0)
  np.testing.assert_allclose(w1, w0, rtol=1e-5, atol=1e-5)


def test_label_marginals_match_scan(batch):
  """Exercises the alpha-history contract through ``_backward``."""
  frames, num_frames, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(2), feature_size=HIDDEN)

  lattice._factorize_s1 = True
  m1 = lattice.label_marginals(params, frames, num_frames)
  lattice._factorize_s1 = False
  m0 = lattice.label_marginals(params, frames, num_frames)
  for a, b in zip(jax.tree.leaves(m1), jax.tree.leaves(m0)):
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('normalize', ['hat', 'softmax'])
def test_locally_normalized_matches_scan(batch, normalize):
  """HAT/softmax S=1: the one-apply string-weights fast path must equal
  the per-position label_weights route, values and grads."""
  frames, num_frames, labels, num_labels = batch
  lattice = make_lattice(weight_fn_factory=lambda ctx: (
      weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=VOCAB, hidden_size=HIDDEN),
          normalize=(weight_fns.hat_normalize if normalize == 'hat' else
                     weight_fns.log_softmax_normalize))))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

  def loss(params):
    return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                           labels=labels, num_labels=num_labels))

  lattice._factorize_s1 = True
  v1, g1 = jax.value_and_grad(loss)(params)
  lattice._factorize_s1 = False
  v0, g0 = jax.value_and_grad(loss)(params)
  np.testing.assert_allclose(v1, v0, rtol=1e-5)
  scale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g0))
  for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
    assert float(jnp.abs(a - b).max()) <= 1e-4 * scale


def test_global_loss_shares_one_weight_application(batch):
  """The globally-normalized S=1 loss applies the weight fn ONCE.

  Numerator and denominator both derive from the same [B, T] blank /
  [B, T, V] lexical head outputs; ``_loss_s1`` computes them a single
  time (the piecewise route paid two applications, and XLA does not CSE
  the duplicated matmul pair across the two subgraphs)."""
  frames, num_frames, labels, num_labels = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

  calls = []
  orig_apply = weight_fns.JointWeightFn.apply
  weight_fns.JointWeightFn.apply = (
      lambda *a, **k: (calls.append(1), orig_apply(*a, **k))[1])
  try:
    jax.eval_shape(
        lambda p, f: lattice(p, f, num_frames, labels, num_labels),
        params, frames)
  finally:
    weight_fns.JointWeightFn.apply = orig_apply
  # The vmap over time traces the wrapped fn once per trace; one shared
  # application means exactly one call.
  assert len(calls) == 1, f'weight_fn.apply traced {len(calls)} times'
  assert lattice.last_path == 'xla-s1'


def test_zero_and_full_lengths(batch):
  """num_frames of 0 and T both reduce exactly as the scan does."""
  frames, _, _, _ = batch
  lattice = make_lattice()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)
  cache = lattice.build_cache(params)
  num_frames = jnp.asarray([0, T, 1], jnp.int32)
  (d1, _), (d0, _) = _ab_forward(lattice, params, frames, num_frames,
                                 semirings.Log)
  np.testing.assert_allclose(d1, d0, rtol=1e-5, atol=1e-5)
  # An all-padding batch element has exactly one path (the empty one)
  # of weight semiring-one.
  np.testing.assert_allclose(d1[0], 0.0, atol=1e-6)
