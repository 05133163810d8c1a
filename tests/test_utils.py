"""Tests for utils (checkpointing, profiling) and weight-fn fast paths."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns
from last_torch_tpu.models import gnat
from last_torch_tpu.utils import checkpoint, profiling
from tests.test_models import tiny_config


def test_checkpoint_roundtrip(tmp_path):
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer()
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)

  mgr = checkpoint.CheckpointManager(str(tmp_path / 'ckpt'), max_to_keep=2)
  mgr.save(0, state)
  # Mutate, save again; retention keeps both.
  state2 = gnat.GNATTrainState(
      params=jax.tree.map(lambda x: x + 1, state.params),
      opt_state=state.opt_state,
      step=state.step + 1)
  mgr.save(1, state2)
  assert mgr.latest_step() == 1
  assert mgr.all_steps() == [0, 1]

  restored = mgr.restore(template=state)
  jax.tree.map(npt.assert_array_equal, restored.params, state2.params)
  assert int(restored.step) == 1

  # Restore a specific earlier step.
  restored0 = mgr.restore(template=state, step=0)
  jax.tree.map(npt.assert_array_equal, restored0.params, state.params)
  mgr.close()


def test_pytree_save_restore(tmp_path):
  tree = {'a': jnp.arange(4.0), 'b': {'c': jnp.ones((2, 3))}}
  checkpoint.save_pytree(str(tmp_path / 'tree'), tree)
  restored = checkpoint.restore_pytree(str(tmp_path / 'tree'), tree)
  jax.tree.map(npt.assert_array_equal, restored, tree)


def test_step_timer():
  timer = profiling.StepTimer(skip_first=1)
  for _ in range(4):
    with timer:
      pass
  summary = timer.summary()
  assert summary['steps'] == 3
  assert np.isfinite(summary['p50_ms'])


def test_benchmark_helper():
  fn = jax.jit(lambda x: x * 2)
  out = profiling.benchmark(fn, jnp.ones((4,)), iters=2)
  assert out['steps'] == 2


def test_expectation_shortest_distance_entropy():
  """Entropy via the Expectation semiring == brute-force path enumeration.

  For a locally normalized FrameDependent lattice, the expectation
  shortest distance with arc values -log p yields the entropy of the path
  distribution (BASELINE.md config 4 capability).
  """
  context = contexts.FullNGram(vocab_size=2, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=ctx.shape()[1],
                                   hidden_size=8)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=4)
  cache = lattice.build_cache(params)
  max_t = 3
  frames = jax.random.normal(jax.random.PRNGKey(1), (1, max_t, 4))
  num_frames = jnp.array([max_t])

  sr = semirings.LogLogExpectation
  lift = lambda w: sr.weighted(w, jnp.log(jnp.maximum(-w, 1e-30)))
  log_z, log_cost = lattice.shortest_distance(
      params, frames, num_frames, semiring=sr, weight_lift=lift)
  # Locally normalized: all paths sum to probability 1.
  npt.assert_allclose(log_z, 0.0, atol=1e-4)
  entropy = float(jnp.exp(log_cost - log_z)[0])

  # Brute force: enumerate all (blank | label)^T arc sequences.
  table = np.zeros((max_t, 3, 3))  # [t, state, arc(blank,y1,y2)]
  for t in range(max_t):
    blank, lexical = lattice.weight_fn.apply(
        params['weight_fn'], cache, frames[:, t])
    table[t, :, 0] = np.asarray(blank[0])
    table[t, :, 1:] = np.asarray(lexical[0])
  nxt = np.asarray(context.next_state_table())
  total_p, total_plogp = 0.0, 0.0
  import itertools
  for arcs in itertools.product(range(3), repeat=max_t):
    state, logp = 0, 0.0
    for t, arc in enumerate(arcs):
      logp += table[t, state, arc]
      if arc > 0:
        state = nxt[state, arc - 1]
    p = np.exp(logp)
    total_p += p
    total_plogp += p * (-logp)
  npt.assert_allclose(total_p, 1.0, rtol=1e-4)
  npt.assert_allclose(entropy, total_plogp, rtol=1e-3)


def test_label_weights_fast_path_matches_generic():
  """JointWeightFn.label_weights == the generic full-head-then-gather route.

  This is the numerator fast path used by _string_forward; both routes must
  produce identical string-forward values.
  """
  context = contexts.FullNGram(vocab_size=3, context_size=1)

  class NoFastPath(weight_fns.JointWeightFn):

    def label_weights(self, params, cache, frames, states, next_labels):
      return None

  def make(wf_cls):
    return last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: wf_cls(
            vocab_size=ctx.shape()[1], hidden_size=8))

  fast_lattice = make(weight_fns.JointWeightFn)
  slow_lattice = make(NoFastPath)
  params = fast_lattice.init(jax.random.PRNGKey(0), feature_size=4)
  cache = fast_lattice.build_cache(params)

  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
  num_frames = jnp.array([5, 3])
  labels = jnp.array([[1, 3, 2], [2, 1, 0]])
  num_labels = jnp.array([3, 2])

  for semiring in [semirings.Log, semirings.MaxTropical, semirings.Real]:
    fast = fast_lattice._string_forward(
        params=params, cache=cache, frames=frames, num_frames=num_frames,
        labels=labels, num_labels=num_labels, semiring=semiring)
    slow = slow_lattice._string_forward(
        params=params, cache=cache, frames=frames, num_frames=num_frames,
        labels=labels, num_labels=num_labels, semiring=semiring)
    npt.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)


import pytest


@pytest.mark.parametrize('normalize_fn', [weight_fns.hat_normalize,
                                          weight_fns.log_softmax_normalize])
def test_locally_normalized_label_weights_matches_generic(normalize_fn):
  """LocallyNormalizedWeightFn.label_weights == the generic route.

  The numerator-only (HAT-style) loss is the cheap training path; the fast
  path computes the per-(position, frame) normalizer once and gathers the
  label column from the same logits.
  """
  context = contexts.FullNGram(vocab_size=3, context_size=1)

  class NoFastPath(weight_fns.LocallyNormalizedWeightFn):

    def label_weights(self, params, cache, frames, states, next_labels):
      return None

  def make(wrapper_cls):
    return last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameLabelDependent(max_expansions=2),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: wrapper_cls(
            weight_fns.JointWeightFn(vocab_size=ctx.shape()[1],
                                     hidden_size=8),
            normalize=normalize_fn))

  fast_lattice = make(weight_fns.LocallyNormalizedWeightFn)
  slow_lattice = make(NoFastPath)
  params = fast_lattice.init(jax.random.PRNGKey(0), feature_size=4)

  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 4))
  num_frames = jnp.array([5, 3])
  labels = jnp.array([[1, 3, 2], [2, 1, 0]])
  num_labels = jnp.array([3, 2])

  # Sanity: the fast path actually fires for this configuration.
  cache = fast_lattice.build_cache(params)
  assert fast_lattice.weight_fn.label_weights(
      params['weight_fn'], cache, frames,
      jnp.zeros((2, 4), jnp.int32), jnp.ones((2, 4), jnp.int32)) is not None

  # Loss (numerator-only for locally normalized) and its gradients agree.
  def loss(lattice, p):
    return jnp.sum(lattice(p, frames, num_frames, labels, num_labels))

  vf, gf = jax.value_and_grad(lambda p: loss(fast_lattice, p))(params)
  vs, gs = jax.value_and_grad(lambda p: loss(slow_lattice, p))(params)
  npt.assert_allclose(vf, vs, rtol=1e-5, atol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6), gf, gs)


def test_locally_normalized_label_weights_gating():
  """Non-Joint inner weight fns and custom normalizers fall back."""
  table = jnp.zeros((2, 3, 2, 4))
  wrapped_table = weight_fns.LocallyNormalizedWeightFn(
      weight_fns.TableWeightFn(table))
  assert wrapped_table.label_weights({}, None, jnp.zeros((2, 5, 4)),
                                     jnp.zeros((2, 3), jnp.int32),
                                     jnp.ones((2, 3), jnp.int32)) is None
  custom = weight_fns.LocallyNormalizedWeightFn(
      weight_fns.JointWeightFn(vocab_size=3, hidden_size=8),
      normalize=lambda b, l: (b, l))
  assert custom.label_weights({}, None, jnp.zeros((2, 5, 4)),
                              jnp.zeros((2, 3), jnp.int32),
                              jnp.ones((2, 3), jnp.int32)) is None
