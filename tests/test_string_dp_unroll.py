"""STRING_DP_UNROLL must not change numerator values or gradients.

``lattices.STRING_DP_UNROLL`` only changes how many frames XLA fuses per
while-loop trip in the ``_string_dp`` time scan (a perf knob for the
production-T scans, measured in ``benchmarks/tpu_stringdp_probe.py``);
the per-frame math order is identical, so values and gradients must match
at tight tolerance — including when the unroll does not divide T and when
it exceeds T.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, lattices, semirings
from last_torch_tpu import weight_fns

VOCAB, HIDDEN, EMB = 6, 64, 8
B, T, U = 3, 9, 4


@pytest.fixture
def batch():
  rng = np.random.default_rng(2)
  frames = jnp.asarray(rng.normal(size=(B, T, HIDDEN)), jnp.float32)
  num_frames = jnp.asarray([T, T - 4, 0], jnp.int32)
  labels = jnp.asarray(rng.integers(1, VOCAB + 1, size=(B, U)), jnp.int32)
  num_labels = jnp.asarray([U, U - 2, 0], jnp.int32)
  return frames, num_frames, labels, num_labels


@pytest.fixture(autouse=True)
def restore_unroll():
  yield
  lattices.STRING_DP_UNROLL = 1


def make_lattice(context_size):
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=context_size)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=EMB),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=VOCAB, hidden_size=HIDDEN),
      fused='never')


@pytest.mark.parametrize('context_size', [0, 1])
@pytest.mark.parametrize('unroll', [4, 7, 64])
def test_numerator_value_and_grads_invariant(batch, context_size, unroll):
  frames, num_frames, labels, num_labels = batch
  lattice = make_lattice(context_size)
  params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

  def numerator(params, frames):
    cache = lattice.build_cache(params)
    return jnp.sum(lattice._string_forward(
        params, cache, frames, num_frames, labels, num_labels,
        semirings.Log))

  lattices.STRING_DP_UNROLL = 1
  v0, g0 = jax.value_and_grad(numerator, argnums=(0, 1))(params, frames)
  lattices.STRING_DP_UNROLL = unroll
  v1, g1 = jax.value_and_grad(numerator, argnums=(0, 1))(params, frames)
  np.testing.assert_allclose(v1, v0, rtol=1e-6)
  scale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g0))
  for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
    assert float(jnp.abs(a - b).max()) <= 1e-6 * scale


@pytest.mark.parametrize('unroll', [4, 64])
def test_align_invariant(batch, unroll):
  frames, num_frames, labels, num_labels = batch
  # align() runs the MaxTropical string DP; emit frames must be identical.
  lattice = make_lattice(1)
  params = lattice.init(jax.random.PRNGKey(1), feature_size=HIDDEN)
  lattices.STRING_DP_UNROLL = 1
  emit0, w0 = lattice.align(params, frames, num_frames, labels, num_labels)
  lattices.STRING_DP_UNROLL = unroll
  emit1, w1 = lattice.align(params, frames, num_frames, labels, num_labels)
  np.testing.assert_array_equal(np.asarray(emit1), np.asarray(emit0))
  np.testing.assert_allclose(w1, w0, rtol=1e-6)
