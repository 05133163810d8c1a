"""The scan-free cumulative string DP must match the sequential scan.

``lattices.STRING_DP_CUMULATIVE`` routes the Log-semiring string DP
through per-label-position closed forms (cumsum + cumlogsumexp over
time) instead of a T-step ``lax.scan``. Values, gradients, the
infeasible == -inf contract, and the relay entry points
(alpha0/t_offset/final_gather) must all be preserved up to float
reassociation. Reference behavioral anchor: the torch reference's
string forward (``/root/reference/last_torch/lattices.py:250-377``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, lattices, semirings
from last_torch_tpu import weight_fns

VOCAB, HIDDEN, EMB = 6, 32, 8
B, T, U = 3, 11, 4


def make_lattice(alignment=None, context_size=1):
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=context_size)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment or alignments.FrameLabelDependent(
          max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=EMB),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=VOCAB, hidden_size=HIDDEN),
      fused='never')


@pytest.fixture
def weights():
  rng = np.random.default_rng(0)
  bw = jnp.asarray(rng.normal(size=(T, B, U + 1)), jnp.float32)
  lw = jnp.asarray(rng.normal(size=(T, B, U + 1)), jnp.float32)
  num_frames = jnp.asarray([T, T - 5, 0], jnp.int32)
  num_labels = jnp.asarray([U, U - 2, 0], jnp.int32)
  return bw, lw, num_frames, num_labels


def run_dp(lattice, cumulative, *args, **kwargs):
  lattices.STRING_DP_CUMULATIVE = cumulative
  try:
    return lattice._string_dp(*args, **kwargs)
  finally:
    lattices.STRING_DP_CUMULATIVE = False


@pytest.mark.parametrize('alignment', [
    alignments.FrameDependent(),
    alignments.FrameLabelDependent(max_expansions=1),
    alignments.FrameLabelDependent(max_expansions=2),
    alignments.FrameLabelDependent(max_expansions=3),
])
def test_values_and_grads_match_scan(weights, alignment):
  bw, lw, num_frames, num_labels = weights
  lattice = make_lattice(alignment=alignment)

  def dist(bw, lw, cumulative):
    return jnp.sum(run_dp(lattice, cumulative, bw, lw, num_frames,
                          num_labels, semirings.Log))

  v1, g1 = jax.value_and_grad(dist, argnums=(0, 1))(bw, lw, True)
  v0, g0 = jax.value_and_grad(dist, argnums=(0, 1))(bw, lw, False)
  np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-5)
  for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_infeasible_is_exactly_minus_inf(weights):
  """More labels than k * frames allow: the scan yields -inf, and the
  cumulative route must restore its finite sentinel to exactly -inf."""
  bw, lw, _, _ = weights
  lattice = make_lattice()  # k=2
  num_frames = jnp.asarray([1, 1, 0], jnp.int32)
  num_labels = jnp.asarray([4, 3, 1], jnp.int32)  # all infeasible
  for cumulative in (False, True):
    d = run_dp(lattice, cumulative, bw, lw, num_frames, num_labels,
               semirings.Log)
    assert np.all(np.isneginf(np.asarray(d))), (cumulative, d)


def test_grads_have_no_nans_on_infeasible(weights):
  bw, lw, _, _ = weights
  lattice = make_lattice()
  num_frames = jnp.asarray([1, 1, 0], jnp.int32)
  num_labels = jnp.asarray([4, 3, 1], jnp.int32)

  def dist(bw):
    d = run_dp(lattice, True, bw, lw, num_frames, num_labels,
               semirings.Log)
    return jnp.sum(jnp.where(jnp.isfinite(d), d, 0.0))

  g = jax.grad(dist)(bw)
  assert np.isfinite(np.asarray(g)).all()


def test_padding_gradients_are_zero(weights):
  bw, lw, num_frames, num_labels = weights

  lattice = make_lattice()

  def dist(bw, lw):
    return jnp.sum(run_dp(lattice, True, bw, lw, num_frames, num_labels,
                          semirings.Log))

  gb, gl = jax.grad(dist, argnums=(0, 1))(bw, lw)
  # Batch element 1 has T-5 frames; weights at t >= T-5 are padding.
  assert float(jnp.abs(gb[T - 5:, 1]).max()) == 0.0
  assert float(jnp.abs(gl[T - 5:, 1]).max()) == 0.0
  # Batch element 2 has zero frames.
  assert float(jnp.abs(gb[:, 2]).max()) == 0.0
  assert float(jnp.abs(gl[:, 2]).max()) == 0.0


def test_relay_contract_alpha0_t_offset(weights):
  """Two chained half-blocks must equal the monolithic DP, flag on."""
  bw, lw, num_frames, num_labels = weights
  lattice = make_lattice()
  cut = T // 2

  def chained(cumulative):
    alpha_mid = run_dp(lattice, cumulative, bw[:cut], lw[:cut],
                       num_frames, num_labels, semirings.Log,
                       final_gather=False)
    return run_dp(lattice, cumulative, bw[cut:], lw[cut:], num_frames,
                  num_labels, semirings.Log, alpha0=alpha_mid,
                  t_offset=cut)

  mono = run_dp(lattice, True, bw, lw, num_frames, num_labels,
                semirings.Log)
  np.testing.assert_allclose(chained(True), mono, rtol=1e-5, atol=1e-5)
  np.testing.assert_allclose(chained(False), mono, rtol=1e-5, atol=1e-5)


def test_full_loss_matches_scan_route():
  """End-to-end: bigram HAT numerator + S=1 global loss, flag on/off."""
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(B, T, HIDDEN)), jnp.float32)
  num_frames = jnp.asarray([T, T - 5, 0], jnp.int32)
  labels = jnp.asarray(rng.integers(1, VOCAB + 1, size=(B, U)), jnp.int32)
  num_labels = jnp.asarray([U, U - 2, 0], jnp.int32)

  for context_size in (0, 1):
    lattice = make_lattice(context_size=context_size)
    params = lattice.init(jax.random.PRNGKey(0), feature_size=HIDDEN)

    def loss(params, cumulative):
      lattices.STRING_DP_CUMULATIVE = cumulative
      try:
        return jnp.sum(lattice(params, frames, num_frames, labels,
                               num_labels))
      finally:
        lattices.STRING_DP_CUMULATIVE = False

    v1, g1 = jax.value_and_grad(loss)(params, True)
    v0, g0 = jax.value_and_grad(loss)(params, False)
    np.testing.assert_allclose(v1, v0, rtol=1e-5)
    scale = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(g0))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
      assert float(jnp.abs(a - b).max()) <= 1e-4 * scale


def test_single_frame_and_single_position():
  """Degenerate shapes: T=1, and U+1 smaller than the expansion order."""
  rng = np.random.default_rng(2)
  lattice = make_lattice()  # k=2 > U
  bw = jnp.asarray(rng.normal(size=(1, B, 1)), jnp.float32)
  lw = jnp.asarray(rng.normal(size=(1, B, 1)), jnp.float32)
  nf = jnp.asarray([1, 1, 0], jnp.int32)
  nl = jnp.zeros((B,), jnp.int32)
  d1 = run_dp(lattice, True, bw, lw, nf, nl, semirings.Log)
  d0 = run_dp(lattice, False, bw, lw, nf, nl, semirings.Log)
  np.testing.assert_allclose(d1, d0, rtol=1e-6, atol=1e-6)


def test_non_log_semirings_fall_back_to_scan(weights):
  """MaxTropical (one-hot tie-broken grads) must keep the scan route."""
  bw, lw, num_frames, num_labels = weights
  lattice = make_lattice()
  d1 = run_dp(lattice, True, bw, lw, num_frames, num_labels,
              semirings.MaxTropical)
  d0 = run_dp(lattice, False, bw, lw, num_frames, num_labels,
              semirings.MaxTropical)
  np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
