"""Tests for the fused Pallas forward scan (interpret mode on CPU).

The fused kernel must match the XLA lax.scan path bit-for-tolerance on the
same inputs: log_z and the alpha history, with frame padding, for both
FrameDependent and FrameLabelDependent alignments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns
from last_torch_tpu.ops import fused_scan


def build(alignment, fused):
  context = contexts.FullNGram(vocab_size=4, context_size=1)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8),
      fused=fused)


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_fused_forward_matches_xla(alignment_factory):
  fused_lattice = build(alignment_factory(), fused='interpret')
  xla_lattice = build(alignment_factory(), fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(0), feature_size=6)
  cache = fused_lattice.build_cache(params)

  frames = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 6))
  num_frames = jnp.array([5, 3, 0])

  log_z_fused, hist_fused = fused_lattice._forward(
      params=params, cache=cache, frames=frames, num_frames=num_frames,
      semiring=semirings.Log)
  log_z_xla, hist_xla = xla_lattice._forward(
      params=params, cache=cache, frames=frames, num_frames=num_frames,
      semiring=semirings.Log)

  npt.assert_allclose(log_z_fused, log_z_xla, rtol=1e-5, atol=1e-6)
  npt.assert_allclose(hist_fused, hist_xla, rtol=1e-5, atol=1e-6)


def test_fused_gating():
  """The fused path must not fire for unsupported configurations."""
  from last_torch_tpu.ops import fused_scan

  lattice = build(alignments.FrameDependent(), fused='auto')
  frames3 = jnp.zeros((2, 4, 6))

  # Covered in interpret mode at any vocab; on hardware, non-lane-multiple
  # vocabularies are padded inside the kernel wrappers but tiny ones stay
  # on the (faster) XLA path.
  assert fused_scan.supported(lattice, semirings.Log, None, None, None,
                              frames3, 'interpret')
  assert not fused_scan.supported(lattice, semirings.Log, None, None, None,
                                  frames3, 'tpu')
  big = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=100, context_size=1),
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8))
  assert fused_scan.supported(big, semirings.Log, None, None, None,
                              frames3, 'tpu')
  # CPU backend: no.
  assert not fused_scan.supported(lattice, semirings.Log, None, None, None,
                                  frames3, 'cpu')
  # Tropical semiring (decode path): no.
  assert not fused_scan.supported(lattice, semirings.MaxTropical, None,
                                  None, None, frames3, 'interpret')
  # Masks (marginal/decode tricks): no.
  assert not fused_scan.supported(lattice, semirings.Log, [jnp.zeros(())],
                                  None, None, frames3, 'interpret')
  # Extra batch dims: no.
  assert not fused_scan.supported(lattice, semirings.Log, None, None, None,
                                  jnp.zeros((2, 2, 4, 6)), 'interpret')

  # Trigram context: no.
  trigram = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=4, context_size=2),
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8))
  assert not fused_scan.supported(trigram, semirings.Log, None, None, None,
                                  frames3, 'interpret')

  # Locally-normalized weight fn: no.
  ln = build(alignments.FrameDependent(), fused='auto')
  ln.weight_fn = weight_fns.LocallyNormalizedWeightFn(ln.weight_fn)
  assert not fused_scan.supported(ln, semirings.Log, None, None, None,
                                  frames3, 'interpret')


def test_last_path_reports_dispatch():
  """lattice.last_path exposes which path ('fused'/'xla') a call took."""
  fused_lattice = build(alignments.FrameDependent(), fused='interpret')
  xla_lattice = build(alignments.FrameDependent(), fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(0), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6))
  num_frames = jnp.array([4, 2])

  assert fused_lattice.last_path is None
  fused_lattice.shortest_distance(params, frames, num_frames)
  assert fused_lattice.last_path == 'fused'
  xla_lattice.shortest_distance(params, frames, num_frames)
  assert xla_lattice.last_path == 'xla'
  fused_lattice.shortest_path(params, frames, num_frames)
  assert fused_lattice.last_path == 'fused'

  # A silently-unsupported config (subclassed weight fn) reports 'xla'
  # even with fused enabled — the observability hook the gating needs.
  class MyJoint(weight_fns.JointWeightFn):
    pass

  sub = build(alignments.FrameDependent(), fused='interpret')
  sub.weight_fn = MyJoint(vocab_size=4, hidden_size=8)
  sub.shortest_distance(params, frames, num_frames)
  assert sub.last_path == 'xla'


def test_vocab_size_plans():
  """Kernel-variant planning: f32 cache -> bf16 cache -> online -> XLA."""
  # Headline config: resident f32 exp cache.
  assert fused_scan._plan(1025, 1024, 512) == ('cache', jnp.float32)
  # V=2048..6144 bigram: no cache fits (see the bf16 note in _plan);
  # vocab-tiled online kernels.
  assert fused_scan._plan(2049, 2048, 512) == ('online', None)
  assert fused_scan._plan(4097, 4096, 512) == ('online', None)
  assert fused_scan._plan(6145, 6144, 512) == ('online', None)
  # Beyond the measured online VMEM ceiling (8192 OOMs on v5e): XLA.
  assert fused_scan._plan(8193, 8192, 512) is None
  assert fused_scan._plan(16385, 16384, 2048) is None

  frames3 = jnp.zeros((2, 3, 6))
  for v in (1024, 2048, 4096):
    assert fused_scan.supported(build_vocab(v), semirings.Log, None, None,
                                None, frames3, 'tpu')
  big = build_vocab(16384, hidden=2048)
  assert not fused_scan.supported(big, semirings.Log, None, None, None,
                                  frames3, 'tpu')


def build_vocab(v, hidden=8):
  context = contexts.FullNGram(vocab_size=v, context_size=1)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=hidden))


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=1),
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_fused_backward_kernel_matches_xla(alignment_factory):
  """log_partition (fused fwd+bwd kernels) == XLA forward-backward grads."""
  fused_lattice = build(alignment_factory(), fused='interpret')
  xla_lattice = build(alignment_factory(), fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(4), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(5), (3, 5, 6))
  num_frames = jnp.array([5, 3, 0])

  def loss(lattice, params, frames):
    cache = lattice.build_cache(params)
    return jnp.sum(
        jnp.where(num_frames > 0,
                  lattice._forward_backward(
                      params=params, cache=cache, frames=frames,
                      num_frames=num_frames), 0.0))

  value_fused, grads_fused = jax.value_and_grad(
      lambda p, f: loss(fused_lattice, p, f), argnums=(0, 1))(params, frames)
  value_xla, grads_xla = jax.value_and_grad(
      lambda p, f: loss(xla_lattice, p, f), argnums=(0, 1))(params, frames)

  npt.assert_allclose(value_fused, value_xla, rtol=1e-5, atol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      grads_fused, grads_xla)


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_viterbi_kernel_matches_xla_decode(alignment_factory):
  """Kernel Viterbi forward + gather backtrace == the XLA vjp decode."""
  fused_lattice = build(alignment_factory(), fused='interpret')
  xla_lattice = build(alignment_factory(), fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(6), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(7), (3, 6, 6))
  num_frames = jnp.array([6, 4, 0])

  labels_f, num_f, weights_f = fused_lattice.shortest_path(
      params, frames, num_frames)
  labels_x, num_x, weights_x = xla_lattice.shortest_path(
      params, frames, num_frames)

  npt.assert_allclose(weights_f, weights_x, rtol=1e-5, atol=1e-6)
  npt.assert_array_equal(num_f, num_x)
  npt.assert_array_equal(labels_f, labels_x)


def test_backward_kernel_padded_vocab_long_sequence_no_nan():
  """Regression: padded-state betas must not poison the backward shifts.

  With a padded vocabulary, zero-padded context rows give FINITE blank
  weights to the padded states; left unmasked, the beta recursion grows
  them over long sequences until the max-shifts of the (padded) label
  columns overflow and the marginals turn 0*inf = NaN. Saturated
  embeddings + T=80 reproduce it.
  """
  lattice = build(alignments.FrameDependent(), fused='interpret')
  xla_lattice = build(alignments.FrameDependent(), fused='never')
  params = lattice.init(jax.random.PRNGKey(12), feature_size=6)
  params['cacher']['embedding'] = 100.0 * jnp.ones_like(
      params['cacher']['embedding'])
  params['weight_fn']['blank_b'] = jnp.asarray(-3.0)
  params['weight_fn']['vocab_b'] = -5.0 * jnp.ones_like(
      params['weight_fn']['vocab_b'])
  frames = jax.random.normal(jax.random.PRNGKey(13), (2, 80, 6))
  num_frames = jnp.array([80, 80])

  def log_z_sum(lattice, params, frames):
    cache = lattice.build_cache(params)
    return jnp.sum(lattice._forward_backward(
        params=params, cache=cache, frames=frames, num_frames=num_frames))

  value_f, grads_f = jax.value_and_grad(
      lambda p: log_z_sum(lattice, p, frames))(params)
  value_x, grads_x = jax.value_and_grad(
      lambda p: log_z_sum(xla_lattice, p, frames))(params)
  npt.assert_allclose(value_f, value_x, rtol=1e-5)
  for leaf_f, leaf_x in zip(jax.tree.leaves(grads_f),
                            jax.tree.leaves(grads_x)):
    assert np.all(np.isfinite(np.asarray(leaf_f)))
    npt.assert_allclose(leaf_f, leaf_x, rtol=1e-3, atol=1e-5)


def test_public_shortest_distance_differentiable_with_kernels():
  """grad(shortest_distance) works when the fused kernels are active."""
  lattice = build(alignments.FrameLabelDependent(max_expansions=1),
                  fused='interpret')
  params = lattice.init(jax.random.PRNGKey(10), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(11), (2, 4, 6))
  num_frames = jnp.array([4, 2])

  grads = jax.grad(lambda p: jnp.sum(
      lattice.shortest_distance(p, frames, num_frames)))(params)
  for leaf in jax.tree.leaves(grads):
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_fused_kernels_edge_shapes():
  """T=1, batch-1, and all-padding batches run and match XLA."""
  fused_lattice = build(alignments.FrameLabelDependent(max_expansions=2),
                        fused='interpret')
  xla_lattice = build(alignments.FrameLabelDependent(max_expansions=2),
                      fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(8), feature_size=6)

  for batch, max_t, nf in [(1, 1, [1]), (2, 1, [1, 0]), (1, 3, [0])]:
    frames = jax.random.normal(jax.random.PRNGKey(9), (batch, max_t, 6))
    num_frames = jnp.array(nf)
    cache = fused_lattice.build_cache(params)
    lz_f, _ = fused_lattice._forward(
        params=params, cache=cache, frames=frames, num_frames=num_frames,
        semiring=semirings.Log)
    lz_x, _ = xla_lattice._forward(
        params=params, cache=cache, frames=frames, num_frames=num_frames,
        semiring=semirings.Log)
    npt.assert_allclose(lz_f, lz_x, rtol=1e-5, atol=1e-6)

    dec_f = fused_lattice.shortest_path(params, frames, num_frames)
    dec_x = xla_lattice.shortest_path(params, frames, num_frames)
    npt.assert_array_equal(dec_f[0], dec_x[0])
    npt.assert_allclose(dec_f[2], dec_x[2], rtol=1e-5, atol=1e-6)


def test_fused_loss_end_to_end_interpret():
  """Globally-normalized loss via the fused forward (+ XLA backward)."""
  fused_lattice = build(alignments.FrameLabelDependent(max_expansions=1),
                        fused='interpret')
  xla_lattice = build(alignments.FrameLabelDependent(max_expansions=1),
                      fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(2), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 6))
  num_frames = jnp.array([4, 2])
  labels = jnp.array([[1, 2], [3, 0]])
  num_labels = jnp.array([2, 1])

  loss_fused = fused_lattice(params, frames, num_frames, labels, num_labels)
  loss_xla = xla_lattice(params, frames, num_frames, labels, num_labels)
  npt.assert_allclose(loss_fused, loss_xla, rtol=1e-5, atol=1e-6)

  # Gradients flow through the custom-VJP backward with the fused forward.
  g_fused = jax.grad(lambda p: jnp.sum(
      fused_lattice(p, frames, num_frames, labels, num_labels)))(params)
  g_xla = jax.grad(lambda p: jnp.sum(
      xla_lattice(p, frames, num_frames, labels, num_labels)))(params)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      g_fused, g_xla)


@pytest.mark.parametrize('seed,max_expansions,batch,max_t', [
    (0, None, 1, 1),
    (1, None, 3, 4),
    (2, 1, 2, 5),
    (3, 2, 1, 6),
    (4, 3, 2, 3),
    (5, 0, 2, 4),
])
def test_fuzz_kernel_pair_matches_xla(seed, max_expansions, batch, max_t):
  """Seeded sweep: loss value + all grads agree between kernels and XLA."""
  alignment = (alignments.FrameDependent() if max_expansions is None else
               alignments.FrameLabelDependent(max_expansions))
  fused_lattice = build(alignment, fused='interpret')
  xla_lattice = build(alignment, fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(seed), feature_size=6)
  rng = np.random.default_rng(seed)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, 6)) * 2.0,
                       jnp.float32)
  num_frames = jnp.asarray(rng.integers(0, max_t + 1, size=batch),
                           jnp.int32)

  def total(lattice, params, frames):
    cache = lattice.build_cache(params)
    return jnp.sum(lattice._forward_backward(params, cache, frames,
                                             num_frames))

  vf, gf = jax.value_and_grad(
      lambda p, f: total(fused_lattice, p, f), argnums=(0, 1))(
          params, frames)
  vx, gx = jax.value_and_grad(
      lambda p, f: total(xla_lattice, p, f), argnums=(0, 1))(
          params, frames)
  npt.assert_allclose(vf, vx, rtol=1e-5, atol=1e-6)
  for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gx)):
    npt.assert_allclose(a, b, rtol=2e-4, atol=1e-5)

  # Viterbi decode parity on the same lattice.
  dec_f = fused_lattice.shortest_path(params, frames, num_frames)
  dec_x = xla_lattice.shortest_path(params, frames, num_frames)
  npt.assert_array_equal(np.asarray(dec_f[0]), np.asarray(dec_x[0]))
  npt.assert_array_equal(np.asarray(dec_f[1]), np.asarray(dec_x[1]))
  npt.assert_allclose(dec_f[2], dec_x[2], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=1),
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_online_kernels_match_xla(alignment_factory):
  """Vocab-tiled online kernels (large-V mode) == XLA values and grads.

  mode='online' is forced at a small vocabulary so the interpreter-mode
  sweep stays cheap; on hardware the mode engages automatically for
  bigram vocabularies beyond the VMEM cache ceiling.
  """
  xla_lattice = build(alignment_factory(), fused='never')
  frame_dependent = isinstance(xla_lattice.alignment,
                               alignments.FrameDependent)
  params = xla_lattice.init(jax.random.PRNGKey(20), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(21), (3, 5, 6)) * 2.0
  num_frames = jnp.array([5, 3, 0])
  cache = xla_lattice.build_cache(params)
  s = xla_lattice.context.shape()[0]
  k = 0 if frame_dependent else xla_lattice.alignment.max_expansions

  # Forward values + alpha history.
  lz_online, hist_online = fused_scan.fused_shortest_distance_fwd(
      params['weight_fn'], cache, frames, num_frames,
      max_expansions=k, frame_dependent=frame_dependent,
      num_context_states=s, compute_dtype=jnp.float32, mode='online',
      interpret=True)
  lz_xla, hist_xla = xla_lattice._forward(
      params=params, cache=cache, frames=frames, num_frames=num_frames,
      semiring=semirings.Log)
  npt.assert_allclose(lz_online, lz_xla, rtol=1e-5, atol=1e-6)
  npt.assert_allclose(hist_online, hist_xla, rtol=1e-5, atol=1e-6)

  # Backward: full gradient parity through log_partition.
  def online_total(params, frames):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(fused_scan.log_partition(
        params['weight_fn'], cache, frames, num_frames,
        max_expansions=k, frame_dependent=frame_dependent,
        num_context_states=s, compute_dtype=jnp.float32, mode='online',
        interpret=True))

  def xla_total(params, frames):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(xla_lattice._forward_backward(
        params=params, cache=cache, frames=frames, num_frames=num_frames))

  vo, go = jax.value_and_grad(online_total, argnums=(0, 1))(params, frames)
  vx, gx = jax.value_and_grad(xla_total, argnums=(0, 1))(params, frames)
  npt.assert_allclose(vo, vx, rtol=1e-5, atol=1e-6)
  for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gx)):
    npt.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_label_marginals_kernel_matches_xla(alignment_factory):
  """Fused label_marginals == the XLA backward-callback route and the
  state-sum of dense arc_marginals; posteriors normalize per frame."""
  fused_lattice = build(alignment_factory(), fused='interpret')
  xla_lattice = build(alignment_factory(), fused='never')
  params = fused_lattice.init(jax.random.PRNGKey(30), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(31), (3, 5, 6)) * 1.5
  num_frames = jnp.array([5, 3, 0])

  bm_f, lm_f = fused_lattice.label_marginals(params, frames, num_frames)
  assert fused_lattice.last_path == 'fused'
  bm_x, lm_x = xla_lattice.label_marginals(params, frames, num_frames)
  assert xla_lattice.last_path == 'xla'
  npt.assert_allclose(bm_f, bm_x, rtol=1e-4, atol=1e-6)
  npt.assert_allclose(lm_f, lm_x, rtol=1e-4, atol=1e-6)

  # Consistency with the dense posteriors.
  bm_d, lm_d = xla_lattice.arc_marginals(params, frames, num_frames)
  npt.assert_allclose(np.asarray(lm_d).sum(axis=-2), lm_x, rtol=1e-5,
                      atol=1e-6)
  npt.assert_allclose(bm_d, bm_x, rtol=1e-5, atol=1e-6)

  # FrameDependent: exactly one arc per valid frame.
  if isinstance(fused_lattice.alignment, alignments.FrameDependent):
    total = np.asarray(bm_f).sum(-1) + np.asarray(lm_f).sum(-1)
    valid = np.arange(5)[None, :] < np.asarray(num_frames)[:, None]
    npt.assert_allclose(total[valid], 1.0, rtol=1e-4)
    npt.assert_allclose(total[~valid], 0.0, atol=1e-6)


@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_online_kernels_multi_tile_match_xla(alignment_factory):
  """Online kernels at a MULTI-tile configuration == XLA values and grads.

  vocab=520 pads to 640 lanes = 5 vocab tiles, and 1+640 states pad to
  768 = 6 state tiles, so both fori_loop sweeps run several iterations —
  the single-tile test above cannot catch tile-indexing bugs (scatter /
  assembly / pair-scratch misalignment), which would otherwise only
  surface on hardware at production vocabularies.
  """
  vocab, hidden = 520, 16
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  xla_lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment_factory(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden),
      fused='never')
  frame_dependent = isinstance(xla_lattice.alignment,
                               alignments.FrameDependent)
  k = 0 if frame_dependent else xla_lattice.alignment.max_expansions
  params = xla_lattice.init(jax.random.PRNGKey(40), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(41), (2, 3, 6))
  num_frames = jnp.array([3, 2])
  s = xla_lattice.context.shape()[0]

  def online_total(params, frames):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(fused_scan.log_partition(
        params['weight_fn'], cache, frames, num_frames,
        max_expansions=k, frame_dependent=frame_dependent,
        num_context_states=s, compute_dtype=jnp.float32, mode='online',
        interpret=True))

  def xla_total(params, frames):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(xla_lattice._forward_backward(
        params=params, cache=cache, frames=frames, num_frames=num_frames))

  vo, go = jax.value_and_grad(online_total, argnums=(0, 1))(params, frames)
  vx, gx = jax.value_and_grad(xla_total, argnums=(0, 1))(params, frames)
  npt.assert_allclose(vo, vx, rtol=1e-5, atol=1e-6)
  for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gx)):
    npt.assert_allclose(a, b, rtol=2e-3, atol=1e-5)


def test_online_kernels_padded_vocab_long_sequence_no_nan():
  """The online backward shares the padded-state beta guard."""
  xla_lattice = build(alignments.FrameLabelDependent(max_expansions=1),
                      fused='never')
  params = xla_lattice.init(jax.random.PRNGKey(12), feature_size=6)
  params['cacher']['embedding'] = 100.0 * jnp.ones_like(
      params['cacher']['embedding'])
  params['weight_fn']['blank_b'] = jnp.asarray(-3.0)
  frames = jax.random.normal(jax.random.PRNGKey(13), (2, 60, 6))
  num_frames = jnp.array([60, 40])
  s = xla_lattice.context.shape()[0]

  def online_total(params):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(fused_scan.log_partition(
        params['weight_fn'], cache, frames, num_frames,
        max_expansions=1, frame_dependent=False,
        num_context_states=s, compute_dtype=jnp.float32, mode='online',
        interpret=True))

  def xla_total(params):
    cache = xla_lattice.build_cache(params)
    return jnp.sum(xla_lattice._forward_backward(
        params=params, cache=cache, frames=frames, num_frames=num_frames))

  vo, go = jax.value_and_grad(online_total)(params)
  vx, gx = jax.value_and_grad(xla_total)(params)
  npt.assert_allclose(vo, vx, rtol=1e-5)
  for a, b in zip(jax.tree.leaves(go), jax.tree.leaves(gx)):
    assert np.all(np.isfinite(np.asarray(a)))
    npt.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize('normalize_fn',
                         [weight_fns.hat_normalize,
                          weight_fns.log_softmax_normalize])
@pytest.mark.parametrize('alignment_factory', [
    alignments.FrameDependent,
    lambda: alignments.FrameLabelDependent(max_expansions=2),
])
def test_viterbi_kernel_locally_normalized(normalize_fn, alignment_factory):
  """In-kernel hat / log-softmax normalization matches the XLA decode."""
  def build_local(fused):
    context = contexts.FullNGram(vocab_size=4, context_size=1)
    return last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignment_factory(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
            weight_fns.JointWeightFn(vocab_size=ctx.shape()[1],
                                     hidden_size=8),
            normalize=normalize_fn),
        fused=fused)

  fused_lattice = build_local('interpret')
  xla_lattice = build_local('never')
  params = fused_lattice.init(jax.random.PRNGKey(0), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(7), (3, 6, 6)) * 2.0
  num_frames = jnp.array([6, 4, 0])

  dec_f = fused_lattice.shortest_path(params, frames, num_frames)
  dec_x = xla_lattice.shortest_path(params, frames, num_frames)
  npt.assert_array_equal(np.asarray(dec_f[0]), np.asarray(dec_x[0]))
  npt.assert_array_equal(np.asarray(dec_f[1]), np.asarray(dec_x[1]))
  npt.assert_allclose(dec_f[2], dec_x[2], rtol=1e-5, atol=1e-6)


def test_stream_expansions_variant_matches(monkeypatch):
  """STREAM_EXPANSIONS (default ON) == in-kernel replay (values+grads).

  With the flag on, the forward streams expand(sweep_reduce)^1..k of
  alpha per frame to k extra outputs and the backward reads them
  instead of replaying the sweeps from its rebuilt E cache. Both routes
  run the same ops on the same staged inputs, so results are
  bit-identical; this pins the legacy replay path so the hardware A/B
  (benchmarks/tpu_bigram_kernel_ab.py) stays re-runnable."""
  lattice = build(alignments.FrameLabelDependent(max_expansions=2),
                  fused='interpret')
  params = lattice.init(jax.random.PRNGKey(3), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(9), (3, 5, 6))
  num_frames = jnp.array([5, 3, 0])
  labels = jnp.array([[1, 2, 3], [2, 1, 0], [0, 0, 0]], jnp.int32)
  num_labels = jnp.array([3, 2, 0])

  def loss(params, frames):
    return jnp.sum(lattice.loss(params, frames, num_frames, labels,
                                num_labels))

  assert fused_scan.STREAM_EXPANSIONS  # default is ON
  val_on = loss(params, frames)
  g_on = jax.grad(loss, argnums=(0, 1))(params, frames)
  monkeypatch.setattr(fused_scan, 'STREAM_EXPANSIONS', False)
  val_off = loss(params, frames)
  g_off = jax.grad(loss, argnums=(0, 1))(params, frames)
  npt.assert_allclose(val_on, val_off, rtol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
      g_on, g_off)


def test_stream_marginals_variant_matches(monkeypatch):
  """STREAM_MARGINALS (default OFF, a measured ~1% hardware loss) ==
  the in-kernel replay marginals, exactly — pins both routes so the
  A/B stays re-runnable."""
  lattice = build(alignments.FrameLabelDependent(max_expansions=2),
                  fused='interpret')
  params = lattice.init(jax.random.PRNGKey(3), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(9), (3, 5, 6))
  num_frames = jnp.array([5, 3, 0])

  assert not fused_scan.STREAM_MARGINALS  # default is OFF
  bm_off, lm_off = lattice.label_marginals(params, frames, num_frames)
  monkeypatch.setattr(fused_scan, 'STREAM_MARGINALS', True)
  bm_on, lm_on = lattice.label_marginals(params, frames, num_frames)
  npt.assert_allclose(bm_on, bm_off, rtol=1e-6, atol=1e-7)
  npt.assert_allclose(lm_on, lm_off, rtol=1e-6, atol=1e-7)
