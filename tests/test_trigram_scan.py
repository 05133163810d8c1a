"""Trigram fused forward kernel vs the XLA scan path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns
from last_torch_tpu.ops import trigram_scan


def build(vocab=4, hidden=8, emb=8, max_expansions=2):
  context = contexts.FullNGram(vocab_size=vocab, context_size=2)
  alignment = (alignments.FrameLabelDependent(max_expansions=max_expansions)
               if max_expansions else alignments.FrameDependent())
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  return lattice, params


def test_layout_covers_all_states():
  for vocab in (2, 4, 7):
    rows, p_segments, seg = trigram_scan.layout(vocab)
    num_states = 1 + vocab + vocab * vocab
    real = rows[rows < num_states]
    assert sorted(real.tolist()) == list(range(num_states))
    assert p_segments == vocab + 1
    assert seg % 8 == 0
    # Segment membership: every state in segment p has last symbol p.
    context = contexts.FullNGram(vocab_size=vocab, context_size=2)
    grid = np.asarray(rows).reshape(p_segments, seg)
    for p in range(1, p_segments):
      for state in grid[p]:
        if state >= num_states:
          continue
        # next_state from this state with any label y goes to (p, y):
        # verified via the closed-form next_state.
        for y in range(1, vocab + 1):
          dest = int(context.next_state(jnp.asarray(state), jnp.asarray(y)))
          expected = 1 + vocab + (p - 1) * vocab + (y - 1)
          assert dest == expected, (state, p, y, dest, expected)


@pytest.mark.parametrize('max_expansions', [0, 2])
def test_forward_matches_xla(max_expansions):
  vocab = 4
  lattice, params = build(vocab=vocab, max_expansions=max_expansions)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 8))
  num_frames = jnp.array([6, 4, 0])

  expected_sd, expected_hist = lattice._forward(
      params=params, cache=cache, frames=frames, num_frames=num_frames,
      semiring=semirings.Log)

  log_z, hist = trigram_scan.fused_shortest_distance_fwd(
      params['weight_fn'], cache, frames, num_frames,
      max_expansions=max_expansions,
      frame_dependent=max_expansions == 0,
      vocab=vocab,
      compute_dtype=jnp.float32,
      interpret=True)
  npt.assert_allclose(log_z, expected_sd, rtol=1e-5, atol=1e-6)
  npt.assert_allclose(hist, expected_hist, rtol=1e-5, atol=1e-6)


def test_alpha0_chaining_matches_whole_sequence():
  """Two chained half-blocks == one whole-sequence call (relay seam)."""
  vocab = 4
  lattice, params = build(vocab=vocab, max_expansions=1)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8))
  num_frames = jnp.array([8, 5])
  kw = dict(max_expansions=1, frame_dependent=False, vocab=vocab,
            compute_dtype=jnp.float32, interpret=True)

  whole, _, whole_alpha = trigram_scan.fused_shortest_distance_fwd(
      params['weight_fn'], cache, frames, num_frames,
      return_final_alpha=True, with_history=False, **kw)

  nf0 = jnp.clip(num_frames, 0, 4)
  nf1 = jnp.clip(num_frames - 4, 0, 4)
  _, _, a_mid = trigram_scan.fused_shortest_distance_fwd(
      params['weight_fn'], cache, frames[:, :4], nf0,
      return_final_alpha=True, with_history=False, **kw)
  log_z, _, a_t = trigram_scan.fused_shortest_distance_fwd(
      params['weight_fn'], cache, frames[:, 4:], nf1, alpha0=a_mid,
      return_final_alpha=True, with_history=False, **kw)
  npt.assert_allclose(log_z, whole, rtol=1e-5)
  npt.assert_allclose(a_t, whole_alpha, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('max_expansions', [0, 1, 2])
def test_log_partition_grads_match_xla(max_expansions):
  """Fused trigram kernel pair gradients == XLA autodiff (f32)."""
  vocab = 4
  lattice, params = build(vocab=vocab, max_expansions=max_expansions)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(3), (3, 5, 8))
  num_frames = jnp.array([5, 3, 0])

  def xla(wf, cache, frames):
    sd, _ = lattice._forward(
        params={'weight_fn': wf}, cache=cache, frames=frames,
        num_frames=num_frames, semiring=semirings.Log)
    return jnp.sum(sd)

  def fused(wf, cache, frames):
    return jnp.sum(trigram_scan.log_partition(
        wf, cache, frames, num_frames,
        max_expansions=max_expansions,
        frame_dependent=max_expansions == 0,
        vocab=vocab,
        compute_dtype=jnp.float32,
        interpret=True))

  wf = params['weight_fn']
  npt.assert_allclose(fused(wf, cache, frames), xla(wf, cache, frames),
                      rtol=1e-5)
  g_x = jax.grad(xla, argnums=(0, 1, 2))(wf, cache, frames)
  g_f = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
      g_f, g_x)


def test_backward_beta_chaining():
  """Two chained backward blocks (beta0 relay) == one whole block."""
  vocab = 4
  lattice, params = build(vocab=vocab, max_expansions=1)
  cache = lattice.build_cache(params)
  wf = params['weight_fn']
  frames = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 8))
  num_frames = jnp.array([6, 4])
  kw = dict(max_expansions=1, frame_dependent=False, vocab=vocab,
            compute_dtype=jnp.float32, interpret=True)

  log_z, hist, _ = trigram_scan.fused_shortest_distance_fwd(
      wf, cache, frames, num_frames, return_final_alpha=True,
      history_layout='layout', **kw)
  g = jnp.ones_like(log_z)
  dw, dc, df, _ = trigram_scan.run_fused_backward(
      wf, cache, frames, num_frames, log_z, g, hist, **kw)

  nf0 = jnp.clip(num_frames, 0, 3)
  nf1 = jnp.clip(num_frames - 3, 0, 3)
  _, h0, a_mid = trigram_scan.fused_shortest_distance_fwd(
      wf, cache, frames[:, :3], nf0, return_final_alpha=True,
      history_layout='layout', **kw)
  _, h1, _ = trigram_scan.fused_shortest_distance_fwd(
      wf, cache, frames[:, 3:], nf1, alpha0=a_mid,
      return_final_alpha=True, history_layout='layout', **kw)
  d1w, d1c, d1f, beta_mid = trigram_scan.run_fused_backward(
      wf, cache, frames[:, 3:], nf1, log_z, g, h1, **kw)
  d0w, d0c, d0f, _ = trigram_scan.run_fused_backward(
      wf, cache, frames[:, :3], nf0, log_z, g, h0, beta0=beta_mid, **kw)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
      jax.tree.map(jnp.add, d0w, d1w), dw)
  npt.assert_allclose(d0c + d1c, dc, rtol=1e-5, atol=1e-6)
  npt.assert_allclose(jnp.concatenate([d0f, d1f], axis=1), df,
                      rtol=1e-5, atol=1e-6)


def test_lattice_dispatch_trigram():
  """fused='interpret' trigram lattice loss == fused='never', incl. grads,
  and the dispatch actually takes the kernel path."""
  vocab = 4
  context = contexts.FullNGram(vocab_size=vocab, context_size=2)

  def make(fused):
    return last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameLabelDependent(max_expansions=2),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
            vocab_size=vocab, hidden_size=8),
        fused=fused)

  kernel_lattice = make('interpret')
  xla_lattice = make('never')
  params = kernel_lattice.init(jax.random.PRNGKey(0), feature_size=8)
  frames = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 8))
  num_frames = jnp.array([6, 4])
  labels = jnp.array([[1, 2, 3], [4, 1, 0]])
  num_labels = jnp.array([3, 2])

  assert kernel_lattice.would_fuse(frames)
  assert not xla_lattice.would_fuse(frames)

  def loss(lattice, params):
    return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                           labels=labels, num_labels=num_labels))

  l_k = loss(kernel_lattice, params)
  assert kernel_lattice.last_path == 'fused'
  l_x = loss(xla_lattice, params)
  npt.assert_allclose(l_k, l_x, rtol=1e-5)
  g_k = jax.grad(lambda p: loss(kernel_lattice, p))(params)
  g_x = jax.grad(lambda p: loss(xla_lattice, p))(params)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
      g_k, g_x)

  # shortest_distance forward dispatch too.
  sd_k = kernel_lattice.shortest_distance(params, frames, num_frames)
  sd_x = xla_lattice.shortest_distance(params, frames, num_frames)
  npt.assert_allclose(sd_k, sd_x, rtol=1e-5)


def test_supported_gating():
  lattice, _ = build(vocab=4)
  frames = jnp.zeros((2, 4, 8))
  assert trigram_scan.supported(lattice, semirings.Log, None, None, None,
                                frames, 'interpret')


def test_gate_dispatches_hardware_backends():
  """CI guard for the round-5 kernel-fate decision (ops/README.md): the
  whole-array trigram kernels beat XLA on v5e (1.41x+ at the probe
  config) and are ON for TPU backends; DISABLE is the escape hatch; CPU
  never dispatches (interpret mode is for tests only); tiny vocabularies
  stay on XLA (padding waste)."""
  assert trigram_scan.DISABLE is False
  lattice, _ = build(vocab=4)
  big_lattice, _ = build(vocab=16, hidden=8, emb=8)
  frames = jnp.zeros((2, 4, 8))
  # Tiny vocab: hardware backends fall back to XLA; interpret covers it.
  for backend in ('tpu', 'axon'):
    assert not trigram_scan.supported(
        lattice, semirings.Log, None, None, None, frames, backend), backend
    assert trigram_scan.supported(
        big_lattice, semirings.Log, None, None, None, frames, backend)
  try:
    trigram_scan.DISABLE = True
    for backend in ('tpu', 'axon'):
      assert not trigram_scan.supported(
          big_lattice, semirings.Log, None, None, None, frames, backend)
    assert trigram_scan.supported(
        big_lattice, semirings.Log, None, None, None, frames, 'interpret')
  finally:
    trigram_scan.DISABLE = False
  assert not trigram_scan.supported(lattice, semirings.MaxTropical, None,
                                    None, None, frames, 'interpret')
  assert not trigram_scan.supported(lattice, semirings.Log, None, None,
                                    None, frames, 'cpu')
  bigram, _ = None, None
  context = contexts.FullNGram(vocab_size=4, context_size=1)
  bigram = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=4, hidden_size=8))
  assert not trigram_scan.supported(bigram, semirings.Log, None, None,
                                    None, frames, 'interpret')


def test_batched_transpose_variant_matches(monkeypatch):
  """The gated-off BATCHED_TRANSPOSE path stays correct (values+grads).

  The flag is a measured wash on v5e (92.4 vs 91.8 ms, see the module
  comment / benchmarks/tpu_trigram_kernel_ab.py) and defaults OFF; this
  pins the alternate kernel path so the A/B stays re-runnable."""
  vocab, max_expansions = 4, 2
  lattice, params = build(vocab=vocab, max_expansions=max_expansions)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(5), (2, 4, 8))
  num_frames = jnp.array([4, 3])

  def fused(wf, cache, frames):
    return jnp.sum(trigram_scan.log_partition(
        wf, cache, frames, num_frames,
        max_expansions=max_expansions, frame_dependent=False,
        vocab=vocab, compute_dtype=jnp.float32, interpret=True))

  wf = params['weight_fn']
  assert not trigram_scan.BATCHED_TRANSPOSE  # default is OFF
  val_off = fused(wf, cache, frames)
  g_off = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  monkeypatch.setattr(trigram_scan, 'BATCHED_TRANSPOSE', True)
  val_on = fused(wf, cache, frames)
  g_on = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  npt.assert_allclose(val_on, val_off, rtol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
      g_on, g_off)


def test_stream_expansions_variant_matches(monkeypatch):
  """STREAM_EXPANSIONS (default ON) == in-kernel sweeps (values+grads).

  With the flag on, the forward streams its expansion alphas
  sweep^1..sweep^k per frame to an extra output and the backward reads
  them instead of re-deriving them with k sweeps. The two routes run
  the same sweep code on the same staged inputs, so the results are
  bit-identical; this pins the legacy in-kernel-sweeps path so the A/B
  stays re-runnable."""
  vocab, max_expansions = 4, 2
  lattice, params = build(vocab=vocab, max_expansions=max_expansions)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(11), (2, 5, 8))
  num_frames = jnp.array([5, 3])

  def fused(wf, cache, frames):
    return jnp.sum(trigram_scan.log_partition(
        wf, cache, frames, num_frames,
        max_expansions=max_expansions, frame_dependent=False,
        vocab=vocab, compute_dtype=jnp.float32, interpret=True))

  wf = params['weight_fn']
  assert trigram_scan.STREAM_EXPANSIONS  # default is ON
  val_on = fused(wf, cache, frames)
  g_on = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  monkeypatch.setattr(trigram_scan, 'STREAM_EXPANSIONS', False)
  val_off = fused(wf, cache, frames)
  g_off = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  npt.assert_allclose(val_on, val_off, rtol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
      g_on, g_off)


def test_fold_blank_variant_matches(monkeypatch):
  """FOLD_BLANK (default ON) == the two-matmul blank path (values+grads).

  The fold carries the blank head in spare lex lane `vocab` so pass A
  runs one matmul instead of two and the backward's d_vw/d_joint
  matmuls absorb d_bw / the d_blank*bw term (see the FOLD_BLANK module
  comment). This pins the legacy unfused path so the A/B stays
  re-runnable, and the exact equality of the two routes at f32."""
  vocab, max_expansions = 4, 2
  lattice, params = build(vocab=vocab, max_expansions=max_expansions)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 8))
  num_frames = jnp.array([4, 3])

  def fused(wf, cache, frames):
    return jnp.sum(trigram_scan.log_partition(
        wf, cache, frames, num_frames,
        max_expansions=max_expansions, frame_dependent=False,
        vocab=vocab, compute_dtype=jnp.float32, interpret=True))

  wf = params['weight_fn']
  assert trigram_scan.FOLD_BLANK  # default is ON
  val_on = fused(wf, cache, frames)
  g_on = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  monkeypatch.setattr(trigram_scan, 'FOLD_BLANK', False)
  val_off = fused(wf, cache, frames)
  g_off = jax.grad(fused, argnums=(0, 1, 2))(wf, cache, frames)
  npt.assert_allclose(val_on, val_off, rtol=1e-6)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
      g_on, g_off)
