"""Tests for last_torch_tpu.lattices.

Ports the reference test strategy (reference ``tests/lattices_test.py``):
end-to-end sanity on random weight functions (loss finiteness patterns,
padding invariance, shortest-path invariants), exact-value correctness via
TableWeightFn under all three semirings, and — at tight tolerance, enabled
by the working custom-VJP forward-backward (SURVEY §2.2-Q3) — the revived
arc-marginals test and forward-backward vs autodiff gradient agreement.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments
from last_torch_tpu import contexts
from last_torch_tpu import semirings
from last_torch_tpu import weight_fns


def weight_fn_cacher_factory(context: contexts.FullNGram):
  return weight_fns.SharedRNNCacher(
      vocab_size=context.vocab_size,
      context_size=context.context_size,
      rnn_size=24,
      rnn_embedding_size=24)


def weight_fn_factory(context: contexts.ContextDependency):
  _, vocab_size = context.shape()
  return weight_fns.JointWeightFn(vocab_size=vocab_size, hidden_size=16)


def build_basic_lattice(alignment=None):
  return last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=2, context_size=1),
      alignment=alignment or alignments.FrameDependent(),
      weight_fn_cacher_factory=weight_fn_cacher_factory,
      weight_fn_factory=weight_fn_factory)


class TestRecognitionLatticeBasics:

  def test_call(self):
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(0)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 1])
    labels = jnp.array([[1, 1, 1, 1], [2, 2, 2, 2], [1, 2, 1, 2],
                        [2, 1, 2, 1]])
    num_labels = jnp.array([4, 3, 1, 2])
    loss = lattice(
        params,
        frames=frames,
        num_frames=num_frames,
        labels=labels,
        num_labels=num_labels)
    # More labels than frames is infeasible: +inf loss.
    npt.assert_array_equal(jnp.isfinite(loss), [True, True, True, False])

    # Padding invariance at tight tolerance (the reference needed rtol=2
    # because its weight function was nondeterministic, SURVEY §2.2-Q1).
    padded_frames = jnp.pad(frames, [(0, 0), (0, 1), (0, 0)])
    padded_labels = jnp.pad(labels, [(0, 0), (0, 2)])
    loss_padded = lattice(
        params,
        frames=padded_frames,
        num_frames=num_frames,
        labels=padded_labels,
        num_labels=num_labels)
    npt.assert_allclose(loss_padded, loss, rtol=1e-5)

    # Invalid shapes.
    with pytest.raises(
        ValueError, match='frames and num_frames have different batch_dims'):
      lattice(params, frames=frames[:1], num_frames=num_frames,
              labels=labels, num_labels=num_labels)
    with pytest.raises(
        ValueError, match='labels and num_frames have different batch_dims'):
      lattice(params, frames=frames, num_frames=num_frames,
              labels=labels[:1], num_labels=num_labels)
    with pytest.raises(
        ValueError,
        match='num_labels and num_frames have different batch_dims'):
      lattice(params, frames=frames, num_frames=num_frames, labels=labels,
              num_labels=num_labels[:1])

  def test_call_jit(self):
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(0)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (2, 4, 8))
    num_frames = jnp.array([4, 3])
    labels = jnp.array([[1, 2, 0], [2, 1, 0]])
    num_labels = jnp.array([2, 1])
    loss_fn = jax.jit(
        lambda p, f, nf, l, nl: lattice(p, f, nf, l, nl))
    loss = loss_fn(params, frames, num_frames, labels, num_labels)
    eager = lattice(params, frames, num_frames, labels, num_labels)
    npt.assert_allclose(loss, eager, rtol=1e-5)

  def test_shortest_path(self):
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(1)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 0])
    alignment_labels, num_alignment_labels, path_weights = (
        lattice.shortest_path(params, frames, num_frames))

    npt.assert_array_equal(num_alignment_labels, [6, 3, 2, 0])
    is_padding = jnp.arange(6) >= num_frames[:, None]
    # Padding positions decode to blank.
    npt.assert_array_equal(
        jnp.where(is_padding, alignment_labels, -1), [
            [-1, -1, -1, -1, -1, -1],
            [-1, -1, -1, 0, 0, 0],
            [-1, -1, 0, 0, 0, 0],
            [0, 0, 0, 0, 0, 0],
        ])
    assert np.all(np.asarray(alignment_labels) >= 0)
    assert np.all(np.asarray(alignment_labels) <= 2)
    npt.assert_array_equal(jnp.isfinite(path_weights), [True] * 4)
    # Zero-length sequence has an empty path with weight 0.
    npt.assert_array_equal(path_weights == 0,
                           [False, False, False, True])

  def test_shortest_path_reference_compat(self):
    """reference_compat=True emits the reference's raw argmax labels
    (reference ``lattices.py:244``): lexical y -> y - 1, blank stays 0."""
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(1)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 0])
    ours, n_ours, w_ours = lattice.shortest_path(params, frames, num_frames)
    ref, n_ref, w_ref = lattice.shortest_path(
        params, frames, num_frames, reference_compat=True)
    npt.assert_array_equal(n_ref, n_ours)
    npt.assert_allclose(w_ref, w_ours)
    npt.assert_array_equal(ref, jnp.where(ours == 0, 0, ours - 1))

  def test_frame_label_dependent(self):
    lattice = build_basic_lattice(
        alignments.FrameLabelDependent(max_expansions=2))
    key = jax.random.PRNGKey(2)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 1])
    labels = jnp.array([[1, 1, 1, 1], [2, 2, 2, 2], [1, 2, 1, 2],
                        [2, 1, 2, 1]])
    num_labels = jnp.array([4, 3, 4, 3])

    loss = lattice(
        params,
        frames=frames,
        num_frames=num_frames,
        labels=labels,
        num_labels=num_labels)
    # Up to 2 labels per frame: batch 3 (3 labels, 1 frame) is infeasible.
    npt.assert_array_equal(jnp.isfinite(loss), [True, True, True, False])

    alignment_labels, num_alignment_labels, path_weights = (
        lattice.shortest_path(params, frames, num_frames))
    npt.assert_array_equal(num_alignment_labels, 3 * num_frames)
    is_padding = jnp.arange(18) >= num_alignment_labels[:, None]
    npt.assert_array_equal(
        is_padding.astype(jnp.int32), [
            [0] * 18,
            [0] * 9 + [1] * 9,
            [0] * 6 + [1] * 12,
            [0] * 3 + [1] * 15,
        ])
    # Every third label slot is the trailing blank of its frame.
    npt.assert_array_equal(
        alignment_labels.reshape(4, 6, 3)[..., -1], jnp.zeros((4, 6)))
    assert np.all(np.asarray(alignment_labels) >= 0)
    assert np.all(np.asarray(alignment_labels) <= 2)
    npt.assert_array_equal(jnp.isfinite(path_weights), [True] * 4)


def build_table_lattice():
  """The exact-value test lattice (reference tests/lattices_test.py:181-206).

  B=3, T=2, V=2, bigram context of size 1 (3 context states); the arc
  weights come from a fixed table with sign alternation over frames to force
  interesting shortest paths.
  """
  batch_size, max_num_frames = 3, 2
  vocab_size, num_context_states = 2, 3

  frames = jnp.broadcast_to(
      jnp.arange(max_num_frames, dtype=jnp.float32)[None, :, None],
      (batch_size, max_num_frames, 1))
  num_frames = jnp.array([2, 1, 0])

  weight_table = 1 + jnp.arange(
      batch_size * max_num_frames * num_context_states * (1 + vocab_size),
      dtype=jnp.float32).reshape(batch_size, max_num_frames,
                                 num_context_states, 1 + vocab_size)
  signs = jnp.array([[-1, 1], [1, -1], [1, 1]],
                    jnp.float32)[:, :, None, None]
  weight_table = weight_table * signs

  lattice = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=vocab_size, context_size=1),
      alignment=alignments.FrameDependent(),
      weight_fn_factory=lambda _: weight_fns.TableWeightFn(weight_table),
      weight_fn_cacher_factory=lambda _: weight_fns.NullCacher())
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  return lattice, params, frames, num_frames


class TestRecognitionLatticeCorrectness:
  """Exact-value tests of RecognitionLattice operations."""

  def test_forward(self):
    lattice, params, frames, num_frames = build_table_lattice()
    logsumexp = lambda xs: float(np.logaddexp.reduce(np.asarray(xs)))
    for semiring, expected in [
        (semirings.MaxTropical, [-3 + 18, 21, 0]),
        (semirings.Real,
         [(-1) * (10 + 11 + 12) + (-2) * (13 + 14 + 15) +
          (-3) * (16 + 17 + 18), 19 + 20 + 21, 1]),
        (semirings.Log, [
            logsumexp([-1 + 10, -1 + 11, -1 + 12, -2 + 13, -2 + 14,
                       -2 + 15, -3 + 16, -3 + 17, -3 + 18]),
            logsumexp([19, 20, 21]), 0.
        ]),
    ]:
      actual, _ = lattice._forward(
          params=params,
          cache=None,
          frames=frames,
          num_frames=num_frames,
          semiring=semiring)
      npt.assert_allclose(actual, expected, rtol=2e-4, atol=1e-5)

  def test_shortest_path(self):
    lattice, params, frames, num_frames = build_table_lattice()
    alignment_labels, num_alignment_labels, path_weights = (
        lattice.shortest_path(params, frames, num_frames, cache=None))
    npt.assert_array_equal(num_alignment_labels, num_frames)
    npt.assert_allclose(path_weights, [-3 + 18, 21, 0])
    # Best paths: batch 0 emits label 2 then label 2 (weights -3, 18);
    # batch 1 emits label 2 (weight 21) in its single real frame; batch 2
    # has no frames. (The reference's own pins differ because its decoder
    # dropped the +1 label offset and its padding gradient was broken —
    # see lattices.py shortest_path docstring.)
    npt.assert_array_equal(alignment_labels, [
        [2, 2],
        [2, 0],
        [0, 0],
    ])

  def test_string_forward(self):
    lattice, params, frames, num_frames = build_table_lattice()
    labels = jnp.array([[1, 2, 0], [2, 1, 0], [1, 2, 0]])
    num_labels = jnp.array([1, 1, 0])
    logsumexp = lambda xs: float(np.logaddexp.reduce(np.asarray(xs)))
    for semiring, expected in [
        (semirings.MaxTropical, [max(-2 + 13, -1 + 11), 21, 0]),
        (semirings.Real, [(-1) * 11 + (-2) * 13, 21, 1]),
        (semirings.Log, [logsumexp([-1 + 11, -2 + 13]), 21, 0]),
    ]:
      actual = lattice._string_forward(
          params=params,
          cache=None,
          frames=frames,
          num_frames=num_frames,
          labels=labels,
          num_labels=num_labels,
          semiring=semiring)
      npt.assert_allclose(actual, expected, rtol=2e-4, atol=1e-5)

    # Non-reachable label counts give semiring zero.
    for semiring in [semirings.MaxTropical, semirings.Real, semirings.Log]:
      actual = lattice._string_forward(
          params=params,
          cache=None,
          frames=frames,
          num_frames=num_frames,
          labels=labels,
          num_labels=jnp.array([3, 2, 1]),
          semiring=semiring)
      npt.assert_array_equal(actual, semiring.zeros([3]))

  def test_call(self):
    lattice, params, frames, num_frames = build_table_lattice()
    labels = jnp.array([[1, 2, 0], [2, 1, 0], [1, 2, 0]])
    num_labels = jnp.array([1, 1, 0])
    logsumexp = lambda xs: float(np.logaddexp.reduce(np.asarray(xs)))
    log_loss = lattice(
        params,
        frames=frames,
        num_frames=num_frames,
        labels=labels,
        num_labels=num_labels,
        cache=None)
    npt.assert_allclose(
        log_loss, [
            logsumexp([-1 + 10, -1 + 11, -1 + 12, -2 + 13, -2 + 14, -2 + 15,
                       -3 + 16, -3 + 17, -3 + 18]) -
            logsumexp([-1 + 11, -2 + 13]),
            logsumexp([19, 20, 21]) - 21., 0.
        ],
        rtol=2e-4, atol=1e-5)

  def test_multiple_batch_dims(self):
    """Arbitrary leading batch_dims are supported (SURVEY §2.3).

    A [2, 3] batch must behave exactly like the flattened [6] batch for
    loss and shortest_path.
    """
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(9)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (2, 3, 5, 8))
    num_frames = jnp.array([[5, 3, 4], [2, 5, 3]])
    labels = jnp.array([[[1, 2], [2, 1], [1, 1]], [[2, 2], [1, 2], [2, 1]]])
    num_labels = jnp.array([[2, 1], [2, 2], [1, 2]]).T.reshape(2, 3)

    loss_2d = lattice(params, frames, num_frames, labels, num_labels)
    loss_flat = lattice(params, frames.reshape(6, 5, 8),
                        num_frames.reshape(6), labels.reshape(6, 2),
                        num_labels.reshape(6))
    npt.assert_allclose(loss_2d.reshape(6), loss_flat, rtol=1e-5)

    al2, nal2, pw2 = lattice.shortest_path(params, frames, num_frames)
    alf, nalf, pwf = lattice.shortest_path(
        params, frames.reshape(6, 5, 8), num_frames.reshape(6))
    npt.assert_array_equal(al2.reshape(6, -1), alf)
    npt.assert_array_equal(nal2.reshape(6), nalf)
    npt.assert_allclose(pw2.reshape(6), pwf, rtol=1e-5)

  def test_next_state_table_lattice_matches_full_ngram(self):
    """A lattice over NextStateTable == the same lattice over FullNGram.

    End-to-end check that the table-driven context (with the
    semiring-correct segment reduce, SURVEY §2.2-Q4) is a drop-in
    replacement in loss and decoding.
    """
    ngram = contexts.FullNGram(vocab_size=2, context_size=1)
    table = contexts.NextStateTable(ngram.next_state_table())
    key = jax.random.PRNGKey(7)

    def build(ctx):
      return last_torch_tpu.RecognitionLattice(
          context=ctx,
          alignment=alignments.FrameDependent(),
          weight_fn_cacher_factory=lambda c: weight_fns.SharedEmbCacher(
              num_context_states=c.shape()[0], embedding_size=8),
          weight_fn_factory=lambda c: weight_fns.JointWeightFn(
              vocab_size=c.shape()[1], hidden_size=8))

    lat_a, lat_b = build(ngram), build(table)
    params = lat_a.init(key, feature_size=4)
    frames = jax.random.uniform(key, (2, 5, 4))
    num_frames = jnp.array([5, 3])
    labels = jnp.array([[1, 2, 1], [2, 1, 0]])
    num_labels = jnp.array([3, 2])

    loss_a = lat_a(params, frames, num_frames, labels, num_labels)
    loss_b = lat_b(params, frames, num_frames, labels, num_labels)
    npt.assert_allclose(loss_a, loss_b, rtol=1e-5)

    dec_a = lat_a.shortest_path(params, frames, num_frames)
    dec_b = lat_b.shortest_path(params, frames, num_frames)
    npt.assert_array_equal(dec_a[0], dec_b[0])
    npt.assert_allclose(dec_a[2], dec_b[2], rtol=1e-5)

  def test_arc_marginals(self):
    """_backward marginals match autodiff of the masked _forward.

    The reference's version of this test is commented out because its
    forward-backward is broken (SURVEY §2.2-Q3; reference
    tests/lattices_test.py:290-354). Revived here at tight tolerance.
    """
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(3)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 0])
    cache = lattice.build_cache(params)

    num_context_states, vocab_size = lattice.context.shape()

    def forward(masks):
      blank_mask, lexical_mask = masks
      log_z, _ = lattice._forward(
          params=params,
          cache=cache,
          frames=frames,
          num_frames=num_frames,
          semiring=semirings.Log,
          blank_mask=[blank_mask],
          lexical_mask=[lexical_mask])
      return jnp.sum(log_z)

    blank_mask = jnp.zeros((*frames.shape[:-1], num_context_states))
    lexical_mask = jnp.zeros(
        (*frames.shape[:-1], num_context_states, vocab_size))
    expected_marginals = jax.grad(forward)((blank_mask, lexical_mask))

    def arc_marginals_callback(weight_vjp_fn, carry, blank_marginal,
                               lexical_marginals):
      del weight_vjp_fn, carry
      return None, (blank_marginal, lexical_marginals)

    log_z, alpha_history = lattice._forward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        semiring=semirings.Log)
    _, actual_marginals = lattice._backward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        log_z=log_z,
        alpha_0_to_T_minus_1=alpha_history,
        init_callback_carry=None,
        callback=arc_marginals_callback)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        actual_marginals, expected_marginals)

  def test_forward_backward(self):
    """Forward-backward value and gradients match pure autodiff.

    Tight tolerance (the reference compares at rtol=0.5 because of
    SURVEY §2.2-Q1/Q3).
    """
    lattice = build_basic_lattice()
    key = jax.random.PRNGKey(4)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (4, 6, 8))
    num_frames = jnp.array([6, 3, 2, 0])

    def autodiff_log_z(params, frames):
      cache = lattice.build_cache(params)
      log_z, _ = lattice._forward(
          params=params,
          cache=cache,
          frames=frames,
          num_frames=num_frames,
          semiring=semirings.Log)
      return jnp.sum(log_z)

    def fb_log_z(params, frames):
      cache = lattice.build_cache(params)
      return jnp.sum(
          lattice._forward_backward(
              params=params,
              cache=cache,
              frames=frames,
              num_frames=num_frames))

    expected_value = autodiff_log_z(params, frames)
    actual_value = fb_log_z(params, frames)
    npt.assert_allclose(actual_value, expected_value, rtol=1e-5)

    expected_grads = jax.grad(autodiff_log_z, argnums=(0, 1))(params, frames)
    actual_grads = jax.grad(fb_log_z, argnums=(0, 1))(params, frames)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        actual_grads, expected_grads)

  def test_loss_grad_locally_normalized(self):
    """Locally normalized loss differentiates and padding grads vanish."""
    context = contexts.FullNGram(vocab_size=2, context_size=1)
    lattice = last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=weight_fn_cacher_factory,
        weight_fn_factory=lambda c: weight_fns.LocallyNormalizedWeightFn(
            weight_fn_factory(c)))
    key = jax.random.PRNGKey(5)
    params = lattice.init(key, feature_size=8)
    frames = jax.random.uniform(key, (2, 5, 8))
    num_frames = jnp.array([5, 3])
    labels = jnp.array([[1, 2, 1], [2, 1, 0]])
    num_labels = jnp.array([3, 2])

    def mean_loss(params, frames):
      return jnp.mean(
          lattice(params, frames, num_frames, labels, num_labels))

    value, grads = jax.value_and_grad(mean_loss, argnums=(0, 1))(
        params, frames)
    assert np.isfinite(float(value))
    for leaf in jax.tree.leaves(grads):
      assert np.all(np.isfinite(np.asarray(leaf)))
    # Gradients on padding frames are zero.
    frame_grads = grads[1]
    npt.assert_array_equal(frame_grads[1, 3:], np.zeros((2, 8)))


class TestEmptyAndInfeasibleEdges:
  """Degenerate-input contract (reference SURVEY §2.3 padding rules).

  Empty label strings, zero-length utterances, and infeasible
  (num_labels > num_frames under FrameDependent) pairs must produce
  finite / zero / +inf losses respectively, and zero-length utterances
  must decode to an empty (all-blank, zero-weight) path.
  """

  def test_empty_and_infeasible_losses(self):
    lattice = build_basic_lattice()
    params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
    frames = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 5))
    labels = jnp.array([[1, 2], [1, 2], [1, 2]], jnp.int32)

    # Empty label string: finite positive loss (-log P(empty)).
    loss = lattice(params, frames, jnp.array([6, 6, 6]), labels,
                   jnp.array([0, 2, 2]))
    assert np.all(np.isfinite(np.asarray(loss)))
    assert float(loss[0]) > 0

    # Empty utterance x empty string: exactly zero loss (log P = 0).
    loss = lattice(params, frames, jnp.array([0, 6, 6]), labels,
                   jnp.array([0, 2, 2]))
    npt.assert_array_equal(np.asarray(loss[0]), 0.0)
    assert np.all(np.isfinite(np.asarray(loss)))

    # Infeasible: more labels than frames under FrameDependent -> +inf.
    loss = lattice(params, frames, jnp.array([1, 6, 6]), labels,
                   jnp.array([2, 2, 2]))
    assert np.isposinf(np.asarray(loss)[0])
    assert np.all(np.isfinite(np.asarray(loss)[1:]))

  def test_decode_zero_length_utterance(self):
    lattice = build_basic_lattice()
    params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
    frames = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 5))
    labels, num, weights = lattice.shortest_path(
        params, frames, jnp.array([0, 3, 6]))
    npt.assert_array_equal(np.asarray(num), [0, 3, 6])
    npt.assert_array_equal(np.asarray(labels[0]), np.zeros(6))
    npt.assert_array_equal(np.asarray(weights[0]), 0.0)
    assert np.all(np.isfinite(np.asarray(weights)))


def test_loss_grad_nan_free_under_debug_nans():
  """SURVEY §5 numerics guard: loss + grads run clean under jax.debug_nans.

  The Log-semiring safe-gradient contract means -inf lattice paths (padded
  frames, infeasible expansions) must produce hard zeros, never NaN, in
  every intermediate gradient.
  """
  lattice = build_basic_lattice(
      alignment=alignments.FrameLabelDependent(max_expansions=2))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5))
  labels = jnp.array([[1, 2, 1], [2, 1, 1]], jnp.int32)

  def total(params):
    return jnp.sum(lattice(params, frames, jnp.array([5, 3]), labels,
                           jnp.array([3, 2])))

  with jax.debug_nans(True):
    loss, grads = jax.jit(jax.value_and_grad(total))(params)
    jax.block_until_ready(grads)
  assert np.isfinite(float(loss))


class TestArcMarginalsAPI:
  """Public arc_marginals: autodiff parity and probability-mass sanity."""

  @pytest.mark.parametrize('alignment_factory', [
      alignments.FrameDependent,
      lambda: alignments.FrameLabelDependent(max_expansions=2),
  ])
  def test_matches_autodiff(self, alignment_factory):
    lattice = build_basic_lattice(alignment_factory())
    params = lattice.init(jax.random.PRNGKey(3), feature_size=8)
    frames = jax.random.uniform(jax.random.PRNGKey(4), (3, 5, 8))
    num_frames = jnp.array([5, 3, 0])
    cache = lattice.build_cache(params)
    num_states, vocab_size = lattice.context.shape()
    num_align = lattice.alignment.num_states()

    def forward(masks):
      blank_mask, lexical_mask = masks
      log_z, _ = lattice._forward(
          params=params, cache=cache, frames=frames, num_frames=num_frames,
          semiring=semirings.Log,
          blank_mask=[blank_mask] * num_align,
          lexical_mask=[lexical_mask] * num_align)
      return jnp.sum(log_z)

    blank_mask = jnp.zeros((*frames.shape[:-1], num_states))
    lexical_mask = jnp.zeros((*frames.shape[:-1], num_states, vocab_size))
    expected = jax.grad(forward)((blank_mask, lexical_mask))

    blank, lexical = lattice.arc_marginals(params, frames, num_frames)
    npt.assert_allclose(blank, expected[0], rtol=1e-4, atol=1e-6)
    npt.assert_allclose(lexical, expected[1], rtol=1e-4, atol=1e-6)

  def test_mass_per_frame(self):
    """FrameDependent: exactly one arc per valid frame, zero on padding."""
    lattice = build_basic_lattice()
    params = lattice.init(jax.random.PRNGKey(5), feature_size=8)
    frames = jax.random.uniform(jax.random.PRNGKey(6), (2, 6, 8))
    num_frames = jnp.array([6, 2])
    blank, lexical = lattice.arc_marginals(params, frames, num_frames)
    total = jnp.sum(blank, axis=-1) + jnp.sum(lexical, axis=(-2, -1))
    valid = np.arange(6)[None, :] < np.asarray(num_frames)[:, None]
    npt.assert_allclose(np.asarray(total), valid.astype(np.float32),
                        rtol=1e-4, atol=1e-6)

  def test_size_guard(self):
    """Oversized dense output raises actionably instead of OOMing."""
    lattice = build_basic_lattice()
    params = lattice.init(jax.random.PRNGKey(5), feature_size=8)
    frames = jax.random.uniform(jax.random.PRNGKey(6), (2, 6, 8))
    num_frames = jnp.array([6, 2])
    with pytest.raises(ValueError, match='label_marginals'):
      lattice.arc_marginals(params, frames, num_frames,
                            max_output_bytes=100)
    # An explicit larger budget unblocks the same call.
    blank, _ = lattice.arc_marginals(params, frames, num_frames,
                                     max_output_bytes=10**9)
    assert blank.shape == (2, 6, lattice.context.shape()[0])


class TestForcedAlignment:
  """RecognitionLattice.align: per-label emission frames."""

  @pytest.mark.parametrize('alignment_factory', [
      alignments.FrameDependent,
      lambda: alignments.FrameLabelDependent(max_expansions=2),
  ])
  def test_align_consistent_with_decode(self, alignment_factory):
    """Aligning the DECODED transcript reproduces the decode path."""
    lattice = build_basic_lattice(alignment_factory())
    params = lattice.init(jax.random.PRNGKey(3), feature_size=8)
    frames = jax.random.normal(jax.random.PRNGKey(4), (3, 6, 8))
    num_frames = jnp.array([6, 4, 2])

    align_labels, align_num, path_w = lattice.shortest_path(
        params, frames, num_frames)
    align_labels = np.asarray(align_labels)
    # Per-frame alignment-label layout: A slots per frame (§2.2-Q6).
    a = align_labels.shape[1] // frames.shape[1]
    # Extract the decoded transcript and each label's frame.
    batch = frames.shape[0]
    max_u = align_labels.shape[1]
    labels = np.zeros((batch, max_u), np.int32)
    want_frames = np.full((batch, max_u), -1, np.int32)
    num_labels = np.zeros((batch,), np.int32)
    for b in range(batch):
      pos = np.nonzero(align_labels[b] > 0)[0]
      labels[b, :len(pos)] = align_labels[b, pos]
      want_frames[b, :len(pos)] = pos // a
      num_labels[b] = len(pos)

    emit, scores = lattice.align(params, frames, num_frames,
                                 jnp.asarray(labels),
                                 jnp.asarray(num_labels))
    # The best constrained path scores exactly the unconstrained best
    # path (the transcript IS the unconstrained best path's transcript).
    npt.assert_allclose(np.asarray(scores), np.asarray(path_w), rtol=1e-6)
    npt.assert_array_equal(np.asarray(emit), want_frames)

  def test_align_padding_and_monotonicity(self):
    lattice = build_basic_lattice(
        alignments.FrameLabelDependent(max_expansions=2))
    params = lattice.init(jax.random.PRNGKey(5), feature_size=8)
    frames = jax.random.normal(jax.random.PRNGKey(6), (2, 5, 8))
    num_frames = jnp.array([5, 5])
    labels = jnp.array([[1, 2, 1, 0], [2, 2, 0, 0]])
    num_labels = jnp.array([3, 2])
    emit, scores = jax.jit(lattice.align)(params, frames, num_frames,
                                          labels, num_labels)
    emit = np.asarray(emit)
    assert np.all(np.isfinite(np.asarray(scores)))
    for b, n in enumerate([3, 2]):
      row = emit[b, :n]
      assert np.all(row >= 0) and np.all(row < 5)
      assert np.all(np.diff(row) >= 0)  # label order follows time
      assert np.all(emit[b, n:] == -1)

  def test_align_infeasible_is_minus_inf(self):
    lattice = build_basic_lattice()  # FrameDependent: <= 1 label/frame
    params = lattice.init(jax.random.PRNGKey(7), feature_size=8)
    frames = jax.random.normal(jax.random.PRNGKey(8), (1, 2, 8))
    emit, scores = lattice.align(params, frames, jnp.array([2]),
                                 jnp.array([[1, 2, 1]]), jnp.array([3]))
    assert np.isneginf(np.asarray(scores)[0])

  def test_align_multiple_batch_dims(self):
    lattice = build_basic_lattice()
    params = lattice.init(jax.random.PRNGKey(9), feature_size=8)
    frames = jax.random.normal(jax.random.PRNGKey(10), (2, 2, 5, 8))
    num_frames = jnp.full((2, 2), 5)
    labels = jnp.tile(jnp.array([[1, 2]]), (2, 2, 1)).reshape(2, 2, 2)
    num_labels = jnp.full((2, 2), 2)
    emit, scores = lattice.align(params, frames, num_frames, labels,
                                 num_labels)
    assert emit.shape == (2, 2, 2)
    assert scores.shape == (2, 2)
    flat_emit, flat_scores = lattice.align(
        params, frames.reshape(4, 5, 8), num_frames.reshape(4),
        labels.reshape(4, 2), num_labels.reshape(4))
    npt.assert_array_equal(np.asarray(emit).reshape(4, 2),
                           np.asarray(flat_emit))
    npt.assert_allclose(np.asarray(scores).reshape(4),
                        np.asarray(flat_scores), rtol=1e-6)
