"""Golden-value parity against the actual PyTorch reference.

Builds the identical deterministic TableWeightFn lattice in both frameworks
(the reference mounted read-only at /root/reference) and compares the
shortest-distance and string-forward values under all three semirings, and
the globally-normalized loss. This exercises the reference's working code
paths only (its forward-backward and several components are broken — see
SURVEY §2.2 — so the loss comparison uses numerator/denominator parts
directly).
"""

import sys

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns

torch = pytest.importorskip('torch')
sys.path.insert(0, '/root/reference')
last_torch = pytest.importorskip('last_torch')


# (context_size, max_expansions): bigram/FrameDependent (the minimum
# slice), TRIGRAM/FrameDependent (7 states), and bigram/FLD(2).
CONFIGS = [(1, 0), (2, 0), (1, 2)]


@pytest.fixture(scope='module', params=CONFIGS,
                ids=[f'ctx{c}_k{k}' for c, k in CONFIGS])
def workload(request):
  context_size, max_expansions = request.param
  vocab = 2
  num_states = sum(vocab**i for i in range(context_size + 1))
  batch, max_t = 3, 2
  table = (1 + np.arange(batch * max_t * num_states * (1 + vocab)).reshape(
      batch, max_t, num_states, 1 + vocab)).astype(np.float32)
  table *= np.array([[-1, 1], [1, -1], [1, 1]],
                    np.float32)[:, :, None, None]
  table *= 0.25  # keep Real-semiring products in range at 7 states
  frames = np.broadcast_to(
      np.arange(max_t, dtype=np.float32)[None, :, None],
      (batch, max_t, 1)).copy()
  num_frames = np.array([2, 1, 0])
  labels = np.array([[1, 2, 0], [2, 1, 0], [1, 2, 0]])
  num_labels = np.array([1, 1, 0])
  return dict(table=table, frames=frames, num_frames=num_frames,
              labels=labels, num_labels=num_labels,
              context_size=context_size, max_expansions=max_expansions)


def _alignment(mod, k):
  return (mod.FrameLabelDependent(max_expansions=k) if k
          else mod.FrameDependent())


def build_ours(workload):
  lattice = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=2,
                                 context_size=workload['context_size']),
      alignment=_alignment(alignments, workload['max_expansions']),
      weight_fn_factory=lambda _: weight_fns.TableWeightFn(
          jnp.asarray(workload['table'])),
      weight_fn_cacher_factory=lambda _: weight_fns.NullCacher())
  import jax
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  return lattice, params


def build_reference(workload):
  return last_torch.RecognitionLattice(
      context=last_torch.contexts.FullNGram(
          vocab_size=2, context_size=workload['context_size']),
      alignment=_alignment(last_torch.alignments,
                           workload['max_expansions']),
      weight_fn_factory=lambda _: last_torch.weight_fns.TableWeightFn(
          torch.tensor(workload['table'])),
      weight_fn_cacher_factory=lambda _: last_torch.weight_fns.NullCacher())


@pytest.mark.parametrize('semiring_name', ['Real', 'Log', 'MaxTropical'])
def test_forward_matches_reference(workload, semiring_name):
  ours, params = build_ours(workload)
  ref = build_reference(workload)

  ref_value, _ = ref._forward(
      cache=None,
      frames=torch.tensor(workload['frames']),
      num_frames=torch.tensor(workload['num_frames'].astype(np.float32)),
      semiring=getattr(last_torch.semirings, semiring_name))
  our_value, _ = ours._forward(
      params=params,
      cache=None,
      frames=jnp.asarray(workload['frames']),
      num_frames=jnp.asarray(workload['num_frames']),
      semiring=getattr(semirings, semiring_name))
  npt.assert_allclose(np.asarray(our_value), ref_value.detach().numpy(),
                      rtol=1e-5)


@pytest.mark.parametrize('semiring_name', ['Real', 'Log', 'MaxTropical'])
def test_string_forward_matches_reference(workload, semiring_name):
  ours, params = build_ours(workload)
  ref = build_reference(workload)

  ref_value = ref._string_forward(
      cache=None,
      frames=torch.tensor(workload['frames']),
      num_frames=torch.tensor(workload['num_frames'].astype(np.float32)),
      labels=torch.tensor(workload['labels'].astype(np.float32)),
      num_labels=torch.tensor(workload['num_labels'].astype(np.float32)),
      semiring=getattr(last_torch.semirings, semiring_name))
  our_value = ours._string_forward(
      params=params,
      cache=None,
      frames=jnp.asarray(workload['frames']),
      num_frames=jnp.asarray(workload['num_frames']),
      labels=jnp.asarray(workload['labels']),
      num_labels=jnp.asarray(workload['num_labels']),
      semiring=getattr(semirings, semiring_name))
  npt.assert_allclose(np.asarray(our_value), ref_value.detach().numpy(),
                      rtol=1e-5)


def _random_workload(seed):
  """Random fuzz case: context order, alignment order, vocab, shapes and
  ragged/zero lengths all drawn from the seed."""
  rng = np.random.default_rng(seed)
  context_size = int(rng.integers(0, 3))     # 0, 1, 2
  max_expansions = int(rng.integers(0, 3))   # 0 = FrameDependent
  vocab = int(rng.integers(2, 4))
  batch = int(rng.integers(1, 4))
  max_t = int(rng.integers(1, 5))
  max_u = int(rng.integers(1, 4))
  num_states = sum(vocab**i for i in range(context_size + 1))
  input_vocab = max_t  # frame t looks up input label t
  table = rng.normal(size=(batch, input_vocab, num_states,
                           1 + vocab)).astype(np.float32) * 0.5
  frames = np.broadcast_to(
      np.arange(max_t, dtype=np.float32)[None, :, None],
      (batch, max_t, 1)).copy()
  num_frames = rng.integers(0, max_t + 1, size=(batch,))
  labels = rng.integers(1, vocab + 1, size=(batch, max_u))
  num_labels = rng.integers(0, max_u + 1, size=(batch,))
  return dict(table=table, frames=frames,
              num_frames=num_frames.astype(np.int64),
              labels=labels.astype(np.int64),
              num_labels=num_labels.astype(np.int64),
              context_size=context_size, max_expansions=max_expansions,
              vocab=vocab)


def _build_ours_fuzz(workload, table):
  return last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=workload['vocab'],
                                 context_size=workload['context_size']),
      alignment=_alignment(alignments, workload['max_expansions']),
      weight_fn_factory=lambda _: weight_fns.TableWeightFn(table),
      weight_fn_cacher_factory=lambda _: weight_fns.NullCacher())


def _build_reference_fuzz(workload, table):
  return last_torch.RecognitionLattice(
      context=last_torch.contexts.FullNGram(
          vocab_size=workload['vocab'],
          context_size=workload['context_size']),
      alignment=_alignment(last_torch.alignments,
                           workload['max_expansions']),
      weight_fn_factory=lambda _: last_torch.weight_fns.TableWeightFn(
          table),
      weight_fn_cacher_factory=lambda _: last_torch.weight_fns.NullCacher())


# ---------------------------------------------------------------------
# Reference defect Q7 (discovered by this fuzz, round 4): the reference's
# Log-semiring autograd is broken in two independent ways.
#
# 1. ``_LogSumExp.backward(ctx, grad, e_, z_)`` (reference
#    ``semirings.py:298-303``) uses ``e_``/``z_`` — the incoming
#    cotangents of its *auxiliary outputs* (always materialized zeros,
#    since only output 0 is consumed) — instead of ``ctx.saved_tensors``.
#    Every gradient through ``Log.sum`` is therefore identically zero:
#    lexical-arc gradients through ``FullNGram.forward_reduce`` vanish.
# 2. ``_LogAddExp.backward(ctx, grad)`` (reference ``semirings.py:267``)
#    declares a single grad argument while its forward returns two
#    outputs whose second (the ``(ea, eb, z)`` tuple) joins the autograd
#    graph — backward then raises ``TypeError: takes 2 positional
#    arguments but 3 were given`` (e.g. FrameDependent at context 2).
#
# The documented intent is the reference's own safe-gradient contract
# (``semirings.py:222-241``). The shims below implement exactly that
# contract in torch; Log-gradient parity is asserted against the SHIMMED
# reference, and the defects themselves are pinned by
# ``test_reference_log_gradient_defects`` so a reference fix would
# surface here.
# ---------------------------------------------------------------------


class _SafeLogAddExp(torch.autograd.Function):

  @staticmethod
  def forward(ctx, a, b):
    c = torch.maximum(a, b)
    c0 = torch.where(torch.isfinite(c), c, torch.zeros_like(c))
    ea = torch.exp(a - c0)
    eb = torch.exp(b - c0)
    z = ea + eb
    ctx.save_for_backward(ea, eb, z)
    return c0 + torch.log(z)

  @staticmethod
  def backward(ctx, grad):
    ea, eb, z = ctx.saved_tensors
    z = torch.where(z != 0, z, torch.ones_like(z))
    scale = grad / z
    return scale * ea, scale * eb


class _SafeLogSumExp(torch.autograd.Function):

  @staticmethod
  def forward(ctx, a, dim):
    c = torch.max(a, dim=dim, keepdim=True).values
    c0 = torch.where(torch.isfinite(c), c, torch.zeros_like(c))
    e = torch.exp(a - c0)
    z = torch.sum(e, dim=dim, keepdim=True)
    ctx.save_for_backward(e, z)
    ctx.dim = dim
    return torch.squeeze(c0, dim=dim) + torch.log(
        torch.squeeze(z, dim=dim))

  @staticmethod
  def backward(ctx, grad):
    e, z = ctx.saved_tensors
    z = torch.where(z != 0, z, torch.ones_like(z))
    return torch.unsqueeze(grad, dim=ctx.dim) / z * e, None


@pytest.fixture
def fixed_reference_log(monkeypatch):
  """Patches the reference's Log autograd to its own documented contract."""
  monkeypatch.setattr(
      last_torch.semirings, '_logaddexp',
      lambda a, b: (_SafeLogAddExp.apply(a, b), None))
  monkeypatch.setattr(
      last_torch.semirings, '_logsumexp',
      lambda a, dim: (_SafeLogSumExp.apply(a, dim), None, None))


def test_reference_log_gradient_defects():
  """Pins defect Q7 so a reference-side fix becomes visible here."""
  a = torch.tensor([0.5, 1.0], requires_grad=True)
  r = last_torch.semirings.Log.sum(a, dim=0)
  r.backward()
  # Defect 1: Log.sum gradients are identically zero (should be softmax).
  npt.assert_array_equal(a.grad.detach().numpy(), np.zeros(2))
  # Defect 2: Log.plus backward crashes when the aux tuple outputs join
  # the autograd graph (both operands require grad).
  b = torch.tensor([0.3, -0.2], requires_grad=True)
  c = torch.tensor([0.1, 0.4], requires_grad=True)
  with pytest.raises(TypeError, match='positional arguments'):
    last_torch.semirings.Log.plus(b, c).sum().backward()


class TestRandomizedFuzzAgainstReference:
  """>= 20 randomized cases x 3 semirings against the torch reference:
  values for both DPs, and first-order gradients w.r.t. the weight table
  (Real against raw reference autograd; Log against the reference with
  its documented safe-gradient contract restored — see Q7 above)."""

  SEEDS = list(range(10))

  @pytest.mark.parametrize('seed', SEEDS)
  @pytest.mark.parametrize('semiring_name', ['Real', 'Log', 'MaxTropical'])
  def test_values(self, seed, semiring_name):
    w = _random_workload(seed)
    ours = _build_ours_fuzz(w, jnp.asarray(w['table']))
    import jax
    params = ours.init(jax.random.PRNGKey(0), feature_size=1)
    ref = _build_reference_fuzz(w, torch.tensor(w['table']))

    ref_fwd, _ = ref._forward(
        cache=None,
        frames=torch.tensor(w['frames']),
        num_frames=torch.tensor(w['num_frames'].astype(np.float32)),
        semiring=getattr(last_torch.semirings, semiring_name))
    our_fwd, _ = ours._forward(
        params=params, cache=None,
        frames=jnp.asarray(w['frames']),
        num_frames=jnp.asarray(w['num_frames']),
        semiring=getattr(semirings, semiring_name))
    npt.assert_allclose(np.asarray(our_fwd), ref_fwd.detach().numpy(),
                        rtol=1e-5, atol=1e-6)

    ref_str = ref._string_forward(
        cache=None,
        frames=torch.tensor(w['frames']),
        num_frames=torch.tensor(w['num_frames'].astype(np.float32)),
        labels=torch.tensor(w['labels'].astype(np.float32)),
        num_labels=torch.tensor(w['num_labels'].astype(np.float32)),
        semiring=getattr(last_torch.semirings, semiring_name))
    our_str = ours._string_forward(
        params=params, cache=None,
        frames=jnp.asarray(w['frames']),
        num_frames=jnp.asarray(w['num_frames']),
        labels=jnp.asarray(w['labels']),
        num_labels=jnp.asarray(w['num_labels']),
        semiring=getattr(semirings, semiring_name))
    npt.assert_allclose(np.asarray(our_str), ref_str.detach().numpy(),
                        rtol=1e-5, atol=1e-6)

  @pytest.mark.parametrize('seed', SEEDS)
  @pytest.mark.parametrize('semiring_name', ['Real', 'Log'])
  def test_forward_gradients(self, seed, semiring_name, request):
    """d(shortest distance)/d(table) == reference autograd."""
    import jax
    if semiring_name == 'Log':
      request.getfixturevalue('fixed_reference_log')
    w = _random_workload(seed)

    def our_value(table):
      lattice = _build_ours_fuzz(w, table)
      params = {'weight_fn': {}, 'weight_fn_cacher': {}}
      value, _ = lattice._forward(
          params=params, cache=None,
          frames=jnp.asarray(w['frames']),
          num_frames=jnp.asarray(w['num_frames']),
          semiring=getattr(semirings, semiring_name))
      return jnp.sum(jnp.where(jnp.isfinite(value), value, 0.0))

    our_grad = jax.grad(our_value)(jnp.asarray(w['table']))

    table_t = torch.tensor(w['table'], requires_grad=True)
    ref = _build_reference_fuzz(w, table_t)
    value, _ = ref._forward(
        cache=None,
        frames=torch.tensor(w['frames']),
        num_frames=torch.tensor(w['num_frames'].astype(np.float32)),
        semiring=getattr(last_torch.semirings, semiring_name))
    torch.sum(torch.where(torch.isfinite(value), value,
                          torch.zeros_like(value))).backward()
    npt.assert_allclose(np.asarray(our_grad),
                        table_t.grad.detach().numpy(),
                        rtol=1e-4, atol=1e-6)

  @pytest.mark.parametrize('seed', SEEDS)
  @pytest.mark.parametrize('semiring_name', ['Real', 'Log'])
  def test_string_forward_gradients(self, seed, semiring_name, request):
    """d(string forward)/d(table) == reference autograd (feasible rows;
    infeasible rows are masked identically on both sides and exercise the
    safe-gradient contract: -inf values contribute exactly zero grad)."""
    import jax
    if semiring_name == 'Log':
      request.getfixturevalue('fixed_reference_log')
    w = _random_workload(seed)

    def our_value(table):
      lattice = _build_ours_fuzz(w, table)
      params = {'weight_fn': {}, 'weight_fn_cacher': {}}
      value = lattice._string_forward(
          params=params, cache=None,
          frames=jnp.asarray(w['frames']),
          num_frames=jnp.asarray(w['num_frames']),
          labels=jnp.asarray(w['labels']),
          num_labels=jnp.asarray(w['num_labels']),
          semiring=getattr(semirings, semiring_name))
      return jnp.sum(jnp.where(jnp.isfinite(value), value, 0.0))

    our_grad = jax.grad(our_value)(jnp.asarray(w['table']))

    table_t = torch.tensor(w['table'], requires_grad=True)
    ref = _build_reference_fuzz(w, table_t)
    value = ref._string_forward(
        cache=None,
        frames=torch.tensor(w['frames']),
        num_frames=torch.tensor(w['num_frames'].astype(np.float32)),
        labels=torch.tensor(w['labels'].astype(np.float32)),
        num_labels=torch.tensor(w['num_labels'].astype(np.float32)),
        semiring=getattr(last_torch.semirings, semiring_name))
    torch.sum(torch.where(torch.isfinite(value), value,
                          torch.zeros_like(value))).backward()
    ref_grad = (table_t.grad.detach().numpy()
                if table_t.grad is not None
                else np.zeros_like(w['table']))
    npt.assert_allclose(np.asarray(our_grad), ref_grad,
                        rtol=1e-4, atol=1e-6)


def test_loss_matches_reference_parts(workload):
  """Globally-normalized loss == reference denominator - numerator.

  (The reference's own loss entry point crashes in its unfinished
  forward-backward, SURVEY §2.2-Q3, so the comparison composes its working
  pieces.)
  """
  ours, params = build_ours(workload)
  ref = build_reference(workload)

  ref_den, _ = ref._forward(
      cache=None,
      frames=torch.tensor(workload['frames']),
      num_frames=torch.tensor(workload['num_frames'].astype(np.float32)),
      semiring=last_torch.semirings.Log)
  ref_num = ref._string_forward(
      cache=None,
      frames=torch.tensor(workload['frames']),
      num_frames=torch.tensor(workload['num_frames'].astype(np.float32)),
      labels=torch.tensor(workload['labels'].astype(np.float32)),
      num_labels=torch.tensor(workload['num_labels'].astype(np.float32)),
      semiring=last_torch.semirings.Log)
  ref_loss = (ref_den - ref_num).detach().numpy()

  our_loss = ours(
      params,
      frames=jnp.asarray(workload['frames']),
      num_frames=jnp.asarray(workload['num_frames']),
      labels=jnp.asarray(workload['labels']),
      num_labels=jnp.asarray(workload['num_labels']),
      cache=None)
  npt.assert_allclose(np.asarray(our_loss), ref_loss, rtol=1e-5)
