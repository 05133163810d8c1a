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
