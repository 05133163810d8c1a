"""Posterior path sampling (FFBS) against brute-force enumeration.

``RecognitionLattice.sample_paths`` draws exact i.i.d. samples from the
lattice posterior ``p(path) = exp(w(path)) / Z``. These tests verify, on
seeded random ``TableWeightFn`` lattices small enough to enumerate:

- the returned ``log_prob`` of EVERY sample equals the enumerated
  ``w(path) - log Z`` of that exact alignment (deterministic, tight);
- the empirical distribution over alignment paths matches the exact
  posterior within binomial sampling error (statistical, fixed seed);
- on a sharply peaked lattice the samples collapse to ``shortest_path``;
- the packed label format matches ``shortest_path``'s slot layout.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, weight_fns

from test_lattice_fuzz import frame_arc_options, path_weight

VOCAB = 2
INPUT_VOCAB = 3


def build(context_size, max_expansions, table):
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=context_size)
  alignment = (alignments.FrameDependent() if max_expansions is None else
               alignments.FrameLabelDependent(max_expansions))
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
          jnp.asarray(table)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  return lattice, params


def slot_encoding(arcs_per_frame, num_frames, max_t, max_expansions):
  """The ``shortest_path``-format slot labels of one alignment path."""
  num_align = 1 if max_expansions is None else max_expansions + 1
  slots = []
  for t in range(max_t):
    arcs = arcs_per_frame[t] if t < num_frames else ()
    frame = list(arcs) + [0] * (num_align - len(arcs))
    slots.extend(frame)
  return tuple(slots)


def enumerate_alignments(table, nxt, frames_int, num_frames,
                         max_expansions):
  """Yields (weight, arcs_per_frame) over every alignment path."""
  opts = frame_arc_options(max_expansions)
  for arcs_per_frame in itertools.product(opts, repeat=num_frames):
    w, _ = path_weight(table, nxt, frames_int, arcs_per_frame,
                       max_expansions)
    yield w, arcs_per_frame


@pytest.mark.parametrize('context_size,max_expansions,num_frames', [
    (0, None, 3),
    (0, 1, 3),
    (1, None, 3),
    (1, 1, 3),
    (1, 2, 2),
    (2, None, 3),
    (2, 2, 2),
])
def test_log_prob_exact_and_distribution_matches_enumeration(
    context_size, max_expansions, num_frames):
  rng = np.random.default_rng(context_size * 10 + num_frames)
  max_t = 3
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=context_size)
  num_states, _ = context.shape()
  table = np.asarray(
      rng.normal(size=(1, INPUT_VOCAB, num_states, 1 + VOCAB)), np.float32)
  lattice, params = build(context_size, max_expansions, table)

  frames_int = rng.integers(0, INPUT_VOCAB, size=max_t)
  frames = jnp.asarray(frames_int, jnp.float32)[None, :, None]
  nf = jnp.asarray([num_frames], jnp.int32)

  paths = list(
      enumerate_alignments(table[0], np.asarray(context.next_state_table()),
                           frames_int, num_frames, max_expansions))
  all_w = np.array([w for w, _ in paths])
  log_z = np.logaddexp.reduce(all_w)
  exact = {
      slot_encoding(arcs, num_frames, max_t, max_expansions): w - log_z
      for w, arcs in paths
  }
  assert len(exact) == len(paths), 'slot encoding must be injective'

  m = 4096
  labels, num_labels, log_prob = lattice.sample_paths(
      params, frames, nf, jax.random.PRNGKey(7), num_samples=m)
  num_align = lattice.alignment.num_states()
  assert labels.shape == (1, m, max_t * num_align)
  npt.assert_array_equal(np.asarray(num_labels),
                         np.full((1, m), num_align * num_frames))

  labels_np = np.asarray(labels)[0]
  log_prob_np = np.asarray(log_prob)[0]
  counts = {}
  for i in range(m):
    key = tuple(int(y) for y in labels_np[i])
    assert key in exact, f'sampled an alignment not in the lattice: {key}'
    # Deterministic: the reported posterior log-prob is the enumerated one.
    npt.assert_allclose(log_prob_np[i], exact[key], rtol=1e-5, atol=1e-5)
    counts[key] = counts.get(key, 0) + 1

  # Statistical: empirical frequencies within 5 sigma of the posterior.
  for key, lp in exact.items():
    p = np.exp(lp)
    p_hat = counts.get(key, 0) / m
    tol = 5 * np.sqrt(p * (1 - p) / m) + 2 / m
    assert abs(p_hat - p) <= tol, (
        f'path {key}: empirical {p_hat:.4f} vs exact {p:.4f} (tol {tol:.4f})')


def test_peaked_lattice_collapses_to_shortest_path():
  rng = np.random.default_rng(3)
  max_t = 3
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=1)
  num_states, _ = context.shape()
  table = np.asarray(
      8.0 * rng.normal(size=(1, INPUT_VOCAB, num_states, 1 + VOCAB)),
      np.float32)
  lattice, params = build(1, 1, table)
  frames = jnp.asarray(rng.integers(0, INPUT_VOCAB, size=max_t),
                       jnp.float32)[None, :, None]
  nf = jnp.asarray([max_t], jnp.int32)

  best_labels, _, best_w = lattice.shortest_path(params, frames, nf)
  labels, _, log_prob = lattice.sample_paths(
      params, frames, nf, jax.random.PRNGKey(0), num_samples=64)
  # With x8-scaled random weights the MAP path carries almost all mass.
  assert np.exp(np.asarray(log_prob).max()) > 0.9
  picked = np.asarray(labels)[0, int(np.argmax(np.asarray(log_prob)[0]))]
  npt.assert_array_equal(picked, np.asarray(best_labels)[0])
  mode_count = (np.asarray(labels)[0] == np.asarray(best_labels)[0]).all(
      axis=-1).sum()
  assert mode_count >= 58  # ~0.9+ posterior, 64 draws


def test_ragged_batch_and_padding_slots():
  rng = np.random.default_rng(5)
  max_t = 4
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=1)
  num_states, _ = context.shape()
  table = np.asarray(
      rng.normal(size=(2, INPUT_VOCAB, num_states, 1 + VOCAB)), np.float32)
  lattice, params = build(1, 2, table)
  frames = jnp.asarray(rng.integers(0, INPUT_VOCAB, size=(2, max_t)),
                       jnp.float32)[..., None]
  nf = jnp.asarray([4, 2], jnp.int32)

  labels, num_labels, log_prob = lattice.sample_paths(
      params, frames, nf, jax.random.PRNGKey(1), num_samples=8)
  num_align = lattice.alignment.num_states()
  assert labels.shape == (2, 8, max_t * num_align)
  npt.assert_array_equal(np.asarray(num_labels)[0], 4 * num_align)
  npt.assert_array_equal(np.asarray(num_labels)[1], 2 * num_align)
  # Slots past num_frames * num_align are structural zeros.
  npt.assert_array_equal(
      np.asarray(labels)[1, :, 2 * num_align:], 0)
  # Posterior log-probs are valid (finite, <= 0 up to float noise).
  assert np.all(np.isfinite(np.asarray(log_prob)))
  assert np.all(np.asarray(log_prob) <= 1e-5)


def test_unsupported_alignment_raises():
  class Weird(alignments.TimeSyncAlignmentLattice):
    def num_states(self):
      return 1

    def start(self):
      return 0

    def blank_next(self, state):
      return 0

    def lexical_next(self, state):
      return 0

    def topological_visit(self):
      return [0]

    def forward(self, *a, **k):
      raise NotImplementedError

    def backward(self, *a, **k):
      raise NotImplementedError

    def string_forward(self, *a, **k):
      raise NotImplementedError

  context = contexts.FullNGram(vocab_size=VOCAB, context_size=1)
  num_states, _ = context.shape()
  table = np.zeros((1, INPUT_VOCAB, num_states, 1 + VOCAB), np.float32)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=Weird(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
          jnp.asarray(table)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  frames = jnp.zeros((1, 3, 1), jnp.float32)
  with pytest.raises(NotImplementedError):
    lattice.sample_paths(params, frames, jnp.asarray([3], jnp.int32),
                         jax.random.PRNGKey(0))
