"""Randomized end-to-end lattice checks against brute-force enumeration.

The exact-value tests in test_lattices.py pin hand-picked tables; these
sweep seeded random TableWeightFn lattices (FrameDependent and
FrameLabelDependent, varying num_frames / num_labels) and compare the
public API — loss, shortest_distance, shortest_path — against a direct
enumeration of every path in the recognition lattice (reference semantics:
``lattices.py:36-101``).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns

VOCAB = 2
INPUT_VOCAB = 3


def frame_arc_options(max_expansions):
  """All within-frame label emissions.

  FrameDependent (max_expansions=None): a frame emits blank OR one label.
  FrameLabelDependent(k): a frame emits j <= k labels then a blank.
  Returns tuples of emitted lexical labels (1-based).
  """
  if max_expansions is None:
    return [()] + [(y,) for y in range(1, VOCAB + 1)]
  opts = []
  for j in range(max_expansions + 1):
    opts.extend(itertools.product(range(1, VOCAB + 1), repeat=j))
  return opts


def path_weight(table, nxt, frames_int, arcs_per_frame, max_expansions):
  """Total weight of one path; returns (weight, emitted labels)."""
  state, w, emitted = 0, 0.0, []
  for t, arcs in enumerate(arcs_per_frame):
    f = frames_int[t]
    for y in arcs:
      w += table[f, state, y]
      state = nxt[state, y - 1]
      emitted.append(y)
    if max_expansions is not None or not arcs:
      # Trailing blank (FLD always; FD only on a blank frame).
      w += table[f, state, 0]
  return w, emitted


def enumerate_paths(table, nxt, frames_int, num_frames, max_expansions):
  opts = frame_arc_options(max_expansions)
  for arcs_per_frame in itertools.product(opts, repeat=num_frames):
    yield path_weight(table, nxt, frames_int, arcs_per_frame,
                      max_expansions)


@pytest.mark.parametrize('context_size', [1, 2])
@pytest.mark.parametrize('max_expansions', [None, 1, 2])
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_loss_logz_and_viterbi_match_enumeration(context_size,
                                                 max_expansions, seed):
  rng = np.random.default_rng(seed)
  max_t = 3
  context = contexts.FullNGram(vocab_size=VOCAB,
                               context_size=context_size)
  num_states, _ = context.shape()
  table = rng.normal(size=(1, INPUT_VOCAB, num_states, 1 + VOCAB))
  table = np.asarray(table, np.float32)
  alignment = (alignments.FrameDependent() if max_expansions is None else
               alignments.FrameLabelDependent(max_expansions))
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
          jnp.asarray(table)))
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=1)

  frames_int = rng.integers(0, INPUT_VOCAB, size=max_t)
  frames = jnp.asarray(frames_int, jnp.float32)[None, :, None]
  num_frames = int(rng.integers(1, max_t + 1))
  num_labels = int(rng.integers(0, 3))
  labels_np = rng.integers(1, VOCAB + 1, size=2)
  labels = jnp.asarray(labels_np, jnp.int32)[None, :]
  target = list(labels_np[:num_labels])

  paths = list(
      enumerate_paths(table[0], np.asarray(context.next_state_table()),
                      frames_int, num_frames, max_expansions))
  all_w = np.array([w for w, _ in paths])
  log_z_oracle = np.logaddexp.reduce(all_w)
  num_w = np.array(
      [w for w, emitted in paths if emitted == target] or [-np.inf])
  log_num_oracle = np.logaddexp.reduce(num_w)

  # Denominator (shortest distance, Log semiring).
  log_z = lattice.shortest_distance(
      params, frames, jnp.array([num_frames]), semiring=semirings.Log)
  npt.assert_allclose(np.asarray(log_z)[0], log_z_oracle, rtol=1e-5)

  # Globally-normalized loss = log Z - log num.
  loss = lattice(params, frames, jnp.array([num_frames]), labels,
                 jnp.array([num_labels]))
  if np.isneginf(log_num_oracle):
    assert np.isposinf(np.asarray(loss)[0])
  else:
    npt.assert_allclose(
        np.asarray(loss)[0], log_z_oracle - log_num_oracle, rtol=1e-5)

  # Viterbi: best path weight and its emitted label sequence.
  decoded, num_decoded, path_weights = lattice.shortest_path(
      params, frames, jnp.array([num_frames]))
  best = int(np.argmax(all_w))
  npt.assert_allclose(np.asarray(path_weights)[0], all_w[best], rtol=1e-5)
  num_align = alignment.num_states()
  assert int(num_decoded[0]) == num_align * num_frames
  got = [int(y) for y in np.asarray(decoded)[0, :num_align * num_frames]
         if y > 0]
  assert got == paths[best][1]
