"""Tests for last_torch_tpu.contexts.

Ports the reference oracles (reference ``tests/contexts_test.py``):
closed-form FullNGram reduce/broadcast expectations at context sizes 0/1/2,
NextStateTable equivalence with a densified FullNGram, walk_states, and
error-path coverage.
"""

import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from last_torch_tpu import contexts
from last_torch_tpu import semirings


def test_full_ngram_validation():
  with pytest.raises(ValueError, match='vocab_size should be > 0'):
    contexts.FullNGram(vocab_size=0, context_size=1)
  with pytest.raises(ValueError, match='context_size should be >= 0'):
    contexts.FullNGram(vocab_size=2, context_size=-1)


@pytest.mark.parametrize('vocab_size,context_size,expected_num_states',
                         [(2, 0, 1), (2, 1, 3), (2, 2, 7), (3, 2, 13)])
def test_full_ngram_shape(vocab_size, context_size, expected_num_states):
  context = contexts.FullNGram(
      vocab_size=vocab_size, context_size=context_size)
  assert context.shape() == (expected_num_states, vocab_size)
  assert context.start() == 0


def test_full_ngram_next_state_context_0():
  context = contexts.FullNGram(vocab_size=2, context_size=0)
  state = jnp.array([0, 0, 0])
  label = jnp.array([0, 1, 2])
  npt.assert_array_equal(context.next_state(state, label), [0, 0, 0])


def test_full_ngram_next_state_context_1():
  context = contexts.FullNGram(vocab_size=2, context_size=1)
  # From any state, label y goes to state y; epsilon stays.
  state = jnp.array([0, 0, 1, 2, 1, 2])
  label = jnp.array([1, 2, 2, 1, 0, 0])
  npt.assert_array_equal(context.next_state(state, label), [1, 2, 2, 1, 1, 2])


def test_full_ngram_next_state_context_2():
  context = contexts.FullNGram(vocab_size=2, context_size=2)
  # States: 0:"", 1:"1", 2:"2", 3:"11", 4:"12", 5:"21", 6:"22".
  state = jnp.array([0, 0, 1, 1, 2, 3, 3, 4, 6, 5])
  label = jnp.array([1, 2, 1, 2, 1, 1, 2, 1, 2, 0])
  # "" -1-> "1"; "" -2-> "2"; "1" -1-> "11"; "1" -2-> "12"; "2" -1-> "21";
  # "11" -1-> "11"; "11" -2-> "12"; "12" -1-> "21"; "22" -2-> "22"; eps stay.
  npt.assert_array_equal(
      context.next_state(state, label), [1, 2, 3, 4, 5, 3, 4, 5, 6, 5])


def test_full_ngram_walk_states():
  context = contexts.FullNGram(vocab_size=2, context_size=2)
  labels = jnp.array([[1, 2, 0, 1], [2, 2, 2, 2]])
  states = context.walk_states(labels)
  # "": 1->"1"(1), 2->"12"(4), eps stays, 1->"21"(5)
  npt.assert_array_equal(states, [[0, 1, 4, 4, 5], [0, 2, 6, 6, 6]])


def _enumerate_forward_reduce(context, weights):
  """Brute-force per-destination sum oracle using next_state."""
  num_states, vocab_size = context.shape()
  result = np.zeros(weights.shape[:-2] + (num_states,), np.float64)
  for p in range(num_states):
    for y in range(1, vocab_size + 1):
      q = int(context.next_state(jnp.array(p), jnp.array(y)))
      result[..., q] += np.asarray(weights[..., p, y - 1])
  return result


@pytest.mark.parametrize('vocab_size,context_size',
                         [(2, 0), (2, 1), (3, 1), (2, 2), (3, 2)])
def test_full_ngram_forward_reduce_real(vocab_size, context_size):
  context = contexts.FullNGram(
      vocab_size=vocab_size, context_size=context_size)
  num_states, _ = context.shape()
  rng = np.random.default_rng(0)
  weights = jnp.asarray(
      rng.uniform(size=(2, num_states, vocab_size)), jnp.float32)
  actual = context.forward_reduce(weights, semirings.Real)
  expected = _enumerate_forward_reduce(context, weights)
  npt.assert_allclose(actual, expected, rtol=1e-5)


@pytest.mark.parametrize('vocab_size,context_size',
                         [(2, 0), (2, 1), (2, 2), (3, 2)])
def test_full_ngram_backward_broadcast(vocab_size, context_size):
  context = contexts.FullNGram(
      vocab_size=vocab_size, context_size=context_size)
  num_states, _ = context.shape()
  weights = jnp.arange(num_states, dtype=jnp.float32)
  actual = context.backward_broadcast(weights)
  # Oracle: result[p, y-1] = weights[next_state(p, y)].
  expected = np.zeros((num_states, vocab_size), np.float32)
  for p in range(num_states):
    for y in range(1, vocab_size + 1):
      q = int(context.next_state(jnp.array(p), jnp.array(y)))
      expected[p, y - 1] = float(weights[q])
  npt.assert_array_equal(actual, expected)


def test_full_ngram_forward_reduce_shape_errors():
  context = contexts.FullNGram(vocab_size=2, context_size=1)
  with pytest.raises(ValueError, match=r'weights.shape\[-2:\] should be'):
    context.forward_reduce(jnp.zeros([4, 2]), semirings.Real)
  with pytest.raises(ValueError, match=r'weights.shape\[-1\] should be'):
    context.backward_broadcast(jnp.zeros([4]))


def test_full_ngram_forward_reduce_log():
  context = contexts.FullNGram(vocab_size=2, context_size=1)
  rng = np.random.default_rng(1)
  weights = jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32)
  actual = context.forward_reduce(weights, semirings.Log)
  expected_exp = _enumerate_forward_reduce(
      context, np.exp(np.asarray(weights, np.float64)))
  # Destination 0 has no incoming arcs: semiring zero = -inf = log(0).
  with np.errstate(divide='ignore'):
    expected = np.log(expected_exp)
  npt.assert_allclose(actual, expected, rtol=1e-4)


def test_full_ngram_forward_reduce_tuple_semiring():
  """Tuple-valued semirings work through forward_reduce (PyTree support)."""
  context = contexts.FullNGram(vocab_size=2, context_size=1)
  sr = semirings.Cartesian(x=semirings.Real, y=semirings.Real)
  rng = np.random.default_rng(2)
  w1 = jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32)
  w2 = jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32)
  a1, a2 = context.forward_reduce((w1, w2), sr)
  npt.assert_allclose(a1, _enumerate_forward_reduce(context, w1), rtol=1e-5)
  npt.assert_allclose(a2, _enumerate_forward_reduce(context, w2), rtol=1e-5)


def test_next_state_table_validation():
  with pytest.raises(ValueError, match='next_state_table should have shape'):
    contexts.NextStateTable(jnp.zeros([2, 2, 2], jnp.int32))
  with pytest.raises(ValueError, match='non-zero size'):
    contexts.NextStateTable(jnp.zeros([0, 2], jnp.int32))
  with pytest.raises(ValueError, match='int32'):
    contexts.NextStateTable(jnp.zeros([2, 2], jnp.float32))


@pytest.mark.parametrize('vocab_size,context_size', [(2, 1), (2, 2), (3, 2)])
def test_next_state_table_matches_full_ngram(vocab_size, context_size):
  """NextStateTable built from FullNGram.next_state_table is equivalent.

  Reference tests/contexts_test.py:189-231 — extended to Log (the reference
  could only test Real because its forward_reduce hard-coded sum+max,
  SURVEY §2.2-Q4).
  """
  ngram = contexts.FullNGram(vocab_size=vocab_size, context_size=context_size)
  table = contexts.NextStateTable(ngram.next_state_table())
  assert table.shape() == ngram.shape()
  assert table.start() == ngram.start()

  num_states, _ = ngram.shape()
  rng = np.random.default_rng(3)

  # next_state equivalence, including epsilon.
  state = jnp.asarray(
      rng.integers(0, num_states, size=(10,)), jnp.int32)
  label = jnp.asarray(rng.integers(0, vocab_size + 1, size=(10,)), jnp.int32)
  npt.assert_array_equal(
      table.next_state(state, label), ngram.next_state(state, label))

  # walk_states equivalence.
  labels = jnp.asarray(
      rng.integers(0, vocab_size + 1, size=(2, 5)), jnp.int32)
  npt.assert_array_equal(table.walk_states(labels),
                         ngram.walk_states(labels))

  # forward_reduce / backward_broadcast equivalence under Real and Log.
  weights = jnp.asarray(
      rng.uniform(size=(2, num_states, vocab_size)), jnp.float32)
  for sr in [semirings.Real, semirings.Log]:
    npt.assert_allclose(
        table.forward_reduce(weights, sr),
        ngram.forward_reduce(weights, sr), rtol=1e-5)
  state_weights = jnp.asarray(
      rng.uniform(size=(2, num_states)), jnp.float32)
  npt.assert_array_equal(
      table.backward_broadcast(state_weights),
      ngram.backward_broadcast(state_weights))


def test_next_state_table_forward_reduce_max_tropical():
  ngram = contexts.FullNGram(vocab_size=2, context_size=1)
  table = contexts.NextStateTable(ngram.next_state_table())
  weights = jnp.asarray([[1., 5.], [2., 3.], [4., 0.]], jnp.float32)
  actual = table.forward_reduce(weights, semirings.MaxTropical)
  # Destination 1 receives column 0; destination 2 receives column 1.
  npt.assert_array_equal(actual, [-np.inf, 4., 5.])


def test_next_state_table_segment_reduce_large_dfa():
  """The O(S * max_in_degree) segment route (taken above the dense-mask
  threshold; SURVEY §2.2-Q4's prescribed sorted segment reduce) matches
  FullNGram's block reduce on a 273-state trigram DFA, for values AND
  gradients, under Real/Log/MaxTropical."""
  import jax
  ngram = contexts.FullNGram(vocab_size=16, context_size=2)
  table = contexts.NextStateTable(ngram.next_state_table())
  num_states, vocab_size = ngram.shape()
  assert num_states * vocab_size * num_states > 1 << 16  # segment route
  rng = np.random.default_rng(7)
  weights = jnp.asarray(
      rng.normal(size=(2, num_states, vocab_size)), jnp.float32)
  for sr in [semirings.Real, semirings.Log, semirings.MaxTropical]:
    npt.assert_allclose(
        table.forward_reduce(weights, sr),
        ngram.forward_reduce(weights, sr), rtol=1e-5, atol=1e-6)
  # Gradients flow through the gather identically to the block reduce.
  f_table = lambda w: jnp.sum(table.forward_reduce(w, semirings.Log))
  f_ngram = lambda w: jnp.sum(ngram.forward_reduce(w, semirings.Log))
  npt.assert_allclose(jax.grad(f_table)(weights),
                      jax.grad(f_ngram)(weights), rtol=1e-5, atol=1e-6)


def test_next_state_table_segment_reduce_skewed_in_degree():
  """A DFA where one state absorbs most arcs (max in-degree near the arc
  count) still reduces correctly on the segment route."""
  rng = np.random.default_rng(11)
  num_states, vocab_size = 40, 50  # 40*50*40 = 80000 > dense threshold
  table_np = np.zeros((num_states, vocab_size), np.int32)  # all -> state 0
  # A few scattered non-zero destinations.
  for _ in range(60):
    table_np[rng.integers(num_states), rng.integers(vocab_size)] = (
        rng.integers(num_states))
  table = contexts.NextStateTable(jnp.asarray(table_np))
  weights = jnp.asarray(
      rng.normal(size=(num_states, vocab_size)), jnp.float32)
  # Oracle: explicit per-destination logsumexp.
  expected = np.full(num_states, -np.inf)
  for p in range(num_states):
    for y in range(vocab_size):
      d = table_np[p, y]
      expected[d] = np.logaddexp(expected[d], float(weights[p, y]))
  npt.assert_allclose(
      table.forward_reduce(weights, semirings.Log), expected, rtol=1e-5)
