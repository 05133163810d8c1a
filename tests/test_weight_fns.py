"""Tests for last_torch_tpu.weight_fns.

Ports the reference test strategy (reference ``tests/weight_fns_test.py``):
normalizer correctness, JointWeightFn shape/consistency contracts,
SharedEmbCacher/SharedRNNCacher caches, the FakeRNNCell trick pinning the
n-gram state enumeration order, and TableWeightFn exactness.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from last_torch_tpu import weight_fns
from last_torch_tpu.utils import rnn


def test_hat_normalize():
  rng = np.random.default_rng(0)
  blank = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
  lexical = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
  nb, nl = weight_fns.hat_normalize(blank, lexical)
  # Correctness contract: exp(blank) + sum(exp(lexical)) == 1.
  total = np.exp(np.asarray(nb)) + np.sum(np.exp(np.asarray(nl)), axis=-1)
  npt.assert_allclose(total, 1.0, rtol=1e-4)
  # P(blank) is the sigmoid of the blank weight.
  npt.assert_allclose(np.exp(np.asarray(nb)),
                      jax.nn.sigmoid(blank), rtol=1e-5)
  # Stable for large weights (the reference's naive formulation overflows).
  nb_large, nl_large = weight_fns.hat_normalize(
      jnp.array([1000.0]), jnp.array([[1000.0, -1000.0]]))
  assert np.all(np.isfinite(np.asarray(nb_large)))
  assert not np.any(np.isnan(np.asarray(nl_large)))


def test_log_softmax_normalize():
  rng = np.random.default_rng(1)
  blank = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
  lexical = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
  nb, nl = weight_fns.log_softmax_normalize(blank, lexical)
  total = np.exp(np.asarray(nb)) + np.sum(np.exp(np.asarray(nl)), axis=-1)
  npt.assert_allclose(total, 1.0, rtol=1e-4)
  expected = jax.nn.log_softmax(
      jnp.concatenate([blank[..., None], lexical], axis=-1), axis=-1)
  npt.assert_allclose(nb, expected[..., 0], rtol=1e-5)
  npt.assert_allclose(nl, expected[..., 1:], rtol=1e-5)


def test_joint_weight_fn_shapes_and_consistency():
  vocab_size, hidden_size = 3, 16
  num_states, emb_size, feature_size = 5, 8, 6
  wf = weight_fns.JointWeightFn(vocab_size=vocab_size,
                                hidden_size=hidden_size)
  key = jax.random.PRNGKey(0)
  cache = jax.random.normal(key, (num_states, emb_size))
  frame = jax.random.normal(key, (2, feature_size))
  params = wf.init(key, cache, frame)

  blank, lexical = wf.apply(params, cache, frame)
  assert blank.shape == (2, num_states)
  assert lexical.shape == (2, num_states, vocab_size)

  # Persistent parameters: two applies agree exactly (the reference
  # re-randomized projections per call, SURVEY §2.2-Q1).
  blank2, lexical2 = wf.apply(params, cache, frame)
  npt.assert_array_equal(blank, blank2)
  npt.assert_array_equal(lexical, lexical2)

  # state=s result equals row s of the all-states result.
  state = jnp.array([3, 1])
  blank_s, lexical_s = wf.apply(params, cache, frame, state)
  assert blank_s.shape == (2,)
  assert lexical_s.shape == (2, vocab_size)
  npt.assert_allclose(blank_s, blank[jnp.arange(2), state], rtol=1e-5)
  npt.assert_allclose(lexical_s, lexical[jnp.arange(2), state], rtol=1e-5)


def test_shared_emb_cacher():
  cacher = weight_fns.SharedEmbCacher(num_context_states=7, embedding_size=4)
  params = cacher.init(jax.random.PRNGKey(0))
  cache = cacher.apply(params)
  # The cache is a plain array (reference SURVEY §2.2-Q2), equal to the
  # parameter table.
  assert cache.shape == (7, 4)
  npt.assert_array_equal(cache, params['embedding'])


def test_shared_rnn_cacher_shape():
  cacher = weight_fns.SharedRNNCacher(
      vocab_size=2, context_size=2, rnn_size=8, rnn_embedding_size=4)
  params = cacher.init(jax.random.PRNGKey(0))
  cache = cacher.apply(params)
  # num_states = 1 + 2 + 4 = 7.
  assert cache.shape == (7, 8)
  # Deterministic given the same parameters.
  npt.assert_array_equal(cache, cacher.apply(params))


@dataclasses.dataclass(frozen=True)
class FakeShiftRegisterCell(rnn.RNNCellBase):
  """RNN cell whose state is a shift register of its (scalar) inputs.

  With an identity-like embedding, the SharedRNNCacher output becomes a
  literal listing of n-gram label histories — pinning the state enumeration
  order (reference ``tests/weight_fns_test.py:126-175``).
  """

  context_size: int

  def init(self, key):
    return {}

  def initial_state(self, batch_size, dtype=jnp.float32):
    return jnp.zeros((batch_size, self.context_size), dtype)

  def apply(self, params, inputs, state):
    # inputs: [batch, 1] embedded labels (embedding width 1).
    new_state = jnp.concatenate([state[:, 1:], inputs], axis=1)
    return new_state, new_state


def test_shared_rnn_cacher_state_order():
  vocab_size, context_size = 2, 2
  cacher = weight_fns.SharedRNNCacher(
      vocab_size=vocab_size,
      context_size=context_size,
      rnn_size=context_size,
      rnn_embedding_size=1,
      rnn_cell=FakeShiftRegisterCell(context_size=context_size))
  params = cacher.init(jax.random.PRNGKey(0))
  # Identity embedding: label y embeds to [y].
  params['embedding'] = jnp.arange(vocab_size + 1, dtype=jnp.float32)[:, None]
  cache = cacher.apply(params)
  # Rows list the n-gram histories in FullNGram lexicographic state order:
  # "", "1", "2", "11", "12", "21", "22" (left-padded with 0).
  npt.assert_array_equal(cache, [
      [0, 0],
      [0, 1],
      [0, 2],
      [1, 1],
      [1, 2],
      [2, 1],
      [2, 2],
  ])


def test_null_cacher():
  cacher = weight_fns.NullCacher()
  assert cacher.apply(cacher.init(jax.random.PRNGKey(0))) is None


def test_table_weight_fn():
  batch, input_vocab, num_states, vocab = 2, 3, 4, 2
  table = jnp.arange(
      batch * input_vocab * num_states * (1 + vocab),
      dtype=jnp.float32).reshape(batch, input_vocab, num_states, 1 + vocab)
  wf = weight_fns.TableWeightFn(table)
  params = wf.init(jax.random.PRNGKey(0), None, jnp.zeros((5,)))

  frame = jnp.array([[2.0, 9.9], [1.0, -3.0]])  # input labels 2 and 1.
  blank, lexical = wf.apply(params, None, frame)
  assert blank.shape == (batch, num_states)
  assert lexical.shape == (batch, num_states, vocab)
  npt.assert_array_equal(blank, table[jnp.arange(2), jnp.array([2, 1]), :, 0])
  npt.assert_array_equal(lexical,
                         table[jnp.arange(2), jnp.array([2, 1]), :, 1:])

  # With an explicit state.
  state = jnp.array([3, 0])
  blank_s, lexical_s = wf.apply(params, None, frame, state)
  npt.assert_array_equal(blank_s, blank[jnp.arange(2), state])
  npt.assert_array_equal(lexical_s, lexical[jnp.arange(2), state])

  # Bad batch dims.
  with pytest.raises(ValueError, match='frame should have batch_dims'):
    wf.apply(params, None, jnp.zeros((3, 2)))


def test_locally_normalized_weight_fn():
  vocab_size = 3
  inner = weight_fns.JointWeightFn(vocab_size=vocab_size, hidden_size=8)
  wf = weight_fns.LocallyNormalizedWeightFn(inner)
  assert isinstance(wf, weight_fns.LocallyNormalizedWeightFn)

  key = jax.random.PRNGKey(1)
  cache = jax.random.normal(key, (4, 5))
  frame = jax.random.normal(key, (2, 6))
  params = wf.init(key, cache, frame)
  blank, lexical = wf.apply(params, cache, frame)
  total = np.exp(np.asarray(blank)) + np.sum(
      np.exp(np.asarray(lexical)), axis=-1)
  npt.assert_allclose(total, 1.0, rtol=1e-4)


def test_lstm_cell():
  cell = rnn.LSTMCell(input_size=3, hidden_size=4)
  params = cell.init(jax.random.PRNGKey(0))
  state = cell.initial_state(2)
  out, (h, c) = cell.apply(params, jnp.ones((2, 3)), state)
  assert out.shape == (2, 4)
  npt.assert_array_equal(out, h)
  assert c.shape == (2, 4)
  # Output is bounded by tanh.
  assert np.all(np.abs(np.asarray(out)) < 1.0)
