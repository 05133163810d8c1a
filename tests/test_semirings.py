"""Tests for last_torch_tpu.semirings.

Ports the reference test strategy (reference ``tests/semirings_test.py``):
algebraic property checks shared across semirings, gradient-contract pins
for Log/MaxTropical safe gradients and tie-breaking, expectation-semiring
entropy end-to-end, and error-path coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from last_torch_tpu import semirings


# ---------------------------------------------------------------------------
# Value helpers.
# ---------------------------------------------------------------------------


def test_value_shape():
  assert semirings.value_shape(jnp.zeros([1, 2])) == (1, 2)
  assert semirings.value_shape(
      (jnp.zeros([1, 2]), jnp.zeros([1, 2]))) == (1, 2)
  assert semirings.value_shape({'a': jnp.zeros([])}) == ()
  with pytest.raises(ValueError, match='common shape'):
    semirings.value_shape((jnp.zeros([1, 2]), jnp.zeros([2, 1])))
  with pytest.raises(ValueError, match='empty'):
    semirings.value_shape(())


def test_value_dtype():
  value = (jnp.zeros([2], jnp.float32), jnp.zeros([2], jnp.int32))
  dtypes = semirings.value_dtype(value)
  assert dtypes == (jnp.float32, jnp.int32)


# ---------------------------------------------------------------------------
# Shared algebraic property checks.
# ---------------------------------------------------------------------------


def check_zero_and_one(semiring, rng=None):
  """Zero/one identity and annihilation under broadcasting."""
  rng = rng or np.random.default_rng(0)
  a = jax.tree.map(
      lambda _: jnp.asarray(rng.uniform(size=(3, 2)), jnp.float32),
      semiring.zeros([]))
  zeros = semiring.zeros((3, 2))
  ones = semiring.ones((3, 2))
  chex_assert = lambda x, y: jax.tree.map(npt.assert_allclose, x, y)
  # a + 0 = a, a * 1 = a, a * 0 = 0
  chex_assert(semiring.plus(a, zeros), a)
  chex_assert(semiring.times(a, ones), a)
  chex_assert(semiring.times(a, zeros), zeros)
  # Broadcasting against scalar zero/one.
  chex_assert(semiring.plus(a, semiring.zeros([])), a)
  chex_assert(semiring.times(a, semiring.ones([])), a)


def test_real_properties():
  check_zero_and_one(semirings.Real)
  npt.assert_array_equal(semirings.Real.zeros([2]), [0., 0.])
  npt.assert_array_equal(semirings.Real.ones([2]), [1., 1.])
  npt.assert_array_equal(semirings.Real.times(jnp.array(2.), jnp.array(3.)),
                         6.)
  npt.assert_array_equal(semirings.Real.plus(jnp.array(2.), jnp.array(3.)),
                         5.)
  npt.assert_array_equal(
      semirings.Real.prod(jnp.array([2., 3.]), 0), 6.)
  npt.assert_array_equal(semirings.Real.sum(jnp.array([2., 3.]), 0), 5.)


def test_log_properties():
  check_zero_and_one(semirings.Log)
  npt.assert_array_equal(semirings.Log.zeros([2]), [-np.inf, -np.inf])
  npt.assert_array_equal(semirings.Log.ones([2]), [0., 0.])
  npt.assert_allclose(
      semirings.Log.plus(jnp.array(1.), jnp.array(1.)), 1 + np.log(2),
      rtol=1e-6)
  npt.assert_array_equal(
      semirings.Log.times(jnp.array(2.), jnp.array(3.)), 5.)
  npt.assert_allclose(
      semirings.Log.sum(jnp.array([1., 1.]), 0), 1 + np.log(2), rtol=1e-6)
  npt.assert_array_equal(semirings.Log.prod(jnp.array([2., 3.]), 0), 5.)


def test_max_tropical_properties():
  check_zero_and_one(semirings.MaxTropical)
  npt.assert_array_equal(semirings.MaxTropical.zeros([2]),
                         [-np.inf, -np.inf])
  npt.assert_array_equal(semirings.MaxTropical.ones([2]), [0., 0.])
  npt.assert_array_equal(
      semirings.MaxTropical.plus(jnp.array(2.), jnp.array(3.)), 3.)
  npt.assert_array_equal(
      semirings.MaxTropical.times(jnp.array(2.), jnp.array(3.)), 5.)
  npt.assert_array_equal(
      semirings.MaxTropical.sum(jnp.array([2., 3.]), 0), 3.)


# ---------------------------------------------------------------------------
# Axis handling (reference check_sum_axis, semirings_test.py:148-189).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('semiring',
                         [semirings.Real, semirings.Log,
                          semirings.MaxTropical])
def test_sum_axis(semiring):
  x = jnp.asarray(np.random.default_rng(1).uniform(size=(2, 3, 4)),
                  jnp.float32)
  for axis in [0, 1, 2, -1, -2, -3]:
    result = semiring.sum(x, axis)
    expected_shape = list(x.shape)
    expected_shape.pop(axis if axis >= 0 else axis + 3)
    assert result.shape == tuple(expected_shape)
  with pytest.raises(ValueError, match='Invalid reduction axis'):
    semiring.sum(x, 3)
  with pytest.raises(ValueError, match='Invalid reduction axis'):
    semiring.sum(x, -4)
  with pytest.raises(ValueError, match='Only int axis'):
    semiring.sum(x, (0, 1))


@pytest.mark.parametrize('semiring', [semirings.Log, semirings.MaxTropical])
def test_sum_empty_axis_is_zeros(semiring):
  x = jnp.zeros([0, 3])
  npt.assert_array_equal(semiring.sum(x, 0), semiring.zeros([3]))
  npt.assert_array_equal(semiring.sum(x, -2), semiring.zeros([3]))
  x = jnp.zeros([2, 0])
  npt.assert_array_equal(semiring.sum(x, 1), semiring.zeros([2]))


# ---------------------------------------------------------------------------
# Binary op gradients under broadcasting.
# ---------------------------------------------------------------------------


def test_log_plus_gradients_finite():
  def f(a, b):
    return jnp.sum(semirings.Log.plus(a, b))

  a = jnp.array([0.5, 1.0])
  b = jnp.array([[0.1], [2.0]])
  ga, gb = jax.grad(f, argnums=(0, 1))(a, b)
  # Against the softmax formulation.
  full = jnp.logaddexp(a, b)
  expected_ga = jnp.sum(jnp.exp(a - full), axis=0)
  expected_gb = jnp.sum(jnp.exp(b - full), axis=1, keepdims=True)
  npt.assert_allclose(ga, expected_ga, rtol=1e-4)
  npt.assert_allclose(gb, expected_gb, rtol=1e-4)


def test_log_safe_gradients():
  """The -inf/+inf gradient contract (reference semirings.py:222-241)."""
  grad = jax.grad(lambda a: semirings.Log.sum(a, 0))

  # All -inf: sum -inf, grads 0.
  g = grad(jnp.array([-np.inf, -np.inf]))
  npt.assert_array_equal(g, [0., 0.])
  npt.assert_array_equal(
      semirings.Log.sum(jnp.array([-np.inf, -np.inf]), 0), -np.inf)

  # Mixed finite & -inf: -inf gets 0 grad, others non-zero.
  g = grad(jnp.array([0., -np.inf]))
  npt.assert_allclose(g, [1., 0.])

  # All +inf: sum +inf, grads NaN.
  npt.assert_array_equal(
      semirings.Log.sum(jnp.array([np.inf, np.inf]), 0), np.inf)
  g = grad(jnp.array([np.inf, np.inf]))
  assert np.all(np.isnan(g))

  # Mixed finite & +inf: +inf gets NaN, finite gets 0.
  g = grad(jnp.array([1.0, np.inf]))
  npt.assert_array_equal(g[0], 0.)
  assert np.isnan(g[1])

  # Mixed -inf & +inf.
  g = grad(jnp.array([-np.inf, np.inf]))
  npt.assert_array_equal(g[0], 0.)
  assert np.isnan(g[1])

  # Binary plus, same contract.
  gplus = jax.grad(
      lambda a: semirings.Log.plus(a[0], a[1]))
  g = gplus(jnp.array([-np.inf, -np.inf]))
  npt.assert_array_equal(g, [0., 0.])
  g = gplus(jnp.array([0., -np.inf]))
  npt.assert_allclose(g, [1., 0.])


def test_max_tropical_tie_breaking():
  """Gradient is one-hot on exactly one argmax element even on ties.

  Reference tests/semirings_test.py:226-253.
  """
  grad = jax.grad(lambda a: semirings.MaxTropical.sum(a, 0))
  npt.assert_array_equal(grad(jnp.array([1., 3., 2.])), [0., 1., 0.])
  # Tie: exactly one non-zero gradient.
  g = grad(jnp.array([3., 3., 3.]))
  npt.assert_array_equal(np.sort(np.asarray(g)), [0., 0., 1.])
  assert np.sum(np.asarray(g) != 0) == 1

  # Binary plus tie-breaking: exactly one side gets the gradient.
  def f(ab):
    a, b = ab
    return semirings.MaxTropical.plus(a, b)

  g = jax.grad(f)(jnp.array([2., 2.]))
  npt.assert_array_equal(np.sort(np.asarray(g)), [0., 1.])

  # Multi-axis: each output picks exactly one input.
  x = jnp.array([[1., 1.], [2., 0.]])
  g = jax.grad(lambda a: jnp.sum(semirings.MaxTropical.sum(a, 1)))(x)
  assert np.all(np.sum(np.asarray(g) != 0, axis=1) == 1)


# ---------------------------------------------------------------------------
# Expectation semiring.
# ---------------------------------------------------------------------------


def test_expectation_weighted_safety():
  """0 * log 0 is zero, not NaN (reference semirings_test.py:289-294)."""
  sr = semirings.LogLogExpectation
  w = jnp.array([-np.inf, 0.])
  v = jnp.array([np.inf, 1.])
  weighted_w, weighted_x = sr.weighted(w, v)
  npt.assert_array_equal(weighted_w, w)
  npt.assert_array_equal(weighted_x, [-np.inf, 1.])


def test_expectation_entropy():
  """Computes the entropy of a distribution end-to-end.

  Reference tests/semirings_test.py:305-324: with values (log p_i,
  log p_i + log(-log p_i)), the semiring sum yields (log Z, log sum_i p_i *
  (-log p_i)); for a normalized distribution the second part is the entropy.
  """
  sr = semirings.LogLogExpectation
  p = np.array([0.25, 0.5, 0.25])
  log_p = jnp.asarray(np.log(p), jnp.float32)
  # -log p is positive, so representable under Log.
  value = sr.weighted(log_p, jnp.log(-log_p))
  total_w, total_x = sr.sum(value, 0)
  npt.assert_allclose(total_w, 0., atol=1e-6)
  entropy = -np.sum(p * np.log(p))
  npt.assert_allclose(np.exp(np.asarray(total_x)), entropy, rtol=1e-3)


def test_expectation_times_product_rule():
  sr = semirings.LogLogExpectation
  a = (jnp.array(np.log(2.0), jnp.float32), jnp.array(np.log(3.0),
                                                      jnp.float32))
  b = (jnp.array(np.log(5.0), jnp.float32), jnp.array(np.log(7.0),
                                                      jnp.float32))
  w, x = sr.times(a, b)
  npt.assert_allclose(np.exp(np.asarray(w)), 10.0, rtol=1e-5)
  # Product rule: w_a * x_b + w_b * x_a = 2*7 + 5*3 = 29.
  npt.assert_allclose(np.exp(np.asarray(x)), 29.0, rtol=1e-5)


def test_expectation_zeros_ones():
  sr = semirings.LogLogExpectation
  zw, zx = sr.zeros([2])
  npt.assert_array_equal(zw, [-np.inf, -np.inf])
  npt.assert_array_equal(zx, [-np.inf, -np.inf])
  ow, ox = sr.ones([2])
  npt.assert_array_equal(ow, [0., 0.])
  npt.assert_array_equal(ox, [-np.inf, -np.inf])


# ---------------------------------------------------------------------------
# Cartesian semiring.
# ---------------------------------------------------------------------------


def test_cartesian():
  sr = semirings.Cartesian(x=semirings.Real, y=semirings.MaxTropical)
  a = (jnp.array([2., 3.]), jnp.array([1., 5.]))
  b = (jnp.array([4., 5.]), jnp.array([2., 2.]))
  tx, ty = sr.times(a, b)
  npt.assert_array_equal(tx, [8., 15.])
  npt.assert_array_equal(ty, [3., 7.])
  px, py = sr.plus(a, b)
  npt.assert_array_equal(px, [6., 8.])
  npt.assert_array_equal(py, [2., 5.])
  sx, sy = sr.sum(a, 0)
  npt.assert_array_equal(sx, 5.)
  npt.assert_array_equal(sy, 5.)
  zx, zy = sr.zeros([1])
  npt.assert_array_equal(zx, [0.])
  npt.assert_array_equal(zy, [-np.inf])


# ---------------------------------------------------------------------------
# Everything works under jit.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('semiring',
                         [semirings.Real, semirings.Log,
                          semirings.MaxTropical])
def test_jit_compatible(semiring):
  @jax.jit
  def f(a, b):
    return semiring.sum(semiring.times(a, b), -1)

  a = jnp.asarray(np.random.default_rng(2).uniform(size=(4, 5)), jnp.float32)
  b = jnp.asarray(np.random.default_rng(3).uniform(size=(4, 5)), jnp.float32)
  npt.assert_allclose(f(a, b), semiring.sum(semiring.times(a, b), -1),
                      rtol=1e-6)
