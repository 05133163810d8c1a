"""Randomized semiring-axiom checks.

The reference pins algebra by hand-picked examples (reference
``tests/semirings_test.py``); these tests additionally sweep seeded random
values — with semiring zeros sprinkled in — through the full axiom set
(associativity, commutativity, identities, annihilation, distributivity,
and sum/prod against folded plus/times) for every semiring instance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from last_torch_tpu import semirings

SEMIRINGS = {
    'real': semirings.Real,
    'log': semirings.Log,
    'max_tropical': semirings.MaxTropical,
    'log_log_expectation': semirings.LogLogExpectation,
    'cartesian_log_real': semirings.Cartesian(semirings.Log,
                                              semirings.Real),
}


def random_value(semiring, key, shape, zero_prob=0.2):
  """A random semiring value of `shape` with some exact zeros mixed in."""
  zeros = semiring.zeros(shape)
  k1, k2 = jax.random.split(key)
  mask = jax.random.bernoulli(k2, zero_prob, shape)

  def mix(z, k):
    r = jax.random.normal(k, shape) * 2.0
    return jnp.where(mask, z, r)

  leaves = jax.tree.leaves(zeros)
  keys = jax.random.split(k1, len(leaves))
  return jax.tree.unflatten(
      jax.tree.structure(zeros),
      [mix(z, k) for z, k in zip(leaves, keys)])


def assert_value_close(x, y, rtol=1e-5, atol=1e-5):
  for a, b in zip(jax.tree.leaves(x), jax.tree.leaves(y)):
    npt.assert_allclose(np.asarray(a), np.asarray(b), rtol=rtol, atol=atol)


@pytest.mark.parametrize('name', SEMIRINGS)
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_axioms(name, seed):
  semiring = SEMIRINGS[name]
  shape = (3, 4)
  kx, ky, kz = jax.random.split(jax.random.PRNGKey(seed), 3)
  x = random_value(semiring, kx, shape)
  y = random_value(semiring, ky, shape)
  z = random_value(semiring, kz, shape)
  zeros = semiring.zeros(shape)
  ones = semiring.ones(shape)

  # plus: associative, commutative, identity.
  assert_value_close(
      semiring.plus(semiring.plus(x, y), z),
      semiring.plus(x, semiring.plus(y, z)))
  assert_value_close(semiring.plus(x, y), semiring.plus(y, x))
  assert_value_close(semiring.plus(x, zeros), x)

  # times: associative, identity, annihilation by zeros.
  assert_value_close(
      semiring.times(semiring.times(x, y), z),
      semiring.times(x, semiring.times(y, z)))
  assert_value_close(semiring.times(x, ones), x)
  assert_value_close(semiring.times(ones, x), x)
  assert_value_close(semiring.times(x, zeros), zeros)

  # distributivity: x*(y+z) == x*y + x*z.
  assert_value_close(
      semiring.times(x, semiring.plus(y, z)),
      semiring.plus(semiring.times(x, y), semiring.times(x, z)),
      rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('name', SEMIRINGS)
@pytest.mark.parametrize('seed', [0, 1])
def test_sum_and_prod_match_folds(name, seed):
  semiring = SEMIRINGS[name]
  shape = (5, 3)
  x = random_value(semiring, jax.random.PRNGKey(seed), shape)

  rows = [jax.tree.map(lambda l, i=i: l[i], x) for i in range(shape[0])]

  folded = rows[0]
  for r in rows[1:]:
    folded = semiring.plus(folded, r)
  assert_value_close(semiring.sum(x, axis=0), folded, rtol=1e-4, atol=1e-4)

  try:
    prod = semiring.prod(x, axis=0)
  except NotImplementedError:
    return
  folded = rows[0]
  for r in rows[1:]:
    folded = semiring.times(folded, r)
  assert_value_close(prod, folded, rtol=1e-4, atol=1e-4)
