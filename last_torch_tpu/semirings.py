# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Semirings over PyTree values, TPU-native.

A semiring value is a PyTree of identically shaped ndarrays (a single array
for simple semirings; tuples of arrays for Expectation / Cartesian). All
semiring operations are pure jax functions, polymorphic over the value
structure, and safe to use inside ``jax.jit`` / ``jax.lax.scan`` / Pallas
host code.

Gradient-safety contracts (mirroring the reference
``last_torch/semirings.py:222-241``, reimplemented here with
``jax.custom_vjp``):

* ``Log.plus`` / ``Log.sum``:
  - all operands ``-inf``: result ``-inf``, gradients 0.
  - all operands ``+inf``: result ``+inf``, gradients NaN.
  - mixed finite & ``-inf``: result as expected; ``-inf`` operands get 0
    gradient.
  - any ``+inf`` operand: result ``+inf``; ``+inf`` operands get NaN
    gradient, others 0.
* ``MaxTropical.plus`` / ``MaxTropical.sum``: the gradient is non-zero on
  exactly ONE argmax element, even on ties (one-hot of the first argmax,
  reference ``semirings.py:373-401``). This is what makes Viterbi decoding
  by differentiation yield a single path.
"""

from __future__ import annotations

import dataclasses
import functools
from collections.abc import Sequence
from typing import Any, Callable, Generic, Optional, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

DType = Any
PyTree = Any
T = TypeVar('T')
S = TypeVar('S')


def value_shape(x: PyTree) -> tuple[int, ...]:
  """Shape of a semiring value.

  Semiring values are pytrees whose leaves are ndarrays sharing one shape
  (tuple-valued semirings like Expectation carry several leaves); that
  shared leaf shape is the value's shape. Contract matches the reference
  (``semirings.py:30-50``).

  Args:
    x: A semiring value.

  Returns:
    The shape shared by every leaf of ``x``.

  Raises:
    ValueError: If ``x`` is empty or its leaves disagree on shape.
  """
  leaves = jax.tree.leaves(x)
  if not leaves:
    raise ValueError(
        f'No common shape can be derived for an empty PyTree: {x!r}')
  shapes = [tuple(np.shape(leaf)) for leaf in leaves]
  result = shapes[0]
  for s in shapes[1:]:
    if s != result:
      raise ValueError(
          'A semiring value must consist of ndarrays of a common shape. '
          f'Got inconsistent shapes {result} vs {s} for PyTree: {x!r}')
  return result


def value_dtype(x: PyTree) -> PyTree:
  """Obtains the dtypes of a semiring value (same structure as x).

  Works on concrete arrays and abstract values (ShapeDtypeStruct) alike.
  """
  return jax.tree.map(
      lambda leaf: getattr(leaf, 'dtype', None) or jnp.asarray(leaf).dtype, x)


def where(cond: jnp.ndarray, a: PyTree, b: PyTree) -> PyTree:
  """Elementwise select between two semiring values (PyTree-aware where)."""
  return jax.tree.map(
      lambda x, y: jnp.where(cond, x, y), a, b, is_leaf=lambda v: v is None)


def stack(values: Sequence[PyTree], axis: int = 0) -> PyTree:
  """Stacks a sequence of semiring values along a new axis, leaf-wise."""
  return jax.tree.map(lambda *leaves: jnp.stack(leaves, axis=axis), *values)


def _check_axis(shape: tuple[int, ...], axis: int) -> int:
  if not isinstance(axis, int):
    raise ValueError(f'Only int axis is supported, got axis={axis!r}')
  ndim = len(shape)
  if not -ndim <= axis < ndim:
    raise ValueError(f'Invalid reduction axis={axis!r} for input shape '
                     f'{shape}')
  return axis if axis >= 0 else axis + ndim


class Semiring(Generic[T]):
  """Base Semiring interface.

  See https://en.wikipedia.org/wiki/Semiring. A Semiring object holds methods
  implementing the semiring operations. Semiring values are untyped PyTrees
  of identically shaped ndarrays (see module docstring).

  Semiring is not an abstract base class because some operations may be left
  unimplemented (e.g. ``prod`` is rarely needed).
  """

  def zeros(self, shape: Sequence[int], dtype: Optional[DType] = None) -> T:
    """Semiring zeros in the given shape and (PyTree of) dtype(s)."""
    raise NotImplementedError

  def ones(self, shape: Sequence[int], dtype: Optional[DType] = None) -> T:
    """Semiring ones in the given shape and (PyTree of) dtype(s)."""
    raise NotImplementedError

  def times(self, a: T, b: T) -> T:
    """Semiring multiplication between two values."""
    raise NotImplementedError

  def plus(self, a: T, b: T) -> T:
    """Semiring addition between two values."""
    raise NotImplementedError

  def prod(self, a: T, axis: int) -> T:
    """Semiring multiplication along a single axis."""
    raise NotImplementedError

  def sum(self, a: T, axis: int) -> T:
    """Semiring addition along a single axis."""
    raise NotImplementedError


class _Real(Semiring[jnp.ndarray]):
  """Real semiring (+, *)."""

  @staticmethod
  def zeros(shape, dtype=None):
    return jnp.zeros(shape, dtype=dtype or jnp.float32)

  @staticmethod
  def ones(shape, dtype=None):
    return jnp.ones(shape, dtype=dtype or jnp.float32)

  @staticmethod
  def times(a, b):
    return a * b

  @staticmethod
  def plus(a, b):
    return a + b

  @staticmethod
  def prod(a, axis):
    _check_axis(a.shape, axis)
    return jnp.prod(a, axis=axis)

  @staticmethod
  def sum(a, axis):
    _check_axis(a.shape, axis)
    return jnp.sum(a, axis=axis)


Real = _Real()


# ---------------------------------------------------------------------------
# Log semiring with safe gradients.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _logaddexp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  return _logaddexp_fwd(a, b)[0]


def _logaddexp_fwd(a, b):
  c = jnp.maximum(a, b)
  c = jnp.where(jnp.isfinite(c), c, jnp.zeros_like(c))
  ea = jnp.exp(a - c)
  eb = jnp.exp(b - c)
  z = ea + eb
  return c + jnp.log(z), (ea, eb, z)


def _logaddexp_bwd(res, g):
  ea, eb, z = res
  z = jnp.where(z == 0, jnp.ones_like(z), z)
  scale = g / z
  return scale * ea, scale * eb


_logaddexp.defvjp(_logaddexp_fwd, _logaddexp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _logsumexp(a: jnp.ndarray, axis: int) -> jnp.ndarray:
  return _logsumexp_fwd(a, axis)[0]


def _logsumexp_fwd(a, axis):
  c = jnp.max(a, axis=axis, keepdims=True)
  c = jnp.where(jnp.isfinite(c), c, jnp.zeros_like(c))
  e = jnp.exp(a - c)
  z = jnp.sum(e, axis=axis, keepdims=True)
  r = jnp.squeeze(c, axis=axis) + jnp.log(jnp.squeeze(z, axis=axis))
  return r, (e, z)


def _logsumexp_bwd(axis, res, g):
  e, z = res
  z = jnp.where(z == 0, jnp.ones_like(z), z)
  return (jnp.expand_dims(g, axis) / z * e,)


_logsumexp.defvjp(_logsumexp_fwd, _logsumexp_bwd)


class _Log(Semiring[jnp.ndarray]):
  """Log semiring (logaddexp, +) with safe gradients."""

  @staticmethod
  def zeros(shape, dtype=None):
    return jnp.full(shape, -jnp.inf, dtype=dtype or jnp.float32)

  @staticmethod
  def ones(shape, dtype=None):
    return jnp.zeros(shape, dtype=dtype or jnp.float32)

  @staticmethod
  def times(a, b):
    return a + b

  @staticmethod
  def plus(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    return _logaddexp(a, b)

  @staticmethod
  def prod(a, axis):
    _check_axis(a.shape, axis)
    return jnp.sum(a, axis=axis)

  @classmethod
  def sum(cls, a, axis):
    axis = _check_axis(a.shape, axis)
    if a.size > 0:
      return _logsumexp(a, axis)
    # Summing an empty axis yields semiring zeros.
    result_shape = a.shape[:axis] + a.shape[axis + 1:]
    return cls.zeros(result_shape, a.dtype)


Log = _Log()


# ---------------------------------------------------------------------------
# Max-tropical semiring with one-hot tie-broken gradients.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _maximum(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  return jnp.maximum(a, b)


def _maximum_fwd(a, b):
  choose_a = (a >= b).astype(a.dtype)
  return jnp.maximum(a, b), (choose_a,)


def _maximum_bwd(res, g):
  (choose_a,) = res
  return g * choose_a, g * (1 - choose_a)


_maximum.defvjp(_maximum_fwd, _maximum_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _max(a: jnp.ndarray, axis: int) -> jnp.ndarray:
  return jnp.max(a, axis=axis)


def _max_fwd(a, axis):
  argmax = jnp.argmax(a, axis=axis)
  return jnp.max(a, axis=axis), (argmax, a.shape[axis])


def _max_bwd(axis, res, g):
  argmax, width = res
  mask = jax.nn.one_hot(argmax, width, dtype=g.dtype)
  mask = jnp.moveaxis(mask, -1, axis)
  return (jnp.expand_dims(g, axis) * mask,)


_max.defvjp(_max_fwd, _max_bwd)


class _MaxTropical(Semiring[jnp.ndarray]):
  """Max-tropical semiring (max, +) with one-hot argmax gradients.

  ``plus``/``sum`` differentiate to a one-hot over a single winning
  element — ties are broken deterministically instead of splitting the
  gradient — which is what lets Viterbi decoding read one best path off
  the gradient of the shortest distance (pinned contract, reference
  ``semirings.py:373-401``).
  """

  @staticmethod
  def zeros(shape, dtype=None):
    return jnp.full(shape, -jnp.inf, dtype=dtype or jnp.float32)

  @staticmethod
  def ones(shape, dtype=None):
    return jnp.zeros(shape, dtype=dtype or jnp.float32)

  @staticmethod
  def times(a, b):
    return a + b

  @staticmethod
  def plus(a, b):
    a, b = jnp.broadcast_arrays(a, b)
    return _maximum(a, b)

  @staticmethod
  def prod(a, axis):
    _check_axis(a.shape, axis)
    return jnp.sum(a, axis=axis)

  @classmethod
  def sum(cls, a, axis):
    axis = _check_axis(a.shape, axis)
    if a.size > 0:
      return _max(a, axis)
    result_shape = a.shape[:axis] + a.shape[axis + 1:]
    return cls.zeros(result_shape, a.dtype)


MaxTropical = _MaxTropical()


# ---------------------------------------------------------------------------
# Expectation and Cartesian semirings (tuple-valued).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Expectation(Generic[T, S], Semiring[tuple[T, S]]):
  """Eisner's expectation semiring over (weight, weighted-sum) pairs.

  Values are tuples ``(w, x)`` where ``w`` carries path weight (in the
  ``self.w`` semiring) and ``x`` accumulates the weight-scaled quantity of
  interest (in ``self.x``) — so one shortest-distance pass computes both a
  normalizer and an expectation (e.g. path entropy). Build values with
  ``weighted()``; for the common log/log instantiation use
  ``LogLogExpectation``. Reference: ``semirings.py:404-484`` (the
  construction is from Eisner, FSMNLP 2001,
  https://www.cs.jhu.edu/~jason/papers/eisner.fsmnlp01.pdf).

  Attributes:
    w: Semiring of the weight component.
    x: Semiring of the weighted-sum component.
    w_to_x: Conversion from ``w``-semiring values into ``x``-semiring ones.
  """
  w: Semiring[T]
  x: Semiring[S]
  w_to_x: Callable[[T], S]

  def weighted(self, w: T, v: S) -> tuple[T, S]:
    # When w is zero in semiring self.w, self.w_to_x(w) is zero in semiring
    # self.x. We stipulate that the weighted value should always be zero in
    # semiring self.x. This avoids NaNs when both semirings are Log and w is
    # -inf while v is +inf (i.e. computing 0 * log 0 under Log).
    w_is_zero = w == self.w.zeros([], value_dtype(w))
    safe_v = jnp.where(w_is_zero, jnp.zeros_like(v), v)
    return w, self.x.times(self.w_to_x(w), safe_v)

  def _split_dtype(self, dtype):
    if dtype is None:
      return None, None
    dtype_w, dtype_x = dtype
    return dtype_w, dtype_x

  def zeros(self, shape, dtype=None):
    dtype_w, dtype_x = self._split_dtype(dtype)
    return self.w.zeros(shape, dtype_w), self.x.zeros(shape, dtype_x)

  def ones(self, shape, dtype=None):
    dtype_w, dtype_x = self._split_dtype(dtype)
    return self.w.ones(shape, dtype_w), self.x.zeros(shape, dtype_x)

  def times(self, a, b):
    w_a, x_a = a
    w_b, x_b = b
    w = self.w.times(w_a, w_b)
    x = self.x.plus(
        self.x.times(self.w_to_x(w_a), x_b),
        self.x.times(self.w_to_x(w_b), x_a))
    return w, x

  def plus(self, a, b):
    w_a, x_a = a
    w_b, x_b = b
    return self.w.plus(w_a, w_b), self.x.plus(x_a, x_b)

  def sum(self, a, axis):
    w, x = a
    return self.w.sum(w, axis), self.x.sum(x, axis)


# Expectation semiring with weight and weighted sum both represented in the
# Log semiring. Only summation of non-negative values is therefore allowed.
LogLogExpectation = Expectation(w=Log, x=Log, w_to_x=lambda x: x)


@dataclasses.dataclass(frozen=True)
class Cartesian(Generic[T, S], Semiring[tuple[T, S]]):
  """Cartesian product of 2 semirings.

  Attributes:
    x: The first semiring.
    y: The second semiring.
  """
  x: Semiring[T]
  y: Semiring[S]

  def _split_dtype(self, dtype):
    if dtype is None:
      return None, None
    dtype_x, dtype_y = dtype
    return dtype_x, dtype_y

  def zeros(self, shape, dtype=None):
    dtype_x, dtype_y = self._split_dtype(dtype)
    return self.x.zeros(shape, dtype_x), self.y.zeros(shape, dtype_y)

  def ones(self, shape, dtype=None):
    dtype_x, dtype_y = self._split_dtype(dtype)
    return self.x.ones(shape, dtype_x), self.y.ones(shape, dtype_y)

  def times(self, a, b):
    a_x, a_y = a
    b_x, b_y = b
    return self.x.times(a_x, b_x), self.y.times(a_y, b_y)

  def plus(self, a, b):
    a_x, a_y = a
    b_x, b_y = b
    return self.x.plus(a_x, b_x), self.y.plus(a_y, b_y)

  def sum(self, a, axis):
    a_x, a_y = a
    return self.x.sum(a_x, axis), self.y.sum(a_y, axis)

  def prod(self, a, axis):
    a_x, a_y = a
    return self.x.prod(a_x, axis), self.y.prod(a_y, axis)
