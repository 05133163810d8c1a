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

"""Context dependencies (label-history DFAs), TPU-native.

Rebuild of the reference ``last_torch/contexts.py`` with:

* ``walk_states`` as a ``jax.lax.scan`` over the label axis (the reference
  hand-rolls a Python loop, ``contexts.py:126-144``).
* PyTree-aware ``forward_reduce`` / ``backward_broadcast`` so tuple-valued
  semirings (Expectation, Cartesian) work end-to-end.
* A semiring-correct ``NextStateTable.forward_reduce`` (the reference
  hard-codes a sum+max mix regardless of semiring, ``contexts.py:310-317`` —
  SURVEY §2.2-Q4).

``FullNGram.forward_reduce`` keeps the reference's block reshape-sum
formulation (``contexts.py:207-230``): it contains no gather/scatter, so XLA
maps it to contiguous vector reductions that tile cleanly on the TPU VPU.
"""

from __future__ import annotations

import abc
import dataclasses
import functools

import jax
import jax.numpy as jnp

from last_torch_tpu import semirings


class ContextDependency(abc.ABC):
  r"""Interface for context dependencies.

  A context dependency is a deterministic finite automaton (DFA) that accepts
  $\Sigma^*$ ($\Sigma$ is the lexical output vocabulary). The state ids in
  [0, num_states) of a context dependency encode the output history. See
  Sections 3 and 4 of the GNAT paper (arXiv 2205.13674) for more details.

  Note: all context dependency states are final. Label 0 is the epsilon /
  blank label and must behave as a self-loop in ``next_state``.

  Subclasses implement: shape, start, next_state, forward_reduce,
  backward_broadcast.
  """

  @abc.abstractmethod
  def shape(self) -> tuple[int, int]:
    """(num_states, vocab_size) of the context dependency DFA."""

  @abc.abstractmethod
  def start(self) -> int:
    """The start state id."""

  @abc.abstractmethod
  def next_state(self, state: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    """Takes a transition in the DFA.

    Because 0 is the epsilon label, ``next_state`` must return ``state[i]``
    whenever ``label[i] == 0``.

    Args:
      state: [batch_dims...] int32 source state ids.
      label: [batch_dims...] int32 labels in the range [0, vocab_size].

    Returns:
      [batch_dims...] int32 next state ids.
    """

  @abc.abstractmethod
  def forward_reduce(self, weights, semiring: semirings.Semiring):
    """The reduction used in the forward algorithm.

    For each state q, sums over all (source state p, label y) pairs with an
    arc p --y--> q:

      result[..., q] = sum_{p-y->q} weights[..., p, y]

    Args:
      weights: [batch_dims..., num_states, vocab_size] semiring value.
      semiring: The semiring carrying out the summation.

    Returns:
      [batch_dims..., num_states] reduced semiring value.
    """

  @abc.abstractmethod
  def backward_broadcast(self, weights):
    """The broadcast used in the backward algorithm.

    For each state q, broadcasts its weight to all (source state p, label y)
    pairs leading to q:

      result[..., p, y] = weights[..., q]   for arcs p --y--> q

    Args:
      weights: [batch_dims..., num_states] semiring value.

    Returns:
      [batch_dims..., num_states, vocab_size] broadcasted semiring value.
    """

  # Derived methods.

  def walk_states(self, labels: jnp.ndarray) -> jnp.ndarray:
    """States visited while consuming each label sequence.

    A ``lax.scan`` of ``next_state`` over the label axis (the reference
    hand-rolls this loop in Python, ``contexts.py:109-146``).

    Args:
      labels: [batch_dims..., num_labels] int32 labels in [0, vocab_size].

    Returns:
      [batch_dims..., num_labels + 1] int32 states: position 0 holds the
      start state, position i > 0 the state reached after
      labels[..., i - 1].
    """
    labels = jnp.asarray(labels, jnp.int32)
    batch_dims = labels.shape[:-1]
    start = jnp.full(batch_dims, self.start(), dtype=jnp.int32)

    time_major_labels = jnp.moveaxis(labels, -1, 0)
    _, time_major_states = jax.lax.scan(
        _walk_states_step(self), start, time_major_labels)
    states = jnp.moveaxis(time_major_states, 0, -1)
    return jnp.concatenate([start[..., None], states], axis=-1)


@functools.lru_cache(maxsize=None)
def _walk_states_step(context):
  """Cached scan body for ``walk_states`` (stable identity for jax's
  tracing caches; see lattices._string_dp_step)."""

  def step(state, label):
    next_state = context.next_state(state, label)
    return next_state, next_state

  return step


def _check_reduce_shape(self_shape, weights):
  shape = semirings.value_shape(weights)
  if shape[-2:] != self_shape:
    raise ValueError(f'weights.shape[-2:] should be {self_shape} but got'
                     f' {shape[-2:]}')
  return shape[:-2]


def _check_broadcast_shape(num_states, weights):
  shape = semirings.value_shape(weights)
  if shape[-1] != num_states:
    raise ValueError(f'weights.shape[-1] should be {num_states} but '
                     f'got {shape[-1]}')
  return shape[:-1]


@dataclasses.dataclass(frozen=True)
class FullNGram(ContextDependency):
  """Full n-gram context dependency (GNAT paper Section 4.1).

  For a given vocab_size > 0, context_size >= 0:
  - States are all n-grams of length 0..context_size over the vocabulary,
    each assigned its lexicographic order as id: the empty n-gram is state 0,
    unigrams are states 1..vocab_size, and so on.
  - The start state is 0 (the empty n-gram).
  - All states are final.
  - From each state there is an arc per label, leading to the n-gram with the
    label appended, capped at length context_size (dropping the oldest).

  Attributes:
    vocab_size: Lexical output vocabulary size.
    context_size: Maximum n-gram context size.
  """

  vocab_size: int
  context_size: int

  def __post_init__(self):
    if self.vocab_size <= 0:
      raise ValueError('vocab_size should be > 0, but got '
                       f'vocab_size={self.vocab_size}')
    if self.context_size < 0:
      raise ValueError('context_size should be >= 0, but got '
                       f'context_size={self.context_size}')

  def num_states(self) -> int:
    return sum(int(self.vocab_size**i) for i in range(self.context_size + 1))

  def shape(self) -> tuple[int, int]:
    return self.num_states(), self.vocab_size

  def start(self) -> int:
    return 0

  def next_state(self, state: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    # States of length < context_size "ascend": q = p * V + y. States of full
    # length drop their oldest label: q = ((p - A) mod V^(n-1)) * V + A + y-1
    # where A is the number of ascending states. Closed-form arithmetic, no
    # table lookups (reference contexts.py:190-205).
    state = jnp.asarray(state)
    label = jnp.asarray(label)
    num_ascending = sum(
        self.vocab_size**i for i in range(self.context_size))
    ascend_next = state * self.vocab_size + label
    if self.context_size == 0:
      full_next = jnp.zeros_like(ascend_next)
    else:
      full_next = ((state - num_ascending) %
                   (self.vocab_size**(self.context_size - 1)) *
                   self.vocab_size + num_ascending + label - 1)
    next_state = jnp.where(state < num_ascending, ascend_next, full_next)
    # Remain in place on epsilon.
    return jnp.where(label == 0, state, next_state)

  def forward_reduce(self, weights, semiring: semirings.Semiring):
    # The (source state, label) arc grid is block-structured in the
    # lexicographic state numbering, so the per-destination reduction is a
    # reshape + axis-sum: no scatter, fully dense, VPU-friendly
    # (reference contexts.py:207-230).
    batch_dims = _check_reduce_shape(self.shape(), weights)
    n, v = self.context_size, self.vocab_size
    dtypes = semirings.value_dtype(weights)

    parts = []
    if n > 0:
      # The start state has no incoming arcs.
      parts.append(semiring.zeros(batch_dims + (1,), dtypes))

    num_into_ascending = sum(v**i for i in range(n - 1)) if n >= 1 else 0
    # Arcs from states shorter than context_size-1 each lead to a unique
    # ascending destination, in lexicographic order.
    parts.append(
        jax.tree.map(
            lambda w: w[..., :num_into_ascending, :].reshape(
                batch_dims + (-1,)), weights))
    # All remaining arcs lead into the block of full-order states; each group
    # of v**n consecutive (p, y) arcs covers those destinations in order.
    full = jax.tree.map(
        lambda w: w[..., num_into_ascending:, :].reshape(batch_dims +
                                                         (-1, v**n)), weights)
    parts.append(semiring.sum(full, axis=-2))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=-1), *parts)

  def backward_broadcast(self, weights):
    batch_dims = _check_broadcast_shape(self.num_states(), weights)
    n, v = self.context_size, self.vocab_size

    if n == 0:
      return jax.tree.map(
          lambda w: jnp.broadcast_to(w[..., None], w.shape + (v,)), weights)

    num_ascending = sum(v**i for i in range(n))

    def broadcast_leaf(w):
      # Non-start ascending states have a unique incoming arc.
      part_a = w[..., 1:num_ascending].reshape(batch_dims + (-1, v))
      # States feeding the full-order block all see the same v**n weights.
      part_b = jnp.broadcast_to(
          w[..., None, num_ascending:],
          batch_dims + (1 + v, v**n)).reshape(batch_dims + (-1, v))
      return jnp.concatenate([part_a, part_b], axis=-2)

    return jax.tree.map(broadcast_leaf, weights)

  def next_state_table(self) -> jnp.ndarray:
    """Densifies next_state into a [num_states, vocab_size] int32 table."""
    num_states, vocab_size = self.shape()
    return jnp.asarray(
        self.next_state(
            jnp.arange(num_states)[:, None],
            jnp.arange(vocab_size)[None, :] + 1), jnp.int32)


class NextStateTable(ContextDependency):
  """Arbitrary context DFA given by a dense transition table.

  Covers any deterministic label-history automaton that FullNGram's
  closed form cannot express (reference ``contexts.py:266-324``).

  Attributes:
    next_state_table: [num_states, vocab_size] int32; row p, column y - 1
      holds the destination of the lexical arc labeled y out of state p.
  """

  def __init__(self, next_state_table):
    next_state_table = jnp.asarray(next_state_table)
    if next_state_table.ndim != 2:
      raise ValueError(
          'next_state_table should have shape [num_states, vocab_size], but'
          f'got shape {next_state_table.shape}')
    if 0 in next_state_table.shape:
      raise ValueError('next_state_table should have a non-zero size, but '
                       f'got shape {next_state_table.shape}')
    if next_state_table.dtype != jnp.int32:
      raise ValueError('next_state_table should be an int32 ndarray, but '
                       f'got dtype {next_state_table.dtype}')
    self.next_state_table = next_state_table
    self._segment_plan = None

  def shape(self) -> tuple[int, int]:
    return tuple(self.next_state_table.shape)

  def start(self) -> int:
    return 0

  def next_state(self, state: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
    # Lexical labels are in [1, vocab_size]; label 0 is a self-loop.
    is_epsilon = label == 0
    zero_based = jnp.where(is_epsilon, 0, label - 1)
    next_state = self.next_state_table[state, zero_based]
    return jnp.where(is_epsilon, state, next_state)

  def _reduce_plan(self):
    """[num_states, K] gather of each state's incoming arcs (K = max
    in-degree), padded with the dummy arc index num_arcs. Computed once
    in numpy from the (concrete) transition table."""
    if self._segment_plan is None:
      import numpy as np
      table = np.asarray(self.next_state_table)
      num_states, vocab_size = table.shape
      num_arcs = num_states * vocab_size
      dest = table.reshape(-1)
      counts = np.bincount(dest, minlength=num_states)
      k = max(int(counts.max()), 1)
      order = np.argsort(dest, kind='stable')
      sorted_dest = dest[order]
      starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
      pos = np.arange(num_arcs) - starts[sorted_dest]
      idx = np.full((num_states, k), num_arcs, np.int32)
      idx[sorted_dest, pos] = order
      # Cache the NUMPY array: a jnp array materialized during a jit
      # trace is a tracer, and caching it on self leaks it into later
      # calls (UnexpectedTracerError). Numpy indices gather fine.
      self._segment_plan = idx
    return self._segment_plan

  def forward_reduce(self, weights, semiring: semirings.Semiring):
    # Semiring-correct segment reduction (fixes reference SURVEY §2.2-Q4,
    # the hard-coded scatter_reduce('sum').max at reference
    # ``contexts.py:303-317``), as the sorted segment reduce SURVEY
    # §2.2-Q4 prescribes: arcs are gathered per destination state with a
    # precomputed [S, max_in_degree] index (padding points at a
    # semiring-zero dummy arc) and folded with ``semiring.sum`` — O(S *
    # max_in_degree) instead of the O(S^2 * V) dense one-hot routing
    # mask. Tiny DFAs keep the dense mask: a single masked reduce beats
    # a gather at small sizes and needs no concrete-table precompute.
    batch_dims = _check_reduce_shape(self.shape(), weights)
    num_states, vocab_size = self.shape()
    num_arcs = num_states * vocab_size
    zero = semiring.zeros([], semirings.value_dtype(weights))
    flat = jax.tree.map(
        lambda w: w.reshape(batch_dims + (num_arcs,)), weights)
    if num_arcs * num_states <= 1 << 16:
      onehot = self.next_state_table.reshape(num_arcs, 1) == jnp.arange(
          num_states)
      masked = jax.tree.map(
          lambda w, z: jnp.where(onehot, w[..., None], z), flat, zero)
      return semiring.sum(masked, axis=-2)
    idx = self._reduce_plan()
    padded = jax.tree.map(
        lambda w, z: jnp.concatenate(
            [w, jnp.broadcast_to(z, batch_dims + (1,))], axis=-1),
        flat, zero)
    gathered = jax.tree.map(lambda w: w[..., idx], padded)
    return semiring.sum(gathered, axis=-1)

  def backward_broadcast(self, weights):
    _check_broadcast_shape(self.shape()[0], weights)
    return jax.tree.map(lambda w: w[..., self.next_state_table], weights)
