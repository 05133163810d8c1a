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

"""Weight functions (neural arc weights), TPU-native.

Rebuild of the reference ``last_torch/weight_fns.py`` with explicit parameter
pytrees (flax-style ``init`` / ``apply``), fixing the reference defects where
``JointWeightFn`` re-created its projections inside every forward call
(``weight_fns.py:208-221``, SURVEY §2.2-Q1) and ``SharedEmbCacher`` returned
a module instead of an array (``weight_fns.py:241-242``, SURVEY §2.2-Q2).
Here parameters are ordinary pytrees, caches are always arrays (or None),
and every apply is a pure jittable function.

Weight functions are the only components in GNAT with trainable parameters.
They come in two parts:

* A ``WeightFn`` computes the arc weights for a given frame.
* A ``WeightFnCacher`` prepares static data that is expensive to compute but
  frame-independent (e.g. the context embeddings of the shared-rnn weight
  function), so it can be computed once and reused, e.g. across an entire
  inference pass (reference rationale ``weight_fns.py:26-38``).
"""

from __future__ import annotations

import abc
import dataclasses
import functools
from typing import Any, Callable, Generic, Optional, TypeVar

import jax
import jax.numpy as jnp

from last_torch_tpu.ops import joint_head
from last_torch_tpu.ops import numerator_scan
from last_torch_tpu.utils import rnn

T = TypeVar('T')
Params = Any


class WeightFn(abc.ABC, Generic[T]):
  """Interface for weight functions — the neural arc-weight producers.

  Given one input frame (and optionally one context state), a WeightFn
  emits the blank and lexical arc weights the lattice DPs consume. Each
  WeightFn is paired with a WeightFnCacher supplying its frame-independent
  static data (e.g. JointWeightFn with SharedEmbCacher or
  SharedRNNCacher); reference contract at ``weight_fns.py:42-83``.
  """

  @abc.abstractmethod
  def init(self, key: jax.Array, cache: T, frame: jnp.ndarray) -> Params:
    """Creates the parameter pytree given example cache/frame inputs."""

  @abc.abstractmethod
  def apply(self,
            params: Params,
            cache: T,
            frame: jnp.ndarray,
            state: Optional[jnp.ndarray] = None
            ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Computes arc weights for a given frame.

    Args:
      params: Parameter pytree from ``init``.
      cache: Cached data from the corresponding WeightFnCacher.
      frame: [batch_dims..., feature_size] input frame.
      state: None or int32 array broadcastable to [batch_dims...]. If None,
        compute arc weights for all context states. Otherwise, compute arc
        weights for the specified context state.

    Returns:
      (blank, lexical) tuple.

      If state is None:
      - blank: [batch_dims..., num_context_states] blank arc weights.
      - lexical: [batch_dims..., num_context_states, vocab_size] lexical arc
        weights; lexical[..., p, y] is the weight of label y+1 from state p.

      If state is not None:
      - blank: [batch_dims...] blank arc weights from ``state``.
      - lexical: [batch_dims..., vocab_size] lexical arc weights.
    """

  def __call__(self, params, cache, frame, state=None):
    return self.apply(params, cache, frame, state)

  def label_weights(self, params, cache, frames, states, next_labels):
    """Optional fast path for string-intersection weights.

    Computes, for every (label position u, frame t), the blank weight and
    the lexical weight of ONE specific label — the quantities needed by the
    numerator DP (``RecognitionLattice._string_forward``). Implementations
    can avoid materializing the full ``[*, T, vocab_size]`` lexical tensor
    per position (e.g. by gathering the needed vocab-head column before the
    joint contraction).

    Args:
      params: Parameter pytree.
      cache: Cache data.
      frames: [batch_dims..., max_num_frames, feature_size] frames.
      states: [batch_dims..., num_positions] int32 context states.
      next_labels: [batch_dims..., num_positions] int32 labels in
        [0, vocab_size]; position weights for label 0 may be arbitrary
        (they are masked out downstream).

    Returns:
      None (no fast path; the caller falls back to the generic route), or
      (blank, lexical) of shape [batch_dims..., num_positions,
      max_num_frames] each.
    """
    del params, cache, frames, states, next_labels
    return None


class WeightFnCacher(abc.ABC, Generic[T]):
  """Interface for weight function cachers."""

  @abc.abstractmethod
  def init(self, key: jax.Array) -> Params:
    """Creates the parameter pytree."""

  @abc.abstractmethod
  def apply(self, params: Params) -> T:
    """Builds the cached data (always an array pytree, never a module)."""

  def __call__(self, params):
    return self.apply(params)


def hat_normalize(blank: jnp.ndarray,
                  lexical: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Local normalization from the Hybrid Autoregressive Transducer paper.

  The sigmoid of the blank weight is the probability of blank; lexical
  probabilities share the remaining mass through a log-softmax. Stable
  formulation via log-sigmoid (the reference's naive ``log(1 + exp(b))``
  at ``weight_fns.py:114`` overflows for large blank weights).

  Args:
    blank: [batch_dims...] blank weight.
    lexical: [batch_dims..., vocab_size] lexical weights.

  Returns:
    Normalized (blank, lexical) weights, with
    exp(blank) + sum(exp(lexical)) == 1.
  """
  normalized_blank = jax.nn.log_sigmoid(blank)
  normalized_lexical = (
      jax.nn.log_softmax(lexical, axis=-1) +
      jax.nn.log_sigmoid(-blank)[..., None])
  return normalized_blank, normalized_lexical


def log_softmax_normalize(
    blank: jnp.ndarray,
    lexical: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Joint log-softmax normalization: one distribution over all arcs.

  Blank and lexical weights are normalized together, so the outputs form
  a single log-probability distribution over the 1 + vocab_size arcs
  (reference ``weight_fns.py:120-136``).

  Args:
    blank: [batch_dims...] blank weight.
    lexical: [batch_dims..., vocab_size] lexical weights.

  Returns:
    Normalized (blank, lexical) log-probabilities.
  """
  all_weights = jnp.concatenate([blank[..., None], lexical], axis=-1)
  all_weights = jax.nn.log_softmax(all_weights, axis=-1)
  return all_weights[..., 0], all_weights[..., 1:]


class LocallyNormalizedWeightFn(WeightFn[T]):
  """Wrapper turning any weight function into a locally normalized one.

  This is the recommended way of obtaining a locally normalized weight
  function. The type is load-bearing: RecognitionLattice checks
  ``isinstance(weight_fn, LocallyNormalizedWeightFn)`` to skip the
  denominator computation in the loss (reference ``lattices.py:178-179``).

  The normalize function must be mathematically correct: with (blank,
  lexical) the produced weights, ``exp(blank) + sum(exp(lexical), -1)``
  should be approximately 1 (reference contract ``weight_fns.py:146-151``).

  Modeling caveat: local normalization is per ARC set, so with
  ``FrameLabelDependent`` alignments (where an emission multiplies both
  a lexical and the frame's blank weight) the per-frame path mass sums
  to less than 1, and at ``context_size=0`` — where the blank
  probability cannot condition on "already emitted this frame" — the
  achievable sequence NLL is bounded away from 0 (an emitting frame
  contributes at most ``max_b (1-b)·p_y·b = 1/4``). For textbook CTC
  use ``FrameDependent``; see ``examples/train_ctc.py`` and the pinned
  oracle test ``tests/test_models.py::
  test_ctc_model_loss_matches_numpy_oracle``.

  Attributes:
    weight_fn: Underlying weight function.
    normalize: Callable producing normalized log-probabilities from (blank,
      lexical) weights, e.g. hat_normalize or log_softmax_normalize.
  """

  def __init__(self,
               weight_fn: WeightFn[T],
               normalize: Callable[[jnp.ndarray, jnp.ndarray],
                                   tuple[jnp.ndarray, jnp.ndarray]]
               = hat_normalize):
    self.weight_fn = weight_fn
    self.normalize = normalize

  def init(self, key, cache, frame):
    return self.weight_fn.init(key, cache, frame)

  def apply(self, params, cache, frame, state=None):
    blank, lexical = self.weight_fn.apply(params, cache, frame, state)
    return self.normalize(blank, lexical)

  def label_weights(self, params, cache, frames, states, next_labels):
    # Fast numerator path for the locally normalized (e.g. HAT) loss —
    # the reference's cheap training path, where the loss is numerator-only
    # (reference ``lattices.py:178-179``). The full vocab head must run
    # once per (label position, frame) pair to obtain the local
    # normalizer, so the matmul FLOPs are fixed at 2*B*T*(U+1)*h*V; what
    # is free is the loop order. Scanning over FRAMES (not positions)
    # keeps every per-step tensor small — the [*, U+1, V] logits are
    # ~16x smaller than the [*, T, V] a position-major scan materializes
    # at headline shapes, and reverse-mode's carried cotangent is the
    # [*, U+1, h] projected-context gradient (6.6 MB) instead of the
    # [*, T, h] projected-frames gradient (105 MB). Measured on v5e at
    # headline shapes: the full HAT train step went 420.7 ms -> 258.9 ms
    # (1.63x; benchmarks/tpu_hat_numerator_bench.py, BASELINE.md).
    # The needed label column is gathered from the same logits tensor
    # (normalizer and column exactly consistent), and each step is
    # rematerialized rather than saved for autodiff. Covers
    # JointWeightFn inner weight functions with the two standard
    # normalizers; anything else falls back to the generic route.
    if type(self.weight_fn) is not JointWeightFn:
      return None
    if self.normalize not in (hat_normalize, log_softmax_normalize):
      return None
    wf = self.weight_fn
    hat = self.normalize is hat_normalize
    if numerator_scan.supported(wf, cache, frames, states, next_labels):
      # Whole-sequence fused numerator kernel (T in the Pallas grid):
      # same values/contract, keeps the per-frame [B, U+1, V] logits and
      # joint in VMEM instead of HBM. See ops/numerator_scan.py.
      return numerator_scan.label_weights(wf, params, cache, frames,
                                          states, next_labels, hat)
    y = jnp.maximum(next_labels, 1) - 1  # [batch..., U1]
    projected_frames = wf._mm(frames, params['frame_proj'])
    projected_context = wf._mm(cache, params['context_proj'])[states]

    def per_frame(carry, pf_t):  # pf_t: [batch..., h]
      joint = jnp.tanh(projected_context + pf_t[..., None, :])  # [.., U1, h]
      blank = wf._mm(joint, params['blank_w'][:, None])[..., 0] + params[
          'blank_b']
      lex = wf._mm(joint, params['vocab_w']) + params['vocab_b']
      z = jax.scipy.special.logsumexp(lex, axis=-1)  # [batch..., U1]
      lex_y = jnp.take_along_axis(lex, y[..., None], axis=-1)[..., 0]
      if hat:
        nb = jax.nn.log_sigmoid(blank)
        nl = lex_y - z + jax.nn.log_sigmoid(-blank)
      else:
        z_all = jnp.logaddexp(blank, z)
        nb = blank - z_all
        nl = lex_y - z_all
      return carry, (nb, nl)

    # Rematerialize: the per-frame [*, U1, V] logits must not be saved.
    _, (blank, lexical) = jax.lax.scan(
        jax.checkpoint(per_frame,
                       policy=jax.checkpoint_policies.nothing_saveable),
        (), jnp.moveaxis(projected_frames, -2, 0))
    # [T, batch..., U1] -> [batch..., U1, T]
    from_front = lambda x: jnp.moveaxis(x, 0, -1)
    return from_front(blank), from_front(lexical)


@dataclasses.dataclass(frozen=True)
class JointWeightFn(WeightFn[jnp.ndarray]):
  r"""Common implementation of shared-emb and shared-rnn weight functions.

  Pair with SharedEmbCacher for shared-emb, or SharedRNNCacher for
  shared-rnn. More generally this works with any WeightFnCacher producing a
  [num_context_states, embedding_size] context embedding table.

  Parameters (all persistent, fixing reference SURVEY §2.2-Q1):
  - context_proj: [embedding_size, hidden_size] (no bias)
  - frame_proj: [feature_size, hidden_size] (no bias)
  - blank_w: [hidden_size], blank_b: [] — blank head
  - vocab_w: [hidden_size, vocab_size], vocab_b: [vocab_size] — vocab head

  The computation ``tanh(cache @ context_proj + frame @ frame_proj)``
  followed by the two heads maps onto two large MXU matmuls per frame; the
  per-state broadcast is a free XLA broadcast, not a loop.

  Attributes:
    vocab_size: Size of the lexical output vocabulary (excluding blank).
    hidden_size: Hidden layer size of the joint network.
    compute_dtype: Optional dtype for matmul inputs (e.g. jnp.bfloat16 to
      run the MXU at full rate); accumulation stays float32. None keeps
      the input dtype (full float32 precision).
  """

  vocab_size: int
  hidden_size: int
  compute_dtype: Any = None

  def _mm(self, a, b):
    """Matmul over the last axis of a: [..., i] @ [i, o] -> [..., o]."""
    if self.compute_dtype is not None:
      a = a.astype(self.compute_dtype)
      b = b.astype(self.compute_dtype)
    return jnp.einsum('...i,io->...o', a, b,
                      preferred_element_type=jnp.float32)

  def init(self, key, cache, frame):
    embedding_size = cache.shape[-1]
    feature_size = frame.shape[-1]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    h = self.hidden_size
    init_dense = jax.nn.initializers.lecun_normal()
    return {
        'context_proj': init_dense(k1, (embedding_size, h)),
        'frame_proj': init_dense(k2, (feature_size, h)),
        'blank_w': init_dense(k3, (h, 1))[:, 0],
        'blank_b': jnp.zeros(()),
        'vocab_w': init_dense(k4, (h, self.vocab_size)),
        'vocab_b': jnp.zeros((self.vocab_size,)),
    }

  def apply(self, params, cache, frame, state=None):
    context_embeddings = cache
    if joint_head.supported(self, cache, frame, state):
      # Fused joint+head Pallas kernel: on TPU the [batch, states, hidden]
      # joint tensor of the einsum route below is HBM traffic that
      # dominates large-S XLA lattice paths (trigram+, NextStateTable
      # DFAs); the kernel keeps it in VMEM. Same values up to MXU
      # contraction order.
      return joint_head.blank_lexical(self, params, cache, frame)
    if state is None:
      # [batch..., 1, hidden] + [num_states, hidden] broadcast.
      projected_frame = self._mm(frame, params['frame_proj'])[..., None, :]
      projected_context = self._mm(context_embeddings,
                                   params['context_proj'])
    else:
      state = jnp.broadcast_to(state, frame.shape[:-1])
      projected_frame = self._mm(frame, params['frame_proj'])
      projected_context = self._mm(context_embeddings[state],
                                   params['context_proj'])
    joint = jnp.tanh(projected_context + projected_frame)
    blank = self._mm(joint, params['blank_w'][:, None])[..., 0] + params[
        'blank_b']
    lexical = self._mm(joint, params['vocab_w']) + params['vocab_b']
    return blank, lexical

  def label_weights(self, params, cache, frames, states, next_labels):
    # Fast numerator path: the lexical weight of one known label is
    # joint . vocab_w[:, y], so gather the vocab-head column FIRST and
    # contract — O(h) per (position, frame) instead of the O(h*V) full
    # head matmul the generic route would compute and discard.
    y = jnp.maximum(next_labels, 1) - 1  # [batch..., U1]
    projected_frames = self._mm(frames, params['frame_proj'])
    projected_context = self._mm(cache, params['context_proj'])[states]
    vocab_cols = params['vocab_w'].T[y]  # [batch..., U1, h]
    vocab_bias = params['vocab_b'][y]  # [batch..., U1]

    def per_position(carry, inputs):
      pc_u, w_u, b_u = inputs  # [batch..., h], [batch..., h], [batch...]
      joint = jnp.tanh(pc_u[..., None, :] + projected_frames)
      blank = self._mm(joint, params['blank_w'][:, None])[..., 0] + params[
          'blank_b']
      lexical = jnp.einsum('...th,...h->...t', joint, w_u,
                           preferred_element_type=jnp.float32) + b_u[
                               ..., None]
      return carry, (blank, lexical)

    to_front = lambda x: jnp.moveaxis(x, -2, 0)
    # Rematerialize: without this, reverse-mode autodiff saves the
    # [batch, T, h] joint activation for every label position.
    _, (blank, lexical) = jax.lax.scan(
        jax.checkpoint(per_position,
                       policy=jax.checkpoint_policies.nothing_saveable),
        (),
        (to_front(projected_context), to_front(vocab_cols),
         jnp.moveaxis(vocab_bias, -1, 0)))
    # [U1, batch..., T] -> [batch..., U1, T]
    from_front = lambda x: jnp.moveaxis(x, 0, -2)
    return from_front(blank), from_front(lexical)


@dataclasses.dataclass(frozen=True)
class SharedEmbCacher(WeightFnCacher[jnp.ndarray]):
  """A learned, independent per-state context embedding table.

  The resulting [num_context_states, embedding_size] table can be used with
  JointWeightFn. The table itself is the parameter (fixing reference SURVEY
  §2.2-Q2: the cache is an array, not a module).

  Attributes:
    num_context_states: Number of context states.
    embedding_size: Embedding dimension.
  """

  num_context_states: int
  embedding_size: int

  def init(self, key):
    return {
        'embedding':
            jax.random.normal(
                key, (self.num_context_states, self.embedding_size))
    }

  def apply(self, params):
    return params['embedding']


class SharedRNNCacher(WeightFnCacher[jnp.ndarray]):
  """Builds a context embedding table by running n-gram labels through an RNN.

  Usually used with ``last_torch_tpu.contexts.FullNGram``, where
  ``num_context_states = sum(vocab_size**i for i in range(context_size+1))``.
  Row order matches FullNGram's lexicographic state ids: the table is built
  breadth-first — the start token embedding first, then each n-gram level
  obtained by tiling the previous level's RNN state vocab_size times and
  feeding the label embeddings (reference ``weight_fns.py:265-294``; here
  the levels are jittable batched cell applications, and the rows are the
  cell *outputs* — the reference's use of the LSTM cell state at
  ``weight_fns.py:274-292`` is a quirk, not the documented intent).

  Attributes:
    vocab_size: Lexical vocabulary size.
    context_size: Maximum n-gram order.
    rnn_size: RNN hidden size (the embedding table width).
    rnn_embedding_size: Label embedding size fed to the RNN.
    rnn_cell: Optional custom RNN cell; defaults to LSTMCell.
  """

  def __init__(self,
               vocab_size: int,
               context_size: int,
               rnn_size: int,
               rnn_embedding_size: int,
               rnn_cell: Optional[rnn.RNNCellBase] = None):
    self.vocab_size = vocab_size
    self.context_size = context_size
    self.rnn_size = rnn_size
    self.rnn_embedding_size = rnn_embedding_size
    self.rnn_cell = rnn_cell or rnn.LSTMCell(
        input_size=rnn_embedding_size, hidden_size=rnn_size)

  def init(self, key):
    k_emb, k_cell = jax.random.split(key)
    return {
        'embedding':
            jax.random.normal(
                k_emb, (self.vocab_size + 1, self.rnn_embedding_size)),
        'cell': self.rnn_cell.init(k_cell),
    }

  def apply(self, params):
    embedding = params['embedding']
    cell_params = params['cell']
    cell = self.rnn_cell
    v = self.vocab_size

    # Start (empty n-gram) state: feed the start token 0 from the zero state.
    state = cell.initial_state(1, embedding.dtype)
    out, state = cell.apply(cell_params, embedding[jnp.array([0])], state)
    parts = [out]
    for i in range(self.context_size):
      # Level i+1 enumerates all (i+1)-grams in lexicographic order: parent
      # state index k // v paired with label (k % v) + 1.
      labels = jnp.tile(jnp.arange(1, v + 1), v**i)
      inputs = embedding[labels]
      tiled_state = jax.tree.map(
          lambda s: jnp.repeat(s, v, axis=0), state)
      out, state = cell.apply(cell_params, inputs, tiled_state)
      parts.append(out)
    return jnp.concatenate(parts, axis=0)


class NullCacher(WeightFnCacher[type(None)]):
  """A cacher that simply returns None.

  Mainly used with TableWeightFn for unit testing.
  """

  def init(self, key):
    return {}

  def apply(self, params):
    return None


class TableWeightFn(WeightFn[type(None)]):
  """Weight function that looks up a fixed table; useful for testing.

  Attributes:
    table: [batch_dims..., input_vocab_size, num_context_states,
      1 + vocab_size] arc weight table. For each input frame, element 0 of
      the feature vector is cast to an integer "input label" used to look up
      the weights: blank arc weights at ``table[..., 0]``, lexical arcs at
      ``table[..., 1:]``.
  """

  def __init__(self, table):
    self.table = jnp.asarray(table)

  def init(self, key, cache, frame):
    return {}

  def apply(self, params, cache, frame, state=None):
    del params, cache
    *batch_dims, _, num_context_states, _ = self.table.shape
    batch_dims = tuple(batch_dims)
    if frame.shape[:-1] != batch_dims:
      raise ValueError(f'frame should have batch_dims={batch_dims} but '
                       f'got ({frame.shape[:-1]})')

    input_label = frame[..., 0].astype(jnp.int32)
    # Exact gathers (no one-hot matmuls): tests rely on bit-exact values.
    weights = jnp.take_along_axis(
        self.table, input_label[..., None, None, None], axis=-3)
    weights = jnp.squeeze(weights, axis=-3)  # [batch..., states, 1 + V]

    if state is not None:
      state = jnp.broadcast_to(state, batch_dims).astype(jnp.int32)
      weights = jnp.take_along_axis(
          weights, state[..., None, None], axis=-2)
      weights = jnp.squeeze(weights, axis=-2)  # [batch..., 1 + V]

    blank = weights[..., 0]
    lexical = weights[..., 1:]
    return blank, lexical
