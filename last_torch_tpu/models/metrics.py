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

"""Recognition-quality metrics: batched edit distance and error rates.

The reference library ships no evaluation metrics at all (its only
quality signal is the loss); production recognizers are judged by label /
word error rate, so this module provides the standard Levenshtein
machinery as jit-compatible batched code:

* ``edit_distance`` — padded batched Levenshtein distance. The DP runs as
  a ``lax.scan`` over reference positions; each row update is fully
  vectorized by rewriting the sequential insertion chain
  ``new[i] = min(base[i], new[i-1] + 1)`` as the min-plus prefix scan
  ``new[i] = i + cummin_k<=i(base[k] - k)`` — no per-cell Python, static
  shapes, O(B * U * V) elementwise work on the VPU.
* ``ErrorRateState`` / ``update_error_rate`` — a summable (total_edits,
  total_ref_labels) accumulator: sum across batches, hosts (psum) or
  shards, then divide once at the end, which is how WER must be
  aggregated (a mean of per-utterance rates is not the corpus rate).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def edit_distance(hyp: jnp.ndarray,
                  num_hyp: jnp.ndarray,
                  ref: jnp.ndarray,
                  num_ref: jnp.ndarray) -> jnp.ndarray:
  """Batched Levenshtein distance between padded label sequences.

  Args:
    hyp: [batch..., max_hyp] int labels; entries beyond ``num_hyp`` are
      ignored (any padding value is fine).
    num_hyp: [batch...] number of valid hypothesis labels.
    ref: [batch..., max_ref] int labels; entries beyond ``num_ref`` are
      ignored.
    num_ref: [batch...] number of valid reference labels.

  Returns:
    [batch...] int32 edit distances (substitutions + insertions +
    deletions) between ``hyp[..., :num_hyp]`` and ``ref[..., :num_ref]``.
  """
  hyp = jnp.asarray(hyp, jnp.int32)
  ref = jnp.asarray(ref, jnp.int32)
  num_hyp = jnp.asarray(num_hyp, jnp.int32)
  num_ref = jnp.asarray(num_ref, jnp.int32)
  batch_shape = hyp.shape[:-1]
  u = hyp.shape[-1]
  v = ref.shape[-1]
  hyp2 = hyp.reshape(-1, u)
  b = hyp2.shape[0]
  ref2 = ref.reshape(-1, v)
  nh = num_hyp.reshape(-1)
  nr = num_ref.reshape(-1)

  # d[j, i] = distance(hyp[:i], ref[:j]). Row j depends only on row j-1,
  # so scan over reference positions; DP entries at (i <= nh, j <= nr)
  # never read padded symbols, so extracting the (nh, nr) entry of the
  # full padded DP is exactly the prefix distance.
  row0 = jnp.broadcast_to(jnp.arange(u + 1, dtype=jnp.int32),
                          (b, u + 1))
  idx = jnp.arange(u + 1, dtype=jnp.int32)[None, :]  # [1, U+1]

  def step(row, inputs):
    j, ref_j = inputs  # scalar, [B]
    cost = (hyp2 != ref_j[:, None]).astype(jnp.int32)  # [B, U]
    # base[i] = min(delete ref_j: d[j-1, i] + 1,
    #               substitute:   d[j-1, i-1] + cost_i), base[0] = j.
    base = jnp.minimum(row[:, 1:] + 1, row[:, :-1] + cost)
    base = jnp.concatenate([jnp.full((b, 1), j, jnp.int32), base], axis=1)
    # Insertion chain new[i] = min(base[i], new[i-1] + 1) as a prefix
    # min-plus scan: new[i] = i + cummin_{k<=i}(base[k] - k).
    new = idx + jax.lax.cummin(base - idx, axis=1)
    return new, jnp.take_along_axis(new, nh[:, None], axis=1)[:, 0]

  js = jnp.arange(1, v + 1, dtype=jnp.int32)
  _, col = jax.lax.scan(step, row0, (js, jnp.moveaxis(ref2, -1, 0)))
  # col[j-1, b] = d[j, nh]; prepend d[0, nh] = nh.
  col = jnp.concatenate([nh[None, :], col], axis=0)  # [V+1, B]
  out = jnp.take_along_axis(col, nr[None, :], axis=0)[0]
  return out.reshape(batch_shape)


class ErrorRateState(NamedTuple):
  """Summable corpus error-rate accumulator.

  Add states together (or ``jax.lax.psum`` them across hosts/devices),
  then call ``error_rate`` once — the corpus rate is
  total_edits / total_ref_labels, NOT a mean of per-utterance rates.

  Totals are int64 when ``jax_enable_x64`` is on; otherwise int32, which
  silently wraps past ~2.1e9 accumulated edits / reference labels —
  enable x64 for corpora anywhere near that scale.
  """
  total_edits: jnp.ndarray      # [] int32/int64
  total_ref_labels: jnp.ndarray  # [] int32/int64
  num_sequences: jnp.ndarray    # [] int32

  def __add__(self, other: 'ErrorRateState') -> 'ErrorRateState':
    return ErrorRateState(
        self.total_edits + other.total_edits,
        self.total_ref_labels + other.total_ref_labels,
        self.num_sequences + other.num_sequences)


def empty_error_rate_state() -> ErrorRateState:
  # int64 totals when available (see the class docstring's overflow note).
  import jax
  total_dtype = jnp.int64 if jax.config.jax_enable_x64 else jnp.int32
  zero = jnp.zeros((), total_dtype)
  return ErrorRateState(zero, zero, jnp.zeros((), jnp.int32))


def update_error_rate(state: ErrorRateState,
                      hyp: jnp.ndarray,
                      num_hyp: jnp.ndarray,
                      ref: jnp.ndarray,
                      num_ref: jnp.ndarray,
                      valid: jnp.ndarray | None = None) -> ErrorRateState:
  """Folds one padded batch into the accumulator.

  Args:
    state: Accumulator so far.
    hyp / num_hyp / ref / num_ref: As in ``edit_distance``.
    valid: Optional [batch...] bool mask of real (non-padding) sequences;
      use it when the last evaluation batch is padded up to a fixed size.

  Returns:
    The updated accumulator.
  """
  edits = edit_distance(hyp, num_hyp, ref, num_ref)
  num_ref = jnp.asarray(num_ref, jnp.int32)
  if valid is None:
    valid = jnp.ones(edits.shape, bool)
  edits = jnp.where(valid, edits, 0).astype(state.total_edits.dtype)
  refs = jnp.where(valid, num_ref, 0).astype(state.total_ref_labels.dtype)
  return ErrorRateState(
      state.total_edits + jnp.sum(edits),
      state.total_ref_labels + jnp.sum(refs),
      state.num_sequences + jnp.sum(valid.astype(jnp.int32)))


def error_rate(state: ErrorRateState) -> jnp.ndarray:
  """Corpus label error rate: total edits over total reference labels."""
  return state.total_edits / jnp.maximum(state.total_ref_labels, 1)
