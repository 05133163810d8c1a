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

"""Minimal explicit-parameter RNN cells.

Used by ``last_torch_tpu.weight_fns.SharedRNNCacher`` (the n-gram context
embedding builder) and the example encoders in ``last_torch_tpu.models``.
Cells follow a simple functional convention:

* ``cell.init(key) -> params`` — parameter pytree.
* ``cell.initial_state(batch_size, dtype) -> state`` — zero carry.
* ``cell.apply(params, inputs, state) -> (outputs, next_state)`` — one step.

Everything is a pure jax function: safe under ``jit`` / ``scan`` / ``vmap``,
and the gate matmuls are fused into a single ``[in, 4*hidden]`` projection so
the MXU sees one large matmul per step instead of four small ones.
"""

from __future__ import annotations

import abc
import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


class RNNCellBase(abc.ABC):
  """Interface for explicit-parameter RNN cells."""

  @abc.abstractmethod
  def init(self, key: jax.Array) -> Any:
    """Creates the parameter pytree."""

  @abc.abstractmethod
  def initial_state(self, batch_size: int, dtype=jnp.float32) -> Any:
    """Creates the zero carry for a given batch size."""

  @abc.abstractmethod
  def apply(self, params: Any, inputs: jnp.ndarray,
            state: Any) -> tuple[jnp.ndarray, Any]:
    """Runs one step: (params, [batch, in], state) -> ([batch, out], state)."""


@dataclasses.dataclass(frozen=True)
class LSTMCell(RNNCellBase):
  """Standard LSTM cell with a fused 4-gate projection.

  Attributes:
    input_size: Input feature size.
    hidden_size: Hidden (and output) size.
  """

  input_size: int
  hidden_size: int

  def init(self, key):
    k_i, k_h = jax.random.split(key)
    h = self.hidden_size
    scale_i = 1.0 / jnp.sqrt(self.input_size)
    scale_h = 1.0 / jnp.sqrt(h)
    return {
        'w_i': jax.random.uniform(
            k_i, (self.input_size, 4 * h), minval=-scale_i, maxval=scale_i),
        'w_h': jax.random.uniform(
            k_h, (h, 4 * h), minval=-scale_h, maxval=scale_h),
        'b': jnp.zeros((4 * h,)),
    }

  def initial_state(self, batch_size, dtype=jnp.float32):
    shape = (batch_size, self.hidden_size)
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)

  def apply(self, params, inputs, state):
    h_prev, c_prev = state
    gates = inputs @ params['w_i'] + h_prev @ params['w_h'] + params['b']
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    # Unit forget-gate bias for healthier gradients early in training.
    c = jax.nn.sigmoid(f + 1.0) * c_prev + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, (h, c)
