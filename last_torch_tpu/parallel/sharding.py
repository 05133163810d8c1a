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

"""SPMD sharding for GNAT training over a TPU mesh.

The reference is single-process with no distributed code (SURVEY §2, §5);
the TPU-native scale-out story is jax.sharding + jit over a
``Mesh('data', 'model')``:

* data axis: batch parallelism — the per-sequence lattice DPs are
  embarrassingly parallel over the batch; gradients all-reduce over ICI
  automatically inside jit.
* model axis: tensor parallelism over the vocabulary — the joint network's
  vocab head ``[hidden, V]`` and the encoder FFN/QKV are sharded on the
  model axis, so the big per-frame lexical weight tensor ``[B, S, V]`` is
  computed and consumed shard-local; only the tiny per-state logsumexp
  partials cross ICI.

Everything goes through ``jax.jit`` with NamedSharding constraints — XLA
inserts the collectives (psum/all-gather/reduce-scatter); there is no
hand-written transport layer, matching how TPU software is actually built.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any

# Parameter sharding rules: (regex over the param path, PartitionSpec).
# First match wins; default is full replication.
GNAT_PARAM_RULES = (
    # Joint network vocab head: shard the vocabulary.
    (r'.*weight_fn.*vocab_w$', P(None, 'model')),
    (r'.*weight_fn.*vocab_b$', P('model')),
    # Encoder: Megatron-style FFN / attention sharding. The Conformer
    # macaron FFN (ffn1) shards the same way; its convolution-module
    # parameters (conv_in/conv_depth/conv_out) stay replicated on
    # purpose — conv_in's GLU pairs columns [0:d] with [d:2d], which a
    # contiguous column split would cross-shard, and the three tensors
    # together are small relative to the FFNs.
    (r'.*ffn1?_in$', P(None, 'model')),
    (r'.*ffn1?_out$', P('model', None)),
    (r'.*qkv$', P(None, 'model')),
    (r'.*attn_out$', P('model', None)),
)


def make_mesh(num_devices: Optional[int] = None,
              model_parallel: int = 1,
              devices=None) -> Mesh:
  """Creates a ('data', 'model') mesh.

  Args:
    num_devices: Total devices to use; defaults to all.
    model_parallel: Size of the model axis (must divide num_devices).

  Returns:
    A ``jax.sharding.Mesh`` with axes ('data', 'model').
  """
  devices = devices if devices is not None else jax.devices()
  if num_devices is not None:
    devices = devices[:num_devices]
  n = len(devices)
  if n % model_parallel != 0:
    raise ValueError(f'model_parallel={model_parallel} must divide the '
                     f'device count {n}')
  mesh_devices = np.asarray(devices).reshape(n // model_parallel,
                                             model_parallel)
  return Mesh(mesh_devices, axis_names=('data', 'model'))


def _path_str(path) -> str:
  parts = []
  for entry in path:
    if hasattr(entry, 'key'):
      parts.append(str(entry.key))
    elif hasattr(entry, 'idx'):
      parts.append(str(entry.idx))
    else:
      parts.append(str(entry))
  return '/'.join(parts)


def param_shardings(params: Params, mesh: Mesh,
                    rules=GNAT_PARAM_RULES) -> Params:
  """Builds a NamedSharding pytree for params from path-regex rules."""

  def shard_one(path, leaf):
    name = _path_str(path)
    for pattern, spec in rules:
      if re.match(pattern, name) and np.ndim(leaf) == len(spec):
        return NamedSharding(mesh, spec)
    return NamedSharding(mesh, P())

  return jax.tree_util.tree_map_with_path(shard_one, params)


def batch_shardings(mesh: Mesh) -> NamedSharding:
  """Sharding for batch-leading arrays: split over the data axis."""
  return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_params(params: Params, mesh: Mesh,
                 rules=GNAT_PARAM_RULES) -> Params:
  """Places parameters onto the mesh according to the rules."""
  shardings = param_shardings(params, mesh, rules)
  return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(batch: Params, mesh: Mesh) -> Params:
  """Places batch arrays onto the mesh, split over the data axis."""
  sharding = batch_shardings(mesh)
  return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_sharded_train_step(model, optimizer, mesh: Mesh,
                            rules=GNAT_PARAM_RULES):
  """Builds a jitted, mesh-sharded GNAT train step.

  The returned callable has signature
  ``(state, frames, num_frames, labels, num_labels) -> (state, loss)``
  with the state sharded per the parameter rules and batch inputs split over
  the data axis. XLA inserts the gradient all-reduces (data axis) and the
  vocab-partial collectives (model axis).

  Args:
    model: ``last_torch_tpu.models.gnat.GNATModel``.
    optimizer: optax.GradientTransformation.
    mesh: ('data', 'model') mesh from ``make_mesh``.
    rules: Parameter sharding rules.

  Returns:
    (train_step_fn, shard_state_fn): the jitted step, and a helper that
    places a fresh ``GNATTrainState`` onto the mesh.
  """
  from last_torch_tpu.models import gnat as gnat_lib  # avoid import cycle

  def step_fn(state, frames, num_frames, labels, num_labels):
    return gnat_lib.train_step(model, optimizer, state, frames, num_frames,
                               labels, num_labels)

  data = batch_shardings(mesh)

  def shard_state(state):
    params = shard_params(state.params, mesh, rules)
    # Optimizer state is replicated (scalars + moments).
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), state.opt_state)
    return gnat_lib.GNATTrainState(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(state.step, replicated(mesh)))

  jitted = jax.jit(
      step_fn,
      in_shardings=(None, data, data, data, data),
      donate_argnums=(0,))
  return jitted, shard_state


def make_tp_train_step(model, optimizer, mesh: Mesh,
                       rules=GNAT_PARAM_RULES, interpret: bool = False):
  """Tensor-parallel train step with the lattice loss vocab-sharded.

  Like ``make_sharded_train_step`` (jit + NamedSharding; the encoder's
  Megatron sharding and the gradient collectives come from the SPMD
  partitioner), but the recognition-lattice loss runs as an explicit
  ``jax.shard_map`` island over the ('data', 'model') mesh: each device
  holds its vocab shard of the joint-network head and computes the
  denominator with the per-frame ``frame_reduce`` Pallas kernel
  (``ops.sharded_scan``), exchanging only the tiny per-frame reductions
  over ICI. This keeps the O(B*S*V) lexical work sharded AND on the
  fused-kernel path — the jit-only step would force the XLA lattice scan.

  Args:
    model: ``last_torch_tpu.models.gnat.GNATModel``; its lattice must be
      covered by ``sharded_scan.tp_supported``.
    optimizer: optax.GradientTransformation.
    mesh: ('data', 'model') mesh from ``make_mesh``.
    rules: Parameter sharding rules.
    interpret: Run the per-frame kernels in interpreter mode (CPU-mesh
      tests).

  Returns:
    (train_step_fn, shard_state_fn), as ``make_sharded_train_step``.
  """
  from last_torch_tpu.models import gnat as gnat_lib  # avoid import cycle
  from last_torch_tpu.ops import sharded_scan

  if not sharded_scan.tp_supported(model.lattice):
    raise ValueError('model.lattice is not covered by the tensor-parallel '
                     'lattice loss; use make_sharded_train_step')

  lattice_params_shape = jax.eval_shape(
      lambda: model.lattice.init(jax.random.PRNGKey(0),
                                 model.config.encoder_size))
  lattice_spec = jax.tree_util.tree_map_with_path(
      lambda path, leaf: _LATTICE_TP_SPECS.get(
          _path_str(path).rsplit('/', 1)[-1], P()),
      lattice_params_shape)

  def island(lattice_params, encoded, num_frames, labels, num_labels):
    per_seq = sharded_scan.tp_lattice_loss(
        model.lattice, lattice_params, encoded, num_frames, labels,
        num_labels, model_axis='model', interpret=interpret)
    return per_seq

  def loss_fn(params, frames, num_frames, labels, num_labels):
    encoded = model.encoder.apply(params['encoder'], frames, num_frames)
    per_seq = jax.shard_map(
        island,
        mesh=mesh,
        in_specs=(lattice_spec, P('data'), P('data'), P('data'),
                  P('data')),
        out_specs=P('data'),
        check_vma=False)(params['lattice'], encoded, num_frames, labels,
                         num_labels)
    finite = jnp.isfinite(per_seq)
    per_seq = jnp.where(finite, per_seq, 0.0)
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(finite), 1)

  def step_fn(state, frames, num_frames, labels, num_labels):
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, frames, num_frames, labels, num_labels)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    return gnat_lib.GNATTrainState(
        params=new_params, opt_state=new_opt_state,
        step=state.step + 1), loss

  data = batch_shardings(mesh)

  def shard_state(state):
    params = shard_params(state.params, mesh, rules)
    opt_state = jax.tree.map(
        lambda x: jax.device_put(x, replicated(mesh)), state.opt_state)
    return gnat_lib.GNATTrainState(
        params=params,
        opt_state=opt_state,
        step=jax.device_put(state.step, replicated(mesh)))

  jitted = jax.jit(
      step_fn,
      in_shardings=(None, data, data, data, data),
      donate_argnums=(0,))
  return jitted, shard_state


# Lattice parameter names sharded inside the tensor-parallel island;
# everything else is replicated there.
_LATTICE_TP_SPECS = {
    'vocab_w': P(None, 'model'),
    'vocab_b': P('model'),
}


def make_shard_map_train_step(model, optimizer, mesh: Mesh,
                              axis_name: str = 'data'):
  """Builds a manually data-parallel train step with ``jax.shard_map``.

  Unlike ``make_sharded_train_step`` (jit + sharding constraints, letting
  the SPMD partitioner place collectives), this runs the whole loss +
  gradient computation per device on its local batch shard and all-reduces
  gradients explicitly with ``psum`` over ICI. Use this when the loss
  contains manually-partitioned kernels (the fused Pallas scan): XLA's
  auto-partitioner cannot split a custom call across the batch, but under
  shard_map each device simply runs the kernel on its own shard.

  Parameters and optimizer state are replicated.

  Returns:
    A jitted callable ``(state, frames, num_frames, labels, num_labels) ->
    (state, loss)`` with batch args sharded over ``axis_name``.
  """
  from last_torch_tpu.models import gnat as gnat_lib  # avoid import cycle

  def local_step(state, frames, num_frames, labels, num_labels):
    def mean_loss(params):
      per_seq = model.loss(params, frames, num_frames, labels, num_labels)
      finite = jnp.isfinite(per_seq)
      per_seq = jnp.where(finite, per_seq, 0.0)
      # Sum locally; normalize by the global feasible count after psum.
      return jnp.sum(per_seq), jnp.sum(finite)

    (loss_sum, count), grads = jax.value_and_grad(
        mean_loss, has_aux=True)(state.params)
    loss_sum = jax.lax.psum(loss_sum, axis_name)
    count = jnp.maximum(jax.lax.psum(count, axis_name), 1)
    grads = jax.lax.psum(grads, axis_name)
    grads = jax.tree.map(lambda gr: gr / count, grads)
    loss = loss_sum / count
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = gnat_lib.GNATTrainState(
        params=new_params, opt_state=new_opt_state, step=state.step + 1)
    return new_state, loss

  def step(state, frames, num_frames, labels, num_labels):
    state_spec = jax.tree.map(lambda _: P(), state)
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name)),
        out_specs=(state_spec, P()),
        check_vma=False)
    return fn(state, frames, num_frames, labels, num_labels)

  return jax.jit(step, donate_argnums=(0,))


def make_shard_map_risk_train_step(model, optimizer, mesh: Mesh,
                                   axis_name: str = 'data',
                                   num_samples: int = 4,
                                   estimator: str = 'mwer',
                                   nll_weight: float = 0.0):
  """Data-parallel expected-risk (MWER) train step with ``jax.shard_map``.

  Each device encodes its local batch shard, draws exact posterior path
  samples with PRNG keys folded per GLOBAL batch row
  (``risk.per_example_keys`` with ``offset = axis_index * local_batch``),
  and computes the local expected-risk (+ optional NLL) contribution;
  gradients and the scalar objective ``psum`` over ICI. Because the keys
  depend only on global row indices, the sampled paths — and therefore
  the loss and gradients — match the single-device
  ``gnat.risk_train_step(..., per_example_keys=True)`` exactly (up to
  float reduction order).

  Parameters and optimizer state are replicated; ``key`` is replicated.

  Returns:
    A jitted callable ``(state, frames, num_frames, labels, num_labels,
    key) -> (state, metrics)`` with batch args sharded over
    ``axis_name`` and metrics matching ``gnat.risk_train_step``.
  """
  from last_torch_tpu import risk as risk_lib
  from last_torch_tpu.models import gnat as gnat_lib  # avoid import cycle

  axis_size = mesh.shape[axis_name]

  def local_step(state, frames, num_frames, labels, num_labels, key):
    local_batch = num_frames.shape[0]
    global_batch = local_batch * axis_size

    def loss_fn(params):
      encoded = model.encoder.apply(params['encoder'], frames, num_frames)
      cache = model.lattice.build_cache(params['lattice'])
      offset = jax.lax.axis_index(axis_name) * local_batch
      row_keys = risk_lib.per_example_keys(key, local_batch, offset)
      er, aux = risk_lib.sampled_risk_loss_per_example(
          model.lattice, params['lattice'], encoded, num_frames, labels,
          num_labels, row_keys, num_samples=num_samples,
          estimator=estimator, cache=cache)
      metrics = {
          'mean_risk': jax.lax.psum(jnp.sum(aux['mean_risk']), axis_name)
                       / global_batch
      }
      total = jnp.sum(er) / global_batch
      if nll_weight:
        per_seq = model.lattice(
            params['lattice'], frames=encoded, num_frames=num_frames,
            labels=labels, num_labels=num_labels, cache=cache)
        finite = jnp.isfinite(per_seq)
        count = jnp.maximum(
            jax.lax.psum(jnp.sum(finite), axis_name), 1)
        nll = (jax.lax.psum(jnp.sum(jnp.where(finite, per_seq, 0.0)),
                            axis_name) / count)
        metrics['nll'] = nll
        # Each device adds its 1/axis_size share of the (already global)
        # NLL term so the post-psum total counts it exactly once; the
        # grad-side accounting stays exact because psum transposes to an
        # identity cotangent broadcast (each local summand receives the
        # 1/axis_size-scaled cotangent, and the later grads-psum
        # reassembles the full dNLL).
        total = total + nll_weight * nll / axis_size
      return total, metrics

    (local_total, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    loss = jax.lax.psum(local_total, axis_name)
    grads = jax.lax.psum(grads, axis_name)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = gnat_lib.GNATTrainState(
        params=new_params, opt_state=new_opt_state, step=state.step + 1)
    return new_state, dict(metrics, loss=loss)

  def step(state, frames, num_frames, labels, num_labels, key):
    state_spec = jax.tree.map(lambda _: P(), state)
    fn = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(state_spec, P(axis_name), P(axis_name), P(axis_name),
                  P(axis_name), P()),
        out_specs=(state_spec, P()),
        check_vma=False)
    return fn(state, frames, num_frames, labels, num_labels, key)

  return jax.jit(step, donate_argnums=(0,))
