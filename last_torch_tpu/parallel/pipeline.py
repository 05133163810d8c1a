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

"""Pipeline parallelism for the GNAT encoder over a TPU mesh.

The reference library is single-process with no distributed code (SURVEY
§2, §5); data, tensor (vocab), and sequence (time) parallelism live in
``parallel.sharding`` / ``parallel.sequence``. This module adds the fourth
classic axis: **pipeline parallelism** — encoder blocks staged across a
``'pipe'`` mesh axis, microbatches streamed through the stages GPipe-style,
activations hopping stage-to-stage over ICI via ``jax.lax.ppermute``.

The TPU-native shape of the idea:

* The schedule is a **single ``lax.scan`` over M + P - 1 ticks** inside one
  ``jax.shard_map`` — deterministic, trace-once, no host round trips. Each
  tick every device applies its stage's blocks to its current microbatch
  activation, then the activations rotate one stage over ICI.
* Each device holds ONLY its own stage's block parameters (the stacked
  [num_layers, ...] leaves are sharded over 'pipe'), so parameter memory
  scales down 1/P — the reason pipeline parallelism exists.
* The backward pass is **pure autodiff**: ``jax.grad`` through the scan +
  ``ppermute`` yields the reverse pipeline (cotangents rotate backward
  through the inverted permutation) with no hand-written schedule. Each
  tick is ``jax.checkpoint``-rematerialized, so the live residuals stay
  O(one microbatch activation) per device.
* The lattice loss runs on the LAST stage only (``lax.cond``-skipped
  elsewhere, like the sequence relay's inactive stages), consuming each
  microbatch the tick it finishes its final blocks.

Composes with data parallelism: give the mesh a ('data', 'pipe') layout
and batch rows shard over 'data' while blocks shard over 'pipe'.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def stack_layers(layers) -> Params:
  """[num_layers] list of per-block param dicts -> dict of [L, ...] arrays."""
  return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layers(stacked: Params, num_layers: int):
  """Inverse of ``stack_layers``."""
  return [jax.tree.map(lambda x, i=i: x[i], stacked)
          for i in range(num_layers)]


def make_pp_loss_fn(model, mesh: Mesh, num_microbatches: int,
                    pipe_axis: str = 'pipe',
                    data_axis: Optional[str] = None):
  """Builds the pipelined mean-loss callable.

  Args:
    model: ``last_torch_tpu.models.gnat.GNATModel``; its encoder's
      ``num_layers`` must divide evenly across the 'pipe' axis.
    mesh: Mesh containing ``pipe_axis`` (and optionally ``data_axis``).
    num_microbatches: GPipe microbatch count M; the per-device batch must
      divide by M. Larger M shrinks the pipeline bubble
      ((P - 1) / (M + P - 1) of ticks) at the cost of smaller matmuls.
    pipe_axis: Mesh axis name carrying the stages.
    data_axis: Optional mesh axis to also split the batch over.

  Returns:
    ``loss_fn(params, frames, num_frames, labels, num_labels) -> scalar``
    — the mean loss over feasible sequences, identical (up to float
    summation order) to ``model.mean_loss``; differentiable with
    ``jax.grad`` (autodiff reverses the pipeline through ppermute).
  """
  encoder = model.encoder
  num_stages = mesh.shape[pipe_axis]
  num_layers = encoder.num_layers
  if num_layers % num_stages != 0:
    raise ValueError(
        f'encoder_layers={num_layers} must divide across '
        f'{pipe_axis}={num_stages} stages')
  layers_per_stage = num_layers // num_stages
  m = num_microbatches
  data_parallel = mesh.shape[data_axis] if data_axis else 1

  def local_fn(stage_layers, shared, lattice_params, frames, num_frames,
               labels, num_labels):
    """Per-device pipelined program (inside shard_map)."""
    stage = jax.lax.axis_index(pipe_axis)
    local_batch, max_t = frames.shape[0], frames.shape[1]
    if local_batch % m != 0:
      raise ValueError(
          f'per-device batch {local_batch} must divide into '
          f'num_microbatches={m}')
    mbs = local_batch // m
    d = encoder.model_size

    def mb(x, j):
      return jax.lax.dynamic_slice_in_dim(x, j * mbs, mbs, axis=0)

    def tick(carry, t):
      x, loss_sum, count = carry
      # Stage 0 injects microbatch t while any remain; the wrap-around
      # activation it would otherwise receive from the last stage never
      # reaches the loss (it would need P - 1 more ticks than the scan
      # runs), so the rotation can stay a pure ring permute.
      inject_j = jnp.clip(t, 0, m - 1)
      x = jax.lax.cond(
          jnp.logical_and(stage == 0, t < m),
          lambda: encoder.embed(shared['input_proj'],
                                mb(frames, inject_j)).astype(x.dtype),
          lambda: x)
      # The microbatch THIS stage is holding at tick t entered the
      # pipeline at tick t - stage.
      j = jnp.clip(t - stage, 0, m - 1)
      nf = mb(num_frames, j)
      mask = jnp.arange(max_t) < nf[:, None]
      use_banded, attn_bias = encoder.attention_inputs(mask)
      for i in range(layers_per_stage):
        layer = jax.tree.map(lambda a, i=i: a[i], stage_layers)
        x = encoder.block(layer, x, mask, attn_bias, use_banded)

      # The last stage consumes its finished microbatch immediately:
      # final LN + recognition-lattice loss. Other stages (and bubble
      # ticks) skip the lattice entirely via lax.cond.
      def consume(y):
        encoded = encoder.finalize(shared['final_ln_scale'],
                                   shared['final_ln_bias'], y, mask)
        per_seq = model.lattice(lattice_params, frames=encoded,
                                num_frames=nf, labels=mb(labels, j),
                                num_labels=mb(num_labels, j))
        finite = jnp.isfinite(per_seq)
        return (jnp.sum(jnp.where(finite, per_seq, 0.0)),
                jnp.sum(finite.astype(jnp.float32)))

      done = t - (num_stages - 1)
      valid = jnp.logical_and(stage == num_stages - 1,
                              jnp.logical_and(done >= 0, done < m))
      dl, dc = jax.lax.cond(valid, consume,
                            lambda y: (jnp.float32(0), jnp.float32(0)), x)
      # Rotate activations one stage forward over ICI.
      perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
      x = jax.lax.ppermute(x, pipe_axis, perm)
      return (x, loss_sum + dl, count + dc), None

    x0 = jnp.zeros((mbs, max_t, d), encoder.dtype)
    (_, loss_sum, count), _ = jax.lax.scan(
        jax.checkpoint(tick),
        (x0, jnp.float32(0), jnp.float32(0)),
        jnp.arange(m + num_stages - 1))
    axes = (pipe_axis,) + ((data_axis,) if data_axis else ())
    return (jax.lax.psum(loss_sum, axes), jax.lax.psum(count, axes))

  data_spec = P(data_axis) if data_axis else P()

  def loss_fn(params, frames, num_frames, labels, num_labels):
    if frames.shape[0] % (m * data_parallel) != 0:
      raise ValueError(
          f'batch {frames.shape[0]} must divide into data_parallel='
          f'{data_parallel} x num_microbatches={m}')
    enc_params = params['encoder']
    stacked = stack_layers(enc_params['layers'])
    shared = {
        'input_proj': enc_params['input_proj'],
        'final_ln_scale': enc_params['final_ln_scale'],
        'final_ln_bias': enc_params['final_ln_bias'],
    }
    loss_sum, count = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(), P(), data_spec, data_spec, data_spec,
                  data_spec),
        out_specs=(P(), P()),
        check_vma=False)(stacked, shared, params['lattice'], frames,
                         num_frames, labels, num_labels)
    return loss_sum / jnp.maximum(count, 1.0)

  return loss_fn


def make_pp_encode_fn(model, mesh: Mesh, num_microbatches: int,
                      pipe_axis: str = 'pipe',
                      data_axis: Optional[str] = None):
  """Builds a pipelined ENCODE callable (no loss consumption).

  Same GPipe schedule as ``make_pp_loss_fn``, but the last stage writes
  each finished microbatch's final-LN output into an output buffer
  instead of consuming it with the lattice — the composition hook for
  pairing pipeline-parallel encoding with a differently-sharded lattice
  loss (pp x seq: ``make_pp_seq_train_step``). The buffer psums over the
  pipe axis (only the last stage writes), so the encoded frames come
  back replicated; autodiff reverses the pipeline as in the loss fn.

  Returns:
    ``encode(encoder_params, frames, num_frames) ->
    [batch, max_t, model_size]`` encoded frames (padding frames zero).
  """
  encoder = model.encoder
  num_stages = mesh.shape[pipe_axis]
  num_layers = encoder.num_layers
  if num_layers % num_stages != 0:
    raise ValueError(
        f'encoder_layers={num_layers} must divide across '
        f'{pipe_axis}={num_stages} stages')
  layers_per_stage = num_layers // num_stages
  m = num_microbatches
  data_parallel = mesh.shape[data_axis] if data_axis else 1

  def local_fn(stage_layers, shared, frames, num_frames):
    stage = jax.lax.axis_index(pipe_axis)
    local_batch, max_t = frames.shape[0], frames.shape[1]
    if local_batch % m != 0:
      raise ValueError(
          f'per-device batch {local_batch} must divide into '
          f'num_microbatches={m}')
    mbs = local_batch // m
    d = encoder.model_size

    def mb(x, j):
      return jax.lax.dynamic_slice_in_dim(x, j * mbs, mbs, axis=0)

    def tick(carry, t):
      x, out = carry
      inject_j = jnp.clip(t, 0, m - 1)
      x = jax.lax.cond(
          jnp.logical_and(stage == 0, t < m),
          lambda: encoder.embed(shared['input_proj'],
                                mb(frames, inject_j)).astype(x.dtype),
          lambda: x)
      j = jnp.clip(t - stage, 0, m - 1)
      nf = mb(num_frames, j)
      mask = jnp.arange(max_t) < nf[:, None]
      use_banded, attn_bias = encoder.attention_inputs(mask)
      for i in range(layers_per_stage):
        layer = jax.tree.map(lambda a, i=i: a[i], stage_layers)
        x = encoder.block(layer, x, mask, attn_bias, use_banded)

      def store(y):
        encoded = encoder.finalize(shared['final_ln_scale'],
                                   shared['final_ln_bias'], y, mask)
        return jax.lax.dynamic_update_slice_in_dim(
            out, encoded.astype(out.dtype), j * mbs, axis=0)

      done = t - (num_stages - 1)
      valid = jnp.logical_and(stage == num_stages - 1,
                              jnp.logical_and(done >= 0, done < m))
      out = jax.lax.cond(valid, store, lambda y: out, x)
      perm = [(i, (i + 1) % num_stages) for i in range(num_stages)]
      x = jax.lax.ppermute(x, pipe_axis, perm)
      return (x, out), None

    x0 = jnp.zeros((mbs, max_t, d), encoder.dtype)
    out0 = jnp.zeros((local_batch, max_t, d), jnp.float32)
    (_, out), _ = jax.lax.scan(
        jax.checkpoint(tick), (x0, out0), jnp.arange(m + num_stages - 1))
    # Only the last stage wrote; psum replicates over the pipe axis.
    return jax.lax.psum(out, pipe_axis)

  data_spec = P(data_axis) if data_axis else P()

  def encode(encoder_params, frames, num_frames):
    if frames.shape[0] % (m * data_parallel) != 0:
      raise ValueError(
          f'batch {frames.shape[0]} must divide into data_parallel='
          f'{data_parallel} x num_microbatches={m}')
    stacked = stack_layers(encoder_params['layers'])
    shared = {
        'input_proj': encoder_params['input_proj'],
        'final_ln_scale': encoder_params['final_ln_scale'],
        'final_ln_bias': encoder_params['final_ln_bias'],
    }
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(pipe_axis), P(), data_spec, data_spec),
        out_specs=data_spec,
        check_vma=False)(stacked, shared, frames, num_frames)

  return encode


def make_pp_seq_train_step(model, optimizer, mesh: Mesh,
                           num_microbatches: int,
                           pipe_axis: str = 'pipe',
                           seq_axis: str = 'seq',
                           data_axis: Optional[str] = None,
                           fused: str = 'never'):
  """Jitted train step composing pipeline and sequence parallelism.

  The encoder runs GPipe-pipelined over ``pipe_axis``
  (``make_pp_encode_fn``); the lattice loss — whose backward needs the
  per-frame alpha history — runs through the time-sharded relay over
  ``seq_axis`` (``parallel.sequence.loss_time_sharded``), so both the
  encoder parameters AND the lattice activations scale down with their
  respective axes. Gradients are plain reverse-mode through both
  shard_maps.

  Returns ``step(state, frames, num_frames, labels, num_labels) ->
  (state, loss)``.
  """
  import optax
  from last_torch_tpu.models import gnat as gnat_lib
  from last_torch_tpu.parallel import sequence

  encode = make_pp_encode_fn(model, mesh, num_microbatches,
                             pipe_axis=pipe_axis, data_axis=data_axis)

  def loss_fn(params, frames, num_frames, labels, num_labels):
    encoded = encode(params['encoder'], frames, num_frames)
    per_seq = sequence.loss_time_sharded(
        model.lattice, params['lattice'], encoded, num_frames, labels,
        num_labels, mesh, seq_axis, fused=fused, batch_axis=data_axis)
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

  data_sharding = NamedSharding(mesh, P(data_axis) if data_axis else P())
  return jax.jit(
      step_fn,
      in_shardings=(None, data_sharding, data_sharding, data_sharding,
                    data_sharding),
      donate_argnums=(0,))


def make_pp_train_step(model, optimizer, mesh: Mesh,
                       num_microbatches: int, pipe_axis: str = 'pipe',
                       data_axis: Optional[str] = None):
  """Builds a jitted pipeline-parallel GNAT train step.

  Signature matches the other ``make_*_train_step`` factories:
  ``(state, frames, num_frames, labels, num_labels) -> (state, loss)``.
  Gradients come from plain ``jax.value_and_grad`` through the shard_map
  pipeline (ppermute transposes to the reverse rotation; stage-sharded
  block gradients come back sharded, shared/lattice gradients psum over
  the mesh).
  """
  from last_torch_tpu.models import gnat as gnat_lib  # avoid import cycle
  import optax

  loss_fn = make_pp_loss_fn(model, mesh, num_microbatches,
                            pipe_axis=pipe_axis, data_axis=data_axis)

  def step_fn(state, frames, num_frames, labels, num_labels):
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, frames, num_frames, labels, num_labels)
    updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
    new_params = optax.apply_updates(state.params, updates)
    return gnat_lib.GNATTrainState(
        params=new_params, opt_state=new_opt_state,
        step=state.step + 1), loss

  data_sharding = NamedSharding(mesh, P(data_axis) if data_axis else P())
  jitted = jax.jit(
      step_fn,
      in_shardings=(None, data_sharding, data_sharding, data_sharding,
                    data_sharding),
      donate_argnums=(0,))
  return jitted


def make_pp_mesh(num_devices: Optional[int] = None,
                 pipeline_parallel: int = 2,
                 devices=None) -> Mesh:
  """Creates a ('data', 'pipe') mesh."""
  devices = devices if devices is not None else jax.devices()
  if num_devices is not None:
    devices = devices[:num_devices]
  n = len(devices)
  if n % pipeline_parallel != 0:
    raise ValueError(f'pipeline_parallel={pipeline_parallel} must divide '
                     f'the device count {n}')
  mesh_devices = np.asarray(devices).reshape(n // pipeline_parallel,
                                             pipeline_parallel)
  return Mesh(mesh_devices, axis_names=('data', 'pipe'))
