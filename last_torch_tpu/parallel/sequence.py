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

"""Sequence (time-axis) sharded lattice forward — the alpha relay.

The recognition-lattice forward recursion is sequential in time, but its
carry is tiny: ``[batch, num_context_states]``. For sequences too long for
one chip's memory, the frames are sharded over a mesh axis and the alpha
carry is relayed between neighbor devices with ``lax.ppermute`` over ICI —
the lattice analogue of ring/context parallelism (SURVEY §5). Each device
stores only ``T / D`` frames; arc weights are (re)computed on the fly inside
the local scan, so nothing O(T * S * V) is ever materialized.

This is a memory-scaling construct: total sequential work is unchanged (the
recursion is inherently serial in T), but per-device frame residency drops
by the axis size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from last_torch_tpu import semirings


def shortest_distance_time_sharded(lattice, params, frames, num_frames,
                                   mesh: Mesh, axis_name: str,
                                   semiring=semirings.Log,
                                   cache=None,
                                   fused: str = 'never') -> jnp.ndarray:
  """Shortest distance with frames sharded over a time (sequence) mesh axis.

  Args:
    lattice: ``last_torch_tpu.RecognitionLattice``.
    params: Lattice parameter pytree.
    frames: [batch, max_num_frames, feature_size]; max_num_frames must be
      divisible by the size of ``axis_name``.
    num_frames: [batch] frame counts.
    mesh: Device mesh containing ``axis_name``.
    axis_name: The mesh axis to shard time over.
    semiring: Semiring for the shortest distance.
    cache: Optional prebuilt weight-fn cache.
    fused: 'never' runs each device's local block as the XLA scan;
      'auto' (TPU) / 'interpret' (CPU-mesh tests) runs it through the
      fused forward kernel chained via its ``alpha0`` input — covered
      configurations only (Log semiring, bigram JointWeightFn).
      FORWARD-ONLY: the plain kernel has no VJP, so use 'never' when
      differentiating through the sharded distance.

  Returns:
    [batch] shortest distance, replicated over the mesh.
  """
  if cache is None:
    cache = lattice.build_cache(params)
  from last_torch_tpu.ops import fused_scan
  from last_torch_tpu import alignments as alignments_lib
  use_kernel = False
  if fused != 'never':
    # Mirrors the dispatch in lattices.RecognitionLattice._forward
    # (backend resolution + supported() gate + interpret/bf16 dtype
    # choice below); keep the two in sync.
    backend = 'interpret' if fused == 'interpret' else jax.default_backend()
    use_kernel = fused_scan.supported(lattice, semiring, None, None, None,
                                      frames, backend)
  kernel_fd = isinstance(lattice.alignment, alignments_lib.FrameDependent)
  kernel_k = 0 if kernel_fd else getattr(lattice.alignment,
                                         'max_expansions', 0)
  num_devices = mesh.shape[axis_name]
  max_t = frames.shape[-2]
  if max_t % num_devices != 0:
    raise ValueError(f'max_num_frames={max_t} must be divisible by the '
                     f'{axis_name!r} axis size {num_devices}')
  local_t = max_t // num_devices
  num_align_states = lattice.alignment.num_states()
  num_context_states, _ = lattice.context.shape()
  num_frames = jnp.asarray(num_frames, jnp.int32)
  wf_params = params['weight_fn']

  def sharded(local_frames, num_frames, wf_params, cache):
    my_idx = jax.lax.axis_index(axis_name)
    batch = local_frames.shape[0]

    def local_scan(alpha):
      """Advances the recursion over this device's frame block."""
      if use_kernel:
        local_nf = jnp.clip(num_frames - my_idx.astype(jnp.int32) * local_t,
                            0, local_t)
        _, _, alpha_out = fused_scan.fused_shortest_distance_fwd(
            wf_params, cache, local_frames, local_nf,
            max_expansions=kernel_k,
            frame_dependent=kernel_fd,
            num_context_states=num_context_states,
            compute_dtype=(jnp.float32 if fused == 'interpret' else
                           jnp.bfloat16),
            interpret=fused == 'interpret',
            alpha0=alpha,
            return_final_alpha=True,
            with_history=False)
        return alpha_out

      def step(carry, frame):
        t, alpha = carry
        blank, lexical = lattice.weight_fn.apply(wf_params, cache, frame)
        blank = [blank] * num_align_states
        lexical = [lexical] * num_align_states
        next_alpha = lattice.alignment.forward(
            alpha=alpha,
            blank=blank,
            lexical=lexical,
            context=lattice.context,
            semiring=semiring)
        is_padding = (t >= num_frames)[..., None]
        next_alpha = semirings.where(is_padding, alpha, next_alpha)
        return (t + 1, next_alpha), None

      t_offset = my_idx.astype(jnp.int32) * local_t
      (_, alpha), _ = jax.lax.scan(
          jax.checkpoint(step,
                         policy=jax.checkpoint_policies.nothing_saveable),
          (t_offset, alpha), jnp.moveaxis(local_frames, -2, 0))
      return alpha

    init_scalar = semirings.where(
        jnp.arange(num_context_states) == lattice.context.start(),
        semiring.ones([], jnp.float32), semiring.zeros([], jnp.float32))
    alpha = jax.tree.map(
        lambda w: jnp.broadcast_to(w, (batch, num_context_states)),
        init_scalar)

    # Relay: at stage s, the device holding time-block s advances the
    # carry; the ppermute then hands it to the next block's device. SPMD
    # runs the local scan on every device each stage, but only the active
    # device's result is kept — per-device memory is what this scales.
    perm = [(i, (i + 1) % num_devices) for i in range(num_devices)]

    def stage(alpha, s):
      advanced = local_scan(alpha)
      alpha = semirings.where(my_idx == s, advanced, alpha)
      alpha = jax.tree.map(
          lambda x: jax.lax.ppermute(x, axis_name, perm), alpha)
      return alpha, None

    alpha, _ = jax.lax.scan(stage, alpha, jnp.arange(num_devices))
    # After D shifts the final carry sits on device 0; broadcast it.
    sd = semiring.sum(alpha, axis=-1)
    return jax.tree.map(
        lambda x: jax.lax.psum(
            jnp.where(my_idx == 0, x, jnp.zeros_like(x)), axis_name), sd)

  replicated = lambda tree: jax.tree.map(lambda _: P(), tree)
  fn = jax.shard_map(
      sharded,
      mesh=mesh,
      in_specs=(P(None, axis_name, None), P(None), replicated(wf_params),
                replicated(cache)),
      out_specs=replicated(semiring.zeros([1])),
      check_vma=False)
  frames = jax.device_put(
      frames, NamedSharding(mesh, P(None, axis_name, None)))
  return fn(frames, num_frames, wf_params, cache)
