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

"""Sequence (time-axis) sharded lattice computations — the alpha relay.

The recognition-lattice forward recursion is sequential in time, but its
carry is tiny: ``[batch, num_context_states]``. For sequences too long for
one chip's memory, the frames are sharded over a mesh axis and the alpha
carry is relayed between neighbor devices with ``lax.ppermute`` over ICI —
the lattice analogue of ring/context parallelism (SURVEY §5). Each device
stores only ``T / D`` frames; arc weights are (re)computed on the fly inside
the local scan, so nothing O(T * S * V) is ever materialized.

This is a memory-scaling construct: the recursion is inherently serial in
T, so wall-clock stays O(T), but per-device residency of the frames, the
alpha history saved for the backward, and every per-frame temporary drops
by the axis size D. Inactive relay stages are skipped with ``lax.cond``
(the stage predicate is a concrete per-device scalar under ``shard_map``),
so total FLOPs across the mesh equal a single device's — not D times them.

Training works: every relay here carries a ``jax.custom_vjp`` whose
backward runs the relay in REVERSE — device D-1 first, ``ppermute`` with
the inverted permutation — relaying the carry cotangent (XLA path) or the
log-space beta (fused-kernel path, ``ops.fused_scan.run_fused_backward``)
while each device recomputes its own block from the saved incoming alpha
(the distributed extension of the reference's backward-recomputation
rationale, reference ``lattices.py:539-557``). Weight-function cotangents
are ``psum``-reduced over the axis; frame cotangents stay sharded.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from last_torch_tpu import semirings


def _float0_like(tree):
  return jax.tree.map(
      lambda x: np.zeros(np.shape(x), jax.dtypes.float0), tree)


def _psum_from(my_idx, device, tree, axis_name):
  """Broadcasts ``device``'s value of a replicated-shape tree to all."""
  return jax.tree.map(
      lambda x: jax.lax.psum(
          jnp.where(my_idx == device, x, jnp.zeros_like(x)), axis_name),
      tree)


def _check_divisible(frames, num_devices, axis_name):
  max_t = frames.shape[-2]
  if max_t % num_devices != 0:
    raise ValueError(f'max_num_frames={max_t} must be divisible by the '
                     f'{axis_name!r} axis size {num_devices}')
  return max_t // num_devices


def _time_sharded_spec(tree, axis_name, batch_axis):
  """Per-leaf spec: axis 0 = batch (over batch_axis), axis 1 = time
  (sharded over ``axis_name``), remaining axes replicated."""
  return jax.tree.map(
      lambda x: P(batch_axis, axis_name, *([None] * (x.ndim - 2))), tree)


def _relay(mesh: Mesh, axis_name: str, local_fn, batch_axis=None):
  """Builds a differentiable time-block relay over ``axis_name``.

  ``local_fn(carry, local_frames, num_frames, my_idx, diff_args, aux)``
  advances the recursion carry over one device's frame block. It must be
  differentiable (``jax.vjp``-able) in ``carry``, ``local_frames`` and
  ``diff_args``; ``aux`` is non-differentiated (e.g. integer labels).

  Returns ``run(carry0, frames, num_frames, diff_args, aux) -> final``
  where ``frames`` is a pytree of [B, T, ...] leaves, each sharded over
  ``axis_name`` on axis 1 (the frames themselves, plus any per-frame
  riders such as the additive decode masks), everything else replicated,
  and ``final`` is the carry after all D blocks, replicated. ``run`` is
  a ``jax.custom_vjp``: its backward relays the carry cotangent in
  reverse stage order, running ``jax.vjp`` of ``local_fn`` only on the
  active device per stage (``lax.cond``), and ``psum``-reduces the
  ``diff_args`` cotangents over the axis; ``frames`` cotangents stay
  time-sharded.

  ``batch_axis`` composes data parallelism: every batch-leading operand
  (carry, frames, num_frames, aux, and the frame cotangents) additionally
  shards its axis 0 over that mesh axis — the relay is independent per
  batch row, so the shard bodies are untouched; ``diff_args`` cotangents
  psum over BOTH axes.
  """
  num_devices = mesh.shape[axis_name]
  perm_fwd = [(i, (i + 1) % num_devices) for i in range(num_devices)]
  perm_bwd = [(i, (i - 1) % num_devices) for i in range(num_devices)]

  def fwd_shard(carry0, local_frames, num_frames, diff_args, aux):
    my_idx = jax.lax.axis_index(axis_name)

    def stage(c, s):
      carry, saved = c
      active = my_idx == s
      advanced = jax.lax.cond(
          active,
          lambda cr: local_fn(cr, local_frames, num_frames, my_idx,
                              diff_args, aux),
          lambda cr: cr,
          carry)
      # Each device remembers the carry it consumed (its block's input);
      # the backward recomputes the block from it.
      saved = semirings.where(active, carry, saved)
      advanced = jax.tree.map(
          lambda x: jax.lax.ppermute(x, axis_name, perm_fwd), advanced)
      return (advanced, saved), None

    (carry, saved), _ = jax.lax.scan(
        stage, (carry0, carry0), jnp.arange(num_devices))
    # After D shifts the final carry sits on device 0; broadcast it.
    final = _psum_from(my_idx, 0, carry, axis_name)
    return final, jax.tree.map(lambda x: x[None], saved)

  def bwd_shard(ct_final, saved, local_frames, num_frames, diff_args,
                aux):
    my_idx = jax.lax.axis_index(axis_name)
    saved = jax.tree.map(lambda x: x[0], saved)
    d_diff0 = jax.tree.map(jnp.zeros_like, diff_args)
    d_frames0 = jax.tree.map(jnp.zeros_like, local_frames)

    def stage(c, s):
      ct, d_diff, d_frames = c
      active = my_idx == (num_devices - 1 - s)

      def run(ct):
        _, vjp_fn = jax.vjp(
            lambda cr, fr, da: local_fn(cr, fr, num_frames, my_idx, da,
                                        aux),
            saved, local_frames, diff_args)
        return vjp_fn(ct)

      def skip(ct):
        return ct, d_frames0, d_diff0

      d_carry, d_fr, d_da = jax.lax.cond(active, run, skip, ct)
      d_diff = jax.tree.map(jnp.add, d_diff, d_da)
      d_frames = jax.tree.map(jnp.add, d_frames, d_fr)
      ct = jax.tree.map(
          lambda x: jax.lax.ppermute(x, axis_name, perm_bwd), d_carry)
      return (ct, d_diff, d_frames), None

    (ct, d_diff, d_frames), _ = jax.lax.scan(
        stage, (ct_final, d_diff0, d_frames0), jnp.arange(num_devices))
    # Device 0's d(carry_in) — the cotangent of carry0 — was produced at
    # the last stage and permuted to device D-1.
    d_carry0 = _psum_from(my_idx, num_devices - 1, ct, axis_name)
    axes = ((axis_name,) if batch_axis is None else
            (axis_name, batch_axis))
    d_diff = jax.tree.map(lambda x: jax.lax.psum(x, axes), d_diff)
    return d_carry0, d_frames, d_diff

  def shard(fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)

  replicated = lambda tree: jax.tree.map(lambda _: P(), tree)
  nf_spec = P(batch_axis)
  batch_spec = lambda tree: jax.tree.map(
      lambda x: P(batch_axis, *([None] * (x.ndim - 1))), tree)

  @jax.custom_vjp
  def run(carry0, frames, num_frames, diff_args, aux):
    final, _ = _fwd(carry0, frames, num_frames, diff_args, aux)
    return final

  def _fwd(carry0, frames, num_frames, diff_args, aux):
    carry_spec = batch_spec(carry0)
    frames_spec = _time_sharded_spec(frames, axis_name, batch_axis)
    saved_spec = jax.tree.map(
        lambda x: P(axis_name, batch_axis, *([None] * (x.ndim - 1))),
        carry0)
    fn = shard(
        fwd_shard,
        in_specs=(carry_spec, frames_spec, nf_spec, replicated(diff_args),
                  batch_spec(aux)),
        out_specs=(carry_spec, saved_spec))
    frames = jax.device_put(
        frames,
        jax.tree.map(lambda s: NamedSharding(mesh, s), frames_spec))
    return fn(carry0, frames, num_frames, diff_args, aux)

  def run_fwd(carry0, frames, num_frames, diff_args, aux):
    final, saved = _fwd(carry0, frames, num_frames, diff_args, aux)
    return final, (saved, frames, num_frames, diff_args, aux)

  def run_bwd(residuals, ct_final):
    saved, frames, num_frames, diff_args, aux = residuals
    carry_spec = batch_spec(ct_final)
    frames_spec = _time_sharded_spec(frames, axis_name, batch_axis)
    saved_spec = jax.tree.map(
        lambda x: P(axis_name, batch_axis, *([None] * (x.ndim - 2))),
        saved)
    fn = shard(
        bwd_shard,
        in_specs=(carry_spec, saved_spec, frames_spec, nf_spec,
                  replicated(diff_args), batch_spec(aux)),
        out_specs=(carry_spec, frames_spec, replicated(diff_args)))
    d_carry0, d_frames, d_diff = fn(ct_final, saved, frames, num_frames,
                                    diff_args, aux)
    return (d_carry0, d_frames, _float0_like(num_frames), d_diff,
            _float0_like(aux))

  run.defvjp(run_fwd, run_bwd)
  return run


def _forward_block(lattice, semiring, lift, alpha, local_tree, wf_params,
                   cache, num_frames, t_offset):
  """Advances the denominator alpha carry over one frame block.

  The relay's per-device body, shared with the hardware two-block chain
  check (``benchmarks/tpu_decode_relay_check.py``). ``local_tree`` holds
  the block's [B, Tl, F] frames and optionally a [B, Tl, A, V] additive
  ``lexical_mask`` (the decode differentiation hook); ``t_offset`` is the
  block's global frame offset for the padding test.
  """
  num_align_states = lattice.alignment.num_states()
  xs = {'frame': jnp.moveaxis(local_tree['frames'], 1, 0)}
  if 'lexical_mask' in local_tree:
    # [B, Tl, A, V] -> [Tl, A, B, V] (time-major, per-state leading).
    xs['lexical_mask'] = jnp.moveaxis(
        jnp.moveaxis(local_tree['lexical_mask'], 1, 0), 2, 1)

  def step(carry, inputs):
    t, alpha = carry
    blank, lexical = lattice.weight_fn.apply(wf_params, cache,
                                             inputs['frame'])
    blank = [blank] * num_align_states
    lexical = [lexical] * num_align_states
    if 'lexical_mask' in inputs:
      lexical = [l + inputs['lexical_mask'][i][..., None, :]
                 for i, l in enumerate(lexical)]
    blank = [lift(b) for b in blank]
    lexical = [lift(l) for l in lexical]
    next_alpha = lattice.alignment.forward(
        alpha=alpha,
        blank=blank,
        lexical=lexical,
        context=lattice.context,
        semiring=semiring)
    is_padding = (t >= num_frames)[..., None]
    next_alpha = semirings.where(is_padding, alpha, next_alpha)
    return (t + 1, next_alpha), None

  (_, alpha), _ = jax.lax.scan(
      jax.checkpoint(step,
                     policy=jax.checkpoint_policies.nothing_saveable),
      (jnp.asarray(t_offset, jnp.int32), alpha), xs)
  return alpha


def _init_alpha(lattice, batch, num_states=None, start=None,
                dtype=jnp.float32, semiring=semirings.Log):
  if num_states is None:
    num_states, _ = lattice.context.shape()
  if start is None:
    start = lattice.context.start()
  init_scalar = semirings.where(
      jnp.arange(num_states) == start,
      semiring.ones([], dtype), semiring.zeros([], dtype))
  return jax.tree.map(
      lambda w: jnp.broadcast_to(w, (batch, num_states)), init_scalar)


def shortest_distance_time_sharded(lattice, params, frames, num_frames,
                                   mesh: Mesh, axis_name: str,
                                   semiring=semirings.Log,
                                   cache=None,
                                   fused: str = 'never',
                                   weight_lift=None,
                                   batch_axis=None,
                                   lexical_mask=None) -> jnp.ndarray:
  """Shortest distance with frames sharded over a time (sequence) mesh axis.

  Differentiable: gradients flow to ``params`` (and ``frames``) through a
  reverse relay — see the module docstring. The XLA relay supports any
  differentiable semiring (Log marginal-gradients, MaxTropical one-hot
  paths, ...); the fused relay chains the Pallas kernel pair through
  their ``alpha0``/``beta0`` carries (Log semiring, bigram JointWeightFn).

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
      fused kernel pair chained via ``alpha0`` (forward) and ``beta0``
      (backward) — covered configurations only.
    weight_lift: Optional lifting of plain weight arrays into semiring
      values (tuple-valued semirings such as Expectation); XLA relay
      only.
    batch_axis: Optional mesh axis composing data parallelism: batch
      rows shard over it while frames also shard over ``axis_name``
      (dp x seq). Weight-fn cotangents psum over both axes.
    lexical_mask: Optional additive [batch, max_num_frames,
      num_alignment_states, vocab_size] arc mask, time-sharded alongside
      the frames. Zero-valued masks are the differentiation hook the
      decode relays use (``shortest_path_time_sharded``): the mask
      cotangent stays time-sharded, so nothing O(T * V) is ever
      replicated. XLA relay only.

  Returns:
    [batch] shortest distance, replicated over the mesh.
  """
  if cache is None:
    cache = lattice.build_cache(params)
  from last_torch_tpu.ops import fused_scan
  use_kernel = False
  if fused != 'never' and lexical_mask is None:
    # Mirrors the dispatch in lattices.RecognitionLattice._forward
    # (backend resolution + supported() gate); keep the two in sync.
    backend = 'interpret' if fused == 'interpret' else jax.default_backend()
    use_kernel = fused_scan.supported(lattice, semiring, None, None,
                                      weight_lift, frames, backend)
  num_devices = mesh.shape[axis_name]
  local_t = _check_divisible(frames, num_devices, axis_name)
  num_frames = jnp.asarray(num_frames, jnp.int32)
  wf_params = params['weight_fn']
  batch = frames.shape[0]

  if use_kernel:
    log_z = _fused_relay(lattice, mesh, axis_name, local_t,
                         interpret=fused == 'interpret',
                         batch_axis=batch_axis)(
                             wf_params, cache, frames, num_frames)
    return log_z

  num_align_states = lattice.alignment.num_states()
  lift = weight_lift if weight_lift is not None else (lambda w: w)

  def local_fn(alpha, local_tree, num_frames, my_idx, diff_args, aux):
    del aux
    wf_params, cache = diff_args
    return _forward_block(lattice, semiring, lift, alpha, local_tree,
                          wf_params, cache, num_frames,
                          my_idx.astype(jnp.int32) * local_t)

  frames_tree = {'frames': frames}
  if lexical_mask is not None:
    if lexical_mask.shape[:2] != frames.shape[:2] or (
        lexical_mask.ndim != 4 or
        lexical_mask.shape[2] != num_align_states):
      raise ValueError(
          'lexical_mask must be [batch, max_num_frames, '
          f'num_alignment_states={num_align_states}, vocab_size], got '
          f'{lexical_mask.shape} for frames {frames.shape}')
    frames_tree['lexical_mask'] = lexical_mask

  # Tuple-valued semirings: the carry's dtype structure follows the
  # lifted weights (mirrors lattices._forward's init).
  dtype = semirings.value_dtype(
      jax.eval_shape(lift, jax.ShapeDtypeStruct((), jnp.float32)))
  carry0 = _init_alpha(lattice, batch, semiring=semiring, dtype=dtype)
  run = _relay(mesh, axis_name, local_fn, batch_axis=batch_axis)
  final = run(carry0, frames_tree, num_frames, (wf_params, cache), ())
  return semiring.sum(final, axis=-1)


def _fused_relay(lattice, mesh: Mesh, axis_name: str, local_t: int,
                 interpret: bool, batch_axis=None):
  """log Z via per-block fused kernels chained across the mesh.

  Forward: each device's block runs ``fused_shortest_distance_fwd`` with
  ``alpha0`` seeded from the relay (``with_history=False`` — nothing
  O(T_local * S) is kept). Backward: the reverse relay seeds
  ``run_fused_backward``'s ``beta0`` from the right neighbor, recomputes
  the block's alpha history from the saved incoming alpha (memory:
  [B, T/D, S] per device — the point of time sharding), and psums the
  weight-fn/cache cotangents.

  The block backward re-runs the forward anyway (to rebuild the alpha
  history the forward discarded), so when expansion streaming is on
  (``fused_scan.STREAM_EXPANSIONS``, ~4% of the single-device headline
  step) it also requests the streamed expansion slabs there and feeds
  ``run_fused_backward(expansion_history=...)`` — [B, T/D, k, S] extra
  transient per-device memory during the active stage only.
  """
  from last_torch_tpu import alignments as alignments_lib
  from last_torch_tpu.ops import fused_scan
  num_devices = mesh.shape[axis_name]
  perm_fwd = [(i, (i + 1) % num_devices) for i in range(num_devices)]
  perm_bwd = [(i, (i - 1) % num_devices) for i in range(num_devices)]
  frame_dependent = isinstance(lattice.alignment,
                               alignments_lib.FrameDependent)
  kernel_kwargs = dict(
      max_expansions=(0 if frame_dependent else
                      lattice.alignment.max_expansions),
      frame_dependent=frame_dependent,
      num_context_states=lattice.context.shape()[0],
      compute_dtype=jnp.float32 if interpret else jnp.bfloat16,
      interpret=interpret)
  num_states = lattice.context.shape()[0]
  # Expansion streaming for the block backwards (matches the defaults
  # run_fused_backward resolves internally: mode='auto', f32 cache).
  _resolved_mode, _ = fused_scan._resolve_mode(
      'auto', jnp.float32, num_states, lattice.weight_fn.vocab_size,
      lattice.weight_fn.hidden_size)
  stream = fused_scan._stream_active(
      frame_dependent, kernel_kwargs['max_expansions'], _resolved_mode)

  def local_nf(num_frames, my_idx):
    return jnp.clip(num_frames - my_idx.astype(jnp.int32) * local_t, 0,
                    local_t)

  def fwd_shard(local_frames, num_frames, wf_params, cache):
    my_idx = jax.lax.axis_index(axis_name)
    batch = local_frames.shape[0]
    nf = local_nf(num_frames, my_idx)
    alpha0 = _init_alpha(lattice, batch, num_states=num_states)

    def stage(c, s):
      alpha, saved = c
      active = my_idx == s

      def adv(a):
        _, _, out = fused_scan.fused_shortest_distance_fwd(
            wf_params, cache, local_frames, nf,
            alpha0=a, return_final_alpha=True, with_history=False,
            **kernel_kwargs)
        return out

      advanced = jax.lax.cond(active, adv, lambda a: a, alpha)
      saved = jnp.where(active, alpha, saved)
      advanced = jax.lax.ppermute(advanced, axis_name, perm_fwd)
      return (advanced, saved), None

    (alpha, saved), _ = jax.lax.scan(
        stage, (alpha0, alpha0), jnp.arange(num_devices))
    final = _psum_from(my_idx, 0, alpha, axis_name)
    log_z = jax.scipy.special.logsumexp(final, axis=-1)
    return log_z, saved[None]

  def bwd_shard(g, log_z, saved, local_frames, num_frames, wf_params,
                cache):
    my_idx = jax.lax.axis_index(axis_name)
    batch = local_frames.shape[0]
    nf = local_nf(num_frames, my_idx)
    saved = saved[0]
    d_wf0 = jax.tree.map(jnp.zeros_like, wf_params)
    d_cache0 = jnp.zeros_like(cache)
    d_frames0 = jnp.zeros_like(local_frames)
    beta0 = jnp.zeros((batch, num_states), jnp.float32)

    def stage(c, s):
      beta, d_wf, d_cache, d_frames = c
      active = my_idx == (num_devices - 1 - s)

      def run(b):
        outs = fused_scan.fused_shortest_distance_fwd(
            wf_params, cache, local_frames, nf,
            alpha0=saved, return_final_alpha=True, with_history=True,
            with_expansions=stream, **kernel_kwargs)
        if stream:
          _, hist, _, expans = outs
        else:
          (_, hist, _), expans = outs, None
        return fused_scan.run_fused_backward(
            wf_params, cache, local_frames, nf, log_z, g, hist,
            beta0=b, expansion_history=expans, **kernel_kwargs)

      def skip(b):
        return d_wf0, d_cache0, d_frames0, b

      dw, dc, df, beta = jax.lax.cond(active, run, skip, beta)
      d_wf = jax.tree.map(jnp.add, d_wf, dw)
      d_cache = d_cache + dc
      d_frames = d_frames + df
      beta = jax.lax.ppermute(beta, axis_name, perm_bwd)
      return (beta, d_wf, d_cache, d_frames), None

    (_, d_wf, d_cache, d_frames), _ = jax.lax.scan(
        stage, (beta0, d_wf0, d_cache0, d_frames0),
        jnp.arange(num_devices))
    d_wf = jax.tree.map(lambda x: jax.lax.psum(x, psum_axes), d_wf)
    d_cache = jax.lax.psum(d_cache, psum_axes)
    return d_wf, d_cache, d_frames

  frames_spec = P(batch_axis, axis_name, None)
  b_spec = P(batch_axis)
  saved_spec = P(axis_name, batch_axis, None)
  replicated = lambda tree: jax.tree.map(lambda _: P(), tree)
  psum_axes = ((axis_name,) if batch_axis is None else
               (axis_name, batch_axis))

  @jax.custom_vjp
  def log_partition(wf_params, cache, frames, num_frames):
    log_z, _ = _fwd(wf_params, cache, frames, num_frames)
    return log_z

  def _fwd(wf_params, cache, frames, num_frames):
    fn = jax.shard_map(
        fwd_shard, mesh=mesh,
        in_specs=(frames_spec, b_spec, replicated(wf_params), P()),
        out_specs=(b_spec, saved_spec),
        check_vma=False)
    frames = jax.device_put(frames, NamedSharding(mesh, frames_spec))
    return fn(frames, num_frames, wf_params, cache)

  def fn_fwd(wf_params, cache, frames, num_frames):
    log_z, saved = _fwd(wf_params, cache, frames, num_frames)
    return log_z, (wf_params, cache, frames, num_frames, log_z, saved)

  def fn_bwd(residuals, g):
    wf_params, cache, frames, num_frames, log_z, saved = residuals
    fn = jax.shard_map(
        bwd_shard, mesh=mesh,
        in_specs=(b_spec, b_spec, saved_spec, frames_spec,
                  b_spec, replicated(wf_params), P()),
        out_specs=(replicated(wf_params), P(), frames_spec),
        check_vma=False)
    d_wf, d_cache, d_frames = fn(g, log_z, saved, frames, num_frames,
                                 wf_params, cache)
    return d_wf, d_cache, d_frames, _float0_like(num_frames)

  log_partition.defvjp(fn_fwd, fn_bwd)
  return log_partition


def shortest_path_time_sharded(lattice, params, frames, num_frames,
                               mesh: Mesh, axis_name: str, cache=None,
                               batch_axis=None,
                               reference_compat: bool = False):
  """Viterbi decode with frames sharded over a time (sequence) mesh axis.

  The time-sharded realization of ``RecognitionLattice.shortest_path``
  (reference ``lattices.py:185-247``): the MaxTropical shortest distance
  runs through the alpha relay with a zero additive lexical mask riding
  time-sharded alongside the frames, and the one-hot tropical gradient
  of that mask — obtained through the relay's reverse-stage cotangent
  custom-VJP — marks exactly one best path. Long utterances that train
  via ``loss_time_sharded`` decode with the same machinery: per-device
  residency is O(T / D), and the [B, T, A, V] mask plus its cotangent
  stay time-sharded end to end.

  Args:
    lattice: ``last_torch_tpu.RecognitionLattice``.
    params: Lattice parameter pytree.
    frames: [batch, max_num_frames, feature_size]; max_num_frames must
      be divisible by the size of ``axis_name``.
    num_frames: [batch] frame counts.
    mesh: Device mesh containing ``axis_name``.
    axis_name: The mesh axis to shard time over.
    cache: Optional prebuilt weight-fn cache.
    batch_axis: Optional mesh axis composing data parallelism (dp x
      seq).
    reference_compat: Emit the reference's raw argmax label values (see
      ``RecognitionLattice.shortest_path``).

  Returns:
    (alignment_labels [batch, max_num_frames * num_alignment_states],
    num_alignment_labels [batch], path_weights [batch]) — identical to
    the single-device ``shortest_path`` (XLA route).
  """
  if cache is None:
    cache = lattice.build_cache(params)
  num_frames = jnp.asarray(num_frames, jnp.int32)
  batch, max_t = frames.shape[0], frames.shape[-2]
  num_align_states = lattice.alignment.num_states()
  _, vocab_size = lattice.context.shape()

  def distance(mask):
    return shortest_distance_time_sharded(
        lattice, params, frames, num_frames, mesh, axis_name,
        semiring=semirings.MaxTropical, cache=cache, lexical_mask=mask,
        batch_axis=batch_axis)

  mask0 = jnp.zeros((batch, max_t, num_align_states, vocab_size))
  path_weights, vjp_fn = jax.vjp(distance, mask0)
  viterbi_mask = vjp_fn(jnp.ones_like(path_weights))[0]
  is_blank = jnp.all(viterbi_mask == 0, axis=-1)
  alignment_labels = jnp.where(
      is_blank, 0, 1 + jnp.argmax(viterbi_mask, axis=-1))
  alignment_labels = alignment_labels.reshape(batch, -1)
  if reference_compat:
    alignment_labels = jnp.where(alignment_labels == 0, 0,
                                 alignment_labels - 1)
  return alignment_labels, num_align_states * num_frames, path_weights


def align_time_sharded(lattice, params, frames, num_frames, labels,
                       num_labels, mesh: Mesh, axis_name: str,
                       cache=None, batch_axis=None):
  """Forced alignment with frames sharded over a time mesh axis.

  The relay realization of ``RecognitionLattice.align``: the numerator
  (string) DP runs under MaxTropical through the generic relay with a
  zero additive [B, T, U+1] mask on the per-position lexical weights;
  the mask's one-hot tropical gradient marks, for each label position,
  the frame where the best constrained path emits it. The mask and its
  cotangent are time-sharded; per-device weight computation touches
  only the local frame block (labels are replicated — they are O(U),
  tiny next to frames).

  Returns:
    (emit_frames [batch, max_num_labels] int32, path_weights [batch]) —
    identical to the single-device ``align``.
  """
  if cache is None:
    cache = lattice.build_cache(params)
  num_devices = mesh.shape[axis_name]
  local_t = _check_divisible(frames, num_devices, axis_name)
  num_frames, num_labels, labels = lattice._check_string_args(
      frames, num_frames, labels, num_labels)
  wf_params = params['weight_fn']
  batch, max_t = frames.shape[0], frames.shape[-2]
  num_alpha_states = labels.shape[-1] + 1

  def local_fn(alpha, local_tree, num_frames, my_idx, diff_args, aux):
    wf_params, cache = diff_args
    labels, num_labels = aux
    blank_w, lexical_w = lattice._string_weights(
        {'weight_fn': wf_params}, cache, local_tree['frames'], labels)
    # [B, Tl, U+1] -> time-major [Tl, B, U+1], matching _string_weights.
    lexical_w = lexical_w + jnp.moveaxis(local_tree['lexical_mask'], 1, 0)
    return lattice._string_dp(
        blank_w, lexical_w, num_frames, num_labels,
        semirings.MaxTropical, alpha0=alpha,
        t_offset=my_idx.astype(jnp.int32) * local_t, final_gather=False)

  carry0 = _init_alpha(lattice, batch, num_states=num_alpha_states,
                       start=0, semiring=semirings.MaxTropical)
  run = _relay(mesh, axis_name, local_fn, batch_axis=batch_axis)

  def score(mask):
    final = run(carry0, {'frames': frames, 'lexical_mask': mask},
                num_frames, (wf_params, cache), (labels, num_labels))
    is_final = num_labels[..., None] == jnp.arange(num_alpha_states)
    zero = semirings.MaxTropical.zeros(
        [], semirings.value_dtype(final))
    return semirings.MaxTropical.sum(
        semirings.where(is_final, final, zero), axis=-1)

  mask0 = jnp.zeros((batch, max_t, num_alpha_states))
  scores, vjp_fn = jax.vjp(score, mask0)
  marks = vjp_fn(jnp.ones_like(scores))[0]  # [B, T, U+1]
  emit = jnp.argmax(marks, axis=1).astype(jnp.int32)
  emitted = jnp.max(marks, axis=1) > 0
  emit = jnp.where(emitted, emit, -1)[..., :labels.shape[-1]]
  return emit, scores


def string_forward_time_sharded(lattice, params, frames, num_frames,
                                labels, num_labels, mesh: Mesh,
                                axis_name: str,
                                semiring=semirings.Log,
                                cache=None,
                                batch_axis=None) -> jnp.ndarray:
  """Numerator (string forward) with frames sharded over a time axis.

  The string-forward carry is [batch, max_num_labels + 1] — even smaller
  than the denominator's — so the same relay applies: each device
  computes its block's per-(frame, label-position) weights locally
  (labels are replicated; nothing O(T * U) global is materialized) and
  advances the label-position recursion. Differentiable via the generic
  cotangent relay.

  Returns:
    [batch] string shortest distance, replicated over the mesh.
  """
  if cache is None:
    cache = lattice.build_cache(params)
  num_devices = mesh.shape[axis_name]
  local_t = _check_divisible(frames, num_devices, axis_name)
  num_frames, num_labels, labels = lattice._check_string_args(
      frames, num_frames, labels, num_labels)
  wf_params = params['weight_fn']
  batch = frames.shape[0]
  num_alpha_states = labels.shape[-1] + 1

  def local_fn(alpha, local_frames, num_frames, my_idx, diff_args, aux):
    wf_params, cache = diff_args
    labels, num_labels = aux
    blank_w, lexical_w = lattice._string_weights(
        {'weight_fn': wf_params}, cache, local_frames, labels)
    return lattice._string_dp(
        blank_w, lexical_w, num_frames, num_labels, semiring,
        alpha0=alpha, t_offset=my_idx.astype(jnp.int32) * local_t,
        final_gather=False)

  carry0 = _init_alpha(lattice, batch, num_states=num_alpha_states,
                       start=0, semiring=semiring)
  run = _relay(mesh, axis_name, local_fn, batch_axis=batch_axis)
  final = run(carry0, frames, num_frames, (wf_params, cache),
              (labels, num_labels))
  is_final = num_labels[..., None] == jnp.arange(num_alpha_states)
  zero = semiring.zeros([], semirings.value_dtype(final))
  return semiring.sum(semirings.where(is_final, final, zero), axis=-1)


def loss_time_sharded(lattice, params, frames, num_frames, labels,
                      num_labels, mesh: Mesh, axis_name: str,
                      cache=None, fused: str = 'never',
                      batch_axis=None) -> jnp.ndarray:
  """GNAT loss (negative log-probability) under time sharding.

  ``denominator - numerator`` with both DPs relayed over ``axis_name``;
  the denominator is skipped for locally normalized weight functions
  (the same type gate as ``RecognitionLattice.loss``). Fully
  differentiable — this is the training loss for utterances too long for
  one chip.

  Returns:
    [batch] loss, replicated over the mesh.
  """
  from last_torch_tpu import weight_fns as weight_fns_lib
  if cache is None:
    cache = lattice.build_cache(params)
  numerator = string_forward_time_sharded(
      lattice, params, frames, num_frames, labels, num_labels, mesh,
      axis_name, cache=cache, batch_axis=batch_axis)
  if isinstance(lattice.weight_fn, weight_fns_lib.LocallyNormalizedWeightFn):
    return -numerator
  denominator = shortest_distance_time_sharded(
      lattice, params, frames, num_frames, mesh, axis_name, cache=cache,
      fused=fused, batch_axis=batch_axis)
  return denominator - numerator


def tp_shortest_distance_time_sharded(lattice, params, frames, num_frames,
                                      mesh: Mesh, seq_axis: str = 'seq',
                                      model_axis: str = 'model',
                                      batch_axis=None, cache=None,
                                      batch_tile: int = 8,
                                      interpret: bool = False
                                      ) -> jnp.ndarray:
  """Log partition with time sharded over ``seq_axis`` AND the vocab head
  sharded over ``model_axis`` (seq x tp).

  Each (seq, model) device holds a [B, T/D_seq] frame block and a
  [h, V/D_model] head shard. The alpha relay runs over ``seq_axis`` as in
  ``shortest_distance_time_sharded``; each active stage advances its
  block with ``ops.sharded_scan.sharded_shortest_distance`` (per-frame
  ``frame_reduce`` Pallas kernels on the local vocab shard, reductions
  all-gathered over ``model_axis``), chained via its ``alpha0`` /
  ``t_offset`` inputs. Gradients are plain reverse-mode through the
  shard_map (ppermute/all_gather/kernel-VJP transposes), so any
  cotangent structure the TP island supports relays too.

  Args:
    lattice: RecognitionLattice covered by ``sharded_scan.tp_supported``
      (bigram FullNGram + JointWeightFn).
    params: Lattice parameter pytree (global arrays; the shard_map specs
      split the vocab head over ``model_axis``).
    frames: [batch, max_num_frames, feature]; max_num_frames must divide
      by the ``seq_axis`` size.
    num_frames: [batch] frame counts.
    mesh: Mesh containing ``seq_axis`` and ``model_axis``.
    seq_axis / model_axis: Mesh axis names.
    batch_axis: Optional mesh axis composing data parallelism.
    cache: Optional prebuilt weight-fn cache.
    batch_tile / interpret: See ``sharded_scan.frame_reduce``.

  Returns:
    [batch] log-partition values, replicated over the mesh.
  """
  from last_torch_tpu import alignments as alignments_lib
  from last_torch_tpu.ops import sharded_scan
  from last_torch_tpu.ops.fused_scan import NEG_INF, _round_up, _LANES

  if cache is None:
    cache = lattice.build_cache(params)
  num_devices = mesh.shape[seq_axis]
  local_t = _check_divisible(frames, num_devices, seq_axis)
  num_frames = jnp.asarray(num_frames, jnp.int32)
  wf_params = params['weight_fn']
  frame_dependent = isinstance(lattice.alignment,
                               alignments_lib.FrameDependent)
  s = lattice.context.shape()[0]
  s_pad = _round_up(s, _LANES)
  block_kwargs = dict(
      max_expansions=(0 if frame_dependent else
                      lattice.alignment.max_expansions),
      frame_dependent=frame_dependent,
      num_context_states=s,
      model_axis=model_axis,
      batch_tile=batch_tile,
      interpret=interpret)
  perm_fwd = [(i, (i + 1) % num_devices) for i in range(num_devices)]

  def shard_fn(local_frames, num_frames, wf_params, cache):
    my_idx = jax.lax.axis_index(seq_axis)
    batch = local_frames.shape[0]
    alpha_init = jnp.full((batch, s_pad), NEG_INF, jnp.float32)
    alpha_init = alpha_init.at[:, lattice.context.start()].set(0.0)

    def block(a):
      return sharded_scan.sharded_shortest_distance(
          wf_params, cache, local_frames, num_frames, alpha0=a,
          t_offset=my_idx.astype(jnp.int32) * local_t, return_alpha=True,
          **block_kwargs)

    def stage(alpha, stg):
      active = my_idx == stg
      advanced = jax.lax.cond(active, jax.checkpoint(block),
                              lambda a: a, alpha)
      advanced = jax.lax.ppermute(advanced, seq_axis, perm_fwd)
      return advanced, None

    alpha, _ = jax.lax.scan(stage, alpha_init, jnp.arange(num_devices))
    final = _psum_from(my_idx, 0, alpha, seq_axis)
    return semirings.Log.sum(final[:, :s], axis=-1)

  wf_spec = {
      k: (P(None, model_axis) if k == 'vocab_w' else
          P(model_axis) if k == 'vocab_b' else P())
      for k in wf_params
  }
  frames_spec = P(batch_axis, seq_axis, None)
  fn = jax.shard_map(
      shard_fn, mesh=mesh,
      in_specs=(frames_spec, P(batch_axis), wf_spec, P()),
      out_specs=P(batch_axis),
      check_vma=False)
  frames = jax.device_put(frames, NamedSharding(mesh, frames_spec))
  return fn(frames, num_frames, wf_params, cache)


def tp_loss_time_sharded(lattice, params, frames, num_frames, labels,
                         num_labels, mesh: Mesh, seq_axis: str = 'seq',
                         model_axis: str = 'model', batch_axis=None,
                         cache=None, batch_tile: int = 8,
                         interpret: bool = False) -> jnp.ndarray:
  """GNAT loss with seq x tp composed sharding.

  The denominator — the O(B * S * V) pass whose alpha history dominates
  memory — runs ``tp_shortest_distance_time_sharded`` (frames sharded
  over ``seq_axis``, vocab head over ``model_axis``). The numerator
  relays over ``seq_axis`` on the full head (the cheap pass; same
  decision as the flat TP island, ``ops.sharded_scan.tp_lattice_loss``).
  Locally normalized weight functions skip the denominator, as in
  ``RecognitionLattice.loss``.

  Returns:
    [batch] loss, replicated over the mesh.
  """
  from last_torch_tpu import weight_fns as weight_fns_lib
  from last_torch_tpu.ops import sharded_scan
  if not sharded_scan.tp_supported(lattice):
    raise ValueError('lattice is not covered by the tensor-parallel '
                     'lattice loss; use loss_time_sharded')
  if cache is None:
    cache = lattice.build_cache(params)
  numerator = string_forward_time_sharded(
      lattice, params, frames, num_frames, labels, num_labels, mesh,
      seq_axis, cache=cache, batch_axis=batch_axis)
  if isinstance(lattice.weight_fn,
                weight_fns_lib.LocallyNormalizedWeightFn):
    return -numerator
  denominator = tp_shortest_distance_time_sharded(
      lattice, params, frames, num_frames, mesh, seq_axis=seq_axis,
      model_axis=model_axis, batch_axis=batch_axis, cache=cache,
      batch_tile=batch_tile, interpret=interpret)
  return denominator - numerator


def make_tp_seq_train_step(model, optimizer, mesh: Mesh,
                           seq_axis: str = 'seq',
                           model_axis: str = 'model',
                           batch_axis=None,
                           interpret: bool = False):
  """Jitted train step composing sequence (time) and tensor (vocab)
  parallelism: the lattice denominator shards frames over ``seq_axis``
  and the vocab head over ``model_axis`` simultaneously.

  Returns ``step(state, frames, num_frames, labels, num_labels) ->
  (state, loss)``.
  """
  import optax
  from last_torch_tpu.models import gnat

  def loss_fn(params, frames, num_frames, labels, num_labels):
    encoded = model.encoder.apply(params['encoder'], frames, num_frames)
    per_seq = tp_loss_time_sharded(
        model.lattice, params['lattice'], encoded, num_frames, labels,
        num_labels, mesh, seq_axis=seq_axis, model_axis=model_axis,
        batch_axis=batch_axis, interpret=interpret)
    finite = jnp.isfinite(per_seq)
    per_seq = jnp.where(finite, per_seq, 0.0)
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(finite), 1)

  @jax.jit
  def step(state, frames, num_frames, labels, num_labels):
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, frames, num_frames, labels, num_labels)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return gnat.GNATTrainState(params=params, opt_state=opt_state,
                               step=state.step + 1), loss

  return step


def make_time_sharded_train_step(model, optimizer, mesh: Mesh,
                                 axis_name: str = 'seq',
                                 fused: str = 'never',
                                 batch_axis=None):
  """Builds a jitted train step whose lattice DPs are time-sharded.

  The encoder runs data-replicated (its activations are [B, T, H]; for
  the long-T regimes this construct targets, pair it with the banded
  local attention so encoder memory is O(T * W)); the lattice loss —
  the memory-dominant part, whose backward needs per-frame alpha
  residuals — runs through ``loss_time_sharded``.

  Returns ``step(state, frames, num_frames, labels, num_labels) ->
  (state, loss)``.
  """
  import optax
  from last_torch_tpu.models import gnat

  def loss_fn(params, frames, num_frames, labels, num_labels):
    encoded = model.encoder.apply(params['encoder'], frames, num_frames)
    per_seq = loss_time_sharded(
        model.lattice, params['lattice'], encoded, num_frames, labels,
        num_labels, mesh, axis_name, fused=fused, batch_axis=batch_axis)
    # Infeasible sequences are masked out, as in GNATModel.mean_loss.
    finite = jnp.isfinite(per_seq)
    per_seq = jnp.where(finite, per_seq, 0.0)
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(finite), 1)

  @jax.jit
  def step(state, frames, num_frames, labels, num_labels):
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, frames, num_frames, labels, num_labels)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    return gnat.GNATTrainState(params=params, opt_state=opt_state,
                               step=state.step + 1), loss

  return step
