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

"""Vocab-sharded (tensor-parallel) recognition-lattice computations.

The monolithic fused kernels (``fused_scan.py``) run the entire time scan
inside one Mosaic program, which XLA cannot partition across devices. For
tensor parallelism over the vocabulary — the joint network's ``[h, V]``
head sharded on the ``model`` mesh axis, the sharding production systems
use for large vocabularies — this module restructures the computation:

* ``jax.lax.scan`` over frames stays in XLA;
* each frame's expensive semiring reduction
  ``red[b, y] = logsumexp_s(alpha[b, s] + lex[b, s, y])`` runs as a
  per-frame Pallas kernel on each device's vocab shard (``frame_reduce``,
  a ``jax.custom_vjp`` kernel pair) — the O(B*S*V/D) lexical block never
  touches HBM;
* one ``jax.lax.all_gather`` of the tiny ``[B, V/D]`` reduction crosses
  ICI per within-frame expansion (bigram: the gathered reduction IS the
  next lexical-destination alpha block).

The per-frame recursion around the kernel is ordinary semiring algebra on
``[B, S]`` vectors (``semirings.Log``), so reverse-mode autodiff through
the scan + collectives + the kernel custom-VJP yields exact gradients:
sharded for the vocab head, psum'ed across the model axis for everything
shared. Intended to run inside ``jax.shard_map`` — see
``parallel.sharding.make_tp_train_step``.

Compared with the monolithic kernels this pays one kernel launch per
(frame, expansion) and re-computes the joint per expansion, the
unavoidable cost of per-frame cross-device communication; per-device
matmul FLOPs and VMEM scale with V/D.

Reference anchor: the reference has no distributed code at all (SURVEY
§2, §5); this is the TPU-native scale-out of its ``_forward``
(`/root/reference/last_torch/lattices.py:379-496`).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from last_torch_tpu import semirings
from last_torch_tpu.ops.fused_scan import NEG_INF
from last_torch_tpu.ops.fused_scan import _choose_v_tile
from last_torch_tpu.ops.fused_scan import _LANES
from last_torch_tpu.ops.fused_scan import _mxu_precision
from last_torch_tpu.ops.fused_scan import _round_up


def _frame_reduce_fwd_kernel(
    # Inputs.
    vec_ref,        # [Bt, S_pad] source-state vector (alpha or expansion)
    pf_ref,         # [Bt, h] projected frame
    pc_ref,         # [S_pad, h] projected context (padded rows are zero)
    vw_ref,         # [NV, h, Vt] local vocab-head shard, tile-major
    vb_ref,         # [NV, 1, Vt]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    # Outputs.
    red_ref,        # [Bt, Vl] logsumexp_s(vec + lex)
    blank_ref,      # [NS, Bt, s_tile] blank weights, tile-major (finite at
                    # padded states; callers' -inf alpha keeps those
                    # semiring-dead)
    # Scratch.
    vec_scr,        # [NS, Bt, s_tile] input tiles
    m_scr,          # [NV, Bt, Vt] running max
    acc_scr,        # [NV, Bt, Vt] running scaled sum
    *,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    v_tile: int,
    num_v_tiles: int,
    compute_dtype,
):
  """One frame's vocab-shard reduction + blank head, online over tiles.

  The tile sweeps are lax.fori_loops over leading-axis-tiled refs, not
  unrolled Python loops — Mosaic's register allocator gives each unrolled
  iteration's large temporaries their own scoped-VMEM spill slots (see
  ``fused_scan._online_forward_kernel``), and lane-dim dynamic slicing is
  unsupported, hence the [NV, h, Vt] head layout and the [NS, Bt, s_tile]
  input scatter.
  """
  pf = pf_ref[:]
  vec = vec_ref[:]
  bw = bw_ref[:].astype(compute_dtype)

  for i in range(num_s_tiles):
    vec_scr[i] = jax.lax.slice_in_dim(vec, i * s_tile, (i + 1) * s_tile,
                                      axis=1)
  for v in range(num_v_tiles):
    m_scr[v] = jnp.full((batch_tile, v_tile), NEG_INF, jnp.float32)
    acc_scr[v] = jnp.zeros((batch_tile, v_tile), jnp.float32)

  def s_body(i, _):
    pc_t = pc_ref[pl.ds(i * s_tile, s_tile), :]
    joint2d = jnp.tanh(pc_t[None, :, :] + pf[:, None, :]).astype(
        compute_dtype).reshape(batch_tile * s_tile, -1)
    blank2d = jax.lax.dot_general(
        joint2d, bw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    blank_ref[i] = blank2d.reshape(batch_tile, s_tile) + bb_ref[0, 0]
    vec_t = vec_scr[i]

    def v_body(v, _):
      vw_t = vw_ref[v].astype(compute_dtype)
      lex2d = jax.lax.dot_general(
          joint2d, vw_t, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=_mxu_precision(compute_dtype))
      lex = (lex2d + vb_ref[v]).reshape(batch_tile, s_tile, v_tile)
      chunk = vec_t[:, :, None] + lex
      cm = jnp.max(chunk, axis=1)
      m_old = m_scr[v]
      new_m = jnp.maximum(m_old, cm)
      safe = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
      acc_scr[v] = (acc_scr[v] * jnp.exp(m_old - safe) +
                    jnp.sum(jnp.exp(chunk - safe[:, None, :]), axis=1))
      m_scr[v] = new_m
      return 0

    jax.lax.fori_loop(0, num_v_tiles, v_body, 0)
    return 0

  jax.lax.fori_loop(0, num_s_tiles, s_body, 0)
  for v in range(num_v_tiles):
    m_v = m_scr[v]
    acc_v = acc_scr[v]
    red_ref[:, v * v_tile:(v + 1) * v_tile] = jnp.where(
        acc_v == 0, NEG_INF,
        jnp.where(jnp.isfinite(m_v), m_v, 0.0) + jnp.log(acc_v))


def _frame_reduce_bwd_kernel(
    # Inputs.
    vec_ref,        # [Bt, S_pad]
    pf_ref,         # [Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [NV, h, Vt] tile-major
    vb_ref,         # [NV, 1, Vt]
    bwt_ref,        # [1, h] blank head, transposed
    red_ref,        # [Bt, Vl] saved forward output
    dred_ref,       # [Bt, Vl] cotangent of red
    dblank_ref,     # [Bt, S_pad] cotangent of blank
    # Outputs.
    dvec_ref,       # [NS, Bt, s_tile] tile-major
    dpf_ref,        # [Bt, h]
    dpc_ref,        # [S_pad, h]
    dvw_ref,        # [NV, h, Vt]
    dvb_ref,        # [NV, 1, Vt]
    dbw_ref,        # [1, h]
    dbb_ref,        # [1, 1] SMEM
    # Scratch (parameter grads accumulated across batch tiles; the tile
    # sweeps are fori_loops over leading-axis-tiled memory — see the
    # spill-slot note in _frame_reduce_fwd_kernel).
    vec_scr,        # [NS, Bt, s_tile]
    dbl_scr,        # [NS, Bt, s_tile]
    red_scr,        # [NV, Bt, Vt]
    dred_scr,       # [NV, Bt, Vt]
    djoint_scr,     # [Bt * s_tile, h]
    dpc_scr,        # [S_pad, h]
    dvw_scr,        # [NV, h, Vt]
    dvb_scr,        # [NV, 1, Vt]
    dbw_scr,        # [1, h]
    dbb_scr,        # [1, 1] SMEM
    *,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    v_tile: int,
    num_v_tiles: int,
    compute_dtype,
):
  """VJP of frame_reduce: softmax-style reduction gradient + head/tanh.

  ``d lex[s, y] = d_red[y] * exp(vec[s] + lex[s, y] - red[y])`` (each
  exponent <= ~0 since red is the logsumexp of its terms); the rest is
  the same per-tile head/tanh backward as the monolithic backward
  kernels, with parameter gradients accumulated across batch tiles in
  VMEM scratch.
  """
  b = pl.program_id(0)
  hidden = pc_ref.shape[-1]

  @pl.when(b == 0)
  def _():
    dpc_scr[:] = jnp.zeros(dpc_scr.shape, jnp.float32)
    dbw_scr[:] = jnp.zeros(dbw_scr.shape, jnp.float32)
    dbb_scr[0, 0] = 0.0
    for v in range(num_v_tiles):
      dvw_scr[v] = jnp.zeros((hidden, v_tile), jnp.float32)
      dvb_scr[v] = jnp.zeros((1, v_tile), jnp.float32)

  pf = pf_ref[:]
  n = batch_tile * s_tile
  safe_red = jnp.where(jnp.isfinite(red_ref[:]), red_ref[:], 0.0)

  for i in range(num_s_tiles):  # static-slice scatters
    vec_scr[i] = jax.lax.slice_in_dim(vec_ref[:], i * s_tile,
                                      (i + 1) * s_tile, axis=1)
    dbl_scr[i] = jax.lax.slice_in_dim(dblank_ref[:], i * s_tile,
                                      (i + 1) * s_tile, axis=1)
  for v in range(num_v_tiles):
    red_scr[v] = jax.lax.slice_in_dim(safe_red, v * v_tile,
                                      (v + 1) * v_tile, axis=1)
    dred_scr[v] = jax.lax.slice_in_dim(dred_ref[:], v * v_tile,
                                       (v + 1) * v_tile, axis=1)

  def s_body(i, dpf_acc):
    pc_t = pc_ref[pl.ds(i * s_tile, s_tile), :]
    joint = jnp.tanh(pc_t[None, :, :] + pf[:, None, :])  # [Bt, St, h] f32
    joint3_c = joint.astype(compute_dtype)
    joint2d = joint3_c.reshape(n, -1)
    vec_t = vec_scr[i]
    djoint_scr[:] = jnp.zeros((n, hidden), jnp.float32)

    def v_body(v, dvec_acc):
      vw_t = vw_ref[v].astype(compute_dtype)
      lex2d = jax.lax.dot_general(
          joint2d, vw_t, (((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=_mxu_precision(compute_dtype))
      lex = (lex2d + vb_ref[v]).reshape(batch_tile, s_tile, v_tile)
      # The clip guards bfloat16 rounding; true exponents are <= 0.
      p = jnp.exp(jnp.minimum(
          vec_t[:, :, None] + lex - red_scr[v][:, None, :], 60.0))
      d_lex3 = (dred_scr[v][:, None, :] * p).astype(compute_dtype)
      dvec_acc = dvec_acc + jnp.sum(d_lex3.astype(jnp.float32), axis=2)
      dvw_scr[v] += jnp.sum(
          jax.lax.dot_general(
              joint3_c, d_lex3, (((1,), (1,)), ((0,), (0,))),
              preferred_element_type=jnp.float32,
              precision=_mxu_precision(compute_dtype)), axis=0)
      dvb_scr[v] += jnp.sum(
          d_lex3.astype(jnp.float32), axis=(0, 1), keepdims=True)[0]
      djoint_scr[:, :] += jax.lax.dot_general(
          d_lex3, vw_t, (((2,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=_mxu_precision(compute_dtype)).reshape(n, hidden)
      return dvec_acc

    dvec_acc = jax.lax.fori_loop(
        0, num_v_tiles, v_body,
        jnp.zeros((batch_tile, s_tile), jnp.float32))
    dvec_ref[i] = dvec_acc
    d_blank3 = dbl_scr[i][:, :, None]
    dbw_scr[:, :] += jnp.sum(joint * d_blank3, axis=(0, 1), keepdims=True)[0]
    dbb_scr[0, 0] += jnp.sum(d_blank3)
    d_joint3 = djoint_scr[:, :].reshape(batch_tile, s_tile, hidden)
    d_joint3 = d_joint3 + d_blank3 * bwt_ref[:][None, :, :]
    d_pre = d_joint3 * (1.0 - joint * joint)
    dpc_scr[pl.ds(i * s_tile, s_tile), :] += jnp.sum(d_pre, axis=0)
    return dpf_acc + jnp.sum(d_pre, axis=1)

  dpf_ref[:] = jax.lax.fori_loop(
      0, num_s_tiles, s_body,
      jnp.zeros((batch_tile, hidden), jnp.float32))

  @pl.when(b == pl.num_programs(0) - 1)
  def _():
    dpc_ref[:] = dpc_scr[:]
    dvw_ref[:] = dvw_scr[:]
    dvb_ref[:] = dvb_scr[:]
    dbw_ref[:] = dbw_scr[:]
    dbb_ref[0, 0] = dbb_scr[0, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def frame_reduce(vec, pf_t, pc, vw, vb, bw, bb, batch_tile=8,
                 interpret=False, compute_dtype=None):
  """One frame's blank head + vocab-shard logsumexp reduction.

  Args:
    vec: [B, S_pad] source-state vector (-inf at padded states).
    pf_t: [B, h] projected frame.
    pc: [S_pad, h] projected context table (zero at padded rows).
    vw: [h, Vl] local vocab-head shard (Vl a multiple of 128).
    vb: [Vl] local vocab bias shard.
    bw: [h] blank head.
    bb: [] blank bias.
    batch_tile: Rows per grid step.
    interpret: Pallas interpreter mode (CPU tests).
    compute_dtype: MXU input dtype; None = bfloat16 compiled / float32
      interpreted. Pass jnp.float32 for exact on-hardware parity checks
      (benchmarks/tpu_tp_kernel_check.py).

  Returns:
    (red [B, Vl], blank [B, S_pad]); fully differentiable (kernel VJP).
  """
  red, blank = _frame_reduce_fwd(vec, pf_t, pc, vw, vb, bw, bb, batch_tile,
                                 interpret, compute_dtype)
  return red, blank


def _tiles(s_pad, v_local):
  """(s_tile, num_s_tiles, v_tile, num_v_tiles); vocab tiling shares
  fused_scan's policy so the monolithic and sharded kernels stay tuned
  together."""
  s_tile = 128
  v_tile = _choose_v_tile(v_local)
  return s_tile, s_pad // s_tile, v_tile, v_local // v_tile


def _frame_reduce_fwd(vec, pf_t, pc, vw, vb, bw, bb, batch_tile, interpret,
                      compute_dtype=None):
  if compute_dtype is None:
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16
  batch, s_pad = vec.shape
  hidden = pc.shape[-1]
  v_local = vw.shape[-1]
  if s_pad % _LANES or v_local % _LANES:
    raise ValueError(f'frame_reduce needs 128-aligned shapes, got '
                     f'S_pad={s_pad}, V_local={v_local}')
  batch_tile = min(batch_tile, _round_up(batch, 8))
  b_pad = _round_up(batch, batch_tile)
  if b_pad != batch:
    vec = jnp.pad(vec, ((0, b_pad - batch), (0, 0)),
                  constant_values=NEG_INF)
    pf_t = jnp.pad(pf_t, ((0, b_pad - batch), (0, 0)))
  s_tile, num_s_tiles, v_tile, num_v_tiles = _tiles(s_pad, v_local)

  kernel = functools.partial(
      _frame_reduce_fwd_kernel,
      batch_tile=batch_tile,
      s_tile=s_tile,
      num_s_tiles=num_s_tiles,
      v_tile=v_tile,
      num_v_tiles=num_v_tiles,
      compute_dtype=compute_dtype)

  # Vocab-tile-major head layout for leading-axis fori indexing.
  vw3 = jnp.moveaxis(vw.reshape(hidden, num_v_tiles, v_tile), 1, 0)
  vb3 = vb.reshape(num_v_tiles, 1, v_tile)
  red, blank = pl.pallas_call(
      kernel,
      grid=(b_pad // batch_tile,),
      in_specs=[
          pl.BlockSpec((batch_tile, s_pad), lambda b: (b, 0)),
          pl.BlockSpec((batch_tile, hidden), lambda b: (b, 0)),
          pl.BlockSpec((s_pad, hidden), lambda b: (0, 0)),
          pl.BlockSpec((num_v_tiles, hidden, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((num_v_tiles, 1, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((hidden, 1), lambda b: (0, 0)),
          pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
      ],
      out_specs=[
          pl.BlockSpec((batch_tile, v_local), lambda b: (b, 0)),
          pl.BlockSpec((num_s_tiles, batch_tile, s_tile),
                       lambda b: (0, b, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((b_pad, v_local), jnp.float32),
          jax.ShapeDtypeStruct((num_s_tiles, b_pad, s_tile), jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
          pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
          pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(vec, pf_t, pc, vw3, vb3, bw[:, None], bb[None, None])
  blank = jnp.moveaxis(blank, 0, 1).reshape(b_pad, s_pad)
  return red[:batch], blank[:batch]


def _frame_reduce_vjp_fwd(vec, pf_t, pc, vw, vb, bw, bb, batch_tile,
                          interpret, compute_dtype):
  red, blank = _frame_reduce_fwd(vec, pf_t, pc, vw, vb, bw, bb, batch_tile,
                                 interpret, compute_dtype)
  return (red, blank), (vec, pf_t, pc, vw, vb, bw, red)


def _frame_reduce_vjp_bwd(batch_tile, interpret, compute_dtype, residuals,
                          cotangents):
  vec, pf_t, pc, vw, vb, bw, red = residuals
  if compute_dtype is None:
    compute_dtype = jnp.float32 if interpret else jnp.bfloat16
  d_red, d_blank = cotangents
  batch, s_pad = vec.shape
  hidden = pc.shape[-1]
  v_local = vw.shape[-1]
  batch_tile = min(batch_tile, _round_up(batch, 8))
  b_pad = _round_up(batch, batch_tile)
  if b_pad != batch:
    vec = jnp.pad(vec, ((0, b_pad - batch), (0, 0)),
                  constant_values=NEG_INF)
    pf_t = jnp.pad(pf_t, ((0, b_pad - batch), (0, 0)))
    red = jnp.pad(red, ((0, b_pad - batch), (0, 0)),
                  constant_values=NEG_INF)
    d_red = jnp.pad(d_red, ((0, b_pad - batch), (0, 0)))
    d_blank = jnp.pad(d_blank, ((0, b_pad - batch), (0, 0)))
  s_tile, num_s_tiles, v_tile, num_v_tiles = _tiles(s_pad, v_local)

  kernel = functools.partial(
      _frame_reduce_bwd_kernel,
      batch_tile=batch_tile,
      s_tile=s_tile,
      num_s_tiles=num_s_tiles,
      v_tile=v_tile,
      num_v_tiles=num_v_tiles,
      compute_dtype=compute_dtype)

  vw3 = jnp.moveaxis(vw.reshape(hidden, num_v_tiles, v_tile), 1, 0)
  vb3 = vb.reshape(num_v_tiles, 1, v_tile)
  d_vec, d_pf, d_pc, d_vw, d_vb, d_bw, d_bb = pl.pallas_call(
      kernel,
      grid=(b_pad // batch_tile,),
      in_specs=[
          pl.BlockSpec((batch_tile, s_pad), lambda b: (b, 0)),
          pl.BlockSpec((batch_tile, hidden), lambda b: (b, 0)),
          pl.BlockSpec((s_pad, hidden), lambda b: (0, 0)),
          pl.BlockSpec((num_v_tiles, hidden, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((num_v_tiles, 1, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((1, hidden), lambda b: (0, 0)),
          pl.BlockSpec((batch_tile, v_local), lambda b: (b, 0)),
          pl.BlockSpec((batch_tile, v_local), lambda b: (b, 0)),
          pl.BlockSpec((batch_tile, s_pad), lambda b: (b, 0)),
      ],
      out_specs=[
          pl.BlockSpec((num_s_tiles, batch_tile, s_tile),
                       lambda b: (0, b, 0)),
          pl.BlockSpec((batch_tile, hidden), lambda b: (b, 0)),
          pl.BlockSpec((s_pad, hidden), lambda b: (0, 0)),
          pl.BlockSpec((num_v_tiles, hidden, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((num_v_tiles, 1, v_tile), lambda b: (0, 0, 0)),
          pl.BlockSpec((1, hidden), lambda b: (0, 0)),
          pl.BlockSpec((1, 1), lambda b: (0, 0), memory_space=pltpu.SMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((num_s_tiles, b_pad, s_tile), jnp.float32),
          jax.ShapeDtypeStruct((b_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct((s_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct((num_v_tiles, hidden, v_tile), jnp.float32),
          jax.ShapeDtypeStruct((num_v_tiles, 1, v_tile), jnp.float32),
          jax.ShapeDtypeStruct((1, hidden), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
          pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
          pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
          pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
          pltpu.VMEM((batch_tile * s_tile, hidden), jnp.float32),
          pltpu.VMEM((s_pad, hidden), jnp.float32),
          pltpu.VMEM((num_v_tiles, hidden, v_tile), jnp.float32),
          pltpu.VMEM((num_v_tiles, 1, v_tile), jnp.float32),
          pltpu.VMEM((1, hidden), jnp.float32),
          pltpu.SMEM((1, 1), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(vec, pf_t, pc, vw3, vb3, bw[None, :], red, d_red, d_blank)
  d_vec = jnp.moveaxis(d_vec, 0, 1).reshape(b_pad, s_pad)
  d_vw = jnp.moveaxis(d_vw, 0, 1).reshape(hidden, v_local)
  return (d_vec[:batch], d_pf[:batch], d_pc, d_vw, d_vb.reshape(v_local),
          d_bw[0], d_bb[0, 0])


frame_reduce.defvjp(_frame_reduce_vjp_fwd, _frame_reduce_vjp_bwd)


def tp_plan(lattice, vocab_size: int, model_parallel: int,
            backend: str):
  """Composed TP-island gate: can this config run the sharded kernels?

  Combines the structural check (``tp_supported``), the 128-lane local
  shard constraint (``frame_reduce`` raises otherwise), and the backend:
  the Pallas kernels Mosaic-compile only on TPU, so off-TPU the island
  runs only in explicit interpreter mode.

  Returns:
    None when the config should take the XLA auto-partitioner fallback;
    otherwise the ``interpret`` flag to pass to
    ``parallel.sharding.make_tp_train_step`` (False on TPU, True for
    ``lattice.fused == 'interpret'`` CPU-mesh runs).
  """
  if getattr(lattice, 'fused', 'never') == 'never':
    return None
  if not tp_supported(lattice):
    return None
  if model_parallel < 1 or vocab_size % model_parallel:
    return None
  if (vocab_size // model_parallel) % _LANES:
    return None
  if lattice.fused == 'interpret':
    return True
  return False if backend == 'tpu' else None


def tp_supported(lattice) -> bool:
  """Whether the tensor-parallel lattice loss covers this lattice."""
  from last_torch_tpu import alignments, contexts, weight_fns
  weight_fn = lattice.weight_fn
  if isinstance(weight_fn, weight_fns.LocallyNormalizedWeightFn):
    # Locally normalized losses have no denominator; the numerator path
    # handles the sharded head by gathering it (cheap), so anything goes.
    return True
  if type(weight_fn) is not weight_fns.JointWeightFn:
    return False
  if not isinstance(lattice.context, contexts.FullNGram):
    return False
  if lattice.context.context_size != 1:
    return False
  return isinstance(
      lattice.alignment,
      (alignments.FrameDependent, alignments.FrameLabelDependent))


def sharded_shortest_distance(wf_params, cache, frames, num_frames, *,
                              max_expansions: int,
                              frame_dependent: bool,
                              num_context_states: int,
                              model_axis: str = 'model',
                              batch_tile: int = 8,
                              interpret: bool = False,
                              alpha0=None,
                              t_offset=0,
                              return_alpha: bool = False):
  """Log-semiring shortest distance with the vocab head sharded.

  Must run inside ``jax.shard_map`` with ``wf_params['vocab_w']`` /
  ``['vocab_b']`` carrying this device's shard of the vocab axis and all
  other arguments shard-local (batch) or replicated. Differentiable via
  the ``frame_reduce`` kernel VJP and the scan/all_gather transposes.

  Args:
    wf_params: JointWeightFn params; vocab head holds the LOCAL shard.
    cache: [S, emb] context embedding table (replicated).
    frames: [B_local, T, feature] local batch shard.
    num_frames: [B_local] int32.
    max_expansions: k for FrameLabelDependent.
    frame_dependent: FrameDependent vs FrameLabelDependent recursion.
    num_context_states: 1 + global vocab size (bigram).
    model_axis: Mesh axis name the vocab head is sharded over.
    batch_tile: Kernel rows per grid step.
    interpret: Pallas interpreter mode (CPU-mesh tests).
    alpha0: Optional [B_local, S_pad(128-rounded)] initial alpha (log
      space). Defaults to the one-hot start state. Together with
      ``t_offset`` / ``return_alpha`` this chains frame blocks across a
      time-sharded relay (seq x tp — ``parallel.sequence.
      tp_shortest_distance_time_sharded``).
    t_offset: Global frame index of ``frames[:, 0]`` for the padding
      test (frames at global t >= num_frames leave alpha unchanged).
    return_alpha: Return the full [B_local, S_pad] final alpha instead
      of its log-sum over real states.

  Returns:
    [B_local] log-partition values, or the final alpha when
    ``return_alpha``.
  """
  num_frames = jnp.asarray(num_frames, jnp.int32)
  batch, max_t, _ = frames.shape
  s = num_context_states
  v_local = wf_params['vocab_w'].shape[-1]
  # The model-axis size is implied statically: bigram means S = 1 + V.
  vocab = s - 1
  if vocab % v_local:
    raise ValueError(
        f'sharded_shortest_distance requires the local vocab shard '
        f'({v_local}) to evenly divide the global vocabulary ({vocab})')
  if v_local % _LANES:
    raise ValueError(
        f'the local vocab shard must be a multiple of {_LANES}, got '
        f'{v_local}; pad the vocabulary or change the model-axis size')
  s_pad = _round_up(s, _LANES)

  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  pc = jnp.pad(cache @ wf_params['context_proj'], ((0, s_pad - s), (0, 0)))
  vw = wf_params['vocab_w']
  vb = wf_params['vocab_b']
  bw = wf_params['blank_w']
  bb = wf_params['blank_b']
  log = semirings.Log

  def expand(red):
    """[B, V] gathered reduction -> [B, S_pad] state vector."""
    pad_cols = jnp.full((batch, s_pad - 1 - vocab), NEG_INF, jnp.float32)
    start_col = jnp.full((batch, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  def reduce_gather(vec, pf_t):
    red_local, blank = frame_reduce(vec, pf_t, pc, vw, vb, bw, bb,
                                    batch_tile, interpret)
    red = jax.lax.all_gather(red_local, model_axis, axis=1, tiled=True)
    return red, blank

  def frame_fn(carry, pf_t):
    t, alpha = carry
    red, blank = reduce_gather(alpha, pf_t)
    if frame_dependent:
      next_alpha = log.plus(alpha + blank, expand(red))
    else:
      acc = alpha + blank
      last = expand(red)
      for i in range(1, max_expansions + 1):
        acc = log.plus(acc, last + blank)
        if i < max_expansions:
          red, _ = reduce_gather(last, pf_t)
          last = expand(red)
      next_alpha = acc
    is_padding = (t >= num_frames)[:, None]
    next_alpha = jnp.where(is_padding, alpha, next_alpha)
    return (t + 1, next_alpha), None

  if alpha0 is None:
    alpha0 = jnp.full((batch, s_pad), NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(0.0)
  (_, alpha_t), _ = jax.lax.scan(
      frame_fn, (jnp.asarray(t_offset, jnp.int32), alpha0), pf)
  if return_alpha:
    return alpha_t
  return log.sum(alpha_t[:, :s], axis=-1)


def tp_lattice_loss(lattice, params, frames, num_frames, labels,
                    num_labels, *, model_axis: str = 'model',
                    batch_tile: int = 8, interpret: bool = False):
  """Recognition-lattice loss with the vocab head sharded (runs in shard_map).

  The numerator (string forward) runs on the all-gathered vocab head —
  it is the cheap pass, and the gather transpose (psum-scatter) routes
  its head gradients back to the shards. The globally-normalized
  denominator runs ``sharded_shortest_distance`` so the O(B*S*V) work
  and memory stay sharded. Matches ``RecognitionLattice.loss``.

  Args:
    lattice: The RecognitionLattice (structure only; no params inside).
    params: Lattice parameter pytree with the vocab head sharded.
    frames: [B_local, T, feature] local batch shard of encoded frames.
    num_frames / labels / num_labels: local batch shards.
    model_axis: Mesh axis name of the vocab sharding.
    batch_tile / interpret: see ``sharded_shortest_distance``.

  Returns:
    [B_local] per-sequence loss.
  """
  from last_torch_tpu import weight_fns

  wf_local = params['weight_fn']
  full_wf = dict(
      wf_local,
      vocab_w=jax.lax.all_gather(wf_local['vocab_w'], model_axis, axis=1,
                                 tiled=True),
      vocab_b=jax.lax.all_gather(wf_local['vocab_b'], model_axis, axis=0,
                                 tiled=True))
  full_params = dict(params, weight_fn=full_wf)
  cache = lattice.build_cache(params)
  numerator = lattice._string_forward(
      params=full_params, cache=cache, frames=frames,
      num_frames=num_frames, labels=labels, num_labels=num_labels,
      semiring=semirings.Log)
  if isinstance(lattice.weight_fn, weight_fns.LocallyNormalizedWeightFn):
    return -numerator
  from last_torch_tpu import alignments
  frame_dependent = isinstance(lattice.alignment,
                               alignments.FrameDependent)
  denominator = sharded_shortest_distance(
      wf_local, cache, frames, jnp.asarray(num_frames, jnp.int32),
      max_expansions=(0 if frame_dependent else
                      lattice.alignment.max_expansions),
      frame_dependent=frame_dependent,
      num_context_states=lattice.context.shape()[0],
      model_axis=model_axis,
      batch_tile=batch_tile,
      interpret=interpret)
  return denominator - numerator
