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

"""Whole-sequence Pallas kernel for the locally-normalized numerator.

The HAT / locally-normalized loss is numerator-only (reference
``lattices.py:178-179``), and its cost is the
``LocallyNormalizedWeightFn.label_weights`` stage (reference contract:
``weight_fns.py:146-151`` normalization over the full vocab): for every
(label position u, frame t) pair the full vocab head must run to obtain
the local normalizer. The XLA frame-major scan (weight_fns.py) is
matmul-optimal in FLOPs but measured at only 43% of the matmul floor
(BASELINE.md round 4): every frame materializes the [B, U+1, V] logits
and [B, U+1, h] joint in HBM, and the per-frame logsumexp keeps XLA from
fusing the epilogue.

This kernel runs the WHOLE sequence in one ``pallas_call`` with T as the
grid axis — the shape of kernel that wins on this chip (see the measured
per-frame-dispatch negatives for trigram_scan and joint_head in
ops/README.md). Per frame, entirely in VMEM:

* rows = flattened (b, u) pairs with per-batch stride ``U1p =
  round_up(U+1, 8)`` (8-aligned sublane offsets); the joint
  ``tanh(pc_row + pf[t, b])`` is built by a B-step fori loop of sublane
  slices into a scratch, then ONE ``[R, h] x [h, V]`` MXU matmul gives
  the vocab logits. Blank and the selected-label logit are VPU row-sums
  ``rowsum(joint * w)`` — no padded head columns, so the matmul is
  exactly the algorithmic FLOPs.
* the local normalizer ``z = logsumexp_V`` and the normalized (blank,
  lexical) weights are computed in registers; only four scalars per row
  leave the kernel, packed on an 8-wide lane axis ([T, R, 8]: nb, nl,
  z, blank) because an [R, 1] column cannot legally be stored as a lane
  row on Mosaic.
* backward (custom VJP) replays joint+logits per frame (remat
  in-kernel), forms ``ds = c * exp(logits - ref)`` in place, and
  accumulates d_pc, d_wy [R, h], d_W [h, V], d_vb and d_blank_w in
  revisited output blocks across the whole T grid; d_pf streams out per
  frame. Saved residuals are just the z/blank lanes of the forward
  pack.

Supports hat_normalize and log_softmax_normalize. Gated by
``supported()``; anything else falls back to the XLA scan route in
``weight_fns.LocallyNormalizedWeightFn.label_weights``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from last_torch_tpu.ops.fused_scan import _LANES, _mxu_precision, _round_up

# Escape hatches: DISABLE falls back to the XLA scan everywhere;
# FORCE_INTERPRET enables the interpret-mode path for CPU tests.
FORCE_INTERPRET = False
DISABLE = False

# Frames per grid cell. The kernel is bound by the SERIAL sum of its MXU
# matmul (~21 us/frame at headline shapes) and its VPU work
# (exp/tanh/reduces, ~25-30 us/frame), which depend on each other within
# a frame. FRAMES_PER_CELL=2 was built to let Mosaic overlap frame f's
# VPU tail with frame f+1's matmul — measured a wash on hardware
# (216.2 vs 218.1 ms step; Mosaic does not software-pipeline the
# unrolled frames), so the default stays 1. The machinery is kept and
# tested; cross-frame MXU/VPU pipelining remains the one documented
# lever below the current 51%-of-matmul-floor position.
FRAMES_PER_CELL = 1

# Independent batch-tile interleave (VERDICT round-4 task 3): split each
# frame's row block into BATCH_SPLIT batch halves and issue BOTH half
# matmuls before either half's VPU epilogue, so the Mosaic scheduler can
# run half A's exp/logsumexp on the VPU while half B's matmul occupies
# the MXU. Unlike FRAMES_PER_CELL (dependent frames), the halves are
# fully independent within a frame. Measured a WASH on hardware
# (same-process A/B, B=32 T=1600 V=1024 h=512: split=1 181.6 ms,
# split=2 183.2 ms = 0.991x, split=4 185.7 ms = 0.978x;
# benchmarks/tpu_numerator_split_ab.py, 2026-08-19): Mosaic will not
# overlap independent tiles' VPU epilogues with another tile's matmul
# any more than it pipelines dependent frames. Together with the
# FRAMES_PER_CELL wash this closes the MXU/VPU-overlap question — the
# serial MXU+VPU floor is real on this Mosaic. Default stays 1; the
# machinery is kept and correctness-pinned (tests/test_numerator_scan).
BATCH_SPLIT = 1

_MAX_VMEM = 118 * 1024 * 1024


def _spans(batch: int):
  """Row spans (b0, b1) per independent batch tile for this trace."""
  if BATCH_SPLIT <= 1 or batch % BATCH_SPLIT != 0 or batch < BATCH_SPLIT:
    return [(0, batch)]
  step = batch // BATCH_SPLIT
  return [(i * step, (i + 1) * step) for i in range(BATCH_SPLIT)]


def _plan_bytes(num_rows: int, hidden: int, v_pad: int,
                compute_dtype=jnp.bfloat16) -> int:
  """Worst-case (backward) VMEM estimate for the per-frame working set."""
  f32 = 4
  # pc, joint, du scratches, wy, d_pc, d_wy accumulators, dj temp.
  row_h = 7 * num_rows * hidden * f32
  # logits/ds buffers (+ exp temp), up to FRAMES_PER_CELL alive at once.
  row_v = 2 * FRAMES_PER_CELL * num_rows * v_pad * f32
  # W (bf16) + W^T (bf16) + d_W accumulator + bias panels.
  head = 3 * hidden * v_pad * f32
  total = row_h + row_v + head
  if compute_dtype == jnp.float32:
    # float32-compute dots lower to multi-pass MXU programs whose staged
    # operand copies the Mosaic register allocator SPILLS to scoped VMEM
    # (measured: the backward kernel at num_rows=3328, h=512, v_pad=1024
    # needs 131.4 MB — 91 MB of spill slots — where this base estimate
    # says 81 MB and the bf16 variant fits). 3x is calibrated to reject
    # that configuration with margin while keeping small-shape f32
    # parity checks on hardware.
    total *= 3
  return total


def supported(weight_fn, cache, frames, states, next_labels) -> bool:
  """True when the fused numerator kernel handles this call."""
  if DISABLE:
    return False
  if not (jax.default_backend() in ('tpu', 'axon') or FORCE_INTERPRET):
    return False
  if frames.ndim != 3 or states.ndim != 2:  # single batch dim only
    return False
  batch = frames.shape[0]
  u1 = states.shape[1]
  hidden = weight_fn.hidden_size
  vocab = weight_fn.vocab_size
  if weight_fn.compute_dtype not in (None, jnp.float32, jnp.bfloat16):
    return False
  if hidden % _LANES != 0:
    return False
  u1p = _round_up(u1, 8)
  v_pad = _round_up(vocab, _LANES)
  compute_dtype = weight_fn.compute_dtype or jnp.float32
  return _plan_bytes(batch * u1p, hidden, v_pad,
                     compute_dtype) <= _MAX_VMEM


def label_weights(weight_fn, params, cache, frames, states, next_labels,
                  hat: bool):
  """Fused drop-in for LocallyNormalizedWeightFn.label_weights.

  Returns (blank, lexical), each [batch, U+1, T] — identical contract to
  the XLA frame-major scan route (weight_fns.py), with the normalized
  weights defined by hat_normalize (hat=True) or log_softmax_normalize.
  """
  compute_dtype = weight_fn.compute_dtype or jnp.float32
  batch, max_t, _ = frames.shape
  u1 = states.shape[1]
  hidden = weight_fn.hidden_size
  vocab = weight_fn.vocab_size
  u1p = _round_up(u1, 8)
  v_pad = _round_up(vocab, _LANES)

  # XLA prologue (differentiable; the custom VJP starts below it).
  y = jnp.maximum(next_labels, 1) - 1  # [B, U1]
  pf = weight_fn._mm(frames, params['frame_proj'])  # [B, T, h]
  pf = jnp.moveaxis(pf, 1, 0)  # [T, B, h]
  pc = weight_fn._mm(cache, params['context_proj'])[states]  # [B, U1, h]
  wy = params['vocab_w'].T[y]  # [B, U1, h]
  by = params['vocab_b'][y]  # [B, U1]

  def pad_u(x):
    return jnp.pad(x, ((0, 0), (0, u1p - u1)) + ((0, 0),) * (x.ndim - 2))

  pc_flat = pad_u(pc).reshape(batch * u1p, hidden)
  wy_flat = pad_u(wy).reshape(batch * u1p, hidden)
  by_flat = pad_u(by).reshape(batch * u1p)
  w = params['vocab_w']
  if v_pad != vocab:
    w = jnp.pad(w, ((0, 0), (0, v_pad - vocab)))
  # Padding vocab columns must not contribute to the normalizer.
  vb = jnp.full((v_pad,), -1e30, jnp.float32)
  vb = vb.at[:vocab].set(params['vocab_b'])
  # Row-constant scalars packed on lanes: 0=by, 1=bb (broadcast per row).
  bpack = jnp.zeros((batch * u1p, 8), jnp.float32)
  bpack = bpack.at[:, 0].set(by_flat)
  bpack = bpack.at[:, 1].set(params['blank_b'])
  # blank_w rides as sublane row 0 of an [8, h] panel.
  wb = jnp.zeros((8, hidden), jnp.float32).at[0].set(params['blank_w'])

  t_pad = _round_up(max_t, FRAMES_PER_CELL)
  if t_pad != max_t:
    pf = jnp.pad(pf, ((0, t_pad - max_t), (0, 0), (0, 0)))
  out = _numerator(pc_flat, pf, w, wy_flat, vb[None, :], bpack, wb,
                   batch, u1p, hat, compute_dtype,
                   FORCE_INTERPRET)  # [Tp, R, 8]
  nb = out[..., 0].reshape(t_pad, batch, u1p)[:max_t, :, :u1]
  nl = out[..., 1].reshape(t_pad, batch, u1p)[:max_t, :, :u1]
  from_front = lambda x: jnp.moveaxis(x, 0, -1)  # [B, U1, T]
  return from_front(nb), from_front(nl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _numerator(pc, pf, w, wy, vb, bpack, wb, batch, u1p, hat,
               compute_dtype, interpret):
  out, _ = _numerator_fwd(pc, pf, w, wy, vb, bpack, wb, batch, u1p, hat,
                          compute_dtype, interpret)
  return out


def _lane_mask(i):
  return (jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1) == i).astype(
      jnp.float32)


def _lane_col(pack, i):
  """[R, 8] pack -> [R, 1] column i (lane-select via mask+reduce)."""
  return jnp.sum(pack * _lane_mask(i), axis=1, keepdims=True)


def _log_sigmoid(x):
  # Stable: min(x, 0) - log1p(exp(-|x|)).
  return jnp.minimum(x, 0.0) - jnp.log1p(jnp.exp(-jnp.abs(x)))


def _joint(pc, pf, batch, u1p, hidden):
  """tanh(pc + pf broadcast over label positions), loop-free and exact.

  The per-batch broadcast is a 3-D ``broadcast_in_dim`` followed by a
  sublane-compatible merge reshape ([B, u1p, h] -> [B*u1p, h]; u1p is a
  multiple of 8 so the merge is layout-preserving) — hardware-verified
  exact and free, unlike the two measured alternatives: a B-step fori
  of sublane slices (per-iteration overhead put the forward at 32% of
  floor) and an exact 0/1 selector matmul at precision=highest (6 bf16
  passes, ~25 ms/step at headline shapes, 0.91x XLA).

  ``pc`` is the [batch * u1p, hidden] VALUE (a full ref read or a
  static sublane-slice of one for the BATCH_SPLIT tiles).
  """
  pf3 = jax.lax.broadcast_in_dim(pf, (batch, u1p, hidden), (0, 2))
  pf_exp = jnp.reshape(pf3, (batch * u1p, hidden))
  return jnp.tanh(pc + pf_exp)


def _numerator_fwd(pc, pf, w, wy, vb, bpack, wb, batch, u1p, hat,
                   compute_dtype, interpret):
  num_rows, hidden = pc.shape
  max_t = pf.shape[0]
  v_pad = w.shape[1]
  ft = FRAMES_PER_CELL if max_t % FRAMES_PER_CELL == 0 else 1
  kernel = functools.partial(_fwd_kernel, batch=batch, u1p=u1p, hat=hat,
                             hidden=hidden, ft=ft,
                             compute_dtype=compute_dtype)
  out = pl.pallas_call(
      kernel,
      grid=(max_t // ft,),
      in_specs=[
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),
          pl.BlockSpec((ft, batch, hidden), lambda t: (t, 0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((num_rows, 8), lambda t: (0, 0)),
          pl.BlockSpec((8, hidden), lambda t: (0, 0)),
      ],
      out_specs=pl.BlockSpec((ft, num_rows, 8), lambda t: (t, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((max_t, num_rows, 8), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(pc, pf, w.astype(compute_dtype), wy, vb, bpack, wb)
  return out, (pc, pf, w, wy, vb, bpack, wb, out)


def _fwd_kernel(pc_ref, pf_ref, w_ref, wy_ref, vb_ref, bp_ref, wb_ref,
                out_ref, *, batch, u1p, hat, hidden, ft, compute_dtype):
  by = _lane_col(bp_ref[...], 0)
  bb = _lane_col(bp_ref[...], 1)
  spans = _spans(batch)
  for f in range(ft):
    # Stage 1 — joints + head matmuls for ALL batch tiles, issued
    # back-to-back so tile i+1's matmul can occupy the MXU while tile
    # i's VPU epilogue (stage 2) runs.
    staged = []
    for b0, b1 in spans:
      r0, r1 = b0 * u1p, b1 * u1p
      j32 = _joint(pc_ref[r0:r1, :], pf_ref[f][b0:b1, :], b1 - b0, u1p,
                   hidden)
      logits = jax.lax.dot_general(
          j32.astype(compute_dtype), w_ref[...],
          (((1,), (0,)), ((), ())),
          precision=_mxu_precision(compute_dtype),
          preferred_element_type=jnp.float32) + vb_ref[...]
      staged.append((r0, r1, j32, logits))
    # Stage 2 — VPU epilogue per tile.
    for r0, r1, j32, logits in staged:
      m = jnp.max(logits, axis=1, keepdims=True)
      z = m + jnp.log(jnp.sum(jnp.exp(logits - m), axis=1,
                              keepdims=True))
      ly = jnp.sum(j32 * wy_ref[r0:r1, :], axis=1,
                   keepdims=True) + by[r0:r1]
      blank = jnp.sum(j32 * wb_ref[0:1], axis=1,
                      keepdims=True) + bb[r0:r1]
      if hat:
        nb = _log_sigmoid(blank)
        nl = ly - z + _log_sigmoid(-blank)
      else:
        za = jnp.logaddexp(blank, z)
        nb = blank - za
        nl = ly - za
      out_ref[f, r0:r1, :] = (nb * _lane_mask(0) + nl * _lane_mask(1) +
                              z * _lane_mask(2) + blank * _lane_mask(3))


def _numerator_bwd(batch, u1p, hat, compute_dtype, interpret, residuals,
                   g):
  pc, pf, w, wy, vb, bpack, wb, saved = residuals
  num_rows, hidden = pc.shape
  max_t = pf.shape[0]
  v_pad = w.shape[1]
  ft = FRAMES_PER_CELL if max_t % FRAMES_PER_CELL == 0 else 1
  kernel = functools.partial(_bwd_kernel, batch=batch, u1p=u1p, hat=hat,
                             hidden=hidden, ft=ft,
                             compute_dtype=compute_dtype)
  d_pf, d_pc, d_wy, d_w, d_vb8, d_wb8, d_bp = pl.pallas_call(
      kernel,
      grid=(max_t // ft,),
      in_specs=[
          pl.BlockSpec((ft, num_rows, 8), lambda t: (t, 0, 0)),  # g
          pl.BlockSpec((ft, num_rows, 8), lambda t: (t, 0, 0)),  # saved
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),  # pc
          pl.BlockSpec((ft, batch, hidden), lambda t: (t, 0, 0)),  # pf
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),  # w
          pl.BlockSpec((v_pad, hidden), lambda t: (0, 0)),  # w^T
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),  # wy
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),  # vb
          pl.BlockSpec((8, hidden), lambda t: (0, 0)),  # wb
      ],
      out_specs=[
          pl.BlockSpec((ft, batch, hidden), lambda t: (t, 0, 0)),
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),
          pl.BlockSpec((num_rows, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((8, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((8, hidden), lambda t: (0, 0)),
          pl.BlockSpec((num_rows, 8), lambda t: (0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((max_t, batch, hidden), jnp.float32),
          jax.ShapeDtypeStruct((num_rows, hidden), jnp.float32),
          jax.ShapeDtypeStruct((num_rows, hidden), jnp.float32),
          jax.ShapeDtypeStruct((hidden, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((8, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((8, hidden), jnp.float32),
          jax.ShapeDtypeStruct((num_rows, 8), jnp.float32),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=128 * 1024 * 1024),
      interpret=interpret,
  )(g, saved, pc, pf, w.astype(compute_dtype),
    jnp.swapaxes(w, 0, 1).astype(compute_dtype), wy, vb, wb)
  d_vb = d_vb8[0:1]  # [1, v_pad] — matches the vb[None, :] primal
  d_wb = jnp.zeros_like(wb).at[0].set(d_wb8[0])
  return d_pc, d_pf, d_w, d_wy, d_vb, d_bp, d_wb


def _bwd_kernel(g_ref, s_ref, pc_ref, pf_ref, w_ref, wt_ref, wy_ref,
                vb_ref, wb_ref, d_pf_ref, d_pc_ref, d_wy_ref,
                d_w_ref, d_vb_ref, d_wb_ref, d_bp_ref, *,
                batch, u1p, hat, hidden, ft, compute_dtype):
  t = pl.program_id(0)
  prec = _mxu_precision(compute_dtype)
  spans = _spans(batch)
  for f in range(ft):
    # Stage 1 — joints + head matmuls for every batch tile up front.
    staged = []
    for b0, b1 in spans:
      r0, r1 = b0 * u1p, b1 * u1p
      j32 = _joint(pc_ref[r0:r1, :], pf_ref[f][b0:b1, :], b1 - b0, u1p,
                   hidden)
      jc = j32.astype(compute_dtype)
      logits = jax.lax.dot_general(
          jc, w_ref[...], (((1,), (0,)), ((), ())),
          precision=prec,
          preferred_element_type=jnp.float32) + vb_ref[...]
      staged.append((b0, b1, r0, r1, j32, jc, logits))
    # Stage 2 — per tile: the ds VPU block then the two gradient
    # matmuls; tile i+1's ds can overlap tile i's matmuls.
    mids = []
    for b0, b1, r0, r1, j32, jc, logits in staged:
      gpack = g_ref[f][r0:r1, :]
      gb = _lane_col(gpack, 0)
      gl = _lane_col(gpack, 1)
      spack = s_ref[f][r0:r1, :]
      z = _lane_col(spack, 2)
      blank = _lane_col(spack, 3)
      if hat:
        # nb = log_sigmoid(blank); nl = ly - z + log_sigmoid(-blank).
        ds = jnp.exp(logits - z) * (-gl)
        sig = 1.0 / (1.0 + jnp.exp(-blank))
        d_blank = gb * (1.0 - sig) - gl * sig
      else:
        # nb = blank - za; nl = ly - za; za = logaddexp(blank, z).
        za = jnp.logaddexp(blank, z)
        ds = jnp.exp(logits - za) * (-(gb + gl))
        d_blank = gb - (gb + gl) * jnp.exp(blank - za)
      dsc = ds.astype(compute_dtype)
      dj = jax.lax.dot_general(
          dsc, wt_ref[...], (((1,), (0,)), ((), ())),
          precision=prec, preferred_element_type=jnp.float32)
      dw = jax.lax.dot_general(
          jc, dsc, (((0,), (0,)), ((), ())),
          precision=prec, preferred_element_type=jnp.float32)
      mids.append((b0, b1, r0, r1, j32, gl, d_blank, ds, dj, dw))
    # Stage 3 — VPU epilogues + accumulator writes.
    dw_sum = mids[0][9]
    dvb_row = jnp.sum(mids[0][7], axis=0, keepdims=True)  # [1, v_pad]
    dwb_row = jnp.sum(mids[0][6] * mids[0][4], axis=0, keepdims=True)
    for b0, b1, r0, r1, j32, gl, d_blank, ds, dj, dw in mids[1:]:
      dw_sum = dw_sum + dw
      dvb_row = dvb_row + jnp.sum(ds, axis=0, keepdims=True)
      dwb_row = dwb_row + jnp.sum(d_blank * j32, axis=0, keepdims=True)
    tiles = []
    for b0, b1, r0, r1, j32, gl, d_blank, ds, dj, dw in mids:
      djf = dj + gl * wy_ref[r0:r1, :] + d_blank * wb_ref[0:1]
      du = djf * (1.0 - j32 * j32)
      # Per-row bias cotangents: lane 0 = d_by (= gl), lane 1 = d_bb.
      dbp = gl * _lane_mask(0) + d_blank * _lane_mask(1)
      tiles.append((b0, b1, r0, r1, du, gl * j32, dbp))
      # d_pf rows: per-b sums over the u-range of du — the inverse of
      # the _joint broadcast: sublane-compatible split reshape + one
      # reduce.
      du3 = jnp.reshape(du, (b1 - b0, u1p, hidden))
      d_pf_ref[f, b0:b1, :] = jnp.sum(du3, axis=1)

    if f == 0:
      @pl.when(t == 0)
      def _(tiles=tiles, dw_sum=dw_sum, dvb_row=dvb_row,
            dwb_row=dwb_row):
        for b0, b1, r0, r1, du, dwy, dbp in tiles:
          d_pc_ref[r0:r1, :] = du
          d_wy_ref[r0:r1, :] = dwy
          d_bp_ref[r0:r1, :] = dbp
        d_w_ref[...] = dw_sum
        d_vb_ref[...] = dvb_row * jnp.ones((8, 1), jnp.float32) * _sub0()
        d_wb_ref[...] = dwb_row * jnp.ones((8, 1), jnp.float32) * _sub0()

      @pl.when(t > 0)
      def _(tiles=tiles, dw_sum=dw_sum, dvb_row=dvb_row,
            dwb_row=dwb_row):
        for b0, b1, r0, r1, du, dwy, dbp in tiles:
          d_pc_ref[r0:r1, :] += du
          d_wy_ref[r0:r1, :] += dwy
          d_bp_ref[r0:r1, :] += dbp
        d_w_ref[...] += dw_sum
        d_vb_ref[0:1] += dvb_row
        d_wb_ref[0:1] += dwb_row
    else:
      for b0, b1, r0, r1, du, dwy, dbp in tiles:
        d_pc_ref[r0:r1, :] += du
        d_wy_ref[r0:r1, :] += dwy
        d_bp_ref[r0:r1, :] += dbp
      d_w_ref[...] += dw_sum
      d_vb_ref[0:1] += dvb_row
      d_wb_ref[0:1] += dwb_row


def _sub0():
  """[8, 1] float mask selecting sublane row 0."""
  return (jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == 0).astype(
      jnp.float32)


_numerator.defvjp(_numerator_fwd, _numerator_bwd)
