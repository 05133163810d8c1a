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

"""Fused joint+head Pallas kernel for the XLA lattice routes.

``JointWeightFn.apply`` computes ``joint = tanh(pc + pf)`` followed by the
blank/vocab heads (reference ``weight_fns.py:L99-L138``'s shared-emb joint
network). On the XLA path the ``[B, S, h]`` joint tensor is materialized in
HBM every frame (34 MB at the trigram probe config) and its float32
cotangent twice over in the backward (136 MB/frame) — HBM traffic, not
FLOPs, dominates every lattice route that does not hit the fused DP
kernels (FullNGram context_size >= 2, NextStateTable DFAs, tuple-semiring
scans). This kernel keeps the joint entirely in VMEM:

* forward: grid (B, S-tiles); per cell ``tanh(pc_tile + pf[b])`` is
  computed in registers and immediately contracted with the combined
  head matrix on the MXU — the joint never touches HBM. The blank head
  rides as ONE extra column of the vocab head (written into the first
  padding lane), so the whole cell is a single dot.
* backward (custom VJP): grid (S-tiles, B); the joint is recomputed
  per cell (FLOPs only), ``d_joint`` lives and dies in registers, the
  ``[h, V]`` head gradient accumulates in a VMEM scratch across the
  whole grid, and ``d_pc`` accumulates in-place across the (consecutive)
  b-sweep. Only the O(B*S*V) cotangent and the O(S*h) ``d_pc`` ever
  cross HBM.

Unlike the shelved trigram DP kernels (``trigram_scan.py``, 0.71x XLA:
per-segment fori overhead), every cell here is one large dense dot —
exactly the shape Mosaic pipelines well.

Scope: ``state=None`` single-batch-dim calls (the per-frame scan shape),
float32 params, compute_dtype float32/bfloat16. Everything else falls
back to the plain XLA einsums in ``JointWeightFn.apply``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from last_torch_tpu.ops.fused_scan import _LANES, _mxu_precision, _round_up

# GATED OFF BY DEFAULT (measured negative, v5e, 2026-08-17): at the
# trigram probe config (V=64 S=4161 B=8 T=200 h=512 k=2, bf16) the
# in-process A/B gives 201.1 ms with this kernel vs 132.6 ms plain XLA
# (0.66x) — per-frame Mosaic dispatch + backward replay inside the
# lax.scan cost ~0.34 ms/frame, more than the joint's HBM traffic they
# save; the weights-only forward is at parity (40.2 vs 41.3 ms). Same
# structural negative as trigram_scan (0.70x): only whole-sequence
# kernels (fused_scan) beat XLA fusion on this chip. Full analysis:
# ops/README.md. FORCE opts in on hardware; FORCE_INTERPRET enables the
# interpret-mode path for tests; DISABLE wins over both.
FORCE = False
FORCE_INTERPRET = False
DISABLE = False

# Below this many context states the XLA einsums are fine and the
# per-frame pallas dispatch is not worth it (the bigram production path
# never reaches apply() inside a scan anyway — it runs the fused DP
# kernels).
_MIN_STATES = 1024
_MAX_BATCH = 64
_MAX_HIDDEN = 1024
_MAX_VOCAB_PAD = 2048


def _s_tile(s: int) -> int:
  """Largest tile in (512, 384, 256, 128) wasting <= 6% padding."""
  for st in (512, 384, 256, 128):
    if _round_up(s, st) <= 1.06 * s:
      return st
  return _LANES


def supported(weight_fn, cache, frame, state) -> bool:
  """True when the fused joint+head kernel handles this apply() call."""
  if DISABLE:
    return False
  if state is not None:
    return False
  if not (hasattr(frame, 'ndim') and frame.ndim == 2 and cache.ndim == 2):
    return False
  enabled = (FORCE and jax.default_backend() in ('tpu', 'axon')
             ) or FORCE_INTERPRET
  if not enabled:
    return False
  batch = frame.shape[0]
  num_states = cache.shape[0]
  hidden = weight_fn.hidden_size
  v_pad = _round_up(weight_fn.vocab_size + 1, _LANES)
  if weight_fn.compute_dtype not in (None, jnp.float32, jnp.bfloat16):
    return False
  return (num_states >= _MIN_STATES and batch <= _MAX_BATCH
          and hidden % _LANES == 0 and hidden <= _MAX_HIDDEN
          and v_pad <= _MAX_VOCAB_PAD)


def blank_lexical(weight_fn, params, cache, frame):
  """Drop-in for the ``state=None`` branch of ``JointWeightFn.apply``.

  Returns (blank [B, S], lexical [B, S, V]) with the same dtypes and
  (up to MXU rounding of the fused contraction) the same values as the
  XLA einsum route.
  """
  compute_dtype = weight_fn.compute_dtype or jnp.float32
  # Projections stay in XLA: they are O(B*h) / O(S*emb*h) and their
  # VJPs (to frame / cache / projection params) are plain matmuls.
  pf = _mm(frame, params['frame_proj'], compute_dtype)
  pc = _mm(cache, params['context_proj'], compute_dtype)
  vocab = weight_fn.vocab_size
  v_pad = _round_up(vocab + 1, _LANES)
  # Blank rides as column `vocab` of the combined head.
  w = jnp.zeros((params['vocab_w'].shape[0], v_pad), jnp.float32)
  w = w.at[:, :vocab].set(params['vocab_w'])
  w = w.at[:, vocab].set(params['blank_w'])
  b = jnp.zeros((v_pad,), jnp.float32)
  b = b.at[:vocab].set(params['vocab_b'])
  b = b.at[vocab].set(params['blank_b'])
  full = _joint_head(pc, pf, w, b, compute_dtype=compute_dtype,
                     interpret=FORCE_INTERPRET)
  return full[..., vocab], full[..., :vocab]


def _mm(a, b, compute_dtype):
  return jnp.einsum('...i,io->...o', a.astype(compute_dtype),
                    b.astype(compute_dtype),
                    preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _joint_head(pc, pf, w, b, compute_dtype, interpret):
  """tanh(pc[s] + pf[bt]) @ w + b -> [B, S, V_pad] without HBM joint."""
  out, _ = _joint_head_fwd(pc, pf, w, b, compute_dtype, interpret)
  return out


def _joint_head_fwd(pc, pf, w, b, compute_dtype, interpret):
  num_states, hidden = pc.shape
  batch = pf.shape[0]
  v_pad = w.shape[1]
  st = _s_tile(num_states)
  s_pad = _round_up(num_states, st)
  if s_pad != num_states:
    pc = jnp.pad(pc, ((0, s_pad - num_states), (0, 0)))
  kernel = functools.partial(_fwd_kernel, compute_dtype=compute_dtype)
  # Grid order: s-tiles OUTER, batch INNER — the pc tile's index map
  # ignores bt, so it stays resident in VMEM across the whole b-sweep
  # (one fetch per s-tile, S_pad*h*4 bytes/frame total instead of B x
  # that with the orders swapped).
  full = pl.pallas_call(
      kernel,
      grid=(s_pad // st, batch),
      in_specs=[
          pl.BlockSpec((st, hidden), lambda s, bt: (s, 0)),
          # Whole [B, h] block: a (1, h) block is not a legal Mosaic
          # tile (second-to-minor must be 8-divisible or the full dim);
          # the kernel dynamic-slices its row off the sublane axis.
          pl.BlockSpec((batch, hidden), lambda s, bt: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda s, bt: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda s, bt: (0, 0)),
      ],
      out_specs=pl.BlockSpec((1, st, v_pad), lambda s, bt: (bt, s, 0)),
      out_shape=jax.ShapeDtypeStruct((batch, s_pad, v_pad), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(pc, pf, w.astype(compute_dtype), b[None, :])
  out = full[:, :num_states, :]
  return out, (pc, pf, w)


def _fwd_kernel(pc_ref, pf_ref, w_ref, b_ref, out_ref, *, compute_dtype):
  pf_row = pf_ref[pl.ds(pl.program_id(1), 1)]  # [1, h]
  joint = jnp.tanh(pc_ref[...] + pf_row)  # [St, h] f32
  out = jax.lax.dot_general(
      joint.astype(compute_dtype), w_ref[...],
      (((1,), (0,)), ((), ())),
      precision=_mxu_precision(compute_dtype),
      preferred_element_type=jnp.float32)
  out_ref[0] = out + b_ref[...]


def _joint_head_bwd(compute_dtype, interpret, residuals, g):
  pc_padded, pf, w = residuals
  s_pad, hidden = pc_padded.shape
  batch = pf.shape[0]
  v_pad = w.shape[1]
  num_states = g.shape[1]
  st = _s_tile(num_states)
  assert s_pad == _round_up(num_states, st), (s_pad, num_states, st)
  if s_pad != num_states:
    g = jnp.pad(g, ((0, 0), (0, s_pad - num_states), (0, 0)))
  num_s_tiles = s_pad // st
  kernel = functools.partial(
      _bwd_kernel,
      num_s_tiles=num_s_tiles,
      batch=batch,
      compute_dtype=compute_dtype)
  d_pc, d_pf_parts, d_w = pl.pallas_call(
      kernel,
      grid=(num_s_tiles, batch),
      in_specs=[
          pl.BlockSpec((1, st, v_pad), lambda s, bt: (bt, s, 0)),
          pl.BlockSpec((st, hidden), lambda s, bt: (s, 0)),
          # Whole [B, h] block (legal-tile rule; see forward).
          pl.BlockSpec((batch, hidden), lambda s, bt: (0, 0)),
          pl.BlockSpec((v_pad, hidden), lambda s, bt: (0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((st, hidden), lambda s, bt: (s, 0)),
          # One [B, h] panel per s-tile, indexed by s only: each bt
          # iteration writes its own row; the block flushes when s
          # advances (bt is the inner grid axis).
          pl.BlockSpec((1, batch, hidden), lambda s, bt: (s, 0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda s, bt: (0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((s_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct((num_s_tiles, batch, hidden), jnp.float32),
          jax.ShapeDtypeStruct((hidden, v_pad), jnp.float32),
      ],
      scratch_shapes=[pltpu.VMEM((hidden, v_pad), jnp.float32)],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(g, pc_padded, pf, jnp.swapaxes(w, 0, 1).astype(compute_dtype))
  d_pc = d_pc[:num_states]
  d_pf = jnp.sum(d_pf_parts, axis=0)
  d_b = jnp.sum(g, axis=(0, 1))
  return d_pc, d_pf, d_w, d_b


def _bwd_kernel(g_ref, pc_ref, pf_ref, wt_ref, d_pc_ref, d_pf_ref, d_w_ref,
                d_w_scr, *, num_s_tiles, batch, compute_dtype):
  s = pl.program_id(0)
  bt = pl.program_id(1)
  prec = _mxu_precision(compute_dtype)
  pf_row = pf_ref[pl.ds(bt, 1)]  # [1, h]
  joint = jnp.tanh(pc_ref[...] + pf_row)  # [St, h] f32
  gc = g_ref[0].astype(compute_dtype)  # [St, v_pad]
  # d_joint = g @ w^T, then through the tanh.
  d_joint = jax.lax.dot_general(
      gc, wt_ref[...], (((1,), (0,)), ((), ())),
      precision=prec, preferred_element_type=jnp.float32)
  du = d_joint * (1.0 - joint * joint)  # [St, h] f32

  # d_pc accumulates in place across the (consecutive) b-sweep.
  @pl.when(bt == 0)
  def _():
    d_pc_ref[...] = du

  @pl.when(bt > 0)
  def _():
    d_pc_ref[...] += du

  # d_pf partial for this (s, b) cell; summed over s outside. keepdims
  # keeps the store 2-D (Mosaic dislikes 1-D values).
  d_pf_ref[0, pl.ds(bt, 1)] = jnp.sum(du, axis=0, keepdims=True)

  # d_w = joint^T @ g accumulates in VMEM across the whole grid.
  dw = jax.lax.dot_general(
      joint.astype(compute_dtype), gc, (((0,), (0,)), ((), ())),
      precision=prec, preferred_element_type=jnp.float32)

  @pl.when((s == 0) & (bt == 0))
  def _():
    d_w_scr[...] = dw

  @pl.when((s > 0) | (bt > 0))
  def _():
    d_w_scr[...] += dw

  @pl.when((s == num_s_tiles - 1) & (bt == batch - 1))
  def _():
    d_w_ref[...] = d_w_scr[...]


_joint_head.defvjp(_joint_head_fwd, _joint_head_bwd)
