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

"""Fused Pallas TPU kernels for TRIGRAM (context_size=2) lattices.

The bigram kernels (``fused_scan.py``) exploit that every destination
state 1+y receives from ALL source states — the within-frame reduction is
one dense ``[B, S] x [B, S, V]`` logsumexp-matvec. A trigram FullNGram
breaks that: destination (p, y) receives only from sources whose LAST
symbol is p (reference ``contexts.py:190-230``'s block structure).

These kernels keep the round-3 **segment-major state layout** — the
S = 1 + V + V^2 states grouped into P = V + 1 segments by last symbol
(segment 0 = [start], segment p = [unigram p, bigram (1, p), ...,
bigram (V, p)]) — but replace the round-3 per-segment machinery (a
~400-600-iteration budget of P-length ``fori`` loops per frame whose
~1-2 us fixed cost made the first kernel 0.71x XLA) with whole-array
ops, one per within-frame phase:

* all per-state tensors live **b-major 2-D**: rows (b, p), columns s
  (source row within segment); the E = exp(lex - rowmax) cache is
  ``[B * PP * SEG, V_pad]`` with rows (b, p, s). ``PP = SEG =
  round_up(P, 8)`` pads both the segment axis and the within-segment
  axis, so every reshape between ``[N, SEG]``, ``[N, SEG, V_pad]`` and
  ``[B, PP, SEG]`` is a legal leading-axis split/merge.
* the within-frame segment reduction ``red[b, p, y] = logsumexp_s
  (alpha[b, p, s] + lex[b, p, s, y])`` is ONE max-shifted 3-D
  broadcast-multiply ``u[:, :, None] * E3`` + a single axis-1 sum
  (chunked 4x over rows to bound the temporary), instead of P matvecs;
* the destination scatter — state (p, y) sits at layout position
  (segment y, row p), a (p <-> y) transpose — is one exact
  ``dot_general`` against an identity per batch row (contract axis 0
  with axis 0, the contraction pattern the round-3 kernel already
  proved on hardware), 8 unrolled dots per sweep instead of V;
* the backward's beta gather ``bt[b, p, y] = nb[b, segment y+1, row p]``
  is the same transpose against a shift matrix; the arc marginals are
  3-D broadcast products ``E * ws[:, :, None] * wy[:, None, :]``; and
  the head/tanh gradient accumulation runs over NT (~8) large state
  tiles, not P segments.

Per frame that is ~15 chunky ops (a handful of fori iterations, each
doing 0.1-0.6 GFLOP of MXU work or a multi-MB VPU sweep) in place of
the round-3 design's hundreds of fixed-cost iterations.

Scope: Log semiring, JointWeightFn, FullNGram(context_size=2),
FrameDependent / FrameLabelDependent, single batch dim, full custom-VJP
forward+backward with alpha0/beta0 chaining (time-sharded relay).
Measured via benchmarks/tpu_trigram_probe.py --ab (V=64 S=4161 B=8
T=200 h=512 k=2, v5e); the round-3 per-segment kernel measured 189 ms
(0.71x XLA's 134 ms) — see ops/README.md for the current numbers.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from last_torch_tpu.ops.fused_scan import NEG_INF
from last_torch_tpu.ops.fused_scan import _mxu_precision
from last_torch_tpu.ops.fused_scan import _pad_vocab
from last_torch_tpu.ops.fused_scan import _round_up

# Total VMEM estimate ceiling for the backward working set (v5e: 128 MB;
# the kernels request a 110 MB scoped limit).
_VMEM_BUDGET = 100 * 1024 * 1024

# Joint-tile budget for pass A / the gradient pass: the [B, TP*SEG, h]
# tanh tile (plus its same-sized d_joint/d_pre shadows in the backward).
_TILE_BUDGET = 12 * 1024 * 1024

# Escape hatch: route compiled backends back to the XLA scan path
# (interpret-mode tests are unaffected). The whole-array kernels beat
# XLA at the probe config, so the gate defaults ON.
DISABLE = False

# Batch the per-sweep (p <-> y) transposes and the backward beta gather
# into ONE 3-D batched dot_general over the batch axis instead of
# B_pad unrolled 2-D dots. Measured a WASH on v5e (same-process A/B,
# benchmarks/tpu_trigram_kernel_ab.py, 2026-08-19): batched 92.4 ms vs
# unbatched 91.8/91.8 ms fwd+bwd at the probe config — Mosaic lowers the
# [B, PP, SEG] batched contraction to the same per-slice matmuls, and
# the extra broadcast of the identity costs the difference. Kept as a
# flag (default OFF) so the A/B stays reproducible.
BATCHED_TRANSPOSE = False

# Backwards-compat alias for the round-3/4 gating flag: FORCE=True used
# to opt the (then slower-than-XLA) kernels in; the rewritten kernels
# are on by default, so the flag is now a no-op kept for the benchmark
# scripts that set it.
FORCE = True

# Fold the blank head into spare lex lanes. An MXU matmul with a 1-wide
# output ([rows, h] x [h, 1]) costs the SAME tile passes as a 128-wide
# one, so pass A's separate blank matvec doubles its MXU time whenever
# v_pad > vocab leaves dead lanes in the lex head. With the fold, the
# staged vocab_w/vocab_b carry blank_w/blank_b in column `vocab`: pass A
# runs ONE matmul and extracts blank with a lane-mask row-sum (masking
# that lane back to -inf for the E cache / rowmax), and the backward
# writes d_blank into column `vocab` of d_lex so the d_vw and d_joint
# matmuls absorb d_bw and the d_blank*bw term for free (d_bb rides the
# d_vb row; d_bw/d_bb are separated from the accumulators once, at the
# last grid step). Inactive automatically when vocab % 128 == 0 (no
# spare lane). Flag kept for A/Bs and for pinning the unfused path.
FOLD_BLANK = True


# Stream the forward's expansion alphas to the backward. The FLD
# backward re-derives sweep^1(alpha)..sweep^k(alpha) with k in-kernel
# sweeps per frame — quantities the forward already computed while
# building alpha'. With the flag on, the forward writes them to an
# extra [T, k*N, SEG] f32 output (~k*330 KB/frame HBM at the probe
# config — noise next to the compute) and the backward reads them
# instead of sweeping, deleting ALL backward sweeps (each one is a
# full-E 3-D broadcast reduce + transpose matmuls + exp/log chains).
# Bit-identical: the backward's sweeps ran on the same staged inputs.
STREAM_EXPANSIONS = True


def _stream_active(frame_dependent: bool, max_expansions: int) -> bool:
  return (STREAM_EXPANSIONS and not frame_dependent
          and max_expansions >= 1)


def _fold_blank_active(vocab: int, v_pad: int) -> bool:
  return FOLD_BLANK and v_pad > vocab


def _fold_blank_head(wf_params, vocab: int, v_pad: int):
  """Installs the blank head in spare lex column ``vocab`` (FOLD_BLANK)."""
  if not _fold_blank_active(vocab, v_pad):
    return wf_params
  return dict(
      wf_params,
      vocab_w=wf_params['vocab_w'].at[:, vocab].set(
          wf_params['blank_w']),
      vocab_b=wf_params['vocab_b'].at[vocab].set(wf_params['blank_b']))


def layout(vocab: int):
  """Segment-major trigram state layout.

  Returns (perm_rows, P, SEG): ``perm_rows`` is an int32 [P * SEG] array
  mapping layout row -> original FullNGram state id, or S (one past the
  end) for padding rows. State numbering (reference ``contexts.py``
  lexicographic ids): 0 = empty, 1..V = unigrams, 1 + V + (y1-1)*V +
  (y2-1) = bigram (y1, y2) with y2 the LAST symbol.
  """
  num_states = 1 + vocab + vocab * vocab
  p_segments = vocab + 1
  seg = _round_up(vocab + 1, 8)
  rows = np.full((p_segments, seg), num_states, np.int32)
  rows[0, 0] = 0
  for p in range(1, p_segments):
    rows[p, 0] = p  # unigram p: history (p), last symbol p
    for q in range(1, vocab + 1):
      rows[p, q] = 1 + vocab + (q - 1) * vocab + (p - 1)  # bigram (q, p)
  return rows.reshape(-1), p_segments, seg


def _tile_plan(pp: int, seg: int, hidden: int, b_pad: int,
               budget: int = _TILE_BUDGET) -> int:
  """Number of state tiles NT (dividing PP) for pass A / gradient pass."""
  for nt in (1, 2, 4, 8):
    if pp % nt == 0 and b_pad * (pp // nt) * seg * hidden * 4 <= budget:
      return nt
  for nt in range(8, pp + 1):
    if pp % nt == 0 and b_pad * (pp // nt) * seg * hidden * 4 <= budget:
      return nt
  return pp


def _vmem_estimate(b_pad, pp, seg, v_pad, hidden, num_pairs) -> int:
  n = b_pad * pp
  cache = n * seg * v_pad * 4
  dpc = pp * seg * hidden * 4
  tiles = 5 * b_pad * (pp // _tile_plan(pp, seg, hidden, b_pad)) * seg * (
      hidden * 4)
  rows_seg = (9 + num_pairs) * n * seg * 4
  rows_v = (3 + num_pairs) * n * v_pad * 4
  # Streamed expansion-history input block (STREAM_EXPANSIONS), double
  # buffered by the pipeline.
  expans = 2 * num_pairs * n * seg * 4
  return cache + dpc + tiles + rows_seg + rows_v + expans


def supported(lattice, semiring, blank_mask, lexical_mask, weight_lift,
              frames, backend: str, weight_fn=None) -> bool:
  """Structural gate for the trigram fused kernels (mirrors
  ``fused_scan.supported`` with context_size == 2)."""
  from last_torch_tpu import alignments as alignments_lib
  from last_torch_tpu import contexts as contexts_lib
  from last_torch_tpu import semirings as semirings_lib
  from last_torch_tpu import weight_fns as weight_fns_lib
  if backend not in ('tpu', 'axon', 'interpret'):
    return False
  if backend != 'interpret' and DISABLE:
    return False
  if semiring is not semirings_lib.Log:
    return False
  if blank_mask is not None or lexical_mask is not None:
    return False
  if weight_lift is not None:
    return False
  wf = weight_fn if weight_fn is not None else lattice.weight_fn
  if type(wf) is not weight_fns_lib.JointWeightFn:
    return False
  context = lattice.context
  if (type(context) is not contexts_lib.FullNGram or
      context.context_size != 2):
    return False
  alignment = lattice.alignment
  if not isinstance(alignment,
                    (alignments_lib.FrameDependent,
                     alignments_lib.FrameLabelDependent)):
    return False
  if frames.ndim != 3:
    return False
  vocab = context.vocab_size
  if backend != 'interpret' and vocab < 16:
    return False  # padding waste beats the XLA path at tiny vocabularies
  _, p_segments, seg = layout(vocab)
  pp = seg
  v_pad = _round_up(vocab, 128)
  batch = frames.shape[0]
  b_pad = _round_up(batch, 8)
  hidden = wf.hidden_size
  num_pairs = (1 if isinstance(alignment, alignments_lib.FrameDependent)
               else alignment.max_expansions)
  return _vmem_estimate(b_pad, pp, seg, v_pad, hidden,
                        num_pairs) <= _VMEM_BUDGET


def _iota2(shape, dim):
  return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _row_broadcast(col, b_pad, pp):
  """[B_pad, 1] per-batch column -> [B_pad * PP, 1] per-row column."""
  return jnp.broadcast_to(col[:, None, :], (b_pad, pp, 1)).reshape(
      b_pad * pp, 1)


def _make_pass_a(pc_ref, pf, vw, bw, vb_ref, bb_ref, lex_scr, m_scr,
                 blank_scr, *, b_pad, pp, seg, nt, compute_dtype,
                 cache_dtype, prec, vocab=None, v_pad=None,
                 fold_blank=False):
  """Pass A: per-state-tile joint + heads; caches E/rowmax/blank.

  The E cache is b-major: rows (b, p, s). Pass A computes tiles of
  layout rows across all batches and scatters per-batch chunks (8
  unrolled contiguous writes per tile). With ``fold_blank`` the staged
  ``vw``/``vb`` carry the blank head in lane ``vocab`` (see FOLD_BLANK):
  one matmul instead of two, blank extracted by a lane-mask row-sum and
  that lane masked back to -inf before the rowmax/E-cache epilogue.
  """
  f32 = jnp.float32
  tp = pp // nt
  tps = tp * seg
  pps = pp * seg

  def body(i, _):
    pc_t = pc_ref[pl.ds(i * tps, tps), :]       # [tps, h]
    joint = jnp.tanh(pc_t[None, :, :] + pf[:, None, :]).astype(
        compute_dtype)                          # [B_pad, tps, h]
    joint2 = joint.reshape(b_pad * tps, -1)
    lex = jax.lax.dot_general(
        joint2, vw, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    lex = lex + vb_ref[0][None, :]
    if fold_blank:
      lane = _iota2((b_pad * tps, v_pad), 1)
      is_blank = lane == vocab
      blank2 = jnp.sum(jnp.where(is_blank, lex, 0.0), axis=1,
                       keepdims=True)           # [B_pad*tps, 1]
      lex = jnp.where(is_blank, NEG_INF, lex)
      m2 = jnp.max(lex, axis=1, keepdims=True)  # [B_pad*tps, 1]
      e = jnp.exp(lex - m2).astype(cache_dtype)
    else:
      m2 = jnp.max(lex, axis=1, keepdims=True)  # [B_pad*tps, 1]
      e = jnp.exp(lex - m2).astype(cache_dtype)
      blank2 = jax.lax.dot_general(
          joint2, bw, (((1,), (0,)), ((), ())),
          preferred_element_type=f32, precision=prec)
      blank2 = blank2 + bb_ref[0, 0]            # [B_pad*tps, 1]
    for b in range(b_pad):
      lex_scr[pl.ds(b * pps + i * tps, tps), :] = e[b * tps:(b + 1) * tps]
      m_scr[pl.ds(b * pp + i * tp, tp), :] = (
          m2[b * tps:(b + 1) * tps].reshape(tp, seg))
      blank_scr[pl.ds(b * pp + i * tp, tp), :] = (
          blank2[b * tps:(b + 1) * tps].reshape(tp, seg))
    return 0

  return body


def _make_sweep(lex_scr, m_scr, u_scr, red_scr, new_scr, *, b_pad, pp,
                seg, p_segments, v_pad):
  """Within-frame lexical reduction + destination scatter.

  ``sweep(vec2)``: red[b, p, y] = logsumexp_{s in segment p}
  (vec[b, p, s] + lex[b, p, s, y]), scattered to the destination layout
  new[b, segment y, row p]. All rows with p >= P or s outside the
  segment's real rows stay semiring-zero because vec there is -inf.
  """
  f32 = jnp.float32
  n_rows = b_pad * pp
  ch = n_rows // 4
  eye = (_iota2((pp, seg), 0) == _iota2((pp, seg), 1)).astype(f32)
  pads_lo = 1
  pads_hi = pp - p_segments

  def sweep(vec2):
    shifted = vec2 + m_scr[...]
    c = jnp.max(shifted, axis=1, keepdims=True)
    c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
    u_scr[...] = jnp.exp(shifted - c_safe)

    def chunk(ci, _):
      uc = u_scr[pl.ds(ci * ch, ch), :]          # [ch, SEG]
      ec = lex_scr[pl.ds(ci * ch * seg, ch * seg), :].astype(f32).reshape(
          ch, seg, v_pad)
      red_scr[pl.ds(ci * ch, ch), :] = jnp.sum(uc[:, :, None] * ec, axis=1)
      return 0

    jax.lax.fori_loop(0, 4, chunk, 0)
    prod = red_scr[...]
    red = jnp.where(prod == 0, NEG_INF, c_safe + jnp.log(prod))
    redc = jnp.maximum(red, f32(-1e30))
    # (p <-> y) transpose on the MXU: contract the segment axis of red
    # with that of an identity (exact at HIGHEST; -inf rides as -1e30).
    if BATCHED_TRANSPOSE:
      red3 = redc.reshape(b_pad, pp, v_pad)
      eye3 = jnp.broadcast_to(eye[None], (b_pad, pp, seg))
      t3 = jax.lax.dot_general(
          red3, eye3, (((1,), (1,)), ((0,), (0,))),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)   # [B, V_pad, SEG]
      parts = [jnp.full((b_pad, pads_lo, seg), f32(-1e30)),
               t3[:, :p_segments - 1]]
      if pads_hi:
        parts.append(jnp.full((b_pad, pads_hi, seg), f32(-1e30)))
      new2 = jnp.concatenate(parts, axis=1).reshape(n_rows, seg)
      new_scr[...] = jnp.where(new2 <= f32(-1e29), NEG_INF, new2)
      return new_scr[...]
    for b in range(b_pad):
      red_b = redc[b * pp:(b + 1) * pp, :]       # [PP, V_pad]
      t_b = jax.lax.dot_general(
          red_b, eye, (((0,), (0,)), ((), ())),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)   # [V_pad, SEG]
      parts = [jnp.full((pads_lo, seg), f32(-1e30))]
      parts.append(t_b[:p_segments - 1])
      if pads_hi:
        parts.append(jnp.full((pads_hi, seg), f32(-1e30)))
      new_b = jnp.concatenate(parts, axis=0)     # [PP, SEG]
      new_scr[b * pp:(b + 1) * pp, :] = jnp.where(
          new_b <= f32(-1e29), NEG_INF, new_b)
    return new_scr[...]

  return sweep


def _trigram_forward_kernel(
    # Inputs.
    is_pad_ref,     # [1, B_pad, 1] int32 (1 where t >= num_frames[b])
    pf_ref,         # [1, B_pad, h] projected frame
    pc_ref,         # [PP * SEG, h] projected context, segment-major rows
    vw_ref,         # [h, V_pad]
    vb_ref,         # [1, V_pad]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    alpha0_ref,     # [N, SEG] b-major (N = B_pad * PP)
    # Outputs: hist_ref [1, N, SEG] (alpha before this frame),
    # alpha_out_ref [N, SEG], then with ``with_expansions`` an
    # expans_ref [1, k*N, SEG] (sweep^1..sweep^k of alpha, slab j =
    # sweep^{j+1}); then scratch: alpha_scr, m_scr, blank_scr, u_scr
    # [N, SEG], red_scr [N, V_pad], new_scr [N, SEG], lex_scr
    # [N*SEG, V_pad] E cache.
    hist_ref,
    alpha_out_ref,
    *rest,
    b_pad: int,
    seg: int,
    p_segments: int,
    pp: int,
    v_pad: int,
    nt: int,
    vocab: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
    fold_blank: bool,
    with_expansions: bool = False,
):
  if with_expansions:
    expans_ref = rest[0]
    rest_scr = rest[1:]
  else:
    expans_ref = None
    rest_scr = rest
  (alpha_scr, m_scr, blank_scr, u_scr, red_scr, new_scr,
   lex_scr) = rest_scr
  t = pl.program_id(0)
  prec = _mxu_precision(compute_dtype)
  n_rows = b_pad * pp

  @pl.when(t == 0)
  def _():
    alpha_scr[...] = alpha0_ref[...]

  hist_ref[0] = alpha_scr[...]
  pf = pf_ref[0]                                # [B_pad, h]
  vw = vw_ref[:].astype(compute_dtype)
  bw = bw_ref[:].astype(compute_dtype)

  pass_a = _make_pass_a(
      pc_ref, pf, vw, bw, vb_ref, bb_ref, lex_scr, m_scr, blank_scr,
      b_pad=b_pad, pp=pp, seg=seg, nt=nt, compute_dtype=compute_dtype,
      cache_dtype=cache_dtype, prec=prec, vocab=vocab, v_pad=v_pad,
      fold_blank=fold_blank)
  jax.lax.fori_loop(0, nt, pass_a, 0)

  sweep = _make_sweep(lex_scr, m_scr, u_scr, red_scr, new_scr,
                      b_pad=b_pad, pp=pp, seg=seg, p_segments=p_segments,
                      v_pad=v_pad)

  alpha = alpha_scr[...]
  blank = blank_scr[...]
  if frame_dependent:
    alpha_new = jnp.logaddexp(alpha + blank, sweep(alpha))
  else:
    acc = alpha + blank
    last = sweep(alpha)
    if expans_ref is not None:
      expans_ref[0, pl.ds(0, n_rows), :] = last
    for i in range(1, max_expansions + 1):
      acc = jnp.logaddexp(acc, last + blank)
      if i < max_expansions:
        last = sweep(last)
        if expans_ref is not None:
          expans_ref[0, pl.ds(i * n_rows, n_rows), :] = last
    alpha_new = acc

  ip = _row_broadcast(is_pad_ref[0], b_pad, pp)  # [N, 1] int32
  alpha_new = jnp.where(ip != 0, alpha, alpha_new)
  alpha_scr[...] = alpha_new
  alpha_out_ref[...] = alpha_new


def _stage_forward(wf_params, cache, frames, vocab):
  """Shared staging: padded heads, layout-permuted projected context.

  Returns (wf_params_padded, pf [T, B_pad, h], pc_l [PP*SEG, h],
  rows, P, SEG, PP, V_pad, b_pad).
  """
  batch, max_t, _ = frames.shape
  b_pad = _round_up(batch, 8)
  wf_params, v_pad = _pad_vocab(wf_params)
  rows, p_segments, seg = layout(vocab)
  pp = seg
  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  if b_pad != batch:
    pf = jnp.pad(pf, ((0, 0), (0, b_pad - batch), (0, 0)))
  pc = cache @ wf_params['context_proj']      # [S, h]
  pc_pad = jnp.concatenate([pc, jnp.zeros_like(pc[:1])], axis=0)
  pc_l = pc_pad[jnp.asarray(rows)]            # [P*SEG, h]
  if pp != p_segments:
    pc_l = jnp.pad(pc_l, ((0, (pp - p_segments) * seg), (0, 0)))
  return (wf_params, pf, pc_l, rows, p_segments, seg, pp, v_pad, b_pad)


def to_layout(x_std, rows, num_states, p_segments, seg, fill=NEG_INF):
  """[B, S] standard-state array -> [P, B, SEG] layout (padding=fill)."""
  b = x_std.shape[0]
  padded = jnp.concatenate(
      [x_std, jnp.full((b, 1), fill, x_std.dtype)], axis=1)
  x_l = padded[:, jnp.asarray(rows)]          # [B, P*SEG]
  return jnp.moveaxis(x_l.reshape(b, p_segments, seg), 1, 0)


def from_layout(x_l, rows, num_states):
  """[P, B, SEG] layout array -> [B, S] standard-state array."""
  p_segments, b, seg = x_l.shape
  flat = jnp.moveaxis(x_l, 0, 1).reshape(b, p_segments * seg)
  inv = np.full((num_states,), 0, np.int32)
  rows_np = np.asarray(rows)
  valid = rows_np < num_states
  inv[rows_np[valid]] = np.nonzero(valid)[0]
  return flat[:, jnp.asarray(inv)]


def _to_bmajor(x_l, pp):
  """[P, B, SEG] layout -> [B * PP, SEG] b-major kernel rows."""
  p, b, seg = x_l.shape
  xb = jnp.moveaxis(x_l, 0, 1)                # [B, P, SEG]
  if pp != p:
    xb = jnp.pad(xb, ((0, 0), (0, pp - p), (0, 0)),
                 constant_values=NEG_INF)
  return xb.reshape(b * pp, seg)


def _from_bmajor(x2, b, pp, p_segments):
  """[B * PP, SEG] b-major -> [P, B, SEG] layout."""
  x3 = x2.reshape(b, pp, -1)[:, :p_segments]
  return jnp.moveaxis(x3, 1, 0)


def fused_shortest_distance_fwd(wf_params: Any,
                                cache: jnp.ndarray,
                                frames: jnp.ndarray,
                                num_frames: jnp.ndarray,
                                *,
                                max_expansions: int,
                                frame_dependent: bool,
                                vocab: int,
                                compute_dtype=jnp.bfloat16,
                                cache_dtype=jnp.float32,
                                interpret: bool = False,
                                alpha0=None,
                                return_final_alpha: bool = False,
                                with_history: bool = True,
                                history_layout: str = 'standard',
                                with_expansions: bool = False):
  """Trigram fused forward scan.

  Mirrors ``fused_scan.fused_shortest_distance_fwd`` for
  FullNGram(context_size=2). ``alpha0`` (standard [B, S] state order)
  chains blocks, e.g. for the time-sharded relay.

  Returns (log_z [B], alpha_history, final_alpha [B, S] if requested,
  expansion_history if ``with_expansions``).
  ``alpha_history`` is [B, T, S] in standard state order when
  ``history_layout='standard'`` (one gather), or the raw b-major
  [T, B_pad * PP, SEG] kernel layout when 'layout' (the form
  ``run_fused_backward`` consumes), or None when ``with_history=False``.
  With ``with_expansions`` (FLD only, see STREAM_EXPANSIONS) the kernel
  additionally streams the k expansion alphas sweep^1..sweep^k per
  frame as a raw [T, k*N, SEG] f32 array, appended to the return tuple,
  for ``run_fused_backward(expansion_history=...)`` to consume.
  """
  if with_expansions and (frame_dependent or max_expansions < 1):
    raise ValueError('with_expansions requires FrameLabelDependent with '
                     'max_expansions >= 1')
  batch, max_t, _ = frames.shape
  num_states = 1 + vocab + vocab * vocab
  num_frames = jnp.asarray(num_frames, jnp.int32)
  (wf_params, pf, pc_l, rows, p_segments, seg, pp, v_pad,
   b_pad) = _stage_forward(wf_params, cache, frames, vocab)
  wf_params = _fold_blank_head(wf_params, vocab, v_pad)
  hidden = pc_l.shape[-1]
  n_rows = b_pad * pp
  # The forward's per-tile transients are ~half the backward's, so it
  # affords double the tile size (fewer fixed-cost tile iterations).
  nt = _tile_plan(pp, seg, hidden, b_pad, budget=2 * _TILE_BUDGET)

  is_pad = (jnp.arange(max_t)[:, None] >= num_frames[None, :]).astype(
      jnp.int32)
  if b_pad != batch:
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  is_pad = is_pad.reshape(max_t, b_pad, 1)

  if alpha0 is None:
    a0 = jnp.full((b_pad, pp, seg), NEG_INF, jnp.float32)
    a0 = a0.at[:, 0, 0].set(0.0)  # layout row (0, 0) = start state
    alpha0_b = a0.reshape(n_rows, seg)
  else:
    alpha0_p = jnp.pad(jnp.asarray(alpha0, jnp.float32),
                       ((0, b_pad - batch), (0, 0)),
                       constant_values=NEG_INF)
    alpha0_b = _to_bmajor(
        to_layout(alpha0_p, rows, num_states, p_segments, seg), pp)

  kernel = functools.partial(
      _trigram_forward_kernel,
      b_pad=b_pad,
      seg=seg,
      p_segments=p_segments,
      pp=pp,
      v_pad=v_pad,
      nt=nt,
      vocab=vocab,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype,
      fold_blank=_fold_blank_active(vocab, v_pad),
      with_expansions=with_expansions)

  out_specs = [
      pl.BlockSpec((1, n_rows, seg),
                   (lambda t: (t, 0, 0)) if with_history else
                   (lambda t: (0, 0, 0))),
      pl.BlockSpec((n_rows, seg), lambda t: (0, 0)),
  ]
  out_shape = [
      jax.ShapeDtypeStruct(
          (max_t if with_history else 1, n_rows, seg), jnp.float32),
      jax.ShapeDtypeStruct((n_rows, seg), jnp.float32),
  ]
  if with_expansions:
    k = max_expansions
    out_specs.append(pl.BlockSpec((1, k * n_rows, seg),
                                  lambda t: (t, 0, 0)))
    out_shape.append(
        jax.ShapeDtypeStruct((max_t, k * n_rows, seg), jnp.float32))

  outs = pl.pallas_call(
      kernel,
      grid=(max_t,),
      in_specs=[
          pl.BlockSpec((1, b_pad, 1), lambda t: (t, 0, 0)),
          pl.BlockSpec((1, b_pad, hidden), lambda t: (t, 0, 0)),
          pl.BlockSpec((pp * seg, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((hidden, 1), lambda t: (0, 0)),
          pl.BlockSpec((1, 1), lambda t: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((n_rows, seg), lambda t: (0, 0)),
      ],
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=[
          pltpu.VMEM((n_rows, seg), jnp.float32),
          pltpu.VMEM((n_rows, seg), jnp.float32),
          pltpu.VMEM((n_rows, seg), jnp.float32),
          pltpu.VMEM((n_rows, seg), jnp.float32),
          pltpu.VMEM((n_rows, v_pad), jnp.float32),
          pltpu.VMEM((n_rows, seg), jnp.float32),
          pltpu.VMEM((n_rows * seg, v_pad), cache_dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(is_pad, pf, pc_l, wf_params['vocab_w'],
    wf_params['vocab_b'][None, :], wf_params['blank_w'][:, None],
    wf_params['blank_b'][None, None], alpha0_b)
  if with_expansions:
    hist, alpha_t, expans = outs
  else:
    hist, alpha_t = outs
    expans = None

  final_std = from_layout(
      _from_bmajor(alpha_t, b_pad, pp, p_segments), rows,
      num_states)[:batch]
  log_z = jax.scipy.special.logsumexp(final_std, axis=-1)
  if not with_history:
    alpha_history = None
  elif history_layout == 'layout':
    alpha_history = hist
  else:
    # [T, B_pad*PP, SEG] -> [B, T, S] standard order.
    flat = hist.reshape(max_t, b_pad, pp, seg)[:, :batch, :p_segments]
    flat = flat.reshape(max_t, batch, p_segments * seg)
    inv = np.full((num_states,), 0, np.int32)
    rows_np = np.asarray(rows)
    valid = rows_np < num_states
    inv[rows_np[valid]] = np.nonzero(valid)[0]
    alpha_history = jnp.moveaxis(flat[..., jnp.asarray(inv)], 0, 1)
  ret = [log_z, alpha_history]
  if return_final_alpha:
    ret.append(final_std)
  if with_expansions:
    ret.append(expans)
  return tuple(ret)


def _trigram_backward_kernel(
    # Inputs (time-reversed index maps: grid step t handles frame T-1-t).
    is_pad_ref,     # [1, B_pad, 1] int32
    logz_ref,       # [B_pad, 1] f32
    g_ref,          # [B_pad, 1] f32 cotangent of log_z
    pf_ref,         # [1, B_pad, h]
    pc_ref,         # [PP * SEG, h]
    vw_ref,         # [h, V_pad]
    vb_ref,         # [1, V_pad]
    bw_ref,         # [h, 1]
    bwt_ref,        # [1, h]
    bb_ref,         # [1, 1] SMEM
    hist_ref,       # [1, N, SEG] alpha before this frame (b-major)
    # Then: with ``with_expansions`` an expans_ref input
    # [1, k*N, SEG] (the forward's streamed sweep^1..sweep^k, slab j =
    # sweep^{j+1}); beta0_ref [N, SEG] (beta seed at the last frame).
    # Outputs: dpf_ref [1, B_pad, h], dpc_ref [PP*SEG, h], dvw_ref
    # [h, V_pad], dvb_ref [1, V_pad], dbw_ref [1, h], dbb_ref [1, 1]
    # SMEM, beta_out_ref [N, SEG].
    # Scratch: beta_scr, m_scr, blank_scr, u_scr [N, SEG]; red_scr
    # [N, V_pad]; new_scr [N, SEG]; bt_scr [N, V_pad]; w_scr,
    # dblank_scr [N, SEG]; lex_scr [N*SEG, V_pad] E cache; dlex_scr
    # [B_pad*TP*SEG, V_pad]; dbt_scr [B_pad*TP, SEG]; dpc_scr
    # [PP*SEG, h]; dvw_scr [h, V_pad]; dvb_scr [1, V_pad]; dbw_scr
    # [1, h]; dbb_scr [1, 1] SMEM; then num_pairs x [N, SEG] ws and
    # num_pairs x [N, V_pad] wy (cotangent-folded).
    *rest,
    b_pad: int,
    seg: int,
    p_segments: int,
    pp: int,
    v_pad: int,
    nt: int,
    vocab: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
    fold_blank: bool,
    with_expansions: bool = False,
):
  """Reverse (beta) scan for the trigram lattice.

  Per frame: rebuild E (pass A), replay the expansion alphas (read from
  the forward's streamed expansion history, or re-derived with sweeps
  when it is absent — see STREAM_EXPANSIONS), walk the beta/nb chain in
  reverse (beta-transpose + one 3-D multiply-reduce per step), fold the
  cotangent into per-pair (ws, wy) factors, then one pass over NT state
  tiles forms the arc marginals as ``E * ws[:, :, None] * wy[:, None,
  :]`` and accumulates every head/tanh gradient in VMEM across the
  whole T grid.
  """
  if with_expansions:
    expans_ref = rest[0]
    rest2 = rest[1:]
  else:
    expans_ref = None
    rest2 = rest
  (beta0_ref, dpf_ref, dpc_ref, dvw_ref, dvb_ref, dbw_ref, dbb_ref,
   beta_out_ref, beta_scr, m_scr, blank_scr, u_scr, red_scr, new_scr,
   bt_scr, w_scr, dblank_scr, lex_scr, dlex_scr, dbt_scr, dpc_scr,
   dvw_scr, dvb_scr, dbw_scr, dbb_scr, *pair_scr) = rest2
  t = pl.program_id(0)
  f32 = jnp.float32
  big_neg = f32(-1e30)
  prec = _mxu_precision(compute_dtype)
  num_pairs = 1 if frame_dependent else max_expansions
  wsp = pair_scr[:num_pairs]
  wyp = pair_scr[num_pairs:]
  n_rows = b_pad * pp
  ch = n_rows // 4
  tp = pp // nt
  tps = tp * seg
  pps = pp * seg

  @pl.when(t == 0)
  def _():
    beta_scr[...] = beta0_ref[...]
    dpc_scr[...] = jnp.zeros(dpc_scr.shape, f32)
    dvw_scr[...] = jnp.zeros(dvw_scr.shape, f32)
    dvb_scr[...] = jnp.zeros(dvb_scr.shape, f32)
    dbw_scr[...] = jnp.zeros(dbw_scr.shape, f32)
    dbb_scr[0, 0] = 0.0

  pf = pf_ref[0]                                # [B_pad, h]
  vw_c = vw_ref[:].astype(compute_dtype)
  bw_c = bw_ref[:].astype(compute_dtype)

  # Row/validity masks. Real rows: s == 0 for segment 0, s < P for
  # segments 1..P-1; fake segments (p >= P) are never valid. Blank at
  # invalid rows must be semiring-dead or the beta recursion grows them
  # without bound.
  p_row = jax.lax.broadcasted_iota(
      jnp.int32, (b_pad, pp, 1), 1).reshape(n_rows, 1)
  col2 = _iota2((n_rows, seg), 1)
  valid = ((col2 < jnp.where(p_row == 0, 1, p_segments)) &
           (p_row < p_segments))
  ip = _row_broadcast(is_pad_ref[0], b_pad, pp)  # [N, 1] int32
  pad2 = ip != 0
  lz2 = _row_broadcast(logz_ref[...], b_pad, pp)
  g2 = _row_broadcast(g_ref[...], b_pad, pp)
  g2e = jnp.where(pad2, 0.0, g2)

  pass_a = _make_pass_a(
      pc_ref, pf, vw_c, bw_c, vb_ref, bb_ref, lex_scr, m_scr, blank_scr,
      b_pad=b_pad, pp=pp, seg=seg, nt=nt, compute_dtype=compute_dtype,
      cache_dtype=cache_dtype, prec=prec, vocab=vocab, v_pad=v_pad,
      fold_blank=fold_blank)
  jax.lax.fori_loop(0, nt, pass_a, 0)
  blank = jnp.where(valid, blank_scr[...], NEG_INF)

  sweep = _make_sweep(lex_scr, m_scr, u_scr, red_scr, new_scr,
                      b_pad=b_pad, pp=pp, seg=seg, p_segments=p_segments,
                      v_pad=v_pad)

  # Beta-transpose: bt[b, p, y] = nb[b, segment y+1, row p], realized as
  # one shift-matrix contraction per batch row (contract axis 0 with
  # axis 0). Lanes y >= vocab are forced to -inf (their E columns are 0
  # anyway; the mask keeps the max-shift clean).
  sh = (_iota2((pp, v_pad), 0) == _iota2((pp, v_pad), 1) + 1).astype(f32)
  lane2 = _iota2((pp, v_pad), 1)
  lane_n = _iota2((n_rows, v_pad), 1)

  def bt_into(nb2):
    nbc = jnp.maximum(nb2, big_neg)
    if BATCHED_TRANSPOSE:
      nb3 = nbc.reshape(b_pad, pp, seg)
      sh3 = jnp.broadcast_to(sh[None], (b_pad, pp, v_pad))
      o3 = jax.lax.dot_general(
          nb3, sh3, (((1,), (1,)), ((0,), (0,))),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)  # [B, SEG(=PP), V_pad]
      o2 = o3.reshape(n_rows, v_pad)
      o2 = jnp.where(o2 <= f32(-1e29), NEG_INF, o2)
      bt_scr[...] = jnp.where(lane_n < vocab, o2, NEG_INF)
      return
    for b in range(b_pad):
      nb_b = nbc[b * pp:(b + 1) * pp, :]        # [PP, SEG]
      o = jax.lax.dot_general(
          nb_b, sh, (((0,), (0,)), ((), ())),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)  # [SEG(=PP), V_pad]
      o = jnp.where(o <= f32(-1e29), NEG_INF, o)
      bt_scr[b * pp:(b + 1) * pp, :] = jnp.where(lane2 < vocab, o, NEG_INF)

  def lse_from_bt():
    """out[b, p, s] = logsumexp_y(lex[b, p, s, y] + bt[b, p, y])."""
    bt = bt_scr[...]
    d = jnp.max(bt, axis=1, keepdims=True)
    d_safe = jnp.where(jnp.isfinite(d), d, 0.0)
    red_scr[...] = jnp.exp(bt - d_safe)

    def chunk(ci, _):
      vc = red_scr[pl.ds(ci * ch, ch), :]        # [ch, V_pad]
      ec = lex_scr[pl.ds(ci * ch * seg, ch * seg), :].astype(f32).reshape(
          ch, seg, v_pad)
      w_scr[pl.ds(ci * ch, ch), :] = jnp.sum(vc[:, None, :] * ec, axis=2)
      return 0

    jax.lax.fori_loop(0, 4, chunk, 0)
    w2 = w_scr[...]
    return jnp.where(w2 == 0, NEG_INF, m_scr[...] + d_safe + jnp.log(w2))

  alpha = hist_ref[0]                           # [N, SEG]
  beta = beta_scr[...]

  def fold_pair(i, a_j, nb_i):
    """Cotangent-folded marginal factors for pair (alpha_j, nb_i).

    Stores ws = exp(a_j + m - amax) and wy = g * exp(bt + amax - lz);
    leaves bt_scr holding bt(nb_i) for the chain step that follows.
    """
    shifted = a_j + m_scr[...]
    amax = jnp.max(shifted, axis=1, keepdims=True)
    amax = jnp.where(jnp.isfinite(amax), amax, 0.0)
    wsp[i][...] = jnp.exp(shifted - amax)
    bt_into(nb_i)
    wyp[i][...] = (
        jnp.exp(jnp.minimum(bt_scr[...] + amax - lz2, 80.0)) * g2e)

  if frame_dependent:
    bm_total = jnp.exp(alpha + blank + beta - lz2)
    fold_pair(0, alpha, beta)
    final_nb = jnp.logaddexp(blank + beta, lse_from_bt())
  else:
    k = max_expansions
    if expans_ref is not None:
      # The forward streamed sweep^1..sweep^k (slab j = sweep^{j+1});
      # no in-kernel sweeps needed.
      a_list = [alpha] + [
          expans_ref[0, pl.ds(j * n_rows, n_rows), :] for j in range(k)]
    else:
      a_list = [alpha]
      for _ in range(k - 1):
        a_list.append(sweep(a_list[-1]))
      if k >= 1:
        a_list.append(sweep(a_list[-1]))
    bm_total = jnp.zeros((n_rows, seg), f32)
    for j in range(k + 1):
      bm_total = bm_total + jnp.exp(a_list[j] + blank + beta - lz2)
    nb = blank + beta
    for i in range(k):
      fold_pair(i, a_list[k - 1 - i], nb)
      nb = jnp.logaddexp(blank + beta, lse_from_bt())
    final_nb = nb

  dblank_scr[...] = g2e * bm_total              # [N, SEG]

  # Gradient pass over NT state tiles: marginals from the folded (ws,
  # wy) factors; head and tanh gradients accumulate in VMEM scratch.
  lane3_t = jax.lax.broadcasted_iota(jnp.int32, (tp, seg, v_pad), 2)

  def grad_tile(i, dpf_acc):
    pc_t = pc_ref[pl.ds(i * tps, tps), :]
    joint3 = jnp.tanh(pc_t[None, :, :] + pf[:, None, :])  # [B, tps, h] f32
    joint2c = joint3.astype(compute_dtype).reshape(b_pad * tps, -1)
    for b in range(b_pad):
      e_b = lex_scr[pl.ds(b * pps + i * tps, tps), :].astype(f32).reshape(
          tp, seg, v_pad)
      acc = jnp.zeros((tp, seg, v_pad), f32)
      for j in range(num_pairs):
        ws_b = wsp[j][pl.ds(b * pp + i * tp, tp), :]   # [tp, SEG]
        wy_b = wyp[j][pl.ds(b * pp + i * tp, tp), :]   # [tp, V_pad]
        acc = acc + ws_b[:, :, None] * wy_b[:, None, :]
      d3 = e_b * acc                                   # [tp, SEG, V_pad]
      if fold_blank:
        # d_blank rides lane `vocab` of d_lex (the E column there is 0,
        # so the marginal part of that lane is 0): the d_vw and d_joint
        # matmuls below then absorb d_bw and the d_blank*bw term. Built
        # in 3-D + sublane-merge reshape — a direct [tp, SEG]->[tps, 1]
        # reshape of dblank is a lane merge Mosaic rejects
        # (vector<9x72> -> vector<648x1> "tpu.reshape" error on v5e).
        dbl = dblank_scr[pl.ds(b * pp + i * tp, tp), :]  # [tp, SEG]
        d3 = d3 + jnp.where(lane3_t == vocab, dbl[:, :, None], 0.0)
      d_lex_b = d3.reshape(tps, v_pad)
      if not fold_blank:
        dbt_scr[b * tp:(b + 1) * tp, :] = dblank_scr[
            pl.ds(b * pp + i * tp, tp), :]
      dlex_scr[b * tps:(b + 1) * tps, :] = d_lex_b
    d_lex = dlex_scr[...]
    d_lex_c = d_lex.astype(compute_dtype)
    dvw_scr[...] += jax.lax.dot_general(
        joint2c, d_lex_c, (((0,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)    # [h, V_pad]
    dvb_scr[...] += jnp.sum(d_lex, axis=0, keepdims=True)
    d_joint = jax.lax.dot_general(
        d_lex_c, vw_c, (((1,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec)    # [B*tps, h]
    if not fold_blank:
      dbl2 = dbt_scr[...]                              # [B*tp, SEG]
      dbl3 = dbl2[:, :, None]                          # [B*tp, SEG, 1]
      joint3b = joint3.reshape(b_pad * tp, seg, -1)
      dbw_scr[...] += jnp.sum(joint3b * dbl3, axis=(0, 1),
                              keepdims=True)[0]
      dbb_scr[0, 0] += jnp.sum(dbl2)
      d_joint = d_joint + (dbl3 * bwt_ref[:][None, :, :]).reshape(
          b_pad * tps, -1)
    jr = joint3.reshape(b_pad * tps, -1)
    d_pre = d_joint * (1.0 - jr * jr)
    d_pre3 = d_pre.reshape(b_pad, tps, -1)
    dpc_scr[pl.ds(i * tps, tps), :] += jnp.sum(d_pre3, axis=0)
    return dpf_acc + jnp.sum(d_pre3, axis=1)           # [B_pad, h]

  dpf_acc = jax.lax.fori_loop(
      0, nt, grad_tile, jnp.zeros((b_pad, pf.shape[-1]), f32))

  dpf_ref[0] = dpf_acc
  nb_eff = jnp.where(pad2, beta, final_nb)
  beta_scr[...] = nb_eff
  beta_out_ref[...] = jnp.where(valid, nb_eff, NEG_INF)

  @pl.when(t == pl.num_programs(0) - 1)
  def _():
    dpc_ref[...] = dpc_scr[...]
    dvw_ref[...] = dvw_scr[...]
    dvb_ref[...] = dvb_scr[...]
    if fold_blank:
      # d_bw/d_bb accumulated in lane `vocab` of the d_vw/d_vb
      # accumulators; separate them once. The host trims dvw/dvb to the
      # true vocab, so the folded lane never leaks.
      onehot = (_iota2((1, v_pad), 1) == vocab).astype(f32)
      dbw_ref[...] = jax.lax.dot_general(
          onehot, dvw_scr[...], (((1,), (1,)), ((), ())),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)         # [1, h]
      dbb_ref[0, 0] = jnp.sum(dvb_scr[...] * onehot)
    else:
      dbw_ref[...] = dbw_scr[...]
      dbb_ref[0, 0] = dbb_scr[0, 0]


def run_fused_backward(wf_params: Any,
                       cache: jnp.ndarray,
                       frames: jnp.ndarray,
                       num_frames: jnp.ndarray,
                       log_z: jnp.ndarray,
                       g: jnp.ndarray,
                       alpha_history_layout: jnp.ndarray,
                       *,
                       max_expansions: int,
                       frame_dependent: bool,
                       vocab: int,
                       compute_dtype=jnp.bfloat16,
                       cache_dtype=jnp.float32,
                       interpret: bool = False,
                       beta0=None,
                       expansion_history=None):
  """Trigram fused backward over one frame block.

  Mirrors ``fused_scan.run_fused_backward``; ``alpha_history_layout`` is
  the b-major [T, B_pad * PP, SEG] history from
  ``fused_shortest_distance_fwd(..., history_layout='layout')``.
  ``expansion_history`` is the forward's streamed [T, k*N, SEG]
  expansion alphas (``with_expansions=True``); when provided (FLD
  only), the kernel reads sweep^1..sweep^k per frame instead of
  re-deriving them with k in-kernel sweeps. Bit-identical gradients.

  Returns (d_wf_params, d_cache, d_frames, beta_out [B, S] standard).
  """
  if expansion_history is not None and (frame_dependent
                                        or max_expansions < 1):
    raise ValueError('expansion_history requires FrameLabelDependent '
                     'with max_expansions >= 1')
  batch, max_t, _ = frames.shape
  num_states = 1 + vocab + vocab * vocab
  num_frames = jnp.asarray(num_frames, jnp.int32)
  true_vocab = vocab
  (wf_params_p, pf, pc_l, rows, p_segments, seg, pp, v_pad,
   b_pad) = _stage_forward(wf_params, cache, frames, vocab)
  wf_params_p = _fold_blank_head(wf_params_p, vocab, v_pad)
  hidden = pc_l.shape[-1]
  n_rows = b_pad * pp
  nt = _tile_plan(pp, seg, hidden, b_pad)
  tp = pp // nt
  num_pairs = 1 if frame_dependent else max_expansions

  is_pad = (jnp.arange(max_t)[:, None] >= num_frames[None, :]).astype(
      jnp.int32)
  if b_pad != batch:
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  is_pad = is_pad.reshape(max_t, b_pad, 1)
  logz_b = jnp.pad(log_z, (0, b_pad - batch))[:, None]
  g_b = jnp.pad(jnp.asarray(g, jnp.float32), (0, b_pad - batch))[:, None]
  if beta0 is None:
    beta0_b = jnp.zeros((n_rows, seg), jnp.float32)
  else:
    beta0_p = jnp.pad(jnp.asarray(beta0, jnp.float32),
                      ((0, b_pad - batch), (0, 0)),
                      constant_values=NEG_INF)
    beta0_b = _to_bmajor(
        to_layout(beta0_p, rows, num_states, p_segments, seg), pp)

  kernel = functools.partial(
      _trigram_backward_kernel,
      b_pad=b_pad,
      seg=seg,
      p_segments=p_segments,
      pp=pp,
      v_pad=v_pad,
      nt=nt,
      vocab=vocab,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype,
      fold_blank=_fold_blank_active(vocab, v_pad),
      with_expansions=expansion_history is not None)

  rev = lambda t: max_t - 1 - t
  row_scr = pltpu.VMEM((n_rows, seg), jnp.float32)
  vrow_scr = pltpu.VMEM((n_rows, v_pad), jnp.float32)
  in_specs = [
      pl.BlockSpec((1, b_pad, 1), lambda t: (rev(t), 0, 0)),
      pl.BlockSpec((b_pad, 1), lambda t: (0, 0)),
      pl.BlockSpec((b_pad, 1), lambda t: (0, 0)),
      pl.BlockSpec((1, b_pad, hidden), lambda t: (rev(t), 0, 0)),
      pl.BlockSpec((pp * seg, hidden), lambda t: (0, 0)),
      pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
      pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
      pl.BlockSpec((hidden, 1), lambda t: (0, 0)),
      pl.BlockSpec((1, hidden), lambda t: (0, 0)),
      pl.BlockSpec((1, 1), lambda t: (0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((1, n_rows, seg), lambda t: (rev(t), 0, 0)),
  ]
  inputs = [is_pad, logz_b, g_b, pf, pc_l, wf_params_p['vocab_w'],
            wf_params_p['vocab_b'][None, :],
            wf_params_p['blank_w'][:, None],
            wf_params_p['blank_w'][None, :],
            wf_params_p['blank_b'][None, None],
            alpha_history_layout]
  if expansion_history is not None:
    k = max_expansions
    in_specs.append(pl.BlockSpec((1, k * n_rows, seg),
                                 lambda t: (rev(t), 0, 0)))
    inputs.append(expansion_history)
  in_specs.append(pl.BlockSpec((n_rows, seg), lambda t: (0, 0)))
  inputs.append(beta0_b)
  (dpf, dpc_l, dvw, dvb, dbw, dbb, beta_out_b) = pl.pallas_call(
      kernel,
      grid=(max_t,),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, b_pad, hidden), lambda t: (rev(t), 0, 0)),
          pl.BlockSpec((pp * seg, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, hidden), lambda t: (0, 0)),
          pl.BlockSpec((1, 1), lambda t: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((n_rows, seg), lambda t: (0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((max_t, b_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct((pp * seg, hidden), jnp.float32),
          jax.ShapeDtypeStruct((hidden, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, hidden), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((n_rows, seg), jnp.float32),
      ],
      scratch_shapes=(
          [row_scr, row_scr, row_scr, row_scr,
           vrow_scr, row_scr, vrow_scr, row_scr, row_scr,
           pltpu.VMEM((n_rows * seg, v_pad), cache_dtype),
           pltpu.VMEM((b_pad * tp * seg, v_pad), jnp.float32),
           pltpu.VMEM((b_pad * tp, seg), jnp.float32),
           pltpu.VMEM((pp * seg, hidden), jnp.float32),
           pltpu.VMEM((hidden, v_pad), jnp.float32),
           pltpu.VMEM((1, v_pad), jnp.float32),
           pltpu.VMEM((1, hidden), jnp.float32),
           pltpu.SMEM((1, 1), jnp.float32)] +
          [row_scr for _ in range(num_pairs)] +
          [vrow_scr for _ in range(num_pairs)]),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)

  # Un-permute the context-projection gradient back to state order; the
  # padding rows' contributions are structurally zero (alpha and the
  # masked blank keep them semiring-dead).
  rows_np = np.asarray(rows)
  valid = rows_np < num_states
  inv = np.zeros((num_states,), np.int32)
  inv[rows_np[valid]] = np.nonzero(valid)[0]
  dpc = dpc_l[jnp.asarray(inv)]               # [S, h]
  dpf = dpf[:, :batch]                        # [T, B, h]
  d_wf = {
      'frame_proj': jnp.einsum('btf,tbh->fh', frames, dpf,
                               preferred_element_type=jnp.float32),
      'context_proj': cache.T @ dpc,
      'vocab_w': dvw[:, :true_vocab],
      'vocab_b': dvb[0, :true_vocab],
      'blank_w': dbw[0],
      'blank_b': dbb[0, 0],
  }
  d_cache = dpc @ wf_params['context_proj'].T
  d_frames = jnp.einsum('tbh,fh->btf', dpf, wf_params['frame_proj'],
                        preferred_element_type=jnp.float32)
  beta_out = from_layout(
      _from_bmajor(beta_out_b, b_pad, pp, p_segments), rows,
      num_states)[:batch]
  return d_wf, d_cache, d_frames, beta_out


def log_partition(wf_params: Any,
                  cache: jnp.ndarray,
                  frames: jnp.ndarray,
                  num_frames: jnp.ndarray,
                  *,
                  max_expansions: int,
                  frame_dependent: bool,
                  vocab: int,
                  compute_dtype=jnp.bfloat16,
                  cache_dtype=jnp.float32,
                  interpret: bool = False):
  """Differentiable trigram log-partition via the fused kernel pair.

  The trigram analogue of ``fused_scan.log_partition``: forward = the
  segment-major fused scan (alpha in VMEM); backward = the fused beta
  scan forming cotangent-scaled arc marginals on-chip. Gradients flow to
  wf_params, cache and frames.
  """
  num_frames = jnp.asarray(num_frames, jnp.int32)
  stream = _stream_active(frame_dependent, max_expansions)

  def run_forward(wf_params, cache, frames, num_frames):
    outs = fused_shortest_distance_fwd(
        wf_params, cache, frames, num_frames,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        vocab=vocab,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        interpret=interpret,
        history_layout='layout',
        with_expansions=stream)
    if stream:
      log_z, hist, expans = outs
    else:
      (log_z, hist), expans = outs, None
    return log_z, hist, expans

  @jax.custom_vjp
  def fn(wf_params, cache, frames, num_frames):
    log_z, _, _ = run_forward(wf_params, cache, frames, num_frames)
    return log_z

  def fn_fwd(wf_params, cache, frames, num_frames):
    log_z, hist, expans = run_forward(wf_params, cache, frames,
                                      num_frames)
    return log_z, (wf_params, cache, frames, num_frames, log_z, hist,
                   expans)

  def fn_bwd(residuals, g):
    (wf_params, cache, frames, num_frames, log_z, hist,
     expans) = residuals
    d_wf, d_cache, d_frames, _ = run_fused_backward(
        wf_params, cache, frames, num_frames, log_z, g, hist,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        vocab=vocab,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        interpret=interpret,
        expansion_history=expans)
    return (d_wf, d_cache, d_frames,
            np.zeros(num_frames.shape, jax.dtypes.float0))

  fn.defvjp(fn_fwd, fn_bwd)
  return fn(wf_params, cache, frames, num_frames)
