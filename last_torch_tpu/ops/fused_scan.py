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

"""Fused Pallas (Mosaic) TPU kernel for the GNAT lattice forward scan.

The hot loop of the recognition lattice (SURVEY §3, "hot-loop summary") is a
per-frame recursion

  joint    = tanh(pc + pf[t])                  # [B, S, h]
  blank    = joint @ blank_w + blank_b         # [B, S]
  lexical  = joint @ vocab_w + vocab_b         # [B, S, V]
  alpha'   = alignment_step(alpha, blank, lexical)

where the XLA path writes the O(B*S*V) lexical tensor to HBM every frame and
reads it back for the semiring reduction (~134 MB/frame at the headline
config). This kernel keeps the time scan entirely on-chip:

* grid = (T, B-tiles), iterated sequentially on the TPU core; the alpha
  carry lives in a VMEM scratch buffer across grid steps;
* per frame, an inner loop over S-tiles computes the joint/heads on the MXU
  (bfloat16 inputs, float32 accumulation) and folds the lexical block
  directly into an online (flash-style) logsumexp over source states —
  the lexical weights never touch HBM;
* the bigram (FullNGram context_size=1) forward reduction
  ``alpha'[1+y] = logsumexp_s(alpha[s] + lexical[s, y])`` is exactly this
  online reduction; FrameLabelDependent runs k such passes per frame
  (one per expansion), matching ``alignments.FrameLabelDependent.forward``.

Scope: Log semiring, JointWeightFn (globally normalized), FullNGram with
context_size == 1, FrameDependent / FrameLabelDependent, single batch dim.
Everything else falls back to the XLA path in ``lattices._forward``.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float('-inf')

# Mosaic lane width; vocab heads are padded to a multiple of this.
_LANES = 128

# Stream the forward's expansion alphas to the backward (the bigram
# analogue of trigram_scan.STREAM_EXPANSIONS). The FrameLabelDependent
# backward replays expand(sweep_reduce(..)) k times per frame to
# re-derive the expansion alphas the forward already computed while
# building alpha'; with the flag on, the forward writes them to k extra
# [T, B_pad, S_pad] f32 outputs and the backward reads them instead.
# Bit-identical (same ops on the same staged inputs, rebuilt E included).
# Applies to the 'cache' (VMEM-resident E) kernels only — the online
# kernels keep their in-kernel replay.
STREAM_EXPANSIONS = True


# Expansion streaming for the MARGINALS reverse pass: measured a ~1%
# LOSS at headline shapes (v5e, 2026-08-19: streamed 1031.1/1031.0 ms
# vs in-kernel replay 1021.4 ms, same process, identical checksums) —
# the marginals kernel has no grad matmuls, so it is HBM/VPU-bound and
# the extra [T, k, B, S_pad] forward writes + reverse reads cost more
# than the k replay sweeps they replace. Default OFF; the plumbing and
# this flag stay so the A/B (/tests) remain re-runnable.
STREAM_MARGINALS = False


def _stream_active(frame_dependent: bool, max_expansions: int,
                   mode: str) -> bool:
  return (STREAM_EXPANSIONS and not frame_dependent
          and max_expansions >= 1 and mode == 'cache')


def _round_up(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def _mxu_precision(compute_dtype):
  """In-kernel dot precision, pinned per compute_dtype.

  Without an explicit precision, in-kernel ``dot_general``s inherit the
  ambient ``jax_default_matmul_precision`` — and a global 'highest'
  (which the f32 parity tooling legitimately sets) lowers bfloat16
  operands to an fp32-contract ``tpu.matmul`` Mosaic rejects ("Bad lhs
  type", found on hardware by benchmarks/tpu_tp_kernel_check.py).
  Pinning makes kernel lowering a pure function of ``compute_dtype``:
  bfloat16 operands use DEFAULT (the MXU's native mode), float32
  operands use HIGHEST (exact — what the f32 spot-checks measure).
  The always-f32 exp-space matvecs keep the ambient default, as before.
  """
  return (jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32
          else jax.lax.Precision.DEFAULT)



@functools.lru_cache(maxsize=None)
def _cached_partial(fn, *args, **kwargs):
  """functools.partial with a stable identity per (fn, statics).

  pallas_call re-traces its kernel every time it sees a new function
  object; a fresh partial per call defeats that cache on every outer
  retrace (all partial args here are hashable statics).
  """
  return functools.partial(fn, *args, **kwargs)


def _fused_forward_kernel(
    # Inputs.
    is_pad_ref,     # [1, 1, 1, Bt] int32 (1 where t >= num_frames[b])
    pf_ref,         # [1, Bt, h] projected frame for this (t, b-tile)
    pc_ref,         # [S_pad, h] projected context table (whole)
    vw_ref,         # [h, V] vocab head
    vb_ref,         # [1, V] vocab bias
    bw_ref,         # [h, 1] blank head
    bb_ref,         # [1, 1] blank bias
    alpha0_ref,     # [Bt, S_pad] initial alpha for this b-tile
    # Outputs: hist_ref [1, Bt, S_pad] (alpha before this frame),
    # alpha_out_ref [Bt, S_pad] (final alpha), then with
    # ``with_expansions`` k expans refs [1, Bt, S_pad] (the streamed
    # expansion alphas, ref j-1 = expand(sweep_reduce)^j of alpha — see
    # STREAM_EXPANSIONS). Scratch: alpha_scr [B, S_pad] (carry across
    # the time grid), blank_scr [Bt, S_pad], exp_scr [Bt*S_pad, V]
    # (cached exp(lex - rowmax), 2-D layout).
    hist_ref,
    alpha_out_ref,
    *rest,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
    with_expansions: bool = False,
):
  # The expensive joint/vocab-head matmul runs ONCE per frame; its result is
  # cached on-chip as E = exp(lex - rowmax) and every within-frame semiring
  # reduction (k of them for FrameLabelDependent) becomes a tiny batched
  # matvec against E. See _fused_backward_kernel for the Mosaic layout
  # constraints this code works around.
  if with_expansions:
    expans_refs = rest[:max_expansions]
    alpha_scr, blank_scr, exp_scr = rest[max_expansions:]
  else:
    expans_refs = ()
    alpha_scr, blank_scr, exp_scr = rest
  t = pl.program_id(0)
  b = pl.program_id(1)
  b_start = b * batch_tile
  vocab = vw_ref.shape[-1]

  @pl.when(t == 0)
  def _():
    alpha_scr[pl.ds(b_start, batch_tile), :] = alpha0_ref[:]

  alpha = alpha_scr[pl.ds(b_start, batch_tile), :]  # [Bt, S_pad]
  hist_ref[0] = alpha
  pf = pf_ref[0]  # [Bt, h]
  vw = vw_ref[:].astype(compute_dtype)
  bw = bw_ref[:].astype(compute_dtype)

  # Pass A: one joint + heads computation per frame; cache E and blank.
  n = batch_tile * s_tile
  m_tiles = []
  for i in range(num_s_tiles):
    pc_t = pc_ref[i * s_tile:(i + 1) * s_tile, :]
    joint = jnp.tanh(pc_t[None, :, :] + pf[:, None, :])
    joint2d = joint.astype(compute_dtype).reshape(n, -1)
    lex = jax.lax.dot_general(
        joint2d, vw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    lex = lex + vb_ref[0][None, :]
    m2d = jnp.max(lex, axis=1, keepdims=True)
    exp_scr[i * n:(i + 1) * n, :] = jnp.exp(lex - m2d).astype(cache_dtype)
    m_tiles.append(m2d.reshape(batch_tile, s_tile))
    blank = jax.lax.dot_general(
        joint2d, bw, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    blank_scr[:, i * s_tile:(i + 1) * s_tile] = blank.reshape(
        batch_tile, s_tile) + bb_ref[0, 0]
  blank = blank_scr[:, :]
  m_rows = jnp.concatenate(m_tiles, axis=-1)  # [Bt, S_pad]

  def read_exp(i):
    return exp_scr[i * n:(i + 1) * n, :].astype(jnp.float32).reshape(
        batch_tile, s_tile, vocab)

  def sweep_reduce(vec):
    """red[b, y] = logsumexp_s(vec[b, s] + lex[b, s, y]), via E matvecs."""
    shifted = vec + m_rows
    c = jnp.max(shifted, axis=1, keepdims=True)
    c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
    u = jnp.exp(shifted - c_safe)
    acc = jnp.zeros((batch_tile, 1, vocab), jnp.float32)
    for i in range(num_s_tiles):
      u_t = jax.lax.slice_in_dim(u, i * s_tile, (i + 1) * s_tile, axis=1)
      acc = acc + jax.lax.dot_general(
          u_t[:, None, :], read_exp(i), (((2,), (1,)), ((0,), (0,))),
          preferred_element_type=jnp.float32)
    total = acc[:, 0, :]
    return jnp.where(total == 0, NEG_INF, c_safe + jnp.log(total))

  def expand(red):
    """[Bt, V] lexical-destination weights -> [Bt, S_pad] state vector.

    Bigram state layout: state 0 (empty history) has no incoming lexical
    arc; states 1..V are the unigram destinations; padded states stay
    semiring-zero.
    """
    s_pad = alpha.shape[-1]
    pad = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF, jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad], axis=1)

  if frame_dependent:
    # alpha' = (alpha + blank) logaddexp expand(reduce(alpha)).
    alpha_new = jnp.logaddexp(alpha + blank, expand(sweep_reduce(alpha)))
  else:
    # FrameLabelDependent: up to k lexical expansions then a blank.
    acc = alpha + blank
    last = expand(sweep_reduce(alpha))
    if expans_refs:
      expans_refs[0][0] = last
    for i in range(1, max_expansions + 1):
      acc = jnp.logaddexp(acc, last + blank)
      if i < max_expansions:
        last = expand(sweep_reduce(last))
        if expans_refs:
          expans_refs[i][0] = last
    alpha_new = acc

  is_pad = is_pad_ref[0, 0, 0, :][:, None] != 0
  alpha_new = jnp.where(is_pad, alpha, alpha_new)
  alpha_scr[pl.ds(b_start, batch_tile), :] = alpha_new
  alpha_out_ref[:] = alpha_new


def _fused_backward_kernel(
    # Inputs (time-reversed index maps: grid step t handles frame T-1-t).
    is_pad_ref,     # [1, 1, Bt, 1] int32
    logz_ref,       # [1, Bt, 1] f32
    g_ref,          # [1, Bt, 1] f32 cotangent of log_z
    pf_ref,         # [1, 1, Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [h, V]
    vb_ref,         # [1, V]
    bw_ref,         # [h, 1]
    bwt_ref,        # [1, h] (blank head, transposed copy)
    bb_ref,         # [1, 1] SMEM
    hist_ref,       # [1, 1, Bt, S_pad] alpha before this frame
    # Then: with ``with_expansions``, k expans refs [1, 1, Bt, S_pad]
    # (the forward's streamed expansion alphas, ref j-1 =
    # expand(sweep_reduce)^j of alpha — see STREAM_EXPANSIONS);
    # beta0_ref [1, Bt, S_pad] (beta seed at the last frame).
    # Outputs: dpf_ref [1, 1, Bt, h], dpc_ref [S_pad, h], dvw_ref
    # [h, V], dvb_ref [1, V], dbw_ref [1, h], dbb_ref [1, 1] SMEM,
    # beta_out_ref [1, Bt, S_pad] (beta after the first frame).
    # Scratch: beta_scr [num_b_tiles, Bt, S_pad] f32 carry, blank_scr
    # [Bt, S_pad] f32, lex_scr [Bt*S_pad, V] (cached lexical weights,
    # 2-D layout), dpc_scr [S_pad, h], dvw_scr [h, V], dvb_scr [1, V],
    # dbw_scr [1, h], dbb_scr [1, 1] SMEM.
    *rest,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
    num_real_states: int,
    with_expansions: bool = False,
):
  # Mosaic constraints shape this kernel (found empirically; this jax
  # version):
  # - values read from 3-D scratch cannot feed axis-1 reductions (invalid
  #   relayout) -> the lexical cache is stored 2-D [Bt*S_pad, V] and
  #   reshaped after reading, mirroring the layout of a dot output;
  # - combined slice+newaxis indexing (x[:, a:b, None]) lowers to an
  #   unsupported gather -> lax.slice_in_dim then [:, :, None];
  # - merging 3-D values to 2-D ([Bt, St, V] -> [Bt*St, V]) is an
  #   unsupported shape cast -> head gradients use batched 3-D dot_general
  #   plus an outer-axis sum;
  # - lane slices must start at multiples of 128 -> state->label shifts use
  #   pltpu.roll;
  # - [Bt, V] partial reduces of 3-D values relayout-fail when chained ->
  #   single multi-axis keepdims reductions.
  #
  # Numerics: the cache stores E = exp(lex - rowmax(lex)) once per frame;
  # every within-frame logsumexp then becomes a tiny batched matvec against
  # E on the MXU, and the arc marginals become rank-1-scaled elementwise
  # products of E - no transcendentals ever touch the O(Bt*S*V) tensor
  # after pass A. Shifts keep every factor within float32 range (each
  # factor <= exp(max|lex|), products <= 1).
  if with_expansions:
    expans_refs = rest[:max_expansions]
    rest2 = rest[max_expansions:]
  else:
    expans_refs = ()
    rest2 = rest
  (beta0_ref, dpf_ref, dpc_ref, dvw_ref, dvb_ref, dbw_ref, dbb_ref,
   beta_out_ref, beta_scr, blank_scr, lex_scr, dpc_scr, dvw_scr,
   dvb_scr, dbw_scr, dbb_scr) = rest2
  t = pl.program_id(0)
  b = pl.program_id(1)
  vocab = vw_ref.shape[-1]
  s_pad = blank_scr.shape[-1]

  @pl.when(t == 0)
  def _():
    # Seed beta at the (time-reversed) first step: semiring-ones for a
    # whole sequence, or the relayed carry from the right-neighbor block
    # under time sharding (parallel.sequence).
    beta_scr[b] = beta0_ref[0]

  @pl.when((t == 0) & (b == 0))
  def _():
    dpc_scr[:] = jnp.zeros(dpc_scr.shape, jnp.float32)
    dvw_scr[:] = jnp.zeros(dvw_scr.shape, jnp.float32)
    dvb_scr[:] = jnp.zeros(dvb_scr.shape, jnp.float32)
    dbw_scr[:] = jnp.zeros(dbw_scr.shape, jnp.float32)
    dbb_scr[0, 0] = 0.0

  alpha = hist_ref[0, 0]                    # [Bt, S_pad]
  beta = beta_scr[b]                        # [Bt, S_pad]
  pf = pf_ref[0, 0]                         # [Bt, h]
  log_z = logz_ref[0]                       # [Bt, 1]
  pad = is_pad_ref[0, 0] != 0               # [Bt, 1]
  g_eff = jnp.where(pad, 0.0, g_ref[0])     # [Bt, 1]
  vw_c = vw_ref[:].astype(compute_dtype)
  bw_c = bw_ref[:].astype(compute_dtype)

  def tile_joint(i):
    pc_t = pc_ref[i * s_tile:(i + 1) * s_tile, :]
    return jnp.tanh(pc_t[None, :, :] + pf[:, None, :])  # [Bt, St, h] f32

  def to_lex_space(x):
    """x[:, 1:1+vocab] via a lane-aligned rotate."""
    return pltpu.roll(x, shift=x.shape[1] - 1, axis=1)[:, :vocab]

  # Pass A: recompute the frame's weights; cache E = exp(lex - M) on-chip.
  n = batch_tile * s_tile
  m_tiles = []
  for i in range(num_s_tiles):
    joint2d = tile_joint(i).astype(compute_dtype).reshape(n, -1)
    lex = jax.lax.dot_general(
        joint2d, vw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    lex = lex + vb_ref[0][None, :]
    m2d = jnp.max(lex, axis=1, keepdims=True)          # [n, 1]
    lex_scr[i * n:(i + 1) * n, :] = jnp.exp(lex - m2d).astype(cache_dtype)
    m_tiles.append(m2d.reshape(batch_tile, s_tile))
    blank = jax.lax.dot_general(
        joint2d, bw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    blank_scr[:, i * s_tile:(i + 1) * s_tile] = blank.reshape(
        batch_tile, s_tile) + bb_ref[0, 0]
  blank = blank_scr[:, :]
  # Padded states (beyond the real state count) must be semiring-dead:
  # their zero-padded pc rows give FINITE blank weights, and the beta
  # recursion nb = blank + beta would otherwise grow them without bound
  # over long sequences, blowing up the max-shifts of the padded-label
  # columns that to_lex_space now exposes (0 * inf = NaN marginals).
  col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
  blank = jnp.where(col < num_real_states, blank, NEG_INF)
  m_rows = jnp.concatenate(m_tiles, axis=-1)           # [Bt, S_pad]

  def read_exp(i):
    return lex_scr[i * n:(i + 1) * n, :].astype(jnp.float32).reshape(
        batch_tile, s_tile, vocab)

  batched_dims_sv = (((2,), (1,)), ((0,), (0,)))       # [Bt,1,S]x[Bt,S,V]
  batched_dims_vs = (((2,), (2,)), ((0,), (0,)))       # [Bt,1,V]x[Bt,S,V]

  def sweep_reduce(vec):
    """red[b, y] = logsumexp_s(vec[b, s] + lex[b, s, y]), via E matvecs."""
    shifted = vec + m_rows
    c = jnp.max(shifted, axis=1, keepdims=True)        # [Bt, 1]
    c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
    u = jnp.exp(shifted - c_safe)                      # [Bt, S_pad]
    acc = jnp.zeros((batch_tile, 1, vocab), jnp.float32)
    for i in range(num_s_tiles):
      u_t = jax.lax.slice_in_dim(u, i * s_tile, (i + 1) * s_tile, axis=1)
      acc = acc + jax.lax.dot_general(
          u_t[:, None, :], read_exp(i), batched_dims_sv,
          preferred_element_type=jnp.float32)
    total = acc[:, 0, :]
    return jnp.where(total == 0, NEG_INF, c_safe + jnp.log(total))

  def sweep_lse_y(nb_lex):
    """out[b, s] = logsumexp_y(lex[b, s, y] + nb_lex[b, y]), via E."""
    d = jnp.max(nb_lex, axis=1, keepdims=True)         # [Bt, 1]
    d_safe = jnp.where(jnp.isfinite(d), d, 0.0)
    v = jnp.exp(nb_lex - d_safe)[:, None, :]           # [Bt, 1, V]
    parts = []
    for i in range(num_s_tiles):
      w = jax.lax.dot_general(
          v, read_exp(i), batched_dims_vs,
          preferred_element_type=jnp.float32)[:, 0, :]  # [Bt, St]
      m_t = jax.lax.slice_in_dim(m_rows, i * s_tile, (i + 1) * s_tile,
                                 axis=1)
      parts.append(
          jnp.where(w == 0, NEG_INF, m_t + d_safe + jnp.log(w)))
    return jnp.concatenate(parts, axis=-1)  # [Bt, S_pad]

  def expand(red):
    pad_cols = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF,
                        jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  if frame_dependent:
    # alignments.FrameDependent.backward: marginals and next beta.
    a_list = [alpha]
    nbs = [(0, beta)]
    bm_total = jnp.exp(alpha + blank + beta - log_z)
    final_nb = jnp.logaddexp(blank + beta, sweep_lse_y(to_lex_space(beta)))
  else:
    # alignments.FrameLabelDependent.backward.
    k = max_expansions
    if expans_refs:
      # The forward streamed expand(sweep_reduce)^1..k of alpha; no
      # in-kernel replay sweeps needed (see STREAM_EXPANSIONS).
      a_list = [alpha] + [expans_refs[j][0, 0] for j in range(k)]
    else:
      a_list = [alpha]
      for _ in range(k):
        a_list.append(expand(sweep_reduce(a_list[-1])))
    bm_total = jnp.zeros_like(alpha)
    for j in range(k + 1):
      bm_total = bm_total + jnp.exp(a_list[j] + blank + beta - log_z)
    nbs = []
    nb = blank + beta
    for i in range(k):
      j = k - 1 - i
      nbs.append((j, nb))
      nb = jnp.logaddexp(blank + beta, sweep_lse_y(to_lex_space(nb)))
    final_nb = nb

  d_blank_all = g_eff * bm_total            # [Bt, S_pad]

  # Per-(j) rank-1 factors of the lexical marginals:
  # lm_j = E * exp(a_j + M - A_j)[:, :, None] *
  #        exp(nb_j + A_j - log_z)[:, None, :].
  # Each factor of the true marginal exp(a_j + lex + nb_j - log_z) <= 1 is
  # individually bounded only by the within-row lexical spread; the wy
  # exponent is clipped so it can never overflow float32 (where the clip
  # bites, the matching E*ws factor has already underflowed to 0, so the
  # product is 0 either way instead of 0 * inf = NaN).
  factors = []
  for (j, nb_j) in nbs:
    shifted = a_list[j] + m_rows
    a_max = jnp.max(shifted, axis=1, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    ws = jnp.exp(shifted - a_max)                      # [Bt, S_pad]
    wy = jnp.exp(jnp.minimum(to_lex_space(nb_j) + a_max - log_z, 80.0))
    factors.append((ws, wy))

  # Pass B: per-tile marginal accumulation and head/tanh backward.
  dpf_acc = jnp.zeros((batch_tile, pf.shape[-1]), jnp.float32)
  for i in range(num_s_tiles):
    exp_t = read_exp(i)                     # [Bt, St, V]
    lm = jnp.zeros_like(exp_t)
    for (ws, wy) in factors:
      ws_t = jax.lax.slice_in_dim(ws, i * s_tile, (i + 1) * s_tile, axis=1)
      lm = lm + exp_t * ws_t[:, :, None] * wy[:, None, :]
    d_lex3 = (g_eff[:, :, None] * lm).astype(compute_dtype)
    d_blank3 = jax.lax.slice_in_dim(d_blank_all, i * s_tile,
                                    (i + 1) * s_tile, axis=1)[:, :, None]
    joint = tile_joint(i)
    joint3_c = joint.astype(compute_dtype)
    dvw_scr[:, :] += jnp.sum(
        jax.lax.dot_general(
            joint3_c, d_lex3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype)), axis=0)
    dvb_scr[:, :] += jnp.sum(
        d_lex3.astype(jnp.float32), axis=(0, 1), keepdims=True)[0]
    dbw_scr[:, :] += jnp.sum(
        joint * d_blank3, axis=(0, 1), keepdims=True)[0]
    dbb_scr[0, 0] += jnp.sum(d_blank3)
    d_joint3 = jax.lax.dot_general(
        d_lex3, vw_c, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    d_joint3 = d_joint3 + d_blank3 * bwt_ref[:][None, :, :]
    d_pre = d_joint3 * (1.0 - joint * joint)
    dpf_acc = dpf_acc + jnp.sum(d_pre, axis=1)
    dpc_scr[i * s_tile:(i + 1) * s_tile, :] += jnp.sum(d_pre, axis=0)

  dpf_ref[0, 0] = dpf_acc
  nb_eff = jnp.where(pad, beta, final_nb)
  beta_scr[b] = nb_eff
  # beta after the block's first frame; its out-spec ignores t, so the
  # last grid step's write (frame 0) wins. Padded states are masked
  # semiring-dead so a relayed seed never carries their junk across
  # blocks (they contribute nothing either way — see the blank guard).
  beta_out_ref[0] = jnp.where(col < num_real_states, nb_eff, NEG_INF)

  @pl.when((t == pl.num_programs(0) - 1) & (b == pl.num_programs(1) - 1))
  def _():
    dpc_ref[:] = dpc_scr[:]
    dvw_ref[:] = dvw_scr[:]
    dvb_ref[:] = dvb_scr[:]
    dbw_ref[:] = dbw_scr[:]
    dbb_ref[0, 0] = dbb_scr[0, 0]


def _fused_marginals_kernel(
    # Inputs (time-reversed index maps, as in _fused_backward_kernel).
    is_pad_ref,     # [1, 1, Bt, 1] int32
    logz_ref,       # [1, Bt, 1] f32
    pf_ref,         # [1, 1, Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [h, V]
    vb_ref,         # [1, V]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    hist_ref,       # [1, 1, Bt, S_pad]
    # Then: with ``with_expansions``, k expans refs [1, 1, Bt, S_pad]
    # (the forward's streamed expansion alphas — see STREAM_EXPANSIONS).
    # Outputs: bm_ref [1, 1, Bt, S_pad] (blank posteriors for this
    # frame), lex_ref [1, 1, Bt, V] (label posteriors, state-summed).
    # Scratch: beta_scr [num_b_tiles, Bt, S_pad] f32, blank_scr
    # [Bt, S_pad] f32, lex_scr [Bt*S_pad, V] exp cache (2-D layout).
    *rest,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
    num_real_states: int,
    with_expansions: bool = False,
):
  """Reverse scan emitting per-frame arc posteriors instead of gradients.

  Identical recurrence to ``_fused_backward_kernel`` (alpha replay, beta
  chain, rank-1-factored marginals over the exp cache) but with an
  identity cotangent and no head/tanh backward: the per-frame outputs are
  the blank-arc posterior per context state and the lexical posterior per
  label SUMMED over source context states — the production confidence
  quantities. The full dense [T, S, V] lexical posterior is deliberately
  not emitted: at production shapes it does not fit in HBM (headline
  config: 32*1600*1025*1024 floats = 215 GB); the state-summed posterior
  is the per-tile matvec ``ws_j @ E`` the backward already computes.
  """
  if with_expansions:
    expans_refs = rest[:max_expansions]
    rest2 = rest[max_expansions:]
  else:
    expans_refs = ()
    rest2 = rest
  (bm_ref, lex_ref, beta_scr, blank_scr, lex_scr) = rest2
  t = pl.program_id(0)
  b = pl.program_id(1)
  vocab = vw_ref.shape[-1]
  s_pad = blank_scr.shape[-1]

  @pl.when(t == 0)
  def _():
    beta_scr[b] = jnp.zeros((batch_tile, s_pad), jnp.float32)

  alpha = hist_ref[0, 0]                    # [Bt, S_pad]
  beta = beta_scr[b]                        # [Bt, S_pad]
  pf = pf_ref[0, 0]                         # [Bt, h]
  log_z = logz_ref[0]                       # [Bt, 1]
  pad = is_pad_ref[0, 0] != 0               # [Bt, 1]
  vw_c = vw_ref[:].astype(compute_dtype)
  bw_c = bw_ref[:].astype(compute_dtype)

  def tile_joint(i):
    pc_t = pc_ref[i * s_tile:(i + 1) * s_tile, :]
    return jnp.tanh(pc_t[None, :, :] + pf[:, None, :])

  def to_lex_space(x):
    return pltpu.roll(x, shift=x.shape[1] - 1, axis=1)[:, :vocab]

  # Pass A: recompute the frame's weights; cache E = exp(lex - M).
  n = batch_tile * s_tile
  m_tiles = []
  for i in range(num_s_tiles):
    joint2d = tile_joint(i).astype(compute_dtype).reshape(n, -1)
    lex = jax.lax.dot_general(
        joint2d, vw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    lex = lex + vb_ref[0][None, :]
    m2d = jnp.max(lex, axis=1, keepdims=True)
    lex_scr[i * n:(i + 1) * n, :] = jnp.exp(lex - m2d).astype(cache_dtype)
    m_tiles.append(m2d.reshape(batch_tile, s_tile))
    blank = jax.lax.dot_general(
        joint2d, bw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    blank_scr[:, i * s_tile:(i + 1) * s_tile] = blank.reshape(
        batch_tile, s_tile) + bb_ref[0, 0]
  blank = blank_scr[:, :]
  col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
  blank = jnp.where(col < num_real_states, blank, NEG_INF)
  m_rows = jnp.concatenate(m_tiles, axis=-1)

  def read_exp(i):
    return lex_scr[i * n:(i + 1) * n, :].astype(jnp.float32).reshape(
        batch_tile, s_tile, vocab)

  batched_dims_sv = (((2,), (1,)), ((0,), (0,)))
  batched_dims_vs = (((2,), (2,)), ((0,), (0,)))

  def sweep_reduce(vec):
    shifted = vec + m_rows
    c = jnp.max(shifted, axis=1, keepdims=True)
    c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
    u = jnp.exp(shifted - c_safe)
    acc = jnp.zeros((batch_tile, 1, vocab), jnp.float32)
    for i in range(num_s_tiles):
      u_t = jax.lax.slice_in_dim(u, i * s_tile, (i + 1) * s_tile, axis=1)
      acc = acc + jax.lax.dot_general(
          u_t[:, None, :], read_exp(i), batched_dims_sv,
          preferred_element_type=jnp.float32)
    total = acc[:, 0, :]
    return jnp.where(total == 0, NEG_INF, c_safe + jnp.log(total))

  def sweep_lse_y(nb_lex):
    d = jnp.max(nb_lex, axis=1, keepdims=True)
    d_safe = jnp.where(jnp.isfinite(d), d, 0.0)
    v = jnp.exp(nb_lex - d_safe)[:, None, :]
    parts = []
    for i in range(num_s_tiles):
      w = jax.lax.dot_general(
          v, read_exp(i), batched_dims_vs,
          preferred_element_type=jnp.float32)[:, 0, :]
      m_t = jax.lax.slice_in_dim(m_rows, i * s_tile, (i + 1) * s_tile,
                                 axis=1)
      parts.append(
          jnp.where(w == 0, NEG_INF, m_t + d_safe + jnp.log(w)))
    return jnp.concatenate(parts, axis=-1)

  def expand(red):
    pad_cols = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF,
                        jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  if frame_dependent:
    a_list = [alpha]
    nbs = [(0, beta)]
    bm_total = jnp.exp(alpha + blank + beta - log_z)
    final_nb = jnp.logaddexp(blank + beta, sweep_lse_y(to_lex_space(beta)))
  else:
    k = max_expansions
    if expans_refs:
      # The forward streamed expand(sweep_reduce)^1..k of alpha; no
      # in-kernel replay sweeps needed (see STREAM_EXPANSIONS).
      a_list = [alpha] + [expans_refs[j][0, 0] for j in range(k)]
    else:
      a_list = [alpha]
      for _ in range(k):
        a_list.append(expand(sweep_reduce(a_list[-1])))
    bm_total = jnp.zeros_like(alpha)
    for j in range(k + 1):
      bm_total = bm_total + jnp.exp(a_list[j] + blank + beta - log_z)
    nbs = []
    nb = blank + beta
    for i in range(k):
      j = k - 1 - i
      nbs.append((j, nb))
      nb = jnp.logaddexp(blank + beta, sweep_lse_y(to_lex_space(nb)))
    final_nb = nb

  # Label posteriors: per factor j the state-sum of the rank-1-scaled
  # marginal tile is a single matvec, sum_s ws_j[s] * E[s, y], times wy_j.
  lex_total = jnp.zeros((batch_tile, vocab), jnp.float32)
  for (j, nb_j) in nbs:
    shifted = a_list[j] + m_rows
    a_max = jnp.max(shifted, axis=1, keepdims=True)
    a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
    ws = jnp.exp(shifted - a_max)
    wy = jnp.exp(jnp.minimum(to_lex_space(nb_j) + a_max - log_z, 80.0))
    acc = jnp.zeros((batch_tile, 1, vocab), jnp.float32)
    for i in range(num_s_tiles):
      ws_t = jax.lax.slice_in_dim(ws, i * s_tile, (i + 1) * s_tile, axis=1)
      acc = acc + jax.lax.dot_general(
          ws_t[:, None, :], read_exp(i), batched_dims_sv,
          preferred_element_type=jnp.float32)
    lex_total = lex_total + acc[:, 0, :] * wy

  bm_ref[0, 0] = jnp.where(pad, 0.0, bm_total)
  lex_ref[0, 0] = jnp.where(pad, 0.0, lex_total)
  beta_scr[b] = jnp.where(pad, beta, final_nb)


def _online_forward_kernel(
    # Inputs.
    is_pad_ref,     # [1, 1, 1, Bt] int32
    pf_ref,         # [1, Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [NV, h, Vt] vocab head, vocab-tile-major layout
    vb_ref,         # [NV, 1, Vt]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    alpha0_ref,     # [Bt, S_pad]
    # Outputs.
    hist_ref,       # [1, Bt, S_pad]
    alpha_out_ref,  # [Bt, S_pad]
    # Scratch.
    alpha_scr,      # [B_pad, S_pad]
    vec_scr,        # [NS, Bt, s_tile] reduce-input tiles
    blank_scr,      # [NS, Bt, s_tile]
    m_scr,          # [NV, Bt, Vt] running max of the online reduction
    acc_scr,        # [NV, Bt, Vt] running scaled sum
    *,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    v_tile: int,
    num_v_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
):
  """Large-vocabulary fused forward scan: vocab-tiled, no on-chip cache.

  When the exp-space lexical cache of ``_fused_forward_kernel`` cannot fit
  VMEM (bigram vocabularies beyond ~1500), each within-frame semiring
  reduction instead streams (state-tile, vocab-tile) lexical blocks
  straight off the MXU and folds them into flash-style online logsumexp
  accumulators — running max ``m`` and scaled sum per destination label.
  VMEM stays O(B*S + (S+V)*h) regardless of V; the cost is one full
  joint/vocab-head matmul pass per within-frame reduction (k passes per
  frame for FrameLabelDependent(k)) instead of one per frame.

  The (state-tile x vocab-tile) sweeps are ``lax.fori_loop``s, NOT
  unrolled Python loops: Mosaic's register allocator assigns every
  unrolled iteration's large temporaries their own scoped-VMEM spill
  slots with no reuse (measured: 152-229 MB of spill slots at V=2048 —
  compile-time VMEM OOM), while a dynamic loop body compiles once. All
  tile-indexed memory therefore sits on the LEADING axis of a ref — the
  vocab head arrives as [NV, h, Vt], accumulators live in [NV, Bt, Vt]
  scratch, and [Bt, S_pad] vectors are scattered into [NS, Bt, s_tile]
  scratch by small unrolled copies (lane-dim dynamic slicing is not a
  thing Mosaic can do).
  """
  t = pl.program_id(0)
  b = pl.program_id(1)
  b_start = b * batch_tile

  @pl.when(t == 0)
  def _():
    alpha_scr[pl.ds(b_start, batch_tile), :] = alpha0_ref[:]

  alpha = alpha_scr[pl.ds(b_start, batch_tile), :]  # [Bt, S_pad]
  hist_ref[0] = alpha
  pf = pf_ref[0]  # [Bt, h]
  bw = bw_ref[:].astype(compute_dtype)

  def online_reduce(vec, want_blank):
    """red[b, y] = logsumexp_s(vec[b, s] + lex[b, s, y]), streamed.

    fori_loops state tiles outer (one joint recompute each), vocab tiles
    inner; the per-label running (max, scaled-sum) accumulators live in
    VMEM scratch. Optionally also produces the frame's blank weights
    (first pass only).
    """
    for i in range(num_s_tiles):  # scatter: small static lane slices
      vec_scr[i] = jax.lax.slice_in_dim(vec, i * s_tile, (i + 1) * s_tile,
                                        axis=1)
    for v in range(num_v_tiles):
      m_scr[v] = jnp.full((batch_tile, v_tile), NEG_INF, jnp.float32)
      acc_scr[v] = jnp.zeros((batch_tile, v_tile), jnp.float32)

    def s_body(i, _):
      pc_t = pc_ref[pl.ds(i * s_tile, s_tile), :]
      joint2d = jnp.tanh(pc_t[None, :, :] + pf[:, None, :]).astype(
          compute_dtype).reshape(batch_tile * s_tile, -1)
      if want_blank:
        blank2d = jax.lax.dot_general(
            joint2d, bw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype))
        blank_scr[i] = blank2d.reshape(batch_tile, s_tile) + bb_ref[0, 0]
      vec_t = vec_scr[i]

      def v_body(v, _):
        vw_t = vw_ref[v].astype(compute_dtype)
        lex2d = jax.lax.dot_general(
            joint2d, vw_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_mxu_precision(compute_dtype))
        lex = (lex2d + vb_ref[v]).reshape(batch_tile, s_tile, v_tile)
        chunk = vec_t[:, :, None] + lex
        cm = jnp.max(chunk, axis=1)                 # [Bt, v_tile]
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
    red_tiles = []
    for v in range(num_v_tiles):  # assemble: small static reads
      m_v = m_scr[v]
      acc_v = acc_scr[v]
      red_tiles.append(
          jnp.where(acc_v == 0, NEG_INF,
                    jnp.where(jnp.isfinite(m_v), m_v, 0.0) +
                    jnp.log(acc_v)))
    red = jnp.concatenate(red_tiles, axis=1)        # [Bt, V]
    blank = None
    if want_blank:
      blank = jnp.concatenate([blank_scr[i] for i in range(num_s_tiles)],
                              axis=1)
    return red, blank

  def expand(red):
    s_pad = alpha.shape[-1]
    vocab = red.shape[-1]
    pad_cols = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF,
                        jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  if frame_dependent:
    red, blank = online_reduce(alpha, True)
    alpha_new = jnp.logaddexp(alpha + blank, expand(red))
  else:
    red, blank = online_reduce(alpha, True)
    acc = alpha + blank
    last = expand(red)
    for i in range(1, max_expansions + 1):
      acc = jnp.logaddexp(acc, last + blank)
      if i < max_expansions:
        red, _ = online_reduce(last, False)
        last = expand(red)
    alpha_new = acc

  is_pad = is_pad_ref[0, 0, 0, :][:, None] != 0
  alpha_new = jnp.where(is_pad, alpha, alpha_new)
  alpha_scr[pl.ds(b_start, batch_tile), :] = alpha_new
  alpha_out_ref[:] = alpha_new


def _online_backward_kernel(
    # Inputs (time-reversed index maps).
    is_pad_ref,     # [1, 1, Bt, 1] int32
    logz_ref,       # [1, Bt, 1] f32
    g_ref,          # [1, Bt, 1] f32
    pf_ref,         # [1, 1, Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [NV, h, Vt] vocab head, vocab-tile-major layout
    vb_ref,         # [NV, 1, Vt]
    bw_ref,         # [h, 1]
    bwt_ref,        # [1, h]
    bb_ref,         # [1, 1] SMEM
    hist_ref,       # [1, 1, Bt, S_pad]
    beta0_ref,      # [1, Bt, S_pad] beta seed at the last frame
    # Outputs.
    dpf_ref,        # [1, 1, Bt, h]
    dpc_ref,        # [S_pad, h]
    dvw_ref,        # [NV, h, Vt]
    dvb_ref,        # [NV, 1, Vt]
    dbw_ref,        # [1, h]
    dbb_ref,        # [1, 1] SMEM
    beta_out_ref,   # [1, Bt, S_pad] beta after the first frame
    # Scratch; then P pair a-tiles [NS, Bt, s_tile] and P pair nb-tiles
    # [NV, Bt, Vt] (P = 1 for FrameDependent, else max_expansions).
    beta_scr,       # [num_b_tiles, Bt, S_pad] f32
    vec_scr,        # [NS, Bt, s_tile] f32 reduce-input / d_blank tiles
    blank_scr,      # [NS, Bt, s_tile] f32
    m_scr,          # [NV, Bt, Vt] f32 online-reduce running max
    acc_scr,        # [NV, Bt, Vt] f32 online-reduce running sum
    nbv_scr,        # [NV, Bt, Vt] f32 lse_y input tiles
    nb_scr,         # [NS, Bt, s_tile] f32 lse_y output tiles
    djoint_scr,     # [Bt * s_tile, h] f32 per-s-tile d(joint) accumulator
    dpc_scr,        # [S_pad, h] f32
    dvw_scr,        # [NV, h, Vt] f32
    dvb_scr,        # [NV, 1, Vt] f32
    dbw_scr,        # [1, h] f32
    dbb_scr,        # [1, 1] f32 SMEM
    *pair_scr,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    v_tile: int,
    num_v_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    num_real_states: int,
):
  """Large-vocabulary fused backward: vocab-tiled recomputation.

  Same algorithm as ``_fused_backward_kernel`` (within-frame alpha replay,
  beta recursion, cotangent-scaled arc marginals pushed through the heads
  and tanh on-chip) but every lexical access streams (state-tile,
  vocab-tile) blocks recomputed on the MXU instead of reading the VMEM
  exp cache. Marginals are formed directly as
  ``exp(a_j + lex + nb_j - log_z)`` — each exponent is a log arc
  posterior, <= ~0 up to rounding, so no max-shift dance is needed (the
  clip guards bfloat16 rounding, never a real value).

  All tile sweeps are ``lax.fori_loop``s over leading-axis-tiled refs —
  see the spill-slot note in ``_online_forward_kernel``. The marginal
  pass needs each (a_j, nb_j) pair sliced per tile inside the loops, so
  the pairs are scattered into dedicated per-pair scratch first.
  """
  t = pl.program_id(0)
  b = pl.program_id(1)
  s_pad = pc_ref.shape[0]
  vocab = num_v_tiles * v_tile
  hidden = pc_ref.shape[-1]
  num_pairs = 1 if frame_dependent else max_expansions
  a_pair_scr = pair_scr[:num_pairs]
  nb_pair_scr = pair_scr[num_pairs:]

  @pl.when(t == 0)
  def _():
    # Semiring-ones, or the relayed time-sharding seed (see the resident-
    # cache kernel).
    beta_scr[b] = beta0_ref[0]

  @pl.when((t == 0) & (b == 0))
  def _():
    dpc_scr[:] = jnp.zeros(dpc_scr.shape, jnp.float32)
    dbw_scr[:] = jnp.zeros(dbw_scr.shape, jnp.float32)
    dbb_scr[0, 0] = 0.0
    for v in range(num_v_tiles):
      dvw_scr[v] = jnp.zeros((hidden, v_tile), jnp.float32)
      dvb_scr[v] = jnp.zeros((1, v_tile), jnp.float32)

  alpha = hist_ref[0, 0]                    # [Bt, S_pad]
  beta = beta_scr[b]                        # [Bt, S_pad]
  pf = pf_ref[0, 0]                         # [Bt, h]
  log_z = logz_ref[0]                       # [Bt, 1]
  pad = is_pad_ref[0, 0] != 0               # [Bt, 1]
  g_eff = jnp.where(pad, 0.0, g_ref[0])     # [Bt, 1]
  bw_c = bw_ref[:].astype(compute_dtype)

  def tile_joint(i):
    """[Bt, s_tile, h] float32 joint for (dynamic) state tile i."""
    pc_t = pc_ref[pl.ds(i * s_tile, s_tile), :]
    return jnp.tanh(pc_t[None, :, :] + pf[:, None, :])

  def lex_tile(joint2d, v):
    vw_t = vw_ref[v].astype(compute_dtype)
    lex2d = jax.lax.dot_general(
        joint2d, vw_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    return (lex2d + vb_ref[v]).reshape(batch_tile, s_tile, v_tile)

  def to_lex_space(x):
    """x[:, 1:1+vocab] via a lane-aligned rotate."""
    return pltpu.roll(x, shift=x.shape[1] - 1, axis=1)[:, :vocab]

  def scatter_s(ref, vec):
    """[Bt, S_pad] value -> [NS, Bt, s_tile] tiles (static lane slices)."""
    for i in range(num_s_tiles):
      ref[i] = jax.lax.slice_in_dim(vec, i * s_tile, (i + 1) * s_tile,
                                    axis=1)

  def scatter_v(ref, vec):
    """[Bt, V] value -> [NV, Bt, Vt] tiles (static lane slices)."""
    for v in range(num_v_tiles):
      ref[v] = jax.lax.slice_in_dim(vec, v * v_tile, (v + 1) * v_tile,
                                    axis=1)

  # Blank pass (one joint sweep; masks padded states semiring-dead as in
  # _fused_backward_kernel — see the guard comment there).
  def blank_body(i, _):
    joint2d = tile_joint(i).astype(compute_dtype).reshape(
        batch_tile * s_tile, -1)
    blank2d = jax.lax.dot_general(
        joint2d, bw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_mxu_precision(compute_dtype))
    blank_scr[i] = blank2d.reshape(batch_tile, s_tile) + bb_ref[0, 0]
    return 0

  jax.lax.fori_loop(0, num_s_tiles, blank_body, 0)
  blank = jnp.concatenate([blank_scr[i] for i in range(num_s_tiles)],
                          axis=1)
  col = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
  blank = jnp.where(col < num_real_states, blank, NEG_INF)

  def online_reduce(vec):
    """red[b, y] = logsumexp_s(vec[b, s] + lex[b, s, y]), streamed."""
    scatter_s(vec_scr, vec)
    for v in range(num_v_tiles):
      m_scr[v] = jnp.full((batch_tile, v_tile), NEG_INF, jnp.float32)
      acc_scr[v] = jnp.zeros((batch_tile, v_tile), jnp.float32)

    def s_body(i, _):
      joint2d = tile_joint(i).astype(compute_dtype).reshape(
          batch_tile * s_tile, -1)
      vec_t = vec_scr[i]

      def v_body(v, _):
        chunk = vec_t[:, :, None] + lex_tile(joint2d, v)
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
    red_tiles = []
    for v in range(num_v_tiles):
      m_v = m_scr[v]
      acc_v = acc_scr[v]
      red_tiles.append(
          jnp.where(acc_v == 0, NEG_INF,
                    jnp.where(jnp.isfinite(m_v), m_v, 0.0) +
                    jnp.log(acc_v)))
    return jnp.concatenate(red_tiles, axis=1)

  def online_lse_y(nb_lex):
    """out[b, s] = logsumexp_y(lex[b, s, y] + nb_lex[b, y]), streamed."""
    scatter_v(nbv_scr, nb_lex)

    def s_body(i, _):
      joint2d = tile_joint(i).astype(compute_dtype).reshape(
          batch_tile * s_tile, -1)

      def v_body(v, carry):
        m_s, acc_s = carry
        chunk = lex_tile(joint2d, v) + nbv_scr[v][:, None, :]
        cm = jnp.max(chunk, axis=2)                 # [Bt, s_tile]
        new_m = jnp.maximum(m_s, cm)
        safe = jnp.where(jnp.isfinite(new_m), new_m, 0.0)
        acc_s = (acc_s * jnp.exp(m_s - safe) +
                 jnp.sum(jnp.exp(chunk - safe[:, :, None]), axis=2))
        return new_m, acc_s

      m_s, acc_s = jax.lax.fori_loop(
          0, num_v_tiles, v_body,
          (jnp.full((batch_tile, s_tile), NEG_INF, jnp.float32),
           jnp.zeros((batch_tile, s_tile), jnp.float32)))
      nb_scr[i] = jnp.where(
          acc_s == 0, NEG_INF,
          jnp.where(jnp.isfinite(m_s), m_s, 0.0) + jnp.log(acc_s))
      return 0

    jax.lax.fori_loop(0, num_s_tiles, s_body, 0)
    return jnp.concatenate([nb_scr[i] for i in range(num_s_tiles)],
                           axis=1)  # [Bt, S_pad]

  def expand(red):
    pad_cols = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF,
                        jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  # Scatter the (a_j, nb_j) marginal pairs into per-pair scratch as they
  # are produced; the marginal pass reads them tile by tile.
  if frame_dependent:
    scatter_s(a_pair_scr[0], alpha)
    scatter_v(nb_pair_scr[0], to_lex_space(beta))
    bm_total = jnp.exp(alpha + blank + beta - log_z)
    final_nb = jnp.logaddexp(blank + beta,
                             online_lse_y(to_lex_space(beta)))
  else:
    k = max_expansions
    a_list = [alpha]
    for _ in range(k):
      a_list.append(expand(online_reduce(a_list[-1])))
    bm_total = jnp.zeros_like(alpha)
    for j in range(k + 1):
      bm_total = bm_total + jnp.exp(a_list[j] + blank + beta - log_z)
    nb = blank + beta
    for i in range(k):
      j = k - 1 - i
      scatter_s(a_pair_scr[i], a_list[j])
      scatter_v(nb_pair_scr[i], to_lex_space(nb))
      nb = jnp.logaddexp(blank + beta, online_lse_y(to_lex_space(nb)))
    final_nb = nb

  scatter_s(vec_scr, g_eff * bm_total)      # d_blank tiles

  # Marginal + gradient pass: one streamed sweep forms the
  # cotangent-scaled arc marginals per tile and pushes them through the
  # vocab head, blank head and tanh, accumulating into the VMEM grad
  # scratches (same tile algebra as _fused_backward_kernel pass B).
  n = batch_tile * s_tile

  def marg_body(i, dpf_acc):
    joint = tile_joint(i)                   # [Bt, St, h] f32
    joint3_c = joint.astype(compute_dtype)
    joint2d = joint3_c.reshape(n, -1)
    djoint_scr[:] = jnp.zeros((n, hidden), jnp.float32)

    def v_body(v, _):
      lex = lex_tile(joint2d, v)            # [Bt, St, v_tile]
      lm = jnp.zeros_like(lex)
      for p in range(num_pairs):
        a_t = a_pair_scr[p][i]              # [Bt, s_tile]
        nb_t = nb_pair_scr[p][v]            # [Bt, v_tile]
        expo = a_t[:, :, None] + lex + nb_t[:, None, :] - log_z[:, :, None]
        lm = lm + jnp.exp(jnp.minimum(expo, 60.0))
      d_lex3 = (g_eff[:, :, None] * lm).astype(compute_dtype)
      dvw_scr[v] += jnp.sum(
          jax.lax.dot_general(
              joint3_c, d_lex3, (((1,), (1,)), ((0,), (0,))),
              preferred_element_type=jnp.float32,
              precision=_mxu_precision(compute_dtype)), axis=0)
      dvb_scr[v] += jnp.sum(
          d_lex3.astype(jnp.float32), axis=(0, 1), keepdims=True)[0]
      vw_t = vw_ref[v].astype(compute_dtype)
      djoint_scr[:, :] += jax.lax.dot_general(
          d_lex3, vw_t, (((2,), (1,)), ((), ())),
          preferred_element_type=jnp.float32,
          precision=_mxu_precision(compute_dtype)).reshape(n, hidden)
      return 0

    jax.lax.fori_loop(0, num_v_tiles, v_body, 0)
    d_blank3 = vec_scr[i][:, :, None]       # [Bt, s_tile, 1]
    dbw_scr[:, :] += jnp.sum(joint * d_blank3, axis=(0, 1), keepdims=True)[0]
    dbb_scr[0, 0] += jnp.sum(d_blank3)
    d_joint3 = djoint_scr[:, :].reshape(batch_tile, s_tile, hidden)
    d_joint3 = d_joint3 + d_blank3 * bwt_ref[:][None, :, :]
    d_pre = d_joint3 * (1.0 - joint * joint)
    dpc_scr[pl.ds(i * s_tile, s_tile), :] += jnp.sum(d_pre, axis=0)
    return dpf_acc + jnp.sum(d_pre, axis=1)

  dpf_acc = jax.lax.fori_loop(
      0, num_s_tiles, marg_body,
      jnp.zeros((batch_tile, hidden), jnp.float32))

  dpf_ref[0, 0] = dpf_acc
  nb_eff = jnp.where(pad, beta, final_nb)
  beta_scr[b] = nb_eff
  beta_out_ref[0] = jnp.where(col < num_real_states, nb_eff, NEG_INF)

  @pl.when((t == pl.num_programs(0) - 1) & (b == pl.num_programs(1) - 1))
  def _():
    dpc_ref[:] = dpc_scr[:]
    dvw_ref[:] = dvw_scr[:]
    dvb_ref[:] = dvb_scr[:]
    dbw_ref[:] = dbw_scr[:]
    dbb_ref[0, 0] = dbb_scr[0, 0]


# VMEM budgets (v5e: 128 MB total; leave room for inputs, double buffers
# and grad scratches). _CACHE_BUDGET bounds the exp-space lexical cache of
# the resident-cache kernels at the minimum 8-row batch tile;
# _ONLINE_BUDGET bounds the vocab-tiled online backward's working set:
# each of the head-sized ([h, V]) and context-sized ([S_pad, h]) tensors
# is resident THREE times (input + output + gradient scratch), so the
# binding term is 3 * (S_pad + V_pad) * hidden * 4 bytes. Measured on
# v5e at hidden 512: V=6144 compiles and runs, V=8192 exceeds VMEM.
_CACHE_BUDGET = 80 * 1024 * 1024
_ONLINE_BUDGET = 80 * 1024 * 1024


def _plan(num_states: int, vocab: int, hidden: int):
  """Picks the kernel variant for a bigram configuration.

  Returns ('cache', float32) when the exp-space lexical cache fits VMEM
  (bigram V up to ~1500), ('online', None) for the vocab-tiled streaming
  kernels (V up to ~6400 at hidden 512; measured: 6144 compiles, 8192
  exceeds VMEM), or None when even the online working set cannot fit
  (fall back to XLA).

  A bfloat16 cache tier was measured and rejected: halving the cache
  bytes is not enough, because Mosaic's dtype-conversion staging around
  the cache reads/writes costs ~80 MB of additional scoped VMEM at
  V=2048 (total 152.7 MB > 128 MB — compile-time OOM on v5e), so any
  configuration whose f32 cache does not fit goes online instead.
  """
  v_pad = _round_up(vocab, _LANES)
  s_pad = _round_up(max(num_states, 1 + v_pad), _LANES)
  if 8 * s_pad * v_pad * 4 <= _CACHE_BUDGET:
    return ('cache', jnp.float32)
  if 3 * (s_pad + v_pad) * hidden * 4 <= _ONLINE_BUDGET:
    return ('online', None)
  return None


def _choose_v_tile(v_pad: int) -> int:
  """Largest preferred vocab tile dividing the padded vocabulary."""
  for vt in (512, 384, 256, 128):
    if v_pad % vt == 0:
      return vt
  return _LANES


def _resolve_mode(mode, cache_dtype, num_states, vocab, hidden):
  """Resolves mode='auto' to a concrete (mode, cache_dtype) pair."""
  if mode != 'auto':
    return mode, cache_dtype
  plan = _plan(num_states, vocab, hidden)
  if plan is None:
    raise ValueError(
        f'no fused-kernel plan for num_states={num_states}, vocab={vocab}, '
        f'hidden={hidden}; supported() should have gated this call')
  mode, planned_dtype = plan
  return mode, (planned_dtype if planned_dtype is not None else cache_dtype)


def _pad_vocab(wf_params):
  """Pads the vocab head to a 128-lane multiple.

  Padded labels carry a -inf bias, so they are exact semiring zeros
  everywhere downstream (exp-cache entries 0, reductions unaffected,
  marginals/gradients 0); callers trim the returned gradients back.
  Returns (wf_params, padded_vocab).
  """
  vocab = wf_params['vocab_w'].shape[-1]
  v_pad = _round_up(vocab, _LANES)
  if v_pad != vocab:
    wf_params = dict(
        wf_params,
        vocab_w=jnp.pad(wf_params['vocab_w'],
                        ((0, 0), (0, v_pad - vocab))),
        vocab_b=jnp.pad(wf_params['vocab_b'], (0, v_pad - vocab),
                        constant_values=NEG_INF))
  return wf_params, v_pad


def _stage_reverse_inputs(wf_params, cache, frames, num_frames, log_z,
                          alpha_history, tile, s_pad, s):
  """Builds the per-(t, b-tile) blocks shared by the reverse scans.

  The backward kernels and the marginals kernel consume identically
  staged inputs — 4-D [T, num_b_tiles, tile, ...] blocks so per-grid-step
  reads are static and tile-aligned, the alpha history padded with -inf
  at fake states, and float32-accumulated projections consistent with the
  forward (``preferred_element_type``). Keeping the recipe in one place
  keeps the two reverse paths bit-identical.

  Returns (pf, pc, is_pad, hist, logz_b, b_pad, num_b_tiles).
  """
  batch, max_t, _ = frames.shape
  hidden = wf_params['frame_proj'].shape[-1]
  b_pad = _round_up(batch, tile)
  num_b_tiles = b_pad // tile
  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  pc = jnp.pad(cache @ wf_params['context_proj'], ((0, s_pad - s), (0, 0)))
  is_pad = (jnp.arange(max_t)[:, None] >= num_frames[None, :]).astype(
      jnp.int32)
  if b_pad != batch:
    pf = jnp.pad(pf, ((0, 0), (0, b_pad - batch), (0, 0)))
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  pf = pf.reshape(max_t, num_b_tiles, tile, hidden)
  is_pad = is_pad.reshape(max_t, num_b_tiles, tile, 1)
  hist = jnp.moveaxis(alpha_history, 1, 0)
  hist = jnp.pad(hist, ((0, 0), (0, b_pad - batch), (0, s_pad - s)),
                 constant_values=NEG_INF)
  hist = hist.reshape(max_t, num_b_tiles, tile, s_pad)
  logz_b = jnp.pad(log_z, (0, b_pad - batch)).reshape(num_b_tiles, tile, 1)
  return pf, pc, is_pad, hist, logz_b, b_pad, num_b_tiles


def fused_shortest_distance_fwd(wf_params: Any,
                                cache: jnp.ndarray,
                                frames: jnp.ndarray,
                                num_frames: jnp.ndarray,
                                *,
                                max_expansions: int,
                                frame_dependent: bool,
                                num_context_states: int,
                                batch_tile: int = 0,
                                s_tile: int = 128,
                                compute_dtype=jnp.bfloat16,
                                cache_dtype=jnp.float32,
                                mode: str = 'auto',
                                interpret: bool = False,
                                alpha0=None,
                                return_final_alpha: bool = False,
                                with_history: bool = True,
                                with_expansions: bool = False):
  """Runs the fused forward scan.

  Args:
    wf_params: JointWeightFn parameter pytree.
    cache: [num_context_states, embedding_size] context embedding table.
    frames: [B, T, feature_size] frames.
    num_frames: [B] int32.
    max_expansions: k for FrameLabelDependent (ignored if frame_dependent).
    frame_dependent: FrameDependent vs FrameLabelDependent step.
    num_context_states: 1 + vocab_size (bigram).
    batch_tile: Batch tile size (must divide the padded batch).
    s_tile: Context-state tile size.
    compute_dtype: MXU input dtype (bfloat16 for speed, float32 for tests).
    cache_dtype: VMEM exp-cache dtype ('cache' mode only; bfloat16 halves
      the cache and doubles the vocab ceiling).
    mode: 'cache' (VMEM-resident exp-space lexical cache), 'online'
      (vocab-tiled streaming logsumexp, no cache — for large V), or
      'auto' (size-based choice via ``_plan``).
    interpret: Run the kernel in interpreter mode (CPU testing).
    alpha0: Optional [B, S] log-space initial state weights (default: the
      one-hot start-state alpha). Lets callers chain the scan across
      frame blocks — e.g. the time-sharded alpha relay
      (``parallel.sequence``).
    return_final_alpha: Also return the [B, S] alpha after the last
      frame (per-sequence padding carries alpha through, as in
      ``lattices._forward``).
    with_history: When False, the per-frame alpha history is not
      materialized in HBM (every grid step overwrites one dummy block)
      and ``alpha_history`` is returned as None — for callers that only
      need log_z / the final alpha, e.g. the time-sharded relay.

  Returns:
    (log_z [B], alpha_history [B, T, S]) — matching ``lattices._forward``
    under the Log semiring — plus final_alpha [B, S] when
    ``return_final_alpha``, plus a k-tuple of RAW [T, B_pad, S_pad]
    expansion-alpha arrays when ``with_expansions`` (kernel layout; feed
    them to ``run_fused_backward(expansion_history=...)``, which
    restages them — see STREAM_EXPANSIONS).
  """
  batch, max_t, _ = frames.shape
  vocab = wf_params['vocab_w'].shape[-1]
  s = num_context_states
  assert s == vocab + 1, 'fused kernel requires bigram FullNGram'
  mode, cache_dtype = _resolve_mode(
      mode, cache_dtype, s, vocab, wf_params['frame_proj'].shape[-1])
  if with_expansions and (frame_dependent or max_expansions < 1
                          or mode != 'cache'):
    raise ValueError('with_expansions requires FrameLabelDependent with '
                     "max_expansions >= 1 in 'cache' mode")
  wf_params, vocab = _pad_vocab(wf_params)
  # expand() writes the padded label block into states 1..vocab.
  s_pad = _round_up(max(s, 1 + vocab), s_tile)
  if not batch_tile:
    if mode == 'cache':
      # The on-chip E cache is [batch_tile * S_pad, V_pad] floats; size
      # the batch tile to keep it within ~80MB of VMEM (16 rows at the
      # headline config — measured ~2% faster end-to-end than 8 on v5e).
      cache_bytes = s_pad * vocab * jnp.dtype(cache_dtype).itemsize
      batch_tile = max(8, min(32, (80 * 1024 * 1024) // max(cache_bytes, 1)
                              // 8 * 8))
    else:
      # Online mode keeps no O(S*V) state; 8 rows per tile.
      batch_tile = 8
    # Never pad a small batch up to the tile: cap at the 8-row-aligned
    # true batch so e.g. B=4 runs one 8-row tile, not a 16-row one.
    batch_tile = min(batch_tile, _round_up(batch, 8))
  b_pad = _round_up(batch, batch_tile)

  # Frame-independent precomputation (one big MXU matmul each; XLA).
  # preferred_element_type keeps the forward residual alphas consistent
  # with the backward's recomputation (prepare() below), which also
  # accumulates in float32.
  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  pc = cache @ wf_params['context_proj']  # [S, h]
  hidden = pc.shape[-1]
  pc = jnp.pad(pc, ((0, s_pad - s), (0, 0)))
  if b_pad != batch:
    pf = jnp.pad(pf, ((0, 0), (0, b_pad - batch), (0, 0)))

  is_pad = (jnp.arange(max_t)[:, None] >=
            jnp.asarray(num_frames, jnp.int32)[None, :]).astype(jnp.int32)
  if b_pad != batch:
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  # [T, num_b_tiles, 1, Bt]: per-(t, b-tile) blocks with static in-kernel
  # reads (Mosaic cannot slice the lane dim at non-128-aligned offsets).
  is_pad = is_pad.reshape(max_t, b_pad // batch_tile, 1, batch_tile)

  if alpha0 is None:
    alpha0 = jnp.full((b_pad, s_pad), NEG_INF, jnp.float32)
    alpha0 = alpha0.at[:, 0].set(0.0)
  else:
    alpha0 = jnp.pad(jnp.asarray(alpha0, jnp.float32),
                     ((0, b_pad - batch), (0, s_pad - s)),
                     constant_values=NEG_INF)

  num_b_tiles = b_pad // batch_tile
  num_s_tiles = s_pad // s_tile

  if mode == 'cache':
    kernel = _cached_partial(
        _fused_forward_kernel,
        batch_tile=batch_tile,
        s_tile=s_tile,
        num_s_tiles=num_s_tiles,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        with_expansions=with_expansions)
    scratch_shapes = [
        pltpu.VMEM((b_pad, s_pad), jnp.float32),
        pltpu.VMEM((batch_tile, s_pad), jnp.float32),
        pltpu.VMEM((batch_tile * s_pad, vocab), cache_dtype),
    ]
    vw_in = wf_params['vocab_w']
    vb_in = wf_params['vocab_b'][None, :]
    vw_spec = pl.BlockSpec((hidden, vocab), lambda t, b: (0, 0))
    vb_spec = pl.BlockSpec((1, vocab), lambda t, b: (0, 0))
  else:
    v_tile = _choose_v_tile(vocab)
    num_v_tiles = vocab // v_tile
    kernel = _cached_partial(
        _online_forward_kernel,
        batch_tile=batch_tile,
        s_tile=s_tile,
        num_s_tiles=num_s_tiles,
        v_tile=v_tile,
        num_v_tiles=num_v_tiles,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        compute_dtype=compute_dtype)
    scratch_shapes = [
        pltpu.VMEM((b_pad, s_pad), jnp.float32),
        pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
        pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
        pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
        pltpu.VMEM((num_v_tiles, batch_tile, v_tile), jnp.float32),
    ]
    # Vocab-tile-major layout so the fori_loop bodies index the head on
    # the leading axis (lane-dim dynamic slicing is unsupported).
    vw_in = jnp.moveaxis(
        wf_params['vocab_w'].reshape(hidden, num_v_tiles, v_tile), 1, 0)
    vb_in = wf_params['vocab_b'].reshape(num_v_tiles, 1, v_tile)
    vw_spec = pl.BlockSpec((num_v_tiles, hidden, v_tile),
                           lambda t, b: (0, 0, 0))
    vb_spec = pl.BlockSpec((num_v_tiles, 1, v_tile),
                           lambda t, b: (0, 0, 0))

  out_specs = [
      # with_history=False parks every step's history block at index
      # 0 — one [1, B, S] dummy in HBM instead of the [T, B, S] dump.
      pl.BlockSpec((1, batch_tile, s_pad),
                   (lambda t, b: (t, b, 0)) if with_history else
                   (lambda t, b: (0, b, 0))),
      pl.BlockSpec((batch_tile, s_pad), lambda t, b: (b, 0)),
  ]
  out_shape = [
      jax.ShapeDtypeStruct(
          (max_t if with_history else 1, b_pad, s_pad), jnp.float32),
      jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
  ]
  if with_expansions:
    for _ in range(max_expansions):
      out_specs.append(
          pl.BlockSpec((1, batch_tile, s_pad), lambda t, b: (t, b, 0)))
      out_shape.append(
          jax.ShapeDtypeStruct((max_t, b_pad, s_pad), jnp.float32))

  outs = pl.pallas_call(
      kernel,
      grid=(max_t, num_b_tiles),
      in_specs=[
          pl.BlockSpec((1, 1, 1, batch_tile), lambda t, b: (t, b, 0, 0)),
          pl.BlockSpec((1, batch_tile, hidden), lambda t, b: (t, b, 0)),
          pl.BlockSpec((s_pad, hidden), lambda t, b: (0, 0)),
          vw_spec,
          vb_spec,
          pl.BlockSpec((hidden, 1), lambda t, b: (0, 0)),
          pl.BlockSpec((1, 1), lambda t, b: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((batch_tile, s_pad), lambda t, b: (b, 0)),
      ],
      out_specs=out_specs,
      out_shape=out_shape,
      scratch_shapes=scratch_shapes,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(is_pad, pf, pc, vw_in, vb_in, wf_params['blank_w'][:, None],
    wf_params['blank_b'][None, None], alpha0)
  hist, alpha_t = outs[0], outs[1]
  expansions = tuple(outs[2:]) if with_expansions else None

  # Unpad and reshape to the lattices._forward contract.
  alpha_t = alpha_t[:batch, :s]
  log_z = jax.scipy.special.logsumexp(alpha_t, axis=-1)
  alpha_history = (jnp.moveaxis(hist[:, :batch, :s], 0, 1)  # [B, T, S]
                   if with_history else None)
  ret = [log_z, alpha_history]
  if return_final_alpha:
    ret.append(alpha_t)
  if with_expansions:
    ret.append(expansions)
  return tuple(ret)


def _bwd_tiles(mode, s, vocab_padded, s_tile, bwd_batch_tile):
  """Backward-kernel tile auto-tune (measured on v5e); idempotent."""
  if (mode == 'cache' and s_tile == 128 and bwd_batch_tile == 4 and
      _round_up(max(s, 1 + vocab_padded), 128) % 384 == 0):
    # When the padded state count divides into 384-wide tiles,
    # fewer/larger reduction matvecs and batch tile 8 are ~4% faster
    # end-to-end and still fit VMEM.
    s_tile = 384
    bwd_batch_tile = 8
  if mode == 'online' and bwd_batch_tile == 4:
    # The online backward keeps no O(S*V) VMEM state; larger batch
    # tiles amortize the per-tile joint recomputation.
    bwd_batch_tile = 8
  return s_tile, bwd_batch_tile


def run_fused_backward(wf_params: Any,
                       cache: jnp.ndarray,
                       frames: jnp.ndarray,
                       num_frames: jnp.ndarray,
                       log_z: jnp.ndarray,
                       g: jnp.ndarray,
                       alpha_history: jnp.ndarray,
                       *,
                       max_expansions: int,
                       frame_dependent: bool,
                       num_context_states: int,
                       bwd_batch_tile: int = 4,
                       s_tile: int = 128,
                       compute_dtype=jnp.bfloat16,
                       cache_dtype=jnp.float32,
                       mode: str = 'auto',
                       interpret: bool = False,
                       beta0=None,
                       expansion_history=None):
  """Runs the fused backward (beta) scan over one frame block.

  The gradient half of ``log_partition``: given the forward residuals
  (global ``log_z``, the block's ``alpha_history``) and the cotangent
  ``g`` of ``log_z``, it runs the reverse beta recursion over the block's
  frames, forms cotangent-scaled arc marginals and pushes them through
  the joint-network heads on-chip.

  ``beta0`` (optional [batch, num_context_states] log-space beta at the
  block's RIGHT edge; default semiring-ones) and the returned
  ``beta_out`` (beta at the block's LEFT edge) let the time-sharded
  relay (``parallel.sequence``) chain this kernel across devices in
  reverse, mirroring the forward kernel's ``alpha0`` chaining — the
  distributed analogue of the reference's backward-recomputation design
  (reference ``lattices.py:539-557``).

  ``expansion_history`` is the k-tuple of raw [T, B_pad, S_pad]
  expansion-alpha arrays from ``fused_shortest_distance_fwd(...,
  with_expansions=True)`` (forward kernel layout/padding); when given
  ('cache' mode, FLD only), the kernel reads them instead of replaying
  k expand(sweep_reduce) passes per frame. Bit-identical gradients —
  see STREAM_EXPANSIONS.

  Returns:
    (d_wf_params, d_cache, d_frames, beta_out).
  """
  num_frames = jnp.asarray(num_frames, jnp.int32)
  batch, max_t, _ = frames.shape
  true_vocab = wf_params['vocab_w'].shape[-1]
  s = num_context_states
  hidden = wf_params['frame_proj'].shape[-1]
  mode, cache_dtype = _resolve_mode(mode, cache_dtype, s, true_vocab,
                                    hidden)
  vocab = _round_up(true_vocab, _LANES)
  s_tile, bwd_batch_tile = _bwd_tiles(mode, s, vocab, s_tile,
                                      bwd_batch_tile)
  s_pad = _round_up(max(s, 1 + vocab), s_tile)
  tile = bwd_batch_tile
  num_s_tiles = s_pad // s_tile
  pf, pc, is_pad, hist, logz_b, b_pad, num_b_tiles = (
      _stage_reverse_inputs(wf_params, cache, frames, num_frames, log_z,
                            alpha_history, tile, s_pad, s))
  g_b = jnp.pad(jnp.asarray(g, jnp.float32),
                (0, b_pad - batch)).reshape(num_b_tiles, tile, 1)
  if beta0 is None:
    # Semiring-ones everywhere (the single-block seed, padded rows
    # included, matching the kernels' historical zero init exactly).
    beta0_b = jnp.zeros((b_pad, s_pad), jnp.float32)
  else:
    beta0_b = jnp.pad(jnp.asarray(beta0, jnp.float32),
                      ((0, b_pad - batch), (0, s_pad - s)),
                      constant_values=NEG_INF)
  beta0_b = beta0_b.reshape(num_b_tiles, tile, s_pad)

  if expansion_history is not None and (
      frame_dependent or max_expansions < 1 or mode != 'cache'):
    raise ValueError('expansion_history requires FrameLabelDependent '
                     "with max_expansions >= 1 in 'cache' mode")
  if expansion_history is not None:
    # Restage the forward-layout [T, B_pad_fwd, S_pad_fwd] slabs to this
    # kernel's (possibly different) batch tiling. Slice to the true
    # extents, re-pad with -inf (what the in-kernel replay produces at
    # padded rows/states), retile; when the paddings already match, XLA
    # elides the copy.
    def _restage_expans(e):
      e = e[:, :batch, :s]
      e = jnp.pad(e, ((0, 0), (0, b_pad - batch), (0, s_pad - s)),
                  constant_values=NEG_INF)
      return e.reshape(max_t, num_b_tiles, tile, s_pad)

    expansion_history = [_restage_expans(e) for e in expansion_history]

  padded_params, _ = _pad_vocab(wf_params)
  if mode == 'cache':
    kernel = _cached_partial(
        _fused_backward_kernel,
        batch_tile=tile,
        s_tile=s_tile,
        num_s_tiles=num_s_tiles,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        num_real_states=s,
        with_expansions=expansion_history is not None)
    mode_scratch = [
        pltpu.VMEM((tile, s_pad), jnp.float32),
        pltpu.VMEM((tile * s_pad, vocab), cache_dtype),
    ]
    tail_scratch = []
    vw_in = padded_params['vocab_w']
    vb_in = padded_params['vocab_b'][None, :]
    vw_shape = (hidden, vocab)
    vb_shape = (1, vocab)
    vw_spec = pl.BlockSpec(vw_shape, lambda t, b: (0, 0))
    vb_spec = pl.BlockSpec(vb_shape, lambda t, b: (0, 0))
  else:
    v_tile = _choose_v_tile(vocab)
    num_v_tiles = vocab // v_tile
    num_pairs = 1 if frame_dependent else max_expansions
    kernel = _cached_partial(
        _online_backward_kernel,
        batch_tile=tile,
        s_tile=s_tile,
        num_s_tiles=num_s_tiles,
        v_tile=v_tile,
        num_v_tiles=num_v_tiles,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        compute_dtype=compute_dtype,
        num_real_states=s)
    mode_scratch = [
        pltpu.VMEM((num_s_tiles, tile, s_tile), jnp.float32),  # vec
        pltpu.VMEM((num_s_tiles, tile, s_tile), jnp.float32),  # blank
        pltpu.VMEM((num_v_tiles, tile, v_tile), jnp.float32),  # max
        pltpu.VMEM((num_v_tiles, tile, v_tile), jnp.float32),  # sum
        pltpu.VMEM((num_v_tiles, tile, v_tile), jnp.float32),  # lse_y in
        pltpu.VMEM((num_s_tiles, tile, s_tile), jnp.float32),  # lse_y out
        pltpu.VMEM((tile * s_tile, hidden), jnp.float32),      # d(joint)
    ]
    tail_scratch = (
        [pltpu.VMEM((num_s_tiles, tile, s_tile), jnp.float32)
         for _ in range(num_pairs)] +
        [pltpu.VMEM((num_v_tiles, tile, v_tile), jnp.float32)
         for _ in range(num_pairs)])
    vw_in = jnp.moveaxis(
        padded_params['vocab_w'].reshape(hidden, num_v_tiles, v_tile),
        1, 0)
    vb_in = padded_params['vocab_b'].reshape(num_v_tiles, 1, v_tile)
    vw_shape = (num_v_tiles, hidden, v_tile)
    vb_shape = (num_v_tiles, 1, v_tile)
    vw_spec = pl.BlockSpec(vw_shape, lambda t, b: (0, 0, 0))
    vb_spec = pl.BlockSpec(vb_shape, lambda t, b: (0, 0, 0))

  rev = lambda t: max_t - 1 - t
  in_specs = [
      pl.BlockSpec((1, 1, tile, 1), lambda t, b: (rev(t), b, 0, 0)),
      pl.BlockSpec((1, tile, 1), lambda t, b: (b, 0, 0)),
      pl.BlockSpec((1, tile, 1), lambda t, b: (b, 0, 0)),
      pl.BlockSpec((1, 1, tile, hidden),
                   lambda t, b: (rev(t), b, 0, 0)),
      pl.BlockSpec((s_pad, hidden), lambda t, b: (0, 0)),
      vw_spec,
      vb_spec,
      pl.BlockSpec((hidden, 1), lambda t, b: (0, 0)),
      pl.BlockSpec((1, hidden), lambda t, b: (0, 0)),
      pl.BlockSpec((1, 1), lambda t, b: (0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((1, 1, tile, s_pad),
                   lambda t, b: (rev(t), b, 0, 0)),
  ]
  inputs = [is_pad, logz_b, g_b, pf, pc, vw_in, vb_in,
            wf_params['blank_w'][:, None],
            wf_params['blank_w'][None, :],
            wf_params['blank_b'][None, None], hist]
  if expansion_history is not None:
    for e in expansion_history:
      in_specs.append(pl.BlockSpec((1, 1, tile, s_pad),
                                   lambda t, b: (rev(t), b, 0, 0)))
      inputs.append(e)
  in_specs.append(pl.BlockSpec((1, tile, s_pad), lambda t, b: (b, 0, 0)))
  inputs.append(beta0_b)
  dpf, dpc, dvw, dvb, dbw, dbb, beta_out = pl.pallas_call(
      kernel,
      grid=(max_t, num_b_tiles),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, 1, tile, hidden),
                       lambda t, b: (rev(t), b, 0, 0)),
          pl.BlockSpec((s_pad, hidden), lambda t, b: (0, 0)),
          pl.BlockSpec(vw_shape,
                       (lambda t, b: (0, 0)) if mode == 'cache' else
                       (lambda t, b: (0, 0, 0))),
          pl.BlockSpec(vb_shape,
                       (lambda t, b: (0, 0)) if mode == 'cache' else
                       (lambda t, b: (0, 0, 0))),
          pl.BlockSpec((1, hidden), lambda t, b: (0, 0)),
          pl.BlockSpec((1, 1), lambda t, b: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((1, tile, s_pad), lambda t, b: (b, 0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((max_t, num_b_tiles, tile, hidden),
                               jnp.float32),
          jax.ShapeDtypeStruct((s_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct(vw_shape, jnp.float32),
          jax.ShapeDtypeStruct(vb_shape, jnp.float32),
          jax.ShapeDtypeStruct((1, hidden), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((num_b_tiles, tile, s_pad), jnp.float32),
      ],
      scratch_shapes=(
          [pltpu.VMEM((num_b_tiles, tile, s_pad), jnp.float32)] +
          mode_scratch + [
              pltpu.VMEM((s_pad, hidden), jnp.float32),
              pltpu.VMEM(vw_shape, jnp.float32),
              pltpu.VMEM(vb_shape, jnp.float32),
              pltpu.VMEM((1, hidden), jnp.float32),
              pltpu.SMEM((1, 1), jnp.float32),
          ] + tail_scratch),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)

  if mode != 'cache':
    # Undo the vocab-tile-major layout.
    dvw = jnp.moveaxis(dvw, 0, 1).reshape(hidden, vocab)
    dvb = dvb.reshape(1, vocab)
  dpf = dpf.reshape(max_t, b_pad, hidden)[:, :batch]  # [T, B, h]
  dpc = dpc[:s]
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
  beta_out = beta_out.reshape(b_pad, s_pad)[:batch, :s]
  return d_wf, d_cache, d_frames, beta_out


def log_partition(wf_params: Any,
                  cache: jnp.ndarray,
                  frames: jnp.ndarray,
                  num_frames: jnp.ndarray,
                  *,
                  max_expansions: int,
                  frame_dependent: bool,
                  num_context_states: int,
                  batch_tile: int = 0,
                  bwd_batch_tile: int = 4,
                  s_tile: int = 128,
                  compute_dtype=jnp.bfloat16,
                  cache_dtype=jnp.float32,
                  mode: str = 'auto',
                  interpret: bool = False):
  """Differentiable log-partition (denominator) via the fused kernel pair.

  Forward: the fused scan kernel (alpha in VMEM, no lexical HBM traffic).
  Backward ('cache' mode): the fused backward kernel — per frame it
  recomputes and CACHES the lexical block in VMEM, runs the within-frame
  expansion sweeps from the cache, forms the (cotangent-scaled) arc
  marginals and pushes them through the joint-network heads and tanh
  on-chip; only the per-frame d(projected frame) and the small
  parameter-gradient accumulators leave the core. The XLA backward
  materializes ~10 [B, S, V] HBM temporaries per frame; this kernel
  materializes none. 'online' mode (large vocabularies) streams
  vocab-tiled lexical blocks instead of caching — see
  ``_online_backward_kernel``. The backward half lives in
  ``run_fused_backward`` so the time-sharded relay can drive it
  per-block with a chained beta carry.

  Returns [batch] log Z; gradients flow to wf_params, cache and frames.
  """
  num_frames = jnp.asarray(num_frames, jnp.int32)
  s = num_context_states
  true_vocab = wf_params['vocab_w'].shape[-1]
  hidden = wf_params['frame_proj'].shape[-1]
  mode, cache_dtype = _resolve_mode(mode, cache_dtype, s, true_vocab,
                                    hidden)
  s_tile, bwd_batch_tile = _bwd_tiles(
      mode, s, _round_up(true_vocab, _LANES), s_tile, bwd_batch_tile)
  fn = _log_partition_vjp_fn(
      max_expansions, frame_dependent, s, batch_tile, bwd_batch_tile,
      s_tile, compute_dtype, cache_dtype, mode, interpret,
      _stream_active(frame_dependent, max_expansions, mode))
  return fn(wf_params, cache, frames, num_frames)


@functools.lru_cache(maxsize=None)
def _log_partition_vjp_fn(max_expansions, frame_dependent, s, batch_tile,
                          bwd_batch_tile, s_tile, compute_dtype,
                          cache_dtype, mode, interpret, stream=False):
  """Cached custom-VJP builder for ``log_partition``.

  Creating the ``jax.custom_vjp`` object fresh on every call re-traced
  the Pallas kernels on every outer retrace (tracing-cache misses at the
  kernel ``pl.when`` bodies); one stable object per static config lets
  jax's caches hit instead. ``stream`` is a cache-key argument (not read
  from the module flag here) so STREAM_EXPANSIONS A/Bs get distinct
  cached objects.
  """

  def run_forward(wf_params, cache, frames, num_frames):
    outs = fused_shortest_distance_fwd(
        wf_params, cache, frames, num_frames,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        num_context_states=s,
        batch_tile=batch_tile,
        s_tile=s_tile,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        mode=mode,
        interpret=interpret,
        with_expansions=stream)
    if stream:
      log_z, alpha_history, expansions = outs
    else:
      (log_z, alpha_history), expansions = outs, None
    return log_z, alpha_history, expansions

  @jax.custom_vjp
  def fn(wf_params, cache, frames, num_frames):
    log_z, _, _ = run_forward(wf_params, cache, frames, num_frames)
    return log_z

  def fn_fwd(wf_params, cache, frames, num_frames):
    log_z, alpha_history, expansions = run_forward(
        wf_params, cache, frames, num_frames)
    return log_z, (wf_params, cache, frames, num_frames, log_z,
                   alpha_history, expansions)

  def fn_bwd(residuals, g):
    (wf_params, cache, frames, num_frames, log_z, alpha_history,
     expansions) = residuals
    d_wf, d_cache, d_frames, _ = run_fused_backward(
        wf_params, cache, frames, num_frames, log_z, g, alpha_history,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        num_context_states=s,
        bwd_batch_tile=bwd_batch_tile,
        s_tile=s_tile,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        mode=mode,
        interpret=interpret,
        expansion_history=expansions)
    return (d_wf, d_cache, d_frames,
            np.zeros(num_frames.shape, jax.dtypes.float0))

  fn.defvjp(fn_fwd, fn_bwd)
  return fn


def fused_label_marginals(wf_params: Any,
                          cache: jnp.ndarray,
                          frames: jnp.ndarray,
                          num_frames: jnp.ndarray,
                          *,
                          max_expansions: int,
                          frame_dependent: bool,
                          num_context_states: int,
                          batch_tile: int = 0,
                          bwd_batch_tile: int = 4,
                          s_tile: int = 128,
                          compute_dtype=jnp.bfloat16,
                          cache_dtype=jnp.float32,
                          interpret: bool = False):
  """Per-frame arc posteriors via the fused kernel pair ('cache' mode).

  One fused forward scan plus one reverse marginals scan; no gradient
  machinery, no O(T*S*V) tensors. Returns:

  - blank_marginals: [B, T, S] posterior of the blank arc leaving each
    context state at each frame (summed over alignment expansions).
  - lexical_marginals: [B, T, V] posterior of emitting each label at each
    frame, summed over source context states and expansions.

  The reference's backward-algorithm marginals (reference
  ``lattices.py:644-799``) materialize the full [T, S, V] posterior; at
  production shapes that is hundreds of GB, so this kernel emits the
  state-summed label posterior — the confidence quantity — while
  ``RecognitionLattice.arc_marginals`` keeps the dense XLA route for
  small configurations.
  """
  num_frames = jnp.asarray(num_frames, jnp.int32)
  batch, max_t, _ = frames.shape
  true_vocab = wf_params['vocab_w'].shape[-1]
  s = num_context_states
  hidden = wf_params['frame_proj'].shape[-1]
  mode, cache_dtype = _resolve_mode('auto', cache_dtype, s, true_vocab,
                                    hidden)
  if mode != 'cache':
    raise ValueError('fused_label_marginals requires the cache-mode plan; '
                     'gate with marginals_supported()')
  vocab = _round_up(true_vocab, _LANES)
  if (s_tile == 128 and bwd_batch_tile == 4 and
      _round_up(max(s, 1 + vocab), 128) % 384 == 0):
    s_tile = 384
    bwd_batch_tile = 8
  s_pad = _round_up(max(s, 1 + vocab), s_tile)

  stream = (STREAM_MARGINALS
            and _stream_active(frame_dependent, max_expansions, 'cache'))
  fwd_outs = fused_shortest_distance_fwd(
      wf_params, cache, frames, num_frames,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      num_context_states=s,
      batch_tile=batch_tile,
      s_tile=s_tile,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype,
      mode='cache',
      interpret=interpret,
      with_expansions=stream)
  if stream:
    log_z, alpha_history, expansions = fwd_outs
  else:
    (log_z, alpha_history), expansions = fwd_outs, None

  tile = bwd_batch_tile
  num_s_tiles = s_pad // s_tile
  pf, pc, is_pad, hist, logz_b, b_pad, num_b_tiles = (
      _stage_reverse_inputs(wf_params, cache, frames, num_frames, log_z,
                            alpha_history, tile, s_pad, s))
  if stream:
    # Restage the raw forward-layout expansion slabs to this kernel's
    # batch tiling (elided when the paddings already match).
    def _restage_expans(e):
      e = e[:, :batch, :s]
      e = jnp.pad(e, ((0, 0), (0, b_pad - batch), (0, s_pad - s)),
                  constant_values=NEG_INF)
      return e.reshape(max_t, num_b_tiles, tile, s_pad)

    expansions = [_restage_expans(e) for e in expansions]

  kernel = _cached_partial(
      _fused_marginals_kernel,
      batch_tile=tile,
      s_tile=s_tile,
      num_s_tiles=num_s_tiles,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype,
      num_real_states=s,
      with_expansions=stream)

  padded_params, _ = _pad_vocab(wf_params)
  rev = lambda t: max_t - 1 - t
  in_specs = [
      pl.BlockSpec((1, 1, tile, 1), lambda t, b: (rev(t), b, 0, 0)),
      pl.BlockSpec((1, tile, 1), lambda t, b: (b, 0, 0)),
      pl.BlockSpec((1, 1, tile, hidden),
                   lambda t, b: (rev(t), b, 0, 0)),
      pl.BlockSpec((s_pad, hidden), lambda t, b: (0, 0)),
      pl.BlockSpec((hidden, vocab), lambda t, b: (0, 0)),
      pl.BlockSpec((1, vocab), lambda t, b: (0, 0)),
      pl.BlockSpec((hidden, 1), lambda t, b: (0, 0)),
      pl.BlockSpec((1, 1), lambda t, b: (0, 0),
                   memory_space=pltpu.SMEM),
      pl.BlockSpec((1, 1, tile, s_pad),
                   lambda t, b: (rev(t), b, 0, 0)),
  ]
  inputs = [is_pad, logz_b, pf, pc, padded_params['vocab_w'],
            padded_params['vocab_b'][None, :],
            wf_params['blank_w'][:, None],
            wf_params['blank_b'][None, None], hist]
  if stream:
    for e in expansions:
      in_specs.append(pl.BlockSpec((1, 1, tile, s_pad),
                                   lambda t, b: (rev(t), b, 0, 0)))
      inputs.append(e)
  bm, lex = pl.pallas_call(
      kernel,
      grid=(max_t, num_b_tiles),
      in_specs=in_specs,
      out_specs=[
          pl.BlockSpec((1, 1, tile, s_pad),
                       lambda t, b: (rev(t), b, 0, 0)),
          pl.BlockSpec((1, 1, tile, vocab),
                       lambda t, b: (rev(t), b, 0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((max_t, num_b_tiles, tile, s_pad),
                               jnp.float32),
          jax.ShapeDtypeStruct((max_t, num_b_tiles, tile, vocab),
                               jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((num_b_tiles, tile, s_pad), jnp.float32),
          pltpu.VMEM((tile, s_pad), jnp.float32),
          pltpu.VMEM((tile * s_pad, vocab), cache_dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(*inputs)

  bm = bm.reshape(max_t, b_pad, s_pad)[:, :batch, :s]
  lex = lex.reshape(max_t, b_pad, vocab)[:, :batch, :true_vocab]
  return jnp.moveaxis(bm, 0, 1), jnp.moveaxis(lex, 0, 1)


def marginals_supported(lattice, frames, backend: str) -> bool:
  """Whether ``fused_label_marginals`` covers this configuration."""
  from last_torch_tpu import semirings
  if not supported(lattice, semirings.Log, None, None, None, frames,
                   backend):
    return False
  num_states, vocab = lattice.context.shape()
  plan = _plan(num_states, vocab, lattice.weight_fn.hidden_size)
  return plan is not None and plan[0] == 'cache'


def supported(lattice, semiring, blank_mask, lexical_mask, weight_lift,
              frames, backend: str, weight_fn=None) -> bool:
  """Whether the fused kernel covers this _forward invocation.

  ``backend`` is 'tpu' (real hardware), 'interpret' (CPU interpreter for
  tests), or anything else (unsupported). ``weight_fn`` overrides
  ``lattice.weight_fn`` for the structural check — the Viterbi kernel
  supports unwrapped LocallyNormalizedWeightFn(JointWeightFn) by
  normalizing inside the kernel.
  """
  from last_torch_tpu import alignments, contexts, semirings, weight_fns

  if backend not in ('tpu', 'interpret'):
    return False
  if semiring is not semirings.Log:
    return False
  if blank_mask is not None or lexical_mask is not None:
    return False
  if weight_lift is not None:
    return False
  if weight_fn is None:
    weight_fn = lattice.weight_fn
  if type(weight_fn) is not weight_fns.JointWeightFn:
    return False
  if not isinstance(lattice.context, contexts.FullNGram):
    return False
  if lattice.context.context_size != 1:
    return False
  if not isinstance(
      lattice.alignment,
      (alignments.FrameDependent, alignments.FrameLabelDependent)):
    return False
  if frames.ndim != 3:  # single batch dim only
    return False
  if backend == 'tpu' and lattice.context.shape()[1] < 64:
    # Tiny vocabularies pad to a 128-lane block; the XLA path is faster
    # there (measured: V=16 trainer step 33ms XLA vs 62ms kernels).
    return False
  if backend == 'tpu':
    # Some kernel variant must fit VMEM: the float32 exp-space cache up
    # to bigram vocab ~1500, the vocab-tiled online kernels up to ~6400
    # (hidden 512). Beyond that, fall back to XLA.
    num_states, vocab = lattice.context.shape()
    if _plan(num_states, vocab, weight_fn.hidden_size) is None:
      return False
  return True
