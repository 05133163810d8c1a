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
symbol is p (reference ``contexts.py:190-230``'s block structure). These
kernels recover the bigram design with a **segment-major state layout**:

* a static permutation groups the S = 1 + V + V^2 states into P = V + 1
  segments by last symbol — segment 0 = [start], segment p = [unigram p,
  bigram (1, p), ..., bigram (V, p)] — each padded to SEG rows
  (8-aligned, for sublane-sliceable E-cache rows);
* pass A computes the joint + heads per segment and caches
  E = exp(lex - rowmax) exactly as the bigram kernels do;
* the within-frame reduction becomes P per-segment max-shifted matvecs
  against E, producing a log-space grid red[p, y] (sources in segment p,
  next label y);
* the destination scatter is the observation that state (p, y) sits at
  layout position (segment y, row p): ``alpha'[seg y][b, p] =
  red[b, p, y]`` — a [P, V] transpose realized as V tiny basis-vector
  ``dot_general``s on the MXU (Mosaic cannot lane-index dynamically;
  -inf entries ride through a -1e30 clamp so 0 * inf never appears).

Scope: Log semiring, JointWeightFn, FullNGram(context_size=2),
FrameDependent / FrameLabelDependent, single batch dim, forward (+
history). Measured motivation: the XLA trigram scan runs 136 ms fwd+bwd
at V=64, S=4161, B=8, T=200 vs a ~7.8 ms fused matmul floor
(``benchmarks/tpu_trigram_probe.py``; ops/README.md negative-results
entry).
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

# E-cache VMEM budget (v5e: 128 MB total; leave room for inputs/buffers).
_CACHE_BUDGET = 80 * 1024 * 1024

# Measured on v5e (benchmarks/tpu_trigram_probe.py, V=64 S=4161 B=8 T=200
# k=2): the kernel pair is CORRECT on hardware (loss rel 1.3e-6, grads
# within 4.7e-4 of global gradient scale — the bf16 contract) but runs
# 189 ms vs the XLA path's 134 ms (0.71x). The cost is not FLOPs but
# iteration count: Mosaic values top out at 3-D, so every within-frame
# phase loops over the P = V+1 segments sequentially (~400-600 fori
# iterations/frame at ~1-2 us fixed cost each), and no grouping scheme
# avoids that without 4-D batched dots. The kernels therefore stay
# GATED OFF for compiled backends ('interpret' only, plus FORCE for
# benchmarking) and XLA remains the trigram production route — the
# full analysis lives in ops/README.md's negative-results entry.
FORCE = False


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


def supported(lattice, semiring, blank_mask, lexical_mask, weight_lift,
              frames, backend: str, weight_fn=None) -> bool:
  """Structural gate for the trigram forward kernel (mirrors
  ``fused_scan.supported`` with context_size == 2)."""
  from last_torch_tpu import alignments as alignments_lib
  from last_torch_tpu import contexts as contexts_lib
  from last_torch_tpu import semirings as semirings_lib
  from last_torch_tpu import weight_fns as weight_fns_lib
  if backend not in ('tpu', 'axon', 'interpret'):
    return False
  if backend != 'interpret' and not FORCE:
    return False  # measured slower than XLA on hardware; see module note
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
  if not isinstance(lattice.alignment,
                    (alignments_lib.FrameDependent,
                     alignments_lib.FrameLabelDependent)):
    return False
  if frames.ndim != 3:
    return False
  vocab = context.vocab_size
  if backend != 'interpret' and vocab < 16:
    return False  # padding waste beats the XLA path at tiny vocabularies
  _, p_segments, seg = layout(vocab)
  v_pad = _round_up(vocab, 128)
  batch = frames.shape[0]
  b_pad = _round_up(batch, 8)
  cache_bytes = p_segments * b_pad * seg * v_pad * 4
  return cache_bytes <= _CACHE_BUDGET


def _trigram_forward_kernel(
    # Inputs.
    is_pad_ref,     # [1, B_pad, 1] int32 (1 where t >= num_frames[b])
    pf_ref,         # [1, B_pad, h] projected frame
    pc_ref,         # [P * SEG, h] projected context, segment-major layout
    vw_ref,         # [h, V_pad]
    vb_ref,         # [1, V_pad]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    alpha0_ref,     # [P, B_pad, SEG]
    # Outputs.
    hist_ref,       # [1, P, B_pad, SEG] alpha before this frame
    alpha_out_ref,  # [P, B_pad, SEG]
    # Scratch.
    alpha_scr,      # [P, B_pad, SEG]
    last_scr,       # [P, B_pad, SEG] expansion intermediate (FLD)
    new_scr,        # [P, B_pad, SEG] scattered lexical destinations
    m_scr,          # [P, B_pad, SEG] per-row lexical max
    blank_scr,      # [P, B_pad, SEG]
    lex_scr,        # [P * n, V_pad] E cache, n = B_pad * SEG
    *,
    b_pad: int,
    seg: int,
    p_segments: int,
    v_pad: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
):
  t = pl.program_id(0)
  n = b_pad * seg
  prec = _mxu_precision(compute_dtype)
  f32 = jnp.float32

  @pl.when(t == 0)
  def _():
    alpha_scr[...] = alpha0_ref[...]

  hist_ref[0] = alpha_scr[...]
  pf = pf_ref[0]                              # [B_pad, h]
  vw = vw_ref[:].astype(compute_dtype)
  bw = bw_ref[:].astype(compute_dtype)

  # Pass A: per-segment joint + heads; cache E = exp(lex - rowmax).
  def pass_a(p, _):
    pc_t = pc_ref[pl.ds(p * seg, seg), :]     # [SEG, h]
    joint2d = jnp.tanh(pc_t[None, :, :] + pf[:, None, :]).astype(
        compute_dtype).reshape(n, -1)
    lex = jax.lax.dot_general(
        joint2d, vw, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    lex = lex + vb_ref[0][None, :]
    m2d = jnp.max(lex, axis=1, keepdims=True)
    lex_scr[pl.ds(p * n, n), :] = jnp.exp(lex - m2d).astype(cache_dtype)
    m_scr[p] = m2d.reshape(b_pad, seg)
    blank2d = jax.lax.dot_general(
        joint2d, bw, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    blank_scr[p] = blank2d.reshape(b_pad, seg) + bb_ref[0, 0]
    return 0

  jax.lax.fori_loop(0, p_segments, pass_a, 0)

  def read_exp(p):
    return lex_scr[pl.ds(p * n, n), :].astype(f32).reshape(
        b_pad, seg, v_pad)

  def sweep(vec_scr):
    """red3[b, p, y] = logsumexp_{s in seg p}(vec[p][b, s] + lex) then
    scatter to layout: new_scr[seg y][b, p] = red3[b, p, y]."""

    def p_body(p, red3):
      shifted = vec_scr[p] + m_scr[p]         # [B_pad, SEG]
      c = jnp.max(shifted, axis=1, keepdims=True)
      c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
      u = jnp.exp(shifted - c_safe)           # [B_pad, SEG]
      prod = jax.lax.dot_general(
          u[:, None, :], read_exp(p), (((2,), (1,)), ((0,), (0,))),
          preferred_element_type=f32)         # [B_pad, 1, V_pad]
      red_p = jnp.where(prod[:, 0, :] == 0, NEG_INF,
                        c_safe + jnp.log(prod[:, 0, :]))
      sel = jax.lax.broadcasted_iota(
          jnp.int32, (b_pad, seg, v_pad), 1) == p
      return jnp.where(sel, red_p[:, None, :], red3)

    # Rows P..SEG-1 stay -inf (layout padding positions).
    red3 = jax.lax.fori_loop(
        0, p_segments, p_body,
        jnp.full((b_pad, seg, v_pad), NEG_INF, f32))
    # -inf rides through the selection dots as -1e30 (0 * inf = NaN
    # otherwise); restored after. HIGHEST precision keeps the f32
    # pass-through exact (value * 1.0 summed with zeros).
    red3c = jnp.maximum(red3, f32(-1e30))

    def y_body(y, _):
      # Destination segment y (= label y): row p holds red3[b, p, y-1].
      # The lane pick runs on the MXU against a column-broadcast basis
      # (every output lane carries the picked value; a lane-axis max
      # collapses it) — Mosaic cannot lane-index dynamically and
      # singleton-lane squeezes relayout.
      basis = (jax.lax.broadcasted_iota(jnp.int32, (v_pad, seg), 0)
               == y - 1).astype(f32)
      picked = jax.lax.dot_general(
          red3c, basis, (((2,), (0,)), ((), ())),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)  # [B_pad, SEG, SEG]
      row = jnp.max(picked, axis=2)             # [B_pad, SEG]
      row = jnp.where(row <= f32(-1e29), NEG_INF, row)
      new_scr[y] = row
      return 0

    new_scr[0] = jnp.full((b_pad, seg), NEG_INF, f32)
    jax.lax.fori_loop(1, p_segments, y_body, 0)
    # Segments are exactly 0..V, none beyond the labels.
    return new_scr[...]

  alpha = alpha_scr[...]
  blank = blank_scr[...]
  if frame_dependent:
    alpha_new = jnp.logaddexp(alpha + blank, sweep(alpha_scr))
  else:
    acc = alpha + blank
    last = sweep(alpha_scr)
    for i in range(1, max_expansions + 1):
      acc = jnp.logaddexp(acc, last + blank)
      if i < max_expansions:
        last_scr[...] = last
        last = sweep(last_scr)
    alpha_new = acc

  # Bool minor-dim inserts are unsupported on hardware; the input is
  # staged [.., B_pad, 1] so only a (no-op) major insert is needed.
  is_pad = (is_pad_ref[0] != 0)[None]        # [1, B_pad, 1]
  alpha_new = jnp.where(is_pad, alpha, alpha_new)
  alpha_scr[...] = alpha_new
  alpha_out_ref[...] = alpha_new


def _stage_forward(wf_params, cache, frames, vocab):
  """Shared staging: padded heads, layout-permuted projected context.

  Returns (wf_params_padded, pf [T, B_pad, h], pc_l [P*SEG, h],
  rows, P, SEG, V_pad, b_pad).
  """
  batch, max_t, _ = frames.shape
  b_pad = _round_up(batch, 8)
  wf_params, v_pad = _pad_vocab(wf_params)
  rows, p_segments, seg = layout(vocab)
  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  if b_pad != batch:
    pf = jnp.pad(pf, ((0, 0), (0, b_pad - batch), (0, 0)))
  pc = cache @ wf_params['context_proj']      # [S, h]
  pc_pad = jnp.concatenate([pc, jnp.zeros_like(pc[:1])], axis=0)
  pc_l = pc_pad[jnp.asarray(rows)]            # [P*SEG, h]
  return wf_params, pf, pc_l, rows, p_segments, seg, v_pad, b_pad


def to_layout(x_std, rows, num_states, p_segments, seg, fill=NEG_INF):
  """[B, S] standard-state array -> [P, B, SEG] layout (padding=fill)."""
  b = x_std.shape[0]
  padded = jnp.concatenate(
      [x_std, jnp.full((b, 1), fill, x_std.dtype)], axis=1)
  x_l = padded[:, jnp.asarray(rows)]          # [B, P*SEG]
  return jnp.moveaxis(x_l.reshape(b, p_segments, seg), 1, 0)


def from_layout(x_l, rows, num_states):
  """[P, B, SEG] (or [..., P, B, SEG]-like with leading axes folded by
  the caller) -> [B, S] standard-state array."""
  p_segments, b, seg = x_l.shape
  flat = jnp.moveaxis(x_l, 0, 1).reshape(b, p_segments * seg)
  inv = np.full((num_states,), 0, np.int32)
  rows_np = np.asarray(rows)
  valid = rows_np < num_states
  inv[rows_np[valid]] = np.nonzero(valid)[0]
  return flat[:, jnp.asarray(inv)]


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
                                history_layout: str = 'standard'):
  """Trigram fused forward scan.

  Mirrors ``fused_scan.fused_shortest_distance_fwd`` for
  FullNGram(context_size=2). ``alpha0`` (standard [B, S] state order)
  chains blocks, e.g. for the time-sharded relay.

  Returns (log_z [B], alpha_history, final_alpha [B, S] if requested).
  ``alpha_history`` is [B, T, S] in standard state order when
  ``history_layout='standard'`` (one gather), or the raw
  [T, P, B_pad, SEG] layout when 'layout' (for in-layout consumers),
  or None when ``with_history=False``.
  """
  batch, max_t, _ = frames.shape
  num_states = 1 + vocab + vocab * vocab
  num_frames = jnp.asarray(num_frames, jnp.int32)
  (wf_params, pf, pc_l, rows, p_segments, seg, v_pad,
   b_pad) = _stage_forward(wf_params, cache, frames, vocab)
  hidden = pc_l.shape[-1]
  n = b_pad * seg

  is_pad = (jnp.arange(max_t)[:, None] >= num_frames[None, :]).astype(
      jnp.int32)
  if b_pad != batch:
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  is_pad = is_pad.reshape(max_t, b_pad, 1)

  if alpha0 is None:
    a0 = jnp.full((b_pad, p_segments * seg), NEG_INF, jnp.float32)
    a0 = a0.at[:, 0].set(0.0)  # layout row (0, 0) = start state
    alpha0_l = jnp.moveaxis(a0.reshape(b_pad, p_segments, seg), 1, 0)
  else:
    alpha0_p = jnp.pad(jnp.asarray(alpha0, jnp.float32),
                       ((0, b_pad - batch), (0, 0)),
                       constant_values=NEG_INF)
    alpha0_l = to_layout(alpha0_p, rows, num_states, p_segments, seg)

  kernel = functools.partial(
      _trigram_forward_kernel,
      b_pad=b_pad,
      seg=seg,
      p_segments=p_segments,
      v_pad=v_pad,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype)

  hist, alpha_t = pl.pallas_call(
      kernel,
      grid=(max_t,),
      in_specs=[
          pl.BlockSpec((1, b_pad, 1), lambda t: (t, 0, 0)),
          pl.BlockSpec((1, b_pad, hidden), lambda t: (t, 0, 0)),
          pl.BlockSpec((p_segments * seg, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((hidden, 1), lambda t: (0, 0)),
          pl.BlockSpec((1, 1), lambda t: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((p_segments, b_pad, seg), lambda t: (0, 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, p_segments, b_pad, seg),
                       (lambda t: (t, 0, 0, 0)) if with_history else
                       (lambda t: (0, 0, 0, 0))),
          pl.BlockSpec((p_segments, b_pad, seg), lambda t: (0, 0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct(
              (max_t if with_history else 1, p_segments, b_pad, seg),
              jnp.float32),
          jax.ShapeDtypeStruct((p_segments, b_pad, seg), jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((p_segments, b_pad, seg), jnp.float32),
          pltpu.VMEM((p_segments, b_pad, seg), jnp.float32),
          pltpu.VMEM((p_segments, b_pad, seg), jnp.float32),
          pltpu.VMEM((p_segments, b_pad, seg), jnp.float32),
          pltpu.VMEM((p_segments, b_pad, seg), jnp.float32),
          pltpu.VMEM((p_segments * n, v_pad), cache_dtype),
      ],
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(is_pad, pf, pc_l, wf_params['vocab_w'],
    wf_params['vocab_b'][None, :], wf_params['blank_w'][:, None],
    wf_params['blank_b'][None, None], alpha0_l)

  final_std = from_layout(alpha_t, rows, num_states)[:batch]
  log_z = jax.scipy.special.logsumexp(final_std, axis=-1)
  if not with_history:
    alpha_history = None
  elif history_layout == 'layout':
    alpha_history = hist
  else:
    # [T, P, B_pad, SEG] -> [B, T, S] standard order.
    flat = jnp.moveaxis(hist, 2, 1).reshape(
        max_t, b_pad, p_segments * seg)
    inv = np.full((num_states,), 0, np.int32)
    rows_np = np.asarray(rows)
    valid = rows_np < num_states
    inv[rows_np[valid]] = np.nonzero(valid)[0]
    alpha_history = jnp.moveaxis(
        flat[:, :batch, :][..., jnp.asarray(inv)], 0, 1)
  if return_final_alpha:
    return log_z, alpha_history, final_std
  return log_z, alpha_history


def _trigram_backward_kernel(
    # Inputs (time-reversed index maps: grid step t handles frame T-1-t).
    is_pad_ref,     # [1, B_pad, 1] int32
    logz_ref,       # [B_pad, 1] f32
    g_ref,          # [B_pad, 1] f32 cotangent of log_z
    pf_ref,         # [1, B_pad, h]
    pc_ref,         # [P * SEG, h]
    vw_ref,         # [h, V_pad]
    vb_ref,         # [1, V_pad]
    bw_ref,         # [h, 1]
    bwt_ref,        # [1, h]
    bb_ref,         # [1, 1] SMEM
    hist_ref,       # [1, P, B_pad, SEG] alpha before this frame (layout)
    beta0_ref,      # [P, B_pad, SEG] beta seed at the last frame
    # Outputs.
    dpf_ref,        # [1, B_pad, h]
    dpc_ref,        # [P * SEG, h]
    dvw_ref,        # [h, V_pad]
    dvb_ref,        # [1, V_pad]
    dbw_ref,        # [1, h]
    dbb_ref,        # [1, 1] SMEM
    beta_out_ref,   # [P, B_pad, SEG] beta after the first frame
    # Scratch.
    beta_scr,       # [P, B_pad, SEG] f32 carry
    m_scr,          # [P, B_pad, SEG]
    blank_scr,      # [P, B_pad, SEG]
    lex_scr,        # [P * n, V_pad] E cache
    vec_scr,        # [P, B_pad, SEG] sweep input staging
    new_scr,        # [P, B_pad, SEG] sweep output staging
    nb2_scr,        # [P * B_pad, SEG] nb chain, 2-D for the MXU pick
    lse_scr,        # [P, B_pad, SEG] lse_y output staging
    dpc_scr,        # [P * SEG, h]
    dvw_scr,        # [h, V_pad]
    dvb_scr,        # [1, V_pad]
    dbw_scr,        # [1, h]
    dbb_scr,        # [1, 1] SMEM
    *a_pair_scr,    # num_pairs x [P, B_pad, SEG] alpha replay values,
                    # then num_pairs x [P * B_pad, SEG] nb pair copies
    b_pad: int,
    seg: int,
    p_segments: int,
    v_pad: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    cache_dtype,
):
  """Reverse (beta) scan for the trigram lattice.

  The bigram backward's within-frame machinery carries over; the trigram
  twist is the beta-transpose: the beta recursion for a source in
  segment p needs ``Bt_p[b, y] = nb[segment y][b, p]`` — realized on the
  MXU as a basis-vector column pick from a 2-D [P*B, SEG] copy of nb
  plus one transposed-contraction against a shift matrix (Mosaic cannot
  lane-index dynamically). All -inf values ride the picks as -1e30
  clamps (restored after) so 0 * inf never appears.
  """
  t = pl.program_id(0)
  n = b_pad * seg
  num_pairs = 1 if frame_dependent else max_expansions
  a_pairs = a_pair_scr[:num_pairs]
  nb_pairs = a_pair_scr[num_pairs:]
  prec = _mxu_precision(compute_dtype)
  f32 = jnp.float32
  big_neg = f32(-1e30)

  @pl.when(t == 0)
  def _():
    beta_scr[...] = beta0_ref[...]

  @pl.when(t == 0)
  def _():
    dpc_scr[...] = jnp.zeros(dpc_scr.shape, f32)
    dvw_scr[...] = jnp.zeros(dvw_scr.shape, f32)
    dvb_scr[...] = jnp.zeros(dvb_scr.shape, f32)
    dbw_scr[...] = jnp.zeros(dbw_scr.shape, f32)
    dbb_scr[0, 0] = 0.0

  pf = pf_ref[0]                              # [B_pad, h]
  log_z = logz_ref[...]                       # [B_pad, 1]
  pad = is_pad_ref[0] != 0                    # [B_pad, 1]
  g_eff = jnp.where(pad, 0.0, g_ref[...])     # [B_pad, 1]
  vw_c = vw_ref[:].astype(compute_dtype)
  bw_c = bw_ref[:].astype(compute_dtype)

  # Layout-validity mask per (segment row): real rows are j == 0 for
  # segment 0 and j < P for segments >= 1. Blank at padding rows must be
  # semiring-dead or the beta recursion grows them without bound (see
  # the bigram kernel's guard comment).
  col = jax.lax.broadcasted_iota(jnp.int32, (p_segments, 1, seg), 2)
  seg_idx = jax.lax.broadcasted_iota(jnp.int32, (p_segments, 1, seg), 0)
  valid = col < jnp.where(seg_idx == 0, 1, p_segments)

  # Pass A: recompute E, m, blank per segment.
  def pass_a(p, _):
    pc_t = pc_ref[pl.ds(p * seg, seg), :]
    joint2d = jnp.tanh(pc_t[None, :, :] + pf[:, None, :]).astype(
        compute_dtype).reshape(n, -1)
    lex = jax.lax.dot_general(
        joint2d, vw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    lex = lex + vb_ref[0][None, :]
    m2d = jnp.max(lex, axis=1, keepdims=True)
    lex_scr[pl.ds(p * n, n), :] = jnp.exp(lex - m2d).astype(cache_dtype)
    m_scr[p] = m2d.reshape(b_pad, seg)
    blank2d = jax.lax.dot_general(
        joint2d, bw_c, (((1,), (0,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    blank_scr[p] = blank2d.reshape(b_pad, seg) + bb_ref[0, 0]
    return 0

  jax.lax.fori_loop(0, p_segments, pass_a, 0)
  blank = jnp.where(valid, blank_scr[...], NEG_INF)  # [P, B_pad, SEG]

  def read_exp(p):
    return lex_scr[pl.ds(p * n, n), :].astype(f32).reshape(
        b_pad, seg, v_pad)

  def sweep_from(vec_scr_ref):
    """Lexical-destination scatter (same as the forward kernel)."""

    def p_body(p, red3):
      shifted = vec_scr_ref[p] + m_scr[p]
      c = jnp.max(shifted, axis=1, keepdims=True)
      c_safe = jnp.where(jnp.isfinite(c), c, 0.0)
      u = jnp.exp(shifted - c_safe)
      prod = jax.lax.dot_general(
          u[:, None, :], read_exp(p), (((2,), (1,)), ((0,), (0,))),
          preferred_element_type=f32)
      red_p = jnp.where(prod[:, 0, :] == 0, NEG_INF,
                        c_safe + jnp.log(prod[:, 0, :]))
      sel = jax.lax.broadcasted_iota(
          jnp.int32, (b_pad, seg, v_pad), 1) == p
      return jnp.where(sel, red_p[:, None, :], red3)

    red3 = jax.lax.fori_loop(
        0, p_segments, p_body,
        jnp.full((b_pad, seg, v_pad), NEG_INF, f32))
    red3c = jnp.maximum(red3, big_neg)

    def y_body(y, _):
      basis = (jax.lax.broadcasted_iota(jnp.int32, (v_pad, seg), 0)
               == y - 1).astype(f32)
      picked = jax.lax.dot_general(
          red3c, basis, (((2,), (0,)), ((), ())),
          preferred_element_type=f32,
          precision=jax.lax.Precision.HIGHEST)
      row = jnp.max(picked, axis=2)
      new_scr[y] = jnp.where(row <= f32(-1e29), NEG_INF, row)
      return 0

    new_scr[0] = jnp.full((b_pad, seg), NEG_INF, f32)
    jax.lax.fori_loop(1, p_segments, y_body, 0)
    return new_scr[...]

  def store_nb(nb, ref2d):
    """[P, B_pad, SEG] value -> 2-D [P*B_pad, SEG] scratch (per segment:
    values cannot be dynamically leading-indexed, scratches can)."""
    vec_scr[...] = nb

    def y_body(y, _):
      ref2d[pl.ds(y * b_pad, b_pad), :] = vec_scr[y]
      return 0

    jax.lax.fori_loop(0, p_segments, y_body, 0)

  # Shift matrix: SH[y, v] = 1 iff v == y - 1 (segment y's beta feeds
  # label lane y - 1); segment 0 contributes nowhere.
  sh = (jax.lax.broadcasted_iota(jnp.int32, (p_segments, v_pad), 0) ==
        jax.lax.broadcasted_iota(jnp.int32, (p_segments, v_pad), 1) + 1
        ).astype(f32)

  def beta_transpose(nb2_ref, p):
    """Bt_p[b, y] = nb[segment y+1][b, p] from the 2-D nb copy."""
    m2 = jnp.maximum(nb2_ref[...], big_neg)   # [P*B_pad, SEG]
    basis_p = (jax.lax.broadcasted_iota(jnp.int32, (seg, 8), 0)
               == p).astype(f32)
    colw = jax.lax.dot_general(
        m2, basis_p, (((1,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)  # [P*B_pad, 8]
    colp = jnp.max(colw.reshape(p_segments, b_pad, 8), axis=2)
    bt = jax.lax.dot_general(
        jnp.maximum(colp, big_neg), sh, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
        precision=jax.lax.Precision.HIGHEST)  # [B_pad, V_pad]
    return jnp.where(bt <= f32(-1e29), NEG_INF, bt)

  def lse_y(nb2_ref):
    """out[p][b, s] = logsumexp_y(lex[p][b, s, y] + Bt_p[b, y])."""

    def p_body(p, _):
      bt = beta_transpose(nb2_ref, p)         # [B_pad, V_pad]
      d = jnp.max(bt, axis=1, keepdims=True)
      d_safe = jnp.where(jnp.isfinite(d), d, 0.0)
      v = jnp.exp(bt - d_safe)[:, None, :]    # [B_pad, 1, V_pad]
      w = jax.lax.dot_general(
          v, read_exp(p), (((2,), (2,)), ((0,), (0,))),
          preferred_element_type=f32)         # [B_pad, 1, SEG]
      w2 = w[:, 0, :]
      lse_scr[p] = jnp.where(w2 == 0, NEG_INF,
                             m_scr[p] + d_safe + jnp.log(w2))
      return 0

    jax.lax.fori_loop(0, p_segments, p_body, 0)
    return lse_scr[...]

  alpha = hist_ref[0]                         # [P, B_pad, SEG]
  beta = beta_scr[...]
  lz = log_z[None, :, :]                      # [1, B_pad, 1]
  ge = g_eff[None, :, :]

  if frame_dependent:
    a_pairs[0][...] = alpha
    store_nb(beta, nb_pairs[0])
    bm_total = jnp.exp(alpha + blank + beta - lz)
    final_nb = jnp.logaddexp(blank + beta, lse_y(nb_pairs[0]))
  else:
    k = max_expansions
    a_list = [alpha]
    vec_scr[...] = alpha
    for _ in range(k - 1):
      nxt = sweep_from(vec_scr)
      a_list.append(nxt)
      vec_scr[...] = nxt
    if k >= 1:
      a_list.append(sweep_from(vec_scr))
    bm_total = jnp.zeros((p_segments, b_pad, seg), f32)
    for j in range(k + 1):
      bm_total = bm_total + jnp.exp(a_list[j] + blank + beta - lz)
    nb = blank + beta
    for i in range(k):
      j = k - 1 - i
      a_pairs[i][...] = a_list[j]
      store_nb(nb, nb_pairs[i])
      nb = jnp.logaddexp(blank + beta, lse_y(nb_pairs[i]))
    final_nb = nb

  d_blank_all = ge * bm_total                 # [P, B_pad, SEG]
  vec_scr[...] = d_blank_all

  # Marginal + gradient pass, per segment.
  def marg_body(p, dpf_acc):
    pc_t = pc_ref[pl.ds(p * seg, seg), :]
    joint = jnp.tanh(pc_t[None, :, :] + pf[:, None, :])  # [B_pad, SEG, h]
    joint3_c = joint.astype(compute_dtype)
    exp_t = read_exp(p)                       # [B_pad, SEG, V_pad]
    lm = jnp.zeros_like(exp_t)
    for i in range(num_pairs):
      a_t = a_pairs[i][p]                     # [B_pad, SEG]
      shifted = a_t + m_scr[p]
      a_max = jnp.max(shifted, axis=1, keepdims=True)
      a_max = jnp.where(jnp.isfinite(a_max), a_max, 0.0)
      ws = jnp.exp(shifted - a_max)           # [B_pad, SEG]
      bt = beta_transpose(nb_pairs[i], p)     # [B_pad, V_pad]
      wy = jnp.exp(jnp.minimum(bt + a_max - log_z, 80.0))
      lm = lm + exp_t * ws[:, :, None] * wy[:, None, :]
    d_lex3 = (g_eff[:, :, None] * lm).astype(compute_dtype)
    d_blank3 = vec_scr[p][:, :, None]         # [B_pad, SEG, 1]
    dvw_scr[...] += jnp.sum(
        jax.lax.dot_general(
            joint3_c, d_lex3, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=prec), axis=0)
    dvb_scr[...] += jnp.sum(
        d_lex3.astype(f32), axis=(0, 1), keepdims=True)[0]
    dbw_scr[...] += jnp.sum(joint * d_blank3, axis=(0, 1), keepdims=True)[0]
    dbb_scr[0, 0] += jnp.sum(d_blank3)
    d_joint3 = jax.lax.dot_general(
        d_lex3, vw_c, (((2,), (1,)), ((), ())),
        preferred_element_type=f32, precision=prec)
    d_joint3 = d_joint3 + d_blank3 * bwt_ref[:][None, :, :]
    d_pre = d_joint3 * (1.0 - joint * joint)
    dpc_scr[pl.ds(p * seg, seg), :] += jnp.sum(d_pre, axis=0)
    return dpf_acc + jnp.sum(d_pre, axis=1)

  dpf_acc = jax.lax.fori_loop(
      0, p_segments, marg_body, jnp.zeros((b_pad, pf.shape[-1]), f32))

  dpf_ref[0] = dpf_acc
  nb_eff = jnp.where(pad[None], beta, final_nb)
  beta_scr[...] = nb_eff
  beta_out_ref[...] = jnp.where(valid, nb_eff, NEG_INF)

  @pl.when(t == pl.num_programs(0) - 1)
  def _():
    dpc_ref[...] = dpc_scr[...]
    dvw_ref[...] = dvw_scr[...]
    dvb_ref[...] = dvb_scr[...]
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
                       beta0=None):
  """Trigram fused backward over one frame block.

  Mirrors ``fused_scan.run_fused_backward``; ``alpha_history_layout`` is
  the [T, P, B_pad, SEG] layout-form history from
  ``fused_shortest_distance_fwd(..., history_layout='layout')``.

  Returns (d_wf_params, d_cache, d_frames, beta_out [B, S] standard).
  """
  batch, max_t, _ = frames.shape
  num_states = 1 + vocab + vocab * vocab
  num_frames = jnp.asarray(num_frames, jnp.int32)
  true_vocab = vocab
  (wf_params_p, pf, pc_l, rows, p_segments, seg, v_pad,
   b_pad) = _stage_forward(wf_params, cache, frames, vocab)
  hidden = pc_l.shape[-1]
  n = b_pad * seg
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
    beta0_l = jnp.zeros((p_segments, b_pad, seg), jnp.float32)
  else:
    beta0_p = jnp.pad(jnp.asarray(beta0, jnp.float32),
                      ((0, b_pad - batch), (0, 0)),
                      constant_values=NEG_INF)
    beta0_l = to_layout(beta0_p, rows, num_states, p_segments, seg)

  kernel = functools.partial(
      _trigram_backward_kernel,
      b_pad=b_pad,
      seg=seg,
      p_segments=p_segments,
      v_pad=v_pad,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      cache_dtype=cache_dtype)

  rev = lambda t: max_t - 1 - t
  layout_scr = pltpu.VMEM((p_segments, b_pad, seg), jnp.float32)
  (dpf, dpc_l, dvw, dvb, dbw, dbb, beta_out_l) = pl.pallas_call(
      kernel,
      grid=(max_t,),
      in_specs=[
          pl.BlockSpec((1, b_pad, 1), lambda t: (rev(t), 0, 0)),
          pl.BlockSpec((b_pad, 1), lambda t: (0, 0)),
          pl.BlockSpec((b_pad, 1), lambda t: (0, 0)),
          pl.BlockSpec((1, b_pad, hidden), lambda t: (rev(t), 0, 0)),
          pl.BlockSpec((p_segments * seg, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((hidden, 1), lambda t: (0, 0)),
          pl.BlockSpec((1, hidden), lambda t: (0, 0)),
          pl.BlockSpec((1, 1), lambda t: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((1, p_segments, b_pad, seg),
                       lambda t: (rev(t), 0, 0, 0)),
          pl.BlockSpec((p_segments, b_pad, seg), lambda t: (0, 0, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, b_pad, hidden), lambda t: (rev(t), 0, 0)),
          pl.BlockSpec((p_segments * seg, hidden), lambda t: (0, 0)),
          pl.BlockSpec((hidden, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, v_pad), lambda t: (0, 0)),
          pl.BlockSpec((1, hidden), lambda t: (0, 0)),
          pl.BlockSpec((1, 1), lambda t: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((p_segments, b_pad, seg), lambda t: (0, 0, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((max_t, b_pad, hidden), jnp.float32),
          jax.ShapeDtypeStruct((p_segments * seg, hidden), jnp.float32),
          jax.ShapeDtypeStruct((hidden, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, v_pad), jnp.float32),
          jax.ShapeDtypeStruct((1, hidden), jnp.float32),
          jax.ShapeDtypeStruct((1, 1), jnp.float32),
          jax.ShapeDtypeStruct((p_segments, b_pad, seg), jnp.float32),
      ],
      scratch_shapes=(
          [layout_scr, layout_scr, layout_scr,
           pltpu.VMEM((p_segments * n, v_pad), cache_dtype),
           layout_scr, layout_scr,
           pltpu.VMEM((p_segments * b_pad, seg), jnp.float32),
           layout_scr,
           pltpu.VMEM((p_segments * seg, hidden), jnp.float32),
           pltpu.VMEM((hidden, v_pad), jnp.float32),
           pltpu.VMEM((1, v_pad), jnp.float32),
           pltpu.VMEM((1, hidden), jnp.float32),
           pltpu.SMEM((1, 1), jnp.float32)] +
          [layout_scr for _ in range(num_pairs)] +
          [pltpu.VMEM((p_segments * b_pad, seg), jnp.float32)
           for _ in range(num_pairs)]),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=110 * 1024 * 1024),
      interpret=interpret,
  )(is_pad, logz_b, g_b, pf, pc_l, wf_params_p['vocab_w'],
    wf_params_p['vocab_b'][None, :], wf_params_p['blank_w'][:, None],
    wf_params_p['blank_w'][None, :], wf_params_p['blank_b'][None, None],
    alpha_history_layout, beta0_l)

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
  beta_out = from_layout(beta_out_l, rows, num_states)[:batch]
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

  def run_forward(wf_params, cache, frames, num_frames):
    return fused_shortest_distance_fwd(
        wf_params, cache, frames, num_frames,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        vocab=vocab,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        interpret=interpret,
        history_layout='layout')

  @jax.custom_vjp
  def fn(wf_params, cache, frames, num_frames):
    log_z, _ = run_forward(wf_params, cache, frames, num_frames)
    return log_z

  def fn_fwd(wf_params, cache, frames, num_frames):
    log_z, hist = run_forward(wf_params, cache, frames, num_frames)
    return log_z, (wf_params, cache, frames, num_frames, log_z, hist)

  def fn_bwd(residuals, g):
    wf_params, cache, frames, num_frames, log_z, hist = residuals
    d_wf, d_cache, d_frames, _ = run_fused_backward(
        wf_params, cache, frames, num_frames, log_z, g, hist,
        max_expansions=max_expansions,
        frame_dependent=frame_dependent,
        vocab=vocab,
        compute_dtype=compute_dtype,
        cache_dtype=cache_dtype,
        interpret=interpret)
    return (d_wf, d_cache, d_frames,
            np.zeros(num_frames.shape, jax.dtypes.float0))

  fn.defvjp(fn_fwd, fn_bwd)
  return fn(wf_params, cache, frames, num_frames)
