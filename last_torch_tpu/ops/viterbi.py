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

"""Fused tropical (Viterbi) forward kernel + gather-only backtrace.

The XLA decode path differentiates the MaxTropical shortest distance
(reference ``lattices.py:219-247``), which re-runs the weight matmuls in the
tropical backward pass. Here the forward Viterbi scan runs as a Mosaic
kernel (same structure as ``fused_scan._fused_forward_kernel`` but with
running-max reductions and argmax tracking), emitting per-frame backtrace
tables; the backtrace itself is then a cheap reverse ``lax.scan`` of pure
gathers — no second pass over the weights.

Scope matches ``fused_scan.supported``: MaxTropical over a bigram FullNGram
with JointWeightFn and FrameDependent / FrameLabelDependent.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float('-inf')


def _round_up(x: int, m: int) -> int:
  return (x + m - 1) // m * m


def _viterbi_forward_kernel(
    # Inputs.
    is_pad_ref,     # [1, 1, 1, Bt] int32
    pf_ref,         # [1, Bt, h]
    pc_ref,         # [S_pad, h]
    vw_ref,         # [h, V]
    vb_ref,         # [1, V]
    bw_ref,         # [h, 1]
    bb_ref,         # [1, 1] SMEM
    alpha0_ref,     # [Bt, S_pad]
    # Outputs.
    arg_ref,        # [1, 1, K, Bt, V] int32: best source per (expansion, y)
    jstar_ref,      # [1, Bt, S_pad] int32: best expansion count per state
    alpha_out_ref,  # [Bt, S_pad]
    # Scratch.
    alpha_scr,      # [B_pad, S_pad] f32
    vec_scr,        # [NS, Bt, s_tile] f32 max-pass input tiles
    blank_scr,      # [NS, Bt, s_tile] f32
    m_scr,          # [Bt, V] f32 running max over state tiles
    argm_scr,       # [Bt, V] i32 running argmax
    lex_scr=None,   # [Bt * S_pad, V] f32 — per-frame lexical-score cache,
                    # only allocated when >= 2 max-passes run per frame
                    # and it fits VMEM; recomputed otherwise.
    *,
    batch_tile: int,
    s_tile: int,
    num_s_tiles: int,
    max_expansions: int,
    frame_dependent: bool,
    compute_dtype,
    normalize: str = 'none',
):
  t = pl.program_id(0)
  b = pl.program_id(1)
  b_start = b * batch_tile
  vocab = vw_ref.shape[-1]

  @pl.when(t == 0)
  def _():
    alpha_scr[pl.ds(b_start, batch_tile), :] = alpha0_ref[:]

  alpha = alpha_scr[pl.ds(b_start, batch_tile), :]  # [Bt, S_pad]
  pf = pf_ref[0]
  vw = vw_ref[:].astype(compute_dtype)
  bw = bw_ref[:].astype(compute_dtype)

  def tile_joint(i):
    pc_t = pc_ref[pl.ds(i * s_tile, s_tile), :]
    joint = jnp.tanh(pc_t[None, :, :] + pf[:, None, :])
    return joint.astype(compute_dtype).reshape(batch_tile * s_tile, -1)

  def max_pass(in_vec, first_pass):
    """red[b, y], arg[b, y] = max/argmax_s(in_vec[b, s] + lex[b, s, y]).

    A fori_loop over state tiles (see the spill-slot note in
    ``fused_scan._online_forward_kernel``): the first pass of a frame
    computes the lexical scores on the MXU (and the blank head, stored
    tile-major in ``blank_scr``); when ``lex_scr`` is allocated it also
    fills the VMEM cache, which later passes of the same frame read back
    instead of re-running tanh + matmul (2-D cache layout, split-reshaped
    after the read — Mosaic cannot reduce over axis 1 of a 3-D scratch
    read). The running (max, argmax) accumulators live in scratch; the
    vocab axis is NOT tiled, so each is one [Bt, V] block.
    """
    for i in range(num_s_tiles):  # scatter: small static lane slices
      vec_scr[i] = jax.lax.slice_in_dim(in_vec, i * s_tile,
                                        (i + 1) * s_tile, axis=1)
    m_scr[:] = jnp.full((batch_tile, vocab), NEG_INF, jnp.float32)
    argm_scr[:] = jnp.zeros((batch_tile, vocab), jnp.int32)

    def body(i, _):
      rows = pl.ds(i * batch_tile * s_tile, batch_tile * s_tile)
      if first_pass or lex_scr is None:
        joint2d = tile_joint(i)
        lex2d = jax.lax.dot_general(
            joint2d, vw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + vb_ref[0][None, :]
        blank2d = None
        if first_pass or normalize != 'none':
          blank2d = jax.lax.dot_general(
              joint2d, bw, (((1,), (0,)), ((), ())),
              preferred_element_type=jnp.float32) + bb_ref[0, 0]  # [N, 1]
        # Local normalization is tile-local: the vocab axis is not tiled,
        # so each row's normalizer is fully visible here. Padded vocab
        # columns carry a -inf bias and add exp(-inf) = 0 mass.
        if normalize == 'hat':
          mrow = jnp.max(lex2d, axis=-1, keepdims=True)
          lse = mrow + jnp.log(jnp.sum(jnp.exp(lex2d - mrow), axis=-1,
                                       keepdims=True))
          lex2d = lex2d - lse - jax.nn.softplus(blank2d)
          blank2d = -jax.nn.softplus(-blank2d)
        elif normalize == 'log_softmax':
          mrow = jnp.maximum(jnp.max(lex2d, axis=-1, keepdims=True),
                             blank2d)
          z = mrow + jnp.log(
              jnp.exp(blank2d - mrow) +
              jnp.sum(jnp.exp(lex2d - mrow), axis=-1, keepdims=True))
          lex2d = lex2d - z
          blank2d = blank2d - z
        if first_pass and lex_scr is not None:
          lex_scr[rows, :] = lex2d
        if first_pass:
          blank_scr[i] = blank2d.reshape(batch_tile, s_tile)
      else:
        lex2d = lex_scr[rows, :]
      lex = lex2d.reshape(batch_tile, s_tile, -1)
      vec_t = vec_scr[i]
      chunk = vec_t[:, :, None] + lex
      tile_max = jnp.max(chunk, axis=1)
      tile_arg = jnp.argmax(chunk, axis=1).astype(jnp.int32) + i * s_tile
      m_old = m_scr[:, :]
      better = tile_max > m_old
      m_scr[:, :] = jnp.where(better, tile_max, m_old)
      argm_scr[:, :] = jnp.where(better, tile_arg, argm_scr[:, :])
      return 0

    jax.lax.fori_loop(0, num_s_tiles, body, 0)
    return m_scr[:, :], argm_scr[:, :]

  def expand(red):
    s_pad = alpha.shape[-1]
    pad_cols = jnp.full((batch_tile, s_pad - 1 - vocab), NEG_INF,
                        jnp.float32)
    start_col = jnp.full((batch_tile, 1), NEG_INF, jnp.float32)
    return jnp.concatenate([start_col, red, pad_cols], axis=1)

  red, arg = max_pass(alpha, True)
  blank = jnp.concatenate([blank_scr[i] for i in range(num_s_tiles)],
                          axis=-1)  # [Bt, S_pad]
  arg_ref[0, 0, 0] = arg

  if frame_dependent:
    # One blank-or-lexical arc per frame: jstar 0 = blank (stay), 1 = the
    # lexical arc into this state.
    stay = alpha + blank
    move = expand(red)
    alpha_new = jnp.maximum(stay, move)
    jstar = (move > stay).astype(jnp.int32)
  else:
    # Up to k lexical arcs then a blank; jstar = winning expansion count.
    acc = alpha + blank
    jstar = jnp.zeros_like(alpha, dtype=jnp.int32)
    last = expand(red)
    for j in range(1, max_expansions + 1):
      cand = last + blank
      better = cand > acc
      acc = jnp.where(better, cand, acc)
      jstar = jnp.where(better, j, jstar)
      if j < max_expansions:
        red, arg = max_pass(last, False)
        arg_ref[0, 0, j] = arg
        last = expand(red)
    alpha_new = acc

  is_pad = is_pad_ref[0, 0, 0, :][:, None] != 0
  alpha_new = jnp.where(is_pad, alpha, alpha_new)
  jstar = jnp.where(is_pad, 0, jstar)
  jstar_ref[0] = jstar
  alpha_scr[pl.ds(b_start, batch_tile), :] = alpha_new
  alpha_out_ref[:] = alpha_new


def viterbi_decode(wf_params: Any,
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
                   normalize: str = 'none',
                   interpret: bool = False):
  """Kernel Viterbi forward + gather-only backtrace.

  Returns (alignment_labels, num_alignment_labels, path_weights) with the
  same contract as ``RecognitionLattice.shortest_path``.
  """
  from last_torch_tpu.ops import fused_scan

  num_frames = jnp.asarray(num_frames, jnp.int32)
  batch, max_t, _ = frames.shape
  true_vocab = wf_params['vocab_w'].shape[-1]
  s = num_context_states
  assert s == true_vocab + 1, 'viterbi kernel requires bigram FullNGram'
  wf_params, vocab = fused_scan._pad_vocab(wf_params)
  # Fewer, larger reduction tiles when the padded state count allows.
  if s_tile == 128 and _round_up(max(s, 1 + vocab), 128) % 384 == 0:
    s_tile = 384
  s_pad = _round_up(max(s, 1 + vocab), s_tile)
  if not batch_tile:
    # Size the batch tile so the per-frame lexical cache ([Bt * S_pad, V]
    # f32) stays within ~80MB of VMEM (16 rows at the headline config —
    # measured ~5% faster than 8 on v5e; 32 does not compile). The
    # normalized variants carry extra row-normalizer temporaries in the
    # loop body (~25MB at 16 rows), so they cap at 8 rows — 16 exceeds
    # the scoped-VMEM limit at the headline config.
    cap = 8 if normalize != 'none' else 16
    cache_bytes = s_pad * vocab * 4
    batch_tile = max(8, min(cap, (80 * 1024 * 1024) // max(cache_bytes, 1)
                            // 8 * 8))
    # Never pad a small batch up to the tile: cap at the 8-row-aligned
    # true batch so e.g. B=4 runs one 8-row tile, not a 16-row one.
    batch_tile = min(batch_tile, _round_up(batch, 8))
  b_pad = _round_up(batch, batch_tile)
  num_b_tiles = b_pad // batch_tile
  num_s_tiles = s_pad // s_tile
  num_align = 1 if frame_dependent else max_expansions + 1
  k_tables = 1 if frame_dependent else max(max_expansions, 1)

  pf = jnp.einsum('btf,fh->tbh', frames, wf_params['frame_proj'],
                  preferred_element_type=jnp.float32)
  pc = jnp.pad(cache @ wf_params['context_proj'], ((0, s_pad - s), (0, 0)))
  hidden = pc.shape[-1]
  is_pad = (jnp.arange(max_t)[:, None] >= num_frames[None, :]).astype(
      jnp.int32)
  if b_pad != batch:
    pf = jnp.pad(pf, ((0, 0), (0, b_pad - batch), (0, 0)))
    is_pad = jnp.pad(is_pad, ((0, 0), (0, b_pad - batch)),
                     constant_values=1)
  is_pad4 = is_pad.reshape(max_t, num_b_tiles, 1, batch_tile)
  alpha0 = jnp.full((b_pad, s_pad), NEG_INF, jnp.float32)
  alpha0 = alpha0.at[:, 0].set(0.0)

  kernel = functools.partial(
      _viterbi_forward_kernel,
      batch_tile=batch_tile,
      s_tile=s_tile,
      num_s_tiles=num_s_tiles,
      max_expansions=max_expansions,
      frame_dependent=frame_dependent,
      compute_dtype=compute_dtype,
      normalize=normalize)

  args_tbl, jstar_tbl, alpha_t = pl.pallas_call(
      kernel,
      grid=(max_t, num_b_tiles),
      in_specs=[
          pl.BlockSpec((1, 1, 1, batch_tile), lambda t, b: (t, b, 0, 0)),
          pl.BlockSpec((1, batch_tile, hidden), lambda t, b: (t, b, 0)),
          pl.BlockSpec((s_pad, hidden), lambda t, b: (0, 0)),
          pl.BlockSpec((hidden, vocab), lambda t, b: (0, 0)),
          pl.BlockSpec((1, vocab), lambda t, b: (0, 0)),
          pl.BlockSpec((hidden, 1), lambda t, b: (0, 0)),
          pl.BlockSpec((1, 1), lambda t, b: (0, 0),
                       memory_space=pltpu.SMEM),
          pl.BlockSpec((batch_tile, s_pad), lambda t, b: (b, 0)),
      ],
      out_specs=[
          pl.BlockSpec((1, 1, k_tables, batch_tile, vocab),
                       lambda t, b: (t, b, 0, 0, 0)),
          pl.BlockSpec((1, batch_tile, s_pad), lambda t, b: (t, b, 0)),
          pl.BlockSpec((batch_tile, s_pad), lambda t, b: (b, 0)),
      ],
      out_shape=[
          jax.ShapeDtypeStruct(
              (max_t, num_b_tiles, k_tables, batch_tile, vocab), jnp.int32),
          jax.ShapeDtypeStruct((max_t, b_pad, s_pad), jnp.int32),
          jax.ShapeDtypeStruct((b_pad, s_pad), jnp.float32),
      ],
      scratch_shapes=[
          pltpu.VMEM((b_pad, s_pad), jnp.float32),
          pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
          pltpu.VMEM((num_s_tiles, batch_tile, s_tile), jnp.float32),
          pltpu.VMEM((batch_tile, vocab), jnp.float32),
          pltpu.VMEM((batch_tile, vocab), jnp.int32),
      ] + (
          # Lexical-score cache pays off only when a frame runs >= 2
          # max-passes (FrameLabelDependent with k >= 2) — and only when
          # it fits VMEM; large vocabularies recompute instead
          # (max_pass handles lex_scr=None).
          [pltpu.VMEM((batch_tile * s_pad, vocab), jnp.float32)]
          if (not frame_dependent and max_expansions >= 2 and
              batch_tile * s_pad * vocab * 4 <= fused_scan._CACHE_BUDGET)
          else []),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
      interpret=interpret,
  )(is_pad4, pf, pc, wf_params['vocab_w'], wf_params['vocab_b'][None, :],
    wf_params['blank_w'][:, None], wf_params['blank_b'][None, None],
    alpha0)

  # [T, B, k, V] argmax tables; [T, B, S] winning expansion counts.
  args_tbl = args_tbl.transpose(0, 1, 3, 2, 4).reshape(
      max_t, b_pad, k_tables, vocab)[:, :batch]
  jstar_tbl = jstar_tbl[:, :batch, :s]
  alpha_t = alpha_t[:batch, :s]

  path_weights = jnp.max(alpha_t, axis=-1)
  q_final = jnp.argmax(alpha_t, axis=-1).astype(jnp.int32)  # [B]
  is_padding = is_pad[:, :batch].astype(bool)  # [T, B]

  def backtrace_step(q, inputs):
    args_t, jstar_t, pad_t = inputs  # [B,k,V], [B,S], [B]
    jstar = jnp.take_along_axis(jstar_t, q[:, None], axis=1)[:, 0]  # [B]
    # Walk the within-frame expansion chain backwards; bigram: the label
    # entering state q (q in 1..V) is q itself.
    slots = []
    q_cur = q
    steps = 1 if frame_dependent else max_expansions
    for i in range(steps, 0, -1):
      active = (i <= jstar) & ~pad_t
      y = jnp.where(active, q_cur, 0)
      src = jnp.take_along_axis(
          args_t[:, i - 1], jnp.maximum(q_cur - 1, 0)[:, None],
          axis=1)[:, 0]
      q_cur = jnp.where(active, src, q_cur)
      slots.append(y)
    slots.reverse()  # slot order: expansion 1..k, then trailing blank(s)
    if slots:
      labels = jnp.stack(slots, axis=-1)  # [B, steps]
    else:  # FrameLabelDependent(max_expansions=0): blank-only frames.
      labels = jnp.zeros((q.shape[0], 0), jnp.int32)
    if not frame_dependent:
      labels = jnp.pad(labels, ((0, 0), (0, 1)))  # trailing blank slot
    return q_cur, labels

  q0, labels_tm = jax.lax.scan(
      backtrace_step, q_final,
      (args_tbl, jstar_tbl, jnp.asarray(is_padding)), reverse=True)
  del q0
  # [T, B, A] -> [B, T*A]
  alignment_labels = jnp.moveaxis(labels_tm, 0, 1).reshape(batch, -1)
  num_alignment_labels = num_align * num_frames
  return alignment_labels, num_alignment_labels, path_weights
