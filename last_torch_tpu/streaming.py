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

"""Frame-synchronous streaming greedy decoding.

The reference library only offers whole-utterance Viterbi
(``lattices.py:185-247``); online serving needs a decoder that consumes
encoded frames chunk by chunk with O(batch) carried state. This module
adds the standard transducer greedy search over a ``RecognitionLattice``'s
alignment + context + weight function: per frame, emit the best lexical
label while it beats blank (up to the alignment's expansion budget), then
advance to the next frame.

The carried state is just the per-stream context-DFA state, so arbitrary
chunk boundaries produce bit-identical output to a single whole-utterance
call (pinned by tests/test_streaming.py). The per-frame loop is a
``lax.scan`` whose step does one per-state weight-function query per
expansion — O(B * hidden) work, no O(B * S * V) tensor anywhere.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import jax.numpy as jnp

from last_torch_tpu import alignments as alignments_lib


class StreamingGreedyDecoder:
  """Greedy frame-synchronous decoder over a RecognitionLattice.

  Output layout matches ``RecognitionLattice.shortest_path``: each frame
  contributes ``alignment.num_states()`` label slots (lexical labels in
  emission order, 0 = blank for unused slots), so downstream consumers
  can share post-processing between offline and streaming decoding.
  """

  def __init__(self, lattice):
    self.lattice = lattice
    alignment = lattice.alignment
    if isinstance(alignment, alignments_lib.FrameDependent):
      self._max_emissions = 1
      self._force_trailing_blank = False
    elif isinstance(alignment, alignments_lib.FrameLabelDependent):
      self._max_emissions = alignment.max_expansions
      self._force_trailing_blank = True
    else:
      raise NotImplementedError(
          f'streaming decode not supported for {type(alignment).__name__}')
    self._slots_per_frame = alignment.num_states()

  @property
  def slots_per_frame(self) -> int:
    return self._slots_per_frame

  def init_state(self, batch_size: int) -> jnp.ndarray:
    """Initial carried state: the context-DFA start state per stream."""
    start = self.lattice.context.start()
    return jnp.full((batch_size,), start, jnp.int32)

  def step(self, params, state: jnp.ndarray, frames: jnp.ndarray,
           num_frames: jnp.ndarray, cache: Any = None):
    """Decodes one chunk of encoded frames.

    Args:
      params: Lattice parameter pytree.
      state: [batch] carried context states from ``init_state`` or the
        previous chunk.
      frames: [batch, chunk_len, feature] encoded frames.
      num_frames: [batch] number of valid frames in this chunk.
      cache: Optional prebuilt weight-function cache (rebuild per chunk
        is cheap but wasteful; pass ``lattice.build_cache(params)`` once
        per stream for serving).

    Returns:
      (new_state, labels, num_labels): labels is
      [batch, chunk_len * slots_per_frame] int32 (0 = blank slot);
      num_labels = slots_per_frame * num_frames.
    """
    lattice = self.lattice
    if cache is None:
      cache = lattice.build_cache(params)
    num_frames = jnp.asarray(num_frames, jnp.int32)
    batch = frames.shape[0]
    chunk_len = frames.shape[1]
    wf_params = params['weight_fn']

    def frame_step(carry, inputs):
      q = carry
      frame, valid = inputs  # [B, F], [B] bool
      slots = []
      open_ = valid  # may still emit a lexical label this frame
      for _ in range(self._max_emissions):
        blank, lexical = lattice.weight_fn.apply(wf_params, cache, frame,
                                                 state=q)
        best = jnp.argmax(lexical, axis=-1).astype(jnp.int32)
        best_w = jnp.take_along_axis(lexical, best[:, None],
                                     axis=-1)[:, 0]
        emit = open_ & (best_w > blank)
        label = jnp.where(emit, best + 1, 0)
        q = jnp.where(emit, lattice.context.next_state(q, best + 1), q)
        slots.append(label)
        open_ = open_ & emit
      if self._force_trailing_blank:
        slots.append(jnp.zeros((batch,), jnp.int32))
      return q, jnp.stack(slots, axis=-1)  # [B, slots_per_frame]

    valid = (jnp.arange(chunk_len)[None, :] <
             num_frames[:, None])  # [B, C]
    q_final, labels_tm = jax.lax.scan(
        frame_step, state,
        (jnp.moveaxis(frames, 0, 1), jnp.moveaxis(valid, 0, 1)))
    labels = jnp.moveaxis(labels_tm, 0, 1).reshape(batch, -1)
    return q_final, labels, self._slots_per_frame * num_frames


class StreamingBeamDecoder:
  """Time-synchronous beam search over a RecognitionLattice.

  The standard transducer serving decoder (greedy = beam 1 for
  FrameDependent): per frame each of ``beam_size`` hypotheses either takes
  the blank arc or extends by a lexical label; FrameLabelDependent frames
  prune back to ``beam_size`` after every within-frame expansion. State is
  O(batch * beam * max_labels) and chunk boundaries are transparent, like
  ``StreamingGreedyDecoder``. Hypotheses carry plain label sequences (no
  frame alignment); call ``best`` for the top hypothesis.

  Beam search is work the reference does not have; weights come from the
  same per-state ``WeightFn.apply`` queries (reference
  ``weight_fns.py:57-82``), so any lattice decodable by ``shortest_path``
  is beam-decodable.

  Hypothesis recombination: after each frame, hypotheses with identical
  label sequences (hence identical context states) are merged — the
  standard transducer recombination, without which duplicate prefixes
  waste beam slots. ``merge='max'`` (default) keeps the best path score
  (Viterbi semantics: scores stay comparable to ``shortest_path``);
  ``merge='logsumexp'`` accumulates total path probability per label
  sequence (sequence-posterior semantics); ``merge='none'`` disables
  recombination.

  Choosing ``beam_size`` (measured, ``benchmarks/beam_quality.py``;
  tables in BASELINE.md): on a TRAINED (peaked) lattice beam 4 is
  near-exact (15/16 Viterbi-transcript match, mean regret 0.06) and
  beam 16 recovered the Viterbi path exactly on every held-out
  utterance — **beam 4–8 is the recommended serving default**, beam 16
  when search error must be negligible. The random-weight worst case
  needs beam 32 for 12/16; treat it as an adversarial bound (early in
  training, near-uniform weights), not the serving regime. Greedy
  (beam 1) is measurably lossy even on trained weights.
  """

  def __init__(self, lattice, beam_size: int, max_labels: int,
               merge: str = 'max'):
    if beam_size < 1:
      raise ValueError(f'beam_size must be >= 1, got {beam_size}')
    if merge not in ('max', 'logsumexp', 'none'):
      raise ValueError(f"merge should be 'max', 'logsumexp' or 'none', "
                       f'but got {merge!r}')
    self.lattice = lattice
    self.beam_size = beam_size
    self.max_labels = max_labels
    self.merge = merge
    alignment = lattice.alignment
    if isinstance(alignment, alignments_lib.FrameDependent):
      self._max_expansions = None
    elif isinstance(alignment, alignments_lib.FrameLabelDependent):
      self._max_expansions = alignment.max_expansions
    else:
      raise NotImplementedError(
          f'beam decode not supported for {type(alignment).__name__}')

  def init_state(self, batch_size: int):
    k, u = self.beam_size, self.max_labels
    score = jnp.full((batch_size, k), float('-inf'), jnp.float32)
    return {
        'context': jnp.full((batch_size, k), self.lattice.context.start(),
                            jnp.int32),
        'score': score.at[:, 0].set(0.0),
        'labels': jnp.zeros((batch_size, k, u), jnp.int32),
        'num_labels': jnp.zeros((batch_size, k), jnp.int32),
        # Rolling hash of the label sequence, updated O(1) per append;
        # recombination sort-keys on it so equal sequences are adjacent.
        'hash': jnp.zeros((batch_size, k), jnp.uint32),
    }

  def best(self, state):
    """Top hypothesis per stream: (labels, num_labels, score)."""
    labels, num_labels, score = self.nbest(state, 1)
    return labels[:, 0], num_labels[:, 0], score[:, 0]

  def nbest(self, state, n: int):
    """Top-n hypotheses per stream, score-sorted: each [batch, n, ...]."""
    if not 1 <= n <= self.beam_size:
      raise ValueError(f'n must be in [1, beam_size={self.beam_size}], '
                       f'got {n}')
    score, idx = jax.lax.top_k(state['score'], n)
    take = lambda x: jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)
    return take(state['labels']), take(state['num_labels']), score

  def step(self, params, state, frames: jnp.ndarray,
           num_frames: jnp.ndarray, cache: Any = None):
    """Advances the beams over one chunk of encoded frames."""
    lattice = self.lattice
    if cache is None:
      cache = lattice.build_cache(params)
    num_frames = jnp.asarray(num_frames, jnp.int32)
    batch, chunk_len = frames.shape[0], frames.shape[1]
    k, u = self.beam_size, self.max_labels
    wf_params = params['weight_fn']

    def query(ctx, frame):
      frame_k = jnp.broadcast_to(frame[:, None, :],
                                 (batch, ctx.shape[1]) + frame.shape[-1:])
      return lattice.weight_fn.apply(wf_params, cache, frame_k, state=ctx)

    def append(hyp, parent, label):
      """Gathers parent fields and appends one label (clamped at u)."""
      take = lambda x: jnp.take_along_axis(
          x, parent.reshape(parent.shape + (1,) * (x.ndim - 2)), axis=1)
      ctx = take(hyp['context'])
      labels, nlab = take(hyp['labels']), take(hyp['num_labels'])
      old_hash = take(hyp['hash'])
      pos = jnp.minimum(nlab, u - 1)
      grows = nlab < u
      write = ((jnp.arange(u)[None, None, :] == pos[:, :, None]) &
               grows[:, :, None])
      new_hash = (old_hash * jnp.uint32(1000003) +
                  label.astype(jnp.uint32))
      return {
          'context': lattice.context.next_state(ctx, label),
          'labels': jnp.where(write, label[:, :, None], labels),
          'num_labels': jnp.minimum(nlab + 1, u),
          'hash': jnp.where(grows, new_hash, old_hash),
      }

    def recombine(pool):
      """Merges hypotheses with identical label sequences.

      Duplicates (same labels, count and context state) collapse onto
      one survivor — score max'ed or logsumexp'ed per ``self.merge`` —
      and the remaining copies drop to -inf so top-k never spends
      multiple beam slots on one label sequence.

      Sort-based, O(M log M + M * U) per frame instead of the quadratic
      all-pairs comparison: hypotheses sort by their rolling label hash,
      so identical sequences land adjacent and one adjacent full
      comparison delimits the groups exactly. A 32-bit hash collision
      between UNEQUAL neighbors can only split a group (a missed merge —
      one wasted beam slot), never falsely merge: the full comparison
      gates every merge.
      """
      if self.merge == 'none':
        return pool
      m = pool['score'].shape[1]
      # Sort key is (hash, num_labels, context), not hash alone: an
      # UNEQUAL sequence with a colliding 32-bit hash could otherwise
      # sort between two equal sequences and split their group (a missed
      # merge; under merge='logsumexp' that splits probability mass
      # across beam slots). Two stable argsorts compose into the
      # lexicographic order; the secondary key packs exactly because
      # num_labels and context are both small non-negative ints.
      num_states, _ = lattice.context.shape()
      secondary = (pool['num_labels'] * jnp.int32(num_states) +
                   pool['context'])
      order1 = jnp.argsort(secondary, axis=1)
      hash_sorted = jnp.take_along_axis(pool['hash'], order1, axis=1)
      order2 = jnp.argsort(hash_sorted, axis=1)
      order = jnp.take_along_axis(order1, order2, axis=1)
      take = lambda x: jnp.take_along_axis(
          x, order.reshape(order.shape + (1,) * (x.ndim - 2)), axis=1)
      pool = {f: take(v) for f, v in pool.items()}
      score = pool['score']
      same_prev = (
          (pool['hash'][:, 1:] == pool['hash'][:, :-1]) &
          (pool['num_labels'][:, 1:] == pool['num_labels'][:, :-1]) &
          (pool['context'][:, 1:] == pool['context'][:, :-1]) &
          jnp.all(pool['labels'][:, 1:] == pool['labels'][:, :-1],
                  axis=-1))
      is_new = jnp.concatenate(
          [jnp.ones((batch, 1), bool), ~same_prev], axis=1)
      gid = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1  # [B, M]
      rows = jnp.arange(batch)[:, None]
      gmax = jnp.full((batch, m), float('-inf')).at[rows, gid].max(score)
      if self.merge == 'logsumexp':
        shift = gmax[rows, gid]
        safe = jnp.where(jnp.isfinite(shift), shift, 0.0)
        gsum = jnp.zeros((batch, m)).at[rows, gid].add(
            jnp.exp(score - safe))
        gmerged = jnp.where(
            gsum > 0,
            jnp.where(jnp.isfinite(gmax), gmax, 0.0) + jnp.log(gsum),
            float('-inf'))
      else:
        gmerged = gmax
      new_score = jnp.where(is_new, gmerged[rows, gid], float('-inf'))
      return {**pool, 'score': new_score}

    def top_k_merge(pools):
      """Top-k over a list of candidate pools (fields + score)."""
      fields = [f for f in pools[0] if f != 'score']
      score = jnp.concatenate([p['score'] for p in pools], axis=1)
      merged = {
          f: jnp.concatenate([p[f] for p in pools], axis=1)
          for f in fields
      }
      merged = recombine({**merged, 'score': score})
      score = merged.pop('score')
      best_score, idx = jax.lax.top_k(score, k)
      take = lambda x: jnp.take_along_axis(
          x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)
      return {'score': best_score, **{f: take(merged[f]) for f in merged}}

    def expand_lexical(hyp, lex):
      """Top-k lexical extensions of a frontier. lex: [B, K, V].

      Hypotheses that already hold ``max_labels`` labels cannot extend:
      their lexical candidates are scored -inf so scores always correspond
      to the returned (complete) label sequences — they survive only via
      the blank arc.
      """
      vocab = lex.shape[-1]
      full = (hyp['num_labels'] >= u)[:, :, None]
      cand = jnp.where(full, float('-inf'),
                       hyp['score'][:, :, None] + lex).reshape(batch, -1)
      score, idx = jax.lax.top_k(cand, k)
      parent = idx // vocab
      label = (idx % vocab + 1).astype(jnp.int32)
      return {'score': score, **append(hyp, parent, label)}

    def frame_step(carry, inputs):
      frame, valid = inputs  # [B, F], [B] bool
      frontier = carry
      terminated = []
      steps = 1 if self._max_expansions is None else self._max_expansions
      for j in range(steps + 1):
        blank, lex = query(frontier['context'], frame)
        terminated.append({**frontier,
                           'score': frontier['score'] + blank})
        if self._max_expansions is None:
          # FrameDependent: one lexical label ends the frame (no trailing
          # blank), so lexical extensions are terminal too.
          terminated.append(expand_lexical(frontier, lex))
          break
        if j < steps:
          frontier = expand_lexical(frontier, lex)
      new = top_k_merge(terminated)
      keep = lambda a, b: jnp.where(
          valid.reshape((batch,) + (1,) * (a.ndim - 1)), a, b)
      new = {f: keep(new[f], carry[f]) for f in carry}
      return new, None

    valid = jnp.arange(chunk_len)[None, :] < num_frames[:, None]
    state, _ = jax.lax.scan(
        frame_step, dict(state),
        (jnp.moveaxis(frames, 0, 1), jnp.moveaxis(valid, 0, 1)))
    return state


def nbest_offline(lattice, params, frames, num_frames, *, beam_size: int,
                  n: int = None, max_labels: int = None, cache=None):
  """Offline n-best label sequences via one whole-utterance beam pass.

  A convenience wrapper for non-streaming use: runs the time-synchronous
  ``StreamingBeamDecoder`` (with hypothesis recombination) over the full
  encoded utterance in a single chunk. ``shortest_path`` returns only
  the 1-best alignment; this returns alternatives with their
  (recombined) scores — rescoring / confidence inputs the reference
  library has no equivalent for.

  Args:
    lattice: ``RecognitionLattice``.
    params: Lattice parameter pytree.
    frames: [batch, max_num_frames, feature_size] encoded frames.
    num_frames: [batch] frame counts.
    beam_size: Beam width.
    n: Number of hypotheses to return (default: ``beam_size``).
    max_labels: Label capacity per hypothesis. Default: the
      frames-implied bound (max_num_frames times the alignment's
      per-frame label limit) capped at 512 — per-frame recombination
      carries O(beam-pool * max_labels) label state, so an uncapped
      default would make long utterances pay for a worst-case
      every-frame-emits transcript no real hypothesis reaches. Pass an
      explicit budget for transcripts beyond 512 labels.
    cache: Optional prebuilt weight-fn cache.

  Returns:
    (labels [batch, n, max_labels], num_labels [batch, n],
    scores [batch, n]), best first.
  """
  from last_torch_tpu import alignments as alignments_lib

  max_t = frames.shape[-2]
  if max_labels is None:
    per_frame = (1 if isinstance(lattice.alignment,
                                 alignments_lib.FrameDependent)
                 else lattice.alignment.max_expansions)
    if max_t * per_frame > 512:
      warnings.warn(
          'nbest_offline: default max_labels capped at 512 (frames imply '
          f'up to {max_t * per_frame}); hypotheses longer than 512 labels '
          'will be truncated. Pass max_labels explicitly for long '
          'transcripts.', stacklevel=2)
    max_labels = min(max_t * per_frame, 512)
  decoder = StreamingBeamDecoder(lattice, beam_size=beam_size,
                                 max_labels=max_labels)
  state = decoder.init_state(frames.shape[0])
  state = decoder.step(params, state, frames,
                       jnp.asarray(num_frames, jnp.int32), cache)
  return decoder.nbest(state, n if n is not None else beam_size)
