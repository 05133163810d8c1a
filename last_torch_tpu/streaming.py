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
