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

"""Input pipeline: length-bucketed batching and device prefetch.

XLA compiles one program per input shape, so a recognizer fed raw
variable-length utterances recompiles constantly. This module provides
the TPU-native input discipline the reference library lacks entirely:

* ``bucket_batches`` — groups examples into a FIXED grid of
  (max_frames, max_labels) buckets and emits padded, fully static-shaped
  batches: the total number of distinct shapes (hence compiles) is
  bounded by ``len(frame_buckets) * len(label_buckets)``, and padding
  waste is bounded by the bucket granularity rather than the corpus
  maximum.
* ``prefetch_to_device`` — a background thread that stages upcoming
  batches onto the device (``jax.device_put``) while the current step
  computes, hiding host-to-device transfer behind compute.

Batches are dicts with the trainer's contract: ``frames`` [B, T, F]
float32, ``num_frames`` [B] int32, ``labels`` [B, U] int32 (1-based,
0-padded), ``num_labels`` [B] int32, plus ``valid`` [B] bool when
``pad_final`` emits a partial batch (feed it to
``models.metrics.update_error_rate``).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Sequence

import jax
import numpy as np


def _bucket_for(value: int, boundaries: Sequence[int]) -> Optional[int]:
  """Smallest boundary >= value, or None if value exceeds them all."""
  for b in boundaries:
    if value <= b:
      return b
  return None


def bucket_batches(examples: Iterable[tuple[np.ndarray, np.ndarray]],
                   batch_size: int,
                   frame_buckets: Sequence[int],
                   label_buckets: Sequence[int],
                   pad_final: bool = False,
                   drop_overlong: bool = True) -> Iterator[dict]:
  """Groups (frames, labels) examples into static-shaped padded batches.

  Args:
    examples: Iterable of (frames [t, feature] float, labels [u] int,
      1-based) numpy pairs.
    batch_size: Sequences per emitted batch (every batch has exactly this
      leading dimension; partial final buckets are padded when
      ``pad_final`` and dropped otherwise).
    frame_buckets: Ascending frame-count boundaries, e.g. (400, 800, 1600).
    label_buckets: Ascending label-count boundaries.
    pad_final: Emit leftover examples at iterator end as batches padded
      with all-zero rows and ``valid=False`` entries.
    drop_overlong: Silently skip examples exceeding the largest bucket;
      when False, raise ValueError instead.

  Yields:
    Batch dicts (see module docstring). All arrays are numpy; shapes are
    determined solely by (bucket, batch_size), never by the data.
  """
  frame_buckets = sorted(frame_buckets)
  label_buckets = sorted(label_buckets)
  pending: dict[tuple[int, int], list] = {}
  feature_size = None

  def emit(key, items):
    nonlocal feature_size
    t_max, u_max = key
    n = len(items)
    frames = np.zeros((batch_size, t_max, feature_size), np.float32)
    num_frames = np.zeros((batch_size,), np.int32)
    labels = np.zeros((batch_size, max(u_max, 1)), np.int32)
    num_labels = np.zeros((batch_size,), np.int32)
    valid = np.zeros((batch_size,), bool)
    for i, (f, l) in enumerate(items):
      frames[i, :len(f)] = f
      num_frames[i] = len(f)
      labels[i, :len(l)] = l
      num_labels[i] = len(l)
      valid[i] = True
    batch = {'frames': frames, 'num_frames': num_frames, 'labels': labels,
             'num_labels': num_labels}
    if n < batch_size:
      batch['valid'] = valid
    return batch

  for frames, labels in examples:
    frames = np.asarray(frames)
    labels = np.asarray(labels)
    if feature_size is None:
      feature_size = frames.shape[-1]
    tb = _bucket_for(frames.shape[0], frame_buckets)
    ub = _bucket_for(labels.shape[0], label_buckets)
    if tb is None or ub is None:
      if drop_overlong:
        continue
      raise ValueError(
          f'example with {frames.shape[0]} frames / {labels.shape[0]} '
          f'labels exceeds the largest bucket '
          f'({frame_buckets[-1]}, {label_buckets[-1]})')
    key = (tb, ub)
    items = pending.setdefault(key, [])
    items.append((frames, labels))
    if len(items) == batch_size:
      yield emit(key, items)
      pending[key] = []

  if pad_final:
    for key, items in sorted(pending.items()):
      if items:
        yield emit(key, items)


def prefetch_to_device(batches: Iterable[dict],
                       size: int = 2,
                       device=None,
                       place=None) -> Iterator[dict]:
  """Stages upcoming batches on-device from a background thread.

  Args:
    batches: Iterator of numpy batch dicts.
    size: Number of batches staged ahead of the consumer.
    device: Target device (default: ``jax.devices()[0]``).
    place: Optional override ``batch -> device batch`` (e.g. a sharding
      placement from ``parallel.sharding.shard_batch``); when given,
      ``device`` is ignored.

  Yields:
    The same batches with array values already resident on-device.
  """
  if place is None:
    target = device if device is not None else jax.devices()[0]
    place = lambda b: {
        k: jax.device_put(v, target) if isinstance(v, np.ndarray) else v
        for k, v in b.items()
    }
  q: queue.Queue = queue.Queue(maxsize=size)
  stop = object()
  cancelled = threading.Event()
  error: list[BaseException] = []

  def put(item) -> bool:
    """Enqueues unless the consumer has gone away; returns False then."""
    while not cancelled.is_set():
      try:
        q.put(item, timeout=0.1)
        return True
      except queue.Full:
        continue
    return False

  def producer():
    try:
      for b in batches:
        if not put(place(b)):
          return
    except BaseException as e:  # surfaced to the consumer below
      error.append(e)
    finally:
      put(stop)

  thread = threading.Thread(target=producer, daemon=True)
  thread.start()
  try:
    while True:
      item = q.get()
      if item is stop:
        if error:
          raise error[0]
        return
      yield item
  finally:
    # Consumer stopped early (generator closed / exception): release the
    # producer and drop the staged device batches instead of pinning
    # them in HBM forever.
    cancelled.set()
    # A q.put already in flight (0.1 s poll window) can land after a
    # single drain, leaving one staged batch pinned until GC — drain,
    # wait for the producer to actually exit, then drain whatever it
    # managed to enqueue in between.
    for _ in range(25):  # bounded: a source blocked in IO stays daemon
      try:
        while True:
          q.get_nowait()
      except queue.Empty:
        pass
      thread.join(timeout=0.2)
      if not thread.is_alive():
        break
    try:
      while True:
        q.get_nowait()
    except queue.Empty:
      pass
    # Only close the source generator once the producer thread has
    # actually exited: close() from another thread while the producer is
    # still executing it (the blocked-in-IO case above) raises
    # ValueError('generator already executing') and would mask the
    # consumer's original exception.
    if not thread.is_alive():
      close = getattr(batches, 'close', None)
      if close is not None:
        close()
