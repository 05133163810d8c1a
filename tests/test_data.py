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

"""Bucketed batching + prefetch pipeline."""

import numpy as np
import pytest

from last_torch_tpu import data


def make_examples(lengths_and_labels, feature=3, seed=0):
  rng = np.random.default_rng(seed)
  out = []
  for t, u in lengths_and_labels:
    out.append((rng.normal(size=(t, feature)).astype(np.float32),
                rng.integers(1, 9, size=(u,)).astype(np.int32)))
  return out


def test_static_shape_grid_and_content():
  examples = make_examples([(3, 1), (7, 2), (4, 1), (8, 3), (2, 2),
                            (6, 1), (5, 3), (8, 2)])
  batches = list(data.bucket_batches(
      examples, batch_size=2, frame_buckets=(4, 8), label_buckets=(2, 4)))
  assert batches
  seen_shapes = set()
  for b in batches:
    bsz, t, f = b['frames'].shape
    assert bsz == 2 and f == 3
    assert t in (4, 8)
    assert b['labels'].shape[1] in (2, 4)
    seen_shapes.add((t, b['labels'].shape[1]))
    # Content: padding zero beyond lengths, data preserved within.
    for i in range(bsz):
      nf, nl = b['num_frames'][i], b['num_labels'][i]
      assert np.all(b['frames'][i, nf:] == 0)
      assert np.all(b['labels'][i, nl:] == 0)
      assert np.all(b['labels'][i, :nl] >= 1)
  # Full batches only (8 examples, batch 2, no pad_final => every example
  # whose bucket fills is emitted).
  total = sum(b['frames'].shape[0] for b in batches)
  assert total % 2 == 0


def test_pad_final_emits_remainder_with_valid_mask():
  examples = make_examples([(3, 1), (3, 1), (3, 1)])
  batches = list(data.bucket_batches(
      examples, batch_size=2, frame_buckets=(4,), label_buckets=(2,),
      pad_final=True))
  assert len(batches) == 2
  assert 'valid' not in batches[0]  # full batch
  last = batches[1]
  np.testing.assert_array_equal(last['valid'], [True, False])
  assert last['num_frames'][1] == 0 and last['num_labels'][1] == 0


def test_overlong_examples_dropped_or_raise():
  examples = make_examples([(10, 1), (3, 1), (3, 8), (3, 1)])
  batches = list(data.bucket_batches(
      examples, batch_size=2, frame_buckets=(4,), label_buckets=(2,)))
  assert len(batches) == 1  # the two in-range examples
  with pytest.raises(ValueError, match='exceeds the largest bucket'):
    list(data.bucket_batches(
        examples, batch_size=2, frame_buckets=(4,), label_buckets=(2,),
        drop_overlong=False))


def test_prefetch_preserves_order_and_values():
  examples = make_examples([(3, 1)] * 6)
  host = list(data.bucket_batches(
      examples, batch_size=2, frame_buckets=(4,), label_buckets=(2,)))
  fetched = list(data.prefetch_to_device(iter(host), size=2))
  assert len(fetched) == len(host)
  for a, b in zip(fetched, host):
    np.testing.assert_array_equal(np.asarray(a['frames']), b['frames'])
    np.testing.assert_array_equal(np.asarray(a['num_labels']),
                                  b['num_labels'])


def test_prefetch_propagates_producer_errors():
  def bad():
    yield {'frames': np.zeros((1, 2, 3), np.float32)}
    raise RuntimeError('source failed')

  it = data.prefetch_to_device(bad(), size=1)
  next(it)
  with pytest.raises(RuntimeError, match='source failed'):
    list(it)
