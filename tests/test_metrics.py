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

"""Edit-distance / error-rate metrics vs a plain-Python oracle."""

import jax
import jax.numpy as jnp
import numpy as np

from last_torch_tpu.models import metrics


def oracle_edit_distance(a, b):
  """Textbook O(len(a)*len(b)) Levenshtein distance."""
  d = list(range(len(a) + 1))
  for j, y in enumerate(b, start=1):
    prev = d[0]
    d[0] = j
    for i, x in enumerate(a, start=1):
      cur = d[i]
      d[i] = min(d[i] + 1, d[i - 1] + 1, prev + (x != y))
      prev = cur
  return d[len(a)]


def test_edit_distance_known_cases():
  hyp = jnp.array([[1, 2, 3, 0], [1, 2, 3, 0], [5, 5, 5, 5]])
  nh = jnp.array([3, 3, 0])
  ref = jnp.array([[1, 2, 3], [3, 2, 1], [1, 2, 0]])
  nr = jnp.array([3, 3, 2])
  out = metrics.edit_distance(hyp, nh, ref, nr)
  # identical; reversed (2 subs); empty hyp vs 2 refs (2 insertions).
  np.testing.assert_array_equal(np.asarray(out), [0, 2, 2])


def test_edit_distance_padding_is_ignored():
  # Same logical sequences, different padding garbage and pad widths.
  a = metrics.edit_distance(
      jnp.array([[1, 2, 9, 9, 9]]), jnp.array([2]),
      jnp.array([[1, 3, 7]]), jnp.array([2]))
  b = metrics.edit_distance(
      jnp.array([[1, 2]]), jnp.array([2]),
      jnp.array([[1, 3, 0, 0, 0, 0]]), jnp.array([2]))
  assert int(a[0]) == int(b[0]) == 1


def test_edit_distance_fuzz_vs_oracle():
  rng = np.random.default_rng(0)
  max_u, max_v = 11, 9
  hyps, nhs, refs, nrs, want = [], [], [], [], []
  for _ in range(64):
    nh = int(rng.integers(0, max_u + 1))
    nr = int(rng.integers(0, max_v + 1))
    h = rng.integers(1, 5, size=(max_u,))
    r = rng.integers(1, 5, size=(max_v,))
    hyps.append(h)
    nhs.append(nh)
    refs.append(r)
    nrs.append(nr)
    want.append(oracle_edit_distance(list(h[:nh]), list(r[:nr])))
  got = jax.jit(metrics.edit_distance)(
      jnp.asarray(np.stack(hyps)), jnp.asarray(nhs),
      jnp.asarray(np.stack(refs)), jnp.asarray(nrs))
  np.testing.assert_array_equal(np.asarray(got), want)


def test_edit_distance_multi_batch_dims():
  hyp = jnp.arange(24).reshape(2, 3, 4) % 5
  nh = jnp.full((2, 3), 4)
  out = metrics.edit_distance(hyp, nh, hyp, nh)
  assert out.shape == (2, 3)
  np.testing.assert_array_equal(np.asarray(out), 0)


def test_error_rate_accumulation_and_masking():
  state = metrics.empty_error_rate_state()
  hyp = jnp.array([[1, 2, 3], [4, 4, 4]])
  nh = jnp.array([3, 1])
  ref = jnp.array([[1, 2, 4], [4, 0, 0]])
  nr = jnp.array([3, 1])
  state = metrics.update_error_rate(state, hyp, nh, ref, nr)
  # 1 sub over 3 refs + 0 over 1 ref.
  assert int(state.total_edits) == 1
  assert int(state.total_ref_labels) == 4
  assert int(state.num_sequences) == 2
  # Second batch with one padded (invalid) row.
  state = metrics.update_error_rate(
      state, hyp, nh, ref, nr, valid=jnp.array([True, False]))
  assert int(state.total_edits) == 2
  assert int(state.total_ref_labels) == 7
  assert int(state.num_sequences) == 3
  np.testing.assert_allclose(float(metrics.error_rate(state)), 2 / 7)
  # States sum (the cross-host aggregation contract).
  merged = state + state
  assert int(merged.total_ref_labels) == 14
