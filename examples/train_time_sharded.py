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

"""Training on utterances too long for one chip: time-axis sharding.

The recognition-lattice recursion is sequential in time with a tiny
carry, so frames shard over a mesh axis and the alpha carry relays
between neighbor devices over ICI — and since round 3 the relay is fully
TRAINABLE (a custom-VJP relays the cotangent / fused-kernel beta in
reverse). Per-device memory for frames, alpha history, and every
per-frame temporary drops by the axis size; combined with the banded
O(T * 2W) encoder attention, arbitrarily long utterances train without a
single O(T^2) or whole-T-resident tensor per device.

This demo builds an 8-way time mesh (virtual CPU devices here; the same
code runs on a TPU slice), trains a causal-Conformer GNAT on synthetic
long utterances with ``make_time_sharded_train_step``, and checks the
loss decreases::

    PYTHONPATH=/root/repo python examples/train_time_sharded.py
"""

import os

import jax

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
  os.environ['XLA_FLAGS'] = (
      flags + ' --xla_force_host_platform_device_count=8').strip()
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from last_torch_tpu.models import gnat  # noqa: E402
from last_torch_tpu.parallel import sequence, sharding  # noqa: E402


def main():
  devices = jax.devices()[:8]
  mesh = jax.sharding.Mesh(np.array(devices), axis_names=('seq',))

  config = gnat.GNATConfig(
      feature_size=16,
      vocab_size=32,
      context_size=1,
      encoder_size=32,
      encoder_layers=2,
      encoder_heads=2,
      encoder_ffn_size=64,
      hidden_size=32,
      embedding_size=32,
      max_expansions=1,
      encoder_causal=True,
      encoder_window=8,   # banded attention auto-engages at T > 16
      encoder_conv_kernel=4)
  model = gnat.GNATModel(config)
  optimizer = gnat.make_optimizer(learning_rate=3e-3)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)

  # "Long" synthetic utterances: T = 64 frames over an 8-way time mesh
  # (8 frames resident per device; scale T freely — memory per device
  # stays T / 8).
  batch, max_t, max_u = 2, 64, 6
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, 16)), jnp.float32)
  num_frames = jnp.array([64, 48], jnp.int32)
  labels = jnp.asarray(rng.integers(1, 33, size=(batch, max_u)), jnp.int32)
  num_labels = jnp.array([6, 4], jnp.int32)

  step = sequence.make_time_sharded_train_step(model, optimizer, mesh,
                                               axis_name='seq')
  losses = []
  for i in range(5):
    state, loss = step(state, frames, num_frames, labels, num_labels)
    losses.append(float(loss))
    print(f'step {i}: loss {losses[-1]:.4f}')
  assert losses[-1] < losses[0], losses
  print('time-sharded training converges; per-device frame residency '
        f'= {max_t // mesh.shape["seq"]} of {max_t} frames')


if __name__ == '__main__':
  main()
