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

"""End-to-end demo: train a streamable GNAT, then serve it chunk by chunk.

Trains a small causal-encoder GNAT on synthetic data where the target
labels are recoverable from the frames, then serves the trained
parameters online: the KV-cached streaming encoder feeds the beam
decoder one chunk at a time, printing the evolving best hypothesis.

Run (CPU is fine for the demo sizes):

    python examples/serve_streaming.py
"""

import jax

# Small-model demo: run on CPU even when a TPU platform is preconfigured
# (environment variables are too late once jax is imported; the config
# update is the reliable switch).
jax.config.update('jax_platforms', 'cpu')

import jax.numpy as jnp

from last_torch_tpu import streaming
from last_torch_tpu.models import encoder as encoder_lib
from last_torch_tpu.models import gnat
from last_torch_tpu.models import train as train_lib


def main():
  model_config = gnat.GNATConfig(
      feature_size=8, vocab_size=8, context_size=1,
      encoder_size=32, encoder_layers=2, encoder_heads=2,
      encoder_ffn_size=64, hidden_size=32, embedding_size=32,
      max_expansions=1, locally_normalized=True,
      encoder_causal=True, encoder_window=8)
  data_config = train_lib.DataConfig(
      batch_size=16, max_num_frames=24, max_num_labels=6,
      feature_size=8, vocab_size=8)

  print('training a causal GNAT on synthetic data...')
  state = train_lib.train(model_config, data_config, num_steps=150,
                          learning_rate=3e-3, log_every=50, eval_every=50)

  model = gnat.GNATModel(model_config)
  enc = encoder_lib.StreamingEncoder(model.encoder)
  dec = streaming.StreamingBeamDecoder(model.lattice, beam_size=4,
                                       max_labels=16)
  lat_params = state.params['lattice']
  cache = model.lattice.build_cache(lat_params)

  # Held-out batches from the same synthetic distribution (the label ->
  # feature embedding is derived from the data seed, so it must match
  # training; we skip ahead past the batches the trainer consumed).
  data = train_lib.synthetic_batches(data_config)
  for _ in range(200):
    batch = next(data)
  frames, labels = batch['frames'], batch['labels']
  num_frames = batch['num_frames']
  batch_size = frames.shape[0]
  chunk = 6

  print('serving chunk by chunk (chunk =', chunk, 'frames):')
  es, ds = enc.init_state(batch_size), dec.init_state(batch_size)
  enc_step, dec_step = jax.jit(enc.step), jax.jit(dec.step)
  for lo in range(0, frames.shape[1], chunk):
    es, encoded = enc_step(state.params['encoder'], es,
                           frames[:, lo:lo + chunk])
    # Per-stream validity: streams shorter than this chunk stop emitting.
    valid = jnp.clip(num_frames - lo, 0, encoded.shape[1])
    ds = dec_step(lat_params, ds, encoded, valid, cache)
    best, n, score = jax.device_get(dec.best(ds))
    print(f'  after frame {lo + chunk:3d}: stream[0] ->',
          [int(y) for y in best[0][:int(n[0])]],
          f'(score {float(score[0]):.2f})')

  best, n, _ = jax.device_get(dec.best(ds))
  ref = jax.device_get(labels)
  nl = jax.device_get(batch['num_labels'])
  hits = total = 0
  for b in range(batch_size):
    target = list(ref[b][:int(nl[b])])
    hyp = list(best[b][:int(n[b])])
    total += len(target)
    hits += sum(1 for x, y in zip(hyp, target) if int(x) == int(y))
  print(f'label accuracy vs synthetic targets: {hits}/{total} '
        f'({100.0 * hits / max(total, 1):.1f}%)')


if __name__ == '__main__':
  main()
