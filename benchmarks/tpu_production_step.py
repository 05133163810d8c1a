"""Production-step + long-utterance benchmarks (banded attention on TPU).

Two measurements:

1. **Streaming-Conformer production step** (BASELINE.md row: causal
   window-64 Conformer + global GNAT loss + AdamW, B=32 T=1600 V=1024):
   re-measured with the banded O(T * 2W) encoder attention (auto-engaged
   at T=1600 > 2 * 64) vs the dense O(T^2) path it replaces.

2. **Long-utterance demo** (B=8, T=6400, V=1024): the banded encoder +
   fused GNAT loss fwd+bwd on ONE chip. The dense path's attention logits
   alone would be 8 * 8 * 6400^2 * 4 B = 10.5 GB/layer — unrunnable; the
   banded path makes single-chip long-T training a config, not a
   project. (The time-axis sharding in ``parallel.sequence`` extends the
   same step across a mesh; its gradient equality is CPU-mesh tested and
   its kernels chain-verified on this chip by tpu_relay_check.py.)

Usage: python benchmarks/tpu_production_step.py [--long]

Results (v5e, recorded 2026-08-17, round 3): see BASELINE.md.
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from last_torch_tpu.models import gnat, presets  # noqa: E402


def make_model(banded, **overrides):
  import dataclasses
  config = presets.streaming_conformer_gnat(
      encoder_size=512, encoder_layers=4, encoder_heads=8,
      encoder_ffn_size=2048, hidden_size=512, embedding_size=512,
      **overrides)
  model = gnat.GNATModel(config)
  model.encoder = dataclasses.replace(model.encoder,
                                      banded_attention=banded,
                                      dtype=jnp.bfloat16)
  return model


def step_time(model, batch, max_t, label=''):
  optimizer = gnat.make_optimizer()
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, 80)) * 0.5,
                       jnp.float32)
  nf = jnp.full((batch,), max_t, jnp.int32)
  labels = jnp.asarray(rng.integers(1, 1025, size=(batch, 100)), jnp.int32)
  nl = jnp.full((batch,), 100, jnp.int32)

  # Batch arrays are jit ARGUMENTS: closure-captured device arrays become
  # lowering-time HLO constants whose device->host readback over the
  # tunnel dominated rounds 1-3 cold times (bench.py diagnosis).
  step = jax.jit(lambda s, f, n, l, m: gnat.train_step(
      model, optimizer, s, f, n, l, m))
  # .item() forces execution; block_until_ready is unreliable over the
  # tunneled backend (bench.py `_force` diagnosis).
  t0 = time.monotonic()
  state, loss = step(state, frames, nf, labels, nl)
  loss = loss.item()
  compile_s = time.monotonic() - t0
  assert np.isfinite(loss), loss
  times = []
  for _ in range(3):
    t0 = time.monotonic()
    state, loss = step(state, frames, nf, labels, nl)
    loss = loss.item()
    times.append(time.monotonic() - t0)
  ms = float(np.median(times)) * 1e3
  fps = batch * max_t / (ms / 1e3)
  print(f'{label}: {ms:.1f} ms/step -> {fps:,.0f} frames/s/chip '
        f'(compile+first {compile_s:.1f}s, loss {float(loss):.2f})')
  return ms


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  if '--long' in sys.argv:
    model = make_model(banded=True)
    step_time(model, batch=8, max_t=6400,
              label='long-utterance banded Conformer step (B=8 T=6400)')
    return
  dense = make_model(banded=False)
  step_time(dense, batch=32, max_t=1600,
            label='production step, dense attention (B=32 T=1600)')
  banded = make_model(banded=True)
  step_time(banded, batch=32, max_t=1600,
            label='production step, banded attention (B=32 T=1600)')


if __name__ == '__main__':
  main()
