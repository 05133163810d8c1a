"""Same-process A/B for BIGRAM fused-kernel variants at headline shapes.

The trigram analogue is ``tpu_trigram_kernel_ab.py``. This one builds
the HEADLINE config (B=32 T=1600 V=1024 bigram FLD(2) hidden 512 —
bench.py's metric) and times fwd+bwd with a boolean ``fused_scan``
module flag at its default, flipped, and default again, all in one
process so tunnel drift between runs cannot masquerade as a win/loss.
Each variant is a distinct HLO, so expect ~55 s compile per variant
over the tunnel on first run (persistent-cached afterwards).

Usage: python benchmarks/tpu_bigram_kernel_ab.py [FLAG]
  FLAG: a boolean module flag of fused_scan (default STREAM_EXPANSIONS).

Results (v5e, headline config):
  STREAM_EXPANSIONS: see ops/README.md.
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

import last_torch_tpu  # noqa: E402
from last_torch_tpu import alignments, contexts, weight_fns  # noqa: E402
from last_torch_tpu.ops import fused_scan  # noqa: E402


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  flag = sys.argv[1] if len(sys.argv) > 1 else 'STREAM_EXPANSIONS'
  default = getattr(fused_scan, flag)
  assert isinstance(default, bool), (flag, default)
  vocab, hidden, emb = 1024, 512, 512
  batch, max_t, max_u = 32, 1600, 128
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  num_states = context.shape()[0]
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=num_states, embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden,
          compute_dtype=jnp.bfloat16),
      fused='auto')
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)) * 0.5,
                       jnp.float32)
  num_frames = jnp.full((batch,), max_t, jnp.int32)
  labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                       jnp.int32)
  num_labels = jnp.full((batch,), max_u, jnp.int32)

  def total_loss(params, frames):
    return jnp.sum(lattice(params, frames, num_frames, labels, num_labels))

  print(f'bigram kernel A/B [{flag}] V={vocab} S={num_states} B={batch} '
        f'T={max_t} hidden={hidden}', flush=True)
  results = {}
  variants = [(f'{flag}={default}', default),
              (f'{flag}={not default}', not default),
              (f'{flag}={default}-again', default)]
  for name, value in variants:
    setattr(fused_scan, flag, value)
    fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
    t0 = time.monotonic()
    val, _ = fn(params, frames)
    val = val.item()
    compile_s = time.monotonic() - t0
    times = []
    for _ in range(3):
      t0 = time.monotonic()
      fn(params, frames)[0].item()
      times.append(time.monotonic() - t0)
    ms = float(np.median(times)) * 1e3
    results[name] = (ms, val)
    print(f'{name:28s} fwd+bwd: {ms:8.1f} ms (compile {compile_s:.1f}s, '
          f'loss {val:.6f})', flush=True)
  setattr(fused_scan, flag, default)
  base = min(results[f'{flag}={default}'][0],
             results[f'{flag}={default}-again'][0])
  alt = results[f'{flag}={not default}']
  print(f'{flag}={not default} vs default: {alt[0] / base:.3f} '
        f'(>1 means the non-default is slower)', flush=True)
  rel = abs(alt[1] - results[f'{flag}={default}'][1])
  assert rel <= 1e-4 * abs(results[f'{flag}={default}'][1]), (
      'variant losses diverge', results)


if __name__ == '__main__':
  main()
