"""Same-process A/B of trigram-kernel variants (no XLA baseline).

The full probe (tpu_trigram_probe.py) re-times the XLA scan path, whose
compile alone costs 400-776 s over the tunnel. For kernel-vs-kernel
decisions (e.g. the BATCHED_TRANSPOSE flag) only the fused kernels need
compiling (~10-25 s each), and the same-process discipline still removes
tunnel drift between the variants. The unbatched variant runs first and
last so the drift across the session is visible in the output.

Usage: python benchmarks/tpu_trigram_kernel_ab.py
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
from last_torch_tpu.ops import trigram_scan  # noqa: E402


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  vocab, hidden, emb = 64, 512, 512
  batch, max_t, max_u = 8, 200, 20
  context = contexts.FullNGram(vocab_size=vocab, context_size=2)
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
  assert lattice.would_fuse(frames), 'trigram kernel did not gate in'

  def total_loss(params, frames):
    return jnp.sum(lattice(params, frames, num_frames, labels, num_labels))

  print(f'trigram kernel A/B V={vocab} S={num_states} B={batch} '
        f'T={max_t} hidden={hidden}', flush=True)
  results = {}
  for name, flag in (('unbatched', False), ('batched', True),
                     ('unbatched-again', False)):
    trigram_scan.BATCHED_TRANSPOSE = flag
    fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
    t0 = time.monotonic()
    val, _ = fn(params, frames)
    val = val.item()
    compile_s = time.monotonic() - t0
    times = []
    for _ in range(5):
      t0 = time.monotonic()
      fn(params, frames)[0].item()
      times.append(time.monotonic() - t0)
    ms = float(np.median(times)) * 1e3
    results[name] = (ms, val)
    print(f'{name:16s} fwd+bwd: {ms:7.1f} ms (compile {compile_s:.1f}s, '
          f'loss {val:.6f})', flush=True)
  base = min(results['unbatched'][0], results['unbatched-again'][0])
  print(f'batched/unbatched: {results["batched"][0] / base:.3f} '
        f'(>1 means batched is slower)', flush=True)
  assert abs(results['batched'][1] - results['unbatched'][1]) <= (
      1e-4 * abs(results['unbatched'][1])), 'variant losses diverge'


if __name__ == '__main__':
  main()
