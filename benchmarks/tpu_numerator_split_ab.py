"""Same-process A/B of numerator_scan.BATCH_SPLIT (MXU/VPU interleave).

VERDICT round-4 task 3: the "~92% of its SERIAL MXU+VPU floor" claim for
the fused numerator kernel rests on one probe (FRAMES_PER_CELL, which
unrolled DEPENDENT frames). This measures the other structure: split
each frame's row block into BATCH_SPLIT independent batch tiles and
issue every tile's head matmul before any tile's VPU epilogue, giving
the Mosaic scheduler room to overlap tile A's exp/logsumexp with tile
B's matmul. Variants compile in-process (~10-20 s each); the chained
in-jit timer removes the ~30 ms dispatch RTT.

Usage: python benchmarks/tpu_numerator_split_ab.py

Results (v5e, 2026-08-19): a WASH — split=1 181.6 ms, split=2 183.2 ms
(0.991x), split=4 185.7 ms (0.978x). Mosaic does not overlap independent
tiles either; the serial MXU+VPU floor stands. See ops/README.md and the
module comment on ``numerator_scan.BATCH_SPLIT``.
"""

import sys

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

import last_torch_tpu  # noqa: E402
from last_torch_tpu import alignments, contexts, weight_fns  # noqa: E402
from last_torch_tpu.ops import numerator_scan  # noqa: E402
from benchmarks import chained_timer  # noqa: E402

B, T, U, V, H = 32, 1600, 100, 1024, 512


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  context = contexts.FullNGram(vocab_size=V, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=V, hidden_size=H,
                                   compute_dtype=jnp.bfloat16)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=H)
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(B, T, H)) * 0.1, jnp.float32)
  nf = jnp.full((B,), T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  nl = jnp.full((B,), U, jnp.int32)

  def hat_step(eps, p, f):
    v, g = jax.value_and_grad(lambda p_, f_: jnp.sum(
        lattice(p_, f_, nf, labels, nl)), argnums=(0, 1))(p, f + eps)
    return v + chained_timer.gsum(g)

  print(f'numerator BATCH_SPLIT A/B B={B} T={T} U={U} V={V} h={H}',
        flush=True)
  results = {}
  for split in (1, 2, 4, 1):
    key = f'split={split}' + ('-again' if f'split={split}' in results
                              else '')
    numerator_scan.BATCH_SPLIT = split
    t = chained_timer.measure(key, hat_step, params, frames, n=5,
                              quiet=True)
    results[key] = t
    print(f'{key:14s} HAT train step: {t * 1e3:7.1f} ms '
          f'({B * T / t / 1e3:.1f}k frames/s)', flush=True)
  base = min(results['split=1'], results['split=1-again'])
  for k in ('split=2', 'split=4'):
    print(f'{k}: {base / results[k]:.3f}x over split=1', flush=True)


if __name__ == '__main__':
  main()
