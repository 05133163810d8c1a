"""Unroll sweep for the numerator string-DP time scan (same-process A/B).

The `_string_dp` scan body is ~10 elementwise [B, U+1] semiring ops per
frame — far too little work to cover per-iteration while-loop overhead at
T=1600 — so `lattices.STRING_DP_UNROLL` lets XLA fuse many frames per
loop trip. This probe measures, on the real TPU chip at headline ctc-like
shapes (B=32 T=1600 U=100), for unroll in {1, 4, 16, 64}:

  - string DP forward only (precomputed [T, B, U+1] weights as jit args)
  - string DP value+grad wrt the weights (the training cost)

and, for context, the full numerator `_string_forward` fwd+bwd at S=1.

Timing uses the chained in-jit pattern (`benchmarks/chained_timer.py`):
the original per-call sweep was blind — every point sat on the ~30 ms
per-dispatch tunnel round trip, so a 4 ms vs 1 ms DP difference was
invisible.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_stringdp_probe.py
"""

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, lattices, semirings
from last_torch_tpu import weight_fns
from benchmarks import chained_timer

B, T, U, V, H = 32, 1600, 100, 1024, 512


def build():
  context = contexts.FullNGram(vocab_size=V, context_size=0)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=V, hidden_size=H, compute_dtype=jnp.bfloat16))


def main():
  rng = np.random.default_rng(0)
  lattice = build()

  blank_w = jnp.asarray(rng.normal(size=(T, B, U + 1)), jnp.float32)
  lex_w = jnp.asarray(rng.normal(size=(T, B, U + 1)), jnp.float32)
  nf = jnp.full([B], T, jnp.int32)
  nl = jnp.full([B], U, jnp.int32)

  def dp(bw, lw):
    return jnp.sum(lattice._string_dp(bw, lw, nf, nl, semirings.Log))

  for unroll in (1, 4, 16, 64):
    lattices.STRING_DP_UNROLL = unroll
    fwd_step = lambda eps, bw, lw: dp(bw + eps, lw)

    def bwd_step(eps, bw, lw):
      v, g = jax.value_and_grad(dp, argnums=(0, 1))(bw + eps, lw)
      return v + chained_timer.gsum(g)

    chained_timer.measure(f'string DP fwd      [unroll={unroll:2d}]',
                          fwd_step, blank_w, lex_w)
    chained_timer.measure(f'string DP fwd+bwd  [unroll={unroll:2d}]',
                          bwd_step, blank_w, lex_w)

  # Scan-free cumulative closed form (lattices.STRING_DP_CUMULATIVE):
  # a U-position scan of cumsum+cumlogsumexp closed forms instead of a
  # T-step sequential scan.
  lattices.STRING_DP_UNROLL = 1
  lattices.STRING_DP_CUMULATIVE = True
  try:
    fwd_step = lambda eps, bw, lw: dp(bw + eps, lw)

    def bwd_step(eps, bw, lw):
      v, g = jax.value_and_grad(dp, argnums=(0, 1))(bw + eps, lw)
      return v + chained_timer.gsum(g)

    chained_timer.measure('string DP fwd      [cumulative]', fwd_step,
                          blank_w, lex_w)
    chained_timer.measure('string DP fwd+bwd  [cumulative]', bwd_step,
                          blank_w, lex_w)
  finally:
    lattices.STRING_DP_CUMULATIVE = False

  # Full numerator at S=1 for the weights-vs-DP split.
  params = lattice.init(jax.random.PRNGKey(0), feature_size=H)
  frames = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  cache = lattice.build_cache(params)

  def numer_step(eps, p, f):
    def loss(p_, f_):
      return jnp.sum(lattice._string_forward(p_, cache, f_, nf, labels,
                                             nl, semirings.Log))
    v, g = jax.value_and_grad(loss, argnums=(0, 1))(p, f + eps)
    return v + chained_timer.gsum(g)

  for unroll in (1, 16, 64):
    lattices.STRING_DP_UNROLL = unroll
    chained_timer.measure(f'numerator fwd+bwd  [unroll={unroll:2d}]',
                          numer_step, params, frames)
  lattices.STRING_DP_UNROLL = 1
  lattices.STRING_DP_CUMULATIVE = True
  try:
    chained_timer.measure('numerator fwd+bwd  [cumulative]', numer_step,
                          params, frames)
  finally:
    lattices.STRING_DP_CUMULATIVE = False


if __name__ == '__main__':
  main()
