"""Same-process A/B of the scan-free factorized S=1 (CTC-topology) route.

Measures, on the real TPU chip, the ctc-like training configuration
(BASELINE config 11: B=32 T=1600 U=100 V=1024, FullNGram(context_size=0),
FLD k=2, globally normalized) with `lattice._factorize_s1` flipped in the
same process (tunnel variance between runs reached 133->225 ms on
identical code, so cross-run comparisons are meaningless):

  - full loss fwd+bwd:   scan route vs factorized route
  - denominator only:    grad of `_forward_backward`
  - numerator only:      grad of `_string_forward`
  - Viterbi decode:      `shortest_path` (tropical vjp through the route)
  - HAT (locally normalized) numerator-only training at S=1

Timing uses the chained in-jit pattern (`benchmarks/chained_timer.py`):
the per-call pattern carries a ~30 ms per-dispatch tunnel round trip,
which dominated the originally recorded numbers on both sides of each
ratio (CLAUDE.md round-4 discoveries).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_s1_bench.py
"""

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns
from benchmarks import chained_timer

B, T, U, V, H = 32, 1600, 100, 1024, 512


def build(locally_normalized=False):
  context = contexts.FullNGram(vocab_size=V, context_size=0)
  # Production contract: bfloat16 compute (matches bench.py and the
  # fused numerator kernel's hardware coverage — its float32 backward
  # variant register-spills past VMEM at these shapes and is gated off).
  wf = lambda ctx: weight_fns.JointWeightFn(
      vocab_size=V, hidden_size=H, compute_dtype=jnp.bfloat16)
  if locally_normalized:
    inner = wf
    wf = lambda ctx: weight_fns.LocallyNormalizedWeightFn(inner(ctx))
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=wf)


def timeit(tag, step, *args, n=10):
  return chained_timer.measure(tag, step, *args, n=n)


def main():
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
  nf = jnp.full([B], T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  nl = jnp.full([B], U, jnp.int32)

  lattice = build()
  params = lattice.init(jax.random.PRNGKey(0), feature_size=H)

  results = {}
  for route, flag in (('scan', False), ('factored', True)):
    # The route flag is read at TRACE time, so every jitted callable must
    # be constructed after setting it (a shared jit would hit its cache
    # and silently re-run the first route).
    lattice._factorize_s1 = flag
    gsum = chained_timer.gsum

    def loss_step(eps, p, f, nf, y, ny):
      return gsum(jax.grad(lambda p_, f_: jnp.sum(
          lattice(p_, frames=f_, num_frames=nf, labels=y, num_labels=ny)),
          argnums=(0, 1))(p, f + eps))

    def denom_step(eps, p, f, nf):
      return gsum(jax.grad(lambda p_, f_: jnp.sum(
          lattice._forward_backward(p_, lattice.build_cache(p_), f_, nf)),
          argnums=(0, 1))(p, f + eps))

    def numer_step(eps, p, f, nf, y, ny):
      return gsum(jax.grad(lambda p_, f_: jnp.sum(
          lattice._string_forward(p_, lattice.build_cache(p_), f_, nf, y,
                                  ny, semirings.Log)),
          argnums=(0, 1))(p, f + eps))

    def decode_step(eps, p, f, nf):
      return gsum(lattice.shortest_path(p, f + eps, nf))

    results[f'loss_{route}'] = timeit(
        f'loss fwd+bwd [{route}]', loss_step, params, frames, nf, labels,
        nl)
    results[f'denom_{route}'] = timeit(
        f'denominator [{route}]', denom_step, params, frames, nf)
    results[f'numer_{route}'] = timeit(
        f'numerator [{route}]', numer_step, params, frames, nf, labels, nl)
    results[f'decode_{route}'] = timeit(
        f'decode [{route}]', decode_step, params, frames, nf)

  hat = build(locally_normalized=True)
  hat_params = hat.init(jax.random.PRNGKey(1), feature_size=H)
  for route, flag in (('scan', False), ('factored', True)):
    hat._factorize_s1 = flag

    def hat_step(eps, p, f, nf, y, ny):
      return chained_timer.gsum(jax.grad(lambda p_, f_: jnp.sum(
          hat(p_, frames=f_, num_frames=nf, labels=y, num_labels=ny)),
          argnums=(0, 1))(p, f + eps))

    results[f'hat_{route}'] = timeit(
        f'HAT numerator-only train [{route}]', hat_step, hat_params,
        frames, nf, labels, nl)

  sp = results['loss_scan'] / results['loss_factored']
  print(f"\nspeedups: loss {sp:.2f}x  "
        f"denom {results['denom_scan'] / results['denom_factored']:.2f}x  "
        f"numer {results['numer_scan'] / results['numer_factored']:.2f}x  "
        f"decode {results['decode_scan'] / results['decode_factored']:.2f}x  "
        f"hat {results['hat_scan'] / results['hat_factored']:.2f}x  "
        f"-> {B * T / results['loss_factored']:.0f} frames/s ctc-like")


if __name__ == '__main__':
  main()
