"""HAT numerator-only training: roofline position and loop-order A/B.

The locally-normalized (HAT) loss is numerator-only (reference
``lattices.py:178-179``), and its cost is dominated by
``LocallyNormalizedWeightFn.label_weights``: the full vocab head must run
once per (label position, frame) pair for the local normalizer, fixing
the matmul work at 2*B*T*(U+1)*h*V FLOPs forward. With the rematerialized
backward (recompute + d(joint) + d(vocab_w) ~ 3 more such matmuls) the
headline-shape step (B=32 T=1600 U=100 V=1024 h=512) is ~21.7 TFLOP
=> 110 ms at the v5e's 197 TFLOP/s bf16 peak, 129 ms at the 168 TFLOP/s
a bare chained-matmul loop measures (ops/README.md).

This script times the full HAT train step (loss fwd+bwd) and the
label_weights stage alone (fwd and fwd+bwd), printing the % of the
matmul floor. Round-4 change measured here: scanning label_weights over
FRAMES instead of label positions (same FLOPs, ~16x smaller per-step
logits, 6.6 MB instead of 105 MB reverse-scan carry).

Usage: python benchmarks/tpu_hat_numerator_bench.py

Results (v5e, 2026-08-17, round 4):
  position-major (round 2/3): full HAT step 420.7 ms (26% of peak floor)
  frame-major XLA scan:       full HAT step 258.9-264.7 ms -> 197.8k
    frames/s (43% of peak floor / 50% of measured-achievable)
  fused numerator kernel (ops/numerator_scan.py, whole-sequence
  pallas_call, T in the grid): full HAT step 216.2-218.1 ms ->
    ~236k frames/s (51% of peak floor / 60% of measured-achievable),
    1.22x the XLA scan in a same-process A/B (--ab flag); grads within
    1.1e-3 of global scale at the shared bf16 contract. Forward alone
    82.9 ms. Variants measured and rejected on hardware: B-step fori
    joint build (226.8 ms step), exact 0/1 selector matmuls at
    precision=highest (296.6 ms), FRAMES_PER_CELL=2 unroll (216.2 ms —
    a wash; Mosaic does not software-pipeline across the unrolled
    frames). Position: the kernel sits at ~92% of its SERIAL
    MXU+VPU floor (matmul ~21 us/frame + irreducible exp/tanh/reduce
    VPU work ~25-30 us/frame that cannot overlap within a frame); the
    remaining documented lever is cross-frame MXU/VPU software
    pipelining, which this Mosaic does not do automatically.
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
from benchmarks import chained_timer  # noqa: E402

B, T, U, V, H = 32, 1600, 100, 1024, 512
PEAK, ACH = 197e12, 168e12


def force(out):
  # block_until_ready is unreliable over the tunneled backend (can return
  # in 0.1 ms while the step still runs — bench.py `_force` diagnosis);
  # pulling one scalar output leaf guarantees the program executed.
  next(l for l in jax.tree.leaves(out) if l.ndim == 0).item()




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
  cache = lattice.build_cache(params)
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(B, T, H)) * 0.1, jnp.float32)
  nf = jnp.full((B,), T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  nl = jnp.full((B,), U, jnp.int32)

  states = context.walk_states(labels)
  next_labels = jnp.concatenate([labels, jnp.ones_like(labels[:, :1])],
                                axis=-1)

  fwd_floor = 2 * B * T * (U + 1) * H * V / PEAK
  step_floor = 4 * 2 * B * T * (U + 1) * H * V / PEAK

  # All timings use the chained in-jit pattern: the per-call pattern
  # carries a ~30 ms per-dispatch tunnel round trip (round-4 discovery),
  # which inflated every number in this file's original results block.
  def lw_fwd_step(eps, p, f):
    return sum(jnp.sum(x.astype(jnp.float32))
               for x in lattice.weight_fn.label_weights(
                   p['weight_fn'], cache, f + eps, states, next_labels))

  t = chained_timer.measure('label_weights fwd', lw_fwd_step, params,
                            frames, n=5, quiet=True)
  print(f'label_weights fwd: {t * 1e3:.1f} ms '
        f'({fwd_floor / t * 100:.0f}% of the {fwd_floor * 1e3:.1f} ms '
        'peak-matmul floor)', flush=True)

  def lw_bwd_step(eps, p, f):
    v, g = jax.value_and_grad(lambda p_, f_: sum(
        jnp.sum(x.astype(jnp.float32))
        for x in lattice.weight_fn.label_weights(
            p_['weight_fn'], cache, f_, states, next_labels)),
        argnums=(0, 1))(p, f + eps)
    return v + chained_timer.gsum(g)

  t = chained_timer.measure('label_weights fwd+bwd', lw_bwd_step, params,
                            frames, n=5, quiet=True)
  print(f'label_weights fwd+bwd: {t * 1e3:.1f} ms '
        f'({step_floor / t * 100:.0f}% of the {step_floor * 1e3:.1f} ms '
        'peak floor)', flush=True)

  def hat_step(eps, p, f):
    v, g = jax.value_and_grad(lambda p_, f_: jnp.sum(
        lattice(p_, f_, nf, labels, nl)), argnums=(0, 1))(p, f + eps)
    return v + chained_timer.gsum(g)

  hat_fn = jax.jit(jax.value_and_grad(lambda p, f: jnp.sum(
      lattice(p, f, nf, labels, nl))))
  t = chained_timer.measure('HAT train step', hat_step, params, frames,
                            n=5, quiet=True)
  ach_floor = step_floor * PEAK / ACH
  from last_torch_tpu.ops import numerator_scan
  label = ('fused numerator kernel'
           if numerator_scan.supported(
               lattice.weight_fn.weight_fn, cache, frames,
               jnp.zeros((B, U + 1), jnp.int32),
               jnp.zeros((B, U + 1), jnp.int32)) else 'XLA scan')
  print(f'HAT train step ({label}, loss fwd+bwd): {t * 1e3:.1f} ms -> '
        f'{B * T / t / 1e3:.1f}k frames/s/chip '
        f'({step_floor / t * 100:.0f}% of peak floor, '
        f'{ach_floor / t * 100:.0f}% of measured-achievable floor)',
        flush=True)

  if '--ab' in sys.argv and label == 'fused numerator kernel':
    # Same-process A/B: the XLA frame-major scan route, so tunnel
    # variance between runs cannot masquerade as a kernel win/loss.
    numerator_scan.DISABLE = True
    try:
      plain_fn = jax.jit(jax.value_and_grad(lambda p, f: jnp.sum(
          lattice(p, f, nf, labels, nl))))

      def plain_step(eps, p, f):
        v, g = jax.value_and_grad(lambda p_, f_: jnp.sum(
            lattice(p_, f_, nf, labels, nl)), argnums=(0, 1))(p, f + eps)
        return v + chained_timer.gsum(g)

      tp = chained_timer.measure('HAT train step (XLA scan)', plain_step,
                                 params, frames, n=5, quiet=True)
      print(f'HAT train step (XLA scan route): {tp * 1e3:.1f} ms -> '
            f'kernel is {tp / t:.2f}x', flush=True)
      # Numerics: kernel-vs-XLA at the shared bf16 contract. Compared
      # ON DEVICE (device_get of large grads over the tunnel is ~25KB/s).
      # hat_fn's executable was compiled while the kernel was enabled, so
      # calling it here still runs the kernel route.
      vk, gk = hat_fn(params, frames)
      vx, gx = plain_fn(params, frames)

      @jax.jit
      def gstats(gk, gx):
        gscale = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(x)) for x in jax.tree.leaves(gx)]))
        gerr = jnp.max(jnp.asarray(
            [jnp.max(jnp.abs(a - b))
             for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gx))]))
        return gerr / gscale

      rel = abs(vk.item() - vx.item()) / max(abs(vx.item()), 1e-9)
      print(f'kernel-vs-XLA: loss rel {rel:.1e}, grads within '
            f'{gstats(gk, gx).item():.1e} of global scale', flush=True)
    finally:
      numerator_scan.DISABLE = False


if __name__ == '__main__':
  main()
