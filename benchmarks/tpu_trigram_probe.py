"""Measures the trigram (context_size=2) XLA loss against its matmul floor.

The fused kernels cover bigram only; trigram runs the XLA scan path. A
"trigram fused reduce" kernel was considered and shelved in round 2 — this
probe records the actual number behind that call: the measured XLA
fwd+bwd step time at a realistic trigram config (V=64, S=4161, hidden
512) next to the joint-network matmul floor, i.e. the best any fused
kernel could do. The gap bounds the win a trigram kernel could deliver.

The trigram structure differs from bigram in the reduce: destination
state (y_prev, y) receives from all (·, y_prev) source states — a
block-structured reshape-sum (contexts.FullNGram.forward_reduce), not the
bigram's dense [S, V] -> V logsumexp. The XLA path already fuses the
reduce into a few elementwise+reshape ops around the head matmul; the
kernel's remaining lever is only HBM traffic on the [B, S, V] lexical
tensor.

Usage: python benchmarks/tpu_trigram_probe.py

Results (v5e, recorded 2026-08-17, round 3): see ops/README.md
("trigram fused reduce" negative-result entry).
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


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  vocab, hidden, emb = 64, 512, 512
  batch, max_t, max_u = 8, 200, 20
  k = 2
  context = contexts.FullNGram(vocab_size=vocab, context_size=2)
  num_states = context.shape()[0]

  def make(fused):
    return last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameLabelDependent(max_expansions=k),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=num_states, embedding_size=emb),
        weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
            vocab_size=vocab, hidden_size=hidden,
            compute_dtype=jnp.bfloat16),
        fused=fused)

  lattice = make('never')
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

  grad_fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
  # .item() forces execution; block_until_ready is unreliable over the
  # tunneled backend (bench.py `_force` diagnosis).
  t0 = time.monotonic()
  grad_fn(params, frames)[0].item()
  compile_s = time.monotonic() - t0
  times = []
  for _ in range(3):
    t0 = time.monotonic()
    grad_fn(params, frames)[0].item()
    times.append(time.monotonic() - t0)
  step_ms = float(np.median(times)) * 1e3

  # Matmul floor: the vocab-head dot dominates. Per frame per expansion
  # pass: [B*S, h] x [h, V] = 2*B*S*h*V FLOPs; the forward runs k+1
  # weight passes per frame amortized to ONE joint+head compute in a
  # fused design (the E-cache trick), the backward needs ~2x the
  # forward's matmul work (recompute + two grad dots). Use 3x one pass
  # as the optimistic fused-floor multiplier, at the measured achievable
  # bf16 rate (168 TFLOP/s, ops/README.md roofline).
  flops_per_frame = 2.0 * batch * num_states * hidden * vocab
  floor_ms = 3.0 * max_t * flops_per_frame / 168e12 * 1e3
  # HBM bound of the XLA path: the [B, S, V] lexical tensor (bf16) is
  # written+read a handful of times per frame in fwd+bwd.
  lex_bytes = batch * num_states * vocab * 2.0
  hbm_ms = 6.0 * max_t * lex_bytes / 819e9 * 1e3  # v5e ~819 GB/s

  print(f'trigram V={vocab} S={num_states} B={batch} T={max_t} '
        f'hidden={hidden} k={k}', flush=True)
  print(f'XLA fwd+bwd step: {step_ms:.1f} ms (compile {compile_s:.1f}s)',
        flush=True)
  # In-process A/B vs the fused joint+head kernel (ops/joint_head.py;
  # gated off by default after this probe measured it at 0.66x XLA —
  # the module note records the numbers). Same process, so tunnel
  # variance between runs cannot masquerade as a kernel win/loss.
  from last_torch_tpu.ops import joint_head
  joint_head.FORCE = True
  try:
    assert joint_head.supported(
        lattice.weight_fn, jnp.zeros((num_states, emb)),
        jnp.zeros((batch, hidden)), None), 'joint_head did not gate in'
    jh_fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
    t0 = time.monotonic()
    jh_fn(params, frames)[0].item()
    jh_compile_s = time.monotonic() - t0
    times = []
    for _ in range(3):
      t0 = time.monotonic()
      jh_fn(params, frames)[0].item()
      times.append(time.monotonic() - t0)
    jh_ms = float(np.median(times)) * 1e3
    print(f'XLA+joint_head (FORCE) fwd+bwd step: {jh_ms:.1f} ms '
          f'(compile {jh_compile_s:.1f}s) -> joint_head is '
          f'{step_ms / jh_ms:.2f}x over plain XLA', flush=True)
  finally:
    joint_head.FORCE = False
  print(f'fused matmul floor (optimistic): {floor_ms:.1f} ms; '
        f'XLA HBM estimate for lexical traffic: {hbm_ms:.1f} ms',
        flush=True)
  print(f'max possible fused speedup ~{step_ms / max(floor_ms, 1e-9):.2f}x',
        flush=True)

  if '--decompose' in sys.argv:
    # Where do the 134 ms go? Time the pieces of the scan step.
    cache = lattice.build_cache(params)

    def weights_only(params, frames):
      # Just the per-frame joint + heads, reduced to force execution.
      def step(carry, frame):
        blank, lexical = lattice.weight_fn.apply(params['weight_fn'],
                                                 cache, frame)
        return carry + jnp.sum(blank) + jnp.sum(lexical), None
      total, _ = jax.lax.scan(step, jnp.zeros(()),
                              jnp.moveaxis(frames, -2, 0))
      return total

    wfn = jax.jit(weights_only)
    wfn(params, frames).item()
    times = []
    for _ in range(3):
      t0 = time.monotonic()
      wfn(params, frames).item()
      times.append(time.monotonic() - t0)
    print(f'  weights-only scan (joint+heads, no DP): '
          f'{float(np.median(times)) * 1e3:.1f} ms', flush=True)

    fwd_fn = jax.jit(total_loss)
    fwd_fn(params, frames).item()
    times = []
    for _ in range(3):
      t0 = time.monotonic()
      fwd_fn(params, frames).item()
      times.append(time.monotonic() - t0)
    print(f'  loss forward only: {float(np.median(times)) * 1e3:.1f} ms',
          flush=True)

  # The segment-major fused trigram kernel pair (ops/trigram_scan.py),
  # force-enabled: it is gated off by default on hardware (measured
  # slower than XLA; see the module note).
  from last_torch_tpu.ops import trigram_scan
  trigram_scan.FORCE = True
  fused_lattice = make('auto')
  assert fused_lattice.would_fuse(frames), 'trigram kernel did not gate in'

  def fused_loss(params, frames):
    return jnp.sum(fused_lattice(params, frames, num_frames, labels,
                                 num_labels))

  fgrad = jax.jit(jax.value_and_grad(fused_loss, argnums=(0, 1)))
  t0 = time.monotonic()
  (fval, fg) = fgrad(params, frames)
  fval.item()
  fcompile = time.monotonic() - t0
  times = []
  for _ in range(3):
    t0 = time.monotonic()
    fgrad(params, frames)[0].item()
    times.append(time.monotonic() - t0)
  fused_ms = float(np.median(times)) * 1e3
  print(f'FUSED kernel fwd+bwd step: {fused_ms:.1f} ms '
        f'(compile {fcompile:.1f}s) -> {step_ms / fused_ms:.2f}x over XLA',
        flush=True)
  # Numerical sanity vs the XLA value/grads at the bf16 contract.
  (xval, xg) = jax.jit(jax.value_and_grad(total_loss,
                                          argnums=(0, 1)))(params, frames)
  rel = abs(float(fval) - float(xval)) / max(abs(float(xval)), 1e-9)
  leaves_f = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(fg))]
  leaves_x = [np.asarray(x) for x in jax.tree.leaves(jax.device_get(xg))]
  gscale = max(np.abs(x).max() for x in leaves_x)
  gerr = max(np.abs(a - b).max() / gscale
             for a, b in zip(leaves_f, leaves_x))
  print(f'fused-vs-XLA: loss rel {rel:.1e}, grads within {gerr:.1e} of '
        f'global scale', flush=True)


if __name__ == '__main__':
  main()
