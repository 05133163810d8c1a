"""Bisects the S=1 (CTC-topology) loss cost on the TPU.

Times, in one process (tunnel variance makes cross-run comparison
meaningless), the grad of each sub-piece of the factorized S=1 route at
the ctc-like config (B=32 T=1600 U=100 V=1024 h=512, FLD k=2, bf16):

  - weights:      vmapped JointWeightFn.apply over all frames (the head
                  matmuls), loss = sum(blank) + sum(lexical)
  - weights+lse:  same plus the logsumexp over V the denominator needs
  - denominator:  full `_forward_s1` shortest distance (Log)
  - str-weights:  the S=1 branch of `_string_weights` (head + gather)
  - str-dp:       `_string_dp` alone on precomputed weights (grad wrt
                  the weight arrays — isolates the T-step lax.scan)
  - loss:         full `lattice.loss` fwd+bwd

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_s1_profile.py
"""

import time

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns

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


def force(tree):
  return float(jnp.asarray(jax.tree.leaves(tree)[0]).reshape(-1)[0])


def timeit(tag, fn, *args, iters=5):
  force(fn(*args))  # compile + first step
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    force(fn(*args))
    times.append((time.perf_counter() - t0) * 1e3)
  p50 = sorted(times)[len(times) // 2]
  print(f'{tag}: p50 {p50:.1f} ms ({[round(t, 1) for t in times]})',
        flush=True)
  return p50


def main():
  rng = np.random.default_rng(0)
  lat = build()
  params = lat.init(jax.random.PRNGKey(0), feature_size=H)
  frames = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
  num_frames = jnp.full((B,), T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  num_labels = jnp.full((B,), U, jnp.int32)
  cache = lat.build_cache(params)

  state0 = jnp.zeros((B,), jnp.int32)

  # 1. weights only (head matmuls).
  def weights_loss(p, f):
    blank, lexical = jax.vmap(
        lambda fr: lat.weight_fn.apply(p['weight_fn'], cache, fr, state0),
        in_axes=-2, out_axes=(-1, -2))(f)
    return jnp.sum(blank) + jnp.sum(lexical)

  timeit('weights grad', jax.jit(jax.grad(weights_loss)), params, frames)

  # 2. weights + logsumexp over V.
  def weights_lse_loss(p, f):
    blank, lexical = jax.vmap(
        lambda fr: lat.weight_fn.apply(p['weight_fn'], cache, fr, state0),
        in_axes=-2, out_axes=(-1, -2))(f)
    return jnp.sum(blank) + jnp.sum(
        semirings.Log.sum(lexical, axis=-1))

  timeit('weights+lse grad', jax.jit(jax.grad(weights_lse_loss)), params,
         frames)

  # 3. denominator (full _forward_s1 under Log).
  def denom_loss(p, f, nf):
    c = lat.weight_fn_cacher.apply(p['cacher'])
    dist, _ = lat._forward_s1(p['weight_fn'], c, f, nf, semirings.Log,
                              None, None, lambda w: w)
    return jnp.sum(dist)

  timeit('denominator grad', jax.jit(jax.grad(denom_loss)), params, frames,
         num_frames)

  # 4. string weights (S=1 branch: head + label-column gather).
  def str_weights_loss(p, f, lbl):
    bw, lw = lat._string_weights(
        {'weight_fn': p['weight_fn']}, cache, f, lbl)
    return jnp.sum(bw) + jnp.sum(lw)

  timeit('str-weights grad', jax.jit(jax.grad(str_weights_loss)), params,
         frames, labels)

  # 5. string DP alone on precomputed weights.
  bw, lw = jax.jit(lambda p, f, lbl: lat._string_weights(
      {'weight_fn': p['weight_fn']}, cache, f, lbl))(params, frames, labels)
  bw = jax.block_until_ready(bw)

  def str_dp_loss(bw_, lw_, nf, nl):
    return jnp.sum(lat._string_dp(bw_, lw_, nf, nl, semirings.Log))

  timeit('str-dp grad', jax.jit(jax.grad(str_dp_loss, argnums=(0, 1))),
         bw, lw, num_frames, num_labels)

  # 6. full loss.
  def full_loss(p, f, nf, lbl, nl):
    return jnp.sum(lat.loss(p, f, nf, lbl, nl))

  timeit('full loss grad', jax.jit(jax.grad(full_loss)), params, frames,
         num_frames, labels, num_labels)
  print('last_path:', lat.last_path, flush=True)


if __name__ == '__main__':
  main()
