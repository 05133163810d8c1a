"""Amortized (in-jit chained) timing of the S=1 loss sub-pieces.

`tpu_s1_profile.py` showed every sub-piece pinned at ~30 ms — the
per-dispatch tunnel round-trip floor, not compute. Here each piece runs
N times INSIDE one jit (iterations chained through a scalar so XLA
cannot CSE or parallelize them) and the per-iteration cost is
(t_N - t_1) / (N - 1), which cancels both the RTT and the first
iteration.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_s1_profile2.py
"""

import functools
import time

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, semirings, weight_fns

B, T, U, V, H = 32, 1600, 100, 1024, 512
N = 10


def build():
  context = contexts.FullNGram(vocab_size=V, context_size=0)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=V, hidden_size=H, compute_dtype=jnp.bfloat16))


def chain(step, n):
  """Runs ``step(eps) -> scalar`` n times, serialized through eps."""

  def run(*args):
    def body(i, acc):
      return acc + 1e-30 * step(1e-12 * acc, *args)
    return jax.lax.fori_loop(0, n, body, 0.0)

  return jax.jit(run)


def measure(tag, step, *args, iters=3):
  one = chain(step, 1)
  many = chain(step, N)
  float(one(*args))  # compile
  float(many(*args))
  t1s, tns = [], []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(one(*args))
    t1s.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    float(many(*args))
    tns.append(time.perf_counter() - t0)
  t1 = sorted(t1s)[len(t1s) // 2]
  tn = sorted(tns)[len(tns) // 2]
  per = (tn - t1) / (N - 1) * 1e3
  print(f'{tag}: {per:.2f} ms/iter  (t1 {t1*1e3:.1f} ms, tN {tn*1e3:.1f} ms)',
        flush=True)
  return per


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

  def gsum(g):
    return sum(jnp.sum(x) for x in jax.tree.leaves(g))

  # 1. weights only (head matmuls) fwd+bwd.
  def weights_step(eps, p, f):
    def loss(p_, f_):
      blank, lexical = jax.vmap(
          lambda fr: lat.weight_fn.apply(p_['weight_fn'], cache, fr,
                                         state0),
          in_axes=-2, out_axes=(-1, -2))(f_)
      return jnp.sum(blank) + jnp.sum(lexical)
    return gsum(jax.grad(loss)(p, f + eps))

  measure('weights grad', weights_step, params, frames)

  # 2. weights + logsumexp over V.
  def wlse_step(eps, p, f):
    def loss(p_, f_):
      blank, lexical = jax.vmap(
          lambda fr: lat.weight_fn.apply(p_['weight_fn'], cache, fr,
                                         state0),
          in_axes=-2, out_axes=(-1, -2))(f_)
      return jnp.sum(blank) + jnp.sum(semirings.Log.sum(lexical, axis=-1))
    return gsum(jax.grad(loss)(p, f + eps))

  measure('weights+lse grad', wlse_step, params, frames)

  # 3. denominator.
  def denom_step(eps, p, f, nf):
    def loss(p_, f_):
      c = lat.weight_fn_cacher.apply(p_['cacher'])
      dist, _ = lat._forward_s1(p_['weight_fn'], c, f_, nf, semirings.Log,
                                None, None, lambda w: w)
      return jnp.sum(dist)
    return gsum(jax.grad(loss)(p, f + eps))

  measure('denominator grad', denom_step, params, frames, num_frames)

  # 4. string weights.
  def strw_step(eps, p, f, lbl):
    def loss(p_, f_):
      bw, lw = lat._string_weights(
          {'weight_fn': p_['weight_fn']}, cache, f_, lbl)
      return jnp.sum(bw) + jnp.sum(lw)
    return gsum(jax.grad(loss)(p, f + eps))

  measure('str-weights grad', strw_step, params, frames, labels)

  # 5. string DP on precomputed weights.
  bw, lw = jax.jit(lambda p, f, lbl: lat._string_weights(
      {'weight_fn': p['weight_fn']}, cache, f, lbl))(params, frames, labels)

  def strdp_step(eps, bw_, lw_, nf, nl):
    def loss(b, l):
      return jnp.sum(lat._string_dp(b, l, nf, nl, semirings.Log))
    return gsum(jax.grad(loss, argnums=(0, 1))(bw_ + eps, lw_))

  measure('str-dp grad', strdp_step, bw, lw, num_frames, num_labels)

  # 6. full loss.
  def full_step(eps, p, f, nf, lbl, nl):
    def loss(p_, f_):
      return jnp.sum(lat.loss(p_, f_, nf, lbl, nl))
    return gsum(jax.grad(loss)(p, f + eps))

  measure('full loss grad', full_step, params, frames, num_frames, labels,
          num_labels)

  # 7. HAT numerator-only training step equivalent (locally normalized).
  lat_hat = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=V, context_size=0),
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.LocallyNormalizedWeightFn(
          weight_fns.JointWeightFn(vocab_size=V, hidden_size=H,
                                   compute_dtype=jnp.bfloat16)))
  params_hat = lat_hat.init(jax.random.PRNGKey(1), feature_size=H)

  def hat_step(eps, p, f, nf, lbl, nl):
    def loss(p_, f_):
      return jnp.sum(lat_hat.loss(p_, f_, nf, lbl, nl))
    return gsum(jax.grad(loss)(p, f + eps))

  measure('HAT numerator grad', hat_step, params_hat, frames, num_frames,
          labels, num_labels)


if __name__ == '__main__':
  main()
