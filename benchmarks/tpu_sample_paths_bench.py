"""Times exact posterior path sampling (FFBS) at headline shapes.

``RecognitionLattice.sample_paths`` runs two float32 XLA weight-fn
applications per frame (one in the reverse beta scan, one in the forward
sampling scan) plus O(num_samples) per-sample work. This bench pins that
down on the real chip at the headline configuration (B=32 T=1600 V=1024
h=512, bigram FLD k=2) across num_samples, and times the composed
expected-risk loss (``risk.sampled_risk_loss``, sampling + label
extraction + batched edit distance) for the MWER fine-tuning story.

Measured 2026-08-19 (v5e, after optimization 4 below):

  sample_paths m=1 / 4 / 16:   1320 / 1347 / 1429 ms  (was 2290 / 2629 /
                               2703 in round 4)
  sampled_risk_loss m=4:       1356 ms (the edit distance is free)
  => an MWER step's sampling+risk side now costs ~0.77x the headline
     likelihood loss fwd+bwd (1752 ms); m=4 is 38.0k frames/s.

Optimization history (same shapes, measured at T=400 then confirmed at
T=1600) — four TPU-specific rewrites, ~16x in total:

  1. Never materialize the per-expansion [B, S, V] arc-score tensors in
     the sampling pass — compute continuation VALUES with fused
     logsumexps and assemble scores only at the M sampled rows
     (5307 -> 3890 ms at T=400 m=4; also fixed the headline dispatch,
     whose ~21 s single call crashed the remote worker).
  2. Row-gathering [B, S, V] weights with take_along_axis is ~48x
     slower than a one-hot MXU contraction at HIGHEST precision
     (in-scan A/B: 14.5 -> 0.3 ms/frame at M=16) — the 0/1 matmul is
     f32-exact, keeping the sampler's float32 contract.
  3. For FullNGram(context_size<=1) the next-state row is
     sample-independent (label y always leads to state y), so the
     per-sample continuation gather is a broadcast (m=16: 5004 -> 703
     ms; samples became genuinely near-free).
  4. (round 5) The sampling pass runs NO dense weight pass at all: the
     reverse beta scan also emits the per-expansion continuation VALUE
     histories (k extra [T, B, S] outputs, ~0.1% of its existing
     per-frame weight tensor), and the forward pass computes arc
     weights only at the M sampled context rows via the weight fn's
     per-state form under a vmap over samples (m=4: 2629 -> 1347 ms —
     phase 2 went from ~half the total to ~nothing; VERDICT round-4
     task 2, bar was <=1500 ms).

Timing is per-call with a single f32 scalar pulled via ``.item()``
(seconds-scale programs; the ~30 ms tunnel RTT is noise here).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/tpu_sample_paths_bench.py
"""

import time

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, risk, weight_fns

B, T, U, V, H = 32, 1600, 100, 1024, 512


def main():
  lattice = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=V, context_size=1),
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=V, hidden_size=H))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=H)

  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
  nf = jnp.full((B,), T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  nl = jnp.full((B,), U, jnp.int32)
  key = jax.random.PRNGKey(7)

  def timeit(tag, fn, *args, n=5):
    fn(*args)  # compile + first run
    t0 = time.perf_counter()
    for _ in range(n):
      out = fn(*args)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f'{tag}: {dt:.1f} ms/iter (scalar {out:.3f})', flush=True)
    return dt

  for m in (1, 4, 16):
    sample = jax.jit(lambda p, f, k, _m=m: lattice.sample_paths(
        p, f, nf, k, num_samples=_m)[2].sum())
    timeit(f'sample_paths m={m}', lambda p, f, k: sample(p, f, k).item(),
           params, frames, key)

  er = jax.jit(lambda p, f, k: risk.sampled_risk_loss(
      lattice, p, f, nf, labels, nl, k, num_samples=4,
      estimator='reinforce')[0].mean())
  timeit('sampled_risk_loss m=4 (sampling + edit distance)',
         lambda p, f, k: er(p, f, k).item(), params, frames, key)


if __name__ == '__main__':
  main()
