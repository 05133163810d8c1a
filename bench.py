"""Benchmark: GNAT loss fwd+bwd on the driver-set headline config.

Headline (BASELINE.json): frames/sec/chip for the globally-normalized GNAT
loss forward+backward at B=32, T=1600, bigram context (1025 states),
V=1024, FrameLabelDependent(k=2), shared-emb JointWeightFn (hidden 512).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch-CPU reference measured by
``benchmarks/measure_reference.py`` (stored in
``benchmarks/reference_baseline.json``; the reference publishes no numbers
of its own — see BASELINE.md).

Details (per-config timings) go to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Keep compile times reasonable on repeat runs.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))

from last_torch_tpu import alignments, contexts, lattices, semirings, weight_fns  # noqa: E402


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def build_headline_lattice(batch=32, max_frames=1600, vocab=1024,
                           context_size=1, hidden=512, emb=512, feature=512,
                           max_labels=100, max_expansions=2, seed=0):
  context = contexts.FullNGram(vocab_size=vocab, context_size=context_size)
  num_states, _ = context.shape()
  lattice = lattices.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=max_expansions),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=num_states, embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden,
          compute_dtype=jnp.bfloat16))
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=feature)

  rng = np.random.default_rng(seed)
  frames = jnp.asarray(
      rng.normal(size=(batch, max_frames, feature)) * 0.1, jnp.float32)
  num_frames = jnp.full((batch,), max_frames, jnp.int32)
  labels = jnp.asarray(
      rng.integers(1, vocab + 1, size=(batch, max_labels)), jnp.int32)
  num_labels = jnp.full((batch,), max_labels, jnp.int32)
  return lattice, params, frames, num_frames, labels, num_labels


def time_fn(fn, *args, iters=3, warmup=1):
  for _ in range(warmup):
    jax.block_until_ready(fn(*args))
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    times.append(time.perf_counter() - t0)
  return float(np.median(times))


def bench_headline():
  """Globally-normalized GNAT loss fwd+bwd, headline config."""
  lattice, params, frames, num_frames, labels, num_labels = (
      build_headline_lattice())

  def mean_loss(params, frames):
    loss = lattice(params, frames, num_frames, labels, num_labels)
    return jnp.sum(loss)

  grad_fn = jax.jit(jax.value_and_grad(mean_loss, argnums=(0, 1)))

  t_compile0 = time.perf_counter()
  jax.block_until_ready(grad_fn(params, frames))
  log(f'headline compile+first-step: '
      f'{time.perf_counter() - t_compile0:.1f}s')

  p50 = time_fn(grad_fn, params, frames, iters=3)
  batch, max_frames = frames.shape[0], frames.shape[1]
  frames_per_sec = batch * max_frames / p50
  log(f'headline p50 step: {p50 * 1e3:.1f} ms; '
      f'{frames_per_sec:,.0f} frames/s/chip')
  return frames_per_sec, p50


def bench_secondary():
  """Smaller sanity configs from BASELINE.json (reported to stderr only)."""
  results = {}

  # Config 1/2: tiny lattice loss + Viterbi.
  lattice, params, frames, num_frames, labels, num_labels = (
      build_headline_lattice(batch=2, max_frames=8, vocab=8, hidden=64,
                             emb=64, feature=64, max_labels=4,
                             max_expansions=0 or 2))
  loss_fn = jax.jit(
      lambda p, f: jnp.sum(lattice(p, f, num_frames, labels, num_labels)))
  results['tiny_loss_ms'] = time_fn(loss_fn, params, frames) * 1e3

  sp_fn = jax.jit(lambda p, f: lattice.shortest_path(p, f, num_frames))
  results['tiny_viterbi_ms'] = time_fn(sp_fn, params, frames) * 1e3

  return results


def main():
  only_headline = '--full' not in sys.argv
  frames_per_sec, p50 = bench_headline()

  baseline_path = os.path.join(
      os.path.dirname(__file__), 'benchmarks', 'reference_baseline.json')
  vs_baseline = None
  if os.path.exists(baseline_path):
    with open(baseline_path) as f:
      ref = json.load(f)
    ref_fps = ref.get('frames_per_sec')
    if ref_fps:
      vs_baseline = frames_per_sec / ref_fps
      log(f'reference (torch CPU): {ref_fps:,.1f} frames/s '
          f'=> {vs_baseline:,.1f}x')

  if not only_headline:
    log(f'secondary: {bench_secondary()}')

  print(json.dumps({
      'metric': 'gnat_global_loss_fwd_bwd_frames_per_sec_per_chip',
      'value': round(frames_per_sec, 1),
      'unit': 'frames/s/chip',
      'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
  }))


if __name__ == '__main__':
  main()
