"""Benchmark: GNAT loss fwd+bwd on the driver-set headline config.

Headline (BASELINE.json): frames/sec/chip for the globally-normalized GNAT
loss forward+backward at B=32, T=1600, bigram context (1025 states),
V=1024, FrameLabelDependent(k=2), shared-emb JointWeightFn (hidden 512).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` compares against the PyTorch-CPU reference measured by
``benchmarks/measure_reference.py`` (stored in
``benchmarks/reference_baseline.json``; the reference publishes no numbers
of its own — see BASELINE.md).

``--full`` additionally measures the other BASELINE.json configs (tiny
loss, Viterbi decode, trigram table lattice, Expectation-semiring entropy)
and the decode throughput at headline shapes; details go to stderr.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Keep compile times reasonable on repeat runs. The persistent cache keys
# on the lowered HLO + compile options (not Python source), so it hits
# across rounds unless the kernels themselves changed. min_compile_time
# must be forced to 0 here the same way tests do (the env-var spellings
# are ignored by this jax version) or small secondary-config executables
# are silently never cached.
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
# Surface persistent-cache misses in the stderr log: the cold
# compile+first-step tripled across rounds 1-3 before anyone could tell
# a cache miss from tunnel slowness (BASELINE.md "cold compile" note).
jax.config.update('jax_explain_cache_misses', True)

# Every function's FIRST trace logs a "never seen function" miss — pure
# noise under this flag. Keep only the actionable records: the SAME
# function (same "defined at file:line") missing MORE THAN ONCE, i.e. a
# closure re-created per call, which defeats jax's tracing caches on
# every retrace (fixed in round 5 by caching the custom-VJP objects and
# kernel partials; this filter keeps the bench tail a regression alarm
# for that class of bug). jax's own "defined on the same line" hint is
# NOT usable for this: it keys on the CALLSITE, so the second distinct
# pl.when closure traced through one call site trips it even on a
# healthy cold trace (three first-time closures inside one kernel did,
# every run).
import logging  # noqa: E402
import re  # noqa: E402


class _OnlyRedefinitionMisses(logging.Filter):

  _DEFINED_AT = re.compile(r'defined at (\S+:\d+|\S+)')

  def __init__(self):
    super().__init__()
    self._seen = set()

  def filter(self, record):
    msg = record.getMessage()
    if 'TRACING CACHE MISS' not in msg:
      return True
    m = self._DEFINED_AT.search(msg)
    loc = m.group(1) if m else msg
    if loc in self._seen:
      return True  # second+ miss of the same function: a real retrace
    self._seen.add(loc)
    return False


logging.getLogger('jax._src.interpreters.partial_eval').addFilter(
    _OnlyRedefinitionMisses())

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import last_torch_tpu  # noqa: E402
from last_torch_tpu import (alignments, contexts, lattices, semirings,  # noqa: E402
                            weight_fns)
from benchmarks import chained_timer  # noqa: E402


def log(msg):
  print(msg, file=sys.stderr, flush=True)


def build_lattice(vocab, context_size=1, hidden=512, emb=512,
                  max_expansions=2, feature=512, seed=0,
                  locally_normalized=False):
  context = contexts.FullNGram(vocab_size=vocab, context_size=context_size)
  num_states, _ = context.shape()

  def wf_factory(ctx):
    joint = weight_fns.JointWeightFn(
        vocab_size=vocab, hidden_size=hidden, compute_dtype=jnp.bfloat16)
    if locally_normalized:
      return weight_fns.LocallyNormalizedWeightFn(joint)
    return joint

  lattice = lattices.RecognitionLattice(
      context=context,
      alignment=(alignments.FrameLabelDependent(max_expansions=max_expansions)
                 if max_expansions else alignments.FrameDependent()),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=num_states, embedding_size=emb),
      weight_fn_factory=wf_factory)
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=feature)
  return lattice, params


def make_batch(batch, max_frames, max_labels, vocab, feature=512, seed=0):
  rng = np.random.default_rng(seed)
  return dict(
      frames=jnp.asarray(
          rng.normal(size=(batch, max_frames, feature)) * 0.1, jnp.float32),
      num_frames=jnp.full((batch,), max_frames, jnp.int32),
      labels=jnp.asarray(
          rng.integers(1, vocab + 1, size=(batch, max_labels)), jnp.int32),
      num_labels=jnp.full((batch,), max_labels, jnp.int32))


def _decode_checksum(decoded):
  labels, num, path_weights = decoded
  return jnp.sum(labels) + jnp.sum(num) + jnp.sum(path_weights)


def _force(out):
  """Forces execution: pulls one scalar leaf to the host.

  ``jax.block_until_ready`` does not reliably block over the tunneled
  backend (measured returning in 0.1 ms while the real step was 1.76 s —
  round-4 diagnosis). Reading back a 0-d leaf guarantees the whole
  program ran: outputs of one executable materialize together. Every
  benched fn therefore reduces to (or includes) a scalar.
  """
  scalars = [l for l in jax.tree.leaves(out)
             if getattr(l, 'ndim', None) == 0]
  assert scalars, 'benched fn must produce at least one scalar output'
  scalars[0].item()


def time_fn(fn, *args, iters=3, warmup=1):
  for _ in range(warmup):
    _force(fn(*args))
  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    _force(fn(*args))
    times.append(time.perf_counter() - t0)
  return float(np.median(times))


def time_chained(step, *args, n=8, iters=3):
  """Per-iteration seconds of ``step(eps, *args) -> scalar``.

  The RTT-cancelling chained in-jit timer; the implementation (and the
  rationale: the ~30 ms per-dispatch tunnel round trip that silently
  inflates every sub-100 ms call-by-call measurement) lives in
  ``benchmarks/chained_timer.py``.
  """
  return chained_timer.measure('', step, *args, n=n, iters=iters,
                               quiet=True)


_gsum = chained_timer.gsum


def bench_headline():
  """Config 5: globally-normalized GNAT loss fwd+bwd, headline config."""
  lattice, params = build_lattice(vocab=1024)
  batch = make_batch(32, 1600, 100, 1024)

  # Every batch field is a jit ARGUMENT, not a closure capture. Closing
  # over device arrays embeds them as lowering-time constants, and
  # materializing each constant is a device->host readback over the
  # tunnel — measured 30.7 s vs 2.3 s for the args form under identical
  # conditions, and up to 1096 s when the tunnel was degraded. This was
  # the entire rounds-1-3 "cold compile tripled" mystery
  # (BASELINE.md "cold compile" note); trace+lower proper is ~2 s.
  def total_loss(params, frames, num_frames, labels, num_labels):
    return jnp.sum(lattice(params, frames, num_frames, labels, num_labels))

  grad_fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
  # Split the cold cost into its phases so a persistent-cache miss (the
  # backend-compile phase explodes) is distinguishable from tunnel
  # slowness (the first-step phase) and from tracing growth. Log the
  # host load too: with args-form lowering, a trace+lower blowup with
  # loadavg > 1 on this 1-core box means another process stole the CPU.
  log(f'loadavg at compile start: {os.getloadavg()}')
  args = (params, batch['frames'], batch['num_frames'], batch['labels'],
          batch['num_labels'])
  # Drain the async host->device uploads (105 MB of frames + params)
  # BEFORE the timed phases: the first synchronous point otherwise pays
  # the tunnel's entire backlog — measured 458.6 s once attributed to
  # "first step". The drain time is logged as a tunnel-health signal.
  td0 = time.perf_counter()
  _force(jax.jit(lambda a: sum(
      jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(a)))(args))
  log(f'input upload drain: {time.perf_counter() - td0:.1f}s')
  t0 = time.perf_counter()
  lowered = grad_fn.lower(*args)
  t1 = time.perf_counter()
  compiled = lowered.compile()
  t2 = time.perf_counter()
  _force(compiled(*args))
  t3 = time.perf_counter()
  compile_s = t3 - t0
  log(f'headline compile+first-step: {compile_s:.1f}s '
      f'(trace+lower {t1 - t0:.1f}s, backend compile {t2 - t1:.1f}s '
      f'[persistent-cache {"hit" if t2 - t1 < 30 else "MISS"}], '
      f'first step {t3 - t2:.1f}s); loadavg now {os.getloadavg()}')

  p50 = time_fn(compiled, *args, iters=3)
  frames_per_sec = 32 * 1600 / p50
  log(f'headline p50 step: {p50 * 1e3:.1f} ms; '
      f'{frames_per_sec:,.0f} frames/s/chip')
  return frames_per_sec, p50, compile_s


def bench_secondary():
  """BASELINE.json configs 1-4 + decode at headline shapes (stderr only).

  All batch arrays are jit ARGUMENTS (see bench_headline: closure
  captures become lowering-time constants whose device->host readback
  over the tunnel dominated rounds 1-3 cold times). Every config is
  timed with ``time_chained``: the per-dispatch tunnel round trip
  (~30 ms) otherwise dominates the sub-100 ms rows — numbers recorded
  before round 4's discovery carry that constant.
  """
  results = {}

  def loss_step(lat):
    return lambda eps, p, f, nf, l, nl: jnp.sum(
        lat(p, f + eps, nf, l, nl))

  def grad_step(lat):
    def step(eps, p, f, nf, l, nl):
      v, g = jax.value_and_grad(
          lambda p_, f_: jnp.sum(lat(p_, f_, nf, l, nl)),
          argnums=(0, 1))(p, f + eps)
      return v + _gsum(g)

    return step

  def decode_step(lat):
    # Decode outputs reduce to a scalar inside jit: on the tunneled
    # backend block_until_ready does not reliably block on multi-array
    # int outputs.
    return lambda eps, p, f, nf: _decode_checksum(
        lat.shortest_path(p, f + eps, nf))

  def batch_args(b):
    return (b['frames'], b['num_frames'], b['labels'], b['num_labels'])

  # Config 1: tiny FrameDependent + FullNGram(1) log loss, B=2 T=8 U=4 V=8.
  lattice, params = build_lattice(vocab=8, hidden=64, emb=64, feature=64,
                                  max_expansions=0)
  b = make_batch(2, 8, 4, 8, feature=64)
  results['1_tiny_loss_ms'] = round(
      time_chained(loss_step(lattice), params, *batch_args(b)) * 1e3, 3)

  # Config 2: MaxTropical Viterbi + backtrace on the same tiny lattice.
  results['2_tiny_viterbi_ms'] = round(
      time_chained(decode_step(lattice), params, b['frames'],
                   b['num_frames']) * 1e3, 3)

  # Config 3: globally-normalized loss, FullNGram(2) + TableWeightFn,
  # B=8 T=100 V=32 (exact-table lattice; 1057 context states).
  context3 = contexts.FullNGram(vocab_size=32, context_size=2)
  s3, _ = context3.shape()
  rng = np.random.default_rng(1)
  table = jnp.asarray(rng.normal(size=(8, 4, s3, 33)), jnp.float32)
  lattice3 = lattices.RecognitionLattice(
      context=context3,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(table))
  params3 = lattice3.init(jax.random.PRNGKey(2), feature_size=1)
  frames3 = jnp.asarray(rng.integers(0, 4, size=(8, 100, 1)), jnp.float32)
  nf3 = jnp.full((8,), 100, jnp.int32)
  labels3 = jnp.asarray(rng.integers(1, 33, size=(8, 20)), jnp.int32)
  nl3 = jnp.full((8,), 20, jnp.int32)
  # frames3 hold small-integer table indices: adding the structurally
  # chained eps (1e-12 * a near-zero carry) is numerically a no-op on
  # them while still serializing iterations.
  loss3 = lambda eps, p, f, nf, l, nl: jnp.sum(
      lattice3(p, f + eps, nf, l, nl, cache=None))
  results['3_trigram_table_loss_ms'] = round(
      time_chained(loss3, params3, frames3, nf3, labels3, nl3) * 1e3, 2)

  # Config 4: Expectation-semiring shortest distance (path entropy),
  # B=16 T=400, locally-normalized bigram V=64.
  lattice4, params4 = build_lattice(vocab=64, hidden=128, emb=128,
                                    feature=128, max_expansions=0,
                                    locally_normalized=True)
  b4 = make_batch(16, 400, 10, 64, feature=128)
  sr = semirings.LogLogExpectation
  lift = lambda w: sr.weighted(w, jnp.log(jnp.maximum(-w, 1e-30)))
  ent_step = lambda eps, p, f, nf: _gsum(lattice4.shortest_distance(
      p, f + eps, nf, semiring=sr, weight_lift=lift))
  results['4_expectation_entropy_ms'] = round(
      time_chained(ent_step, params4, b4['frames'],
                   b4['num_frames']) * 1e3, 2)

  # Config 6: locally-normalized decode at headline shapes (the in-kernel
  # hat-normalized tropical path).
  lattice6, params6 = build_lattice(vocab=1024, locally_normalized=True)
  b6 = make_batch(32, 1600, 100, 1024)
  results['6_local_decode_ms'] = round(
      time_chained(decode_step(lattice6), params6, b6['frames'],
                   b6['num_frames'], n=4) * 1e3, 1)

  # Decode throughput at headline shapes (scalar checksum, see config 2).
  lattice5, params5 = build_lattice(vocab=1024)
  b5 = make_batch(32, 1600, 100, 1024)
  p50 = time_chained(decode_step(lattice5), params5, b5['frames'],
                     b5['num_frames'], n=4)
  results['5_decode_ms'] = round(p50 * 1e3, 1)
  results['5_decode_frames_per_sec'] = round(32 * 1600 / p50)

  # Config 7: locally-normalized (HAT) training at headline shapes — the
  # numerator-only loss via the LocallyNormalizedWeightFn fast path.
  lattice7, params7 = build_lattice(vocab=1024, locally_normalized=True)
  b7 = make_batch(32, 1600, 100, 1024)
  p50 = time_chained(grad_step(lattice7), params7, *batch_args(b7), n=6)
  results['7_hat_train_ms'] = round(p50 * 1e3, 1)
  results['7_hat_train_frames_per_sec'] = round(32 * 1600 / p50)

  # Config 8: per-frame label posteriors (confidence API) at headline
  # shapes — the fused marginals kernel.
  lm_step = lambda eps, p, f, nf: _gsum(
      lattice5.label_marginals(p, f + eps, nf))
  p50 = time_chained(lm_step, params5, b5['frames'], b5['num_frames'], n=3,
                     iters=2)
  results['8_label_marginals_ms'] = round(p50 * 1e3, 1)

  # Config 9: V=4096 bigram loss fwd+bwd (16x the headline lexical work)
  # via the vocab-tiled online kernels — beyond the reference-library
  # VMEM-cache ceiling; reduced batch/T keep the bench step bounded.
  lattice9, params9 = build_lattice(vocab=4096)
  b9 = make_batch(8, 200, 50, 4096)
  p50 = time_chained(grad_step(lattice9), params9, *batch_args(b9), n=3,
                     iters=2)
  results['9_v4096_loss_ms'] = round(p50 * 1e3, 1)
  results['9_v4096_frames_per_sec'] = round(8 * 200 / p50)

  # Config 10: V=4096 Viterbi decode (lex-cache recompute mode).
  results['10_v4096_decode_ms'] = round(
      time_chained(decode_step(lattice9), params9, b9['frames'],
                   b9['num_frames'], n=3, iters=2) * 1e3, 1)

  # Config 11: ctc-like training (context_size=0, a single context state)
  # — structurally outside the fused kernels' bigram scope; takes the
  # scan-free factorized S=1 route (lattices._forward_s1 + the one-apply
  # string-weights fast path), reported by last_path as 'xla-s1'.
  lattice11, params11 = build_lattice(vocab=1024, context_size=0)
  b11 = make_batch(32, 1600, 100, 1024)
  p50 = time_chained(grad_step(lattice11), params11, *batch_args(b11))
  results['11_ctc_like_train_ms'] = round(p50 * 1e3, 1)
  results['11_ctc_like_path'] = lattice11.last_path
  return results


def main():
  frames_per_sec, p50, compile_s = bench_headline()

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

  if '--full' in sys.argv:
    log(f'secondary configs: {json.dumps(bench_secondary(), indent=2)}')

  print(json.dumps({
      'metric': 'gnat_global_loss_fwd_bwd_frames_per_sec_per_chip',
      'value': round(frames_per_sec, 1),
      'unit': 'frames/s/chip',
      'vs_baseline': round(vs_baseline, 2) if vs_baseline else None,
      # Compile+first-step seconds: ~10 s warm (.jax_cache hit), ~60 s
      # after a kernel rewrite invalidates the cache, plus tunnel
      # variance. Rounds 1-3 reported 104/356/1237 s here; that was
      # device->host readback of closure-captured batch constants at
      # lowering time (fixed: batches are jit arguments now), not
      # compile growth — see BASELINE.md "cold compile" note.
      'compile_first_step_s': round(compile_s, 1),
  }))


if __name__ == '__main__':
  main()
