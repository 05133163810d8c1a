"""Streaming beam-search serving latency vs beam width on TPU.

Verifies the hash-sort recombination keeps per-chunk latency ~flat as
the beam widens (the old all-pairs merge was O(M^2 * U) per frame and
would blow up by beam 16-32). B=8 streams, V=1024 bigram, 40-frame
chunks, greedy(=reference point) and beams 4 / 16 / 32.

Chunks chain naturally through the decoder state, so the per-chunk cost
is measured RTT-free as (t_16chunks - t_1chunk) / 15 inside single jits
(the round-3 numbers amortized only 4 chunks per call, leaving ~30/4 =
7.5 ms of tunnel round trip inside every per-chunk figure).

Usage: python benchmarks/tpu_beam_latency.py

Results (v5e, recorded 2026-08-17, round 3):
  greedy 7.6 ms/chunk; beam 4: 8.9; beam 16: 12.1; beam 32: 16.0 ms —
  8x the beam costs 1.8x the latency. (Lattice-only, amortized in-jit;
  round 2's 34.6 ms serving figure included the encoder chunk and
  per-call tunnel RTT.)
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
from last_torch_tpu import alignments, contexts, streaming, weight_fns  # noqa: E402


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  vocab, hidden, emb = 1024, 512, 512
  batch, chunk = 8, 40
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden,
          compute_dtype=jnp.bfloat16))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  cache = lattice.build_cache(params)
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, chunk, hidden)) * 0.5,
                       jnp.float32)
  nf = jnp.full((batch,), chunk, jnp.int32)
  many_chunks = 16

  def measure(label, step_fn, state0):
    def run(k):
      def f(state, frames):
        def body(state, _):
          return step_fn(state, frames), None
        state, _ = jax.lax.scan(body, state, None, length=k)
        return jax.tree.map(
            lambda x: jnp.sum(x.astype(jnp.float32)),
            jax.tree.leaves(state)[0])
      return jax.jit(f)

    one, many = run(1), run(many_chunks)
    t0 = time.monotonic()
    float(jax.device_get(one(state0, frames)))
    float(jax.device_get(many(state0, frames)))
    compile_s = time.monotonic() - t0
    t1s, tns = [], []
    for _ in range(3):
      t0 = time.monotonic()
      float(jax.device_get(one(state0, frames)))
      t1s.append(time.monotonic() - t0)
      t0 = time.monotonic()
      float(jax.device_get(many(state0, frames)))
      tns.append(time.monotonic() - t0)
    ms = max(float(np.median(tns)) - float(np.median(t1s)), 0.0) * 1e3 / (
        many_chunks - 1)
    print(f'{label}: {ms:.1f} ms/chunk (compile {compile_s:.1f}s)',
          flush=True)
    return ms

  greedy = streaming.StreamingGreedyDecoder(lattice)

  def greedy_step(state, frames):
    new_state, _, _ = greedy.step(params, state, frames, nf, cache)
    return new_state

  measure('greedy', greedy_step, greedy.init_state(batch))

  for beam_size in (4, 16, 32):
    beam = streaming.StreamingBeamDecoder(lattice, beam_size=beam_size,
                                          max_labels=128)

    def beam_step(state, frames, beam=beam):
      return beam.step(params, state, frames, nf, cache)

    measure(f'beam {beam_size}', beam_step, beam.init_state(batch))


if __name__ == '__main__':
  main()
