"""On-TPU hardware check of the time-sharded DECODE/ALIGN chaining.

Round 3 proved the training relay's alpha/beta kernel chaining
bit-identical on hardware (``tpu_relay_check.py``). This script proves
the INFERENCE relays' math the same way: a manual two-block chain of the
relay's own block bodies — ``parallel.sequence._forward_block`` under
MaxTropical with the additive lexical mask, and the numerator
``_string_dp`` chained via ``alpha0``/``t_offset`` — must reproduce the
monolithic XLA ``shortest_path`` labels and ``align`` emit frames
exactly (the decode output is a discrete argmax over identical
arithmetic, so agreement must be bitwise, not approximate). The fused
Viterbi kernel's labels are reported alongside for reference.

Usage: python benchmarks/tpu_decode_relay_check.py

Results (v5e, recorded 2026-08-17, round 4):
  decode (V=256, T=32, B=4): chained labels / num_labels IDENTICAL to
    the monolithic XLA route; path weights bit-identical.
  align (V=256, T=32, U=6): chained emit frames IDENTICAL; scores
    bit-identical.
  The fused bf16 Viterbi kernel flips 8/384 near-tie argmax slots vs
  the XLA route on this random-weights config; at matched f32/'highest'
  precision the kernel is bit-identical to XLA (0 flips, weights rel
  1.2e-8) — a precision effect, not a kernel defect (ops/README.md
  decode-precision note).
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
from last_torch_tpu import alignments, contexts, semirings, weight_fns  # noqa: E402
from last_torch_tpu.parallel import sequence  # noqa: E402


def build(vocab, hidden, feature, fused, seed=0):
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=hidden),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden),
      fused=fused)
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=feature)
  return lattice, params


def check_decode(vocab=256, hidden=256, batch=4, max_t=32):
  lattice, params = build(vocab, hidden, hidden, fused='never')
  cache = lattice.build_cache(params)
  wf = params['weight_fn']
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)) * 0.5,
                       jnp.float32)
  nf = jnp.asarray([max_t] + list(rng.integers(1, max_t, size=batch - 1)),
                   jnp.int32)
  num_align = lattice.alignment.num_states()
  t_half = max_t // 2
  lift = lambda w: w
  sr = semirings.MaxTropical

  # Device arrays are jit ARGUMENTS throughout: closure captures become
  # lowering-time HLO constants, each a device->host readback over the
  # tunnel (the rounds-1-3 cold-time bug; bench.py diagnosis).
  @jax.jit
  def chained(wf, cache, frames, nf):
    alpha0 = sequence._init_alpha(lattice, batch, semiring=sr)

    def distance(mask):
      tree0 = {'frames': frames[:, :t_half],
               'lexical_mask': mask[:, :t_half]}
      a_mid = sequence._forward_block(lattice, sr, lift, alpha0, tree0,
                                      wf, cache, nf, 0)
      tree1 = {'frames': frames[:, t_half:],
               'lexical_mask': mask[:, t_half:]}
      a_t = sequence._forward_block(lattice, sr, lift, a_mid, tree1,
                                    wf, cache, nf, t_half)
      return sr.sum(a_t, axis=-1)

    mask0 = jnp.zeros((batch, max_t, num_align, vocab))
    weights, vjp_fn = jax.vjp(distance, mask0)
    marks = vjp_fn(jnp.ones_like(weights))[0]
    is_blank = jnp.all(marks == 0, axis=-1)
    labels = jnp.where(is_blank, 0, 1 + jnp.argmax(marks, axis=-1))
    return labels.reshape(batch, -1), weights

  t0 = time.monotonic()
  labels_c, w_c = jax.block_until_ready(chained(wf, cache, frames, nf))
  t1 = time.monotonic()
  labels_m, nal_m, w_m = jax.block_until_ready(
      jax.jit(lattice.shortest_path)(params, frames, nf))
  t2 = time.monotonic()
  assert lattice.last_path == 'xla'

  same = np.array_equal(np.asarray(labels_c), np.asarray(labels_m))
  w_rel = float(np.abs(np.asarray(w_c) - np.asarray(w_m)).max() /
                max(np.abs(np.asarray(w_m)).max(), 1e-9))
  print(f'decode: V={vocab} T={max_t} chained-vs-XLA labels identical: '
        f'{same}, weights rel {w_rel:.2e} '
        f'(chained {t1 - t0:.1f}s, mono {t2 - t1:.1f}s incl compile)',
        flush=True)
  assert same, 'chained decode labels differ from monolithic XLA'
  assert w_rel == 0.0 or w_rel < 1e-6, w_rel

  # Fused Viterbi kernel route, for reference (bf16 scores can in
  # principle flip borderline argmaxes; report, do not hard-assert).
  klattice, _ = build(vocab, hidden, hidden, fused='auto')
  labels_k, _, _ = jax.block_until_ready(
      jax.jit(klattice.shortest_path)(params, frames, nf))
  kern_same = np.array_equal(np.asarray(labels_k), np.asarray(labels_m))
  print(f'decode: fused Viterbi kernel labels identical to XLA: '
        f'{kern_same} ({klattice.last_path})', flush=True)


def check_align(vocab=256, hidden=256, batch=4, max_t=32, max_u=6):
  lattice, params = build(vocab, hidden, hidden, fused='never')
  cache = lattice.build_cache(params)
  rng = np.random.default_rng(2)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)) * 0.5,
                       jnp.float32)
  nf = jnp.asarray([max_t] + list(rng.integers(max_u, max_t, size=batch - 1)),
                   jnp.int32)
  labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                       jnp.int32)
  nl = jnp.asarray(rng.integers(1, max_u + 1, size=(batch,)), jnp.int32)
  t_half = max_t // 2
  u1 = max_u + 1
  sr = semirings.MaxTropical

  @jax.jit
  def chained(params, cache, frames, labels, nf, nl):
    alpha0 = sequence._init_alpha(lattice, batch, num_states=u1, start=0,
                                  semiring=sr)

    def score(mask):
      b0, l0 = lattice._string_weights(params, cache, frames[:, :t_half],
                                       labels)
      l0 = l0 + jnp.moveaxis(mask[:, :t_half], 1, 0)
      a_mid = lattice._string_dp(b0, l0, nf, nl, sr, alpha0=alpha0,
                                 t_offset=0, final_gather=False)
      b1, l1 = lattice._string_weights(params, cache, frames[:, t_half:],
                                       labels)
      l1 = l1 + jnp.moveaxis(mask[:, t_half:], 1, 0)
      final = lattice._string_dp(b1, l1, nf, nl, sr, alpha0=a_mid,
                                 t_offset=t_half, final_gather=False)
      is_final = nl[..., None] == jnp.arange(u1)
      zero = sr.zeros([], final.dtype)
      return sr.sum(semirings.where(is_final, final, zero), axis=-1)

    mask0 = jnp.zeros((batch, max_t, u1))
    scores, vjp_fn = jax.vjp(score, mask0)
    marks = vjp_fn(jnp.ones_like(scores))[0]
    emit = jnp.argmax(marks, axis=1).astype(jnp.int32)
    emitted = jnp.max(marks, axis=1) > 0
    return jnp.where(emitted, emit, -1)[..., :max_u], scores

  t0 = time.monotonic()
  emit_c, w_c = jax.block_until_ready(
      chained(params, cache, frames, labels, nf, nl))
  t1 = time.monotonic()
  emit_m, w_m = jax.block_until_ready(
      jax.jit(lattice.align)(params, frames, nf, labels, nl))
  t2 = time.monotonic()

  same = np.array_equal(np.asarray(emit_c), np.asarray(emit_m))
  w_rel = float(np.abs(np.asarray(w_c) - np.asarray(w_m)).max() /
                max(np.abs(np.asarray(w_m)).max(), 1e-9))
  print(f'align: V={vocab} T={max_t} U={max_u} chained-vs-mono emit '
        f'frames identical: {same}, scores rel {w_rel:.2e} '
        f'(chained {t1 - t0:.1f}s, mono {t2 - t1:.1f}s incl compile)',
        flush=True)
  assert same, 'chained align emit frames differ from monolithic'
  assert w_rel == 0.0 or w_rel < 1e-6, w_rel


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  check_decode()
  check_align()
  print('TPU DECODE RELAY CHECK OK')


if __name__ == '__main__':
  main()
