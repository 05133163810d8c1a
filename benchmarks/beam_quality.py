"""Beam-search QUALITY measurement: score regret + oracle match.

Round 3 quantified beam latency (``tpu_beam_latency.py``); this measures
search ERROR, the other half of validating a beam decoder
(`streaming.StreamingBeamDecoder`):

- ``merge='max'`` (Viterbi semantics): the beam's best hypothesis score
  is a max over a SUBSET of alignment paths, so it can never exceed the
  offline Viterbi path weight (``shortest_path``) — any positive excess
  is a scoring bug. Regret = viterbi_weight - beam_best_score >= 0
  measures pruning loss; exact-match = beam transcript == the Viterbi
  path's transcript (blanks stripped).
- ``merge='logsumexp'`` (sequence-posterior semantics): compared against
  exhaustive enumeration of every label sequence up to the feasible
  length on a tiny lattice — the true MAP transcript maximizes the
  numerator ``_string_forward`` score (the per-utterance denominator is
  constant), which enumeration computes exactly.

Runs on CPU (tiny lattices; this is a correctness surface, not a perf
one). Usage: python benchmarks/beam_quality.py

The recorded results table lives in BASELINE.md ("Beam search
quality", round 4).
"""

import sys

import jax

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import last_torch_tpu  # noqa: E402
from last_torch_tpu import alignments, contexts, semirings, weight_fns  # noqa: E402
from last_torch_tpu import streaming  # noqa: E402


def build(vocab, k, hidden=16, seed=0):
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=(alignments.FrameLabelDependent(max_expansions=k) if k
                 else alignments.FrameDependent()),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=hidden),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden),
      fused='never')
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=hidden)
  return lattice, params


def strip_blanks(labels, num, max_u):
  """[B, L] alignment labels -> [B, max_u] transcript + counts."""
  labels = np.asarray(labels)
  out = np.zeros((labels.shape[0], max_u), np.int32)
  cnt = np.zeros((labels.shape[0],), np.int32)
  for b in range(labels.shape[0]):
    seq = [y for y in labels[b, :int(num[b])] if y != 0][:max_u]
    out[b, :len(seq)] = seq
    cnt[b] = len(seq)
  return out, cnt


def beam_decode(lattice, params, frames, nf, beam, merge, max_labels):
  dec = streaming.StreamingBeamDecoder(lattice, beam_size=beam,
                                       max_labels=max_labels, merge=merge)
  state = dec.init_state(frames.shape[0])
  state = dec.step(params, state, frames, nf)
  return dec.best(state)


def viterbi_regret(vocab=8, k=0, batch=16, max_t=12, seed=0):
  lattice, params = build(vocab, k, seed=seed)
  rng = np.random.default_rng(seed + 1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, 16)), jnp.float32)
  nf = jnp.asarray(rng.integers(max_t // 2, max_t + 1, size=(batch,)),
                   jnp.int32)
  max_u = max_t * max(k, 1)
  labels_v, nal_v, w_v = lattice.shortest_path(params, frames, nf)
  ref_seq, ref_cnt = strip_blanks(labels_v, np.asarray(nal_v), max_u)

  align_name = f'FLD({k})' if k else 'FrameDependent'
  print(f"merge='max' vs offline Viterbi "
        f'(V={vocab}, T={max_t}, B={batch}, {align_name}):', flush=True)
  rows = []
  for beam in (1, 4, 16, 32):
    bl, bn, bs = beam_decode(lattice, params, frames, nf, beam, 'max',
                             max_u)
    excess = float(np.max(np.asarray(bs) - np.asarray(w_v)))
    assert excess < 1e-4, (
        f'beam score EXCEEDS Viterbi by {excess} — scoring bug')
    regret = np.maximum(np.asarray(w_v) - np.asarray(bs), 0.0)
    seq, cnt = strip_blanks(np.asarray(bl), np.asarray(bn), max_u)
    exact = int(np.sum(np.all(seq == ref_seq, axis=-1)
                       & (cnt == ref_cnt)))
    rows.append((beam, float(regret.mean()), float(regret.max()), exact))
    print(f'  beam {beam:2d}: mean regret {regret.mean():.4f}, '
          f'max {regret.max():.4f}, transcript match {exact}/{batch}',
          flush=True)
  return rows


def exhaustive_sequences(vocab, max_u):
  """All label sequences of length 0..max_u, padded to max_u."""
  seqs = [np.zeros((max_u,), np.int32)]
  counts = [0]
  frontier = [[]]
  for _ in range(max_u):
    nxt = []
    for s in frontier:
      for y in range(1, vocab + 1):
        e = s + [y]
        nxt.append(e)
        seqs.append(np.pad(np.asarray(e, np.int32), (0, max_u - len(e))))
        counts.append(len(e))
    frontier = nxt
  return np.stack(seqs), np.asarray(counts, np.int32)


def map_regret(vocab=3, batch=8, max_t=8, max_u=5, seed=3):
  """merge='logsumexp' vs exhaustive MAP-transcript enumeration."""
  lattice, params = build(vocab, 0, seed=seed)
  rng = np.random.default_rng(seed + 1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, 16)), jnp.float32)
  nf = jnp.asarray(rng.integers(max_u, max_t + 1, size=(batch,)),
                   jnp.int32)
  cache = lattice.build_cache(params)

  seqs, counts = exhaustive_sequences(vocab, max_u)  # [N, U], [N]
  n = seqs.shape[0]

  @jax.jit
  def string_scores(seqs, counts):
    # [N] sequences x [B] utterances -> [N, B] numerator scores.
    def one(args):
      seq, cnt = args
      return lattice._string_forward(
          params=params, cache=cache, frames=frames, num_frames=nf,
          labels=jnp.broadcast_to(seq, (batch, seq.shape[0])),
          num_labels=jnp.full((batch,), cnt, jnp.int32),
          semiring=semirings.Log)
    return jax.lax.map(one, (jnp.asarray(seqs), jnp.asarray(counts)),
                       batch_size=64)

  scores = np.asarray(string_scores(seqs, counts))  # [N, B]
  best_idx = np.argmax(np.where(np.isfinite(scores), scores, -np.inf),
                       axis=0)
  map_seq = seqs[best_idx]  # [B, U]
  map_cnt = counts[best_idx]
  map_score = scores[best_idx, np.arange(batch)]

  print(f"merge='logsumexp' vs exhaustive MAP over {n} sequences "
        f'(V={vocab}, T={max_t}, B={batch}, FrameDependent):', flush=True)
  rows = []
  for beam in (1, 4, 16, 32):
    bl, bn, bs = beam_decode(lattice, params, frames, nf, beam,
                             'logsumexp', max_u)
    bl, bn, bs = np.asarray(bl), np.asarray(bn), np.asarray(bs)
    excess = float(np.max(bs - map_score))
    assert excess < 1e-3, (
        f'beam logsumexp score exceeds the exhaustive sequence score by '
        f'{excess} — merging bug')
    regret = np.maximum(map_score - bs, 0.0)
    exact = int(np.sum(np.all(bl == map_seq, axis=-1) & (bn == map_cnt)))
    rows.append((beam, float(regret.mean()), float(regret.max()), exact))
    print(f'  beam {beam:2d}: mean log-prob regret {regret.mean():.4f}, '
          f'max {regret.max():.4f}, MAP match {exact}/{batch}', flush=True)
  return rows


def synthetic_batch(rng, batch, vocab, max_t, feature, noise=0.6):
  """Separable-but-noisy frames: label identity leaks into one channel."""
  max_u = max_t // 2
  num_labels = rng.integers(2, max_u + 1, size=(batch,))
  labels = np.zeros((batch, max_u), np.int32)
  frames = rng.normal(size=(batch, max_t, feature)) * noise
  for b in range(batch):
    seq = rng.integers(1, vocab + 1, size=num_labels[b])
    labels[b, :num_labels[b]] = seq
    for u, y in enumerate(seq):
      frames[b, 2 * u:2 * u + 2, y - 1] += 1.0
  return (jnp.asarray(frames, jnp.float32),
          jnp.full((batch,), max_t, jnp.int32),
          jnp.asarray(labels), jnp.asarray(num_labels, jnp.int32))


def trained_regret(vocab=8, batch=16, max_t=12, steps=500, seed=11):
  """Beam regret on a TRAINED (peaked) lattice — the realistic regime.

  The random-weight tables above are the worst case: near-uniform arc
  weights make many paths compete, so small beams lose often. After NLL
  training on a separable task the weight distribution is peaked and
  the beam table bounds realistic serving regret (VERDICT round-4 task
  7). The recorded table lives in BASELINE.md; the beam-width guidance
  derived from it is in ``streaming.StreamingBeamDecoder``'s docstring.
  """
  import optax

  lattice, params = build(vocab, 0, seed=seed)
  rng = np.random.default_rng(seed + 1)
  train_batches = [synthetic_batch(rng, batch, vocab, max_t, 16, noise=0.4)
                   for _ in range(8)]

  opt = optax.adam(3e-3)
  opt_state = opt.init(params)

  @jax.jit
  def step(params, opt_state, frames, nf, labels, nl):
    def loss_fn(p):
      return jnp.mean(lattice(p, frames, nf, labels, nl))
    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = opt.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  first = last = None
  for i in range(steps):
    params, opt_state, loss = step(params, opt_state,
                                   *train_batches[i % len(train_batches)])
    if i == 0:
      first = float(loss)
  last = float(loss)
  print(f'trained lattice (V={vocab}, T={max_t}, B={batch}, '
        f'FrameDependent): NLL {first:.3f} -> {last:.3f} '
        f'after {steps} steps', flush=True)

  # Held-out eval batch from the same distribution.
  frames, nf, _, _ = synthetic_batch(rng, batch, vocab, max_t, 16,
                                     noise=0.4)
  max_u = max_t
  labels_v, nal_v, w_v = lattice.shortest_path(params, frames, nf)
  ref_seq, ref_cnt = strip_blanks(labels_v, np.asarray(nal_v), max_u)

  print("merge='max' vs offline Viterbi on the TRAINED lattice:",
        flush=True)
  rows = []
  for beam in (1, 2, 4, 16):
    bl, bn, bs = beam_decode(lattice, params, frames, nf, beam, 'max',
                             max_u)
    excess = float(np.max(np.asarray(bs) - np.asarray(w_v)))
    assert excess < 1e-4, (
        f'beam score EXCEEDS Viterbi by {excess} — scoring bug')
    regret = np.maximum(np.asarray(w_v) - np.asarray(bs), 0.0)
    seq, cnt = strip_blanks(np.asarray(bl), np.asarray(bn), max_u)
    exact = int(np.sum(np.all(seq == ref_seq, axis=-1)
                       & (cnt == ref_cnt)))
    rows.append((beam, float(regret.mean()), float(regret.max()), exact))
    print(f'  beam {beam:2d}: mean regret {regret.mean():.4f}, '
          f'max {regret.max():.4f}, transcript match {exact}/{batch}',
          flush=True)
  return rows


def main():
  viterbi_regret(vocab=8, k=0)
  viterbi_regret(vocab=8, k=2, seed=7)
  map_regret()
  trained_regret()
  print('BEAM QUALITY OK', flush=True)


if __name__ == '__main__':
  main()
