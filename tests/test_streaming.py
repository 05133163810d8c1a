"""Tests for frame-synchronous streaming greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, streaming, weight_fns


def build(alignment, vocab=3):
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8))


def greedy_oracle(lattice, params, cache, frames, num_frames,
                  max_emissions, trailing_blank):
  """Per-stream numpy replay of the greedy search."""
  out = []
  for b in range(frames.shape[0]):
    q = lattice.context.start()
    slots = []
    for t in range(frames.shape[1]):
      open_ = t < int(num_frames[b])
      for _ in range(max_emissions):
        blank, lexical = lattice.weight_fn.apply(
            params['weight_fn'], cache, frames[b, t],
            state=jnp.asarray(q, jnp.int32))
        best = int(np.argmax(np.asarray(lexical)))
        emit = open_ and float(lexical[best]) > float(blank)
        slots.append(best + 1 if emit else 0)
        if emit:
          q = int(lattice.context.next_state(
              jnp.asarray(q, jnp.int32), jnp.asarray(best + 1, jnp.int32)))
        open_ = open_ and emit
      if trailing_blank:
        slots.append(0)
    out.append(slots)
  return np.asarray(out, np.int32)


@pytest.mark.parametrize('alignment_factory,max_emissions,trailing', [
    (alignments.FrameDependent, 1, False),
    (lambda: alignments.FrameLabelDependent(max_expansions=2), 2, True),
    (lambda: alignments.FrameLabelDependent(max_expansions=0), 0, True),
])
def test_streaming_matches_oracle(alignment_factory, max_emissions,
                                  trailing):
  lattice = build(alignment_factory())
  params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 5))
  num_frames = jnp.array([6, 4, 0])

  decoder = streaming.StreamingGreedyDecoder(lattice)
  state = decoder.init_state(3)
  _, labels, num_labels = jax.jit(decoder.step)(params, state, frames,
                                                num_frames, cache)
  expected = greedy_oracle(lattice, params, cache, frames, num_frames,
                           max_emissions, trailing)
  npt.assert_array_equal(np.asarray(labels), expected)
  npt.assert_array_equal(np.asarray(num_labels),
                         decoder.slots_per_frame * np.asarray(num_frames))


def test_chunked_equals_whole_utterance():
  """Arbitrary chunk boundaries change nothing: state carries correctly."""
  lattice = build(alignments.FrameLabelDependent(max_expansions=1))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 5))
  num_frames = jnp.array([8, 8])

  decoder = streaming.StreamingGreedyDecoder(lattice)
  state = decoder.init_state(2)
  _, whole, _ = decoder.step(params, state, frames, num_frames, cache)

  state = decoder.init_state(2)
  chunks = []
  for lo, hi in [(0, 3), (3, 4), (4, 8)]:
    state, labels, _ = decoder.step(
        params, state, frames[:, lo:hi],
        jnp.full((2,), hi - lo, jnp.int32), cache)
    chunks.append(np.asarray(labels))
  npt.assert_array_equal(np.concatenate(chunks, axis=1),
                         np.asarray(whole))


def test_greedy_matches_viterbi_on_peaky_lattice():
  """With per-frame-dominant weights, greedy == global Viterbi."""
  vocab = 2
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  num_states, _ = context.shape()
  # One clearly-best arc per (input, state): peaked random table.
  rng = np.random.default_rng(0)
  table = np.asarray(rng.normal(size=(3, num_states, 1 + vocab)),
                     np.float32)
  table += 10.0 * np.eye(1 + vocab)[rng.integers(0, 1 + vocab,
                                                 size=(3, num_states))]
  table = np.broadcast_to(table, (2,) + table.shape)  # shared per-batch
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
          jnp.asarray(table)))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  frames_int = rng.integers(0, 3, size=(2, 5))
  frames = jnp.asarray(frames_int, jnp.float32)[:, :, None]
  num_frames = jnp.array([5, 3])

  viterbi_labels, _, _ = lattice.shortest_path(params, frames, num_frames)
  decoder = streaming.StreamingGreedyDecoder(lattice)
  _, greedy_labels, _ = decoder.step(params, decoder.init_state(2),
                                     frames, num_frames)
  npt.assert_array_equal(np.asarray(greedy_labels),
                         np.asarray(viterbi_labels))


class TestBeam:

  def test_beam1_equals_greedy_frame_dependent(self):
    lattice = build(alignments.FrameDependent())
    params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
    cache = lattice.build_cache(params)
    frames = jax.random.normal(jax.random.PRNGKey(3), (3, 7, 5))
    num_frames = jnp.array([7, 5, 0])

    greedy = streaming.StreamingGreedyDecoder(lattice)
    _, gl, _ = greedy.step(params, greedy.init_state(3), frames,
                           num_frames, cache)
    beam = streaming.StreamingBeamDecoder(lattice, beam_size=1,
                                          max_labels=7)
    state = beam.step(params, beam.init_state(3), frames, num_frames,
                      cache)
    bl, bn, _ = beam.best(state)
    for b in range(3):
      greedy_labels = [int(y) for y in np.asarray(gl)[b] if y > 0]
      beam_labels = list(np.asarray(bl)[b][:int(bn[b])])
      assert beam_labels == greedy_labels

  def test_beam_recovers_garden_path(self):
    """Beam > greedy: a locally-worse label pays off one frame later."""
    vocab = 1  # states: 0 = start, 1 = after label 1
    context = contexts.FullNGram(vocab_size=vocab, context_size=1)
    # [input, state, (blank, y1)]
    table = np.array([
        [[0.0, -0.1], [0.0, -10.0]],   # frame input 0
        [[0.0, -5.0], [5.0, -10.0]],   # frame input 1
    ], np.float32)
    def make(table_batch_dims):
      # The beam decoder queries weights with a [batch, beam] state batch,
      # which TableWeightFn matches literally; greedy/Viterbi use [batch].
      t = np.broadcast_to(table, table_batch_dims + table.shape)
      return last_torch_tpu.RecognitionLattice(
          context=context,
          alignment=alignments.FrameDependent(),
          weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
          weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
              jnp.asarray(t)))

    lattice = make((1,))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
    frames = jnp.array([[[0.0], [1.0]]])
    num_frames = jnp.array([2])

    greedy = streaming.StreamingGreedyDecoder(lattice)
    _, gl, _ = greedy.step(params, greedy.init_state(1), frames,
                           num_frames)
    assert [int(y) for y in np.asarray(gl)[0] if y > 0] == []  # stuck

    beam_lattice = make((1, 2))
    beam = streaming.StreamingBeamDecoder(beam_lattice, beam_size=2,
                                          max_labels=2)
    state = beam.step(params, beam.init_state(1), frames, num_frames)
    bl, bn, bs = beam.best(state)
    assert list(np.asarray(bl)[0][:int(bn[0])]) == [1]
    npt.assert_allclose(np.asarray(bs)[0], -0.1 + 5.0, rtol=1e-6)
    # Matches the global optimum.
    _, _, viterbi_w = lattice.shortest_path(params, frames, num_frames)
    npt.assert_allclose(np.asarray(bs)[0], np.asarray(viterbi_w)[0],
                        rtol=1e-6)

  def test_beam_chunk_invariance_and_monotonicity(self):
    lattice = build(alignments.FrameLabelDependent(max_expansions=2))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
    cache = lattice.build_cache(params)
    frames = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 5))
    num_frames = jnp.full((2,), 8, jnp.int32)

    def run(beam_size, chunks):
      beam = streaming.StreamingBeamDecoder(lattice, beam_size,
                                            max_labels=16)
      state = beam.init_state(2)
      for lo, hi in chunks:
        state = jax.jit(beam.step)(params, state, frames[:, lo:hi],
                                   jnp.full((2,), hi - lo, jnp.int32),
                                   cache)
      return beam.best(state)

    l1, n1, s1 = run(4, [(0, 8)])
    l2, n2, s2 = run(4, [(0, 3), (3, 8)])
    npt.assert_array_equal(np.asarray(l1), np.asarray(l2))
    npt.assert_array_equal(np.asarray(n1), np.asarray(n2))
    npt.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    # Wide beams too (the sort-based recombination path at scale).
    l1, n1, s1 = run(16, [(0, 8)])
    l2, n2, s2 = run(16, [(0, 5), (5, 8)])
    npt.assert_array_equal(np.asarray(l1), np.asarray(l2))
    npt.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    l1, n1, s1 = run(32, [(0, 8)])
    l2, n2, s2 = run(32, [(0, 1), (1, 8)])
    npt.assert_array_equal(np.asarray(l1), np.asarray(l2))
    npt.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)

    # Wider beams never find a worse best path, and never beat Viterbi.
    _, _, viterbi_w = lattice.shortest_path(params, frames, num_frames)
    prev = None
    for k in [1, 2, 4, 8, 16, 32]:
      _, _, s = run(k, [(0, 8)])
      if prev is not None:
        assert np.all(np.asarray(s) >= prev - 1e-5)
      prev = np.asarray(s)
      assert np.all(prev <= np.asarray(viterbi_w) + 1e-4)

  def test_recombination_beats_unmerged_at_equal_beam(self):
    """Duplicate label prefixes crowd out a needed survivor unless merged.

    At t1 the same sequence [1] is reachable two ways (emit early + stay,
    or stay + emit late); without recombination both copies fill the
    2-wide beam and [2] is pruned — missing the large t2 payoff.
    """
    vocab = 2  # states: 0 = start, 1 = after label 1, 2 = after label 2
    context = contexts.FullNGram(vocab_size=vocab, context_size=1)
    # [input, state, (blank, y1, y2)]
    table = np.array([
        [[0.95, 1.0, 0.9], [-10., -10., -10.], [-10., -10., -10.]],
        [[-1.0, 0.5, 0.4], [0.5, -10., -10.], [0.3, -10., -10.]],
        [[-10., -10., -10.], [0.1, -10., -10.], [10.0, -10., -10.]],
    ], np.float32)
    t = np.broadcast_to(table, (1, 2) + table.shape)
    lattice = last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
        weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
            jnp.asarray(t)))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
    frames = jnp.array([[[0.0], [1.0], [2.0]]])
    num_frames = jnp.array([3])

    def run(merge):
      beam = streaming.StreamingBeamDecoder(lattice, beam_size=2,
                                            max_labels=4, merge=merge)
      state = beam.step(params, beam.init_state(1), frames, num_frames)
      return beam.best(state)

    lm, nm, sm = run('max')
    lu, nu, su = run('none')
    assert list(np.asarray(lm)[0][:int(nm[0])]) == [2]
    npt.assert_allclose(np.asarray(sm)[0], 0.95 + 0.4 + 10.0, rtol=1e-6)
    assert list(np.asarray(lu)[0][:int(nu[0])]) == [1]
    assert float(sm[0]) > float(su[0])

  def test_logsumexp_recombination_accumulates_path_mass(self):
    """merge='logsumexp': score is the total mass of the label sequence."""
    vocab = 1
    context = contexts.FullNGram(vocab_size=vocab, context_size=1)
    # Two paths reach [1] over 2 frames: emit(a)+blank(d) or blank(c)+
    # emit(b'); total mass = logaddexp(a + d, c + b').
    a, c = 0.7, 0.2       # frame-0 lexical/blank from start
    b2, d = -0.4, 0.5     # frame-1 lexical from start / blank from state 1
    table = np.array([
        [[c, a], [-50., -50.]],
        [[-50., b2], [d, -50.]],
    ], np.float32)
    t = np.broadcast_to(table, (1, 2) + table.shape)
    lattice = last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
        weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
            jnp.asarray(t)))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
    frames = jnp.array([[[0.0], [1.0]]])
    num_frames = jnp.array([2])

    beam = streaming.StreamingBeamDecoder(lattice, beam_size=2,
                                          max_labels=2, merge='logsumexp')
    state = beam.step(params, beam.init_state(1), frames, num_frames)
    bl, bn, bs = beam.best(state)
    assert list(np.asarray(bl)[0][:int(bn[0])]) == [1]
    npt.assert_allclose(np.asarray(bs)[0],
                        np.logaddexp(a + d, c + b2), rtol=1e-6)

    with pytest.raises(ValueError, match='merge'):
      streaming.StreamingBeamDecoder(lattice, beam_size=2, max_labels=2,
                                     merge='sum')

  def test_full_hypotheses_stop_extending(self):
    """At max_labels, lexical extension stops: scores stay consistent
    with the returned (complete) label sequences."""
    vocab = 1
    context = contexts.FullNGram(vocab_size=vocab, context_size=1)
    # Lexical (+1) always beats blank (0) from every state.
    table = np.array([[[0.0, 1.0], [0.0, 1.0]]], np.float32)  # [1, S, 2]
    t = np.broadcast_to(table, (1, 2) + table.shape)
    lattice = last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
        weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(
            jnp.asarray(t)))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
    frames = jnp.zeros((1, 4, 1))
    num_frames = jnp.array([4])

    beam = streaming.StreamingBeamDecoder(lattice, beam_size=2,
                                          max_labels=2)
    state = beam.step(params, beam.init_state(1), frames, num_frames)
    bl, bn, bs = beam.best(state)
    # Two labels (+1 each) then two forced blanks (0): score 2, not 4.
    assert int(bn[0]) == 2
    npt.assert_array_equal(np.asarray(bl)[0], [1, 1])
    npt.assert_allclose(np.asarray(bs)[0], 2.0, rtol=1e-6)

  def test_nbest_sorted_and_consistent_with_best(self):
    lattice = build(alignments.FrameDependent())
    params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
    frames = jax.random.normal(jax.random.PRNGKey(5), (2, 6, 5))
    num_frames = jnp.full((2,), 6, jnp.int32)
    beam = streaming.StreamingBeamDecoder(lattice, beam_size=4,
                                          max_labels=8)
    state = beam.step(params, beam.init_state(2), frames, num_frames)
    labels, num_labels, scores = beam.nbest(state, 3)
    assert labels.shape == (2, 3, 8) and scores.shape == (2, 3)
    s = np.asarray(scores)
    assert np.all(s[:, :-1] >= s[:, 1:])  # sorted
    bl, bn, bs = beam.best(state)
    npt.assert_array_equal(np.asarray(bl), np.asarray(labels)[:, 0])
    npt.assert_allclose(np.asarray(bs), s[:, 0])
    with pytest.raises(ValueError, match='beam_size'):
      beam.nbest(state, 5)


def test_beam_quality_invariants():
  """Score-regret contract vs offline Viterbi (merge='max'): a beam
  hypothesis score is a max over a SUBSET of alignment paths, so it can
  never exceed the shortest_path weight, and regret must shrink with
  width (benchmarks/beam_quality.py measures the full table)."""
  lattice = build(alignments.FrameDependent(), vocab=4)
  params = lattice.init(jax.random.PRNGKey(0), feature_size=8)
  frames = jax.random.normal(jax.random.PRNGKey(1), (4, 6, 8))
  num_frames = jnp.array([6, 6, 4, 3])
  _, _, w_v = lattice.shortest_path(params, frames, num_frames)

  regrets = []
  for beam in (1, 8):
    dec = streaming.StreamingBeamDecoder(lattice, beam_size=beam,
                                         max_labels=6, merge='max')
    state = dec.step(params, dec.init_state(4), frames, num_frames)
    _, _, score = dec.best(state)
    excess = np.asarray(score) - np.asarray(w_v)
    assert float(excess.max()) < 1e-4, 'beam score exceeds Viterbi'
    regrets.append(float(np.maximum(-excess, 0).mean()))
  assert regrets[1] <= regrets[0] + 1e-6


@pytest.mark.parametrize('make_context', [
    lambda: contexts.FullNGram(vocab_size=3, context_size=0),
    lambda: contexts.FullNGram(vocab_size=3, context_size=2),
    lambda: contexts.NextStateTable(
        contexts.FullNGram(vocab_size=3, context_size=1).next_state_table()),
])
def test_streaming_decoders_generic_contexts(make_context):
  """Greedy and beam work over any ContextDependency (not bigram-gated).

  Includes the single-state CTC topology (context_size=0), whose offline
  Viterbi bound exercises the scan-free factorized route end to end
  against the streaming decoders.
  """
  context = make_context()
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=5)
  cache = lattice.build_cache(params)
  frames = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 5))
  num_frames = jnp.array([6, 4])

  greedy = streaming.StreamingGreedyDecoder(lattice)
  _, gl, _ = greedy.step(params, greedy.init_state(2), frames, num_frames,
                         cache)
  expected = greedy_oracle(lattice, params, cache, frames, num_frames,
                           max_emissions=1, trailing_blank=False)
  npt.assert_array_equal(np.asarray(gl), expected)

  beam = streaming.StreamingBeamDecoder(lattice, beam_size=3, max_labels=6)
  state = beam.step(params, beam.init_state(2), frames, num_frames, cache)
  _, _, scores = beam.best(state)
  # Beam's best path weight is bounded by the global Viterbi optimum.
  _, _, viterbi_w = lattice.shortest_path(params, frames, num_frames)
  assert np.all(np.asarray(scores) <= np.asarray(viterbi_w) + 1e-4)


def test_nbest_offline_matches_decode_and_orders_scores():
  """Offline n-best: 1-best agrees with the beam's own best; scores sorted."""
  from last_torch_tpu import alignments
  lattice = build(alignments.FrameDependent())
  params = lattice.init(jax.random.PRNGKey(0), feature_size=6)
  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 6))
  num_frames = jnp.array([6, 4])

  labels, num_labels, scores = streaming.nbest_offline(
      lattice, params, frames, num_frames, beam_size=4)
  assert labels.shape[:2] == (2, 4)
  scores = np.asarray(scores)
  assert np.all(np.diff(scores, axis=1) <= 1e-6)  # best first

  # 1-best equals the streaming greedy/beam best path labels.
  dec = streaming.StreamingBeamDecoder(lattice, beam_size=4,
                                       max_labels=labels.shape[-1])
  state = dec.init_state(2)
  state = dec.step(params, state, frames, num_frames,
                   lattice.build_cache(params))
  want_labels, want_n, want_score = dec.best(state)
  npt.assert_array_equal(np.asarray(labels)[:, 0], np.asarray(want_labels))
  npt.assert_array_equal(np.asarray(num_labels)[:, 0], np.asarray(want_n))
  npt.assert_allclose(scores[:, 0], np.asarray(want_score), rtol=1e-6)
