"""Expected-risk (MWER / REINFORCE) training against enumeration oracles.

On lattices small enough to enumerate every alignment path, the exact
expected risk ``E[r] = sum_p p(path) r(path)`` and its gradient wrt the
arc-weight table are computable in closed form (softmax over the
enumerated path weights — differentiable in JAX). These tests verify:

- ``labels_from_alignment`` extraction semantics;
- estimator VALUES: REINFORCE reports the plain Monte Carlo mean risk
  and converges to the exact ``E[r]``; the sampled-MWER value converges
  to its documented target, the posterior-tilted ``E[p r] / E[p]``
  (softmax over a SAMPLED list double-counts duplicates — see the module
  docstring);
- estimator GRADIENTS: the REINFORCE gradient, averaged over many keys,
  matches the exact ``grad E[r]`` (unbiasedness); the MWER gradient
  matches the exact gradient of the tilted objective it optimizes;
- error paths.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

import last_torch_tpu
from last_torch_tpu import alignments, contexts, risk, weight_fns

from test_lattice_fuzz import frame_arc_options

VOCAB = 2
INPUT_VOCAB = 3


def build_lattice(table, max_expansions):
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=1)
  alignment = (alignments.FrameDependent() if max_expansions is None else
               alignments.FrameLabelDependent(max_expansions))
  return last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: weight_fns.TableWeightFn(table))


def path_arc_indices(nxt, frames_int, arcs_per_frame, max_expansions):
  """(f, state, col) table indices of every arc on one path + labels."""
  state, idx, emitted = 0, [], []
  for t, arcs in enumerate(arcs_per_frame):
    f = int(frames_int[t])
    for y in arcs:
      idx.append((f, state, y))
      state = int(nxt[state, y - 1])
      emitted.append(y)
    if max_expansions is not None or not arcs:
      idx.append((f, state, 0))
  return idx, emitted


def edit_distance_np(hyp, ref):
  d = np.arange(len(ref) + 1)
  for i, h in enumerate(hyp):
    prev = d.copy()
    d[0] = i + 1
    for j, r in enumerate(ref):
      d[j + 1] = min(prev[j] + (h != r), prev[j + 1] + 1, d[j] + 1)
  return int(d[-1])


def enumeration_oracle(max_expansions, num_frames, ref, seed):
  """Returns (table, frames, exact-value/grad fns) for a tiny lattice."""
  rng = np.random.default_rng(seed)
  context = contexts.FullNGram(vocab_size=VOCAB, context_size=1)
  num_states, _ = context.shape()
  nxt = np.asarray(context.next_state_table())
  table = np.asarray(
      rng.normal(size=(1, INPUT_VOCAB, num_states, 1 + VOCAB)), np.float32)
  frames_int = rng.integers(0, INPUT_VOCAB, size=num_frames)

  opts = frame_arc_options(max_expansions)
  all_idx, risks = [], []
  max_arcs = 0
  for arcs_per_frame in itertools.product(opts, repeat=num_frames):
    idx, emitted = path_arc_indices(nxt, frames_int, arcs_per_frame,
                                    max_expansions)
    all_idx.append(idx)
    risks.append(edit_distance_np(emitted, ref))
    max_arcs = max(max_arcs, len(idx))
  p = len(all_idx)
  fi = np.zeros((p, max_arcs), np.int32)
  si = np.zeros((p, max_arcs), np.int32)
  ci = np.zeros((p, max_arcs), np.int32)
  mask = np.zeros((p, max_arcs), np.float32)
  for i, idx in enumerate(all_idx):
    for a, (f, s, c) in enumerate(idx):
      fi[i, a], si[i, a], ci[i, a], mask[i, a] = f, s, c, 1.0
  risks = jnp.asarray(np.asarray(risks, np.float32))

  def path_weights(tbl):
    return jnp.sum(tbl[0, fi, si, ci] * mask, axis=-1)

  def exact_expected_risk(tbl):
    return jnp.sum(jax.nn.softmax(path_weights(tbl)) * risks)

  def exact_tilted_risk(tbl):
    # The sampled-MWER target: E[p r] / E[p] = sum p^2 r / sum p^2.
    w = path_weights(tbl)
    return jnp.sum(jax.nn.softmax(2.0 * w) * risks)

  return table, frames_int, exact_expected_risk, exact_tilted_risk


def test_labels_from_alignment():
  al = jnp.asarray([[0, 2, 0, 1, 0, 0, 2, 0],
                    [0, 0, 0, 0, 0, 0, 0, 0]])
  labels, num = risk.labels_from_alignment(al)
  npt.assert_array_equal(labels[0, :3], [2, 1, 2])
  npt.assert_array_equal(labels[0, 3:], 0)
  npt.assert_array_equal(num, [3, 0])
  capped, num_c = risk.labels_from_alignment(al, max_labels=2)
  assert capped.shape == (2, 2)
  npt.assert_array_equal(capped[0], [2, 1])
  npt.assert_array_equal(num_c, [2, 0])


@pytest.mark.parametrize('max_expansions', [None, 1])
def test_values_match_enumeration(max_expansions):
  num_frames = 3
  ref = [1, 2]
  table, frames_int, exact_er, exact_tilted = enumeration_oracle(
      max_expansions, num_frames, ref, seed=0)
  tbl = jnp.asarray(table)
  lattice = build_lattice(tbl, max_expansions)
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  frames = jnp.asarray(frames_int, jnp.float32)[None, :, None]
  nf = jnp.asarray([num_frames], jnp.int32)
  labels = jnp.asarray([ref], jnp.int32)
  nl = jnp.asarray([len(ref)], jnp.int32)

  m = 4096
  loss_r, aux = risk.sampled_risk_loss(
      lattice, params, frames, nf, labels, nl, jax.random.PRNGKey(3),
      num_samples=m, estimator='reinforce')
  # Value identity: REINFORCE loss == plain mean risk.
  npt.assert_allclose(np.asarray(loss_r), np.asarray(aux['mean_risk']),
                      rtol=1e-6)
  # Consistency: Monte Carlo mean -> exact E[r].
  er = float(exact_er(tbl))
  var = float(jnp.mean((aux['risk'] - er) ** 2))
  npt.assert_allclose(float(loss_r[0]), er,
                      atol=5 * np.sqrt(var / m) + 1e-3)

  loss_m, _ = risk.sampled_risk_loss(
      lattice, params, frames, nf, labels, nl, jax.random.PRNGKey(3),
      num_samples=m, estimator='mwer')
  tilted = float(exact_tilted(tbl))
  npt.assert_allclose(float(loss_m[0]), tilted, atol=0.05)


@pytest.mark.parametrize('estimator', ['reinforce', 'mwer'])
def test_gradient_matches_enumeration(estimator):
  max_expansions = 1
  num_frames = 3
  ref = [2, 1]
  table, frames_int, exact_er, exact_tilted = enumeration_oracle(
      max_expansions, num_frames, ref, seed=1)
  frames = jnp.asarray(frames_int, jnp.float32)[None, :, None]
  nf = jnp.asarray([num_frames], jnp.int32)
  labels = jnp.asarray([ref], jnp.int32)
  nl = jnp.asarray([len(ref)], jnp.int32)
  params = build_lattice(jnp.asarray(table), max_expansions).init(
      jax.random.PRNGKey(0), feature_size=1)

  # REINFORCE is exactly unbiased at any M >= 2, so many small sample
  # sets maximize averaging. The MWER fixed-sample gradient only reaches
  # its asymptote as M grows (the in-set softmax couples samples), so use
  # large sets.
  m, num_keys = (8, 1024) if estimator == 'reinforce' else (512, 64)
  keys = jax.random.split(jax.random.PRNGKey(17), num_keys)

  def mean_estimate(tbl):
    lattice = build_lattice(tbl, max_expansions)

    def one(key):
      loss, _ = risk.sampled_risk_loss(
          lattice, params, frames, nf, labels, nl, key,
          num_samples=m, estimator=estimator)
      return loss[0]

    return jnp.mean(jax.vmap(one)(keys))

  g_est = np.asarray(jax.grad(mean_estimate)(jnp.asarray(table)))
  if estimator == 'reinforce':
    g_exact = np.asarray(jax.grad(exact_er)(jnp.asarray(table)))
  else:
    # The fixed-sample MWER gradient sum_i w_hat_i (r_i - J_hat) d w_i
    # asymptotes (M -> inf) to E_p[p (r - J) dlogp] / E_p[p], which is
    # exactly HALF the tilted objective's gradient: with B = sum_paths
    # p^2, dJ = 2 sum p^2 (r - J) dlogp / B while the estimator's limit
    # is sum p^2 (r - J) dlogp / B. (The other half is the sampling
    # score-function term the estimator deliberately does not carry —
    # standard for MWER, whose n-best list is likewise treated as fixed.)
    g_exact = 0.5 * np.asarray(jax.grad(exact_tilted)(jnp.asarray(table)))

  scale = np.abs(g_exact).max()
  assert scale > 1e-3  # the oracle is not degenerate
  # 8*1024 samples (reinforce) / 512*64 (mwer): the entrywise Monte
  # Carlo error should be well under 15% of the gradient's global scale,
  # and the directions must agree.
  npt.assert_allclose(g_est, g_exact, atol=0.15 * scale)
  cos = (g_est * g_exact).sum() / (
      np.linalg.norm(g_est) * np.linalg.norm(g_exact))
  assert cos > 0.98, f'gradient cosine {cos}'


def test_error_paths():
  table = jnp.zeros((1, INPUT_VOCAB, 1 + VOCAB, 1 + VOCAB), jnp.float32)
  lattice = build_lattice(table, 1)
  params = lattice.init(jax.random.PRNGKey(0), feature_size=1)
  frames = jnp.zeros((1, 2, 1), jnp.float32)
  nf = jnp.asarray([2], jnp.int32)
  labels = jnp.asarray([[1]], jnp.int32)
  nl = jnp.asarray([1], jnp.int32)
  with pytest.raises(ValueError, match='estimator'):
    risk.sampled_risk_loss(lattice, params, frames, nf, labels, nl,
                           jax.random.PRNGKey(0), estimator='nope')
  for estimator in ('reinforce', 'mwer'):
    with pytest.raises(ValueError, match='num_samples'):
      risk.sampled_risk_loss(lattice, params, frames, nf, labels, nl,
                             jax.random.PRNGKey(0), num_samples=1,
                             estimator=estimator)


@pytest.mark.slow
def test_mwer_fine_tuning_improves_error_rate():
  """End-to-end value check (VERDICT round-4 task 8): MWER fine-tuning
  after likelihood training lowers the Monte Carlo expected edit
  distance AND does not regress the Viterbi label error rate, on a
  synthetic separable-but-noisy task. The estimator itself is
  enumeration-verified above; this pins that it moves the metric when
  wired into the model family (examples/train_mwer.py is the narrated
  version of this test)."""
  from last_torch_tpu.models import gnat
  from last_torch_tpu.models import metrics

  vocab, feature = 6, 8
  config = gnat.GNATConfig(
      vocab_size=vocab, feature_size=feature, context_size=1,
      encoder_size=16, encoder_layers=1, encoder_heads=2,
      encoder_ffn_size=32, hidden_size=16, embedding_size=8,
      max_expansions=1, locally_normalized=True)
  model = gnat.GNATModel(config)

  def synthetic_batch(rng, batch, max_u=4):
    max_t = 2 * max_u
    num_labels = rng.integers(2, max_u + 1, size=(batch,))
    labels = np.zeros((batch, max_u), np.int32)
    frames = rng.normal(size=(batch, max_t, feature)) * 0.45
    for b in range(batch):
      seq = rng.integers(1, vocab + 1, size=num_labels[b])
      labels[b, :num_labels[b]] = seq
      for u, y in enumerate(seq):
        frames[b, 2 * u:2 * u + 2, y - 1] += 1.0
    return (jnp.asarray(frames, jnp.float32),
            jnp.asarray(2 * num_labels, jnp.int32),
            jnp.asarray(labels), jnp.asarray(num_labels, jnp.int32))

  rng = np.random.default_rng(0)
  batches = [synthetic_batch(rng, 8) for _ in range(4)]

  def label_error_rate(params):
    state = metrics.empty_error_rate_state()
    for frames, num_frames, labels, num_labels in batches:
      aligned, _, _ = model.decode(params, frames, num_frames)
      hyp, num_hyp = risk.labels_from_alignment(aligned)
      state = metrics.update_error_rate(state, hyp, num_hyp, labels,
                                        num_labels)
    return float(metrics.error_rate(state))

  optimizer = gnat.make_optimizer(learning_rate=3e-3, warmup_steps=10)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  nll_step = jax.jit(lambda s, *b: gnat.train_step(model, optimizer, s, *b))
  for step in range(120):
    state, _ = nll_step(state, *batches[step % len(batches)])
  ler_nll = label_error_rate(state.params)

  ft_optimizer = gnat.make_optimizer(learning_rate=1e-3)
  ft_state = gnat.GNATTrainState(
      params=state.params, opt_state=ft_optimizer.init(state.params),
      step=jnp.zeros((), jnp.int32))
  risk_step = jax.jit(lambda s, k, *b: gnat.risk_train_step(
      model, ft_optimizer, s, *b, key=k, num_samples=8,
      estimator='reinforce', nll_weight=0.1))
  risks = []
  for step in range(120):
    key = jax.random.fold_in(jax.random.PRNGKey(1), step)
    ft_state, m = risk_step(ft_state, key, *batches[step % len(batches)])
    risks.append(float(m['mean_risk']))
  ler_mwer = label_error_rate(ft_state.params)

  # Average the noisy Monte Carlo risk over the first/last few steps.
  first, last = np.mean(risks[:8]), np.mean(risks[-8:])
  assert last < first, (first, last)
  assert ler_mwer <= ler_nll, (ler_nll, ler_mwer)
