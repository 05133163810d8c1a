# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Expected-risk (MWER-style) training over sampled alignment paths.

Sequence-level discriminative fine-tuning minimizes the expected task
risk ``E_{path ~ p(.|x)}[risk(labels(path), reference)]`` — for speech,
risk is the label/word edit distance, so the objective directly targets
WER instead of likelihood. The reference library has no such objective
(its losses are the likelihood family, ref ``lattices.py:131-183``); this
module builds one on top of the lattice machinery this repo already has:

* ``RecognitionLattice.sample_paths`` draws EXACT i.i.d. posterior
  alignment paths with exact per-sample log-probabilities (FFBS), so the
  estimators below need no approximate n-best search and carry no search
  bias — unlike the classic n-best MWER recipe (Prabhavalkar et al. 2018,
  arXiv 1712.01818), whose hypothesis set is whatever beam search found.
* ``models.metrics.edit_distance`` scores each sampled label sequence
  against the reference transcript as a batched jittable DP.

Why sampling instead of differentiating an expectation semiring: the
Expectation semiring computes exact expectations of ADDITIVELY
path-decomposable quantities only; edit distance is a global function of
the emitted label string, so its expectation has no exact DP — Monte
Carlo over exact posterior samples is the standard estimator.

Two gradient estimators, both driven by the exact sampled log-posteriors
``log p_i = w(path_i) - log Z`` (differentiable wrt params through the
arc-weight gathers and the backward scan):

* ``estimator='mwer'``: renormalize the sampled paths' posteriors over
  the sample set, ``w_hat_i = softmax_i(log p_i)``, and take the loss
  ``sum_i w_hat_i * (risk_i - rbar)`` with the baseline
  ``rbar = sum_i stop_grad(w_hat_i) * risk_i``. This is the n-best MWER
  objective with the beam replaced by exact samples; the in-set softmax
  couples the samples, and the relative weighting of GOOD vs BAD
  hypotheses drives the gradient. Because i.i.d. samples already arrive
  p-weighted, re-weighting a sample LIST by softmax(log p) counts
  probability twice: the value converges to the posterior-tilted risk
  ``E[p*r]/E[p]`` (not ``E[r]``), and the fixed-sample gradient to half
  that objective's gradient — a sensible discriminative target that
  emphasizes errors on high-probability paths (verified against
  enumeration in ``tests/test_risk.py``). For the unbiased gradient of
  the plain expected risk, use ``'reinforce'``.
* ``estimator='reinforce'``: the unbiased score-function estimator
  ``mean_i (risk_i - b_i) * grad log p_i`` with a leave-one-out mean
  baseline ``b_i`` (exactly unbiased for ``grad E[risk]`` because the
  samples are exact and i.i.d.; the baseline is independent of sample i).

Both return the same VALUE — the Monte Carlo expected risk under the
matching weighting — so the scalar is directly loggable as a training
metric. Typical use mixes expected risk with the likelihood loss::

    def loss_fn(params, batch, key):
      nll = lattice.loss(params, ...)
      er, _ = risk.sampled_risk_loss(lattice, params, frames, num_frames,
                                     labels, num_labels, key)
      return jnp.mean(nll) + mwer_weight * jnp.mean(er)

Everything is jit/vmap/pjit-compatible (static shapes, no data-dependent
control flow); under data parallelism simply shard the batch dims as for
the likelihood loss.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from last_torch_tpu.models import metrics

# risk_fn(hyp, num_hyp, ref, num_ref) -> [batch..., num_samples] risks.
RiskFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
                  jnp.ndarray]


def labels_from_alignment(alignment_labels: jnp.ndarray,
                          max_labels: Optional[int] = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Extracts emitted label sequences from packed alignment paths.

  Args:
    alignment_labels: [..., num_slots] packed alignment labels in the
      ``shortest_path``/``sample_paths`` slot format (0 = blank/unused,
      1..V = lexical).
    max_labels: Optional output length cap. Defaults to ``num_slots``
      (lossless). If a path emits more than ``max_labels`` labels the
      extracted sequence is truncated (the count is clamped too).

  Returns:
    (labels, num_labels): [..., max_labels] left-justified emitted labels
    (0-padded) and [...] counts.
  """
  alignment_labels = jnp.asarray(alignment_labels)
  emitted = alignment_labels > 0
  # Stable argsort of "is padding" left-justifies the emitted labels
  # while preserving their order.
  order = jnp.argsort(~emitted, axis=-1, stable=True)
  labels = jnp.take_along_axis(alignment_labels, order, axis=-1)
  num = jnp.sum(emitted, axis=-1).astype(jnp.int32)
  if max_labels is not None and max_labels < labels.shape[-1]:
    labels = labels[..., :max_labels]
    num = jnp.minimum(num, max_labels)
  return labels.astype(jnp.int32), num


def edit_distance_risk(hyp: jnp.ndarray, num_hyp: jnp.ndarray,
                       ref: jnp.ndarray, num_ref: jnp.ndarray
                       ) -> jnp.ndarray:
  """Default risk: raw label edit distance (MWER's "number of errors")."""
  return metrics.edit_distance(hyp, num_hyp, ref, num_ref).astype(
      jnp.float32)


def sampled_risk_loss(lattice,
                      params: Any,
                      frames: jnp.ndarray,
                      num_frames: jnp.ndarray,
                      labels: jnp.ndarray,
                      num_labels: jnp.ndarray,
                      key: jax.Array,
                      num_samples: int = 4,
                      estimator: str = 'mwer',
                      risk_fn: RiskFn = edit_distance_risk,
                      max_hyp_labels: Optional[int] = None,
                      cache: Any = None) -> Tuple[jnp.ndarray, dict]:
  """Expected-risk loss over exact posterior path samples.

  Args:
    lattice: A ``RecognitionLattice``.
    params: Parameter pytree from ``lattice.init``.
    frames: [batch_dims..., max_num_frames, feature_size] padded frames.
    num_frames: [batch_dims...] frame counts.
    labels: [batch_dims..., max_num_labels] reference transcripts.
    num_labels: [batch_dims...] reference label counts.
    key: PRNG key for path sampling.
    num_samples: Samples per utterance. More samples = lower estimator
      variance (and lower MWER bias); samples are nearly free beyond the
      two weight-fn applications per frame (see ``sample_paths``).
    estimator: ``'mwer'`` (in-sample softmax weighting, the n-best MWER
      objective over exact samples) or ``'reinforce'`` (unbiased
      score-function gradient with a leave-one-out baseline).
    risk_fn: Maps (hyp, num_hyp, ref, ref_num) -> [batch..., num_samples]
      risks; defaults to raw label edit distance. Treated as
      non-differentiable (stop-gradient).
    max_hyp_labels: Optional cap on extracted hypothesis length (speeds
      the risk DP at long T; sampled paths rarely approach the structural
      ``num_frames * num_alignment_states`` bound).
    cache: Optional weight-fn cache data.

  Returns:
    (loss, aux): ``loss`` [batch_dims...] — differentiable per-utterance
    expected risk (minimize its mean); ``aux`` dict with ``risk``
    [batch..., num_samples] per-sample risks, ``log_prob`` the exact
    sampled posterior log-probs, ``mean_risk`` the plain Monte Carlo
    average risk (the cleanest eval metric), and ``hyp_labels`` /
    ``num_hyp_labels`` the sampled transcripts.
  """
  if estimator not in ('mwer', 'reinforce'):
    raise ValueError(f"estimator must be 'mwer' or 'reinforce', "
                     f'got {estimator!r}')
  if num_samples < 2:
    # Both estimators are gradient-free at one sample: REINFORCE has no
    # leave-one-out baseline, and MWER's single softmax weight is the
    # constant 1 with a zero advantage — a silent training no-op.
    raise ValueError(
        f'num_samples must be >= 2 for a usable gradient (got '
        f'{num_samples}); with one sample the {estimator!r} estimator '
        'has zero gradient')
  align_labels, _, log_prob = lattice.sample_paths(
      params, frames, num_frames, key, num_samples=num_samples,
      cache=cache)
  hyp, num_hyp = labels_from_alignment(align_labels, max_hyp_labels)
  ref = jnp.asarray(labels, jnp.int32)[..., None, :]
  num_ref = jnp.asarray(num_labels, jnp.int32)[..., None]
  m = num_samples
  risk = risk_fn(hyp, num_hyp,
                 jnp.broadcast_to(ref, hyp.shape[:-1] + ref.shape[-1:]),
                 jnp.broadcast_to(num_ref, hyp.shape[:-1]))
  risk = jax.lax.stop_gradient(jnp.asarray(risk, jnp.float32))

  if estimator == 'mwer':
    w_hat = jax.nn.softmax(log_prob, axis=-1)
    rbar = jnp.sum(jax.lax.stop_gradient(w_hat) * risk, axis=-1)
    # sum_i w_hat_i = 1, so adding back the stopped baseline keeps the
    # VALUE equal to the softmax-weighted expected risk while the
    # gradient sees the variance-reduced (risk - rbar) advantage.
    loss = jnp.sum(w_hat * (risk - rbar[..., None]), axis=-1) + rbar
  else:
    # Leave-one-out baseline: b_i = mean of the other samples' risks.
    total = jnp.sum(risk, axis=-1, keepdims=True)
    baseline = (total - risk) / (m - 1)
    advantage = risk - baseline
    score = log_prob - jax.lax.stop_gradient(log_prob)
    # VALUE is the plain Monte Carlo mean risk; the second term is zero
    # in value and contributes the score-function gradient.
    loss = jnp.mean(risk, axis=-1) + jnp.mean(advantage * score, axis=-1)

  aux = {
      'risk': risk,
      'log_prob': log_prob,
      'mean_risk': jnp.mean(risk, axis=-1),
      'hyp_labels': hyp,
      'num_hyp_labels': num_hyp,
  }
  return loss, aux


def per_example_keys(key: jax.Array, batch_size: int,
                     offset: jnp.ndarray | int = 0) -> jax.Array:
  """One folded PRNG key per batch row: ``fold_in(key, offset + i)``.

  Feeding these to ``sampled_risk_loss_per_example`` makes the sampled
  paths a function of each row's GLOBAL index only — invariant to how
  the batch is sharded over a mesh or split into micro-batches. Under
  ``shard_map`` data parallelism pass
  ``offset = axis_index(axis) * local_batch`` so every device folds its
  rows' global indices (see ``parallel.sharding.
  make_shard_map_risk_train_step``).
  """
  idx = jnp.asarray(offset) + jnp.arange(batch_size)
  return jax.vmap(lambda i: jax.random.fold_in(key, i))(idx)


def sampled_risk_loss_per_example(lattice,
                                  params: Any,
                                  frames: jnp.ndarray,
                                  num_frames: jnp.ndarray,
                                  labels: jnp.ndarray,
                                  num_labels: jnp.ndarray,
                                  row_keys: jax.Array,
                                  num_samples: int = 4,
                                  estimator: str = 'mwer',
                                  risk_fn: RiskFn = edit_distance_risk,
                                  max_hyp_labels: Optional[int] = None,
                                  cache: Any = None
                                  ) -> Tuple[jnp.ndarray, dict]:
  """``sampled_risk_loss`` with one PRNG key per batch row.

  The plain entry point draws each frame's Gumbel noise from a single
  key over the whole ``[batch, ...]`` logits array, so the bit stream —
  and therefore the sampled paths — changes when the batch is sharded
  into per-device blocks. This variant vmaps the loss over the leading
  batch axis with per-row keys (``per_example_keys``), making the
  samples depend only on ``(key, global row index)``: a ``shard_map``
  data-parallel step reproduces the single-device samples bit-for-bit.

  Args and returns match ``sampled_risk_loss`` except ``key`` becomes
  ``row_keys`` ([batch] typed PRNG keys) and only a 1-D leading batch
  dim is supported.
  """
  num_frames = jnp.asarray(num_frames)
  if num_frames.ndim != 1:
    raise ValueError('sampled_risk_loss_per_example supports a single '
                     f'leading batch dim, got batch_dims '
                     f'{num_frames.shape}')
  if cache is None:
    cache = lattice.build_cache(params)

  def one(f, nf, l, nl, k):
    return sampled_risk_loss(
        lattice, params, f, nf, l, nl, k, num_samples=num_samples,
        estimator=estimator, risk_fn=risk_fn,
        max_hyp_labels=max_hyp_labels, cache=cache)

  return jax.vmap(one, in_axes=(0, 0, 0, 0, 0))(
      frames, num_frames, jnp.asarray(labels), jnp.asarray(num_labels),
      row_keys)
