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

"""Recognition lattice, TPU-native.

Rebuild of the reference ``last_torch/lattices.py`` designed for XLA:

* Every per-frame / per-label Python loop of the reference
  (``lattices.py:830-906``) is a ``jax.lax.scan`` — one compiled program, no
  per-step Python dispatch.
* The forward scan body is rematerialized (``jax.checkpoint`` with a
  nothing-saveable policy), so reverse-mode autodiff stores only the O(B*S)
  alpha carries per frame and recomputes the O(B*S*V) arc weights — the remat
  policy the reference sketched but never wired up (``lattices.py:464-476``,
  SURVEY §2.2-Q5).
* The globally-normalized denominator uses a working ``jax.custom_vjp``
  forward-backward: forward = scan saving alpha only, backward = reverse scan
  computing arc marginals with ``alignment.backward`` and accumulating weight
  function gradients via per-frame VJPs — the design the reference documents
  (``lattices.py:531-557,695-721``) but leaves broken (SURVEY §2.2-Q3).
* Viterbi decoding differentiates the MaxTropical shortest distance with
  respect to a zero-valued lexical mask; the one-hot tie-broken tropical
  gradients identify exactly one best path (``lattices.py:219-247``).
"""

from __future__ import annotations

import functools
from collections.abc import Callable, Sequence
from typing import Any, Generic, Optional, Protocol, TypeVar

import jax
import jax.numpy as jnp
import numpy as np

from last_torch_tpu import alignments
from last_torch_tpu import contexts
from last_torch_tpu import semirings
from last_torch_tpu import weight_fns

DType = Any
T = TypeVar('T')

# Unroll factor for the numerator string-DP time scan (``_string_dp``).
# The scan body is a handful of [batch, U+1] elementwise semiring ops —
# far too little work to cover the TPU's per-iteration while-loop
# overhead at production T, so unrolling lets XLA fuse many frames into
# each loop trip. Hardware sweep (``benchmarks/tpu_stringdp_probe.py``,
# B=32 T=1600 U=100, chained in-jit timer, 2026-08-18): fwd+bwd of the
# DP alone 4.83 / 3.31 / 2.41 / 2.44 ms at unroll 1/4/16/64, and the
# full S=1 numerator train cost 11.57 / 7.40 / 6.88 ms at 1/16/64; the
# forward-only DP mildly prefers unroll=1 (0.24 vs 1.58 ms) but
# training dominates production, so 16 is the balanced default.
STRING_DP_UNROLL = 16

# Route the Log-semiring string DP through the scan-free closed form
# (``_string_dp_alpha_cumulative``): one affine time recurrence per label
# position, solved with cumsum + cumlogsumexp instead of a T-step
# sequential scan. MEASURED NEGATIVE — stays off: on hardware
# (``benchmarks/tpu_stringdp_probe.py``, same shapes/timer as above) the
# closed form runs 183.99 ms fwd / 19.43 ms fwd+bwd vs the unrolled
# scan's 1.58 / 2.41 ms, and the full S=1 numerator 24.26 vs 7.40 ms:
# the [T, batch] cumulative logsumexp chains XLA emits are log-depth in
# theory but memory-bound over U+1 full-T temporaries in practice,
# while the unrolled scan keeps one [batch, U+1] carry in registers.
# Kept (tested, ``tests/test_string_dp_cumulative.py``) as the basis
# for a future associative-scan Mosaic kernel; numerically it matches
# the scan up to float reassociation and requires FINITE blank weights
# (the closed form divides by the cumulative blank product).
STRING_DP_CUMULATIVE = False

# A callable lifting plain arc weight arrays into semiring values, enabling
# tuple-valued semirings (e.g. Expectation for entropy computation) to run
# through the shortest-distance machinery. None means identity.
WeightLift = Optional[Callable[[jnp.ndarray], Any]]


class RecognitionLattice(Generic[T]):
  """Recognition lattice in GNAT-style formulation and operations over it.

  A RecognitionLattice provides operations used in training and inference,
  such as computing the negative-log-probability loss, or finding the
  highest scoring alignment path.

  Following the GNAT formulation, three modelling components combine to
  define a RecognitionLattice:
  - Context dependency: the finite automaton modelling output history
    (``last_torch_tpu.contexts.ContextDependency``).
  - Alignment lattice: the finite automaton modelling the alignment between
    input frames and output labels
    (``last_torch_tpu.alignments.TimeSyncAlignmentLattice``).
  - Weight function: the neural network producing arc weights from any
    context state given an input frame (``last_torch_tpu.weight_fns``).

  Given ``T`` input frames, the recognition lattice is the automaton with
  states (t, a, c) for alignment state a and context state c; blank arcs
  (t, a, c) --blank-> (t', a', c) and lexical arcs
  (t, a, c) --y-> (t', a', c') following the alignment lattice and the
  context dependency respectively; and arc weights produced by the weight
  function from the t-th frame and context state c (weight functions are
  alignment-state-invariant, reference ``lattices.py:70-77``).

  A RecognitionLattice is either locally or globally normalized:
  - Locally normalized: uses ``weight_fns.LocallyNormalizedWeightFn``; arc
    weights out of each state sum to 1 after exp, so the loss is just the
    negated numerator.
  - Globally normalized: any other WeightFn; path weights are normalized by
    the log-partition function (denominator) computed over all paths.

  Unlike the reference (an ``nn.Module``), parameters are an explicit pytree
  created by ``init`` and passed to every method — the idiomatic JAX
  arrangement that makes ``jax.jit`` / ``jax.grad`` / sharding trivial.

  Attributes:
    context: Context dependency.
    alignment: Alignment lattice.
    weight_fn_cacher: WeightFnCacher built by ``weight_fn_cacher_factory``.
    weight_fn: WeightFn built by ``weight_fn_factory``.
  """

  def __init__(
      self, context: contexts.ContextDependency,
      alignment: alignments.TimeSyncAlignmentLattice,
      weight_fn_cacher_factory: Callable[[contexts.ContextDependency],
                                         weight_fns.WeightFnCacher[T]],
      weight_fn_factory: Callable[[contexts.ContextDependency],
                                  weight_fns.WeightFn[T]],
      fused: str = 'auto'):
    if fused not in ('auto', 'never', 'interpret'):
      raise ValueError(f"fused should be 'auto', 'never' or 'interpret', "
                       f'but got {fused!r}')
    self.context = context
    self.alignment = alignment
    self.weight_fn_cacher = weight_fn_cacher_factory(context)
    self.weight_fn = weight_fn_factory(context)
    # 'auto': use the fused Pallas scan kernel on TPU when the
    # configuration is covered (see ops/fused_scan.py); 'never': always the
    # XLA path; 'interpret': fused kernel in interpreter mode (testing).
    self.fused = fused
    # Which path the most recent dispatch took: None until the first call,
    # then 'fused', 'xla' or 'xla-s1'. Dispatch happens at trace time, so
    # this is accurate per traced call (see ``last_path``).
    self._last_path = None
    # Single-context-state (S == 1, e.g. CTC-topology context_size=0)
    # lattices take a scan-free factorized shortest-distance route (see
    # ``_forward_s1``). Tests flip this off to A/B against the generic
    # scan.
    self._factorize_s1 = True

  @property
  def last_path(self) -> Optional[str]:
    """Which compute path the last lattice operation dispatched to.

    'fused' when the Pallas kernels were engaged, 'xla' for the generic
    ``lax.scan`` path, 'xla-s1' for the scan-free single-context-state
    route (``_forward_s1``), None before any call. The decision is structural
    (made at trace time from the configuration), so with ``fused='auto'``
    this is the way to learn which path a given configuration takes —
    subclassed weight functions, unsupported semirings, masks, or
    over-budget vocabularies silently fall back to XLA.

    TRACE-TIME state, with the jit caveats that implies: it is set while
    tracing, so a call served entirely from a jit cache does NOT refresh
    it, and interleaving differently-configured lattice ops can leave it
    describing the other call. Read it immediately after the first
    (tracing) invocation of the op in question, or use the pure
    ``would_fuse`` predicate, which needs no call at all.
    """
    return self._last_path

  def would_fuse(self, frames, semiring=semirings.Log) -> bool:
    """Whether the loss/shortest-distance on ``frames`` takes the fused
    kernels, as a pure structural query (no computation, no mutable
    state — unlike ``last_path`` this cannot go stale under jit caching).

    Args:
      frames: The [batch, T, feature] frames array (or a ShapeDtypeStruct
        of the same shape) the op would be called with.
      semiring: The semiring the op would use.
    """
    if self.fused == 'never':
      return False
    from last_torch_tpu.ops import fused_scan, trigram_scan
    backend = ('interpret' if self.fused == 'interpret' else
               jax.default_backend())
    return (fused_scan.supported(self, semiring, None, None, None, frames,
                                 backend) or
            trigram_scan.supported(self, semiring, None, None, None,
                                   frames, backend))

  # -------------------------------------------------------------------
  # Parameter / cache management.
  # -------------------------------------------------------------------

  def init(self, key: jax.Array, feature_size: int):
    """Creates the parameter pytree.

    Args:
      key: PRNG key.
      feature_size: Size of the last axis of input frames.

    Returns:
      ``{'cacher': ..., 'weight_fn': ...}`` parameter pytree.
    """
    k_cacher, k_wf = jax.random.split(key)
    cacher_params = self.weight_fn_cacher.init(k_cacher)
    cache = self.weight_fn_cacher.apply(cacher_params)
    dummy_frame = jnp.zeros((feature_size,), jnp.float32)
    wf_params = self.weight_fn.init(k_wf, cache, dummy_frame)
    return {'cacher': cacher_params, 'weight_fn': wf_params}

  def build_cache(self, params) -> T:
    """Builds the weight function cache from parameters.

    The cache contains static data that does not depend on the frames; when
    parameters do not change (e.g. during inference), it can be computed
    once and passed to the other public methods (reference
    ``lattices.py:118-129``).
    """
    return self.weight_fn_cacher.apply(params['cacher'])

  # -------------------------------------------------------------------
  # Public operations.
  # -------------------------------------------------------------------

  def __call__(self, params, frames, num_frames, labels, num_labels,
               cache=None):
    return self.loss(params, frames, num_frames, labels, num_labels, cache)

  def loss(self, params, frames, num_frames, labels, num_labels, cache=None):
    """Computes the negative sequence log-probability loss.

    The conditional probability P(labels | frames) is the sum of
    probabilities of all alignment paths producing the label sequence.
    Interpreting arc weights as (possibly unnormalized) log-probabilities,
    this computes -log P(labels | frames) for both locally and globally
    normalized models (reference ``lattices.py:131-183``).

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      labels: [batch_dims..., max_num_labels] padded label sequences.
      num_labels: [batch_dims...] number of labels.
      cache: Optional weight function cache data.

    Returns:
      [batch_dims...] negative sequence log-prob loss.
    """
    num_frames = jnp.asarray(num_frames)
    num_labels = jnp.asarray(num_labels)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    if labels.shape[:-1] != batch_dims:
      raise ValueError('labels and num_frames have different batch_dims: '
                       f'{labels.shape[:-1]} vs {batch_dims}')
    if num_labels.shape != batch_dims:
      raise ValueError('num_labels and num_frames have different batch_dims: '
                       f'{num_labels.shape} vs {batch_dims}')

    if cache is None:
      with jax.named_scope('lattice_cache'):
        cache = self.build_cache(params)
    if (not isinstance(self.weight_fn, weight_fns.LocallyNormalizedWeightFn)
        and self._s1_route(frames)):
      # Globally-normalized S == 1: numerator and denominator share one
      # weight-fn application (see _loss_s1; the fused-kernel routes
      # never claim S == 1 — they require context_size >= 1).
      labels = jnp.asarray(labels, jnp.int32)
      with jax.named_scope('lattice_loss_s1'):
        return self._loss_s1(params, cache, frames, num_frames, labels,
                             num_labels)
    with jax.named_scope('lattice_numerator'):
      numerator = self._string_forward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        labels=labels,
        num_labels=num_labels,
        semiring=semirings.Log)
    if isinstance(self.weight_fn, weight_fns.LocallyNormalizedWeightFn):
      return -numerator
    with jax.named_scope('lattice_denominator'):
      denominator = self._forward_backward(
          params=params, cache=cache, frames=frames, num_frames=num_frames)
    return denominator - numerator

  def shortest_path(self, params, frames, num_frames, cache=None,
                    reference_compat: bool = False):
    """Computes the shortest path in the recognition lattice.

    The shortest path is the path with the highest score — the "shortest"
    path under the max-tropical semiring. It is found by differentiating the
    tropical shortest distance with respect to a zero-valued additive
    lexical mask: the one-hot tie-broken tropical gradients mark exactly the
    arcs of one best path (reference ``lattices.py:219-247``).

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      cache: Optional weight function cache data.
      reference_compat: Emit the reference's raw ``argmax`` label values
        (reference ``lattices.py:244``) instead of the documented
        ``1 + argmax``: lexical label y becomes y - 1 (colliding with
        blank for y = 1). A migration aid for consumers of
        reference-decoded alignments; see PARITY.md.

    Returns:
      (alignment_labels, num_alignment_labels, path_weights) tuple:
      - alignment_labels: [batch_dims..., max_num_alignment_labels] padded
        alignment labels, blank (0) or lexical (1 to vocab_size). Each frame
        contributes ``num_alignment_states`` label slots (reference
        ``lattices.py:246``; the label value is ``1 + argmax`` over the
        lexical mask gradient — the reference's missing ``+1`` at
        ``lattices.py:244`` contradicts its own docstring and is treated
        as a defect here).
      - num_alignment_labels: [batch_dims...] number of alignment labels.
      - path_weights: [batch_dims...] path weights.
    """
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    max_num_frames = frames.shape[-2]
    num_alignment_states = self.alignment.num_states()

    if cache is None:
      cache = self.build_cache(params)

    if self.fused != 'never':
      from last_torch_tpu.ops import fused_scan, viterbi
      backend = ('interpret' if self.fused == 'interpret' else
                 jax.default_backend())
      # Structural support matches the Log kernel's gating, plus: locally
      # normalized JointWeightFns decode in-kernel too — hat / log-softmax
      # normalization is tile-local (the vocab axis is not tiled).
      inner_wf, normalize = self.weight_fn, 'none'
      if isinstance(inner_wf, weight_fns.LocallyNormalizedWeightFn):
        if inner_wf.normalize is weight_fns.hat_normalize:
          inner_wf, normalize = inner_wf.weight_fn, 'hat'
        elif inner_wf.normalize is weight_fns.log_softmax_normalize:
          inner_wf, normalize = inner_wf.weight_fn, 'log_softmax'
      if fused_scan.supported(self, semirings.Log, None, None, None, frames,
                              backend, weight_fn=inner_wf):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        labels, num_labels, weights = viterbi.viterbi_decode(
            params['weight_fn'], cache, frames, num_frames,
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            num_context_states=self.context.shape()[0],
            compute_dtype=(jnp.float32 if self.fused == 'interpret' else
                           jnp.bfloat16),
            normalize=normalize,
            interpret=self.fused == 'interpret')
        if reference_compat:
          labels = jnp.where(labels == 0, 0, labels - 1)
        return labels, num_labels, weights

    def forward_fn(lexical_mask):
      path_weights, _ = self._forward(
          params=params,
          cache=cache,
          frames=frames,
          num_frames=num_frames,
          semiring=semirings.MaxTropical,
          lexical_mask=[
              lexical_mask[..., i, None, :]
              for i in range(num_alignment_states)
          ])
      return path_weights

    _, vocab_size = self.context.shape()
    lexical_mask = jnp.zeros(
        (*batch_dims, max_num_frames, num_alignment_states, vocab_size))
    self._last_path = 'xla'
    path_weights, vjp_fn = jax.vjp(forward_fn, lexical_mask)
    viterbi_lexical_mask = vjp_fn(jnp.ones_like(path_weights))[0]
    is_blank = jnp.all(viterbi_lexical_mask == 0, axis=-1)
    alignment_labels = jnp.where(
        is_blank, 0, 1 + jnp.argmax(viterbi_lexical_mask, axis=-1))
    alignment_labels = alignment_labels.reshape(*batch_dims, -1)
    if reference_compat:
      alignment_labels = jnp.where(alignment_labels == 0, 0,
                                   alignment_labels - 1)
    num_alignment_labels = (
        num_alignment_states * num_frames.astype(jnp.int32))
    return alignment_labels, num_alignment_labels, path_weights

  def arc_marginals(self, params, frames, num_frames, cache=None,
                    max_output_bytes: int = 4 * 1024**3):
    """Arc posterior probabilities via the backward algorithm.

    The marginal probability of taking each arc at each frame under the
    model's path distribution — the quantity production systems use for
    confidence scores and frame-level alignments. This is the streaming
    ``BackwardStepCallback`` machinery (the working version of reference
    ``lattices.py:644-799``) with an identity callback; one forward + one
    backward pass, no O(T * S * V) autodiff residuals.

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      cache: Optional weight function cache data.
      max_output_bytes: Guard threshold for the dense [..., T, S, V]
        lexical-marginal output (default 4 GiB). Exceeding it raises
        instead of attempting an allocation that would OOM opaquely.

    Returns:
      (blank_marginals, lexical_marginals):
      - blank_marginals: [batch_dims..., max_num_frames,
        num_context_states] posterior of the blank arc leaving each
        context state at each frame.
      - lexical_marginals: [batch_dims..., max_num_frames,
        num_context_states, vocab_size] posteriors of the lexical arcs.
      Padding frames have all-zero marginals. For a feasible utterance the
      arc posteriors at each valid frame sum to the expected number of
      arcs taken at that frame (exactly 1 for FrameDependent).

    Note:
      Both passes run the XLA path (never the fused kernels) so the
      forward alphas and the backward's recomputed arc weights come from
      the same float32 computation and the posteriors normalize exactly;
      mixing a bfloat16 kernel forward with a float32 XLA backward would
      perturb per-frame sums at bf16 error scale. The dense output is
      O(T * S * V) — at large shapes prefer ``label_marginals``.
    """
    num_states, vocab_size = self.context.shape()
    batch = int(np.prod(frames.shape[:-2], dtype=np.int64))
    out_bytes = (4 * batch * frames.shape[-2] * num_states *
                 (vocab_size + 1))
    if out_bytes > max_output_bytes:
      raise ValueError(
          'arc_marginals would materialize a dense '
          f'[batch={batch}, T={frames.shape[-2]}, S={num_states}, '
          f'1+V={vocab_size + 1}] output of '
          f'~{out_bytes / 1024**3:.1f} GiB '
          f'(> max_output_bytes={max_output_bytes / 1024**3:.1f} GiB). '
          'Use label_marginals (O(T * (S + V)) outputs, fused-kernel '
          'path on TPU) for per-frame posteriors at production shapes, '
          'or raise max_output_bytes explicitly.')
    if cache is None:
      cache = self.build_cache(params)
    log_z, alpha_history = self._forward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        semiring=semirings.Log,
        allow_fused=False)
    _, marginals = self._backward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        log_z=log_z,
        alpha_0_to_T_minus_1=alpha_history,
        init_callback_carry=None,
        callback=lambda weight_vjp_fn, carry, blank_marginal,
        lexical_marginals: (carry, (blank_marginal, lexical_marginals)))
    return marginals

  def label_marginals(self, params, frames, num_frames, cache=None):
    """Per-frame label and blank posteriors (production confidence API).

    The state-summed projection of ``arc_marginals``: how much posterior
    mass emits each lexical label at each frame, and how much takes the
    blank arc out of each context state. Unlike the dense
    ``arc_marginals`` (O(T * S * V) output — 215 GB at the headline
    config, physically unmaterializable), these outputs are O(T * (S +
    V)) and the computation runs in the fused kernels on TPU at
    near-decode speed.

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      cache: Optional weight function cache data.

    Returns:
      (blank_marginals, label_marginals):
      - blank_marginals: [batch_dims..., max_num_frames,
        num_context_states] posterior of the blank arc leaving each
        context state at each frame (summed over alignment expansions).
      - label_marginals: [batch_dims..., max_num_frames, vocab_size]
        posterior of emitting label y+1 at each frame, summed over
        source context states and expansions.
      Padding frames have all-zero posteriors; at each valid frame the
      blank and label posteriors together sum to the expected number of
      arcs taken (exactly 1 for FrameDependent).
    """
    if cache is None:
      cache = self.build_cache(params)

    if self.fused != 'never':
      from last_torch_tpu.ops import fused_scan
      backend = ('interpret' if self.fused == 'interpret' else
                 jax.default_backend())
      if fused_scan.marginals_supported(self, frames, backend):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        return fused_scan.fused_label_marginals(
            params['weight_fn'], cache, frames,
            jnp.asarray(num_frames, jnp.int32),
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            num_context_states=self.context.shape()[0],
            compute_dtype=(jnp.float32 if self.fused == 'interpret' else
                           jnp.bfloat16),
            interpret=self.fused == 'interpret')

    log_z, alpha_history = self._forward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        semiring=semirings.Log,
        allow_fused=False)
    _, marginals = self._backward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        log_z=log_z,
        alpha_0_to_T_minus_1=alpha_history,
        init_callback_carry=None,
        callback=lambda weight_vjp_fn, carry, blank_marginal,
        lexical_marginals: (carry, (blank_marginal,
                                    jnp.sum(lexical_marginals, axis=-2))))
    return marginals

  def align(self, params, frames, num_frames, labels, num_labels,
            cache=None):
    """Forced alignment: where each reference label is emitted.

    Runs the numerator (string) DP under the MaxTropical semiring and
    reads the winning path off the one-hot tropical gradient of additive
    arc masks — the same mask-gradient device-side backtrace trick as
    ``shortest_path``, restricted to paths that emit exactly the
    reference transcript. The reference library has no alignment API;
    this is the production forced-aligner (per-label timestamps) its
    lattice machinery implies but never exposes.

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      labels: [batch_dims..., max_num_labels] reference labels (1-based,
        0-padded).
      num_labels: [batch_dims...] number of reference labels.
      cache: Optional weight function cache data.

    Returns:
      (emit_frames, path_weights):
      - emit_frames: [batch_dims..., max_num_labels] int32; entry u is
        the frame index at which reference label u is emitted on the
        highest-scoring alignment, -1 beyond ``num_labels``.
      - path_weights: [batch_dims...] tropical score of that alignment
        (-inf when the transcript is infeasible, e.g. more labels than
        the alignment lattice can emit in ``num_frames`` frames; the
        emit_frames row is meaningless then).
    """
    if cache is None:
      cache = self.build_cache(params)
    num_frames, num_labels, labels = self._check_string_args(
        frames, num_frames, labels, num_labels)

    blank_weight, lexical_weight = self._string_weights(
        params, cache, frames, labels)

    def total(masks):
      blank_mask, lexical_mask = masks
      scores = self._string_dp(
          blank_weight + blank_mask, lexical_weight + lexical_mask,
          num_frames, num_labels, semirings.MaxTropical)
      return jnp.sum(scores), scores

    (_, scores), (_, lexical_marks) = jax.value_and_grad(
        total, has_aux=True)(
            (jnp.zeros_like(blank_weight), jnp.zeros_like(lexical_weight)))
    # [T, batch..., U+1] -> [batch..., U+1, T]; exactly one winning frame
    # per position u < num_labels (each position advances once per path).
    marks = jnp.moveaxis(lexical_marks, 0, -1)
    emit = jnp.argmax(marks, axis=-1).astype(jnp.int32)
    emitted = jnp.max(marks, axis=-1) > 0
    emit = jnp.where(emitted, emit, -1)[..., :labels.shape[-1]]
    return emit, scores

  def sample_paths(self, params, frames, num_frames, key, num_samples=1,
                   cache=None):
    """Exact posterior samples of alignment paths (FFBS).

    Draws i.i.d. alignment paths from the lattice's posterior path
    distribution ``p(path) = exp(w(path)) / Z`` by backward filtering /
    forward sampling: one reverse scan computes the backward (suffix)
    weights ``beta_t[c]`` for every frame, then a forward scan samples
    each frame's arcs from their exact conditionals
    ``p(arc | prefix) = exp(w(arc) + beta[dst]) / exp(beta[src])``.
    Useful for MBR/MWER-style expected-risk training and posterior-aware
    data augmentation. The reference library exposes no sampler; this is
    the exact counterpart of ``shortest_path`` (mode) and
    ``arc_marginals`` (expectations) for the same distribution.

    Like ``arc_marginals``, both passes run the float32 XLA path (never
    the fused bfloat16 kernels) so the conditionals normalize exactly.
    Per-sample work is one-hot MXU row contractions and minor-axis
    gathers (never ``[..., S, V]`` materializations or row gathers — see
    ``gather_rows``/``conts_at_next_states`` and
    ``benchmarks/tpu_sample_paths_bench.py``), and the sampling pass
    runs no dense weight pass at all: the reverse scan emits the
    continuation-value histories and the forward pass evaluates the
    weight fn only at the M sampled context rows, so the whole
    sampler costs about ONE dense weight pass (measured at headline
    shapes: m=1/4/16 take 1320/1347/1429 ms vs the 1752 ms loss step).

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      key: ``jax.random`` PRNG key.
      num_samples: Number of independent path samples per utterance.
      cache: Optional weight function cache data.

    Returns:
      (alignment_labels, num_alignment_labels, log_prob):
      - alignment_labels: [batch_dims..., num_samples,
        max_num_frames * num_alignment_states] in the exact packed format
        of ``shortest_path``: each frame contributes
        ``num_alignment_states`` slots, blank/unused 0, lexical 1..V.
      - num_alignment_labels: [batch_dims..., num_samples] =
        ``num_alignment_states * num_frames``.
      - log_prob: [batch_dims..., num_samples] exact posterior
        log-probability ``w(path) - log Z`` of each sampled path.
    """
    if not isinstance(self.alignment, (alignments.FrameDependent,
                                       alignments.FrameLabelDependent)):
      raise NotImplementedError(
          'sample_paths supports FrameDependent and FrameLabelDependent '
          f'alignment lattices, got {type(self.alignment).__name__}')
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    if cache is None:
      cache = self.build_cache(params)
    wf_params = params['weight_fn']
    max_num_frames = frames.shape[-2]
    num_states, vocab_size = self.context.shape()
    fld = isinstance(self.alignment, alignments.FrameLabelDependent)
    k = self.alignment.max_expansions if fld else 0
    num_align_states = self.alignment.num_states()
    m = num_samples

    frames_tm = jnp.moveaxis(frames, -2, 0)
    t_ix = jnp.arange(max_num_frames)

    def cont_values(blank, lexical, beta_next):
      """Per-expansion continuation VALUES, [batch..., S] each.

      ``v[e]`` is the total weight of completing the utterance from
      context state c having already taken e lexical expansions in this
      frame; ``v[0]`` is beta for this frame. The [batch..., S, V]
      per-arc score tensors are deliberately never materialized: the
      label logsumexp fuses with the broadcast here, and the sampling
      pass gathers only its M visited rows (materializing k full
      [B, S, V] tensors per frame measured ~6x slower at production
      shapes and crashed the remote worker on a ~21 s single dispatch).
      """
      blank_term = blank + beta_next
      v = [None] * (k + 1) if fld else [None, beta_next]
      v[-1] = blank_term if fld else beta_next
      for e in range(len(v) - 2, -1, -1):
        s_e = semirings.Log.sum(
            lexical + self.context.backward_broadcast(v[e + 1]), axis=-1)
        v[e] = jnp.logaddexp(blank_term, s_e)
      return v

    # Phase 1: reverse scan for the backward weights; the stacked output
    # at frame t is beta_{t+1} (the incoming carry), the final carry is
    # beta_0 whose start-state entry is log Z. For FrameLabelDependent
    # the per-expansion continuation VALUES v[1..k] are stacked too —
    # they are what the sampling pass conditions on, and emitting them
    # here (k extra [T, batch..., S] float32 outputs, ~0.1% of the
    # [batch..., S, V] weight tensor this scan already materializes per
    # frame) is what lets phase 2 run without ANY dense weight pass.
    def beta_step(beta, inputs):
      t, frame = inputs
      blank, lexical = self.weight_fn.apply(wf_params, cache, frame)
      v = cont_values(blank, lexical, beta)
      is_padding = (t >= num_frames)[..., None]
      ys = (beta, tuple(v[1:]) if fld else ())
      return jnp.where(is_padding, beta, v[0]), ys

    init_beta = semirings.Log.ones((*batch_dims, num_states), jnp.float32)
    beta_0, (beta_next_hist, v_hist) = jax.lax.scan(
        beta_step, init_beta, (t_ix, frames_tm), reverse=True)
    log_z = beta_0[..., self.context.start()]

    def gather_rows(x, c):
      """x: [batch..., S(, V)]; c: [batch..., M] -> [batch..., M(, V)].

      Minor-axis gathers (the [batch..., S] case) are cheap on TPU; a
      row gather from [batch..., S, V] is NOT — XLA lowers it ~48x
      slower than the equivalent one-hot MXU contraction (measured
      in-scan at B=32 S=1025 V=1024 M=16: 14.5 ms/frame vs 0.3 ms).
      HIGHEST precision keeps the 0/1 contraction f32-exact (each row is
      one exact product plus exact zeros), preserving this method's
      float32 conditional-probability contract.
      """
      if x.ndim == c.ndim:
        return jnp.take_along_axis(x, c, axis=-1)
      onehot = jax.nn.one_hot(c, x.shape[-2], dtype=x.dtype)
      return jnp.einsum('...ms,...sv->...mv', onehot, x,
                        precision=jax.lax.Precision.HIGHEST)

    y_all = jnp.arange(1, vocab_size + 1, dtype=jnp.int32)

    def conts_at_next_states(cont, c):
      """cont: [batch..., S]; c: [batch..., M] ->
      ``cont[next_state(c_m, y)]`` for every lexical y, [batch..., M, V]
      — the per-sample row of ``backward_broadcast(cont)`` without ever
      materializing the [batch..., S, V] broadcast."""
      shape = (*c.shape, vocab_size)
      if (isinstance(self.context, contexts.FullNGram) and
          self.context.context_size <= 1):
        # next_state is sample-independent here: label y always leads to
        # state y (bigram) or state 0 (context-free) — a broadcast, not a
        # gather (the [batch..., M*V] gather is a per-sample cost on TPU).
        row = cont[..., 1:] if self.context.context_size else cont
        return jnp.broadcast_to(row[..., None, :], shape)
      ns = self.context.next_state(c[..., None], y_all).astype(jnp.int32)
      flat = ns.reshape(*ns.shape[:-2], -1)
      out = jnp.take_along_axis(cont, flat, axis=-1)
      return out.reshape(ns.shape)

    # Phase 2: forward sampling. Per frame: arc weights are computed at
    # the M SAMPLED context rows only (the weight fn's per-state form —
    # O(M) joint rows instead of the full [batch..., S, V] pass), the
    # continuation VALUES come precomputed from phase 1, and each
    # expansion's arc is drawn from its exact conditional via Gumbel-max
    # (jax.random.categorical). Phase 2 therefore runs no dense weight
    # pass at all — measured on v5e at headline shapes this halved
    # sample_paths (see benchmarks/tpu_sample_paths_bench.py).
    def row_weights(frame, c):
      """(blank [batch..., M], lexical [batch..., M, V]) at rows ``c``.

      vmap over the sample axis keeps each inner call on the WeightFn
      contract (state broadcastable to the frame's batch_dims); the
      unbatched frame lets XLA share its projection across samples.
      """
      return jax.vmap(
          lambda s: self.weight_fn.apply(wf_params, cache, frame, s),
          in_axes=-1, out_axes=(-1, -2))(c)

    def sample_step(carry, inputs):
      c, logw = carry  # [batch..., M] state ids / accumulated arc weight
      t, frame, beta_next, v_t = inputs
      # Successor continuation of expansion e: v[e+1] (the next expansion
      # state) for FLD; beta_next for FrameDependent, whose lexical arc
      # itself advances the frame.
      conts = list(v_t) if fld else [beta_next]
      key_t = jax.random.fold_in(key, t)
      is_padding = (t >= num_frames)[..., None]

      done = jnp.zeros(c.shape, bool)
      slots = []
      for e in range(num_align_states):
        blank_w, lex_rows = row_weights(frame, c)
        if e < len(conts):
          q_rows = lex_rows + conts_at_next_states(conts[e], c)
          blank_term_w = blank_w + gather_rows(beta_next, c)
          logits = jnp.concatenate(
              [blank_term_w[..., None], q_rows], axis=-1)
          choice = jax.random.categorical(
              jax.random.fold_in(key_t, e), logits)
        else:
          # The last FLD expansion state has no lexical arc.
          choice = jnp.zeros(c.shape, jnp.int32)
        choice = jnp.where(done | is_padding, 0, choice.astype(jnp.int32))
        take_label = choice > 0
        take_blank = ~done & ~take_label & ~is_padding
        if e < len(conts):
          label_w = jnp.take_along_axis(
              lex_rows, jnp.maximum(choice - 1, 0)[..., None],
              axis=-1)[..., 0]
        else:
          label_w = jnp.zeros_like(blank_w)
        logw = logw + jnp.where(take_label, label_w,
                                jnp.where(take_blank, blank_w, 0.0))
        c = self.context.next_state(c, choice)
        done = done | take_blank
        slots.append(choice)
        if not fld:
          break
      return (c, logw), jnp.stack(slots, axis=-1)

    start = jnp.full((*batch_dims, m), self.context.start(), jnp.int32)
    logw0 = jnp.zeros((*batch_dims, m), jnp.float32)
    (_, logw), slot_hist = jax.lax.scan(
        sample_step, (start, logw0),
        (t_ix, frames_tm, beta_next_hist, v_hist))
    # slot_hist: [T, batch..., M, A] -> [batch..., M, T * A].
    nb = len(batch_dims)
    labels = jnp.moveaxis(slot_hist, 0, nb + 1)
    labels = labels.reshape(*batch_dims, m, -1).astype(jnp.int32)
    num_labels = jnp.broadcast_to(
        (num_align_states * num_frames.astype(jnp.int32))[..., None],
        (*batch_dims, m))
    return labels, num_labels, logw - log_z[..., None]

  def shortest_distance(self, params, frames, num_frames, semiring=None,
                        cache=None, weight_lift: WeightLift = None):
    """Shortest distance over all paths in the recognition lattice.

    The public entry point to the forward algorithm under any semiring
    (the reference exposes this only privately via ``_forward``). With the
    Expectation semiring and a ``weight_lift``, this computes quantities
    like the entropy of the path distribution in one pass, e.g. for a
    locally normalized lattice::

      sr = semirings.LogLogExpectation
      lift = lambda w: sr.weighted(w, jnp.log(jnp.maximum(-w, 1e-30)))
      log_z, log_cost = lattice.shortest_distance(
          params, frames, num_frames, semiring=sr, weight_lift=lift)
      entropy = jnp.exp(log_cost - log_z)

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      semiring: Semiring (default Log).
      cache: Optional weight function cache data.
      weight_lift: Optional lifting of plain arc weight arrays into
        semiring values (required for tuple-valued semirings).

    Returns:
      [batch_dims...] shortest distance (a semiring value).
    """
    semiring = semiring if semiring is not None else semirings.Log
    if cache is None:
      cache = self.build_cache(params)
    if semiring is semirings.Log and weight_lift is None:
      # The forward-backward route is differentiable (custom VJP) and uses
      # the fused kernels on TPU; the plain fused forward is not.
      return self._forward_backward(
          params=params,
          cache=cache,
          frames=frames,
          num_frames=jnp.asarray(num_frames))
    distance, _ = self._forward(
        params=params,
        cache=cache,
        frames=frames,
        num_frames=jnp.asarray(num_frames),
        semiring=semiring,
        weight_lift=weight_lift)
    return distance

  # -------------------------------------------------------------------
  # Private dynamic programs.
  # -------------------------------------------------------------------

  def _string_forward(self, params, cache, frames, num_frames, labels,
                      num_labels, semiring, weight_lift: WeightLift = None):
    """Shortest distance on the intersection with an output string.

    The numerator DP (reference ``lattices.py:250-377``). Arc weights are
    produced with a ``lax.scan`` over the max_num_labels+1 label positions
    (each position computes weights for all frames at once, then gathers the
    single needed label column), so only O(B * T * (U+1)) weights are ever
    materialized instead of O(B * T * U * V) (reference rationale
    ``lattices.py:279-289``). The time recursion is a second ``lax.scan``.

    Args:
      params: Parameter pytree.
      cache: Weight function cache data.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      labels: [batch_dims..., max_num_labels] padded label sequence.
      num_labels: [batch_dims...] number of labels.
      semiring: Semiring for the shortest distance computation.
      weight_lift: Optional lifting of plain weight arrays into semiring
        values (for tuple-valued semirings).

    Returns:
      [batch_dims...] shortest distance.
    """
    num_frames, num_labels, labels = self._check_string_args(
        frames, num_frames, labels, num_labels)

    blank_weight, lexical_weight = self._string_weights(
        params, cache, frames, labels)
    return self._string_dp(blank_weight, lexical_weight, num_frames,
                           num_labels, semiring, weight_lift)

  def _check_string_args(self, frames, num_frames, labels, num_labels):
    """Shared shape validation for the string DP entry points."""
    num_frames = jnp.asarray(num_frames)
    num_labels = jnp.asarray(num_labels)
    labels = jnp.asarray(labels, jnp.int32)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    if labels.shape[:-1] != batch_dims:
      raise ValueError('labels and num_frames have different batch_dims: '
                       f'{labels.shape[:-1]} vs {batch_dims}')
    if num_labels.shape != batch_dims:
      raise ValueError('num_labels and num_frames have different batch_dims: '
                       f'{num_labels.shape} vs {batch_dims}')
    return num_frames, num_labels, labels

  def _string_weights(self, params, cache, frames, labels):
    """Per-(frame, label-position) blank and next-label weights.

    Returns (blank_weight, lexical_weight), both time-major
    [T, batch_dims..., U+1]: position u's weights are produced from the
    context state after ``labels[..., :u]``, and ``lexical_weight`` holds
    the single column for the next needed label (position U uses a dummy
    label whose weight is never selected as final).
    """
    wf_params = params['weight_fn']
    context_states = self.context.walk_states(labels)
    context_next_labels = jnp.concatenate(
        [labels, jnp.ones_like(labels[..., :1])], axis=-1)

    if self._factorize_s1 and self.context.shape()[0] == 1:
      # S == 1: every label position shares the single context state, so
      # ONE batched weight-fn application over all frames produces every
      # weight the string DP needs; the per-position lexical weights are
      # column gathers of the shared [T, vocab] head output. The generic
      # routes below pay a full per-position weight computation (U+1
      # applications) because context states differ position to position.
      blank, lexical = self._s1_weights(wf_params, cache, frames,
                                        labels.shape[:-1])
      return self._s1_string_weights_from(blank, lexical,
                                          context_next_labels)

    fast = self.weight_fn.label_weights(wf_params, cache, frames,
                                        context_states, context_next_labels)
    if fast is not None:
      # [batch_dims..., U+1, T] -> [T, batch_dims..., U+1] (time-major).
      blank_weight, lexical_weight = (
          jnp.moveaxis(x, -1, 0) for x in fast)
      return blank_weight, lexical_weight

    def position_weights(carry, inputs):
      state, next_label = inputs  # [batch_dims...] each

      def one_frame(frame):
        return self.weight_fn.apply(wf_params, cache, frame, state)

      # blank: [batch_dims..., T]; lexical: [batch_dims..., V, T].
      blank, lexical = jax.vmap(one_frame, in_axes=-2, out_axes=-1)(frames)
      # Gather the weight of the next needed label. one-hot of label 0
      # would be out of range; clamp to label 1, those positions are
      # never selected as final.
      y = jnp.maximum(next_label, 1)
      lexical_y = jnp.take_along_axis(
          lexical, y[..., None, None] - 1, axis=-2)[..., 0, :]
      return carry, (blank, lexical_y)

    _, (blank_weight, lexical_weight) = jax.lax.scan(
        jax.checkpoint(position_weights,
                       policy=jax.checkpoint_policies.nothing_saveable),
        (), (jnp.moveaxis(context_states, -1, 0),
             jnp.moveaxis(context_next_labels, -1, 0)))
    # [U+1, batch_dims..., T] -> [T, batch_dims..., U+1] (time-major).
    to_time_major = lambda x: jnp.moveaxis(jnp.moveaxis(x, 0, -1), -2, 0)
    return to_time_major(blank_weight), to_time_major(lexical_weight)

  def _string_dp(self, blank_weight, lexical_weight, num_frames,
                 num_labels, semiring, weight_lift: WeightLift = None,
                 alpha0=None, t_offset=0, final_gather: bool = True):
    """The (frame x label-position) recursion over precomputed weights.

    ``alpha0`` / ``t_offset`` / ``final_gather`` let the time-sharded
    relay (``parallel.sequence.string_forward_time_sharded``) run the
    recursion over one frame block: seed the label-position carry from
    the left neighbor, count global frame indices for the padding test,
    and return the raw final alpha instead of the ``num_labels`` gather.
    """
    num_frames = jnp.asarray(num_frames)
    num_labels = jnp.asarray(num_labels)
    batch_dims = num_frames.shape
    num_align_states = self.alignment.num_states()
    lift = weight_lift if weight_lift is not None else _identity

    def shortest_distance_step(carry, inputs):
      t, alpha = carry
      blank, lexical = inputs  # [batch_dims..., U+1] each
      blank = [lift(blank)] * num_align_states
      lexical = [lift(lexical)] * num_align_states
      next_alpha = self.alignment.string_forward(
          alpha=alpha, blank=blank, lexical=lexical, semiring=semiring)
      is_padding = (t >= num_frames)[..., None]
      next_alpha = semirings.where(is_padding, alpha, next_alpha)
      return (t + 1, next_alpha), None

    num_alpha_states = blank_weight.shape[-1]
    if alpha0 is not None:
      init_alpha = alpha0
    else:
      init_alpha = _init_context_state_weights(
          batch_dims=batch_dims,
          dtype=semirings.value_dtype(lift(blank_weight)),
          num_states=num_alpha_states,
          start=0,
          semiring=semiring)
    if (STRING_DP_CUMULATIVE and weight_lift is None
        and semiring is semirings.Log
        and blank_weight.shape[0] > 0
        and blank_weight.dtype == jnp.float32
        and isinstance(self.alignment, (alignments.FrameDependent,
                                        alignments.FrameLabelDependent))):
      alpha = self._string_dp_alpha_cumulative(
          blank_weight, lexical_weight, num_frames, init_alpha, t_offset)
    else:
      (_, alpha), _ = jax.lax.scan(
          jax.checkpoint(
              shortest_distance_step,
              policy=jax.checkpoint_policies.nothing_saveable),
          (jnp.asarray(t_offset, jnp.int32), init_alpha),
          (blank_weight, lexical_weight),
          unroll=min(STRING_DP_UNROLL, blank_weight.shape[0]))
    if not final_gather:
      return alpha
    is_final = num_labels[..., None] == jnp.arange(num_alpha_states)
    zero = semiring.zeros([], semirings.value_dtype(alpha))
    return semiring.sum(semirings.where(is_final, alpha, zero), axis=-1)

  # Structural-zero sentinel for the cumulative string DP: far below any
  # reachable path weight (|log w| * T <= ~1e7 at production shapes) but
  # finite, so cumulative sums and logaddexp gradients stay NaN-free.
  _DP_NEG = -1e30
  _DP_CUTOFF = -1e20

  def _string_dp_alpha_cumulative(self, blank_weight, lexical_weight,
                                  num_frames, init_alpha, t_offset):
    """Scan-free Log-semiring string DP via per-position closed forms.

    For a fixed label position u the time recursion of the string DP is
    a first-order affine Log-semiring recurrence::

      x_u[t] = A[t] (x) x_u[t-1]  (+)  C[t,u]

    with ``A[t] = blank[t, u]`` and ``C`` collecting the label arcs out
    of positions u-1..u-k at t-1 (FrameDependent: k=1 and no trailing
    blank factor; FrameLabelDependent(k): per-expansion chains of
    lexical weights times the terminating blank — exactly
    ``alignments.string_forward`` unrolled per position). Its closed
    form in log space is::

      x_u = cumA + logaddexp(alpha0_u, cumlogsumexp(C - cumA))

    so the whole DP runs as a scan over the U+1 label positions (each
    step a handful of [T, batch] cumulative ops XLA parallelizes in
    log depth) instead of a T-step sequential scan — U+1 is ~16x
    smaller than T at production shapes. Structural zeros ride a
    finite ``_DP_NEG`` sentinel (the closed form subtracts cumA, so
    -inf blanks are unsupported — the dispatch gate requires the
    standard finite-weight contract) and are restored to -inf past
    ``_DP_CUTOFF`` on output, keeping the infeasible-loss == +inf
    contract exact.

    Args: as ``_string_dp`` (weights time-major [T, batch..., U+1]);
    ``init_alpha`` is the [batch..., U+1] starting carry.

    Returns: [batch..., U+1] final alpha, bit-compatible with the scan
    route's contract up to float reassociation.
    """
    neg, cutoff = self._DP_NEG, self._DP_CUTOFF
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    nb = len(batch_dims)
    max_t, u1 = blank_weight.shape[0], blank_weight.shape[-1]
    fld = isinstance(self.alignment, alignments.FrameLabelDependent)
    k = self.alignment.max_expansions if fld else 1

    # Padded frames multiply alpha by the identity: blank one, lexical
    # zero (matching the scan route's where(is_padding, alpha, ...)).
    t_ix = (t_offset + jnp.arange(max_t)).reshape((max_t,) + (1,) * nb)
    pad = t_ix >= num_frames[None]  # [T, batch...]
    b = jnp.where(pad[..., None], 0.0, blank_weight)
    l = jnp.maximum(jnp.where(pad[..., None], neg, lexical_weight), neg)
    a0 = jnp.maximum(init_alpha, neg)

    # Per-position columns, label-position-major for the u scan.
    bT = jnp.moveaxis(b, -1, 0)    # [U+1, T, batch...]
    lT = jnp.moveaxis(l, -1, 0)
    a0T = jnp.moveaxis(a0, -1, 0)  # [U+1, batch...]

    def shift_u(x, e):
      if e >= u1:
        return jnp.full_like(x, neg)
      fill = jnp.full((e,) + x.shape[1:], neg, x.dtype)
      return jnp.concatenate([fill, x[:-e]], axis=0)

    l_prevs = tuple(shift_u(lT, e) for e in range(1, k + 1))
    a0_prevs = tuple(shift_u(a0T, e) for e in range(1, k + 1))

    carry0 = tuple(
        jnp.full((max_t,) + batch_dims, neg, blank_weight.dtype)
        for _ in range(k))

    def body(carry, xs):
      b_u, a0_u, l_prev, a0_prev = xs
      cum_a = jnp.cumsum(b_u, axis=0)
      chain = jnp.zeros_like(b_u)
      red = None
      for e in range(1, k + 1):
        chain = chain + l_prev[e - 1]
        shifted = jnp.concatenate(
            [a0_prev[e - 1][None], carry[e - 1][:-1]], axis=0)
        term = shifted + chain
        red = term if red is None else jnp.logaddexp(red, term)
      c = jnp.maximum(b_u + red if fld else red, neg)
      m = jax.lax.cumlogsumexp(c - cum_a, axis=0)
      x_u = jnp.maximum(cum_a + jnp.logaddexp(a0_u[None], m), neg)
      return (x_u,) + carry[:-1], x_u[-1]

    _, finals = jax.lax.scan(body, carry0,
                             (bT, a0T, l_prevs, a0_prevs))
    alpha = jnp.moveaxis(finals, 0, -1)  # [batch..., U+1]
    return jnp.where(alpha <= cutoff, -jnp.inf, alpha)

  def _forward(self,
               params,
               cache,
               frames,
               num_frames,
               semiring,
               blank_mask: Optional[Sequence[jnp.ndarray]] = None,
               lexical_mask: Optional[Sequence[jnp.ndarray]] = None,
               weight_lift: WeightLift = None,
               allow_fused: bool = True):
    """Shortest distance on the recognition lattice (forward algorithm).

    It is often useful to differentiate the shortest distance with respect
    to arc weights: under the log semiring that yields arc marginals; under
    the tropical semiring, the shortest path. Because arc weights are
    computed on the fly, callers can pass zero-valued additive masks and
    differentiate with respect to those instead — d f(x + y)/dy at y=0
    equals d f(x)/dx (reference ``lattices.py:390-396``).

    The scan body is rematerialized so reverse-mode autodiff saves only the
    per-frame alpha carries, never the O(B*S*V) lexical weights.

    Args:
      params: Parameter pytree.
      cache: Weight function cache data.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      semiring: Semiring for the shortest distance computation.
      blank_mask: Optional length num_alignment_states sequence of arrays
        shaped [batch_dims..., max_num_frames, 1-or-num_context_states].
      lexical_mask: Optional length num_alignment_states sequence of arrays
        shaped [batch_dims..., max_num_frames, 1-or-num_context_states,
        1-or-vocab_size].
      weight_lift: Optional lifting of plain weight arrays into semiring
        values (for tuple-valued semirings such as Expectation).

    Returns:
      (shortest_distance, alpha_0_to_T_minus_1) tuple:
      - shortest_distance: [batch_dims...] shortest distance.
      - alpha_0_to_T_minus_1: [batch_dims..., max_num_frames,
        num_context_states] forward weights after observing 0..T-1 frames.
    """
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    num_align_states = self.alignment.num_states()
    if blank_mask is not None and len(blank_mask) != num_align_states:
      raise ValueError(
          'The length of blank_mask should be equal to '
          f'{num_align_states} (the number of alignment states), '
          f'but is {len(blank_mask)}')
    if lexical_mask is not None and len(lexical_mask) != num_align_states:
      raise ValueError(
          'The length of lexical_mask should be equal to '
          f'{num_align_states} (the number of alignment states), '
          f'but is {len(lexical_mask)}')

    wf_params = params['weight_fn']
    lift = weight_lift if weight_lift is not None else _identity

    if self.fused != 'never' and allow_fused:
      from last_torch_tpu.ops import fused_scan
      backend = ('interpret' if self.fused == 'interpret' else
                 jax.default_backend())
      if fused_scan.supported(self, semiring, blank_mask, lexical_mask,
                              weight_lift, frames, backend):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        return fused_scan.fused_shortest_distance_fwd(
            wf_params, cache, frames, num_frames,
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            num_context_states=self.context.shape()[0],
            compute_dtype=(jnp.float32 if self.fused == 'interpret' else
                           jnp.bfloat16),
            interpret=self.fused == 'interpret')
      from last_torch_tpu.ops import trigram_scan
      if trigram_scan.supported(self, semiring, blank_mask, lexical_mask,
                                weight_lift, frames, backend):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        return trigram_scan.fused_shortest_distance_fwd(
            wf_params, cache, frames, num_frames,
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            vocab=self.context.vocab_size,
            compute_dtype=(jnp.float32 if self.fused == 'interpret' else
                           jnp.bfloat16),
            interpret=self.fused == 'interpret')

    if self._s1_route(frames):
      self._last_path = 'xla-s1'
      return self._forward_s1(
          wf_params=wf_params, cache=cache, frames=frames,
          num_frames=num_frames, semiring=semiring,
          blank_mask=blank_mask, lexical_mask=lexical_mask, lift=lift)

    self._last_path = 'xla'
    xs = {'frame': jnp.moveaxis(frames, -2, 0)}
    if blank_mask is not None:
      # [A, batch_dims..., T, S?] -> [T, A, batch_dims..., S?]
      stacked = jnp.stack(blank_mask, axis=0)
      xs['blank_mask'] = jnp.moveaxis(stacked, -2, 0)
    if lexical_mask is not None:
      stacked = jnp.stack(lexical_mask, axis=0)
      xs['lexical_mask'] = jnp.moveaxis(stacked, -3, 0)

    def step(carry, inputs):
      t, alpha = carry
      blank, lexical = self.weight_fn.apply(wf_params, cache,
                                            inputs['frame'])
      # Weight functions are alignment-state-invariant.
      blank = [blank] * num_align_states
      lexical = [lexical] * num_align_states
      if 'blank_mask' in inputs:
        blank = [b + m for b, m in zip(blank, inputs['blank_mask'])]
      if 'lexical_mask' in inputs:
        lexical = [l + m for l, m in zip(lexical, inputs['lexical_mask'])]
      blank = [lift(b) for b in blank]
      lexical = [lift(l) for l in lexical]
      next_alpha = self.alignment.forward(
          alpha=alpha,
          blank=blank,
          lexical=lexical,
          context=self.context,
          semiring=semiring)
      is_padding = (t >= num_frames)[..., None]
      next_alpha = semirings.where(is_padding, alpha, next_alpha)
      return (t + 1, next_alpha), alpha

    # Infer the weight dtype without computing anything.
    abstract_blank, _ = jax.eval_shape(
        _weight_fn_apply(self.weight_fn), wf_params, cache,
        jax.ShapeDtypeStruct(frames.shape[:-2] + frames.shape[-1:],
                             frames.dtype))
    alpha_dtype = semirings.value_dtype(
        jax.eval_shape(lift, abstract_blank))
    init_alpha = _init_context_state_weights(
        batch_dims=batch_dims,
        dtype=alpha_dtype,
        num_states=self.context.shape()[0],
        start=self.context.start(),
        semiring=semiring)

    (_, alpha_T), alpha_0_to_T_minus_1 = jax.lax.scan(
        jax.checkpoint(
            step, policy=jax.checkpoint_policies.nothing_saveable),
        (jnp.zeros((), jnp.int32), init_alpha), xs)
    alpha_history = jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, -2), alpha_0_to_T_minus_1)
    return semiring.sum(alpha_T, axis=-1), alpha_history

  def _s1_route(self, frames) -> bool:
    """Whether the scan-free S == 1 factorized forward applies — a
    trace-time structural check (see ``_forward_s1``). The alignment
    restriction mirrors the fused kernels': ``_forward_s1`` spells out
    the per-frame factor algebra for the two alignment families."""
    return (self._factorize_s1 and self.context.shape()[0] == 1
            and frames.shape[-2] > 0
            and isinstance(self.alignment,
                           (alignments.FrameDependent,
                            alignments.FrameLabelDependent)))

  def _forward_s1(self, wf_params, cache, frames, num_frames, semiring,
                  blank_mask, lexical_mask, lift):
    """Scan-free shortest distance for single-context-state lattices.

    With ``num_context_states == 1`` the alpha carry is one semiring
    scalar per batch element, and the alignment forward step is linear
    in alpha (lattice DPs are sums of products each containing alpha
    exactly once), so the recursion factorizes by distributivity::

      alpha_{t+1} = alpha_t (x) f_t,   f_t = forward(one, blank_t, lex_t)

    The whole denominator then collapses to ONE batched weight-function
    application over all frames (a single large MXU matmul instead of T
    small ones inside a sequential scan), elementwise semiring algebra
    for the per-frame factors ``f_t``, and a parallel cumulative
    (x)-product (``lax.associative_scan``) for the alpha history —
    nothing for XLA to serialize. This is the natural TPU shape of
    CTC-topology models (``FullNGram(context_size=0)``); the reference
    runs them through the same per-frame Python loop as every other
    topology (reference ``lattices.py:560-580``).

    Per-frame tie-breaking under ``MaxTropical`` is unchanged: within a
    frame alpha is a common (x)-factor of every term ``plus`` compares,
    so the argmax structure is identical to the scan route's; results
    match the scan route up to float reassociation across time.

    TPU layout note: every tensor here is kept at [batch..., T] /
    [batch..., T, vocab] — the weight fn is applied with an explicit
    ``state=0`` so no [..., 1, vocab] state axis is ever materialized
    (XLA pads a size-1 second-minor axis to 8, an 8x HBM bloat on every
    materialization — measured 33 ms vs 6 ms for this denominator).

    Args and returns: as ``_forward`` (this is its S == 1
    specialization; masks and ``weight_lift`` are fully supported).
    """
    blank, lexical = self._s1_weights(wf_params, cache, frames,
                                      jnp.asarray(num_frames).shape)
    return self._forward_s1_from_weights(blank, lexical, num_frames,
                                         semiring, blank_mask,
                                         lexical_mask, lift)

  def _s1_weights(self, wf_params, cache, frames, batch_dims):
    """One weight-fn application batched over all frames at S == 1.

    Pinned to the single context state so outputs come back squeezed
    ([batch..., T] / [batch..., T, vocab] — no size-1 state axis for
    XLA's TPU layout padding to inflate 8x). vmap over the time axis
    keeps weight functions whose ``apply`` pins the batch shape (e.g.
    TableWeightFn) working; for matmul-based weight functions it lowers
    to the same single large contraction as a directly batched apply.
    """
    state0 = jnp.zeros(batch_dims, jnp.int32)
    return jax.vmap(
        lambda f: self.weight_fn.apply(wf_params, cache, f, state0),
        in_axes=-2, out_axes=(-1, -2))(frames)

  def _s1_string_weights_from(self, blank, lexical, context_next_labels):
    """String-DP weights as column gathers of the shared S == 1 head.

    Args:
      blank: [batch_dims..., T] blank weights from ``_s1_weights``.
      lexical: [batch_dims..., T, vocab] lexical weights.
      context_next_labels: [batch_dims..., U+1] next-label ids.

    Returns:
      (blank_weight, lexical_weight), both time-major
      [T, batch_dims..., U+1] (the ``_string_dp`` contract).
    """
    # Position u needs the weight of its next label; label 0 (padding)
    # is clamped to 1, those positions are never selected as final.
    y = jnp.maximum(context_next_labels, 1)  # [batch_dims..., U+1]
    lexical_y = jnp.take_along_axis(
        lexical, (y - 1)[..., None, :], axis=-1)  # [batch..., T, U+1]
    blank_w = jnp.broadcast_to(blank[..., None], lexical_y.shape)
    # -> time-major [T, batch_dims..., U+1].
    return jnp.moveaxis(blank_w, -2, 0), jnp.moveaxis(lexical_y, -2, 0)

  def _forward_s1_from_weights(self, blank, lexical, num_frames, semiring,
                               blank_mask, lexical_mask, lift):
    """The factor algebra + parallel cumulative product of ``_forward_s1``
    on precomputed per-frame weights (shared with ``_loss_s1``)."""
    num_align_states = self.alignment.num_states()
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    max_num_frames = blank.shape[-1]

    blanks, lexical_sums = [], []
    for i in range(num_align_states):
      b, l = blank, lexical
      if blank_mask is not None:
        # [batch..., T, 1-or-S] with S == 1: drop the state axis.
        b = b + blank_mask[i][..., 0]
      if lexical_mask is not None:
        # [batch..., T, 1-or-S, 1-or-V]: drop the state axis, keep V.
        l = l + lexical_mask[i][..., 0, :]
      blanks.append(lift(b))
      # Total lexical weight out of the single state: (+)-reduce over
      # the vocab (exactly FullNGram.forward_reduce at S == 1).
      lexical_sums.append(semiring.sum(lift(l), axis=-1))

    # Per-frame total arc weight from a unit alpha — the S == 1 algebra
    # of alignment.forward on squeezed [batch..., T] values.
    if isinstance(self.alignment, alignments.FrameDependent):
      factor = semiring.plus(blanks[0], lexical_sums[0])
    else:  # FrameLabelDependent (gate checks the alignment type).
      terminated = [blanks[0]]
      last = None
      for i in range(self.alignment.max_expansions):
        last = (lexical_sums[i] if last is None
                else semiring.times(last, lexical_sums[i]))
        terminated.append(semiring.times(last, blanks[i + 1]))
      factor = semiring.sum(semirings.stack(terminated), axis=0)

    # Padded frames multiply by the identity (the scan route carries
    # alpha through them unchanged).
    dtypes = semirings.value_dtype(factor)
    one = semiring.ones(batch_dims + (max_num_frames,), dtypes)
    is_padding = jnp.arange(max_num_frames) >= num_frames[..., None]
    factor = semirings.where(is_padding, one, factor)

    # Inclusive cumulative (x)-product along time, computed in parallel;
    # its last element is alpha_T and a right-shift by one frame gives
    # the alpha_{0..T-1} history ``_forward`` contracts to return
    # ([batch..., T, 1] — the state axis reappears only here, on the
    # history output).
    time_axis = len(batch_dims)
    cum = jax.lax.associative_scan(semiring.times, factor, axis=time_axis)
    distance = jax.tree.map(lambda x: x[..., -1], cum)
    init = semiring.ones(batch_dims + (1,), dtypes)
    alpha_history = jax.tree.map(
        lambda o, c: jnp.concatenate([o, c[..., :-1]], axis=-1)[..., None],
        init, cum)
    return distance, alpha_history

  def _loss_s1(self, params, cache, frames, num_frames, labels,
               num_labels):
    """Globally-normalized S == 1 loss sharing ONE weight application.

    The numerator's string-DP weights and the denominator's per-frame
    factors are both functions of the same [batch..., T] blank and
    [batch..., T, vocab] lexical head outputs, but the generic ``loss``
    route computes that application twice (once per distance) and XLA
    does not CSE the duplicated matmul pair across the two subgraphs
    (verified on compiled HLO). Here the head runs once: the
    denominator applies the ``_forward_s1`` factor algebra and the
    numerator gathers its label columns from the same tensors, saving a
    full head fwd+bwd (~20% of the ctc-like training step at headline
    shapes) and the duplicated [batch..., T, vocab] HBM materialization.
    """
    self._last_path = 'xla-s1'
    context_next_labels = jnp.concatenate(
        [labels, jnp.ones_like(labels[..., :1])], axis=-1)
    blank, lexical = self._s1_weights(params['weight_fn'], cache, frames,
                                      jnp.asarray(num_frames).shape)
    denominator, _ = self._forward_s1_from_weights(
        blank, lexical, num_frames, semirings.Log, None, None,
        _identity)
    blank_w, lexical_w = self._s1_string_weights_from(
        blank, lexical, context_next_labels)
    numerator = self._string_dp(blank_w, lexical_w, num_frames,
                                num_labels, semirings.Log)
    return denominator - numerator

  def _forward_backward(self, params, cache, frames, num_frames):
    """Log-semiring shortest distance with backward-algorithm gradients.

    A working ``jax.custom_vjp`` realization of the reference's intended
    (but broken, SURVEY §2.2-Q3) forward-backward: the forward pass is the
    alpha scan saving only the per-frame alphas; the backward pass runs the
    backward algorithm in reverse — recomputing arc weights per frame under
    ``jax.vjp``, forming arc marginals with ``alignment.backward``, and
    feeding the (cotangent-scaled) marginals through the weight function
    VJP. Compared to plain autodiff this saves one ``forward_reduce`` per
    frame (reference rationale ``lattices.py:539-557``).

    Args:
      params: Parameter pytree.
      cache: Weight function cache data.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.

    Returns:
      [batch_dims...] log-semiring shortest distance (the log-normalizer).
    """
    num_frames = jnp.asarray(num_frames, jnp.int32)

    if self.fused != 'never':
      from last_torch_tpu.ops import fused_scan
      backend = ('interpret' if self.fused == 'interpret' else
                 jax.default_backend())
      if fused_scan.supported(self, semirings.Log, None, None, None, frames,
                              backend):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        dtype = (jnp.float32 if self.fused == 'interpret' else
                 jnp.bfloat16)
        return fused_scan.log_partition(
            params['weight_fn'], cache, frames, num_frames,
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            num_context_states=self.context.shape()[0],
            compute_dtype=dtype,
            interpret=self.fused == 'interpret')
      from last_torch_tpu.ops import trigram_scan
      if trigram_scan.supported(self, semirings.Log, None, None, None,
                                frames, backend):
        self._last_path = 'fused'
        frame_dependent = isinstance(self.alignment,
                                     alignments.FrameDependent)
        dtype = (jnp.float32 if self.fused == 'interpret' else
                 jnp.bfloat16)
        return trigram_scan.log_partition(
            params['weight_fn'], cache, frames, num_frames,
            max_expansions=(0 if frame_dependent else
                            self.alignment.max_expansions),
            frame_dependent=frame_dependent,
            vocab=self.context.vocab_size,
            compute_dtype=dtype,
            interpret=self.fused == 'interpret')

    if self._s1_route(frames):
      # S == 1 routes to the scan-free factorized forward, where plain
      # autodiff through the elementwise semiring algebra is already
      # optimal — the backward-algorithm custom VJP below only pays off
      # against a sequential alpha scan.
      log_z, _ = self._forward(
          params=params, cache=cache, frames=frames,
          num_frames=num_frames, semiring=semirings.Log)
      return log_z

    forward_backward = _forward_backward_vjp_fn(self)
    return forward_backward(params['weight_fn'], cache, frames, num_frames)

  class BackwardStepCallback(Protocol):
    """Callback signature used in the backward algorithm loop."""

    def __call__(self, weight_vjp_fn, carry, blank_marginal,
                 lexical_marginals):
      """Callback used in the backward algorithm loop.

      The standard backward algorithm simply computes arc marginals and
      backward weights. Through a custom callback, on-the-fly processing is
      possible without storing all arc marginals — e.g. accumulating
      gradients with respect to weight function parameters (see
      ``_forward_backward``).

      Args:
        weight_vjp_fn: VJP function of the weight function: callable
          (blank_grad, lexical_grad) -> (params_grad, cache_grad,
          frame_grad).
        carry: PyTree of custom callback carry data.
        blank_marginal: [batch_dims..., num_context_states] marginal
          probability of blank arcs.
        lexical_marginals: [batch_dims..., num_context_states, vocab_size]
          marginal probability of lexical arcs.

      Returns:
        (next_carry, step outputs).
      """
      ...

  def _backward(self, params, cache, frames, num_frames, log_z,
                alpha_0_to_T_minus_1, init_callback_carry,
                callback: 'RecognitionLattice.BackwardStepCallback'):
    """Arc marginals under the log semiring via the backward algorithm.

    Under the log semiring, arc weights can be viewed as unnormalized log
    probabilities; the marginal probability of each arc equals the gradient
    of the shortest distance with respect to that arc's weight. The backward
    algorithm computes these marginals in a single reverse scan, saving one
    ``forward_reduce`` per frame versus reverse-mode autodiff (reference
    ``lattices.py:686-799``).

    Args:
      params: Parameter pytree.
      cache: Weight function cache data.
      frames: [batch_dims..., max_num_frames, feature_size] padded frames.
      num_frames: [batch_dims...] number of frames.
      log_z: [batch_dims...] shortest distance from ``_forward``.
      alpha_0_to_T_minus_1: [batch_dims..., max_num_frames,
        num_context_states] forward weights from ``_forward``.
      init_callback_carry: PyTree of initial carry for the callback.
      callback: BackwardStepCallback invoked once per frame, in reverse
        time order.

    Returns:
      (final_callback_carry, callback_outputs); outputs are stacked along a
      batch-major time axis.
    """
    num_frames = jnp.asarray(num_frames)
    batch_dims = num_frames.shape
    if frames.shape[:-2] != batch_dims:
      raise ValueError('frames and num_frames have different batch_dims: '
                       f'{frames.shape[:-2]} vs {batch_dims}')
    if log_z.shape != batch_dims:
      raise ValueError('log_z and num_frames have different batch_dims: '
                       f'{log_z.shape} vs {batch_dims}')
    if alpha_0_to_T_minus_1.shape[:-2] != batch_dims:
      raise ValueError(
          'alpha_0_to_T_minus_1 and num_frames have different '
          f'batch_dims: {alpha_0_to_T_minus_1.shape[:-2]} vs {batch_dims}')

    num_align_states = self.alignment.num_states()
    wf_params = params['weight_fn']
    max_num_frames = frames.shape[-2]

    def step(carry, inputs):
      beta, callback_carry = carry
      t, alpha, frame = inputs
      (blank, lexical), weight_vjp = jax.vjp(
          lambda p, c, f: self.weight_fn.apply(p, c, f), wf_params, cache,
          frame)
      blank_l = [blank] * num_align_states
      lexical_l = [lexical] * num_align_states
      next_beta, blank_marginals, lexical_marginals = (
          self.alignment.backward(
              alpha=alpha,
              blank=blank_l,
              lexical=lexical_l,
              beta=beta,
              log_z=log_z,
              context=self.context))
      # Weight functions are alignment-state-invariant: total marginal per
      # (state, label) sums over alignment states.
      blank_marginal = functools.reduce(jnp.add, blank_marginals)
      lexical_marginal = functools.reduce(jnp.add, lexical_marginals)
      is_padding = (t >= num_frames)[..., None]
      next_beta = jnp.where(is_padding, beta, next_beta)
      blank_marginal = jnp.where(is_padding, 0, blank_marginal)
      lexical_marginal = jnp.where(is_padding[..., None], 0,
                                   lexical_marginal)
      next_callback_carry, callback_outputs = callback(
          weight_vjp_fn=lambda bg, lg: weight_vjp((bg, lg)),
          carry=callback_carry,
          blank_marginal=blank_marginal,
          lexical_marginals=lexical_marginal)
      return (next_beta, next_callback_carry), callback_outputs

    num_context_states, _ = self.context.shape()
    init_beta = semirings.Log.ones((*batch_dims, num_context_states),
                                   log_z.dtype)
    xs = (jnp.arange(max_num_frames),
          jnp.moveaxis(alpha_0_to_T_minus_1, -2, 0),
          jnp.moveaxis(frames, -2, 0))
    (_, final_callback_carry), callback_outputs = jax.lax.scan(
        step, (init_beta, init_callback_carry), xs, reverse=True)
    num_batch_dims = len(batch_dims)
    callback_outputs = jax.tree.map(
        lambda x: jnp.moveaxis(x, 0, num_batch_dims), callback_outputs)
    return final_callback_carry, callback_outputs


def _identity(w):
  return w


@functools.lru_cache(maxsize=None)
def _weight_fn_apply(weight_fn):
  """Stable reference to ``weight_fn.apply``: attribute access returns a
  fresh bound-method object every time, defeating jax's tracing caches
  when the method is passed to e.g. ``jax.eval_shape``."""
  return weight_fn.apply


@functools.lru_cache(maxsize=None)
def _forward_backward_vjp_fn(lattice):
  """Cached custom-VJP for the XLA forward-backward denominator.

  A fresh ``jax.custom_vjp`` object per call forces a full re-trace of
  the forward and backward scans on every outer retrace (same issue as
  ``ops.fused_scan._log_partition_vjp_fn``); one stable object per
  lattice instance lets jax's caches hit.
  """

  @jax.custom_vjp
  def forward_backward(wf_params, cache, frames, num_frames):
    log_z, _ = lattice._forward(
        params={'weight_fn': wf_params},
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        semiring=semirings.Log)
    return log_z

  def forward_backward_fwd(wf_params, cache, frames, num_frames):
    log_z, alpha_history = lattice._forward(
        params={'weight_fn': wf_params},
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        semiring=semirings.Log)
    return log_z, (wf_params, cache, frames, num_frames, log_z,
                   alpha_history)

  def forward_backward_bwd(residuals, g):
    wf_params, cache, frames, num_frames, log_z, alpha_history = residuals

    def accumulate(weight_vjp_fn, carry, blank_marginal, lexical_marginals):
      d_blank = g[..., None] * blank_marginal
      d_lexical = g[..., None, None] * lexical_marginals
      d_params, d_cache, d_frame = weight_vjp_fn(d_blank, d_lexical)
      next_carry = jax.tree.map(jnp.add, carry, (d_params, d_cache))
      return next_carry, d_frame

    init_carry = jax.tree.map(jnp.zeros_like, (wf_params, cache))
    (wf_params_grad, cache_grad), frames_grad = lattice._backward(
        params={'weight_fn': wf_params},
        cache=cache,
        frames=frames,
        num_frames=num_frames,
        log_z=log_z,
        alpha_0_to_T_minus_1=alpha_history,
        init_callback_carry=init_carry,
        callback=accumulate)
    return (wf_params_grad, cache_grad, frames_grad,
            np.zeros(num_frames.shape, jax.dtypes.float0))

  forward_backward.defvjp(forward_backward_fwd, forward_backward_bwd)
  return forward_backward


def _init_context_state_weights(batch_dims, dtype, num_states: int,
                                start: int, semiring):
  """One-hot start-state alpha_0 in any semiring."""
  is_start = jnp.arange(num_states) == start
  weights = semirings.where(is_start, semiring.ones([], dtype),
                            semiring.zeros([], dtype))
  return jax.tree.map(
      lambda w: jnp.broadcast_to(w, (*batch_dims, num_states)), weights)
