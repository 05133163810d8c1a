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

"""GNAT speech transducer model family: encoder + recognition lattice.

The reference library stops at the lattice (it consumes pre-encoded frames,
reference ``lattices.py:147-149``); this module assembles a complete,
trainable GNAT model the TPU-native way: explicit parameter pytrees, a
jittable train step with optax, and decoding via the lattice's tropical
shortest path — all shardable over a ``jax.sharding.Mesh`` (see
``last_torch_tpu.parallel``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from last_torch_tpu import alignments
from last_torch_tpu import contexts
from last_torch_tpu import lattices
from last_torch_tpu import weight_fns
from last_torch_tpu.models import encoder as encoder_lib

Params = Any


@dataclasses.dataclass(frozen=True)
class GNATConfig:
  """Configuration for a GNAT speech transducer.

  Attributes:
    feature_size: Input acoustic feature dimension.
    vocab_size: Lexical output vocabulary size (excluding blank).
    context_size: FullNGram context order (1 = bigram label history).
    encoder_size: Transformer encoder width.
    encoder_layers: Number of encoder blocks.
    encoder_heads: Attention heads.
    encoder_ffn_size: Encoder feed-forward width.
    hidden_size: Joint network hidden size.
    embedding_size: Context embedding size.
    max_expansions: If > 0, use FrameLabelDependent with this k; otherwise
      FrameDependent.
    locally_normalized: Locally normalized (cheap denominator-free loss) vs
      globally normalized (full GNAT forward-backward).
    use_rnn_cacher: Use SharedRNNCacher (shared-rnn weight fn) instead of
      SharedEmbCacher (shared-emb weight fn).
    encoder_causal: Causal encoder attention — required for online serving
      with models.encoder.StreamingEncoder; offline and streamed encodes
      then match.
    encoder_window: With encoder_causal, the left-context window (frames);
      bounds the streaming KV cache. 0 = unlimited (not streamable).
    encoder_conv_kernel: If > 0, the encoder blocks are Conformer blocks
      (macaron half-FFNs + a causal depthwise-conv module of this kernel
      width); 0 = plain Transformer blocks. Streaming-compatible.
  """

  feature_size: int = 80
  vocab_size: int = 1024
  context_size: int = 1
  encoder_size: int = 256
  encoder_layers: int = 4
  encoder_heads: int = 4
  encoder_ffn_size: int = 1024
  hidden_size: int = 512
  embedding_size: int = 512
  max_expansions: int = 2
  locally_normalized: bool = False
  use_rnn_cacher: bool = False
  encoder_causal: bool = False
  encoder_window: int = 0
  encoder_conv_kernel: int = 0


class GNATModel:
  """A complete GNAT speech transducer.

  Attributes:
    config: GNATConfig.
    encoder: TransformerEncoder.
    lattice: RecognitionLattice over the encoder outputs.
  """

  def __init__(self, config: GNATConfig):
    self.config = config
    self.encoder = encoder_lib.TransformerEncoder(
        feature_size=config.feature_size,
        model_size=config.encoder_size,
        num_layers=config.encoder_layers,
        num_heads=config.encoder_heads,
        ffn_size=config.encoder_ffn_size,
        causal=config.encoder_causal,
        window=config.encoder_window,
        conv_kernel=config.encoder_conv_kernel)

    context = contexts.FullNGram(
        vocab_size=config.vocab_size, context_size=config.context_size)
    if config.max_expansions > 0:
      alignment = alignments.FrameLabelDependent(
          max_expansions=config.max_expansions)
    else:
      alignment = alignments.FrameDependent()

    def cacher_factory(ctx):
      if config.use_rnn_cacher:
        return weight_fns.SharedRNNCacher(
            vocab_size=ctx.vocab_size,
            context_size=ctx.context_size,
            rnn_size=config.embedding_size,
            rnn_embedding_size=config.embedding_size)
      num_states, _ = ctx.shape()
      return weight_fns.SharedEmbCacher(
          num_context_states=num_states,
          embedding_size=config.embedding_size)

    def weight_fn_factory(ctx):
      _, vocab = ctx.shape()
      joint = weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=config.hidden_size)
      if config.locally_normalized:
        return weight_fns.LocallyNormalizedWeightFn(joint)
      return joint

    self.lattice = lattices.RecognitionLattice(
        context=context,
        alignment=alignment,
        weight_fn_cacher_factory=cacher_factory,
        weight_fn_factory=weight_fn_factory)

  def init(self, key: jax.Array) -> Params:
    k_enc, k_lat = jax.random.split(key)
    return {
        'encoder': self.encoder.init(k_enc),
        'lattice': self.lattice.init(
            k_lat, feature_size=self.config.encoder_size),
    }

  def loss(self, params: Params, frames, num_frames, labels,
           num_labels) -> jnp.ndarray:
    """Per-sequence negative log-probability loss.

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch, max_num_frames, feature_size] acoustic features.
      num_frames: [batch] frame counts.
      labels: [batch, max_num_labels] label sequences (1..vocab_size).
      num_labels: [batch] label counts.

    Returns:
      [batch] loss values.
    """
    encoded = self.encoder.apply(params['encoder'], frames, num_frames)
    return self.lattice(
        params['lattice'],
        frames=encoded,
        num_frames=num_frames,
        labels=labels,
        num_labels=num_labels)

  def mean_loss(self, params: Params, frames, num_frames, labels,
                num_labels) -> jnp.ndarray:
    """Scalar mean loss over the feasible sequences of a batch."""
    per_seq = self.loss(params, frames, num_frames, labels, num_labels)
    finite = jnp.isfinite(per_seq)
    per_seq = jnp.where(finite, per_seq, 0.0)
    return jnp.sum(per_seq) / jnp.maximum(jnp.sum(finite), 1)

  def decode(self, params: Params, frames, num_frames):
    """Viterbi-decodes the highest scoring alignment.

    Returns:
      (alignment_labels, num_alignment_labels, path_weights); see
      ``RecognitionLattice.shortest_path``.
    """
    encoded = self.encoder.apply(params['encoder'], frames, num_frames)
    return self.lattice.shortest_path(
        params['lattice'], frames=encoded, num_frames=num_frames)


@dataclasses.dataclass
class GNATTrainState:
  """Training state: parameters + optimizer state + step counter."""
  params: Params
  opt_state: Any
  step: jnp.ndarray


def make_optimizer(learning_rate: float = 1e-3,
                   weight_decay: float = 1e-4,
                   clip_norm: float = 5.0,
                   accumulate_steps: int = 1,
                   warmup_steps: int = 0,
                   total_steps: int = 0
                   ) -> optax.GradientTransformation:
  """AdamW with global-norm clipping; the standard transducer recipe.

  ``warmup_steps > 0`` switches the constant learning rate to the
  standard transducer schedule: linear warmup from 0 to
  ``learning_rate`` over ``warmup_steps``, then cosine decay to zero at
  ``total_steps`` (constant after warmup when ``total_steps`` is 0).

  ``accumulate_steps > 1`` wraps the chain in ``optax.MultiSteps``:
  gradients average over that many micro-batches before one parameter
  update — the way to train at effective batch sizes whose lattice
  activations do not fit one chip (each micro-step stays on the fused
  kernels; only the small parameter-gradient pytree is carried between
  micro-steps). The schedule then advances per UPDATE, not per
  micro-batch (MultiSteps semantics).
  """
  if warmup_steps > 0:
    if total_steps > warmup_steps:
      schedule = optax.warmup_cosine_decay_schedule(
          init_value=0.0, peak_value=learning_rate,
          warmup_steps=warmup_steps, decay_steps=total_steps)
    elif total_steps:
      raise ValueError(
          f'total_steps={total_steps} must exceed warmup_steps='
          f'{warmup_steps} (or be 0 for constant-after-warmup)')
    else:
      schedule = optax.linear_schedule(
          init_value=0.0, end_value=learning_rate,
          transition_steps=warmup_steps)
  else:
    schedule = learning_rate
  tx = optax.chain(
      optax.clip_by_global_norm(clip_norm),
      optax.adamw(schedule, weight_decay=weight_decay),
  )
  if accumulate_steps > 1:
    tx = optax.MultiSteps(tx, every_k_schedule=accumulate_steps)
  return tx


def init_train_state(model: GNATModel, key: jax.Array,
                     optimizer: optax.GradientTransformation
                     ) -> GNATTrainState:
  params = model.init(key)
  return GNATTrainState(
      params=params,
      opt_state=optimizer.init(params),
      step=jnp.zeros((), jnp.int32))


def train_step(model: GNATModel, optimizer: optax.GradientTransformation,
               state: GNATTrainState, frames, num_frames, labels,
               num_labels) -> tuple[GNATTrainState, jnp.ndarray]:
  """One jittable training step; returns (new_state, mean loss)."""
  loss, grads = jax.value_and_grad(model.mean_loss)(
      state.params, frames, num_frames, labels, num_labels)
  updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                            state.params)
  new_params = optax.apply_updates(state.params, updates)
  new_state = GNATTrainState(
      params=new_params, opt_state=new_opt_state, step=state.step + 1)
  return new_state, loss


def risk_train_step(model: GNATModel,
                    optimizer: optax.GradientTransformation,
                    state: GNATTrainState, frames, num_frames, labels,
                    num_labels, key: jax.Array,
                    num_samples: int = 4,
                    estimator: str = 'mwer',
                    nll_weight: float = 0.0,
                    per_example_keys: bool = False
                    ) -> tuple[GNATTrainState, dict]:
  """One jittable expected-risk (MWER) fine-tuning step.

  Minimizes the expected edit distance over exact posterior path samples
  (``risk.sampled_risk_loss``), optionally interpolated with the
  likelihood loss (``nll_weight > 0`` — the standard MWER recipe
  regularizes with a small NLL term to keep the posterior calibrated).
  The encoder runs ONCE; both objectives share the encoded frames.

  Args:
    model: The GNAT model.
    optimizer: An optax transformation (see ``make_optimizer``).
    state: Current train state.
    frames, num_frames, labels, num_labels: The batch.
    key: PRNG key for path sampling (fold in the step index per call).
    num_samples: Posterior samples per utterance.
    estimator: ``'mwer'`` or ``'reinforce'`` (see ``risk`` module docs).
    nll_weight: Weight of the added mean likelihood loss (0 disables).
    per_example_keys: Fold the key per GLOBAL batch row before sampling
      (``risk.per_example_keys``), making the sampled paths invariant to
      batch sharding — the single-device reference for the ``shard_map``
      data-parallel step (``parallel.sharding.
      make_shard_map_risk_train_step``).

  Returns:
    (new_state, metrics) where metrics has ``loss`` (the optimized
    scalar), ``mean_risk`` (Monte Carlo expected edit distance — the
    quantity MWER training should drive down), and ``nll`` when enabled.
  """
  # Function-level import: ``risk`` imports ``models.metrics``, so a
  # top-level import here would be circular during package init.
  from last_torch_tpu import risk as risk_lib

  def loss_fn(params):
    encoded = model.encoder.apply(params['encoder'], frames, num_frames)
    # Build the weight-fn cache once and share it between the risk loss
    # and the NLL term (otherwise each builds its own and we rely on XLA
    # CSE to dedupe them).
    cache = model.lattice.build_cache(params['lattice'])
    if per_example_keys:
      row_keys = risk_lib.per_example_keys(
          key, jnp.asarray(num_frames).shape[0])
      er, aux = risk_lib.sampled_risk_loss_per_example(
          model.lattice, params['lattice'], encoded, num_frames, labels,
          num_labels, row_keys, num_samples=num_samples,
          estimator=estimator, cache=cache)
    else:
      er, aux = risk_lib.sampled_risk_loss(
          model.lattice, params['lattice'], encoded, num_frames, labels,
          num_labels, key, num_samples=num_samples, estimator=estimator,
          cache=cache)
    metrics = {'mean_risk': jnp.mean(aux['mean_risk'])}
    total = jnp.mean(er)
    if nll_weight:
      per_seq = model.lattice(
          params['lattice'], frames=encoded, num_frames=num_frames,
          labels=labels, num_labels=num_labels, cache=cache)
      finite = jnp.isfinite(per_seq)
      nll = (jnp.sum(jnp.where(finite, per_seq, 0.0)) /
             jnp.maximum(jnp.sum(finite), 1))
      metrics['nll'] = nll
      total = total + nll_weight * nll
    return total, metrics

  (loss, metrics), grads = jax.value_and_grad(
      loss_fn, has_aux=True)(state.params)
  updates, new_opt_state = optimizer.update(grads, state.opt_state,
                                            state.params)
  new_params = optax.apply_updates(state.params, updates)
  new_state = GNATTrainState(
      params=new_params, opt_state=new_opt_state, step=state.step + 1)
  return new_state, dict(metrics, loss=loss)


jax.tree_util.register_dataclass(
    GNATTrainState, data_fields=['params', 'opt_state', 'step'],
    meta_fields=[])
