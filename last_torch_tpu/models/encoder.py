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

"""Speech encoders for the GNAT model family.

The reference library consumes already-encoded frames (reference
``lattices.py:147-149``); this module supplies the encoder side of a complete
GNAT speech transducer so the framework is usable end-to-end. The encoder is
a pre-LN Transformer tuned for the MXU: all projections are single large
matmuls, attention uses one fused QKV projection, and every op is static
shape / jit / shard_map friendly. Sequence (time) and model (heads / FFN)
axes are annotated for mesh sharding in ``last_torch_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

Params = Any


def _layer_norm(x, scale, bias, eps=1e-6):
  mean = jnp.mean(x, axis=-1, keepdims=True)
  var = jnp.var(x, axis=-1, keepdims=True)
  return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


@dataclasses.dataclass(frozen=True)
class TransformerEncoder:
  """Pre-LN Transformer encoder over padded frame sequences.

  Attributes:
    feature_size: Input feature dimension.
    model_size: Transformer width.
    num_layers: Number of blocks.
    num_heads: Attention heads (model_size % num_heads == 0).
    ffn_size: Feed-forward hidden width.
    dtype: Compute dtype for activations; bfloat16 keeps the MXU fed at
      full rate while parameters stay float32.
  """

  feature_size: int
  model_size: int = 256
  num_layers: int = 4
  num_heads: int = 4
  ffn_size: int = 1024
  dtype: Any = jnp.float32
  causal: bool = False
  window: int = 0  # with causal: left-context limit (0 = unlimited)
  # conv_kernel > 0 turns each block into a Conformer block: macaron
  # half-FFNs around attention plus a convolution module (pointwise-GLU
  # -> CAUSAL depthwise conv of this kernel width -> swish -> pointwise).
  # The conv is causal even offline so streaming inference stays exact.
  conv_kernel: int = 0
  # Blocked O(T * 2W) attention for the causal+window config instead of
  # the dense O(T^2) logits. None = auto (banded when it pays off, i.e.
  # max_t > 2 * window); True / False force it. Same mask semantics as
  # the dense path — outputs agree up to float summation order.
  banded_attention: Any = None

  def init(self, key: jax.Array) -> Params:
    keys = jax.random.split(key, 2 + self.num_layers)
    init_dense = jax.nn.initializers.lecun_normal()
    d = self.model_size
    params = {
        'input_proj': init_dense(keys[0], (self.feature_size, d)),
        'layers': [],
    }
    for i in range(self.num_layers):
      # Plain-Transformer layers keep the original 4-way split so
      # conv_kernel=0 initialization stays byte-identical for a given
      # seed; Conformer-only parameters derive fresh keys via fold_in.
      k1, k2, k3, k4 = jax.random.split(keys[2 + i], 4)
      k5, k6, k7, k8 = (jax.random.fold_in(keys[2 + i], j)
                        for j in (11, 12, 13, 14))
      layer = {
          'ln1_scale': jnp.ones((d,)),
          'ln1_bias': jnp.zeros((d,)),
          'qkv': init_dense(k1, (d, 3 * d)),
          'attn_out': init_dense(k2, (d, d)),
          'ln2_scale': jnp.ones((d,)),
          'ln2_bias': jnp.zeros((d,)),
          'ffn_in': init_dense(k3, (d, self.ffn_size)),
          'ffn_out': init_dense(k4, (self.ffn_size, d)),
      }
      if self.conv_kernel:
        layer.update({
            'ln_ffn1_scale': jnp.ones((d,)),
            'ln_ffn1_bias': jnp.zeros((d,)),
            'ffn1_in': init_dense(k5, (d, self.ffn_size)),
            'ffn1_out': init_dense(k6, (self.ffn_size, d)),
            'ln_conv_scale': jnp.ones((d,)),
            'ln_conv_bias': jnp.zeros((d,)),
            'conv_in': init_dense(k7, (d, 2 * d)),
            'conv_depth': init_dense(k8, (self.conv_kernel, d)),
            'conv_out': init_dense(
                jax.random.fold_in(k8, 1), (d, d)),
        })
      params['layers'].append(layer)
    params['final_ln_scale'] = jnp.ones((d,))
    params['final_ln_bias'] = jnp.zeros((d,))
    return params

  def _banded_attention(self, q, k, v, mask):
    """Blocked O(T * 2W) causal-windowed attention.

    With ``causal=True`` and ``window=W``, query t attends keys
    (t - W, t], which all lie inside the query's own W-wide time block
    or the block before it. Blocking time into W-frame tiles therefore
    computes [W, 2W] logits per tile instead of the dense [T, T] —
    O(T * W) logits memory/compute, unlocking long-T encoding (the
    dense path is ~327 MB/layer of float32 logits at T=1600). Mask
    semantics match the dense path exactly; outputs agree up to float
    summation order.

    Args:
      q, k, v: [batch, T, heads, head_dim] (already head-split).
      mask: [batch, T] bool frame-validity mask.

    Returns:
      [batch, T, heads, head_dim] attention context.
    """
    b, t, h, hd = q.shape
    w = self.window
    nb = -(-t // w)
    t_pad = nb * w

    def pad(x):
      return jnp.pad(x, ((0, 0), (0, t_pad - t)) +
                     ((0, 0),) * (x.ndim - 2))

    qb = pad(q).reshape(b, nb, w, h, hd)
    kb = pad(k).reshape(b, nb, w, h, hd)
    vb = pad(v).reshape(b, nb, w, h, hd)
    maskb = pad(mask).reshape(b, nb, w)

    def with_prev(x):
      """Prepends each block's left neighbor (zeros before block 0)."""
      prev = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]],
                             axis=1)
      return jnp.concatenate([prev, x], axis=2)  # [B, nb, 2W, ...]

    k2, v2, m2 = with_prev(kb), with_prev(vb), with_prev(maskb)
    # Block 0's zero-filled "previous block" is masked by m2 == False
    # (the zeros of a bool mask), which also covers global key index < 0.
    q_off = jnp.arange(w)
    k_off = jnp.arange(2 * w) - w  # relative to the query block start
    visible = ((q_off[:, None] >= k_off[None, :]) &
               (q_off[:, None] - k_off[None, :] < w))
    neg_inf = jnp.asarray(-1e9, jnp.float32)
    bias = jnp.where(visible[None, None] & m2[:, :, None, :], 0.0,
                     neg_inf)  # [B, nb, W, 2W]
    logits = jnp.einsum('bnqhd,bnkhd->bnhqk', qb, k2,
                        preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(hd) + bias[:, :, None]
    weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
    ctx = jnp.einsum('bnhqk,bnkhd->bnqhd', weights, v2)
    return ctx.reshape(b, t_pad, h, hd)[:, :t]

  def _conv_module(self, layer, x, history=None):
    """Conformer convolution module on [batch, T, d].

    ``history``: optional [batch, conv_kernel - 1, d] of the previous
    chunk's GLU outputs (streaming); offline the left context is zero
    padding. Returns (module output, new history).
    """
    d = self.model_size
    y = _layer_norm(x, layer['ln_conv_scale'].astype(self.dtype),
                    layer['ln_conv_bias'].astype(self.dtype))
    gates = y @ layer['conv_in'].astype(self.dtype)
    u = gates[..., :d] * jax.nn.sigmoid(gates[..., d:])  # GLU
    if history is None:
      history = jnp.zeros((x.shape[0], self.conv_kernel - 1, d),
                          self.dtype)
    ext = jnp.concatenate([history, u], axis=1)  # [B, K-1+T, d]
    # Causal depthwise conv: out[t] = sum_j w[j] * ext[t + j].
    w = layer['conv_depth'].astype(self.dtype)
    conv = sum(
        ext[:, j:j + x.shape[1], :] * w[j][None, None, :]
        for j in range(self.conv_kernel))
    out = jax.nn.swish(conv) @ layer['conv_out'].astype(self.dtype)
    new_history = ext[:, ext.shape[1] - (self.conv_kernel - 1):, :]
    return out, new_history

  def embed(self, input_proj: jnp.ndarray,
            frames: jnp.ndarray) -> jnp.ndarray:
    """Input projection + fixed sinusoidal positions (block 0's input)."""
    max_t = frames.shape[-2]
    x = frames.astype(self.dtype) @ input_proj.astype(self.dtype)
    # Fixed sinusoidal positions; cheap, no parameters.
    pos = _sinusoidal_positions(max_t, self.model_size).astype(self.dtype)
    return x + pos

  def attention_inputs(self, mask: jnp.ndarray):
    """Per-sequence attention routing: (use_banded, attn_bias).

    ``use_banded`` is a trace-time bool; ``attn_bias`` is the dense
    [batch, 1, T, T] additive mask (None on the banded route, which
    masks inside its blocks).
    """
    max_t = mask.shape[-1]
    use_banded = (self.causal and self.window and
                  (self.banded_attention if self.banded_attention
                   is not None else max_t > 2 * self.window))
    attn_bias = None
    if not use_banded:
      neg_inf = jnp.asarray(-1e9, self.dtype)
      attn_bias = jnp.where(mask[:, None, None, :], 0.0, neg_inf)
      if self.causal:
        # Causal (optionally left-windowed) attention: the offline result
        # then matches StreamingEncoder's chunked computation (up to
        # float summation order) — the train/serve parity guarantee.
        q_pos = jnp.arange(max_t)
        visible = q_pos[:, None] >= q_pos[None, :]
        if self.window:
          visible &= q_pos[:, None] - q_pos[None, :] < self.window
        attn_bias = attn_bias + jnp.where(visible, 0.0,
                                          neg_inf)[None, None]
    return use_banded, attn_bias

  def block(self, layer: Params, x: jnp.ndarray, mask: jnp.ndarray,
            attn_bias, use_banded: bool) -> jnp.ndarray:
    """One encoder block (Transformer, or Conformer when conv_kernel > 0).

    Factored out of ``apply`` so pipeline-parallel execution
    (``parallel.pipeline``) can run a contiguous stage of blocks per
    device with identical semantics.
    """
    head_dim = self.model_size // self.num_heads
    ffn_scale = 0.5 if self.conv_kernel else 1.0
    if self.conv_kernel:
      # Conformer macaron: first half-FFN.
      y = _layer_norm(x, layer['ln_ffn1_scale'].astype(self.dtype),
                      layer['ln_ffn1_bias'].astype(self.dtype))
      y = jax.nn.gelu(y @ layer['ffn1_in'].astype(self.dtype))
      x = x + 0.5 * (y @ layer['ffn1_out'].astype(self.dtype))

    y = _layer_norm(x, layer['ln1_scale'].astype(self.dtype),
                    layer['ln1_bias'].astype(self.dtype))
    qkv = y @ layer['qkv'].astype(self.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    split_heads = lambda t: t.reshape(*t.shape[:-1], self.num_heads,
                                      head_dim)
    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    if use_banded:
      context = self._banded_attention(q, k, v, mask)
    else:
      logits = jnp.einsum('bqhd,bkhd->bhqk', q, k,
                          preferred_element_type=jnp.float32)
      logits = logits / math.sqrt(head_dim) + attn_bias
      weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
      context = jnp.einsum('bhqk,bkhd->bqhd', weights, v)
    context = context.reshape(*context.shape[:-2], self.model_size)
    x = x + context @ layer['attn_out'].astype(self.dtype)

    if self.conv_kernel:
      conv_out, _ = self._conv_module(layer, x)
      x = x + conv_out

    y = _layer_norm(x, layer['ln2_scale'].astype(self.dtype),
                    layer['ln2_bias'].astype(self.dtype))
    y = jax.nn.gelu(y @ layer['ffn_in'].astype(self.dtype))
    return x + ffn_scale * (y @ layer['ffn_out'].astype(self.dtype))

  def finalize(self, final_ln_scale: jnp.ndarray,
               final_ln_bias: jnp.ndarray, x: jnp.ndarray,
               mask: jnp.ndarray) -> jnp.ndarray:
    """Final layer norm + padding zero-out (the last block's epilogue)."""
    x = _layer_norm(x, final_ln_scale.astype(self.dtype),
                    final_ln_bias.astype(self.dtype))
    # Zero out padding frames so downstream consumers see clean data.
    return jnp.where(mask[..., None], x, 0.0).astype(jnp.float32)

  def apply(self, params: Params, frames: jnp.ndarray,
            num_frames: jnp.ndarray) -> jnp.ndarray:
    """Encodes frames.

    Args:
      params: Parameter pytree from ``init``.
      frames: [batch, max_num_frames, feature_size] padded frames.
      num_frames: [batch] number of valid frames.

    Returns:
      [batch, max_num_frames, model_size] encoded frames.
    """
    max_t = frames.shape[-2]
    mask = jnp.arange(max_t) < num_frames[..., None]  # [batch, T]
    x = self.embed(params['input_proj'], frames)
    use_banded, attn_bias = self.attention_inputs(mask)
    for layer in params['layers']:
      x = self.block(layer, x, mask, attn_bias, use_banded)
    return self.finalize(params['final_ln_scale'], params['final_ln_bias'],
                         x, mask)


def _sinusoidal_positions_at(position: jnp.ndarray, dim: int) -> jnp.ndarray:
  """Sinusoidal encodings for given (possibly traced) positions."""
  position = position[:, None].astype(jnp.float32)
  div = jnp.exp(
      jnp.arange(0, dim, 2).astype(jnp.float32) * (-math.log(10000.0) / dim))
  pe = jnp.zeros((position.shape[0], dim))
  pe = pe.at[:, 0::2].set(jnp.sin(position * div))
  pe = pe.at[:, 1::2].set(jnp.cos(position * div))
  return pe


def _sinusoidal_positions(length: int, dim: int) -> jnp.ndarray:
  return _sinusoidal_positions_at(jnp.arange(length), dim)


@dataclasses.dataclass(frozen=True)
class StreamingEncoder:
  """Chunked inference for a causal, left-windowed TransformerEncoder.

  Carries per-layer key/value caches of the last ``window`` frames plus a
  frame counter, so encoding arbitrary chunk sizes matches one offline
  ``encoder.apply`` call with ``causal=True, window=W`` up to float
  summation order — train offline, serve streaming, no gap.

  All streams in a batch advance together (whole chunks); pad the final
  partial chunk and mask downstream via the lattice decoders' num_frames.
  """

  encoder: TransformerEncoder

  def __post_init__(self):
    if not (self.encoder.causal and self.encoder.window > 0):
      raise ValueError('StreamingEncoder requires a TransformerEncoder '
                       'with causal=True and window > 0')

  def init_state(self, batch_size: int):
    e = self.encoder
    w, h = e.window, e.model_size // e.num_heads
    kv = jnp.zeros((batch_size, e.num_layers, w, e.num_heads, h), e.dtype)
    # 'pos' counts absolute frames since stream start (int32, unbounded).
    # Known long-stream limits: float32 sinusoidal encodings lose
    # precision beyond ~1e6 absolute frames (~3 h at 100 fps) and int32
    # wraps at 2^31; production streams should be segmented/restarted
    # well before either. Flagged for the serving story — a
    # relative-position scheme would remove the limit.
    state = {'k': kv, 'v': kv, 'pos': jnp.zeros((), jnp.int32)}
    if e.conv_kernel:
      # Conformer conv module: the last K-1 GLU outputs per layer.
      state['conv'] = jnp.zeros(
          (batch_size, e.num_layers, e.conv_kernel - 1, e.model_size),
          e.dtype)
    return state

  def step(self, params: Params, state, frames: jnp.ndarray):
    """Encodes one chunk: [batch, chunk_len, feature] -> model_size."""
    e = self.encoder
    chunk = frames.shape[1]
    w = e.window
    head_dim = e.model_size // e.num_heads
    t0 = state['pos']

    x = frames.astype(e.dtype) @ params['input_proj'].astype(e.dtype)
    x = x + _sinusoidal_positions_at(t0 + jnp.arange(chunk),
                                     e.model_size).astype(e.dtype)

    q_abs = t0 + jnp.arange(chunk)                      # [C]
    k_abs = jnp.concatenate([t0 - w + jnp.arange(w),
                             t0 + jnp.arange(chunk)])   # [W + C]
    visible = ((q_abs[:, None] >= k_abs[None, :]) &
               (q_abs[:, None] - k_abs[None, :] < w) &
               (k_abs[None, :] >= 0))
    neg_inf = jnp.asarray(-1e9, e.dtype)
    attn_bias = jnp.where(visible, 0.0, neg_inf)[None, None]  # [1,1,C,W+C]

    ffn_scale = 0.5 if e.conv_kernel else 1.0
    new_k, new_v, new_conv = [], [], []
    for i, layer in enumerate(params['layers']):
      if e.conv_kernel:
        y = _layer_norm(x, layer['ln_ffn1_scale'].astype(e.dtype),
                        layer['ln_ffn1_bias'].astype(e.dtype))
        y = jax.nn.gelu(y @ layer['ffn1_in'].astype(e.dtype))
        x = x + 0.5 * (y @ layer['ffn1_out'].astype(e.dtype))

      y = _layer_norm(x, layer['ln1_scale'].astype(e.dtype),
                      layer['ln1_bias'].astype(e.dtype))
      qkv = y @ layer['qkv'].astype(e.dtype)
      q, k, v = jnp.split(qkv, 3, axis=-1)
      split_heads = lambda t: t.reshape(*t.shape[:-1], e.num_heads,
                                        head_dim)
      q, k, v = split_heads(q), split_heads(k), split_heads(v)
      k_full = jnp.concatenate([state['k'][:, i], k], axis=1)
      v_full = jnp.concatenate([state['v'][:, i], v], axis=1)
      new_k.append(k_full[:, -w:])
      new_v.append(v_full[:, -w:])
      logits = jnp.einsum('bqhd,bkhd->bhqk', q, k_full,
                          preferred_element_type=jnp.float32)
      logits = logits / math.sqrt(head_dim) + attn_bias
      weights = jax.nn.softmax(logits, axis=-1).astype(e.dtype)
      context = jnp.einsum('bhqk,bkhd->bqhd', weights, v_full)
      context = context.reshape(*context.shape[:-2], e.model_size)
      x = x + context @ layer['attn_out'].astype(e.dtype)

      if e.conv_kernel:
        # history starts as zeros in init_state, matching the offline
        # causal conv's zero left padding at stream start.
        conv_out, hist = e._conv_module(layer, x,
                                        history=state['conv'][:, i])
        x = x + conv_out
        new_conv.append(hist)

      y = _layer_norm(x, layer['ln2_scale'].astype(e.dtype),
                      layer['ln2_bias'].astype(e.dtype))
      y = jax.nn.gelu(y @ layer['ffn_in'].astype(e.dtype))
      x = x + ffn_scale * (y @ layer['ffn_out'].astype(e.dtype))

    x = _layer_norm(x, params['final_ln_scale'].astype(e.dtype),
                    params['final_ln_bias'].astype(e.dtype))
    new_state = {
        'k': jnp.stack(new_k, axis=1),
        'v': jnp.stack(new_v, axis=1),
        'pos': t0 + chunk,
    }
    if e.conv_kernel:
      new_state['conv'] = jnp.stack(new_conv, axis=1)
    return new_state, x.astype(jnp.float32)
