"""Tests for the GNAT model family (encoder + lattice + train step)."""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from last_torch_tpu.models import encoder as encoder_lib
from last_torch_tpu.models import gnat


def tiny_config(**overrides):
  defaults = dict(
      feature_size=8,
      vocab_size=4,
      context_size=1,
      encoder_size=16,
      encoder_layers=1,
      encoder_heads=2,
      encoder_ffn_size=32,
      hidden_size=16,
      embedding_size=16,
      max_expansions=1,
      locally_normalized=True)
  defaults.update(overrides)
  return gnat.GNATConfig(**defaults)


def tiny_batch(batch=2, max_t=6, max_u=3, feature=8, vocab=4, seed=0):
  rng = np.random.default_rng(seed)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, feature)), jnp.float32)
  num_frames = jnp.array([max_t, max_t - 2], jnp.int32)
  labels = jnp.asarray(
      rng.integers(1, vocab + 1, size=(batch, max_u)), jnp.int32)
  num_labels = jnp.array([max_u, max_u - 1], jnp.int32)
  return frames, num_frames, labels, num_labels


def test_encoder_shapes_and_padding():
  enc = encoder_lib.TransformerEncoder(
      feature_size=8, model_size=16, num_layers=1, num_heads=2, ffn_size=32)
  params = enc.init(jax.random.PRNGKey(0))
  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 8))
  num_frames = jnp.array([6, 3])
  out = enc.apply(params, frames, num_frames)
  assert out.shape == (2, 6, 16)
  # Padding frames are zeroed.
  npt.assert_array_equal(out[1, 3:], np.zeros((3, 16)))
  # Valid outputs do not depend on padding frame content.
  frames2 = frames.at[1, 3:].set(123.0)
  out2 = enc.apply(params, frames2, num_frames)
  npt.assert_allclose(out[1, :3], out2[1, :3], atol=1e-5)


def test_gnat_loss_and_decode():
  model = gnat.GNATModel(tiny_config())
  params = model.init(jax.random.PRNGKey(0))
  frames, num_frames, labels, num_labels = tiny_batch()

  loss = model.loss(params, frames, num_frames, labels, num_labels)
  assert loss.shape == (2,)
  assert np.all(np.isfinite(np.asarray(loss)))
  # Negative log-probs are positive for a locally-normalized model.
  assert np.all(np.asarray(loss) > 0)

  decoded, num_decoded, path_weights = model.decode(params, frames,
                                                    num_frames)
  num_align_states = model.lattice.alignment.num_states()
  assert decoded.shape == (2, 6 * num_align_states)
  npt.assert_array_equal(num_decoded, num_align_states * num_frames)
  assert np.all(np.isfinite(np.asarray(path_weights)))


def test_gnat_train_step_improves_loss():
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  frames, num_frames, labels, num_labels = tiny_batch()

  step = jax.jit(
      lambda s, f, nf, l, nl: gnat.train_step(model, optimizer, s, f, nf, l,
                                              nl))
  losses = []
  for _ in range(5):
    state, loss = step(state, frames, num_frames, labels, num_labels)
    losses.append(float(loss))
  assert int(state.step) == 5
  assert all(np.isfinite(losses))
  # Overfitting a fixed batch must reduce the loss.
  assert losses[-1] < losses[0]


def test_gnat_globally_normalized_train_step():
  model = gnat.GNATModel(tiny_config(locally_normalized=False))
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(1), optimizer)
  frames, num_frames, labels, num_labels = tiny_batch(seed=1)

  step = jax.jit(
      lambda s, f, nf, l, nl: gnat.train_step(model, optimizer, s, f, nf, l,
                                              nl))
  state, loss0 = step(state, frames, num_frames, labels, num_labels)
  state, loss1 = step(state, frames, num_frames, labels, num_labels)
  assert np.isfinite(float(loss0)) and np.isfinite(float(loss1))


def test_model_presets():
  """Named model-family presets build, train a step, and decode."""
  from last_torch_tpu.models import presets

  for config in [
      presets.ctc_like(vocab_size=4, feature_size=8, encoder_size=16,
                       encoder_layers=1, encoder_heads=2,
                       encoder_ffn_size=32, hidden_size=16,
                       embedding_size=16),
      presets.hat_bigram(vocab_size=4, feature_size=8, encoder_size=16,
                         encoder_layers=1, encoder_heads=2,
                         encoder_ffn_size=32, hidden_size=16,
                         embedding_size=16, max_expansions=1),
      presets.gnat_global_bigram(vocab_size=4, feature_size=8,
                                 encoder_size=16, encoder_layers=1,
                                 encoder_heads=2, encoder_ffn_size=32,
                                 hidden_size=16, embedding_size=16,
                                 max_expansions=1),
      presets.streaming_conformer_gnat(vocab_size=4, feature_size=8,
                                       encoder_size=16, encoder_layers=1,
                                       encoder_heads=2, encoder_ffn_size=32,
                                       hidden_size=16, embedding_size=16,
                                       max_expansions=1, encoder_window=4,
                                       encoder_conv_kernel=3),
  ]:
    model = gnat.GNATModel(config)
    optimizer = gnat.make_optimizer()
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    frames, num_frames, labels, num_labels = tiny_batch()
    state, loss = gnat.train_step(model, optimizer, state, frames,
                                  num_frames, labels, num_labels)
    assert np.isfinite(float(loss))
    decoded, _, _ = model.decode(state.params, frames, num_frames)
    assert np.all(np.asarray(decoded) >= 0)


class TestCausalStreamingEncoder:

  def make(self, window=4):
    return encoder_lib.TransformerEncoder(
        feature_size=8, model_size=16, num_layers=2, num_heads=2,
        ffn_size=32, causal=True, window=window)

  def test_causal_future_invariance(self):
    enc = self.make()
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8))
    nf = jnp.full((2,), 8, jnp.int32)
    out = enc.apply(params, frames, nf)
    frames2 = frames.at[:, 5:].set(99.0)
    out2 = enc.apply(params, frames2, nf)
    npt.assert_allclose(out[:, :5], out2[:, :5], atol=1e-5)

  def test_window_limits_left_context(self):
    enc = self.make(window=3)
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8))
    nf = jnp.full((1,), 8, jnp.int32)
    out = enc.apply(params, frames, nf)
    # Changing frames more than (num_layers * (window-1)) steps in the past
    # cannot reach the last position through 2 layers of width-3 attention.
    frames2 = frames.at[:, :3].set(-7.0)
    out2 = enc.apply(params, frames2, nf)
    npt.assert_allclose(out[:, 7], out2[:, 7], atol=1e-5)

  def test_streaming_matches_offline(self):
    enc = self.make(window=4)
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(2), (2, 9, 8))
    nf = jnp.full((2,), 9, jnp.int32)
    offline = enc.apply(params, frames, nf)

    stream = encoder_lib.StreamingEncoder(enc)
    state = stream.init_state(2)
    outs = []
    for lo, hi in [(0, 3), (3, 4), (4, 9)]:
      state, out = jax.jit(stream.step)(params, state, frames[:, lo:hi])
      outs.append(np.asarray(out))
    npt.assert_allclose(np.concatenate(outs, axis=1), np.asarray(offline),
                        atol=1e-4)

  def test_banded_attention_matches_dense(self):
    """The blocked O(T * 2W) path == the dense masked path, including
    ragged num_frames, a T the window does not divide, and Conformer
    blocks."""
    import dataclasses
    for conv_kernel in (0, 3):
      enc = encoder_lib.TransformerEncoder(
          feature_size=8, model_size=16, num_layers=2, num_heads=2,
          ffn_size=32, causal=True, window=4, conv_kernel=conv_kernel)
      params = enc.init(jax.random.PRNGKey(0))
      frames = jax.random.normal(jax.random.PRNGKey(3), (3, 11, 8))
      nf = jnp.array([11, 7, 4], jnp.int32)
      dense = dataclasses.replace(enc, banded_attention=False)
      banded = dataclasses.replace(enc, banded_attention=True)
      npt.assert_allclose(
          np.asarray(banded.apply(params, frames, nf)),
          np.asarray(dense.apply(params, frames, nf)), atol=1e-5)

  def test_banded_auto_gate_and_streaming_parity(self):
    """auto (T > 2W) engages banded; streamed chunks still match it."""
    enc = self.make(window=3)  # T=9 > 2*3 -> auto-banded
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(4), (2, 9, 8))
    nf = jnp.full((2,), 9, jnp.int32)
    offline = enc.apply(params, frames, nf)
    import dataclasses
    dense = dataclasses.replace(enc, banded_attention=False)
    npt.assert_allclose(np.asarray(offline),
                        np.asarray(dense.apply(params, frames, nf)),
                        atol=1e-5)
    stream = encoder_lib.StreamingEncoder(enc)
    state = stream.init_state(2)
    outs = []
    for lo, hi in [(0, 2), (2, 9)]:
      state, out = stream.step(params, state, frames[:, lo:hi])
      outs.append(np.asarray(out))
    npt.assert_allclose(np.concatenate(outs, axis=1), np.asarray(offline),
                        atol=1e-4)

  def test_streaming_requires_causal_window(self):
    import pytest
    with pytest.raises(ValueError, match='causal'):
      encoder_lib.StreamingEncoder(
          encoder_lib.TransformerEncoder(feature_size=8, model_size=16))

  def test_end_to_end_streaming_pipeline(self):
    """Streamed encoder + streamed greedy decode == offline pipeline."""
    from last_torch_tpu import streaming as streaming_lib

    enc = self.make(window=4)
    enc_params = enc.init(jax.random.PRNGKey(0))
    model = gnat.GNATModel(tiny_config())
    params = model.init(jax.random.PRNGKey(1))
    lattice = model.lattice
    lat_params = params['lattice']
    cache = lattice.build_cache(lat_params)
    raw = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8))
    nf = jnp.full((2,), 8, jnp.int32)

    # Offline: encode everything, decode everything. The lattice's weight
    # function consumes encoder_size (16)-dim frames directly.
    encoded = enc.apply(enc_params, raw, nf)
    dec = streaming_lib.StreamingGreedyDecoder(lattice)
    _, offline_labels, _ = dec.step(lat_params, dec.init_state(2),
                                    encoded, nf, cache)

    # Streaming: chunked encoder + chunked decoder.
    stream = encoder_lib.StreamingEncoder(enc)
    es, ds = stream.init_state(2), dec.init_state(2)
    outs = []
    for lo, hi in [(0, 5), (5, 8)]:
      es, chunk = stream.step(enc_params, es, raw[:, lo:hi])
      ds, labels, _ = dec.step(lat_params, ds, chunk,
                               jnp.full((2,), hi - lo, jnp.int32), cache)
      outs.append(np.asarray(labels))
    npt.assert_array_equal(np.concatenate(outs, axis=1),
                           np.asarray(offline_labels))


def test_causal_gnat_trains_and_streams():
  """A causal-encoder GNAT trains offline and serves streamed."""
  from last_torch_tpu import streaming as streaming_lib

  model = gnat.GNATModel(tiny_config(encoder_causal=True,
                                     encoder_window=4))
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  frames, num_frames, labels, num_labels = tiny_batch()
  step = jax.jit(lambda s, f, nf, l, nl: gnat.train_step(
      model, optimizer, s, f, nf, l, nl))
  losses = []
  for _ in range(3):
    state, loss = step(state, frames, num_frames, labels, num_labels)
    losses.append(float(loss))
  assert losses[-1] < losses[0]

  # Serve the trained parameters streamed: encoder chunks + greedy chunks
  # equals the offline pipeline.
  enc_stream = encoder_lib.StreamingEncoder(model.encoder)
  dec = streaming_lib.StreamingGreedyDecoder(model.lattice)
  lat_params = state.params['lattice']
  cache = model.lattice.build_cache(lat_params)
  full_frames = frames
  nf = jnp.full((2,), 6, jnp.int32)

  encoded = model.encoder.apply(state.params['encoder'], full_frames, nf)
  _, offline, _ = dec.step(lat_params, dec.init_state(2), encoded, nf,
                           cache)
  es, ds = enc_stream.init_state(2), dec.init_state(2)
  outs = []
  for lo, hi in [(0, 2), (2, 6)]:
    es, chunk = enc_stream.step(state.params['encoder'], es,
                                full_frames[:, lo:hi])
    ds, lab, _ = dec.step(lat_params, ds, chunk,
                          jnp.full((2,), hi - lo, jnp.int32), cache)
    outs.append(np.asarray(lab))
  npt.assert_array_equal(np.concatenate(outs, axis=1), np.asarray(offline))


def test_gradient_accumulation_matches_large_batch():
  """accumulate_steps=2 over two micro-batches == one concatenated step.

  MultiSteps averages the micro-batch gradients before applying the
  wrapped AdamW chain once; with equal-size micro-batches that average
  equals the concatenated batch's mean-loss gradient exactly.
  """
  config = gnat.GNATConfig(
      feature_size=6, vocab_size=8, context_size=1, encoder_size=16,
      encoder_layers=1, encoder_heads=2, encoder_ffn_size=32,
      # FrameDependent: under FrameLabelDependent the blank-bias gradient
      # is structurally zero (blank counts cancel), and Adam amplifies the
      # float residue of the micro-average into an O(lr) update.
      hidden_size=16, embedding_size=16, max_expansions=0)
  model = gnat.GNATModel(config)
  rng = np.random.default_rng(0)
  frames = jnp.asarray(rng.normal(size=(4, 5, 6)), jnp.float32)
  nf = jnp.array([5, 4, 5, 3], jnp.int32)
  labels = jnp.asarray(rng.integers(1, 9, size=(4, 3)), jnp.int32)
  nl = jnp.array([3, 2, 1, 3], jnp.int32)

  big_opt = gnat.make_optimizer(learning_rate=1e-2)
  big_state = gnat.init_train_state(model, jax.random.PRNGKey(0), big_opt)
  big_state, _ = gnat.train_step(model, big_opt, big_state, frames, nf,
                                 labels, nl)

  acc_opt = gnat.make_optimizer(learning_rate=1e-2, accumulate_steps=2)
  acc_state = gnat.init_train_state(model, jax.random.PRNGKey(0), acc_opt)
  for sl in (slice(0, 2), slice(2, 4)):
    acc_state, _ = gnat.train_step(model, acc_opt, acc_state, frames[sl],
                                   nf[sl], labels[sl], nl[sl])

  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=2e-5, atol=1e-6),
      acc_state.params, big_state.params)
  # And the accumulated params actually moved.
  moved = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                       acc_state.params, big_state.params)
  del moved
  first = jax.tree.leaves(acc_state.params)[0]
  init = jax.tree.leaves(
      gnat.init_train_state(model, jax.random.PRNGKey(0), acc_opt).params)[0]
  assert float(jnp.max(jnp.abs(first - init))) > 0


class TestConformerEncoder:
  """conv_kernel > 0: Conformer blocks (macaron FFNs + causal conv)."""

  def make(self, window=0, causal=False):
    return encoder_lib.TransformerEncoder(
        feature_size=8, model_size=16, num_layers=2, num_heads=2,
        ffn_size=32, causal=causal, window=window, conv_kernel=3)

  def test_shapes_params_and_finiteness(self):
    enc = self.make()
    params = enc.init(jax.random.PRNGKey(0))
    assert 'conv_depth' in params['layers'][0]
    assert params['layers'][0]['conv_depth'].shape == (3, 16)
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 8))
    nf = jnp.array([7, 4])
    out = jax.jit(enc.apply)(params, frames, nf)
    assert out.shape == (2, 7, 16)
    assert np.all(np.isfinite(np.asarray(out)))
    assert np.all(np.asarray(out)[1, 4:] == 0)  # padding zeroed

  def test_causal_conv_future_invariance(self):
    """The conv module must not read the future even offline."""
    enc = self.make(causal=True, window=4)
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8))
    nf = jnp.full((1,), 8, jnp.int32)
    out = enc.apply(params, frames, nf)
    frames2 = frames.at[:, 6:].set(55.0)
    out2 = enc.apply(params, frames2, nf)
    npt.assert_allclose(out[:, :6], out2[:, :6], atol=1e-5)

  def test_streaming_matches_offline(self):
    enc = self.make(causal=True, window=4)
    params = enc.init(jax.random.PRNGKey(0))
    frames = jax.random.normal(jax.random.PRNGKey(3), (2, 9, 8))
    nf = jnp.full((2,), 9, jnp.int32)
    offline = enc.apply(params, frames, nf)

    stream = encoder_lib.StreamingEncoder(enc)
    state = stream.init_state(2)
    assert state['conv'].shape == (2, 2, 2, 16)
    outs = []
    for lo, hi in [(0, 1), (1, 4), (4, 9)]:
      state, out = jax.jit(stream.step)(params, state, frames[:, lo:hi])
      outs.append(np.asarray(out))
    npt.assert_allclose(np.concatenate(outs, axis=1), np.asarray(offline),
                        atol=1e-4)

  def test_conformer_gnat_trains(self):
    config = gnat.GNATConfig(
        feature_size=6, vocab_size=8, context_size=1, encoder_size=16,
        encoder_layers=1, encoder_heads=2, encoder_ffn_size=32,
        hidden_size=16, embedding_size=16, max_expansions=1,
        encoder_conv_kernel=3)
    model = gnat.GNATModel(config)
    opt = gnat.make_optimizer(learning_rate=1e-2)
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), opt)
    rng = np.random.default_rng(0)
    tf = jnp.asarray(rng.normal(size=(4, 10, 6)), jnp.float32)
    tn = jnp.full((4,), 10, jnp.int32)
    tl = jnp.asarray(rng.integers(1, 9, size=(4, 3)), jnp.int32)
    tnl = jnp.full((4,), 3, jnp.int32)
    step = jax.jit(lambda s, *b: gnat.train_step(model, opt, s, *b))
    losses = []
    for _ in range(3):
      state, l = step(state, tf, tn, tl, tnl)
      losses.append(float(l))
    assert losses[-1] < losses[0], losses


def test_warmup_schedule_scales_first_updates():
  """warmup_steps > 0: the first update is tiny, later ones larger."""
  config = gnat.GNATConfig(
      feature_size=6, vocab_size=8, context_size=1, encoder_size=16,
      encoder_layers=1, encoder_heads=2, encoder_ffn_size=32,
      hidden_size=16, embedding_size=16, max_expansions=0)
  model = gnat.GNATModel(config)
  rng = np.random.default_rng(0)
  batch = (jnp.asarray(rng.normal(size=(2, 5, 6)), jnp.float32),
           jnp.array([5, 5], jnp.int32),
           jnp.asarray(rng.integers(1, 9, size=(2, 2)), jnp.int32),
           jnp.array([2, 2], jnp.int32))

  opt = gnat.make_optimizer(learning_rate=1e-2, warmup_steps=10,
                            total_steps=100)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), opt)
  p0 = jax.tree.leaves(state.params)[0]
  deltas = []
  for _ in range(3):
    prev = jax.tree.leaves(state.params)[0]
    state, _ = gnat.train_step(model, opt, state, *batch)
    deltas.append(float(jnp.max(jnp.abs(
        jax.tree.leaves(state.params)[0] - prev))))
  # Step 1 uses lr ~= 0 (warmup start); later steps move more.
  assert deltas[0] < deltas[2]
  assert deltas[0] < 1e-4
  del p0


def test_ctc_model_loss_matches_numpy_oracle():
  """End-to-end model loss == a hand-rolled numpy lattice DP at S == 1.

  Covers the full wiring — encoder, SharedEmbCacher, JointWeightFn's
  one-apply ``label_weights`` fast path, local normalization, and the
  numerator string DP — against an independent reference:

  - FrameDependent (textbook CTC): each frame one arc, blank or label.
  - FrameLabelDependent(1): up to one (label, then blank) per frame, so
    an emission multiplies lexical AND blank weights. This topology is
    probability-deficient under local normalization at context_size=0
    (an emitting frame contributes at most (1-b)*p_y*b <= 1/4) — see
    examples/train_ctc.py; the loss values here pin that semantics.
  """
  rng = np.random.default_rng(0)
  B, T, U = 4, 10, 4
  frames = jnp.asarray(rng.normal(size=(B, T, 8)), jnp.float32)
  num_frames = jnp.asarray([10, 8, 9, 10], jnp.int32)
  labels = jnp.asarray(
      [[1, 4, 2, 3], [2, 2, 3, 0], [4, 1, 0, 0], [3, 1, 1, 4]], jnp.int32)
  num_labels = jnp.asarray([4, 3, 2, 4], jnp.int32)

  def np_lse(a, b):
    m = np.maximum(a, b)
    if np.isneginf(m):
      return m
    return m + np.log(np.exp(a - m) + np.exp(b - m))

  for max_expansions in (0, 1):
    model = gnat.GNATModel(tiny_config(
        context_size=0, max_expansions=max_expansions))
    params = model.init(jax.random.PRNGKey(2))
    got = np.asarray(
        model.loss(params, frames, num_frames, labels, num_labels))

    encoded = model.encoder.apply(params['encoder'], frames, num_frames)
    cache = model.lattice.build_cache(params['lattice'])
    blank, lexical = model.lattice.weight_fn.apply(
        params['lattice']['weight_fn'], cache, encoded)
    blank = np.asarray(blank, np.float64)[..., 0]          # [B, T]
    lexical = np.asarray(lexical, np.float64)[:, :, 0, :]  # [B, T, V]

    want = []
    for b in range(B):
      tn, un = int(num_frames[b]), int(num_labels[b])
      ys = [int(y) for y in np.asarray(labels[b])[:un]]
      alpha = np.full(un + 1, -np.inf)
      alpha[0] = 0.0
      for t in range(tn):
        new = np.full(un + 1, -np.inf)
        for u in range(un + 1):
          if np.isneginf(alpha[u]):
            continue
          if max_expansions == 0:
            # FrameDependent: the frame is EITHER blank OR one label.
            new[u] = np_lse(new[u], alpha[u] + blank[b, t])
            if u < un:
              new[u + 1] = np_lse(new[u + 1],
                                  alpha[u] + lexical[b, t, ys[u] - 1])
          else:
            # FrameLabelDependent(1): blank always ends the frame; an
            # emission multiplies its lexical weight in before it.
            new[u] = np_lse(new[u], alpha[u] + blank[b, t])
            if u < un:
              new[u + 1] = np_lse(
                  new[u + 1],
                  alpha[u] + lexical[b, t, ys[u] - 1] + blank[b, t])
        alpha = new
      want.append(-alpha[un])
    npt.assert_allclose(got, np.array(want), rtol=0, atol=1e-4)


def test_risk_train_step_reduces_expected_edit_distance():
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer(learning_rate=3e-2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  frames, num_frames, labels, num_labels = tiny_batch()

  # Warm start with a few likelihood steps (the standard MWER recipe
  # fine-tunes a trained model; a random posterior is too flat to rank).
  nll_step = jax.jit(lambda s, *b: gnat.train_step(model, optimizer, s, *b))
  for _ in range(10):
    state, _ = nll_step(state, frames, num_frames, labels, num_labels)

  risk_step = jax.jit(lambda s, k, *b: gnat.risk_train_step(
      model, optimizer, s, *b, key=k, num_samples=8,
      estimator='reinforce', nll_weight=0.1))
  risks = []
  for i in range(30):
    state, metrics = risk_step(state, jax.random.fold_in(
        jax.random.PRNGKey(7), i), frames, num_frames, labels, num_labels)
    assert set(metrics) == {'loss', 'mean_risk', 'nll'}
    risks.append(float(metrics['mean_risk']))
  assert all(np.isfinite(risks))
  # Overfitting a fixed batch must drive the expected edit distance down.
  assert np.mean(risks[-5:]) < np.mean(risks[:5]), risks


def test_risk_train_step_mwer_estimator_runs():
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  frames, num_frames, labels, num_labels = tiny_batch(seed=2)
  step = jax.jit(lambda s, k, *b: gnat.risk_train_step(
      model, optimizer, s, *b, key=k, num_samples=4, estimator='mwer'))
  state, metrics = step(state, jax.random.PRNGKey(1), frames, num_frames,
                        labels, num_labels)
  assert set(metrics) == {'loss', 'mean_risk'}
  assert np.isfinite(float(metrics['loss']))
  assert int(state.step) == 1
