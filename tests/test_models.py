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
