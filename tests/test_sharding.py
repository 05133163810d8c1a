"""Sharding tests on a virtual 8-device CPU mesh (SURVEY §4).

Verifies that the dp x tp sharded train step compiles and executes over a
('data', 'model') mesh, and that sharded results match single-device
results.
"""

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

from last_torch_tpu.models import gnat
from last_torch_tpu.parallel import sharding
from tests.test_models import tiny_batch, tiny_config


@pytest.fixture(scope='module')
def eight_devices():
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 (virtual) devices')
  return jax.devices()[:8]


def test_make_mesh(eight_devices):
  mesh = sharding.make_mesh(model_parallel=2)
  assert mesh.axis_names == ('data', 'model')
  assert mesh.shape['data'] == 4
  assert mesh.shape['model'] == 2
  with pytest.raises(ValueError, match='must divide'):
    sharding.make_mesh(model_parallel=3)


def test_param_shardings_rules(eight_devices):
  mesh = sharding.make_mesh(model_parallel=2)
  model = gnat.GNATModel(tiny_config())
  params = model.init(jax.random.PRNGKey(0))
  shardings = sharding.param_shardings(params, mesh)
  # Vocab head sharded on the model axis.
  vocab_w = shardings['lattice']['weight_fn']['vocab_w']
  assert vocab_w.spec == jax.sharding.PartitionSpec(None, 'model')
  # Biases of the blank head replicated.
  blank_b = shardings['lattice']['weight_fn']['blank_b']
  assert blank_b.spec == jax.sharding.PartitionSpec()


def test_sharded_train_step_matches_single_device(eight_devices):
  """dp x tp sharded step == unsharded step (same math, different layout)."""
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  # Batch divisible by the data axis (4).
  frames, num_frames, labels, num_labels = tiny_batch(batch=4)
  num_frames = jnp.array([6, 4, 5, 6], jnp.int32)
  labels = jnp.tile(labels[:1], (4, 1))
  num_labels = jnp.array([3, 2, 3, 1], jnp.int32)

  state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  _, loss_single = gnat.train_step(model, optimizer, state0, frames,
                                   num_frames, labels, num_labels)

  mesh = sharding.make_mesh(model_parallel=2)
  step_fn, shard_state = sharding.make_sharded_train_step(
      model, optimizer, mesh)
  state = shard_state(
      gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer))
  batch = [
      jax.device_put(x, sharding.batch_shardings(mesh))
      for x in (frames, num_frames, labels, num_labels)
  ]
  new_state, loss_sharded = step_fn(state, *batch)
  assert int(new_state.step) == 1
  npt.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-4)


def test_time_sharded_shortest_distance(eight_devices):
  """Alpha-relay time sharding == single-device forward."""
  import last_torch_tpu
  from last_torch_tpu import alignments, contexts, semirings, weight_fns
  from last_torch_tpu.parallel import sequence

  context = contexts.FullNGram(vocab_size=3, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=8),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=ctx.shape()[1], hidden_size=8))
  params = lattice.init(jax.random.PRNGKey(0), feature_size=4)
  frames = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
  num_frames = jnp.array([8, 5])

  expected, _ = lattice._forward(
      params=params,
      cache=lattice.build_cache(params),
      frames=frames,
      num_frames=num_frames,
      semiring=semirings.Log)

  mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), axis_names=('seq',))
  actual = sequence.shortest_distance_time_sharded(
      lattice, params, frames, num_frames, mesh=mesh, axis_name='seq')
  npt.assert_allclose(actual, expected, rtol=1e-5)

  with pytest.raises(ValueError, match='divisible'):
    sequence.shortest_distance_time_sharded(
        lattice, params, frames[:, :6], num_frames, mesh=mesh,
        axis_name='seq')


def test_graft_entry_dryrun(eight_devices):
  """The driver-facing multichip dry run executes."""
  import __graft_entry__
  __graft_entry__.dryrun_multichip(8)


def test_graft_entry_single():
  import __graft_entry__
  fn, args = __graft_entry__.entry()
  loss = jax.jit(fn)(*args)
  assert np.isfinite(float(loss))


def test_shard_map_train_step_matches_single_device(eight_devices):
  """Manual shard_map dp step == unsharded step (fused-kernel-safe path)."""
  model = gnat.GNATModel(tiny_config())
  optimizer = gnat.make_optimizer(learning_rate=1e-2)
  frames, num_frames, labels, num_labels = tiny_batch(batch=8)
  num_frames = jnp.array([6, 4, 5, 6, 6, 4, 5, 6], jnp.int32)
  labels = jnp.tile(labels[:1], (8, 1))
  num_labels = jnp.array([3, 2, 3, 1, 3, 2, 3, 1], jnp.int32)

  state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  single_state, loss_single = gnat.train_step(
      model, optimizer, state0, frames, num_frames, labels, num_labels)

  mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), axis_names=('data',))
  step_fn = sharding.make_shard_map_train_step(model, optimizer, mesh)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  batch = [
      jax.device_put(x, jax.sharding.NamedSharding(
          mesh, jax.sharding.PartitionSpec('data')))
      for x in (frames, num_frames, labels, num_labels)
  ]
  new_state, loss_sharded = step_fn(state, *batch)
  assert int(new_state.step) == 1
  npt.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-5)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      jax.device_get(new_state.params), jax.device_get(single_state.params))
