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

  # Same relay with each device's local block on the fused forward
  # kernel (interpret mode), chained through the kernel's alpha0 input.
  kernels = sequence.shortest_distance_time_sharded(
      lattice, params, frames, num_frames, mesh=mesh, axis_name='seq',
      fused='interpret')
  npt.assert_allclose(kernels, expected, rtol=1e-5)

  with pytest.raises(ValueError, match='divisible'):
    sequence.shortest_distance_time_sharded(
        lattice, params, frames[:, :6], num_frames, mesh=mesh,
        axis_name='seq')


def _relay_lattice():
  import last_torch_tpu
  from last_torch_tpu import alignments, contexts, weight_fns

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
  return lattice, params, frames, num_frames


class TestTimeShardedTraining:
  """The relay's custom-VJP backward == single-device gradients."""

  @pytest.mark.parametrize('fused', ['never', 'interpret'])
  def test_shortest_distance_grads(self, eight_devices, fused):
    from last_torch_tpu import semirings
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = _relay_lattice()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))

    def single(params, frames):
      sd, _ = lattice._forward(
          params=params, cache=lattice.build_cache(params), frames=frames,
          num_frames=num_frames, semiring=semirings.Log)
      return jnp.sum(sd)

    def sharded(params, frames):
      return jnp.sum(sequence.shortest_distance_time_sharded(
          lattice, params, frames, num_frames, mesh=mesh, axis_name='seq',
          fused=fused))

    npt.assert_allclose(sharded(params, frames), single(params, frames),
                        rtol=1e-5)
    g1 = jax.grad(single, argnums=(0, 1))(params, frames)
    g2 = jax.grad(sharded, argnums=(0, 1))(params, frames)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        g1, g2)

  def test_tropical_semiring_grads(self, eight_devices):
    """The cotangent relay is semiring-generic: Viterbi one-hot grads."""
    from last_torch_tpu import semirings
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = _relay_lattice()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))

    def single(frames):
      sd, _ = lattice._forward(
          params=params, cache=lattice.build_cache(params), frames=frames,
          num_frames=num_frames, semiring=semirings.MaxTropical)
      return jnp.sum(sd)

    def sharded(frames):
      return jnp.sum(sequence.shortest_distance_time_sharded(
          lattice, params, frames, num_frames, mesh=mesh, axis_name='seq',
          semiring=semirings.MaxTropical))

    npt.assert_allclose(sharded(frames), single(frames), rtol=1e-5)
    npt.assert_allclose(jax.grad(sharded)(frames),
                        jax.grad(single)(frames), rtol=1e-4, atol=1e-6)

  def test_expectation_semiring_relay(self, eight_devices):
    """Tuple-valued semiring carries relay too (entropy expectation)."""
    from last_torch_tpu import semirings
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = _relay_lattice()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    sr = semirings.LogLogExpectation
    lift = lambda w: sr.weighted(w, jnp.log(jnp.maximum(-w, 1e-30)))
    expected = lattice.shortest_distance(
        params, frames, num_frames, semiring=sr, weight_lift=lift)
    actual = sequence.shortest_distance_time_sharded(
        lattice, params, frames, num_frames, mesh=mesh, axis_name='seq',
        semiring=sr, weight_lift=lift)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-5, atol=1e-6),
        actual, expected)

  def test_string_forward_and_loss_grads(self, eight_devices):
    from last_torch_tpu import semirings
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = _relay_lattice()
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    labels = jnp.array([[1, 2, 1], [3, 1, 0]], jnp.int32)
    num_labels = jnp.array([3, 2])

    def single_num(params, frames):
      cache = lattice.build_cache(params)
      return jnp.sum(lattice._string_forward(
          params, cache, frames, num_frames, labels, num_labels,
          semirings.Log))

    def sharded_num(params, frames):
      return jnp.sum(sequence.string_forward_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq'))

    npt.assert_allclose(sharded_num(params, frames),
                        single_num(params, frames), rtol=1e-5)
    g1 = jax.grad(single_num, argnums=(0, 1))(params, frames)
    g2 = jax.grad(sharded_num, argnums=(0, 1))(params, frames)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        g1, g2)

    def single_loss(params):
      return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                             labels=labels, num_labels=num_labels))

    def sharded_loss(params):
      return jnp.sum(sequence.loss_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq'))

    npt.assert_allclose(sharded_loss(params), single_loss(params),
                        rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.grad(single_loss)(params), jax.grad(sharded_loss)(params))

  def test_train_step_matches_single_device(self, eight_devices):
    """One time-sharded train step == one single-device train step."""
    import optax
    from last_torch_tpu.parallel import sequence
    config = tiny_config()
    model = gnat.GNATModel(config)
    optimizer = optax.sgd(1e-2)
    frames, num_frames, labels, num_labels = tiny_batch(batch=2)
    num_frames = jnp.array([6, 4], jnp.int32)

    state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    single_state, loss_single = gnat.train_step(
        model, optimizer, state0, frames, num_frames, labels, num_labels)

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:2]),
                             axis_names=('seq',))
    step_fn = sequence.make_time_sharded_train_step(model, optimizer, mesh)
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    new_state, loss_sharded = step_fn(state, frames, num_frames, labels,
                                      num_labels)
    assert int(new_state.step) == 1
    npt.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.device_get(new_state.params),
        jax.device_get(single_state.params))

  @pytest.mark.parametrize('fused', ['never', 'interpret'])
  def test_data_x_seq_composition(self, eight_devices, fused):
    """dp x seq: batch shards over 'data' while frames shard over 'seq';
    loss and gradients equal the single-device path."""
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = _relay_lattice()
    # Batch 2 over data axis 2; T=8 over seq axis 4.
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4),
        axis_names=('data', 'seq'))
    labels = jnp.array([[1, 2, 1], [3, 1, 0]], jnp.int32)
    num_labels = jnp.array([3, 2])

    def single(params):
      return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                             labels=labels, num_labels=num_labels))

    def sharded(params):
      return jnp.sum(sequence.loss_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq', fused=fused, batch_axis='data'))

    npt.assert_allclose(sharded(params), single(params), rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=5e-6),
        jax.grad(single)(params), jax.grad(sharded)(params))

  @pytest.mark.parametrize('num_devices,max_expansions,seed', [
      (2, 0, 0),
      (4, 2, 1),
      (8, 1, 2),
  ])
  def test_relay_fuzz(self, eight_devices, num_devices, max_expansions,
                      seed):
    """Random configs: axis sizes, FLD orders, ragged/zero num_frames —
    loss values and gradients equal the single-device path."""
    import last_torch_tpu
    from last_torch_tpu import alignments, contexts, weight_fns
    from last_torch_tpu.parallel import sequence
    rng = np.random.default_rng(seed)
    vocab = int(rng.integers(2, 6))
    alignment = (alignments.FrameLabelDependent(max_expansions)
                 if max_expansions else alignments.FrameDependent())
    lattice = last_torch_tpu.RecognitionLattice(
        context=contexts.FullNGram(vocab_size=vocab, context_size=1),
        alignment=alignment,
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
            vocab_size=ctx.shape()[1], hidden_size=8))
    params = lattice.init(jax.random.PRNGKey(seed), feature_size=4)
    batch = int(rng.integers(1, 4))
    max_t = num_devices * int(rng.integers(1, 4))
    frames = jax.random.normal(jax.random.PRNGKey(seed + 10),
                               (batch, max_t, 4))
    num_frames = jnp.asarray(
        rng.integers(0, max_t + 1, size=(batch,)), jnp.int32)
    max_u = 2
    labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                         jnp.int32)
    num_labels = jnp.minimum(
        jnp.asarray(rng.integers(0, max_u + 1, size=(batch,)), jnp.int32),
        num_frames * (max_expansions if max_expansions else 1))
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:num_devices]),
                             axis_names=('seq',))

    def single(params):
      losses = lattice(params, frames=frames, num_frames=num_frames,
                       labels=labels, num_labels=num_labels)
      return jnp.sum(jnp.where(jnp.isfinite(losses), losses, 0.0))

    def sharded(params):
      losses = sequence.loss_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq')
      return jnp.sum(jnp.where(jnp.isfinite(losses), losses, 0.0))

    npt.assert_allclose(sharded(params), single(params), rtol=1e-5,
                        atol=1e-6)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
        jax.grad(sharded)(params), jax.grad(single)(params))

  def test_s1_lattice_relay_matches_scan_free_route(self, eight_devices):
    """context_size=0 (S == 1, CTC topology): the time-sharded relay
    equals the single-device path, whose dispatch is the scan-free
    factorized route (``_forward_s1``) — proving the two beyond-reference
    features compose (values, gradients, and decoded labels)."""
    import last_torch_tpu
    from last_torch_tpu import alignments, contexts, weight_fns
    from last_torch_tpu.parallel import sequence
    lattice = last_torch_tpu.RecognitionLattice(
        context=contexts.FullNGram(vocab_size=3, context_size=0),
        alignment=alignments.FrameDependent(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
            vocab_size=ctx.shape()[1], hidden_size=8))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=4)
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    num_frames = jnp.array([8, 5])
    labels = jnp.array([[1, 2, 1], [3, 1, 0]], jnp.int32)
    num_labels = jnp.array([3, 2])
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))

    def single(params):
      return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                             labels=labels, num_labels=num_labels))

    def sharded(params):
      return jnp.sum(sequence.loss_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq'))

    single_val = single(params)
    assert lattice.last_path == 'xla-s1'  # the scan-free route was the ref
    npt.assert_allclose(sharded(params), single_val, rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.grad(single)(params), jax.grad(sharded)(params))

    want = lattice.shortest_path(params, frames, num_frames)
    got = sequence.shortest_path_time_sharded(
        lattice, params, frames, num_frames, mesh, 'seq')
    npt.assert_array_equal(got[0], want[0])
    npt.assert_array_equal(got[1], want[1])
    npt.assert_allclose(got[2], want[2], rtol=1e-5)

  def test_relay_runs_each_block_once(self, eight_devices):
    """Inactive relay stages are lax.cond-skipped: D local scans total,
    not D^2 (the D x redundant-compute fix)."""
    from last_torch_tpu.parallel import sequence
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    count = {'n': 0}

    def bump():
      count['n'] += 1

    def local_fn(carry, local_frames, num_frames, my_idx, diff_args, aux):
      del num_frames, my_idx, aux
      jax.debug.callback(bump)
      (w,) = diff_args
      return carry * w + jnp.sum(local_frames[..., 0], axis=-1,
                                 keepdims=True)

    run = sequence._relay(mesh, 'seq', local_fn)
    frames = jnp.arange(2 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 3)
    carry0 = jnp.zeros((2, 1))
    out = run(carry0, frames, jnp.array([8, 8], jnp.int32),
              (jnp.ones(()),), ())
    jax.block_until_ready(out)
    npt.assert_allclose(out, jnp.sum(frames[..., 0], axis=-1,
                                     keepdims=True))
    assert count['n'] == 4


class TestTimeShardedInference:
  """Long utterances decode and align with the same relay that trains
  them: labels/emit-frames identical to the single-device machinery."""

  def _lattice(self, alignment_factory):
    import last_torch_tpu
    from last_torch_tpu import contexts, weight_fns
    context = contexts.FullNGram(vocab_size=3, context_size=1)
    lattice = last_torch_tpu.RecognitionLattice(
        context=context,
        alignment=alignment_factory(),
        weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
            num_context_states=ctx.shape()[0], embedding_size=8),
        weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
            vocab_size=ctx.shape()[1], hidden_size=8))
    params = lattice.init(jax.random.PRNGKey(0), feature_size=4)
    frames = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 4))
    num_frames = jnp.array([8, 5])
    return lattice, params, frames, num_frames

  @pytest.mark.parametrize('alignment_factory', [
      lambda: __import__(
          'last_torch_tpu').alignments.FrameDependent(),
      lambda: __import__(
          'last_torch_tpu').alignments.FrameLabelDependent(
              max_expansions=2),
  ])
  def test_shortest_path_matches_single_device(self, eight_devices,
                                               alignment_factory):
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = self._lattice(alignment_factory)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    labels_1, nal_1, w_1 = lattice.shortest_path(params, frames,
                                                 num_frames)
    labels_s, nal_s, w_s = sequence.shortest_path_time_sharded(
        lattice, params, frames, num_frames, mesh, 'seq')
    npt.assert_array_equal(np.asarray(labels_s), np.asarray(labels_1))
    npt.assert_array_equal(np.asarray(nal_s), np.asarray(nal_1))
    npt.assert_allclose(np.asarray(w_s), np.asarray(w_1), rtol=1e-6)

  def test_shortest_path_reference_compat_and_dp(self, eight_devices):
    import last_torch_tpu
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = self._lattice(
        last_torch_tpu.alignments.FrameDependent)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4),
        axis_names=('data', 'seq'))
    labels_1, _, w_1 = lattice.shortest_path(params, frames, num_frames,
                                             reference_compat=True)
    labels_s, _, w_s = sequence.shortest_path_time_sharded(
        lattice, params, frames, num_frames, mesh, 'seq',
        batch_axis='data', reference_compat=True)
    npt.assert_array_equal(np.asarray(labels_s), np.asarray(labels_1))
    npt.assert_allclose(np.asarray(w_s), np.asarray(w_1), rtol=1e-6)

  @pytest.mark.parametrize('alignment_factory', [
      lambda: __import__(
          'last_torch_tpu').alignments.FrameDependent(),
      lambda: __import__(
          'last_torch_tpu').alignments.FrameLabelDependent(
              max_expansions=2),
  ])
  def test_align_matches_single_device(self, eight_devices,
                                       alignment_factory):
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, num_frames = self._lattice(alignment_factory)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    labels = jnp.array([[1, 2, 1], [3, 1, 0]], jnp.int32)
    num_labels = jnp.array([3, 2])
    emit_1, w_1 = lattice.align(params, frames, num_frames, labels,
                                num_labels)
    emit_s, w_s = sequence.align_time_sharded(
        lattice, params, frames, num_frames, labels, num_labels, mesh,
        'seq')
    npt.assert_array_equal(np.asarray(emit_s), np.asarray(emit_1))
    npt.assert_allclose(np.asarray(w_s), np.asarray(w_1), rtol=1e-6)

  def test_align_infeasible_transcript(self, eight_devices):
    """Infeasible transcripts keep the -inf score contract."""
    import last_torch_tpu
    from last_torch_tpu.parallel import sequence
    lattice, params, frames, _ = self._lattice(
        last_torch_tpu.alignments.FrameDependent)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]),
                             axis_names=('seq',))
    labels = jnp.array([[1, 2, 1], [3, 1, 3]], jnp.int32)
    # Row 1: 3 labels in 2 frames under FrameDependent -> infeasible.
    num_frames = jnp.array([8, 2])
    num_labels = jnp.array([3, 3])
    emit_s, w_s = sequence.align_time_sharded(
        lattice, params, frames, num_frames, labels, num_labels, mesh,
        'seq')
    assert np.isneginf(np.asarray(w_s)[1])
    assert np.isfinite(np.asarray(w_s)[0])
    emit_1, w_1 = lattice.align(params, frames, num_frames, labels,
                                num_labels)
    npt.assert_array_equal(np.asarray(emit_s)[0], np.asarray(emit_1)[0])


@pytest.mark.slow
def test_graft_entry_dryrun(eight_devices):
  # slow (~90 s: jits 10 sharded train steps): deselected by default —
  # the build driver runs __graft_entry__.dryrun_multichip(8) itself
  # every round (MULTICHIP_r*.json) so the default suite does not
  # duplicate it; run with `pytest -m slow` locally.
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


@pytest.mark.parametrize('nll_weight', [0.0, 0.3])
def test_shard_map_risk_train_step_matches_single_device(eight_devices,
                                                         nll_weight):
  """dp shard_map MWER step == single-device per-example-key risk step.

  Per-row PRNG key folding (``risk.per_example_keys``) makes the sampled
  posterior paths a function of each row's GLOBAL index only, so the dp
  step reproduces the single-device samples — loss, metrics, AND updated
  parameters must match (up to float reduction order).
  """
  import optax
  model = gnat.GNATModel(tiny_config())
  optimizer = optax.sgd(1e-2)
  frames, num_frames, labels, num_labels = tiny_batch(batch=8)
  num_frames = jnp.array([6, 4, 5, 6, 6, 4, 5, 6], jnp.int32)
  labels = jnp.tile(labels[:1], (8, 1))
  num_labels = jnp.array([3, 2, 3, 1, 3, 2, 3, 1], jnp.int32)
  key = jax.random.PRNGKey(42)

  state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  single_state, single_metrics = gnat.risk_train_step(
      model, optimizer, state0, frames, num_frames, labels, num_labels,
      key, num_samples=3, nll_weight=nll_weight, per_example_keys=True)

  mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]),
                           axis_names=('data',))
  step_fn = sharding.make_shard_map_risk_train_step(
      model, optimizer, mesh, num_samples=3, nll_weight=nll_weight)
  state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
  batch = [
      jax.device_put(x, sharding.batch_shardings(mesh))
      for x in (frames, num_frames, labels, num_labels)
  ]
  new_state, metrics = step_fn(state, *batch, key)
  assert int(new_state.step) == 1
  npt.assert_allclose(float(metrics['loss']),
                      float(single_metrics['loss']), rtol=1e-5, atol=1e-6)
  npt.assert_allclose(float(metrics['mean_risk']),
                      float(single_metrics['mean_risk']), rtol=1e-6)
  if nll_weight:
    npt.assert_allclose(float(metrics['nll']),
                        float(single_metrics['nll']), rtol=1e-5)
  jax.tree.map(
      lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
      jax.device_get(new_state.params),
      jax.device_get(single_state.params))


def test_per_example_keys_shift_invariance():
  """Folding by global row index makes sampling shard-invariant: the
  loss of rows [4:8] computed alone with offset 4 equals those rows'
  contribution in the full batch."""
  from last_torch_tpu import risk
  model = gnat.GNATModel(tiny_config())
  params = model.init(jax.random.PRNGKey(0))
  frames, _, labels, _ = tiny_batch(batch=8)
  num_frames = jnp.array([6, 4, 5, 6, 6, 4, 5, 6], jnp.int32)
  num_labels = jnp.array([3, 2, 3, 1, 3, 2, 3, 1], jnp.int32)
  key = jax.random.PRNGKey(7)
  encoded = model.encoder.apply(params['encoder'], frames, num_frames)

  full_keys = risk.per_example_keys(key, 8)
  full, _ = risk.sampled_risk_loss_per_example(
      model.lattice, params['lattice'], encoded, num_frames, labels,
      num_labels, full_keys, num_samples=3)
  tail_keys = risk.per_example_keys(key, 4, offset=4)
  tail, _ = risk.sampled_risk_loss_per_example(
      model.lattice, params['lattice'], encoded[4:], num_frames[4:],
      labels[4:], num_labels[4:], tail_keys, num_samples=3)
  npt.assert_allclose(np.asarray(tail), np.asarray(full)[4:], rtol=1e-6)


class TestTensorParallelLattice:
  """Vocab-sharded lattice loss (ops.sharded_scan) on the CPU mesh."""

  def test_frame_reduce_matches_oracle(self):
    from last_torch_tpu.ops import sharded_scan

    rng = np.random.default_rng(0)
    batch, s_pad, hidden, v_local = 3, 256, 16, 128
    vec = jnp.asarray(rng.normal(size=(batch, s_pad)), jnp.float32)
    # Padded states are semiring-dead.
    vec = vec.at[:, 200:].set(float('-inf'))
    pf = jnp.asarray(rng.normal(size=(batch, hidden)), jnp.float32)
    pc = jnp.asarray(rng.normal(size=(s_pad, hidden)), jnp.float32)
    vw = jnp.asarray(rng.normal(size=(hidden, v_local)) * 0.3, jnp.float32)
    vb = jnp.asarray(rng.normal(size=(v_local,)), jnp.float32)
    bw = jnp.asarray(rng.normal(size=(hidden,)), jnp.float32)
    bb = jnp.asarray(rng.normal(size=()), jnp.float32)

    def oracle(vec, pf, pc, vw, vb, bw, bb):
      joint = jnp.tanh(pc[None] + pf[:, None])
      lex = joint @ vw + vb
      blank = joint @ bw[:, None] + bb
      red = jax.scipy.special.logsumexp(vec[:, :, None] + lex, axis=1)
      return red, blank[..., 0]

    red_k, blank_k = sharded_scan.frame_reduce(vec, pf, pc, vw, vb, bw, bb,
                                               8, True)
    red_o, blank_o = oracle(vec, pf, pc, vw, vb, bw, bb)
    npt.assert_allclose(red_k, red_o, rtol=1e-5, atol=1e-6)
    npt.assert_allclose(blank_k, blank_o, rtol=1e-5, atol=1e-6)

    # Gradient parity with random cotangents (exercises the bwd kernel).
    cr = jnp.asarray(rng.normal(size=red_o.shape), jnp.float32)
    cb = jnp.asarray(rng.normal(size=blank_o.shape), jnp.float32)

    def total_k(*args):
      red, blank = sharded_scan.frame_reduce(*args, 8, True)
      return jnp.sum(red * cr) + jnp.sum(blank * cb)

    def total_o(*args):
      red, blank = oracle(*args)
      return jnp.sum(red * cr) + jnp.sum(blank * cb)

    gk = jax.grad(total_k, argnums=tuple(range(7)))(vec, pf, pc, vw, vb,
                                                    bw, bb)
    go = jax.grad(total_o, argnums=tuple(range(7)))(vec, pf, pc, vw, vb,
                                                    bw, bb)
    for a, b in zip(gk, go):
      # d vec at -inf states is 0 on the kernel path; the oracle emits
      # NaN-free zeros there too because every red column is finite.
      npt.assert_allclose(a, b, rtol=2e-4, atol=1e-5)

  @pytest.mark.parametrize('max_expansions,locally_normalized', [
      (0, False),
      (1, False),
      # Locally normalized: the numerator-only route (tp_lattice_loss
      # gathers the head for the string forward; no sharded denominator).
      (1, True),
  ])
  def test_tp_train_step_matches_single_device(self, eight_devices,
                                               max_expansions,
                                               locally_normalized):
    """Vocab-sharded (dp x tp) kernel train step == unsharded XLA step."""
    config = gnat.GNATConfig(
        feature_size=8,
        vocab_size=256,  # local shard 128 per model-axis device
        context_size=1,
        encoder_size=16,
        encoder_layers=1,
        encoder_heads=2,
        encoder_ffn_size=32,
        hidden_size=16,
        embedding_size=16,
        max_expansions=max_expansions,
        locally_normalized=locally_normalized)
    model = gnat.GNATModel(config)
    model.lattice.fused = 'never'  # single-device baseline path
    # SGD, not Adam: updates stay proportional to gradients, so parameter
    # equality is gradient equality. (Adam normalizes by second moments,
    # which turns structurally-zero gradients — e.g. blank_b under
    # FrameLabelDependent, where numerator and denominator blank counts
    # cancel exactly — into noise-sign updates.)
    import optax
    optimizer = optax.sgd(1e-2)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(rng.normal(size=(4, 6, 8)), jnp.float32)
    num_frames = jnp.array([6, 4, 5, 6], jnp.int32)
    labels = jnp.asarray(rng.integers(1, 257, size=(4, 3)), jnp.int32)
    num_labels = jnp.array([3, 2, 3, 1], jnp.int32)

    state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    single_state, loss_single = gnat.train_step(
        model, optimizer, state0, frames, num_frames, labels, num_labels)

    mesh = sharding.make_mesh(model_parallel=2)
    step_fn, shard_state = sharding.make_tp_train_step(
        model, optimizer, mesh, interpret=True)
    state = shard_state(
        gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer))
    batch = [
        jax.device_put(x, sharding.batch_shardings(mesh))
        for x in (frames, num_frames, labels, num_labels)
    ]
    new_state, loss_tp = step_fn(state, *batch)
    assert int(new_state.step) == 1
    npt.assert_allclose(float(loss_tp), float(loss_single), rtol=1e-5)
    # AdamW normalizes by second moments, amplifying float-roundoff
    # gradient differences on near-zero entries — hence the looser bound.
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.device_get(new_state.params),
        jax.device_get(single_state.params))

  def test_tp_supported_gating(self):
    import last_torch_tpu
    from last_torch_tpu import alignments, contexts, weight_fns
    from last_torch_tpu.ops import sharded_scan

    def make(context, weight_fn_factory):
      return last_torch_tpu.RecognitionLattice(
          context=context,
          alignment=alignments.FrameDependent(),
          weight_fn_cacher_factory=lambda ctx: weight_fns.NullCacher(),
          weight_fn_factory=weight_fn_factory)

    bigram = contexts.FullNGram(vocab_size=4, context_size=1)
    trigram = contexts.FullNGram(vocab_size=4, context_size=2)
    joint = lambda ctx: weight_fns.JointWeightFn(vocab_size=4,
                                                 hidden_size=8)
    assert sharded_scan.tp_supported(make(bigram, joint))
    assert not sharded_scan.tp_supported(make(trigram, joint))
    table = lambda ctx: weight_fns.TableWeightFn(jnp.zeros((2, 3, 5, 5)))
    assert not sharded_scan.tp_supported(make(bigram, table))
    # Locally normalized: numerator-only, always coverable.
    local = lambda ctx: weight_fns.LocallyNormalizedWeightFn(joint(ctx))
    assert sharded_scan.tp_supported(make(bigram, local))


class TestSeqTensorParallel:
  """seq x tp composition: frames time-sharded over 'seq' while the
  vocab head shards over 'model' in the same lattice loss."""

  def _model(self, **overrides):
    config = gnat.GNATConfig(
        feature_size=8,
        vocab_size=256,  # local shard 128 per model-axis device
        context_size=1,
        encoder_size=16,
        encoder_layers=1,
        encoder_heads=2,
        encoder_ffn_size=32,
        hidden_size=16,
        embedding_size=16,
        max_expansions=overrides.pop('max_expansions', 0),
        locally_normalized=overrides.pop('locally_normalized', False))
    return gnat.GNATModel(config)

  def _batch(self, batch=2, max_t=8):
    rng = np.random.default_rng(3)
    frames = jnp.asarray(rng.normal(size=(batch, max_t, 8)), jnp.float32)
    num_frames = jnp.asarray(
        rng.integers(3, max_t + 1, size=(batch,)), jnp.int32)
    labels = jnp.asarray(rng.integers(1, 257, size=(batch, 2)), jnp.int32)
    num_labels = jnp.asarray([2, 1], jnp.int32)[:batch]
    return frames, num_frames, labels, num_labels

  def _mesh(self, seq=4, model=2):
    return jax.sharding.Mesh(
        np.array(jax.devices()[:seq * model]).reshape(seq, model),
        axis_names=('seq', 'model'))

  @pytest.mark.parametrize('max_expansions', [0, 1])
  def test_loss_and_grads_match_single_device(self, eight_devices,
                                              max_expansions):
    from last_torch_tpu.parallel import sequence
    model = self._model(max_expansions=max_expansions)
    model.lattice.fused = 'never'  # single-device baseline path
    lattice = model.lattice
    params = model.init(jax.random.PRNGKey(0))['lattice']
    frames, num_frames, labels, num_labels = self._batch()
    # Lattice-level frames (already "encoded"): use the right width.
    frames = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 8, 16)), jnp.float32)
    mesh = self._mesh()

    def single(params):
      return jnp.sum(lattice(params, frames=frames, num_frames=num_frames,
                             labels=labels, num_labels=num_labels))

    def sharded(params):
      return jnp.sum(sequence.tp_loss_time_sharded(
          lattice, params, frames, num_frames, labels, num_labels, mesh,
          'seq', 'model', interpret=True))

    npt.assert_allclose(sharded(params), single(params), rtol=1e-5)
    g1 = jax.grad(single)(params)
    g2 = jax.grad(sharded)(params)
    scale = max(float(jnp.max(jnp.abs(leaf)))
                for leaf in jax.tree.leaves(g1))
    jax.tree.map(
        lambda a, b: npt.assert_allclose(a, b, rtol=1e-4,
                                         atol=1e-6 * max(scale, 1.0)),
        g1, g2)

  def test_train_step_matches_single_device(self, eight_devices):
    import optax
    from last_torch_tpu.parallel import sequence
    model = self._model()
    model.lattice.fused = 'never'
    optimizer = optax.sgd(1e-2)
    batch = self._batch()
    state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    ref_state, ref_loss = gnat.train_step(model, optimizer, state0, *batch)

    mesh = self._mesh()
    step = sequence.make_tp_seq_train_step(model, optimizer, mesh,
                                           interpret=True)
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    new_state, loss = step(state, *batch)
    assert int(new_state.step) == 1
    npt.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(np.asarray(a), np.asarray(b),
                                         rtol=1e-4, atol=1e-6),
        jax.device_get(new_state.params), jax.device_get(ref_state.params))

  def test_unsupported_lattice_raises(self, eight_devices):
    from last_torch_tpu.parallel import sequence
    model = gnat.GNATModel(tiny_config(context_size=2,
                                       locally_normalized=False))
    mesh = self._mesh()
    batch = tiny_batch(batch=2, max_t=8)
    with pytest.raises(ValueError, match='tensor-parallel'):
      sequence.tp_loss_time_sharded(
          model.lattice, model.init(jax.random.PRNGKey(0))['lattice'],
          *batch, mesh, 'seq', 'model', interpret=True)


class TestPipelineParallel:
  """GPipe pipeline over encoder blocks (parallel/pipeline.py)."""

  def _model(self, layers=4, **overrides):
    return gnat.GNATModel(tiny_config(encoder_layers=layers, **overrides))

  def _batch(self, batch=4, max_t=6, max_u=3, vocab=4):
    frames, _, labels, _ = tiny_batch(batch=batch, max_t=max_t,
                                      max_u=max_u, vocab=vocab)
    rng = np.random.default_rng(7)
    labels = jnp.asarray(
        rng.integers(1, vocab + 1, size=(batch, max_u)), jnp.int32)
    num_frames = jnp.asarray(
        rng.integers(max_u + 1, max_t + 1, size=(batch,)), jnp.int32)
    num_labels = jnp.asarray(
        rng.integers(1, max_u + 1, size=(batch,)), jnp.int32)
    return frames, num_frames, labels, num_labels

  def test_stack_unstack_roundtrip(self):
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4)
    params = model.init(jax.random.PRNGKey(0))
    stacked = pipeline.stack_layers(params['encoder']['layers'])
    assert stacked['qkv'].shape[0] == 4
    back = pipeline.unstack_layers(stacked, 4)
    for orig, got in zip(params['encoder']['layers'], back):
      jax.tree.map(npt.assert_array_equal, orig, got)

  @pytest.mark.parametrize('num_microbatches', [1, 2])
  @pytest.mark.parametrize('locally_normalized', [True, False])
  def test_pp_loss_matches_single_device(self, eight_devices,
                                         num_microbatches,
                                         locally_normalized):
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4, locally_normalized=locally_normalized)
    params = model.init(jax.random.PRNGKey(0))
    batch = self._batch(batch=4)
    mesh = pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=4)
    loss_fn = pipeline.make_pp_loss_fn(
        model, mesh, num_microbatches, data_axis='data')
    ref = model.mean_loss(params, *batch)
    got = loss_fn(params, *batch)
    npt.assert_allclose(float(got), float(ref), rtol=1e-5)

  def test_pp_pipe_only_mesh(self, eight_devices):
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=2)
    params = model.init(jax.random.PRNGKey(0))
    batch = self._batch(batch=4)
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:2]), ('pipe',))
    loss_fn = pipeline.make_pp_loss_fn(model, mesh, 2)
    npt.assert_allclose(float(loss_fn(params, *batch)),
                        float(model.mean_loss(params, *batch)), rtol=1e-5)

  def test_pp_conformer_blocks(self, eight_devices):
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4, encoder_causal=True, encoder_window=3,
                        encoder_conv_kernel=2)
    params = model.init(jax.random.PRNGKey(0))
    batch = self._batch(batch=2)
    mesh = pipeline.make_pp_mesh(num_devices=4, pipeline_parallel=2)
    loss_fn = pipeline.make_pp_loss_fn(model, mesh, 1, data_axis='data')
    npt.assert_allclose(float(loss_fn(params, *batch)),
                        float(model.mean_loss(params, *batch)), rtol=1e-5)

  def test_pp_grads_match_single_device(self, eight_devices):
    """Autodiff through the pipeline == plain autodiff of mean_loss."""
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4)
    params = model.init(jax.random.PRNGKey(0))
    batch = self._batch(batch=4)
    mesh = pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=4)
    loss_fn = pipeline.make_pp_loss_fn(model, mesh, 2, data_axis='data')
    ref_grads = jax.grad(model.mean_loss)(params, *batch)
    got_grads = jax.grad(loss_fn)(params, *batch)
    scale = max(float(jnp.max(jnp.abs(leaf)))
                for leaf in jax.tree.leaves(ref_grads))

    def check(a, b):
      npt.assert_allclose(np.asarray(a), np.asarray(b),
                          atol=1e-6 * max(scale, 1.0), rtol=1e-4)

    jax.tree.map(check, got_grads, ref_grads)

  def test_pp_train_step_matches_single_device(self, eight_devices):
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4)
    optimizer = gnat.make_optimizer(learning_rate=1e-2)
    batch = self._batch(batch=4)
    state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    ref_state, ref_loss = gnat.train_step(model, optimizer, state0, *batch)

    mesh = pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=4)
    step = pipeline.make_pp_train_step(model, optimizer, mesh, 2,
                                       data_axis='data')
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    new_state, loss = step(state, *batch)
    assert int(new_state.step) == 1
    npt.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(np.asarray(a), np.asarray(b),
                                         atol=1e-5, rtol=1e-4),
        new_state.params, ref_state.params)

  def test_pp_encode_matches_plain_encoder(self, eight_devices):
    """The pipelined encode == encoder.apply (values and gradients)."""
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4)
    params = model.init(jax.random.PRNGKey(0))
    frames, num_frames, _, _ = self._batch(batch=4)
    mesh = pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=4)
    encode = pipeline.make_pp_encode_fn(model, mesh, 2, data_axis='data')
    ref = model.encoder.apply(params['encoder'], frames, num_frames)
    got = encode(params['encoder'], frames, num_frames)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                        atol=1e-6)

    def total_ref(p):
      return jnp.sum(jnp.tanh(
          model.encoder.apply(p, frames, num_frames)))

    def total_pp(p):
      return jnp.sum(jnp.tanh(encode(p, frames, num_frames)))

    g_ref = jax.grad(total_ref)(params['encoder'])
    g_pp = jax.grad(total_pp)(params['encoder'])
    jax.tree.map(
        lambda a, b: npt.assert_allclose(np.asarray(a), np.asarray(b),
                                         rtol=1e-4, atol=1e-6),
        g_pp, g_ref)

  def test_pp_seq_train_step_matches_single_device(self, eight_devices):
    """pp x seq: pipelined encoder + time-sharded lattice loss == the
    plain single-device train step (loss and updated parameters)."""
    import optax
    from last_torch_tpu.parallel import pipeline
    model = self._model(layers=4)
    optimizer = optax.sgd(1e-2)
    frames, num_frames, labels, num_labels = self._batch(batch=4, max_t=8)
    state0 = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    ref_state, ref_loss = gnat.train_step(
        model, optimizer, state0, frames, num_frames, labels, num_labels)

    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[:8]).reshape(2, 4),
        axis_names=('pipe', 'seq'))
    step = pipeline.make_pp_seq_train_step(model, optimizer, mesh, 2)
    state = gnat.init_train_state(model, jax.random.PRNGKey(0), optimizer)
    new_state, loss = step(state, frames, num_frames, labels, num_labels)
    assert int(new_state.step) == 1
    npt.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree.map(
        lambda a, b: npt.assert_allclose(np.asarray(a), np.asarray(b),
                                         rtol=1e-4, atol=1e-5),
        jax.device_get(new_state.params), jax.device_get(ref_state.params))

  def test_pp_error_paths(self, eight_devices):
    from last_torch_tpu.parallel import pipeline
    mesh = pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=4)
    model = self._model(layers=3)  # 3 layers over 4 stages
    with pytest.raises(ValueError, match='divide across'):
      pipeline.make_pp_loss_fn(model, mesh, 2, data_axis='data')
    model = self._model(layers=4)
    loss_fn = pipeline.make_pp_loss_fn(model, mesh, 2, data_axis='data')
    params = model.init(jax.random.PRNGKey(0))
    batch = self._batch(batch=2)  # not divisible by data(2) x M(2)
    with pytest.raises(ValueError, match='must divide'):
      loss_fn(params, *batch)
    with pytest.raises(ValueError, match='must divide'):
      pipeline.make_pp_mesh(num_devices=8, pipeline_parallel=3)
