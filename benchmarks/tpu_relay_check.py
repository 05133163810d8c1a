"""On-TPU hardware check of the time-sharded relay kernel chaining.

The relay (``parallel.sequence``) chains the fused kernel pair across
frame blocks via ``alpha0`` (forward) and ``beta0``/``beta_out``
(backward). CPU-mesh tests run the kernels in interpret mode only, and
Mosaic layout errors only appear on hardware — this script compiles both
modified backward kernels on the real chip and asserts that a manual
two-block chain reproduces the monolithic ``log_partition`` gradients
(same kernels, same dtype, so agreement should be near-bitwise; the
per-leaf max-normalized error is reported).

Usage: python benchmarks/tpu_relay_check.py

Results (v5e, recorded 2026-08-17, round 3):
  cache  mode (V=256,  T=32): logZ and d_frames BIT-identical; worst
    parameter-grad leaf 4.5e-5 of global gradient scale (context_proj —
    the one accumulator whose frame-sum is split across two kernels and
    recombined with one extra f32 add; pure rounding-order).
  online mode (V=2048, T=16): logZ and d_frames bit-identical; worst
    leaf 1.8e-5 of global scale.
  Note the per-leaf-normalized view reads 2.2e-3 on context_proj — the
  CLAUDE.md parity trap: normalize by the gradient's global scale.
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

import last_torch_tpu  # noqa: E402
from last_torch_tpu import alignments, contexts, weight_fns  # noqa: E402
from last_torch_tpu.ops import fused_scan  # noqa: E402


def build(vocab, hidden, emb, feature, seed=0):
  context = contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden))
  params = lattice.init(jax.random.PRNGKey(seed), feature_size=feature)
  cache = lattice.build_cache(params)
  return params['weight_fn'], cache


def check(mode, vocab, hidden, batch, max_t):
  feature = hidden
  wf, cache = build(vocab, hidden, hidden, feature)
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, feature)) * 0.5,
                       jnp.float32)
  nf = jnp.asarray(
      [max_t] + list(rng.integers(1, max_t, size=batch - 1)), jnp.int32)
  # Match log_partition's tile auto-tune exactly, so mono and chained
  # run bit-identical arithmetic (different tile shapes change bf16
  # reduction order and show up as ~0.2%-of-scale noise).
  s_tile, bwd_bt = fused_scan._bwd_tiles(
      mode, vocab + 1, fused_scan._round_up(vocab, 128), 128, 4)
  kw = dict(max_expansions=2, frame_dependent=False,
            num_context_states=vocab + 1, compute_dtype=jnp.bfloat16,
            mode=mode, s_tile=s_tile)

  @jax.jit
  def mono(wf, cache, frames):
    def f(wf, cache, frames):
      return jnp.sum(fused_scan.log_partition(wf, cache, frames, nf, **kw))
    val, grads = jax.value_and_grad(f, argnums=(0, 1, 2))(wf, cache,
                                                          frames)
    return val, grads

  t_half = max_t // 2

  @jax.jit
  def chained(wf, cache, frames):
    f0, f1 = frames[:, :t_half], frames[:, t_half:]
    nf0 = jnp.clip(nf, 0, t_half)
    nf1 = jnp.clip(nf - t_half, 0, t_half)
    _, h0, a_mid = fused_scan.fused_shortest_distance_fwd(
        wf, cache, f0, nf0, return_final_alpha=True, with_history=True,
        **kw)
    _, h1, a_t = fused_scan.fused_shortest_distance_fwd(
        wf, cache, f1, nf1, alpha0=a_mid, return_final_alpha=True,
        with_history=True, **kw)
    log_z = jax.scipy.special.logsumexp(a_t, axis=-1)
    g = jnp.ones_like(log_z)
    d1w, d1c, d1f, beta_mid = fused_scan.run_fused_backward(
        wf, cache, f1, nf1, log_z, g, h1, bwd_batch_tile=bwd_bt, **kw)
    d0w, d0c, d0f, _ = fused_scan.run_fused_backward(
        wf, cache, f0, nf0, log_z, g, h0, beta0=beta_mid,
        bwd_batch_tile=bwd_bt, **kw)
    d_wf = jax.tree.map(jnp.add, d0w, d1w)
    d_frames = jnp.concatenate([d0f, d1f], axis=1)
    return jnp.sum(log_z), (d_wf, d0c + d1c, d_frames)

  t0 = time.monotonic()
  v_m, g_m = jax.block_until_ready(mono(wf, cache, frames))
  t1 = time.monotonic()
  v_c, g_c = jax.block_until_ready(chained(wf, cache, frames))
  t2 = time.monotonic()

  assert np.isfinite(float(v_m)) and np.isfinite(float(v_c))
  rel_v = abs(float(v_m) - float(v_c)) / max(abs(float(v_m)), 1e-9)
  paths_m = jax.tree_util.tree_flatten_with_path(jax.device_get(g_m))[0]
  leaves_c = jax.tree.leaves(jax.device_get(g_c))
  global_scale = max(max(np.abs(b).max() for b in leaves_c), 1e-9)
  worst = 0.0
  for (path, a), b in zip(paths_m, leaves_c):
    per_leaf = float(np.abs(a - b).max() / max(np.abs(b).max(), 1e-9))
    vs_global = float(np.abs(a - b).max() / global_scale)
    print(f'  {jax.tree_util.keystr(path)}: per-leaf {per_leaf:.2e} '
          f'(leaf scale {np.abs(b).max():.3e}), vs-global {vs_global:.2e}',
          flush=True)
    worst = max(worst, vs_global)
  print(f'{mode}: V={vocab} T={max_t} logZ rel err {rel_v:.2e}, '
        f'worst grad leaf (global-scale-normalized) {worst:.2e} '
        f'(mono {t1 - t0:.1f}s, chained {t2 - t1:.1f}s incl compile)',
        flush=True)
  assert rel_v < 1e-5, rel_v
  assert worst < 1e-4, worst


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  check('cache', vocab=256, hidden=256, batch=4, max_t=32)
  check('online', vocab=2048, hidden=256, batch=4, max_t=16)
  print('TPU RELAY CHECK OK')


if __name__ == '__main__':
  main()
