"""On-TPU Mosaic compile + parity check for the TP frame_reduce kernels.

The vocab-sharded tensor-parallel path (``ops.sharded_scan``) runs its
``frame_reduce`` forward/backward kernel pair per device inside
``shard_map``; the CPU-mesh tests exercise them only in Pallas interpret
mode, and Mosaic layout errors only appear on hardware. This script
``pallas_call``s both kernels COMPILED on the real chip at shard-local
shapes (one device's S_pad x V_local slice — no mesh needed) and asserts
values and gradients against the XLA oracle.

Usage: python benchmarks/tpu_tp_kernel_check.py

Results (v5e, recorded 2026-08-17, round 3):
  S_pad=1152 V_local=128 h=512: f32 fwd rel err 4.5e-7, grad 3.5e-5;
    bf16 compiled pair grads within 6.6e-5 of global gradient scale.
  S_pad=4224 V_local=512 h=512: f32 fwd rel err 3.8e-7, grad 4.0e-5;
    bf16 pair within 7.7e-5 of global scale.
  First hardware compile of this pair surfaced a real Mosaic lowering
  bug: ambient jax_default_matmul_precision='highest' turned the bf16
  in-kernel dots into fp32-contract tpu.matmuls Mosaic rejects ("Bad
  lhs type") — fixed by pinning per-compute_dtype precision on every
  kernel dot (fused_scan._mxu_precision).
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
# Match the kernels' f32 accumulation in the XLA oracle.
jax.config.update('jax_default_matmul_precision', 'highest')

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from last_torch_tpu.ops import sharded_scan  # noqa: E402


def check(s_real, s_pad, v_local, hidden, batch=8):
  rng = np.random.default_rng(0)
  vec = jnp.asarray(rng.normal(size=(batch, s_pad)), jnp.float32)
  vec = vec.at[:, s_real:].set(float('-inf'))
  pf = jnp.asarray(rng.normal(size=(batch, hidden)), jnp.float32)
  pc = jnp.asarray(rng.normal(size=(s_pad, hidden)) * 0.3, jnp.float32)
  pc = pc.at[s_real:].set(0.0)
  vw = jnp.asarray(rng.normal(size=(hidden, v_local)) * 0.2, jnp.float32)
  vb = jnp.asarray(rng.normal(size=(v_local,)), jnp.float32)
  bw = jnp.asarray(rng.normal(size=(hidden,)), jnp.float32)
  bb = jnp.asarray(rng.normal(size=()), jnp.float32)
  cr = jnp.asarray(rng.normal(size=(batch, v_local)), jnp.float32)
  cb = jnp.asarray(rng.normal(size=(batch, s_pad)), jnp.float32)

  def oracle(vec, pf, pc, vw, vb, bw, bb):
    joint = jnp.tanh(pc[None] + pf[:, None])
    lex = joint @ vw + vb
    blank = joint @ bw[:, None] + bb
    red = jax.scipy.special.logsumexp(vec[:, :, None] + lex, axis=1)
    return red, blank[..., 0]

  def total(fn):
    def f(*args):
      red, blank = fn(*args)
      return jnp.sum(red * cr) + jnp.sum(blank * cb)
    return f

  # Exact comparison at in-kernel float32 (precision pinned in-kernel);
  # the ambient 'highest' only affects the XLA oracle.
  kernel_fn = lambda *a: sharded_scan.frame_reduce(*a, 8, False,
                                                   jnp.float32)
  args = (vec, pf, pc, vw, vb, bw, bb)

  t0 = time.monotonic()
  rk, bk = jax.block_until_ready(jax.jit(kernel_fn)(*args))
  t1 = time.monotonic()
  ro, bo = jax.block_until_ready(jax.jit(oracle)(*args))
  fwd_err = max(
      float(np.abs(np.asarray(rk - ro)).max() /
            max(np.abs(np.asarray(ro)).max(), 1e-9)),
      float(np.abs(np.asarray(bk - bo)).max() /
            max(np.abs(np.asarray(bo)).max(), 1e-9)))

  gk = jax.block_until_ready(
      jax.jit(jax.grad(total(kernel_fn), argnums=tuple(range(7))))(*args))
  t2 = time.monotonic()
  go = jax.jit(jax.grad(total(oracle), argnums=tuple(range(7))))(*args)
  grad_err = 0.0
  for a, b in zip(jax.device_get(gk), jax.device_get(go)):
    scale = max(np.abs(b).max(), 1e-9)
    grad_err = max(grad_err, float(np.abs(a - b).max() / scale))
  print(f'S_pad={s_pad} V_local={v_local} h={hidden}: '
        f'f32 fwd rel err {fwd_err:.1e}, grad rel err {grad_err:.1e} '
        f'(fwd compile+run {t1 - t0:.1f}s, bwd {t2 - t1:.1f}s)', flush=True)
  assert fwd_err < 1e-5, fwd_err
  assert grad_err < 1e-4, grad_err

  # Production bf16 path: compile + run both kernels, finite + coarse
  # agreement at the bf16 contract (global-gradient-scale normalized).
  bf16_fn = lambda *a: sharded_scan.frame_reduce(*a, 8, False)
  rb, bb16 = jax.block_until_ready(jax.jit(bf16_fn)(*args))
  assert np.all(np.isfinite(np.asarray(rb)))
  gb = jax.block_until_ready(
      jax.jit(jax.grad(total(bf16_fn), argnums=tuple(range(7))))(*args))
  leaves = [np.asarray(x) for x in jax.device_get(gb)]
  ref_leaves = [np.asarray(x) for x in jax.device_get(go)]
  gscale = max(np.abs(x).max() for x in ref_leaves)
  bf16_err = max(np.abs(a - b).max() / gscale
                 for a, b in zip(leaves, ref_leaves))
  print(f'  bf16 compiled pair: grads within {bf16_err:.1e} of global '
        f'scale', flush=True)
  assert bf16_err < 5e-3, bf16_err


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  # Headline-ish TP shard shapes: bigram V=1024 across 8 devices
  # (V_local=128, S_pad=round_up(1025,128)=1152) and V=4096 across 8
  # (V_local=512, S_pad=round_up(4097,128)).
  check(s_real=1025, s_pad=1152, v_local=128, hidden=512)
  check(s_real=4097, s_pad=4224, v_local=512, hidden=512)
  print('TPU TP KERNEL CHECK OK')


if __name__ == '__main__':
  main()
