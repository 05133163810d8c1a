"""Chained (RTT-cancelling) timing for tunnel-backed TPU benchmarks.

Every dispatch + scalar readback over the axon tunnel costs a ~30 ms
round trip, which dominates — and silently inflates — any sub-100 ms
measurement made call-by-call (round-4 discovery: a bare 1.3 ms matmul
grad "measured" 30.5 ms with the per-call pattern). These helpers run a
step once and ``n`` times inside single jits, iterations serialized
through a scalar carry (so XLA can neither CSE nor overlap them), and
report ``(t_n - t_1) / (n - 1)`` — cancelling the round trip and every
other per-dispatch constant.

The ``step(eps, *args) -> scalar`` contract:
  - fold ``eps`` into a float input (e.g. ``frames + eps``): it is
    numerically a no-op (1e-12 times a near-zero carry) but makes each
    iteration structurally depend on the previous one;
  - fold EVERY computed output into the returned scalar (an unused
    gradient leaf is dead code XLA will eliminate from the measurement).
"""

import time

import jax
import jax.numpy as jnp


def gsum(tree):
  """Sums every leaf into one f32 scalar (DCE guard for outputs)."""
  return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tree))


def chain(step, n):
  """Jits ``step(eps, *args)`` run ``n`` times, serialized through eps."""

  @jax.jit
  def run(*args):
    def body(_, acc):
      return acc + 1e-30 * step(1e-12 * acc, *args)

    return jax.lax.fori_loop(0, n, body, 0.0)

  return run


def measure(tag, step, *args, n=10, iters=3, quiet=False):
  """Prints and returns the per-iteration seconds of ``step``."""
  one, many = chain(step, 1), chain(step, n)
  float(one(*args))  # compile
  float(many(*args))
  t1s, tns = [], []
  for _ in range(iters):
    t0 = time.perf_counter()
    float(one(*args))
    t1s.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    float(many(*args))
    tns.append(time.perf_counter() - t0)
  t1 = sorted(t1s)[len(t1s) // 2]
  tn = sorted(tns)[len(tns) // 2]
  per = max(tn - t1, 0.0) / (n - 1)
  if not quiet:
    print(f'{tag}: {per * 1e3:.2f} ms/iter  '
          f'(t1 {t1 * 1e3:.1f} ms, t{n} {tn * 1e3:.1f} ms)', flush=True)
  return per
