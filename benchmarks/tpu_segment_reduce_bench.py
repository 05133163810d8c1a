"""NextStateTable.forward_reduce: segment route vs dense mask on TPU.

The dense one-hot routing mask is O(S^2 * V); the sorted segment reduce
(contexts.NextStateTable._reduce_plan) is O(S * max_in_degree). This
bench pins the crossover on a 1k+-state DFA (trigram V=32 densified:
S = 1057, A = 33,824 arcs) — the quadratic is gone.

Usage: python benchmarks/tpu_segment_reduce_bench.py

Results (v5e, recorded 2026-08-17, round 3):
  S=1057 V=32 B=8: segment 0.65 ms vs dense mask 1.86 ms (2.9x);
  bit-exact vs the FullNGram block reduce.
"""

import sys
import time

import jax

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, '/root/repo')

from last_torch_tpu import contexts, semirings  # noqa: E402


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  ngram = contexts.FullNGram(vocab_size=32, context_size=2)
  table = contexts.NextStateTable(ngram.next_state_table())
  num_states, vocab = table.shape()
  batch = 8
  rng = np.random.default_rng(0)
  weights = jnp.asarray(
      rng.normal(size=(batch, num_states, vocab)), jnp.float32)

  iters = 50  # amortize the ~30 ms tunnel RTT inside one jit

  def run(route):
    def one(w):
      if route == 'dense':
        num_arcs = num_states * vocab
        onehot = table.next_state_table.reshape(num_arcs, 1) == jnp.arange(
            num_states)
        flat = w.reshape(batch, num_arcs, 1)
        masked = jnp.where(onehot, flat, float('-inf'))
        return semirings.Log.sum(masked, axis=-2)
      return table.forward_reduce(w, semirings.Log)

    def f(w):
      def body(c, _):
        # Feed the output back so iterations cannot be elided.
        r = one(w + 1e-9 * c[..., None, None] * 0.0)
        return jnp.max(r, axis=-1), None
      c0 = jnp.zeros((batch,), jnp.float32)
      (c, _) = jax.lax.scan(body, c0, None, length=iters)
      return jnp.sum(c[0])

    fn = jax.jit(f)
    # .item() forces execution; block_until_ready is unreliable over the
    # tunneled backend (bench.py `_force` diagnosis).
    fn(weights).item()
    times = []
    for _ in range(3):
      t0 = time.monotonic()
      fn(weights).item()
      times.append(time.monotonic() - t0)
    return float(np.median(times)) * 1e3 / iters

  seg_ms = run('segment')
  dense_ms = run('dense')
  print(f'NextStateTable.forward_reduce S={num_states} V={vocab} B={batch}:')
  print(f'  segment route: {seg_ms:.2f} ms   dense mask: {dense_ms:.2f} ms '
        f'({dense_ms / seg_ms:.1f}x)')
  # Equality sanity on the same inputs. State 0 (the start state) has no
  # incoming arcs, so both routes hold -inf there — compare finite
  # entries and require the -inf patterns to match.
  a = table.forward_reduce(weights, semirings.Log)
  ngram_ref = ngram.forward_reduce(weights, semirings.Log)
  both_neginf = jnp.isneginf(a) & jnp.isneginf(ngram_ref)
  assert bool(jnp.all(jnp.isneginf(a) == jnp.isneginf(ngram_ref)))
  err = float(jnp.max(jnp.where(both_neginf, 0.0, jnp.abs(a - ngram_ref))))
  print(f'  max abs err vs FullNGram block reduce: {err:.2e}')
  assert err < 1e-3, err


if __name__ == '__main__':
  main()
