"""Same-process A/B of trigram-kernel variants (no XLA baseline).

The full probe (tpu_trigram_probe.py) re-times the XLA scan path, whose
compile alone costs 400-776 s over the tunnel. For kernel-vs-kernel
decisions (the BATCHED_TRANSPOSE / FOLD_BLANK flags) only the fused
kernels need compiling (~10-25 s each), and the same-process discipline
still removes tunnel drift between the variants. The flag's DEFAULT
setting runs first and last so the drift across the session is visible
in the output.

Usage: python benchmarks/tpu_trigram_kernel_ab.py [FLAG]
  FLAG: a boolean module flag of trigram_scan (default FOLD_BLANK).

Results (v5e, probe config V=64 S=4161 B=8 T=200 h=512 bf16):
  BATCHED_TRANSPOSE (2026-08-19): a wash — batched 92.4 ms vs
    unbatched 91.8/91.8 ms; flag stays OFF.
  FOLD_BLANK (2026-08-19): a win — folded 88.2/89.2 ms vs unfolded
    96.5 ms = 1.09x (identical losses); flag stays ON. The separate
    blank matvec's 1-wide MXU output costs the same tile passes as the
    128-wide lex matmul, so folding it into the spare lex lane removes
    half of pass A's MXU time whenever v_pad > vocab.
  STREAM_EXPANSIONS (2026-08-19): a win — streamed 75.7/76.9 ms vs
    in-kernel sweeps 87.0 ms = 1.15x (identical losses); flag stays
    ON. The forward streams its expansion alphas sweep^1..sweep^k to
    an extra [T, k*N, SEG] output (~660 KB/frame HBM at this config)
    and the backward reads them instead of re-deriving them with k
    full-E sweeps per frame. Stacked with FOLD_BLANK the kernel is at
    ~1.70x the round-5 XLA baseline (128.7 ms).
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
from last_torch_tpu.ops import trigram_scan  # noqa: E402


def main():
  if jax.default_backend() not in ('tpu', 'axon'):
    raise SystemExit(f'needs TPU hardware, got {jax.default_backend()}')
  flag = sys.argv[1] if len(sys.argv) > 1 else 'FOLD_BLANK'
  default = getattr(trigram_scan, flag)
  assert isinstance(default, bool), (flag, default)
  vocab, hidden, emb = 64, 512, 512
  batch, max_t, max_u = 8, 200, 20
  context = contexts.FullNGram(vocab_size=vocab, context_size=2)
  num_states = context.shape()[0]

  lattice = last_torch_tpu.RecognitionLattice(
      context=context,
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=num_states, embedding_size=emb),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden,
          compute_dtype=jnp.bfloat16),
      fused='auto')
  params = lattice.init(jax.random.PRNGKey(0), feature_size=hidden)
  rng = np.random.default_rng(1)
  frames = jnp.asarray(rng.normal(size=(batch, max_t, hidden)) * 0.5,
                       jnp.float32)
  num_frames = jnp.full((batch,), max_t, jnp.int32)
  labels = jnp.asarray(rng.integers(1, vocab + 1, size=(batch, max_u)),
                       jnp.int32)
  num_labels = jnp.full((batch,), max_u, jnp.int32)
  assert lattice.would_fuse(frames), 'trigram kernel did not gate in'

  def total_loss(params, frames):
    return jnp.sum(lattice(params, frames, num_frames, labels, num_labels))

  print(f'trigram kernel A/B [{flag}] V={vocab} S={num_states} B={batch} '
        f'T={max_t} hidden={hidden}', flush=True)
  results = {}
  variants = [(f'{flag}={default}', default),
              (f'{flag}={not default}', not default),
              (f'{flag}={default}-again', default)]
  for name, value in variants:
    setattr(trigram_scan, flag, value)
    fn = jax.jit(jax.value_and_grad(total_loss, argnums=(0, 1)))
    t0 = time.monotonic()
    val, _ = fn(params, frames)
    val = val.item()
    compile_s = time.monotonic() - t0
    times = []
    for _ in range(5):
      t0 = time.monotonic()
      fn(params, frames)[0].item()
      times.append(time.monotonic() - t0)
    ms = float(np.median(times)) * 1e3
    results[name] = (ms, val)
    print(f'{name:24s} fwd+bwd: {ms:7.1f} ms (compile {compile_s:.1f}s, '
          f'loss {val:.6f})', flush=True)
  setattr(trigram_scan, flag, default)
  base = min(results[f'{flag}={default}'][0],
             results[f'{flag}={default}-again'][0])
  alt = results[f'{flag}={not default}']
  print(f'{flag}={not default} vs default: {alt[0] / base:.3f} '
        f'(>1 means the non-default is slower)', flush=True)
  rel = abs(alt[1] - results[f'{flag}={default}'][1])
  assert rel <= 1e-4 * abs(results[f'{flag}={default}'][1]), (
      'variant losses diverge', results)


if __name__ == '__main__':
  main()
