"""Captures a device profile of the factorized S=1 loss fwd+bwd.

Writes a jax.profiler trace of 10 chained iterations of the ctc-like
full loss gradient (B=32 T=1600 U=100 V=1024 h=512, bf16) to
/tmp/s1_trace, then prints the top device ops by total time parsed from
the xplane proto (best effort; falls back to listing the trace files).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/tpu_s1_trace.py
"""

import glob

import jax
jax.config.update('jax_compilation_cache_dir', '.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
import jax.numpy as jnp
import numpy as np

import last_torch_tpu
from last_torch_tpu import alignments, contexts, weight_fns
from benchmarks import chained_timer

B, T, U, V, H = 32, 1600, 100, 1024, 512


def main():
  rng = np.random.default_rng(0)
  lat = last_torch_tpu.RecognitionLattice(
      context=contexts.FullNGram(vocab_size=V, context_size=0),
      alignment=alignments.FrameLabelDependent(max_expansions=2),
      weight_fn_cacher_factory=lambda ctx: weight_fns.SharedEmbCacher(
          num_context_states=ctx.shape()[0], embedding_size=H),
      weight_fn_factory=lambda ctx: weight_fns.JointWeightFn(
          vocab_size=V, hidden_size=H, compute_dtype=jnp.bfloat16))
  params = lat.init(jax.random.PRNGKey(0), feature_size=H)
  frames = jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32)
  num_frames = jnp.full((B,), T, jnp.int32)
  labels = jnp.asarray(rng.integers(1, V + 1, size=(B, U)), jnp.int32)
  num_labels = jnp.full((B,), U, jnp.int32)

  def step(eps, p, f, nf, lbl, nl):
    def loss(p_, f_):
      return jnp.sum(lat.loss(p_, f_, nf, lbl, nl))
    v, g = jax.value_and_grad(loss, argnums=(0, 1))(p, f + eps)
    return v + chained_timer.gsum(g)

  many = chained_timer.chain(step, 10)
  args = (params, frames, num_frames, labels, num_labels)
  float(many(*args))  # compile + warm
  with jax.profiler.trace('/tmp/s1_trace'):
    float(many(*args))
  print('trace written')

  files = glob.glob('/tmp/s1_trace/**/*.xplane.pb', recursive=True)
  print('xplane files:', files)
  try:
    from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
  except Exception:
    pass
  try:
    # Best-effort: use the xprof/tensorboard pb parser if available.
    from xprof.convert import raw_to_tool_data  # type: ignore
    for f in files:
      data, _ = raw_to_tool_data.xspace_to_tool_data([f], 'op_profile', {})
      print(data[:4000])
  except Exception as e:  # pragma: no cover
    print('no xplane parser available here:', e)


if __name__ == '__main__':
  main()
