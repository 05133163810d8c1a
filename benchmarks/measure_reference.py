"""Measures the PyTorch-CPU reference on the headline GNAT workload.

The reference (`theadamsabra/last_torch`) publishes no benchmark numbers
(BASELINE.md), so the baseline is generated: run the reference's
globally-normalized loss (Log-semiring `_forward` minus `_string_forward`)
forward+backward on the BASELINE.json config shapes (B=32, bigram context
with 1025 states, V=1024, JointWeightFn hidden 512) and record frames/sec.

Methodology caveats, recorded in the output JSON and quoted wherever the
headline multiplier is cited (BASELINE.md):

* T is reduced (default 4) because the reference's per-frame Python loop
  makes T=1600 take hours on CPU. To validate that frames/sec extrapolates,
  the script also measures a T-scaling table (T in {2, 4, 8}): per-frame
  cost is constant-or-growing in T (its scan concatenates alpha history),
  so small-T frames/sec is an upper bound — generous to the reference.
* The alignment matches the TPU headline: FrameLabelDependent(k=2), which
  does MORE work per frame than FrameDependent. A FrameDependent number is
  also recorded for comparison.
* The reference's backward crashes (SURVEY §2.2-Q3); fwd+bwd is estimated
  as 3x the measured forward (typical fwd:bwd is 1:2, again generous).

Writes benchmarks/reference_baseline.json, which bench.py reads for
vs_baseline.

Usage: python benchmarks/measure_reference.py [T]
"""

import json
import os
import sys
import time

sys.path.insert(0, '/root/reference')

import torch  # noqa: E402

import last_torch  # noqa: E402  (the reference package)


def build(alignment, vocab=1024, hidden=512):
  context = last_torch.contexts.FullNGram(vocab_size=vocab, context_size=1)
  lattice = last_torch.RecognitionLattice(
      context=context,
      alignment=alignment,
      weight_fn_cacher_factory=lambda ctx: last_torch.weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: last_torch.weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden))
  return lattice, context.shape()[0]


def measure(lattice, num_states, max_frames, batch=32, vocab=1024, emb=512,
            feature=512, max_labels=8, iters=2):
  """Returns (p50 fwd+bwd step seconds, note) at the given T."""
  torch.manual_seed(0)
  # The reference SharedEmbCacher returns an nn.Embedding module which its
  # own JointWeightFn cannot consume (SURVEY §2.2-Q2); pass the embedding
  # table directly as the cache, as JointWeightFn expects.
  cache = torch.randn(num_states, emb)
  frames = (0.1 * torch.randn(batch, max_frames, feature)).requires_grad_()
  num_frames = torch.full((batch,), float(max_frames))
  labels = torch.randint(1, vocab + 1, (batch, max_labels))
  num_labels = torch.full((batch,), float(max_labels))

  def forward():
    denominator, _ = lattice._forward(
        cache=cache, frames=frames, num_frames=num_frames,
        semiring=last_torch.semirings.Log)
    numerator = lattice._string_forward(
        cache=cache, frames=frames, num_frames=num_frames, labels=labels,
        num_labels=num_labels, semiring=last_torch.semirings.Log)
    return (denominator - numerator).sum()

  def step():
    loss = forward()
    if frames.grad is not None:
      frames.grad = None
    loss.backward()
    return float(loss.detach())

  # The reference's backward is broken (its _LogAddExp autograd Function
  # rejects the gradients of its own auxiliary outputs); if it crashes,
  # estimate the fwd+bwd step as 3x the forward time (the usual fwd:bwd
  # ratio is 1:2, so this is generous to the reference).
  note = 'measured full fwd+bwd'
  scale = 1.0
  try:
    step()
    timed = step
  except (TypeError, RuntimeError) as e:
    note = (f'reference backward crashes ({e}); step estimated as '
            '3x measured forward time')
    scale = 3.0

    def timed():
      with torch.no_grad():
        return float(forward())

    timed()

  times = []
  for _ in range(iters):
    t0 = time.perf_counter()
    timed()
    times.append(time.perf_counter() - t0)
  return sorted(times)[len(times) // 2] * scale, note


def main():
  headline_t = int(sys.argv[1]) if len(sys.argv) > 1 else 4
  batch = 32

  # Headline alignment (matches the TPU headline): FrameLabelDependent(2).
  fld, num_states = build(
      last_torch.alignments.FrameLabelDependent(max_expansions=2))
  scaling = {}
  for t in sorted({2, headline_t, 8}):
    p50, note = measure(fld, num_states, t, batch=batch)
    scaling[t] = {
        'p50_step_seconds': p50,
        'frames_per_sec': batch * t / p50,
    }
    print(f'FLD(2) T={t}: {p50:.2f}s/step, '
          f'{batch * t / p50:.2f} frames/s', flush=True)

  headline = scaling[headline_t]
  # Also record FrameDependent (the round-1 baseline alignment) at the
  # headline T for comparison.
  fd, _ = build(last_torch.alignments.FrameDependent())
  fd_p50, _ = measure(fd, num_states, headline_t, batch=batch)

  result = {
      'frames_per_sec': headline['frames_per_sec'],
      'p50_step_seconds': headline['p50_step_seconds'],
      't_scaling': {
          str(t): {k: round(v, 4) for k, v in row.items()}
          for t, row in scaling.items()
      },
      'frame_dependent_frames_per_sec': batch * headline_t / fd_p50,
      'config': {
          'batch': batch, 'max_frames': headline_t, 'vocab': 1024,
          'hidden': 512, 'num_context_states': num_states,
          'max_labels': 8,
          'alignment': 'FrameLabelDependent(max_expansions=2)',
          'note': ('torch CPU reference, globally-normalized loss fwd+bwd; '
                   'frames/sec extrapolates to T=1600. Caveats: (1) the '
                   't_scaling table shows per-frame cost is flat-or-growing '
                   'in T, so small-T frames/sec favors the reference; '
                   '(2) ' + note),
      },
  }
  out = os.path.join(os.path.dirname(__file__), 'reference_baseline.json')
  with open(out, 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
