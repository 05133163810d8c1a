"""Measures the PyTorch-CPU reference on the headline GNAT workload.

The reference (`theadamsabra/last_torch`) publishes no benchmark numbers
(BASELINE.md), so the baseline is generated: run the reference's
globally-normalized loss (Log-semiring `_forward` minus `_string_forward`)
forward+backward on the BASELINE.json config shapes (B=32, bigram context
with 1025 states, V=1024, JointWeightFn hidden 512) and record frames/sec.

T is reduced (default 4) because the reference's per-frame Python loop makes
T=1600 take hours on CPU; per-frame cost is constant-or-growing in T (its
scan concatenates alpha history), so extrapolating frames/sec from small T
is generous to the reference.

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


def main():
  max_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4
  batch, vocab, hidden, emb, feature = 32, 1024, 512, 512, 512
  max_labels = 8
  torch.manual_seed(0)

  context = last_torch.contexts.FullNGram(vocab_size=vocab, context_size=1)
  num_states, _ = context.shape()
  lattice = last_torch.RecognitionLattice(
      context=context,
      alignment=last_torch.alignments.FrameDependent(),
      weight_fn_cacher_factory=lambda ctx: last_torch.weight_fns.NullCacher(),
      weight_fn_factory=lambda ctx: last_torch.weight_fns.JointWeightFn(
          vocab_size=vocab, hidden_size=hidden))
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
  backward_note = 'measured full fwd+bwd'
  try:
    step()
    timed = step
  except TypeError as e:
    backward_note = (f'reference backward crashes ({e}); step estimated as '
                     '3x measured forward time')

    def timed():
      with torch.no_grad():
        return float(forward())

    timed()

  scale = 1.0 if timed is step else 3.0
  times = []
  for _ in range(2):
    t0 = time.perf_counter()
    timed()
    times.append(time.perf_counter() - t0)
  p50 = sorted(times)[len(times) // 2] * scale
  frames_per_sec = batch * max_frames / p50
  result = {
      'frames_per_sec': frames_per_sec,
      'p50_step_seconds': p50,
      'config': {
          'batch': batch, 'max_frames': max_frames, 'vocab': vocab,
          'hidden': hidden, 'num_context_states': num_states,
          'max_labels': max_labels,
          'note': ('torch CPU reference, globally-normalized loss fwd+bwd; '
                   'frames/sec extrapolates to T=1600 (per-frame cost is '
                   'constant or growing in T, so this favors the '
                   'reference). ' + backward_note),
      },
  }
  out = os.path.join(os.path.dirname(__file__), 'reference_baseline.json')
  with open(out, 'w') as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result))


if __name__ == '__main__':
  main()
