# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0
#
# Unless required by applicable law or agreed to in writing, software
# distributed under the License is distributed on an "AS IS" BASIS,
# WITHOUT WARRANTIES OR CONDITIONS OF ANY KIND, either express or implied.
# See the License for the specific language governing permissions and
# limitations under the License.

"""Tracing / profiling helpers (SURVEY §5: absent in the reference).

Thin wrappers over ``jax.profiler`` for capturing XProf traces of lattice
steps, plus a simple wall-clock step timer that reports percentiles. The
lattice phases are annotated with ``jax.named_scope`` so traces show
cache-build / numerator / denominator / decode regions.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
  """Captures a profiler trace (viewable with XProf/TensorBoard).

  Example:
    with profiling.trace('/tmp/jax-trace'):
      jax.block_until_ready(step_fn(state, batch))
  """
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


named_scope = jax.named_scope


class StepTimer:
  """Wall-clock step timer with percentile reporting.

  Example:
    timer = StepTimer()
    for batch in data:
      with timer:
        jax.block_until_ready(step_fn(state, batch))
    print(timer.summary())
  """

  def __init__(self, skip_first: int = 1):
    self._times: list[float] = []
    self._skip = skip_first
    self._t0: Optional[float] = None

  def __enter__(self):
    self._t0 = time.perf_counter()
    return self

  def __exit__(self, *exc):
    elapsed = time.perf_counter() - self._t0
    if self._skip > 0:
      self._skip -= 1
    else:
      self._times.append(elapsed)
    return False

  @property
  def times(self) -> list[float]:
    return list(self._times)

  def percentile(self, q: float) -> float:
    if not self._times:
      return float('nan')
    return float(np.percentile(self._times, q))

  def summary(self) -> dict:
    return {
        'steps': len(self._times),
        'p50_ms': self.percentile(50) * 1e3,
        'p90_ms': self.percentile(90) * 1e3,
        'mean_ms': float(np.mean(self._times) * 1e3) if self._times else
                   float('nan'),
    }


def benchmark(fn: Callable, *args, iters: int = 5, warmup: int = 1) -> dict:
  """Times a jitted function: returns {'p50_ms', 'mean_ms', ...}."""
  timer = StepTimer(skip_first=0)
  for _ in range(warmup):
    jax.block_until_ready(fn(*args))
  for _ in range(iters):
    with timer:
      jax.block_until_ready(fn(*args))
  return timer.summary()
