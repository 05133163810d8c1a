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

"""last_torch_tpu: a TPU-native lattice-based speech transducer framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``theadamsabra/last_torch`` (GNAT — Globally Normalized Autoregressive
Transducers, arXiv 2205.13674): sequence losses (locally and globally
normalized) and Viterbi decoding over recognition lattices formed by the
on-the-fly intersection of a time-synchronous alignment lattice, a
context-dependency DFA, and neural arc weights.
"""

from last_torch_tpu import alignments
from last_torch_tpu import contexts
from last_torch_tpu import risk
from last_torch_tpu import semirings
from last_torch_tpu import streaming
from last_torch_tpu import weight_fns
from last_torch_tpu.lattices import RecognitionLattice

__version__ = '0.1.0'
