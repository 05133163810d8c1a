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

"""Checkpoint / resume for GNAT training state.

The reference has no training loop or persistence (SURVEY §5). Here the
training state is an explicit pytree, so checkpointing is a thin layer over
orbax: atomic per-step directories, restore-with-template, retention.
Works transparently for sharded (multi-host / multi-chip) arrays — orbax
records and restores shardings.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
  """Saves/restores training-state pytrees with retention.

  Example:
    mgr = CheckpointManager('/tmp/run1', max_to_keep=3)
    mgr.save(step, state)
    state = mgr.restore(template=state)  # latest
  """

  def __init__(self, directory: str, max_to_keep: int = 3):
    self._directory = os.path.abspath(directory)
    options = ocp.CheckpointManagerOptions(
        max_to_keep=max_to_keep, create=True)
    self._manager = ocp.CheckpointManager(self._directory, options=options)

  @property
  def directory(self) -> str:
    return self._directory

  def save(self, step: int, state: Any, wait: bool = True) -> None:
    """Saves the state pytree under the given step."""
    self._manager.save(int(step), args=ocp.args.StandardSave(state))
    if wait:
      self._manager.wait_until_finished()

  def latest_step(self) -> Optional[int]:
    return self._manager.latest_step()

  def all_steps(self):
    return list(self._manager.all_steps())

  def restore(self, template: Any, step: Optional[int] = None) -> Any:
    """Restores a state pytree shaped/sharded like ``template``.

    Args:
      template: A pytree with the target structure (e.g. a freshly
        initialized state); array shardings in the template are honored.
      step: Step to restore; latest if None.

    Returns:
      The restored pytree.
    """
    if step is None:
      step = self._manager.latest_step()
    if step is None:
      raise ValueError(f'No checkpoints found in {self._directory}')
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return self._manager.restore(
        int(step), args=ocp.args.StandardRestore(abstract))

  def close(self):
    self._manager.close()


def save_pytree(path: str, pytree: Any) -> None:
  """One-shot save of a pytree to a directory."""
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(os.path.abspath(path), pytree)
  ckptr.wait_until_finished()
  ckptr.close()


def restore_pytree(path: str, template: Any) -> Any:
  """One-shot restore of a pytree saved by ``save_pytree``."""
  ckptr = ocp.StandardCheckpointer()
  abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
  restored = ckptr.restore(os.path.abspath(path), abstract)
  ckptr.close()
  return restored
