"""Per-task checkpoint / resume via Orbax.

The reference has only a vestigial ``save_checkpoint`` that is never called and
no resume path at all (reference ``models/base.py:62-68``, SURVEY.md §5). This
is a real capability upgrade: after every task the learner's trainable params,
prototype banks, evolution state, distance matrix, rehearsal memory indices, RNG
key, and the accuracy curves are persisted; ``restore_latest`` resumes the task
loop mid-sequence.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class TaskCheckpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.PyTreeCheckpointer()

    def _path(self, task: int) -> str:
        return os.path.join(self.directory, f"task_{task}")

    def save(self, task: int, model, curves: Dict[str, List[float]],
             nme_curves: Optional[Dict[str, List[float]]] = None) -> None:
        state = {
            "task": np.asarray(task),
            "known_classes": np.asarray(model._known_classes),
            "total_classes": np.asarray(model._total_classes),
            "curves": {k: np.asarray(v) for k, v in curves.items()},
            "rng": np.asarray(getattr(model, "_rng", jax.random.PRNGKey(0))),
        }
        if nme_curves is not None and any(len(v) for v in nme_curves.values()):
            state["nme_curves"] = {k: np.asarray(v) for k, v in nme_curves.items()}
        if getattr(model, "trainable", None) is not None:
            state["trainable"] = model.trainable
            state["aux"] = model.aux
            state["buffers"] = model.buffers._asdict()
            state["state_distance"] = np.asarray(model.state_distance.distance_factors)
        if getattr(model, "_evo_projectors", None) is not None:
            # fix-mode lifecycle projectors (scaled by integrate_with_state_distance)
            state["evo_projectors"] = model._evo_projectors
        if getattr(model, "fc", None) is not None:
            state["fc"] = model.fc
        if len(model._data_memory):
            state["memory"] = {
                "data": np.asarray(model._data_memory),
                "targets": np.asarray(model._targets_memory),
                "stages": np.asarray(model._stages_memory),
            }
        path = self._path(task)
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, state)
        logging.info("checkpoint saved: %s", path)

    def latest_task(self) -> Optional[int]:
        tasks = []
        for name in os.listdir(self.directory):
            if name.startswith("task_"):
                try:
                    tasks.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(tasks) if tasks else None

    def restore_latest(self, model, curves: Dict[str, List[float]],
                       nme_curves: Optional[Dict[str, List[float]]] = None
                       ) -> Optional[int]:
        task = self.latest_task()
        if task is None:
            return None
        state = self._ckptr.restore(self._path(task))
        model._cur_task = int(state["task"])
        model._known_classes = int(state["total_classes"])  # after_task already ran
        model._total_classes = int(state["total_classes"])
        for k, v in state.get("curves", {}).items():
            curves[k] = list(np.asarray(v))
        if nme_curves is not None:
            for k, v in (state.get("nme_curves") or {}).items():
                nme_curves[k] = list(np.asarray(v))
        if "trainable" in state:
            from team_tpu.learners.proof_net import ProofBuffers

            model.trainable = jax.tree_util.tree_map(jnp.asarray, state["trainable"])
            model.aux = jax.tree_util.tree_map(jnp.asarray, state["aux"])
            model.buffers = ProofBuffers(**{
                k: jnp.asarray(v) for k, v in state["buffers"].items()
            })
            model.state_distance.distance_factors = jnp.asarray(state["state_distance"])
        if "evo_projectors" in state:
            model._evo_projectors = jax.tree_util.tree_map(
                jnp.asarray, state["evo_projectors"])
        if "fc" in state:
            model.fc = jax.tree_util.tree_map(jnp.asarray, state["fc"])
        if "memory" in state:
            model._data_memory = np.asarray(state["memory"]["data"])
            model._targets_memory = np.asarray(state["memory"]["targets"])
            model._stages_memory = np.asarray(state["memory"]["stages"])
        if "rng" in state:
            model._rng = jnp.asarray(state["rng"], dtype=jnp.uint32)
        return task
