"""Checkpoint store with the reference's best/latest model identities.

Reference counterpart: whole-Keras .h5 files under sp_models/ with
monotonic names model_<N>.h5 (train.py:29-31), best_model.h5 as the
gating pointer (evaluator.py:66-80, model.py:119-121,147-157), latest =
max-index scan (model.py:125-144).

Here a checkpoint is params + batch_stats + optimizer state + step
serialized with flax msgpack, with 'best'/'latest' as metadata pointers
in a JSON index — and unlike the reference, the replay window and RNG
state can be checkpointed alongside (SURVEY.md §5 checkpoint/resume
gap).
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


class CheckpointStore:
    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self._index_path = os.path.join(model_dir, "index.json")

    # --- naming (reference model_<N> scheme) ---------------------------

    def latest_name(self) -> Optional[str]:
        """Max-index scan, reference model.py:125-144."""
        best = None
        index = -1
        for fn in os.listdir(self.model_dir):
            m = re.fullmatch(r"(model_(\d+))\.msgpack", fn)
            if m and int(m.group(2)) > index:
                index = int(m.group(2))
                best = m.group(1)
        return best

    def next_name(self) -> str:
        """Reference train.py:29-31: increment the latest index."""
        latest = self.latest_name()
        n = int(latest.split("_")[-1]) + 1 if latest else 1
        return f"model_{n}"

    def best_name(self) -> Optional[str]:
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                return json.load(f).get("best")
        return None

    def set_best(self, name: str) -> None:
        """Promotion (reference elect_model_as_best_model evaluator.py:18-21)."""
        idx = {}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                idx = json.load(f)
        idx["best"] = name
        with open(self._index_path, "w") as f:
            json.dump(idx, f)

    # --- state io -------------------------------------------------------

    def _path(self, name: str) -> str:
        return os.path.join(self.model_dir, f"{name}.msgpack")

    def save_state(self, name: str, state) -> None:
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        with open(self._path(name), "wb") as f:
            f.write(serialization.to_bytes(payload))

    def load_state(self, name: str, template) -> Any:
        """Restore into a TrainState-shaped template (same net/optimizer)."""
        payload = {
            "params": template.params,
            "batch_stats": template.batch_stats,
            "opt_state": template.opt_state,
            "step": np.asarray(template.step),
        }
        with open(self._path(name), "rb") as f:
            restored = serialization.from_bytes(payload, f.read())
        return type(template)(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )

    def load_variables(self, name: str, template) -> Dict:
        """Just the network variables (for inference/eval workers)."""
        state = self.load_state(name, template)
        return {"params": state.params, "batch_stats": state.batch_stats}

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
