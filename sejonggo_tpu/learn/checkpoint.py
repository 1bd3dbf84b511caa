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
import logging
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger("sejonggo_tpu.checkpoint")


class CheckpointStore:
    def __init__(self, model_dir: str):
        self.model_dir = model_dir
        os.makedirs(model_dir, exist_ok=True)
        self._index_path = os.path.join(model_dir, "index.json")

    # --- naming (reference model_<N> scheme) ---------------------------

    def model_names(self) -> List[str]:
        """All model_<N> checkpoints, newest first, skipping obviously
        unreadable files (empty / vanished mid-scan)."""
        found = []
        for fn in os.listdir(self.model_dir):
            m = re.fullmatch(r"(model_(\d+))\.msgpack", fn)
            if not m:
                continue
            try:
                if os.path.getsize(os.path.join(self.model_dir, fn)) == 0:
                    logger.warning("skipping empty checkpoint %s", fn)
                    continue
            except OSError:
                continue
            found.append((int(m.group(2)), m.group(1)))
        return [name for _, name in sorted(found, reverse=True)]

    def latest_name(self) -> Optional[str]:
        """Max-index scan, reference model.py:125-144."""
        names = self.model_names()
        return names[0] if names else None

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
        """Atomic write (tmp + os.replace): a crash mid-save must never
        leave a torn model_<N>.msgpack that latest_name()/best would then
        serve forever (other deployment roles poll this directory)."""
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": np.asarray(state.step),
        }
        path = self._path(name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(serialization.to_bytes(payload))
        os.replace(tmp, path)

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

    def load_state_or_fallback(self, name: str, template) -> Any:
        """Load `name`; on failure (missing/torn file — e.g. a dangling
        best pointer or a checkpoint corrupted by a crash mid-write
        before saves were atomic) fall back to the newest loadable
        model with a loud warning instead of crashing the run.

        Reference posture: idempotent resume (selfplay_worker.py:84-90)
        — a wedged artifact must not brick every role polling the
        directory."""
        try:
            return self.load_state(name, template)
        except Exception as e:  # noqa: BLE001 — any parse/IO failure
            logger.error("checkpoint %r unreadable (%s); falling back to "
                         "newest loadable model", name, e)
            for cand in self.model_names():
                if cand == name:
                    continue
                try:
                    state = self.load_state(cand, template)
                except Exception as e2:  # noqa: BLE001
                    logger.error("checkpoint %r also unreadable (%s)",
                                 cand, e2)
                    continue
                logger.warning("serving %r in place of unreadable %r",
                               cand, name)
                return state
            raise

    def load_variables(self, name: str, template) -> Dict:
        """Just the network variables (for inference/eval workers)."""
        state = self.load_state(name, template)
        return {"params": state.params, "batch_stats": state.batch_stats}

    def exists(self, name: str) -> bool:
        return os.path.exists(self._path(name))
