"""Backend quirk detection.

The experimental 'axon' PJRT tunnel (remote single-chip TPU access)
mis-executes programs whose input buffers are donated: the program
appears to complete (block_until_ready returns) but every output
buffer is poisoned and any device->host transfer raises
INVALID_ARGUMENT.  Donation is a pure optimization (in-place reuse of
the actor/train state buffers), so it is disabled on that backend.
"""
from __future__ import annotations

import functools


@functools.lru_cache(maxsize=1)
def donation_safe() -> bool:
    """False when running over the axon tunnel, True elsewhere."""
    import jax
    from jax._src import xla_bridge

    try:
        version = xla_bridge.get_backend().platform_version
    except Exception:  # noqa: BLE001 — uninitialised backend: assume safe
        return True
    return "axon" not in (version or "").lower()


def donate_argnums(*argnums):
    """`donate_argnums` kwargs for jax.jit, empty on unsafe backends."""
    return {"donate_argnums": argnums} if donation_safe() else {}


def enable_compilation_cache(path: str = "/root/.cache/sejonggo_jax") -> None:
    """Turn on JAX's persistent compilation cache.

    The 19x19 production programs take minutes of XLA compile time per
    shape; a process restart (or the axon tunnel dropping) re-pays all
    of it.  The on-disk cache makes every entry point resumable at the
    cost of a directory under ~/.cache.  Disable with
    SEJONGGO_NO_COMPILE_CACHE=1.
    """
    import os

    if os.environ.get("SEJONGGO_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass
