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
