"""Test harness configuration.

Forces JAX onto CPU with 8 virtual devices so multi-chip sharding paths
(mesh/pjit) are exercised without TPU hardware, standing in for pod
slices (the reference had no multi-node tests at all; SURVEY.md §4).
Must run before jax is imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_sejonggo")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# The machine's sitecustomize rewrites JAX_PLATFORMS to "axon,cpu" (TPU
# tunnel first) at interpreter startup, so the env var alone is not
# enough — override through the config API before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_PATH)


@pytest.fixture(scope="session")
def reference_play():
    """Import the reference engine (numpy-only) as a differential oracle.

    The reference's play.py needs a writable cwd with logs/ for its
    logging config; run it from a temp dir.  Skipped when the reference
    checkout is not present.
    """
    if not reference_available():
        pytest.skip("reference checkout not available")
    import importlib

    tmp = "/tmp/_sejonggo_ref_oracle"
    os.makedirs(os.path.join(tmp, "logs"), exist_ok=True)
    logcfg = os.path.join(tmp, "logconfig.json")
    if not os.path.exists(logcfg):
        import shutil

        shutil.copy(os.path.join(REFERENCE_PATH, "logconfig.json"), logcfg)
    old_cwd = os.getcwd()
    os.chdir(tmp)
    try:
        sys.path.insert(0, REFERENCE_PATH)
        conf_mod = importlib.import_module("conf")
        conf_mod.conf["SIZE"] = 9
        conf_mod.conf["KOMI"] = 5.5
        play = importlib.import_module("play")
        assert play.SIZE == 9, "reference play.py imported with wrong SIZE"
        # The reference's dictConfig installs rotating DEBUG handlers on the
        # root logger; strip them so they don't pollute pytest/jax teardown.
        import logging

        root = logging.getLogger()
        for h in list(root.handlers):
            root.removeHandler(h)
        logging.disable(logging.DEBUG)
        yield play
    finally:
        os.chdir(old_cwd)
        if REFERENCE_PATH in sys.path:
            sys.path.remove(REFERENCE_PATH)
