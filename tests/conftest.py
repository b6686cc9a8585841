"""Test bootstrap: run the suite on an 8-device virtual CPU mesh.

This is the TPU-native analog of testing multi-node behavior without a real
cluster (SURVEY.md §4): XLA's host platform is forced to expose 8 devices so
jax.sharding.Mesh / shard_map code paths execute real collectives on CPU.

Must run before any JAX backend is initialized. The axon sitecustomize may
have already *imported* jax, but as long as no backend client exists yet,
``jax.config.update('jax_platforms', 'cpu')`` still takes effect.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_FLAG = "--xla_force_host_platform_device_count=8"
if _FLAG not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _FLAG).strip()

import jax  # noqa: E402

if os.environ.get("TDM_TEST_BACKEND", "cpu") == "cpu":
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - backend already initialized
        pass

import pytest  # noqa: E402

# Persistent compile cache: repeated suite runs skip XLA recompiles of the
# heavy scanned train steps (cache dir is gitignored; first run populates).
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(_REPO_ROOT, ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover
    pass


@pytest.fixture(scope="session")
def eight_devices():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip(f"need 8 devices, have {len(devices)}")
    return devices[:8]
