"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before jax initializes its backend — pytest imports conftest first, so
setting the env here is sufficient as long as no test module imports jax at
collection time before this file loads (pytest guarantees conftest loads first).
"""
import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (the real TPU tunnel) and
# a sitecustomize hook imports jax at interpreter startup, so the env var alone is
# read too early to help — update jax's config directly (the backend itself is not
# initialized until first use, so this still takes effect).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: the training-step tests compile several large
# fwd+bwd programs — cache them across runs. Lives under $HOME (not /tmp) so it
# survives host reboots; shared with __graft_entry__'s dryrun child.
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from siammask_tpu.utils.cachedir import machine_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", machine_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path("/root/reference")

if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only PyTorch reference (oracle for parity tests)."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    return REFERENCE


@pytest.fixture(scope="session")
def reference_on_path(reference_path):
    """Puts the reference repo on sys.path so its pure-numpy utils import as oracles."""
    p = str(reference_path)
    sys.path.insert(0, p)
    yield reference_path
    sys.path.remove(p)
