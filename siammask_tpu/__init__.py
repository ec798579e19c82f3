"""siammask_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video tracking + segmentation
framework with the capabilities of foolwood/SiamMask.

Design stance (vs the PyTorch reference at /root/reference):

- Models are pure functions over parameter pytrees (no stateful modules); layout is
  NHWC, convs lower to XLA's TPU-native `lax.conv_general_dilated`.
- The tracker is a functional state machine: `tracker_init` / `tracker_step` thread a
  `TrackState` pytree; a whole video is `jax.lax.scan` over frames, fully on-device
  (crop, decode, penalty window, argmax, mask warp-back — one compiled program).
- Training is a pjit'd step over a `jax.sharding.Mesh` with psum gradient collectives.
- Host-side work (image decode, dataset sampling, benchmark file IO) stays host-side;
  everything hot runs under jit.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent XLA compilation cache (CPU only): the CPU test/dev host has one
# core and compiles large graphs slowly — cache across processes. The TPU path
# here compiles through a remote service that does not interoperate with the
# on-disk cache, so leave it untouched there. The directory is keyed by a CPU
# feature fingerprint: XLA:CPU cache keys exclude machine features, so entries
# from a different host fail-load AND block write-back (see utils/cachedir.py).
if (_jax.config.jax_compilation_cache_dir is None
        and (_os.environ.get("JAX_PLATFORMS") or "cpu") == "cpu"):
    # An explicitly-set SIAMMASK_TPU_CACHE is honored VERBATIM (the user
    # points at a cache they know matches this machine); only the default
    # path gets the per-machine fingerprint subdir (see utils/cachedir.py).
    _explicit = _os.environ.get("SIAMMASK_TPU_CACHE")
    if _explicit:
        _cache_dir = _explicit
    else:
        from siammask_tpu.utils.cachedir import machine_cache_dir as _mcd

        _cache_dir = _mcd()
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from siammask_tpu import config  # noqa: F401,E402
