"""Machine-fingerprinted XLA compile-cache directory.

XLA:CPU persists AOT-compiled entries whose machine-code depends on the host's
CPU features, but the cache KEY does not include them. An entry compiled on one
machine fail-loads on another (``cpu_aot_loader: ... +prefer-no-gather is not
supported``) AND squats on the key, so the recompiled result is never written
back — the cache is permanently poisoned for the new machine (measured round 2:
a successful 23-min cold dryrun left the cache byte-identical and the next run
was cold again). Keying the directory by a CPU-feature fingerprint gives every
machine flavor its own namespace: loads always match the host, and fresh hosts
warm their own cache on first use.
"""
from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Stable-per-machine id derived from the CPU feature flags."""
    feature_line = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                # x86 exposes 'flags', arm 'Features'
                if line.startswith(("flags", "Features")):
                    feature_line = line
                    break
    except OSError:
        pass
    if not feature_line:
        feature_line = platform.machine() + platform.processor()
    return hashlib.sha1(feature_line.encode()).hexdigest()[:12]


def machine_cache_dir(base: str | None = None) -> str:
    base = base or os.path.expanduser("~/.cache/siammask_tpu_xla")
    return os.path.join(base, f"cpu-{machine_fingerprint()}")
