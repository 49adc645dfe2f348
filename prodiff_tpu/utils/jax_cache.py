"""Persistent XLA compilation cache.

Compiles through the axon TPU relay cost 60-600 s per program and the relay
has no server-side cache across processes, so every bench/CLI/test process
used to repay them. jax's persistent cache serialises executables keyed by
HLO hash; measured on this box: 11.9 s -> 1.0 s for a cold/warm toy program,
and it works through the relay. Called from bench.py, __graft_entry__.py,
main.py and tests/conftest.py.

The reference has no analogue (torch CUDA kernels are eagerly cached by the
driver); this is the TPU-native equivalent of warm kernel caches.
"""

from __future__ import annotations

import os


def _intended_platform() -> str:
    """First platform jax WILL pick, without initialising any backend.

    ``jax.default_backend()`` initialises the backend as a side effect, which
    poisons later ``jax.config.update('jax_platforms', ...)`` switches — that
    is exactly how the round-3 multi-chip dryrun regressed (MULTICHIP_r03
    rc=124). Reading the config value is side-effect free. The axon
    sitecustomize sets ``jax_platforms='axon,cpu'`` at interpreter start;
    tests set ``'cpu'`` before anything else runs."""
    import jax

    platforms = ""
    try:
        platforms = jax.config.jax_platforms or ""
    except AttributeError:
        platforms = os.environ.get("JAX_PLATFORMS", "") or ""
    return platforms.split(",")[0].strip().lower()


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (idempotent).

    No-op on CPU backends: XLA:CPU AOT entries record pseudo machine
    features (+prefer-no-scatter) that the loader rejects on this host, so
    CPU lookups always miss — loudly and slowly. Platform is decided from
    config/env only; this function must never initialise a jax backend
    (callers run it at import time, before platform switches). An UNSET
    platform enables the cache: hosts that rely on autodetection (plain TPU
    VMs) must not silently lose it — only an explicit 'cpu' opts out."""
    import jax

    if _intended_platform() == "cpu":
        return ""
    if path is None:
        # same default dir as bench.py so programs are shared across entries
        path = os.environ.get("JAX_CACHE_DIR", "/tmp/prodiff_tpu_jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes real time (default threshold is 1s wall,
    # but relay round-trips make even small programs worth keeping)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    return path
