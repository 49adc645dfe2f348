"""Driver-contract regression tests for __graft_entry__.py.

Round 3's only red driver artifact (MULTICHIP_r03 rc=124) was caused by
`enable_persistent_cache()` running at module import and initialising the
axon/TPU backend before `dryrun_multichip` could switch the platform to
virtual CPU devices; the re-exec fallback then recursed until the driver
timeout. These tests pin the three contract pieces:

1. importing __graft_entry__ initialises NO jax backend;
2. the re-exec fallback is bounded (sentinel -> RuntimeError, not recursion);
3. (slow) dryrun_multichip succeeds end-to-end from a parent whose backend
   was already initialised with too few devices — the driver's exact failure
   mode, exercised via the re-exec fallback.
"""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code, *, env_extra=None, strip=(), timeout=900):
    env = {k: v for k, v in os.environ.items() if k not in strip}
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


def test_import_initialises_no_backend():
    # Run WITHOUT the test harness platform overrides so the axon
    # sitecustomize default ('axon,cpu') applies — the driver's environment.
    r = _run(
        "import __graft_entry__; "
        "import jax._src.xla_bridge as xb; "
        "assert not xb._backends, dict(xb._backends); "
        "print('CLEAN')",
        strip=("JAX_PLATFORMS", "XLA_FLAGS"),
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "CLEAN" in r.stdout


_PREINIT_SCRIPT = textwrap.dedent(
    """
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() == 1  # backend now initialised, 1 device only
    from __graft_entry__ import dryrun_multichip
    dryrun_multichip(8)
    """
)


def test_reexec_recursion_is_bounded():
    # With the sentinel pre-set, a failed platform force must raise instead
    # of re-exec'ing (the round-3 bug recursed here until rc=124).
    r = _run(
        _PREINIT_SCRIPT,
        env_extra={"_PRODIFF_DRYRUN_REEXEC": "1"},
        strip=("XLA_FLAGS",),
        timeout=300,
    )
    assert r.returncode != 0
    assert "RuntimeError" in r.stderr, r.stderr
    assert "initialised at import time" in r.stderr, r.stderr


@pytest.mark.slow
def test_dryrun_from_preinitialised_backend():
    # The driver's failure mode end-to-end: parent already initialised a
    # 1-device backend -> _force_virtual_cpu_devices fails -> ONE re-exec in
    # a clean child (which forces the platform via jax.config before import)
    # must complete the full dp + dp x tp dryrun.
    r = _run(_PREINIT_SCRIPT, strip=("XLA_FLAGS", "_PRODIFF_DRYRUN_REEXEC"))
    assert r.returncode == 0, r.stderr[-4000:]
    assert "dryrun_multichip OK on 8 devices" in r.stdout, r.stdout


def test_persistent_cache_gate_is_side_effect_free():
    """enable_persistent_cache() decides platform from config/env only:
    axon -> enabled, explicit cpu -> no-op, UNSET -> enabled (autodetect
    hosts must not silently lose the cache) — and never initialises a
    backend (the round-3 regression vector)."""
    code = textwrap.dedent(
        """
        import jax
        from prodiff_tpu.utils.jax_cache import enable_persistent_cache
        import jax._src.xla_bridge as xb

        assert enable_persistent_cache() == "/tmp/_cache_gate_test"  # axon
        jax.config.update("jax_platforms", "cpu")
        assert enable_persistent_cache() == ""                       # cpu
        jax.config.update("jax_platforms", None)
        assert enable_persistent_cache() == "/tmp/_cache_gate_test"  # unset
        assert not xb._backends, dict(xb._backends)
        print("GATE_OK")
        """
    )
    r = _run(
        code,
        env_extra={"JAX_CACHE_DIR": "/tmp/_cache_gate_test"},
        strip=("JAX_PLATFORMS", "XLA_FLAGS"),
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "GATE_OK" in r.stdout
