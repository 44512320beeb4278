"""Test config: force an 8-device virtual CPU platform before jax import.

Multi-device sharding tests run on a simulated mesh
(xla_force_host_platform_device_count), mirroring how the driver validates
the multi-chip path without real chips.

IMPORTANT (this environment): prefer `PYTHONPATH= python -m pytest` — the
global PYTHONPATH injects a sitecustomize that registers the tunneled
"axon" TPU PJRT plugin into every interpreter, and concurrent JAX processes
deadlock on its single loopback relay. The env vars below are not enough on
their own (the plugin registration pins jax_platforms before conftest
runs), so we ALSO force the config back to cpu after importing jax; a
plain `python -m pytest` then still runs the suite on local CPU.
"""
import os

# POINTUNET_TPU_TESTS=1 keeps the real TPU backend for the on-chip kernel
# validation suite (tests/test_tpu_kernels.py, run with -m tpu)
if os.environ.get("POINTUNET_TPU_TESTS") != "1":
    os.environ.pop("PALLAS_AXON_REMOTE_COMPILE", None)

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_max_isa" not in flags:
        # pin codegen to a baseline ISA so persistent-cache entries stand a
        # chance of loading across CPU generations (r2: entries compiled on
        # an AMX/AVX-512 host fail the machine-feature check elsewhere and
        # every new runner pays a full cold compile)
        flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
    os.environ["XLA_FLAGS"] = flags

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The suite's cost is XLA CPU compiles (the tiny saliency U-Net alone is
# ~70 s to compile), so cache compilations persistently. Budget on this
# 1-CPU host: ~4.5 min with the cache warm (measured 264 s, r2); a cold
# run additionally pays the one-time compiles (~store-and-reuse, see
# COLD_SUITE note in docs/DESIGN.md). Keep tests jitting whole programs —
# eager flax applies dispatch hundreds of per-op round-trips and cost
# more than the jit trace they avoid.
import jax  # noqa: E402

if os.environ.get("POINTUNET_TPU_TESTS") != "1":
    # sitecustomize's axon plugin registration overrides JAX_PLATFORMS;
    # re-pin cpu post-import (validated: backend falls back to the 8
    # virtual CPU devices even with the plugin registered). Without this
    # a PYTHONPATH-polluted run silently executes on the real chip, where
    # default conv/matmul precision is bf16 and f32-tolerance tests fail.
    jax.config.update("jax_platforms", "cpu")
    # Param-init programs dominate cold-suite compiles: threefry's giant
    # unrolled HLO makes XLA:CPU spend ~60 s optimizing each model's
    # jitted init (measured r3: SaliencyUNet init-compile 62 s threefry
    # vs 7.5 s rbg; fwd-compile unaffected). Every property asserted
    # here is RNG-stream-independent (tolerance/descent/cross-mesh
    # equality bars, no golden values), so the CPU suite uses the
    # cheap-to-compile generator. Production paths keep the JAX default.
    jax.config.update("jax_default_prng_impl", "rbg")

_CACHE_DIR = os.environ.get("JAX_TEST_CACHE_DIR", "/tmp/jax_test_compile_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def _cache_entries():
    try:
        return set(os.listdir(_CACHE_DIR))
    except OSError:
        return set()


def pytest_sessionstart(session):
    session.config._jax_cache_start = _cache_entries()


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Make warm-vs-cold visible (VERDICT r3 item 7: 'verify, don't
    assume'): a warm run re-uses every persistent-cache entry; a cold run
    pays one XLA:CPU compile per NEW entry listed here (the suite's cost
    is compiles, not compute — docs/DESIGN.md)."""
    start = getattr(config, "_jax_cache_start", set())
    now = _cache_entries()
    new = now - start
    terminalreporter.write_line(
        f"[jax-cache] {_CACHE_DIR}: {len(start)} entries at start, "
        f"{len(new)} cold compiles paid this run"
        + ("" if new else " (fully warm)")
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
