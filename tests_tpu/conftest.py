"""Real-TPU test harness (VERDICT r2 #7: Mosaic lowering regressions
must fail a test, not a benchmark).

Unlike tests/ (pinned to the CPU backend), this suite runs on the real
chip: ``python -m pytest tests_tpu/ -q`` in this container attaches the
TPU (~2 min) and exercises the ACTUAL Mosaic lowering of the fused
kernels against their XLA mirrors.  Skipped automatically when no TPU
backend is available.
"""

import os

import jax
import pytest

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    try:
        on_tpu = jax.default_backend() in ("tpu", "axon")
    except Exception:  # noqa: BLE001 — no backend at all
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU backend")
        for item in items:
            item.add_marker(skip)
