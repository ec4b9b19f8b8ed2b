"""Real-TPU test lane (run manually / via the verify skill; NOT collected by the
default `pytest tests/` run, whose conftest forces the CPU backend).

Run serially — two processes touching the single tunneled TPU chip can deadlock
(see .claude/skills/verify/SKILL.md):

    timeout 900 python -m pytest tests_tpu/ -q

Everything here skips cleanly when no TPU-like backend is available.
"""

import jax
import pytest


def tpu_available():
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:
        return False


def pytest_collection_modifyitems(config, items):
    if not tpu_available():
        skip = pytest.mark.skip(reason="no TPU backend available")
        for item in items:
            item.add_marker(skip)
