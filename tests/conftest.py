"""Test environment: force CPU with an 8-device virtual mesh.

Must run before jax imports.  NOTE: the axon TPU plugin ignores
``JAX_PLATFORMS``; ``JAX_PLATFORM_NAME`` is the knob that works here (see
.claude/skills/verify/SKILL.md).
"""
import os

os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
