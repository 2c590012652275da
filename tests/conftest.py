"""Test environment: force CPU with an 8-device virtual mesh.

Gotchas (see .claude/skills/verify/SKILL.md): the axon TPU plugin ignores
``JAX_PLATFORMS``, and ``import pytest`` already imports jax through a plugin,
so env vars set here are too late.  The backend is NOT initialized yet at
conftest time, so ``jax.config.update`` + XLA_FLAGS still take effect.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

import jax

jax.config.update("jax_platform_name", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual CPU mesh; backend is "
        f"{jax.default_backend()}"
    )
    yield


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (train smokes, multi-process SPMD); "
             "the fast default keeps the inner loop under ~6 minutes",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
