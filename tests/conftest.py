"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4 / driver contract).  Must run
before jax initializes, hence the env mutation at module import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize force-registers the tunneled TPU backend at
# interpreter startup (before conftest); flipping the jax config back to cpu
# before the first backend use makes the whole suite run on the virtual
# 8-device CPU mesh regardless.
import jax

jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import numpy as np
import pytest

DATA = Path(__file__).parent / "data"
GOLDEN = Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def mouse_prefix() -> str:
    return str(DATA / "plink")


@pytest.fixture(scope="session")
def mouse_pheno() -> str:
    return str(DATA / "pheno")


@pytest.fixture(scope="session")
def mouse_geno(mouse_prefix):
    from gmat_tpu.io.bed import read_plink

    return read_plink(mouse_prefix)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(2026)
