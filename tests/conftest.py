"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
(mesh, pjit, collectives) are exercised without TPU hardware — the TPU
analogue of the reference's 'multi-node without a cluster' smoke strategy
(SURVEY §4). Must run before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

from gritlm_tpu.config import tiny_mistral, tiny_mixtral  # noqa: E402
from gritlm_tpu.models import init_params  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return tiny_mistral()


@pytest.fixture(scope="session")
def cfg_moe():
    return tiny_mixtral()


@pytest.fixture(scope="session")
def params(cfg):
    return init_params(cfg, jax.random.PRNGKey(0))


@pytest.fixture(scope="session")
def params_moe(cfg_moe):
    return init_params(cfg_moe, jax.random.PRNGKey(0))
