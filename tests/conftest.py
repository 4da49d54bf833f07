"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
(mesh, pjit, collectives) are exercised without TPU hardware — the TPU
analogue of the reference's 'multi-node without a cluster' smoke strategy
(SURVEY §4).

This image pre-imports jax from sitecustomize (axon TPU tunnel) before
pytest starts, so env vars are too late — but backends initialize lazily,
so jax.config updates here still take effect."""

import jax

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # backend already initialized (e.g. conftest re-entry) — keep going
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the suite is compile-dominated (hundreds of
# executables over an 8-device virtual mesh), so warm reruns skip most of
# the XLA work; the cold-run wall time is what README documents.
# The dir is keyed by a fingerprint of the host CPU flags: XLA:CPU AOT
# results embed machine features, and loading an entry compiled on a
# different host type SIGILLs/aborts mid-suite (observed when /tmp
# outlived a host change — cpu_aot_loader warns, then dies).
import hashlib  # noqa: E402
import os  # noqa: E402


def _host_cache_dir(prefix: str) -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next(ln for ln in f if ln.startswith("flags"))
    except Exception:
        import platform

        flags = platform.processor() or "unknown"
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    path = f"{prefix}_{tag}"
    os.makedirs(path, exist_ok=True)
    return path


jax.config.update(
    "jax_compilation_cache_dir",
    _host_cache_dir("/tmp/gritlm_tpu_jax_cache_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

from gritlm_tpu.config import tiny_mistral, tiny_mixtral  # noqa: E402
from gritlm_tpu.models import init_params  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _drop_jit_caches_between_modules():
    """The full suite compiles many hundreds of executables in ONE process
    (8-device CPU mesh); letting them all stay live has segfaulted XLA's
    CPU compiler late in the run (address-space/map pressure). Tests
    within a module share compilations; across modules they rarely do —
    so drop the jit caches at each module boundary."""
    yield
    jax.clear_caches()


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
