"""Test harness: force an 8-virtual-device CPU backend before JAX initializes.

This is JAX's standard fake-backend trick (SURVEY.md §4): every shard_map/pjit/psum
path in the framework is exercised on 8 "devices" on one host, so the multi-chip
sharding story is CI-testable without a TPU.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any TPU platform from the environment
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Some environments pre-import jax via sitecustomize before this file runs; the config
# update below still wins as long as no backend has been initialized yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite is compile-dominated on the 1-core CI host,
# and programs are identical between runs. Host-keyed dir: XLA:CPU AOT entries
# embed LLVM tuning features the load-time check rejects on a DIFFERENT host
# (sessions move between machines), so each host family gets its own namespace
# (see __graft_entry__._host_keyed_cache_dir).
import os.path as _osp  # noqa: E402
import sys as _sys  # noqa: E402

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))
import __graft_entry__  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  __graft_entry__._host_keyed_cache_dir("/root/.cache/jax_comp_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_arrays():
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist

    return make_synthetic_avmnist(n_train=256, n_test=64, seed=0)


@pytest.fixture(scope="session")
def synthetic_dir(tmp_path_factory):
    from avmnist_tpu.data.synthetic import make_synthetic_avmnist

    d = tmp_path_factory.mktemp("avmnist")
    return make_synthetic_avmnist(str(d), n_train=256, n_test=64, seed=0)


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from avmnist_tpu.parallel import create_mesh

    assert len(jax.devices()) == 8, "conftest failed to fake 8 devices"
    return create_mesh()
