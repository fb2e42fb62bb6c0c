"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md section 4).

The environment preregisters a remote TPU backend ('axon') via sitecustomize
for every interpreter; `jax.config.update('jax_platforms', 'cpu')` overrides
it so tests compile locally and fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Persist every XLA:CPU compile (even sub-second eager op compiles — model
# tests run forwards eagerly, so hundreds of tiny compiles dominate the
# suite's runtime on this 1-core host). Warm runs then mostly skip XLA.
os.environ.setdefault("NSVB_CACHE_MIN_COMPILE_SECS", "0")
os.environ.setdefault("NSVB_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(autouse=True)
def _isolate_hparams():
    """Snapshot/restore the global hparams dict around EVERY test — the
    remaining bare ``hparams.clear()/update()`` sites in older test modules
    then cannot leak config into later tests even when a body raises
    (VERDICT r4 #7; new code should still prefer ``hparams_scope``)."""
    import copy

    from neuralsvb_tpu.hparams import hparams
    saved = copy.deepcopy(hparams)
    try:
        yield
    finally:
        hparams.clear()
        hparams.update(saved)
