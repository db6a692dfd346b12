"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so sharded retrieval / multi-chip code paths are testable
without TPU hardware (SURVEY.md §4 test strategy)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)
import pytest

# Force CPU. The ambient environment registers the 'axon' TPU plugin via
# sitecustomize and pins JAX_PLATFORMS=axon, which overrides the env var —
# only the config update reliably wins.
if not os.environ.get("COMORAG_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def cpu_mesh():
    from comorag_tpu.parallel.mesh import build_mesh

    return build_mesh({"corpus": 8})


@pytest.fixture()
def tmp_config(tmp_path):
    from comorag_tpu.config import ComoConfig

    return ComoConfig(
        save_dir=str(tmp_path / "outputs"),
        output_dir=str(tmp_path / "results"),
        embedding_model_name="hash",
        embedding_dim=64,
    )
