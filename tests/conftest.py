"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars BEFORE jax is imported anywhere (SURVEY.md §4:
multi-host behavior is tested with xla_force_host_platform_device_count).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the axon TPU backend
# programmatically (JAX_PLATFORMS env is ignored); config.update is the
# reliable way to pin tests to the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_data_dir(tmp_path_factory):
    """A deterministic ULTRA-format toy dataset (generated, not copied)."""
    out = tmp_path_factory.mktemp("toydata")
    from tools.make_toy_data import main as make_main
    make_main([str(out), "--queries", "24", "--features", "64",
               "--libsvm"])
    return str(out)


@pytest.fixture(scope="session")
def click_model_json(tmp_path_factory):
    out = tmp_path_factory.mktemp("cm")
    from ultra_pytorch_tpu.sim.click_models import main as cm_main
    cm_main(["pbm", "0.1", "1.0", "4", "1.0", str(out)])
    return str(out / "pbm_0.1_1.0_4_1.0.json")
