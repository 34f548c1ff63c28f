"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize imports jax at interpreter start (axon TPU
# plugin), so env vars alone are too late — force the platform via config
# before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import importlib.util
import pathlib
import sys

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


def load_reference_module(rel_path: str, name: str):
    """Load a reference module by file path (golden oracle for parity tests).

    Avoids importing the `hulc` package (which needs pytorch_lightning etc.);
    only modules whose direct imports are satisfiable (torch, numpy) load.
    """
    path = REFERENCE_ROOT / rel_path
    if not path.exists():
        pytest.skip(f"reference file {path} not available")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def ref_pytorch3d():
    return load_reference_module(
        "hulc/models/decoders/utils/pytorch3d_transforms.py",
        "hulc.models.decoders.utils.pytorch3d_transforms",
    )


@pytest.fixture(scope="session")
def ref_gripper_control(ref_pytorch3d):
    # gripper_control imports the vendored pytorch3d module by package name;
    # ref_pytorch3d already registered it in sys.modules under that name.
    import types

    for pkg in [
        "hulc",
        "hulc.models",
        "hulc.models.decoders",
        "hulc.models.decoders.utils",
    ]:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    return load_reference_module(
        "hulc/models/decoders/utils/gripper_control.py", "ref_gripper_control"
    )
