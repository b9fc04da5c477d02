"""Shared fixtures. Ray is initialised ONCE per pytest session, lazily —
only tests that request the ``ray_session`` fixture pay the startup cost."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


def load_script(modname: str, relpath: str):
    """Import a scripts/*.py file as a module (they are CLIs, not package
    members). One copy here — the generator/harness test modules all load
    scripts through this."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(modname,
                                                  REPO_ROOT / relpath)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="session")
def harness():
    """The oracle-sweep harness (driver-equivalent compare helpers)."""
    return load_script("check_oracles_mod", "scripts/check_oracles.py")


@pytest.fixture(scope="session")
def adv_dir(tmp_path_factory) -> str:
    """Adversarial twin of sf0.001 (nulls/unicode/malformed rows)."""
    gen = load_script("gen_adversarial_testdata",
                      "scripts/gen_adversarial_testdata.py")
    out = tmp_path_factory.mktemp("sf_adv")
    gen.generate("/root/testdata/sf0.001", out)
    return str(out)


@pytest.fixture(scope="session")
def skew_dir(tmp_path_factory) -> str:
    """Key-skewed twin of sf0.001 (hot keys, planted identical rows)."""
    gen = load_script("gen_skewed_testdata",
                      "scripts/gen_skewed_testdata.py")
    out = tmp_path_factory.mktemp("sf_skew")
    gen.generate("/root/testdata/sf0.001", out)
    return str(out)


@pytest.fixture(scope="session")
def skew01_dir(tmp_path_factory) -> str:
    """Skewed twin of sf0.01 — the base where the sgemm edge-column 1-ulp
    tie-break artifact actually manifested (data-dependent; the sf0.001
    skew passed even before the fix)."""
    gen = load_script("gen_skewed_testdata",
                      "scripts/gen_skewed_testdata.py")
    out = tmp_path_factory.mktemp("sf_skew01")
    gen.generate("/root/testdata/sf0.01", out)
    return str(out)


@pytest.fixture(scope="session")
def shuffled_dir(tmp_path_factory) -> str:
    """Row-shuffled twin of sf0.001 (input row-order invariance)."""
    gen = load_script("gen_shuffled_testdata",
                      "scripts/gen_shuffled_testdata.py")
    out = tmp_path_factory.mktemp("sf_shuffled")
    gen.generate("/root/testdata/sf0.001", out)
    return str(out)
