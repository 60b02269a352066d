"""Test harness: force a CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware.

Opt-in TPU tier: run ``WAVERNN_TPU_TESTS=1 pytest tests -m tpu`` to keep
the hardware backend and execute the ``@pytest.mark.tpu`` tests (Pallas
kernel parity on real silicon — Mosaic lowering behavior that interpret
mode cannot see). Without the env var, the suite stays CPU-deterministic
and tpu-marked tests are skipped.
"""
import os
import sys

TPU_TESTS = os.environ.get("WAVERNN_TPU_TESTS", "") == "1"

import jax  # noqa: E402

if not TPU_TESTS:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The environment's sitecustomize may import jax (locking jax_platforms
    # to the hardware plugin) before this file runs — override the live
    # config too.
    jax.config.update("jax_platforms", "cpu")


def pytest_collection_modifyitems(config, items):
    import pytest as _pytest
    if TPU_TESTS:
        return
    skip_tpu = _pytest.mark.skip(
        reason="TPU tier: set WAVERNN_TPU_TESTS=1 to run on hardware")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip_tpu)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = "/root/reference"


def has_reference():
    return os.path.isdir(REFERENCE)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference PyTorch modules as parity oracles.

    The reference imports librosa (not installed); stub it out — the model
    code paths under test never call it.
    """
    if not has_reference():
        pytest.skip("reference repo not available")
    import types
    for name in ("librosa", "librosa.output", "librosa.feature",
                 "librosa.core", "librosa.filters", "librosa.feature.inverse"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    # unidecode/inflect aren't installed; back the reference text frontend
    # with our own implementations so it can serve as a structural oracle.
    if "unidecode" not in sys.modules:
        from wavernn_tpu.text.cleaners import _unidecode
        m = types.ModuleType("unidecode")
        m.unidecode = _unidecode
        sys.modules["unidecode"] = m
    if "inflect" not in sys.modules:
        from wavernn_tpu.text import numbers_en

        class _Engine:
            def number_to_words(self, num, andword="and", zero="zero",
                                group=0, **kw):
                if isinstance(num, str) and num[-2:] in ("st", "nd", "rd", "th"):
                    return numbers_en.ordinal_words(int(num[:-2]))
                return numbers_en.number_to_words(int(num), andword=andword,
                                                  zero=zero, group=group)

        m = types.ModuleType("inflect")
        m.engine = _Engine
        sys.modules["inflect"] = m
    # numpy 2 removed aliases the reference (written for numpy 1.16) uses
    if not hasattr(np, "cumproduct"):
        np.cumproduct = np.cumprod
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    import models.fatchord_version as ref_wavernn
    import models.tacotron as ref_tacotron
    import models.deepmind_version as ref_deepmind
    import utils.distribution as ref_distribution
    return types.SimpleNamespace(
        wavernn=ref_wavernn, tacotron=ref_tacotron,
        deepmind=ref_deepmind, distribution=ref_distribution)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


import pytest as _pytest_mod


@_pytest_mod.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module: a full-suite run
    accumulates hundreds of XLA CPU programs in one process and the CPU
    compiler has twice aborted (SIGSEGV r3/r4, SIGABRT r5) compiling the
    big batched-decode scan near the 30% mark — every affected file passes
    in isolation. Costs some recompiles of shared tiny programs; keeps the
    one-process `pytest tests/` run viable."""
    yield
    import jax as _jax
    _jax.clear_caches()
