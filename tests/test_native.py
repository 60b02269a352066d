"""Native C++ post-processing library vs the numpy reference path."""
import numpy as np
import pytest

from wavernn_tpu.compat import native
from wavernn_tpu.dsp.audio import decode_mu_law
from wavernn_tpu.ops.fold import xfade_and_unfold


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_native_xfade_matches_numpy(lib, rng):
    y = rng.randn(5, 1200).astype(np.float64)
    want = xfade_and_unfold(y.copy(), target=1000, overlap=100)
    got = native.xfade_and_unfold(y.copy(), 1000, 100)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_native_mu_law_matches_numpy(lib, rng):
    y = rng.uniform(-1, 1, 10_000)
    want = decode_mu_law(y.copy(), 512, from_labels=False)
    got = native.decode_mu_law_inplace(y.copy(), 512)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_native_tail_fade(lib, rng):
    y = np.ones(1000)
    got = native.tail_fade_inplace(y.copy(), 100)
    np.testing.assert_allclose(got[:900], 1.0)
    np.testing.assert_allclose(got[900:], np.linspace(1, 0, 100), atol=1e-12)
    assert got[-1] == 0.0
