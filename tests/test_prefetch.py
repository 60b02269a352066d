import numpy as np
import pytest

from wavernn_tpu.data.prefetch import prefetch


def test_prefetch_order_and_values():
    batches = [(np.full((2, 3), i, np.float32), [f"id{i}"]) for i in range(7)]
    out = list(prefetch(iter(batches), size=2))
    assert len(out) == 7
    for i, (arr, ids) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(arr), batches[i][0])
        assert ids == [f"id{i}"]


def test_prefetch_stages_on_device():
    import jax
    out = list(prefetch([(np.ones((2,), np.float32),)], size=1))
    assert isinstance(out[0][0], jax.Array)


def test_prefetch_propagates_producer_exception():
    def gen():
        yield (np.zeros((1,)),)
        raise ValueError("boom")

    it = prefetch(gen(), size=2)
    next(it)
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_no_device_put():
    out = list(prefetch([(np.ones((2,)),)], size=1, device_put=False))
    assert isinstance(out[0][0], np.ndarray)
