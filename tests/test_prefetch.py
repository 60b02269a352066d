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


def test_prefetch_producer_exits_when_consumer_abandons():
    """Train loops break out of `for batch in prefetch(...)` at session/step
    boundaries; the producer thread must notice and exit instead of
    blocking forever in q.put holding device-staged batches."""
    import gc
    import threading
    import time

    from wavernn_tpu.data.prefetch import prefetch

    before = {t.ident for t in threading.enumerate()}

    def gen():
        for i in range(1000):
            yield np.full((4,), i, np.float32)

    it = prefetch(gen(), size=2, device_put=False)
    assert next(it) is not None
    it.close()  # triggers GeneratorExit -> finally: stop + drain
    gc.collect()
    deadline = time.time() + 5.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.ident not in before and t.is_alive()]
        if not alive:
            break
        time.sleep(0.05)
    assert not alive, f"prefetch producer thread leaked: {alive}"
