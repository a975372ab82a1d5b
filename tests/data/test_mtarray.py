import numpy as np

from lkpy_tpu.data.batches import BatchedRange
from lkpy_tpu.data.mtarray import MTArray
from lkpy_tpu.utils.misc import Latch, indent_lines


def test_mtarray_conversions():
    a = MTArray(np.array([1.0, 2.0, 3.0]))
    assert a.shape == (3,)
    j = a.jax()
    assert j.shape == (3,)
    t = a.torch()
    assert t.shape[0] == 3
    arrow = a.arrow()
    assert len(arrow) == 3
    np.testing.assert_array_equal(a.numpy(), [1.0, 2.0, 3.0])


def test_mtarray_from_jax():
    import jax.numpy as jnp

    a = MTArray(jnp.ones((2, 2)))
    assert a.numpy().shape == (2, 2)


def test_batched_range():
    br = BatchedRange(10, 3)
    assert len(br) == 4
    assert list(br) == [(0, 3), (3, 6), (6, 9), (9, 10)]
    assert [s.stop - s.start for s in br.slices()] == [3, 3, 3, 1]


def test_latch():
    import threading

    latch = Latch(2)
    results = []

    def waiter():
        latch.wait(5)
        results.append(1)

    t = threading.Thread(target=waiter)
    t.start()
    latch.count_down()
    latch.count_down()
    t.join(2)
    assert results == [1]


def test_indent():
    assert indent_lines("a\nb") == "  a\n  b"
