"""Vector-container semantics (src/vector.rs:176-267 test behaviors)."""

import numpy as np
import pytest

from flechasdb_tpu.errors import InvalidArgs
from flechasdb_tpu.vector import as_vector_set, divide_vector_set


def test_chunk_flat_buffer():
    vs = as_vector_set(np.arange(12, dtype=np.float32), 3)
    assert vs.shape == (4, 3)
    assert np.array_equal(vs[1], [3, 4, 5])


def test_chunk_rejects_nonmultiple():
    with pytest.raises(InvalidArgs):
        as_vector_set(np.arange(10, dtype=np.float32), 3)


def test_chunk_empty_ok():
    vs = as_vector_set(np.zeros(0, np.float32), 4)
    assert vs.shape == (0, 4)


def test_2d_passthrough():
    x = np.ones((5, 8), np.float32)
    assert as_vector_set(x).shape == (5, 8)


def test_2d_size_mismatch():
    with pytest.raises(InvalidArgs):
        as_vector_set(np.ones((5, 8), np.float32), 4)


def test_divide_views_are_column_blocks(rng):
    x = rng.standard_normal((6, 12)).astype(np.float32)
    d = divide_vector_set(x, 3)
    assert d.shape == (3, 6, 4)
    # i-th division is columns [i*m, (i+1)*m) of every vector
    # (vector.rs:154-174).
    for i in range(3):
        assert np.array_equal(d[i], x[:, i * 4:(i + 1) * 4])


def test_divide_rejects_nondivisible(rng):
    x = rng.standard_normal((4, 10)).astype(np.float32)
    with pytest.raises(InvalidArgs):
        divide_vector_set(x, 3)


def test_divide_whole_vector():
    x = np.arange(8, dtype=np.float32).reshape(2, 4)
    d = divide_vector_set(x, 1)
    assert d.shape == (1, 2, 4)
    assert np.array_equal(d[0], x)


def test_f64_input_checked_cast():
    """f64 accepted with a checked cast (PARITY.md dtype policy)."""
    x = np.array([[1.5, -2.25], [1e30, 0.0]], np.float64)
    out = as_vector_set(x)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out, x.astype(np.float32))


def test_f64_overflow_rejected():
    x = np.array([[1.0, 1e300]], np.float64)  # exceeds f32 range
    with pytest.raises(InvalidArgs):
        as_vector_set(x)


def test_integer_input_cast():
    out = as_vector_set(np.arange(8, dtype=np.int64), 4)
    assert out.dtype == np.float32 and out.shape == (2, 4)


def test_non_numeric_rejected():
    with pytest.raises(InvalidArgs):
        as_vector_set(np.array([["a", "b"]]))
