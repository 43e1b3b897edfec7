"""list_column_to_matrix: flat-buffer fast path + fallbacks."""
import numpy as np
import pyarrow as pa

from skosconverter_ray.functions.arrays import list_column_to_matrix


def test_uniform_list_fast_path():
    col = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]],
                   pa.list_(pa.float32()))
    m = list_column_to_matrix(col)
    assert m.dtype == np.float64 and m.shape == (3, 2)
    np.testing.assert_allclose(m, [[1, 2], [3, 4], [5, 6]])


def test_chunked_and_sliced_offsets():
    base = pa.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]],
                    pa.list_(pa.float64()))
    sliced = base.slice(1, 2)  # nonzero starting offset
    np.testing.assert_allclose(list_column_to_matrix(sliced),
                               [[1, 2], [3, 4]])
    chunked = pa.chunked_array([base, base])
    assert list_column_to_matrix(chunked).shape == (6, 2)


def test_ragged_raises_like_per_row_conversion():
    import pytest

    ragged = pa.array([[1.0], [2.0, 3.0]], pa.list_(pa.float64()))
    with pytest.raises(ValueError):
        list_column_to_matrix(ragged)


def test_empty_and_fixed_size_list():
    empty = pa.array([], pa.list_(pa.float64()))
    assert list_column_to_matrix(empty).shape == (0, 0)
    fsl = pa.FixedSizeListArray.from_arrays(
        pa.array([1.0, 2.0, 3.0, 4.0]), 2)
    np.testing.assert_allclose(list_column_to_matrix(fsl),
                               [[1, 2], [3, 4]])
