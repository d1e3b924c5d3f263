import numpy as np
import scipy.sparse
import pytest

from keynet_tpu.homogeneous import (affine_to_linear, linear_to_affine,
                                    affine_to_linear_matrix, sparse_affine_to_linear,
                                    diagonal_affine_to_linear, mat2gray_key,
                                    numpy_homogenize, numpy_dehomogenize)


def test_affine_linear_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 2, 4, 5)).astype(np.float32)
    h = np.asarray(affine_to_linear(x))
    assert h.shape == (3, 41)
    assert np.all(h[:, -1] == 1)
    back = np.asarray(linear_to_affine(h, (2, 4, 5)))
    assert np.allclose(back, x)


def test_linear_to_affine_rejects_bad_trailing():
    x = np.ones((2, 5), dtype=np.float32)
    x[0, -1] = 3.0
    with pytest.raises(ValueError):
        linear_to_affine(x)


def test_numpy_homogenize_roundtrip():
    x = np.arange(12.0)
    assert np.allclose(numpy_dehomogenize(numpy_homogenize(x)), x)


def test_affine_to_linear_matrix():
    rng = np.random.default_rng(1)
    W = rng.normal(size=(4, 7))
    b = rng.normal(size=4)
    x = rng.normal(size=7)
    M = affine_to_linear_matrix(W, b)
    y = M @ np.concatenate([x, [1.0]])
    assert np.allclose(y[:-1], W @ x + b)
    assert y[-1] == 1.0


def test_sparse_affine_to_linear_matches_dense():
    rng = np.random.default_rng(2)
    A = scipy.sparse.random(5, 5, density=0.4, random_state=3)
    b = rng.normal(size=5)
    M = sparse_affine_to_linear(A, b).toarray()
    Md = affine_to_linear_matrix(A.toarray(), b)
    assert np.allclose(M, Md)


def test_diagonal_affine_inverse_identity():
    """[D b;0 1]·[D b;0 1]^-1 == I (the reference verifies its Woodbury
    construction the same way, test/test_sparse.py:25-34)."""
    rng = np.random.default_rng(3)
    d = rng.random(64) + 0.5
    b = rng.normal(size=64)
    A, Ainv = diagonal_affine_to_linear(d, bias=b, withinverse=True)
    I = (A @ Ainv).toarray()
    assert np.allclose(I, np.eye(65), atol=1e-10)


def test_mat2gray_key_roundtrip():
    rng = np.random.default_rng(4)
    x = rng.normal(size=100) * 37 + 5
    A, Ainv = mat2gray_key(x)
    xh = np.concatenate([x, [1.0]])
    g = A @ xh
    assert g[:-1].min() >= -1e-9 and g[:-1].max() <= 1 + 1e-9
    assert np.allclose(Ainv @ g, xh, atol=1e-8)
