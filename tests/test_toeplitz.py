"""Three-way oracle tests of the Toeplitz lowering: matrix vs independent
numpy correlation vs the jitted lax conv (the pattern of reference
test/test_sparse.py:223-272)."""

import numpy as np
import jax.numpy as jnp
import pytest

from keynet_tpu.toeplitz import toeplitz_conv2d, toeplitz_avgpool2d
from keynet_tpu.util import conv2d_oracle, avgpool2d_oracle
from keynet_tpu.models.specs import conv2d_apply, avgpool2d_apply


def _hom(x):
    return np.concatenate([x.reshape(-1), [1.0]]).astype(np.float32)


@pytest.mark.parametrize("inshape,M,k,stride", [
    ((1, 8, 8), 1, 3, 1),
    ((2, 8, 8), 3, 3, 1),
    ((2, 8, 8), 3, 3, 2),
    ((3, 9, 9), 4, 5, 1),   # odd image, 5x5 kernel
    ((2, 6, 6), 2, 1, 1),   # 1x1 kernel
    ((6, 14, 14), 16, 3, 1),  # LeNet conv2 shape
])
def test_toeplitz_conv2d_matches_oracles(inshape, M, k, stride):
    rng = np.random.default_rng(7)
    C = inshape[0]
    f = rng.normal(size=(M, C, k, k)).astype(np.float32)
    b = rng.normal(size=M).astype(np.float32)
    x = rng.normal(size=(1, *inshape)).astype(np.float32)

    W = toeplitz_conv2d(inshape, f, bias=b, stride=stride)
    y_mat = (W @ _hom(x))[:-1]
    y_np = conv2d_oracle(x, f, b, stride=stride).reshape(-1)
    y_jax = np.asarray(conv2d_apply(jnp.asarray(x), jnp.asarray(f), jnp.asarray(b),
                                    stride, k // 2)).reshape(-1)
    assert np.allclose(y_mat, y_np, atol=1e-4)
    assert np.allclose(y_mat, y_jax, atol=1e-4)


def test_toeplitz_conv2d_no_bias_shape():
    rng = np.random.default_rng(8)
    W = toeplitz_conv2d((2, 4, 4), rng.normal(size=(3, 2, 3, 3)).astype(np.float32))
    assert W.shape == (3 * 16, 2 * 16)


def test_toeplitz_preserves_zero_weights():
    """Zero filter taps must stay as stored entries so channel-broadcast tile
    structure survives (reference offset trick, keynet/sparse.py:184-186;
    test/test_sparse.py:126)."""
    f = np.zeros((2, 2, 3, 3), dtype=np.float32)
    f[0, 0, 1, 1] = 1.0  # every other tap zero
    W0 = toeplitz_conv2d((2, 6, 6), f, bias=np.zeros(2, dtype=np.float32))
    f1 = np.ones((2, 2, 3, 3), dtype=np.float32)
    W1 = toeplitz_conv2d((2, 6, 6), f1, bias=np.zeros(2, dtype=np.float32))
    # identical sparsity structure regardless of zero values
    assert W0.nnz == W1.nnz
    assert np.array_equal(W0.indices, W1.indices)
    assert np.array_equal(W0.indptr, W1.indptr)


@pytest.mark.parametrize("inshape,k,stride", [
    ((2, 8, 8), 3, 2),
    ((6, 28, 28), 3, 2),   # LeNet pool1
    ((3, 9, 9), 3, 2),     # odd size
])
def test_toeplitz_avgpool2d_matches_oracles(inshape, k, stride):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(1, *inshape)).astype(np.float32)
    W = toeplitz_avgpool2d(inshape, k, stride)
    y_mat = (W @ _hom(x))[:-1]
    y_np = avgpool2d_oracle(x, k, stride).reshape(-1)
    y_jax = np.asarray(avgpool2d_apply(jnp.asarray(x), k, stride)).reshape(-1)
    assert np.allclose(y_mat, y_np, atol=1e-5)
    assert np.allclose(y_mat, y_jax, atol=1e-5)


# ---------------------------------------------------------------- native parity

@pytest.mark.skipif(not __import__("keynet_tpu.native", fromlist=["native"]).available()
                    or __import__("keynet_tpu.native", fromlist=["native"]).toeplitz_fill is None,
                    reason="native extension not built")
@pytest.mark.parametrize("inshape,M,k,stride,bias", [
    ((2, 8, 8), 3, 3, 1, True),
    ((2, 8, 8), 3, 3, 2, True),
    ((3, 9, 9), 4, 5, 1, False),
    ((2, 6, 6), 2, 1, 1, True),
])
def test_toeplitz_rows_native_matches_numpy(inshape, M, k, stride, bias):
    """The C++ single-pass emitter (native/packer.cpp toeplitz_fill) must
    reproduce the numpy fallback exactly — values AND stored structure (explicit
    zero taps included) — for sorted, scattered, and homogeneous-row requests,
    with and without pooled buffers."""
    from keynet_tpu.toeplitz import _toeplitz_rows_native, toeplitz_conv2d_rows
    import keynet_tpu.toeplitz as T
    import scipy.sparse

    rng = np.random.default_rng(11)
    C = inshape[0]
    f = rng.normal(size=(M, C, k, k)).astype(np.float32)
    f[0, 0, 0, 0] = 0.0  # explicit zero tap must be stored
    b = rng.normal(size=M).astype(np.float32) if bias else None
    Us, Vs = inshape[1] // stride, inshape[2] // stride
    n_out = M * Us * Vs

    def fallback(rows):
        fill = T.native.toeplitz_fill
        T.native.toeplitz_fill = None
        try:
            return toeplitz_conv2d_rows(inshape, f, b, stride, rows)
        finally:
            T.native.toeplitz_fill = fill

    pool = {}
    for rows in [np.arange(n_out + 1),                     # all + homogeneous
                 np.arange(7, 7 + min(40, n_out)),         # contiguous interior
                 rng.permutation(n_out)[:max(5, n_out // 3)],  # scattered
                 np.array([n_out])]:                       # homogeneous only
        S_native = _toeplitz_rows_native(inshape, f, b, stride, rows)
        S_pooled = _toeplitz_rows_native(inshape, f, b, stride, rows, pool=pool)
        S_ref = fallback(rows)
        for S in (S_native, S_pooled):
            assert S.shape == S_ref.shape
            # same stored structure after canonical ordering
            a, r = S.copy(), S_ref.copy()
            a.sort_indices(), r.sort_indices()
            assert a.nnz == r.nnz
            assert np.array_equal(a.indptr, r.indptr)
            assert np.array_equal(a.indices, r.indices)
            assert np.array_equal(a.data, r.data)
