"""DirectConvOp: identity-keyed conv/avgpool applied as an XLA convolution
(round-3 VERDICT #2 — identity keys must be the fastest configuration).
Oracle: the homogeneous Toeplitz matrix it replaces
(reference keynet/sparse.py:163-212)."""

import numpy as np
import scipy.sparse
import pytest
import jax.numpy as jnp

from keynet_tpu.toeplitz import toeplitz_conv2d, toeplitz_avgpool2d
from keynet_tpu.ops.operators import DirectConvOp


@pytest.mark.parametrize("inshape,M,k,stride,bias", [
    ((1, 8, 8), 4, 3, 1, True),
    ((3, 8, 8), 6, 3, 2, True),
    ((2, 7, 7), 3, 5, 1, False),   # ragged odd size, no bias
    ((4, 12, 10), 5, 3, 2, True),  # non-square image
])
def test_directconv_matches_toeplitz(inshape, M, k, stride, bias):
    rng = np.random.default_rng(0)
    C, H, W = inshape
    w = rng.standard_normal((M, C, k, k)).astype(np.float32)
    w[0, 0, 0, 0] = 0.0  # explicit zero tap: structure-preservation case
    b = rng.standard_normal(M).astype(np.float32) if bias else None
    T = scipy.sparse.csr_matrix(toeplitz_conv2d(inshape, w, bias=b,
                                                stride=stride))
    outshape = (M, H // stride, W // stride)
    if b is None:  # plain (n_out, n_in) matrix -> homogeneous manually
        from keynet_tpu.homogeneous import sparse_affine_to_linear
        T = scipy.sparse.csr_matrix(sparse_affine_to_linear(T))
    op = DirectConvOp(jnp.asarray(w), None if b is None else jnp.asarray(b),
                      inshape, outshape, stride)
    assert op.shape == T.shape
    x = rng.standard_normal((3, T.shape[1])).astype(np.float32)
    x[:, -1] = 1.0
    got = np.asarray(op.apply(jnp.asarray(x)))
    exp = np.asarray((T @ x.T).T)
    assert np.abs(got - exp).max() < 1e-4 * max(1.0, np.abs(exp).max())
    # exact Toeplitz nnz parity (explicit zeros preserved)
    assert op.nnz() == T.nnz


@pytest.mark.parametrize("inshape,k,stride", [
    ((2, 8, 8), 3, 2),
    ((3, 14, 14), 2, 2),    # even kernel (VGG-style pool)
    ((1, 7, 7), 3, 2),      # ragged
])
def test_directpool_matches_toeplitz(inshape, k, stride):
    rng = np.random.default_rng(1)
    C, H, W = inshape
    T = scipy.sparse.csr_matrix(toeplitz_avgpool2d(inshape, k, stride))
    outshape = (C, H // stride, W // stride)
    op = DirectConvOp(jnp.full((C, 1, k, k), 1.0 / (k * k), dtype=jnp.float32),
                      None, inshape, outshape, stride, groups=C)
    assert op.shape == T.shape
    x = rng.standard_normal((2, T.shape[1])).astype(np.float32)
    x[:, -1] = 1.0
    got = np.asarray(op.apply(jnp.asarray(x)))
    exp = np.asarray((T @ x.T).T)
    assert np.abs(got - exp).max() < 1e-5 * max(1.0, np.abs(exp).max())
    assert op.nnz() == T.nnz


def test_identity_keynet_routes_direct_and_matches_source():
    """IdentityKeynet conv/pool layers must take the DirectConvOp route, keep
    exact keynet(encrypt(x)) == net(x), and report Toeplitz nnz."""
    import keynet_tpu as keynet
    from keynet_tpu.globals import GLOBAL
    net = keynet.models.LeNet_AvgPool(seed=1)
    sensor, knet = keynet.IdentityKeynet((1, 28, 28), net, seed=0)
    knet._build()
    kinds = {n: type(l.op()).__name__ for n, l in knet.layers().items()
             if l != "relu"}
    assert kinds["conv1"] == "DirectConvOp"
    assert kinds["pool1"] == "DirectConvOp"
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 1, 28, 28)).astype(np.float32)
    xc = sensor.fromtensor(x).encrypt().tensor()
    y = np.asarray(knet.forward(xc))
    y_src = np.asarray(net.forward(x))
    assert np.abs(y - y_src).max() < 1e-5 * max(1.0, np.abs(y_src).max())
    # nnz parity with the materialized route
    GLOBAL["IDENTITY_DIRECT"] = "never"
    try:
        _, knet2 = keynet.IdentityKeynet((1, 28, 28), net, seed=0)
        knet2._build()
        for n, l in knet.layers().items():
            if l == "relu":
                continue
            assert l.nnz() == knet2.layers()[n].nnz(), n
    finally:
        GLOBAL["IDENTITY_DIRECT"] = "auto"


def test_directconv_serialize_roundtrip(tmp_path):
    import keynet_tpu as keynet
    from keynet_tpu import serialize
    net = keynet.models.LeNet_AvgPool(seed=2)
    sensor, knet = keynet.IdentityKeynet((1, 28, 28), net, seed=0)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 28, 28)).astype(np.float32)
    xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
    y0 = np.asarray(knet.forward(xc))
    p = str(tmp_path / "id.npz")
    serialize.save_keynet(p, knet)
    _, knet2 = serialize.load_keynet(p)
    y1 = np.asarray(knet2.forward(xc))
    assert np.array_equal(y0, y1)
