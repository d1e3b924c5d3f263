"""Channel-broadcast keyed avgpools (ops/kronfactor.channel_broadcast_keyed_pool
+ operators.ChannelBroadcastOp): exactness vs the sparse key sandwich, gating,
end-to-end engagement through KeyedModel, and serialization.

Round-3 serving fix: the four keyed VGG-224 pools materialized as ELL were a
scalar 1-D gather (~1.8 GB/s, 192 ms of a 228 ms B=1 forward on v5e); the
factored form stores only the spatial factor (C× less HBM) and batches all
channels through it as MXU work.  Device analog of the reference's
channel-broadcast Conv2dTiledMatrix (keynet/sparse.py:690-777) composed with
its avgpool lowering (keynet/sparse.py:206-212)."""

import numpy as np
import scipy.sparse
import jax.numpy as jnp

from keynet_tpu import keys
from keynet_tpu.globals import GLOBAL
from keynet_tpu.toeplitz import toeplitz_avgpool2d
from keynet_tpu.ops.kronfactor import channel_broadcast_keyed_pool
from keynet_tpu.ops.operators import ChannelBroadcastOp


def _sandwich(inshape, k, s, A, Ainv, x):
    W = scipy.sparse.csr_matrix(toeplitz_avgpool2d(inshape, k, s))
    z = x.T
    if Ainv is not None:
        z = scipy.sparse.csr_matrix(Ainv, dtype=np.float32) @ z
    z = W @ z
    if A is not None:
        z = scipy.sparse.csr_matrix(A, dtype=np.float32) @ z
    return np.asarray(z.T)


def test_channel_broadcast_pool_exact():
    rng = np.random.default_rng(0)
    inshape, outshape = (4, 16, 16), (4, 8, 8)
    A, _ = keys.keygen(outshape, seed=1, local_geometric="givens_orthogonal",
                       alpha=4, blocksize=8,
                       local_photometric="uniform_random_affine",
                       beta=1.0, gamma=1.0)
    _, Ainv = keys.keygen(inshape, seed=2, local_geometric="doubly_stochastic",
                          alpha=2.0, blocksize=8,
                          local_photometric="uniform_random_gain", beta=1.0)
    op = channel_broadcast_keyed_pool(inshape, outshape, 2, 2, A, Ainv)
    assert isinstance(op, ChannelBroadcastOp)
    n1, n2 = int(np.prod(inshape)), int(np.prod(outshape))
    assert op.shape == (n2 + 1, n1 + 1)
    x = rng.standard_normal((3, n1 + 1)).astype(np.float32)
    x[:, -1] = 1.0
    ref = _sandwich(inshape, 2, 2, A, Ainv, x)
    got = np.asarray(op.apply(jnp.asarray(x)))
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
    # nnz accounting matches the materialized pool (I_C ⊗ M plus bias + hom 1)
    M = scipy.sparse.csr_matrix(A, dtype=np.float32) \
        @ scipy.sparse.csr_matrix(toeplitz_avgpool2d(inshape, 2, 2)) \
        @ scipy.sparse.csr_matrix(Ainv, dtype=np.float32)
    M.eliminate_zeros()
    assert abs(op.nnz() - M.nnz) <= 0.01 * M.nnz


def test_channel_broadcast_pool_identity_sides():
    """Either key side may be None (identity): first/last pool layers."""
    rng = np.random.default_rng(1)
    inshape, outshape = (2, 8, 8), (2, 4, 4)
    _, Ainv = keys.keygen(inshape, seed=3, local_geometric="permutation",
                          blocksize=4)
    op = channel_broadcast_keyed_pool(inshape, outshape, 2, 2, None, Ainv)
    assert op is not None
    n1 = int(np.prod(inshape))
    x = rng.standard_normal((2, n1 + 1)).astype(np.float32)
    x[:, -1] = 1.0
    ref = _sandwich(inshape, 2, 2, None, Ainv, x)
    got = np.asarray(op.apply(jnp.asarray(x)))
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_channel_broadcast_inner_stays_f32_under_bf16_tier():
    """TILE_DTYPE=bfloat16 must not leak into the pool spatial factor: bf16
    tiles cost ~2e-3 relative error (measured at VGG-224 pool2_2), breaking
    the f32 equivalence tier and tripping the selfcheck into the slow ELL
    fallback.  The factor is tiny next to conv tile stores, so it stays f32."""
    import jax.numpy as jnp
    inshape, outshape = (4, 16, 16), (4, 8, 8)
    A, _ = keys.keygen(outshape, seed=1, local_geometric="givens_orthogonal",
                       alpha=4, blocksize=8,
                       local_photometric="uniform_random_gain", beta=1.0)
    _, Ainv = keys.keygen(inshape, seed=2, local_geometric="givens_orthogonal",
                          alpha=4, blocksize=8,
                          local_photometric="uniform_random_gain", beta=1.0)
    old = GLOBAL.get("TILE_DTYPE")
    GLOBAL["TILE_DTYPE"] = "bfloat16"
    try:
        op = channel_broadcast_keyed_pool(inshape, outshape, 2, 2, A, Ainv)
        assert op is not None
        for name, arr in op.arrays().items():
            assert arr.dtype != jnp.bfloat16, (name, arr.dtype)
        assert GLOBAL["TILE_DTYPE"] == "bfloat16"  # override restored
    finally:
        if old is None:
            GLOBAL.pop("TILE_DTYPE", None)
        else:
            GLOBAL["TILE_DTYPE"] = old


def test_channel_broadcast_gate_declines():
    """Per-row global photometric keys (channel blocks NOT identical) must
    decline so the layer falls back to the materialized path."""
    inshape, outshape = (4, 8, 8), (4, 4, 4)
    A, _ = keys.keygen(outshape, seed=4,
                       global_photometric="uniform_random_affine",
                       beta=1.0, gamma=1.0, blocksize=4)
    _, Ainv = keys.keygen(inshape, seed=5,
                          global_photometric="uniform_random_affine",
                          beta=1.0, gamma=1.0, blocksize=4)
    assert channel_broadcast_keyed_pool(inshape, outshape, 2, 2, A, Ainv) is None


def test_pool_keyed_model_end_to_end():
    """KeyedModel engages the factored pool (POOL_FACTOR_MIN_N forced low),
    the keynet matches the source net, and the op survives serialization."""
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, AvgPool2d, Linear
    import keynet_tpu as keynet
    old = GLOBAL.get("POOL_FACTOR_MIN_N")
    GLOBAL["POOL_FACTOR_MIN_N"] = 1
    try:
        net = Model([Conv2d("conv1", 3, 4, 3), ReLU("relu1"),
                     AvgPool2d("pool1", 2, 2),
                     Linear("fc1", 4 * 8 * 8, 10)],
                    inshape=(3, 16, 16), seed=2)
        sensor, knet = keynet.Keynet((3, 16, 16), net,
                                     local_geometric="givens_orthogonal",
                                     alpha=4, blocksize=8,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        ops = {n: l.op() for n, l in knet.layers().items() if l != "relu"}
        assert any(isinstance(o, ChannelBroadcastOp) for o in ops.values()), \
            {n: type(o).__name__ for n, o in ops.items()}
        x = np.random.default_rng(0).normal(size=(2, 3, 16, 16)).astype(np.float32)
        y = np.asarray(net.forward(x))
        xc = sensor.fromtensor(x).encrypt().tensor()
        yk = np.asarray(knet.forward(xc))
        assert np.abs(y - yk).max() < 1e-4 * max(1.0, np.abs(y).max())

        from keynet_tpu.serialize import save_keynet, load_keynet
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "pool.npz")
            save_keynet(p, knet, sensor=sensor, include_keys=True)
            _, knet2 = load_keynet(p)
            ops2 = [l.op() for l in knet2.layers().values() if l != "relu"]
            assert any(isinstance(o, ChannelBroadcastOp) for o in ops2)
            assert np.array_equal(yk, np.asarray(knet2.forward(xc)))
    finally:
        if old is None:
            GLOBAL.pop("POOL_FACTOR_MIN_N", None)
        else:
            GLOBAL["POOL_FACTOR_MIN_N"] = old
