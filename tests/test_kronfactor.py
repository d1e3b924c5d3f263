"""Kronecker-factored keyed convs (keynet_tpu/ops/kronfactor.py): exactness
against the dense key sandwich, gating, mask leak resistance, and end-to-end
conversion through KeyedModel.

This is the round-3 replacement for materializing whole-image-block keyed
convs as Block-ELL tiles (VERDICT #2): the reference cannot build these
layers at all at VGG scale (keynet/layer.py:32 materializes ~1e9-nnz scipy)."""

import numpy as np
import scipy.sparse
import jax.numpy as jnp
import pytest

from keynet_tpu import keys
from keynet_tpu.globals import GLOBAL
from keynet_tpu.toeplitz import toeplitz_conv2d
from keynet_tpu.ops.kronfactor import (kron_factored_keyed_conv,
                                       identical_channel_blocks,
                                       random_orthogonal)
from keynet_tpu.ops.operators import ChainedOp, TapSumOp, KroneckerOp


def _sandwich(shape, outshape, w, b, stride, A, Ainv, x):
    W = toeplitz_conv2d(shape, w, bias=b, stride=stride)
    M = scipy.sparse.csr_matrix(A, dtype=np.float32) @ W \
        @ scipy.sparse.csr_matrix(Ainv, dtype=np.float32)
    return np.asarray(M @ x)


@pytest.mark.parametrize("shape,blocksize", [((4, 8, 8), 8),    # whole image
                                             ((4, 16, 16), 8)])  # 4 runs/chan
def test_kron_factored_exact(shape, blocksize):
    rng = np.random.default_rng(0)
    C = shape[0]
    w = (rng.standard_normal((C, C, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(C) * 0.1).astype(np.float32)
    A, _ = keys.keygen(shape, seed=1, local_geometric="givens_orthogonal",
                       alpha=8, blocksize=blocksize,
                       local_photometric="uniform_random_affine",
                       beta=1.0, gamma=1.0)
    _, Ainv = keys.keygen(shape, seed=2, local_geometric="givens_orthogonal",
                          alpha=8, blocksize=blocksize,
                          local_photometric="uniform_random_affine",
                          beta=1.0, gamma=1.0)
    op = kron_factored_keyed_conv(shape, shape, w, b, 1, A, Ainv,
                                  rng=np.random.default_rng(3))
    assert op is not None and isinstance(op, ChainedOp)
    assert any(isinstance(o, TapSumOp) for o in op.ops)
    n = int(np.prod(shape))
    x = rng.standard_normal(n + 1).astype(np.float32)
    x[-1] = 1.0
    ref = _sandwich(shape, shape, w, b, 1, A, Ainv, x)
    got = np.asarray(op.apply(jnp.asarray(x[None])))[0]
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_kron_factored_identity_keys_and_stride():
    """Identity output key (last layer) and stride-2 convs also factor."""
    rng = np.random.default_rng(1)
    shape, out = (4, 16, 16), (6, 8, 8)
    w = (rng.standard_normal((6, 4, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(6) * 0.1).astype(np.float32)
    _, Ainv = keys.keygen(shape, seed=5, local_geometric="permutation",
                          blocksize=8, local_photometric="uniform_random_gain",
                          beta=1.0)
    n_out = int(np.prod(out)) + 1
    A = scipy.sparse.identity(n_out, format="csr")
    op = kron_factored_keyed_conv(shape, out, w, b, 2, A, Ainv,
                                  rng=np.random.default_rng(6))
    assert op is not None
    n = int(np.prod(shape))
    x = rng.standard_normal(n + 1).astype(np.float32)
    x[-1] = 1.0
    ref = _sandwich(shape, out, w, b, 2, A, Ainv, x)
    got = np.asarray(op.apply(jnp.asarray(x[None])))[0]
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_kron_global_permutation_keys_factor_exactly():
    """Global permutation keys factor as G·(I_C ⊗ D): the builder peels the
    permutation into KroneckerOp gathers (round-3 extension — this is the
    cifar_bn fat-ELL case, VERDICT #6) and stays exact."""
    rng = np.random.default_rng(2)
    shape = (4, 8, 8)
    w = (rng.standard_normal((4, 4, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(4) * 0.1).astype(np.float32)
    A, Ainv = keys.keygen(shape, seed=7, global_geometric="permutation")
    op = kron_factored_keyed_conv(shape, shape, w, b, 1, A, Ainv,
                                  rng=np.random.default_rng(8))
    assert op is not None
    n = int(np.prod(shape))
    x = rng.standard_normal(n + 1).astype(np.float32)
    x[-1] = 1.0
    ref = _sandwich(shape, shape, w, b, 1, A, Ainv, x)
    got = np.asarray(op.apply(jnp.asarray(x[None])))[0]
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
    # mixed: permutation output key, doubly-stochastic-style input key
    A2, _ = keys.keygen(shape, seed=9, global_geometric="hierarchical_permutation",
                        hierarchical_blockshape=(2, 2),
                        hierarchical_permute_at_level=(0,),
                        local_geometric="permutation", blocksize=8)
    _, Ainv2 = keys.keygen(shape, seed=10, local_geometric="givens_orthogonal",
                           alpha=4, blocksize=8)
    op2 = kron_factored_keyed_conv(shape, shape, w, b, 1, A2, Ainv2,
                                   rng=np.random.default_rng(11))
    if op2 is not None:  # hierarchical perms at tiny shapes may degenerate
        ref2 = _sandwich(shape, shape, w, b, 1, A2, Ainv2, x)
        got2 = np.asarray(op2.apply(jnp.asarray(x[None])))[0]
        assert np.abs(got2 - ref2).max() < 1e-4 * max(1.0, np.abs(ref2).max())


def test_kron_gate_declines_non_factorable_keys():
    """Keys without identical per-channel spatial structure decline: per-row
    global photometric (blocks not identical)."""
    rng = np.random.default_rng(2)
    shape = (4, 8, 8)
    w = (rng.standard_normal((4, 4, 3, 3)) * 0.1).astype(np.float32)
    b = np.zeros(4, dtype=np.float32)
    G, Ginv = keys.keygen(shape, seed=8, global_photometric="uniform_random_affine",
                          beta=1.0, gamma=1.0, blocksize=8)
    assert kron_factored_keyed_conv(shape, shape, w, b, 1, G, Ginv,
                                    rng=np.random.default_rng(9)) is None


def test_kron_factors_do_not_leak():
    """Published factors must not expose the key spatial block, the raw conv
    channel matrices, or the raw tap shift matrices (docs/DESIGN.md
    §kron-factored): every published array is masked by a secret dense
    orthogonal and the tap mixer."""
    rng = np.random.default_rng(4)
    shape = (4, 8, 8)
    p = 64
    w = (rng.standard_normal((4, 4, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(4) * 0.1).astype(np.float32)
    A, _ = keys.keygen(shape, seed=11, local_geometric="givens_orthogonal",
                       alpha=8, blocksize=8,
                       local_photometric="uniform_random_affine", beta=1.0,
                       gamma=1.0)
    _, Ainv = keys.keygen(shape, seed=12, local_geometric="givens_orthogonal",
                          alpha=8, blocksize=8,
                          local_photometric="uniform_random_affine", beta=1.0,
                          gamma=1.0)
    op = kron_factored_keyed_conv(shape, shape, w, b, 1, A, Ainv,
                                  rng=np.random.default_rng(13))
    F2, M, F1 = op.ops
    D_out, _ = identical_channel_blocks(scipy.sparse.csr_matrix(A), p, 4)
    D_in, _ = identical_channel_blocks(scipy.sparse.csr_matrix(Ainv), p, 4)
    # F1 spatial factor is D_out masked by a secret orthogonal, not D_out
    assert np.abs(np.asarray(F1.Sm) - D_out).max() > 1e-2
    assert np.abs(np.asarray(F2.Sm) - D_in).max() > 1e-2
    # no published channel matrix equals any raw tap channel matrix
    K = np.asarray(M.K)
    k_taps = w.reshape(4, 4, 9).transpose(2, 0, 1)
    d = np.abs(K[:, None] - k_taps[None, :]).max(axis=(2, 3))
    assert d.min() > 1e-3
    # no published spatial factor equals any raw tap shift matrix (the tap
    # mixer also prevents the center-tap identity from appearing)
    from keynet_tpu.ops.kronfactor import _tap_matrices
    taps = [np.asarray(t.todense(), dtype=np.float32)
            for t in _tap_matrices(shape, 3, 3, 1)]
    S = np.asarray(M.S)
    d = np.abs(S[:, None] - np.stack(taps)[None, :]).max(axis=(2, 3))
    assert d.min() > 1e-2


def test_kron_chain_keyed_model_end_to_end():
    """KeyedLayer engages the Kronecker path at streaming scale and the full
    keynet still matches the source net; the chain also survives
    serialization."""
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, Linear
    import keynet_tpu as keynet
    old = GLOBAL["STREAM_NNZ"]
    GLOBAL["STREAM_NNZ"] = 10_000
    try:
        net = Model([Conv2d("conv1", 4, 4, 3), ReLU("relu1"),
                     Conv2d("conv2", 4, 4, 3), ReLU("relu2"),
                     Linear("fc1", 4 * 16 * 16, 10)],
                    inshape=(4, 16, 16), seed=2)
        sensor, knet = keynet.Keynet((4, 16, 16), net,
                                     local_geometric="givens_orthogonal",
                                     alpha=8, blocksize=16,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        ops = [l.op() for l in knet.layers().values() if l != "relu"]
        chains = [op for op in ops if isinstance(op, ChainedOp)]
        assert chains and any(isinstance(o, TapSumOp)
                              for c in chains for o in c.ops), \
            [type(o).__name__ for o in ops]
        x = np.random.default_rng(0).normal(size=(2, 4, 16, 16)).astype(np.float32)
        y = np.asarray(net.forward(x))
        xc = sensor.fromtensor(x).encrypt().tensor()
        yk = np.asarray(knet.forward(xc))
        assert np.abs(y - yk).max() < 1e-4 * max(1.0, np.abs(y).max())

        from keynet_tpu.serialize import save_keynet, load_keynet
        import tempfile, os
        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "kron.npz")
            save_keynet(p, knet, sensor=sensor, include_keys=True)
            _, knet2 = load_keynet(p)
            assert np.array_equal(yk, np.asarray(knet2.forward(xc)))
    finally:
        GLOBAL["STREAM_NNZ"] = old


def test_random_orthogonal():
    Q = random_orthogonal(33, np.random.default_rng(0))
    assert np.abs(Q @ Q.T - np.eye(33)).max() < 1e-5


def test_kron_wide_range_whole_image_blocks():
    """npix above KRON_NPIX_MAX engages only for keys whose block period
    exceeds KRON_WIDE_PERIOD (whole-image blocks stream into pairwise-distinct
    tiles — the stochastic VGG-224 conv3_1 case); small-period keys at the
    same npix decline and keep the streamed Block-ELL path."""
    rng = np.random.default_rng(5)
    shape = (2, 12, 12)  # npix = 144
    w = (rng.standard_normal((2, 2, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(2) * 0.1).astype(np.float32)
    # out key fine-period (6x6 tiles -> 36), in key whole-image (144): the in
    # side trips the wide gate (mirrors conv3_1's p_out=196 / p_in=3136)
    A, _ = keys.keygen(shape, seed=21, local_geometric="givens_orthogonal",
                       alpha=8, blocksize=6)
    _, Ainv = keys.keygen(shape, seed=22, local_geometric="givens_orthogonal",
                          alpha=8, blocksize=12)
    sentinel = object()
    old_max = GLOBAL.get("KRON_NPIX_MAX", sentinel)
    old_per = GLOBAL.get("KRON_WIDE_PERIOD", sentinel)
    GLOBAL["KRON_NPIX_MAX"] = 64
    GLOBAL["KRON_WIDE_PERIOD"] = 64
    try:
        op = kron_factored_keyed_conv(shape, shape, w, b, 1, A, Ainv,
                                      rng=np.random.default_rng(23))
        assert op is not None and isinstance(op, ChainedOp)
        n = int(np.prod(shape))
        x = rng.standard_normal(n + 1).astype(np.float32)
        x[-1] = 1.0
        ref = _sandwich(shape, shape, w, b, 1, A, Ainv, x)
        got = np.asarray(op.apply(jnp.asarray(x[None])))[0]
        assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())
        # both sides fine-period at the same npix: decline the wide range
        _, Ainv2 = keys.keygen(shape, seed=24, local_geometric="givens_orthogonal",
                               alpha=8, blocksize=6)
        assert kron_factored_keyed_conv(shape, shape, w, b, 1, A, Ainv2,
                                        rng=np.random.default_rng(25)) is None
    finally:
        for k, v in (("KRON_NPIX_MAX", old_max), ("KRON_WIDE_PERIOD", old_per)):
            if v is sentinel:
                GLOBAL.pop(k, None)
            else:
                GLOBAL[k] = v
