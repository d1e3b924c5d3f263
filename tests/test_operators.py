"""Device operator formats must reproduce the host matrix exactly, including
ragged shapes (the dense-reconstruction-equality pattern of reference
test/test_sparse.py:122-199, with the ragged sizes it uses: 474x78, 27x26, 17x32)."""

import numpy as np
import scipy.sparse
import pytest

from keynet_tpu.ops.operators import DenseOp, BlockSparseOp, EllOp, materialize

SHAPES = [(474, 78), (27, 26), (17, 32), (256, 256), (130, 257)]


def _random_sparse(shape, density=0.05, seed=0):
    return scipy.sparse.random(*shape, density=density, random_state=seed,
                               dtype=np.float32, format="csr")


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("cls", [DenseOp, EllOp])
def test_op_matches_scipy(shape, cls):
    A = _random_sparse(shape)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, shape[1])).astype(np.float32)
    op = cls.from_scipy(A)
    y = np.asarray(op.apply(x))
    y_ref = x @ A.toarray().T
    assert np.allclose(y, y_ref, atol=1e-4), np.abs(y - y_ref).max()


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("tileshape", [(128, 128), (16, 16), (8, 32)])
def test_blocksparse_matches_scipy(shape, tileshape):
    A = _random_sparse(shape, density=0.08, seed=2)
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, shape[1])).astype(np.float32)
    op = BlockSparseOp.from_scipy(A, tileshape=tileshape)
    y = np.asarray(op.apply(x))
    y_ref = x @ A.toarray().T
    assert np.allclose(y, y_ref, atol=1e-4)


def test_blocksparse_dedup():
    """Repeated identical tiles must be stored once (the reference's tile
    dedup, keynet/sparse.py:556-568)."""
    B = np.arange(16, dtype=np.float32).reshape(4, 4)
    A = scipy.sparse.block_diag([B] * 8, format="csr")
    plan = BlockSparseOp.plan(A.tocoo(), tileshape=(4, 4))
    # one zero tile + one content tile
    assert plan["tiles"].shape[0] == 2
    op = BlockSparseOp.from_scipy(A, tileshape=(4, 4))
    x = np.ones((1, 32), dtype=np.float32)
    assert np.allclose(np.asarray(op.apply(x)), x @ A.toarray().T)


def test_blocksparse_keeps_explicit_zero_structure():
    """Explicit zeros participate in tile content (structure-preserving)."""
    rows = np.array([0, 5, 9])
    cols = np.array([0, 5, 9])
    vals = np.array([1.0, 0.0, 2.0], dtype=np.float32)
    A = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(10, 10))
    op = BlockSparseOp.from_scipy(A, tileshape=(4, 4))
    x = np.eye(10, dtype=np.float32)
    assert np.allclose(np.asarray(op.apply(x)), A.toarray().T)


def test_materialize_auto_selection():
    small = _random_sparse((64, 64), seed=3)
    assert isinstance(materialize(small), DenseOp)
    op = materialize(small, format="block")
    assert isinstance(op, BlockSparseOp)
    op = materialize(small, format="ell")
    assert isinstance(op, EllOp)


def test_ops_are_pytrees():
    import jax
    A = _random_sparse((32, 48), seed=4)
    for cls in (DenseOp, EllOp):
        op = cls.from_scipy(A)
        leaves = jax.tree_util.tree_leaves(op)
        assert len(leaves) >= 1
    op = BlockSparseOp.from_scipy(A, tileshape=(16, 16))
    x = np.ones((2, 48), dtype=np.float32)
    f = jax.jit(lambda o, v: o.apply(v))
    assert np.allclose(np.asarray(f(op, x)), x @ A.toarray().T, atol=1e-5)


def test_block_ell_pallas_kernel_interpret():
    """Pallas Block-ELL kernel vs numpy reference in interpret mode (the real
    kernel runs TPU-only; this pins its semantics in the CPU suite)."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import block_ell_matmul

    rng = np.random.default_rng(2)
    TM = TN = 128
    n_rb, KB, n_uniq, B = 5, 3, 9, 4
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0  # tile 0 is the zero-padding tile
    tile_ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_rb, size=(n_rb, KB)).astype(np.int32)
    x = rng.standard_normal((B, n_rb * TN)).astype(np.float32)

    y = np.asarray(block_ell_matmul(jnp.asarray(x), jnp.asarray(tiles),
                                    jnp.asarray(tile_ids), jnp.asarray(col_blk),
                                    n_rb * TM, interpret=True))
    ref = np.zeros((B, n_rb * TM), np.float32)
    for r in range(n_rb):
        for k in range(KB):
            ref[:, r*TM:(r+1)*TM] += \
                x[:, col_blk[r, k]*TN:(col_blk[r, k]+1)*TN] @ tiles[tile_ids[r, k]].T
    assert np.abs(y[:, :n_rb*TM] - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())
