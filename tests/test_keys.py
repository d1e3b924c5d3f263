"""Key-material invariants: every family must satisfy A·A⁻¹ = I, orthogonal
families must be orthogonal, stochastic families doubly stochastic, and keygen
compositions must invert for every configuration (the invertibility self-check
pattern of reference test/test_sparse.py:25-34 applied across the schema)."""

import numpy as np
import scipy.sparse
import pytest

from keynet_tpu import keys
from keynet_tpu.keys import keygen


def _is_identity(A, atol=1e-8):
    n = A.shape[0]
    return np.allclose(A.toarray() if scipy.sparse.issparse(A) else A, np.eye(n), atol=atol)


def test_permutation_inverse():
    rng = np.random.default_rng(0)
    P, Pinv = keys.permutation_matrix(50, rng, withinverse=True)
    assert _is_identity(P @ Pinv)
    assert np.allclose(np.asarray(P.sum(axis=0)), 1) and np.allclose(np.asarray(P.sum(axis=1)), 1)


@pytest.mark.parametrize("n,k", [(16, 4), (64, 40), (10, 3)])
def test_givens_orthogonal(n, k):
    rng = np.random.default_rng(1)
    S, Sinv = keys.givens_orthogonal_matrix(n, k, rng, withinverse=True)
    assert _is_identity(S @ Sinv, atol=1e-9)
    assert _is_identity(S @ S.T, atol=1e-9)  # orthogonality


@pytest.mark.parametrize("n,k", [(49, 2), (64, 5)])
def test_doubly_stochastic(n, k):
    rng = np.random.default_rng(2)
    A, Ainv = keys.doubly_stochastic_matrix(n, k, rng, withinverse=True)
    assert _is_identity((A @ Ainv), atol=1e-6)
    D = A.toarray()
    # rows are exactly normalized; columns only approximately for the k<=3
    # short-Sinkhorn fast path (the reference uses n_iter=10 there too,
    # keynet/sparse.py:339)
    assert np.allclose(D.sum(axis=1), 1, atol=1e-6)
    assert np.allclose(D.sum(axis=0), 1, atol=0.5)
    counts = np.diff(A.tocsr().indptr)
    assert counts.max() <= k


def test_doubly_stochastic_converged():
    rng = np.random.default_rng(6)
    A, _ = keys.doubly_stochastic_matrix(32, 5, rng, n_iter=400, withinverse=True)
    D = A.toarray()
    assert np.allclose(D.sum(axis=0), 1, atol=1e-3)
    assert np.allclose(D.sum(axis=1), 1, atol=1e-3)
    assert D.min() >= 0


def test_positive_definite_block_diagonal():
    rng = np.random.default_rng(3)
    A, Ainv = keys.positive_definite_block_diagonal(20, 6, rng, withinverse=True)
    assert _is_identity(A @ Ainv, atol=1e-8)


def test_repeat_block_diagonal_ragged():
    rng = np.random.default_rng(4)
    B = scipy.sparse.csr_matrix(rng.random((4, 4)))
    A = keys.repeat_block_diagonal(B, (10, 10))
    D = A.toarray()
    assert np.allclose(D[0:4, 0:4], B.toarray())
    assert np.allclose(D[4:8, 4:8], B.toarray())
    assert np.allclose(D[8:10, 8:10], np.eye(2))  # ragged remainder is identity


def test_orthogonal_block_diagonal_list_form():
    """Reference keynet/sparse.py:238-269: a LIST of distinct orthogonal blocks
    cycled down the diagonal; inverse = transpose; ragged edges clipped."""
    rng = np.random.default_rng(5)
    mats = [keys.givens_orthogonal_matrix(4, 8, rng) for _ in range(3)]
    A, Ainv = keys.orthogonal_block_diagonal(mats, withinverse=True)
    assert A.shape == (12, 12)
    assert _is_identity(A @ Ainv, atol=1e-9)
    D = A.toarray()
    for k in range(3):
        assert np.allclose(D[4 * k:4 * k + 4, 4 * k:4 * k + 4], mats[k].toarray())
    # blocks cycle when shape exceeds len(mats)*blocksize; ragged edge clips
    A2 = keys.orthogonal_block_diagonal(mats, shape=(18, 18))
    D2 = A2.toarray()
    assert np.allclose(D2[12:16, 12:16], mats[0].toarray())  # cycles back to mats[0]
    assert np.allclose(D2[16:18, 16:18], mats[1].toarray()[:2, :2])  # clipped
    # single-matrix form requires explicit shape, matches repeat semantics
    A3 = keys.orthogonal_block_diagonal(mats[0], shape=(8, 8))
    assert np.allclose(A3.toarray()[4:8, 4:8], mats[0].toarray())


KEY_CONFIGS = [
    dict(),
    dict(global_geometric="permutation"),
    dict(global_geometric="givens_orthogonal", alpha=4),
    dict(global_geometric="hierarchical_permutation", hierarchical_blockshape=(2, 2),
         hierarchical_permute_at_level=(0, 1)),
    dict(global_geometric="hierarchical_rotation", hierarchical_blockshape=(2, 2),
         hierarchical_permute_at_level=(0,)),
    dict(local_geometric="permutation", blocksize=8),
    dict(local_geometric="doubly_stochastic", alpha=2, blocksize=8),
    dict(local_geometric="givens_orthogonal", alpha=4, blocksize=8),
    dict(global_photometric="uniform_random_gain", beta=1.0),
    dict(global_photometric="uniform_random_bias", gamma=1.0),
    dict(global_photometric="uniform_random_affine", beta=1.0, gamma=1.0),
    dict(global_photometric="constant_bias", gamma=2.0),
    dict(global_photometric="linear_bias", gamma=2.0),
    dict(global_photometric="blockwise_constant_bias", gamma=1.0, blocksize=8),
    dict(local_photometric="uniform_random_gain", beta=1.0, blocksize=8),
    dict(local_photometric="uniform_random_bias", gamma=1.0, blocksize=8),
    dict(local_photometric="uniform_random_affine", beta=1.0, gamma=1.0, blocksize=8),
    dict(memoryorder="block", blocksize=8, global_geometric="permutation"),
    dict(memoryorder="block", blocksize=8, local_geometric="givens_orthogonal", alpha=2,
         global_geometric="hierarchical_permutation", hierarchical_blockshape=(2, 2),
         hierarchical_permute_at_level=(0,), local_photometric="uniform_random_affine",
         beta=1.0, gamma=1.0),
]


@pytest.mark.parametrize("cfg", KEY_CONFIGS)
def test_keygen_inverse_identity(cfg):
    shape = (2, 16, 16)
    A, Ainv = keygen(shape, seed=5, **cfg)
    n = int(np.prod(shape)) + 1
    assert A.shape == (n, n)
    assert _is_identity(A @ Ainv, atol=1e-6)
    # keys must leave the homogeneous coordinate fixed
    e = np.zeros(n)
    e[-1] = 1.0
    assert np.allclose(A.T @ e, e)  # last row is [0...0 1]


def test_keygen_fc_shape():
    """height=width=1 degenerates block structure to global (keynet/system.py:332-335)."""
    A, Ainv = keygen((120, 1, 1), local_geometric="permutation", blocksize=8, seed=0)
    assert _is_identity(A @ Ainv, atol=1e-8)


def test_keygen_ragged_blocksize_repair():
    """28x28 image with blocksize 8 is repaired to divisor 7 (keynet/system.py:336-343)."""
    A, Ainv = keygen((1, 28, 28), local_geometric="permutation", blocksize=8, seed=0)
    assert _is_identity(A @ Ainv, atol=1e-8)


def test_keygen_seed_determinism():
    cfg = dict(global_geometric="permutation", global_photometric="uniform_random_affine",
               beta=1.0, gamma=1.0)
    A1, _ = keygen((1, 8, 8), seed=7, **cfg)
    A2, _ = keygen((1, 8, 8), seed=7, **cfg)
    A3, _ = keygen((1, 8, 8), seed=8, **cfg)
    assert (A1 != A2).nnz == 0
    assert (A1 != A3).nnz > 0


def test_keypair_selfcheck_flag():
    """GLOBAL['SELFCHECK'] runs A·A⁻¹==I on every keygen (SURVEY §5.2 debug pass)."""
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.keys import keygen, keypair_selfcheck
    import scipy.sparse
    GLOBAL["SELFCHECK"] = True
    try:
        A, Ainv = keygen((3, 8, 8), local_geometric="givens_orthogonal", alpha=2,
                         blocksize=4, local_photometric="uniform_random_affine",
                         beta=1.0, gamma=1.0, seed=3)
    finally:
        GLOBAL["SELFCHECK"] = False
    assert keypair_selfcheck(A, Ainv) < 1e-4
    B = scipy.sparse.identity(A.shape[0], format="csr") * 2.0
    try:
        keypair_selfcheck(B, B)
        raised = False
    except AssertionError:
        raised = True
    assert raised


def test_givens_orthogonal_no_self_pair():
    """Odd n with pool-exhausting k_iter: the refill leftover must never pair
    with itself (an i==j 'rotation' scales a row and breaks A^-1 = A^T)."""
    for seed in range(20):
        rng = np.random.default_rng(seed)
        S, Sinv = keys.givens_orthogonal_matrix(5, 50, rng, withinverse=True)
        assert _is_identity(S @ Sinv, atol=1e-9)
        assert _is_identity(S @ S.T, atol=1e-9)


def test_keygen_fused_inverse_matches_generic():
    """The one-pass inverse-side emission (keys._emit_perm_blockdiag_affine,
    taken when the dense-block inverse would dominate keygen) must equal the
    generic tile-permute-scale composition exactly."""
    from keynet_tpu.globals import GLOBAL
    recipes = [
        dict(global_geometric="hierarchical_permutation",
             hierarchical_blockshape=(2, 2), hierarchical_permute_at_level=(0,),
             local_geometric="doubly_stochastic", alpha=2.0, blocksize=4,
             local_photometric="uniform_random_affine", beta=1.0, gamma=1.0),
        dict(global_geometric="permutation", local_geometric="doubly_stochastic",
             alpha=2.0, blocksize=4, local_photometric="uniform_random_gain",
             beta=1.0),
        dict(global_geometric="identity", local_geometric="doubly_stochastic",
             alpha=2.0, blocksize=4, local_photometric="identity"),
    ]
    for shape in [(3, 16, 16), (6, 1, 1)]:
        for r in recipes:
            GLOBAL["KEYGEN_FUSE_NNZ"] = 1
            try:
                A1, Ainv1 = keys.keygen(shape, seed=7, **r)
            finally:
                GLOBAL["KEYGEN_FUSE_NNZ"] = 10 ** 18
            try:
                A2, Ainv2 = keys.keygen(shape, seed=7, **r)
            finally:
                GLOBAL.pop("KEYGEN_FUSE_NNZ", None)
            assert (A1 - A2).nnz == 0
            d = (Ainv1 - Ainv2)
            assert d.nnz == 0 or abs(d).max() < 1e-14
            assert keys.keypair_selfcheck(A1, Ainv1) < 1e-6
