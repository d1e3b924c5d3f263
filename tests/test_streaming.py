"""Streaming keyed-conv emission: exactness against the dense key sandwich and
soundness of the run-period extrapolation fast path (keynet_tpu/ops/streaming.py).

The reference materializes every keyed conv (keynet/layer.py:32); streaming is
this build's VGG-scale replacement, so it gets direct unit coverage at small
shapes with a forced strip cap.
"""

import numpy as np
import scipy.sparse
import jax.numpy as jnp
import pytest

from keynet_tpu import keys
from keynet_tpu.ops.streaming import keyed_conv_streaming, _key_blocks_identical
from keynet_tpu.toeplitz import toeplitz_conv2d


def _exact_sandwich(shape, w, b, stride, A, Ainv, x):
    W = toeplitz_conv2d(shape, w, bias=b, stride=stride)
    A32 = scipy.sparse.csr_matrix(A, dtype=np.float32)
    Ainv32 = scipy.sparse.csr_matrix(Ainv, dtype=np.float32)
    return (A32 @ W @ Ainv32) @ x


def _case(shape, keycfg, cap, seed=0):
    rng = np.random.default_rng(seed)
    C = shape[0]
    w = (rng.standard_normal((C, C, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(C) * 0.1).astype(np.float32)
    A, Ainv = keys.keygen(shape, seed=seed + 1, **keycfg)
    op = keyed_conv_streaming(shape, shape, w, b, 1, A, Ainv, strip_nnz_cap=cap)
    x = rng.standard_normal(int(np.prod(shape))).astype(np.float32)
    xh = np.concatenate([x, [1.0]]).astype(np.float32)
    ref = _exact_sandwich(shape, w, b, 1, A, Ainv, xh)
    got = np.asarray(op.apply(jnp.asarray(xh[None])))[0]
    return op, got, ref


def test_capped_run_extrapolation_engages_and_is_exact():
    """Multi-strip runs (strip cap << run nnz) must still lock the run period
    (divisor-aligned strips + k_run candidate) and extrapolate exactly."""
    cfg = dict(local_geometric="givens_orthogonal", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    op, got, ref = _case((8, 56, 56), cfg, cap=100_000)
    assert op.streaming_stats["extrapolated"] > 0, op.streaming_stats
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_sparse_local_key_no_false_intra_run_lock():
    """alpha=1 Givens keys leave most strips pure-identity: without the
    key-periodicity gate, consecutive intra-run strips pattern-match at k=1 and
    mixed strips get extrapolated wrongly.  The gate restricts locks to
    whole-key-period advances, so the result must stay exact."""
    cfg = dict(local_geometric="givens_orthogonal", alpha=1, blocksize=14)
    op, got, ref = _case((8, 56, 56), cfg, cap=100_000)
    if op.streaming_stats["extrapolated"]:
        adv = op.streaming_stats["period"]
        assert adv is not None
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_nonperiodic_key_disables_extrapolation():
    """A global per-row random photometric factor breaks block periodicity:
    the gate must turn extrapolation off entirely (and stay exact)."""
    cfg = dict(local_geometric="givens_orthogonal", alpha=2, blocksize=14,
               global_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    op, got, ref = _case((8, 56, 56), cfg, cap=100_000)
    assert op.streaming_stats["extrapolated"] == 0
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_whole_image_block_key_exact():
    """blocknumel == whole image (the VGG conv5 regime): one run, nothing to
    extrapolate, strip cap bounds memory; result must be exact."""
    cfg = dict(local_geometric="givens_orthogonal", alpha=8, blocksize=14)
    op, got, ref = _case((8, 14, 14), cfg, cap=60_000)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


@pytest.mark.parametrize("stride", [2])
def test_strided_conv_streaming_exact(stride):
    rng = np.random.default_rng(3)
    shape = (4, 28, 28)
    out = (6, 14, 14)
    w = (rng.standard_normal((6, 4, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(6) * 0.1).astype(np.float32)
    n_out, n_in = int(np.prod(out)) + 1, int(np.prod(shape)) + 1
    A = scipy.sparse.identity(n_out, format="csr")
    Ainv = scipy.sparse.identity(n_in, format="csr")
    op = keyed_conv_streaming(shape, out, w, b, stride, A, Ainv, strip_nnz_cap=50_000)
    x = rng.standard_normal(n_in - 1).astype(np.float32)
    xh = np.concatenate([x, [1.0]]).astype(np.float32)
    ref = _exact_sandwich(shape, w, b, stride, A, Ainv, xh)
    got = np.asarray(op.apply(jnp.asarray(xh[None])))[0]
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_key_blocks_identical():
    rng = np.random.default_rng(5)
    A, _ = keys.keygen((4, 28, 28), local_geometric="givens_orthogonal", alpha=2,
                       blocksize=14, local_photometric="uniform_random_affine",
                       beta=1.0, gamma=1.0, seed=7)
    assert _key_blocks_identical(A, 196 * 1)  # per-channel runs of blocknumel
    # breaking one value in one block must fail the check
    B = scipy.sparse.csr_matrix(A, copy=True).tolil()
    B[5, 5] = B[5, 5] + 0.5
    assert not _key_blocks_identical(B.tocsr(), 196)
    # a per-row random global photometric is not block periodic
    G, _ = keys.keygen((4, 28, 28), global_photometric="uniform_random_affine",
                       beta=1.0, gamma=1.0, blocksize=14, seed=8)
    assert not _key_blocks_identical(G, 196)


def test_nnz_path_independent():
    """The reported nnz must be identical whether or not the extrapolation
    fast path engaged (stored entries, incl. explicit zeros, per slot)."""
    cfg = dict(local_geometric="givens_orthogonal", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    rng = np.random.default_rng(0)
    shape = (8, 56, 56)
    w = (rng.standard_normal((8, 8, 3, 3)) * 0.1).astype(np.float32)
    w[0, 0, 0, 0] = 0.0  # explicit zero tap: stored entries != count_nonzero
    b = (rng.standard_normal(8) * 0.1).astype(np.float32)
    A, Ainv = keys.keygen(shape, seed=1, **cfg)
    fast = keyed_conv_streaming(shape, shape, w, b, 1, A, Ainv,
                                strip_nnz_cap=100_000)
    exact = keyed_conv_streaming(shape, shape, w, b, 1, A, Ainv,
                                 strip_nnz_cap=100_000, periodic_fastpath=False)
    assert fast.streaming_stats["extrapolated"] > 0
    assert exact.streaming_stats["extrapolated"] == 0
    assert fast.nnz() == exact.nnz()


def test_factor_right_perm_roundtrip():
    """A = p·g·G (local keys x global hierarchical permutation) must factor as
    B·G with B block-diagonal and A[:, c] == B[:, g[c]] exactly."""
    from keynet_tpu.ops.streaming import factor_right_perm, factor_left_perm
    cfg = dict(global_geometric="hierarchical_permutation",
               hierarchical_blockshape=(2, 2), hierarchical_permute_at_level=(0, 1),
               local_geometric="doubly_stochastic", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    A, Ainv = keys.keygen((4, 28, 28), seed=3, **cfg)
    npix = 28 * 28
    divs = [d for d in range(2, npix + 1) if npix % d == 0]
    f = factor_right_perm(A, divs)
    assert f is not None
    p, g, B = f
    n = A.shape[0] - 1
    assert npix % p == 0
    # identity: A[:, c] == B[:, g[c]] for core columns, bias column kept
    Ac, Bc = A.tocsc(), B.tocsc()
    perm = np.concatenate([g, [n]])
    diff = (Bc[:, perm] - Ac)
    assert diff.nnz == 0 or np.abs(diff.data).max() == 0.0
    # B is block-diagonal on the core
    Bcoo = B.tocoo()
    core = (Bcoo.row < n) & (Bcoo.col < n)
    assert np.array_equal(Bcoo.row[core] // p, Bcoo.col[core] // p)
    # the inverse key factors on the left with a block-diagonal B too
    fi = factor_left_perm(Ainv, divs)
    assert fi is not None
    pi, gi, Bi = fi
    diff = Bi[np.concatenate([gi, [n]])] - scipy.sparse.csr_matrix(Ainv)
    assert diff.nnz == 0 or np.abs(diff.data).max() == 0.0


def test_stochastic_recipe_streaming_exact():
    """The reference VGG-stochastic recipe structure (hierarchical global
    permutation + doubly-stochastic local + local affine,
    /root/reference/test/test_keynet.py:116-130) at reduced scale: the
    permutation factor must fold into emission and the streamed op must
    equal the dense key sandwich."""
    cfg = dict(global_geometric="hierarchical_permutation",
               hierarchical_blockshape=(2, 2), hierarchical_permute_at_level=(0, 1),
               local_geometric="doubly_stochastic", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    op, got, ref = _case((4, 56, 56), cfg, cap=100_000)
    assert op.streaming_stats["folded"] and op.streaming_stats["run_layout"]
    assert op.streaming_stats["extrapolated"] == 0  # folding disables extrap
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_flat_global_permutation_streaming_exact():
    """A flat (non-hierarchical) global permutation with local Givens keys:
    also factors as B·G and streams exactly."""
    cfg = dict(global_geometric="permutation",
               local_geometric="givens_orthogonal", alpha=2, blocksize=14)
    op, got, ref = _case((4, 28, 28), cfg, cap=60_000)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_global_permutation_only_streaming_exact():
    """Pure global permutation key (no local factor): B degenerates to a
    within-block permutation; streaming must stay exact."""
    cfg = dict(global_geometric="permutation")
    op, got, ref = _case((8, 28, 28), cfg, cap=60_000)
    assert np.abs(got - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_masked_rekeying_chain_exact_and_dedups():
    """Hierarchical+stochastic keys at VGG-recipe structure: the layer must be
    published as a masked re-keyed chain (F3·F2·M·F1) whose tile dedup matches
    an orthogonal-keyed conv (the naive permutation fold gets ~zero dedup),
    and whose product equals the dense key sandwich exactly."""
    from keynet_tpu.ops.streaming import (masked_keyed_conv_streaming,
                                          split_dense_inverse, _block_orth_key,
                                          keyed_conv_streaming)
    from keynet_tpu.ops.operators import ChainedOp
    cfg = dict(global_geometric="hierarchical_permutation",
               hierarchical_blockshape=(2, 2), hierarchical_permute_at_level=(0, 1),
               local_geometric="doubly_stochastic", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    rng = np.random.default_rng(0)
    shape = (8, 56, 56)
    n = int(np.prod(shape))
    w = (rng.standard_normal((8, 8, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(8) * 0.1).astype(np.float32)
    A, _ = keys.keygen(shape, seed=1, **cfg)
    _, Ainv = keys.keygen(shape, seed=2, **cfg)
    divs = [d for d in range(2, 3137) if (56 * 56) % d == 0]
    R, f3 = split_dense_inverse(scipy.sparse.csr_matrix(Ainv), divs)

    op = masked_keyed_conv_streaming(shape, shape, w, b, 1, A, R,
                                     rng=np.random.default_rng(7))
    st = op.streaming_stats
    assert st["masked_out"] and st["masked_in"]

    # dedup parity with a permutation-free orthogonal-keyed conv
    Ko, Koinv = _block_orth_key(n, 196, np.random.default_rng(3))
    Ki, _ = _block_orth_key(n, 196, np.random.default_rng(4))
    base = keyed_conv_streaming(shape, shape, w, b, 1, Koinv, Ki)
    assert st["unique_tiles"] <= 2 * base.streaming_stats["unique_tiles"]

    # exactness of the full published chain
    import jax.numpy as jnp
    W = toeplitz_conv2d(shape, w, bias=b, stride=1)
    ref = (scipy.sparse.csr_matrix(A, dtype=np.float32) @ W
           @ scipy.sparse.csr_matrix(Ainv, dtype=np.float32))
    x = rng.standard_normal(n).astype(np.float32)
    xh = np.concatenate([x, [1.0]]).astype(np.float32)
    got = np.asarray(ChainedOp([f3, op]).apply(jnp.asarray(xh[None])))[0]
    exp = ref @ xh
    assert np.abs(got - exp).max() < 1e-4 * max(1.0, np.abs(exp).max())


def test_split_dense_inverse_factors_exact():
    """F2 = R⁻¹·A⁻¹ as RepeatedBlockDiagOp and R must reproduce A⁻¹ exactly:
    R @ F2_dense == Ainv."""
    from keynet_tpu.ops.streaming import split_dense_inverse
    import jax.numpy as jnp
    cfg = dict(local_geometric="doubly_stochastic", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    _, Ainv = keys.keygen((4, 28, 28), seed=5, **cfg)
    n = Ainv.shape[0] - 1
    divs = [d for d in range(2, 785) if 784 % d == 0]
    s = split_dense_inverse(scipy.sparse.csr_matrix(Ainv), divs)
    assert s is not None
    R, f2 = s
    # apply F2 then R to a batch of basis-ish vectors == apply Ainv
    rng = np.random.default_rng(0)
    X = rng.standard_normal((3, n + 1)).astype(np.float32)
    y_f2 = np.asarray(f2.apply(jnp.asarray(X)))
    y = (scipy.sparse.csr_matrix(R, dtype=np.float32) @ y_f2.T).T
    exp = (scipy.sparse.csr_matrix(Ainv, dtype=np.float32) @ X.T).T
    assert np.abs(y - exp).max() < 1e-4 * max(1.0, np.abs(exp).max())


def test_mask_factors_do_not_leak_key_rows():
    """Round-2 advisory (high): with 2 total Givens rotations the secret mask E
    was near-identity, so the published F2 = I⊗(EᵀD₀) exposed most rows of the
    secret dense inverse block verbatim.  With full balanced coverage
    (_mask_rotations: every coordinate mixed >= MASK_ALPHA times) no row of a
    published factor may match any row of the key factor, and no row of the
    secret re-key may be a coordinate vector."""
    from keynet_tpu.ops.streaming import (split_dense_inverse, _block_orth_key,
                                          _mask_rotations, factor_left_identical)
    cfg = dict(local_geometric="doubly_stochastic", alpha=2, blocksize=14,
               local_photometric="uniform_random_affine", beta=1.0, gamma=1.0)
    _, Ainv = keys.keygen((4, 28, 28), seed=5, **cfg)
    Ainv = scipy.sparse.csr_matrix(Ainv)
    divs = [d for d in range(2, 785) if 784 % d == 0]
    p, g, D0, b0 = factor_left_identical(Ainv, divs)
    R, f2 = split_dense_inverse(Ainv, divs, rng=np.random.default_rng(11))
    F = np.asarray(f2.F)
    # no row of the published dense block matches ANY row of the secret block
    d = np.abs(F[:, None, :] - D0[None, :, :]).max(axis=2)
    assert float(d.min()) > 1e-3, "published F2 row reproduces a secret D0 row"
    # the secret re-key has no coordinate-vector rows (every row a real mix)
    Rc = scipy.sparse.csr_matrix(R)
    n = Rc.shape[0] - 1
    assert (np.diff(Rc.indptr)[:n] >= 2).all()
    # conversion-time block-orthogonal mask: same property
    K, _ = _block_orth_key(784 * 4, 196, np.random.default_rng(12))
    assert (np.diff(scipy.sparse.csr_matrix(K).indptr)[:784 * 4] >= 2).all()
    assert _mask_rotations(196) >= 196


def test_published_factor_applied_to_cipher_is_not_plaintext():
    """Advisor attack scenario: applying the published F2 to a keyed activation
    must NOT yield (permutation-masked) plaintext — with full-coverage masks
    essentially no output coordinate equals any plaintext value."""
    from keynet_tpu.ops.streaming import split_dense_inverse
    cfg = dict(local_geometric="doubly_stochastic", alpha=2, blocksize=14)
    A, Ainv = keys.keygen((4, 28, 28), seed=9, **cfg)
    divs = [d for d in range(2, 785) if 784 % d == 0]
    s = split_dense_inverse(scipy.sparse.csr_matrix(Ainv), divs,
                            rng=np.random.default_rng(13))
    assert s is not None
    R, f2 = s
    n = Ainv.shape[0] - 1
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n).astype(np.float32)
    xh = np.concatenate([x, [1.0]]).astype(np.float32)
    cipher = np.asarray(scipy.sparse.csr_matrix(A, dtype=np.float32) @ xh,
                        dtype=np.float32)
    leaked = np.asarray(f2.apply(jnp.asarray(cipher[None])))[0][:n]
    # 1e-6 tolerance: an actual pass-through coordinate survives f32 round-trip
    # to ~1e-7, while random near-coincidences among ~3e3 standard normals
    # (typical spacing ~1e-3) stay below the 2% budget
    close = np.abs(leaked[:, None] - x[None, :]).min(axis=1) < 1e-6
    assert float(close.mean()) < 0.02, \
        "published F2 applied to cipher reveals %.0f%% of plaintext values" \
        % (100 * close.mean())


def test_masked_conversion_is_seed_reproducible():
    """Two conversions with the same rng seed must publish bit-identical
    factors (round-2 advisory: unseeded masks made artifacts unreproducible)."""
    from keynet_tpu.ops.streaming import split_dense_inverse
    cfg = dict(local_geometric="doubly_stochastic", alpha=2, blocksize=14)
    _, Ainv = keys.keygen((4, 28, 28), seed=9, **cfg)
    divs = [d for d in range(2, 785) if 784 % d == 0]
    R1, f1 = split_dense_inverse(scipy.sparse.csr_matrix(Ainv), divs,
                                 rng=np.random.default_rng(21))
    R2, f2 = split_dense_inverse(scipy.sparse.csr_matrix(Ainv), divs,
                                 rng=np.random.default_rng(21))
    assert (R1 != R2).nnz == 0
    assert np.array_equal(np.asarray(f1.F), np.asarray(f2.F))


def test_native_spgemm_dr_matches_scipy():
    """The fused native S·diag(d) + S·R (compute_strip's dR split) must match
    the scipy two-step (values and canonical union support, explicit zeros
    preserved); skipped when the extension is absent."""
    from keynet_tpu import native
    if native.spgemm_dr is None:
        import pytest
        pytest.skip("native extension not built")
    rng = np.random.default_rng(3)
    n, m = 150, 260
    S = scipy.sparse.random(n, m, density=0.12, random_state=5,
                            dtype=np.float32).tocsr()
    S.indices = S.indices.astype(np.int32)
    d = rng.standard_normal(m).astype(np.float32)
    R = scipy.sparse.random(m, m, density=0.04, random_state=11,
                            dtype=np.float32).tocsr()
    R.setdiag(0)
    R.eliminate_zeros()
    R.indices = R.indices.astype(np.int32)
    bound = int((1 + np.diff(R.indptr)[S.indices].astype(np.int64)).sum())
    ip = np.empty(n + 1, np.int64)
    ix = np.empty(bound, np.int32)
    dx = np.empty(bound, np.float32)
    nnz = native.spgemm_dr(S.indptr.astype(np.int64), S.indices, S.data, d,
                           R.indptr.astype(np.int64), R.indices, R.data,
                           ip, ix, dx)
    got = scipy.sparse.csr_matrix((dx[:nnz].copy(), ix[:nnz].copy(),
                                   ip[:n + 1].copy()), shape=(n, m))
    ref = scipy.sparse.csr_matrix(S, copy=True)
    T = S @ R
    ref.data = ref.data * d[ref.indices]
    ref = ref + T
    assert np.abs((got - ref).toarray()).max() < 2e-6
    got.sum_duplicates()
    got.sort_indices()
    assert got.nnz == ref.nnz  # union support incl. explicit zeros


def test_native_spgemm_dr_plain_product_matches_scipy():
    """d=None computes the plain S·R (the masked inner-key path where the
    diagonal split does not pay); values and support must match scipy."""
    from keynet_tpu import native
    if native.spgemm_dr is None:
        import pytest
        pytest.skip("native extension not built")
    n, m = 130, 240
    S = scipy.sparse.random(n, m, density=0.10, random_state=7,
                            dtype=np.float32).tocsr()
    S.indices = S.indices.astype(np.int32)
    R = scipy.sparse.random(m, m, density=0.05, random_state=13,
                            dtype=np.float32).tocsr()
    R.indices = R.indices.astype(np.int32)
    bound = max(int(np.diff(R.indptr)[S.indices].astype(np.int64).sum()), 1)
    ip = np.empty(n + 1, np.int64)
    ix = np.empty(bound, np.int32)
    dx = np.empty(bound, np.float32)
    nnz = native.spgemm_dr(S.indptr.astype(np.int64), S.indices, S.data, None,
                           R.indptr.astype(np.int64), R.indices, R.data,
                           ip, ix, dx)
    got = scipy.sparse.csr_matrix((dx[:nnz].copy(), ix[:nnz].copy(),
                                   ip[:n + 1].copy()), shape=(n, m))
    ref = S @ R
    assert np.abs((got - ref).toarray()).max() < 2e-6
