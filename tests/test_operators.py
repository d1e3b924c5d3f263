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


@pytest.mark.parametrize("B", [1, 2, 8, 9, 32, 129])
def test_ellop_batch_regimes(B):
    """EllOp.apply dispatches on batch size (B=1 lane-select row-gather,
    2<=B<=8 flat gather, 8<B<=128 padded transposed row-gather, B>128
    per-k unroll — ops/operators.py EllOp.apply); every regime must match
    scipy (ADVICE r4 #1: only B=3 had coverage)."""
    shape = (200, 300)
    A = _random_sparse(shape, density=0.05, seed=4)
    assert int(np.diff(A.indptr).max()) <= 32  # keep B=129 on the unroll path
    x = np.random.default_rng(B).normal(size=(B, shape[1])).astype(np.float32)
    op = EllOp.from_scipy(A)
    y = np.asarray(op.apply(x))
    y_ref = x @ A.toarray().T
    assert np.allclose(y, y_ref, atol=1e-4), np.abs(y - y_ref).max()


@pytest.mark.parametrize("B", [1, 32])
def test_ellop_row_chunking(B):
    """A tiny ELL_GATHER_BYTES budget forces the row-chunked gather loops
    (and, at B=32, the batch-chunked transposed path); results must be
    identical to the unchunked apply (ADVICE r4 #1)."""
    from keynet_tpu.globals import GLOBAL
    shape = (200, 300)
    A = _random_sparse(shape, density=0.05, seed=5)
    x = np.random.default_rng(7).normal(size=(B, shape[1])).astype(np.float32)
    op = EllOp.from_scipy(A)
    y_full = np.asarray(op.apply(x))
    old = GLOBAL.get("ELL_GATHER_BYTES")
    GLOBAL["ELL_GATHER_BYTES"] = 4096
    try:
        y_chunked = np.asarray(op.apply(x))
    finally:
        if old is None:
            GLOBAL.pop("ELL_GATHER_BYTES", None)
        else:
            GLOBAL["ELL_GATHER_BYTES"] = old
    assert np.allclose(y_chunked, y_full, atol=1e-5)
    assert np.allclose(y_full, x @ A.toarray().T, atol=1e-4)


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


@pytest.mark.parametrize("B", [1, 2, 8, 9, 32, 129])
def test_ellop_batch_regimes(B):
    """EllOp.apply picks a different formulation per batch regime (B=1
    lane-select row-gather, small-B flat gather, mid-B padded transposed
    row-gather, large-B per-k unroll; ADVICE round-4 #1) — every regime must
    reproduce the scipy matvec, including with a tiny ELL_GATHER_BYTES that
    forces the row/batch chunking paths."""
    from keynet_tpu.globals import GLOBAL
    shape = (301, 157)
    A = _random_sparse(shape, density=0.05, seed=7)
    rng = np.random.default_rng(B)
    x = rng.normal(size=(B, shape[1])).astype(np.float32)
    y_ref = x @ A.toarray().T
    op = EllOp.from_scipy(A)
    assert np.allclose(np.asarray(op.apply(x)), y_ref, atol=1e-4)
    old = GLOBAL.get("ELL_GATHER_BYTES")
    GLOBAL["ELL_GATHER_BYTES"] = 1 << 14  # force row chunking / flat fallback
    try:
        assert np.allclose(np.asarray(op.apply(x)), y_ref, atol=1e-4)
    finally:
        if old is None:
            GLOBAL.pop("ELL_GATHER_BYTES", None)
        else:
            GLOBAL["ELL_GATHER_BYTES"] = old


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


# ------------------------------------------------------- periodic apply path

def _random_periodic_op(rng, s, P, R, tail, KB=3, TM=8, TN=8, n_cb=12, n_uniq=9):
    """BlockSparseOp with constructed row-block periodicity in [s, s+P*R)."""
    n_rb = s + P * R + tail
    tile_ids = rng.integers(1, n_uniq, size=(n_rb, KB)).astype(np.int32)
    base = rng.integers(1, n_uniq, size=(P, KB)).astype(np.int32)
    for j in range(R):
        tile_ids[s + j * P: s + (j + 1) * P] = base
    # head/tail rows must NOT accidentally extend the period
    if s:
        tile_ids[s - 1] = (base[-1] % (n_uniq - 1)) + 1
    if tail:
        tile_ids[s + P * R] = (base[0] % (n_uniq - 1)) + 1
    col_blk = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    shape = (n_rb * TM - 3, n_cb * TN - 5)  # ragged edges
    import jax.numpy as jnp
    mk = lambda period: BlockSparseOp(jnp.asarray(tiles), jnp.asarray(tile_ids),
                                      jnp.asarray(col_blk), shape, (TM, TN),
                                      nnz=1, period=period)
    return mk, tile_ids


@pytest.mark.parametrize("s,P,R,tail", [(0, 2, 5, 0), (3, 2, 5, 2), (1, 3, 4, 0)])
def test_periodic_apply_matches_slot_path(s, P, R, tail):
    rng = np.random.default_rng(7)
    mk, _ = _random_periodic_op(rng, s, P, R, tail)
    plain, periodic = mk(None), mk((s, P, R))
    x = rng.standard_normal((4, plain.shape[1])).astype(np.float32)
    import jax.numpy as jnp
    y0 = np.asarray(plain.apply(jnp.asarray(x)))
    y1 = np.asarray(periodic.apply(jnp.asarray(x)))
    assert y0.shape == y1.shape
    assert np.abs(y0 - y1).max() < 1e-5


def test_periodic_apply_chunked_matches():
    from keynet_tpu.globals import GLOBAL
    rng = np.random.default_rng(3)
    mk, _ = _random_periodic_op(rng, 2, 3, 8, 1)
    x = rng.standard_normal((2, mk(None).shape[1])).astype(np.float32)
    import jax.numpy as jnp
    y0 = np.asarray(mk(None).apply(jnp.asarray(x)))
    old = GLOBAL.get("PERIODIC_X_CHUNK_BYTES")
    GLOBAL["PERIODIC_X_CHUNK_BYTES"] = 1  # force 1-rep chunks
    try:
        y1 = np.asarray(mk((2, 3, 8)).apply(jnp.asarray(x)))
    finally:
        if old is None:
            GLOBAL.pop("PERIODIC_X_CHUNK_BYTES", None)
        else:
            GLOBAL["PERIODIC_X_CHUNK_BYTES"] = old
    assert np.abs(y0 - y1).max() < 1e-5


def test_find_row_period():
    from keynet_tpu.ops.operators import find_row_period
    rng = np.random.default_rng(11)
    mk, tile_ids = _random_periodic_op(rng, 3, 2, 10, 2)
    got = find_row_period(tile_ids, min_reps=4, min_cover=0.5)
    assert got is not None
    s, P, R = got
    # the detected window must be consistent and cover at least the built one
    assert P * R >= 2 * 10
    for j in range(R):
        assert (tile_ids[s + j * P: s + (j + 1) * P] == tile_ids[s: s + P]).all()
    # pure-random ids: no period
    ids = rng.integers(1, 50, size=(64, 3)).astype(np.int32)
    assert find_row_period(ids) is None
    # constant rows: period 1 full cover
    ids = np.full((40, 3), 5, dtype=np.int32)
    s, P, R = find_row_period(ids)
    assert P == 1 and R == 40 and s == 0


def test_streaming_op_gets_periodic_plan():
    """The streamed keyed conv for a block-periodic key must come out with a
    periodic plan and stay exact (same values as the plain path)."""
    import jax.numpy as jnp
    from keynet_tpu import keys
    from keynet_tpu.ops.streaming import keyed_conv_streaming
    rng = np.random.default_rng(0)
    shape = (8, 56, 56)
    w = (rng.standard_normal((8, 8, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal(8) * 0.1).astype(np.float32)
    A, Ainv = keys.keygen(shape, seed=1, local_geometric="givens_orthogonal",
                          alpha=2, blocksize=14)
    op = keyed_conv_streaming(shape, shape, w, b, 1, A, Ainv, strip_nnz_cap=100_000)
    assert op.inner.period is not None, "periodic keyed conv must detect a plan"
    x = rng.standard_normal((2, int(np.prod(shape)) + 1)).astype(np.float32)
    y_fast = np.asarray(op.apply(jnp.asarray(x)))
    plain = BlockSparseOp(op.inner.tiles, op.inner.tile_ids, op.inner.col_blk,
                          op.inner.shape, op.inner.tileshape, op.inner.nnz())
    import jax
    xp = jnp.take(jnp.asarray(x), op.perm_in, axis=1)
    y_plain = jnp.take(plain.apply(xp), op.perm_out_pos, axis=1)
    assert np.abs(y_fast - np.asarray(y_plain)).max() < 1e-5


def test_bf16_tile_mode():
    """GLOBAL['TILE_DTYPE']='bfloat16' halves tile storage and keeps results
    within the reference's VGG-depth tolerance tier (~1e-3 relative,
    test_keynet.py:94); f32 accumulation throughout."""
    import jax.numpy as jnp
    from keynet_tpu.globals import GLOBAL
    rng = np.random.default_rng(0)
    A = scipy.sparse.random(300, 260, density=0.1, random_state=1,
                            data_rvs=lambda n: rng.standard_normal(n)).tocsr()
    x = rng.standard_normal((4, 260)).astype(np.float32)
    ref = x @ A.T.toarray()
    op32 = BlockSparseOp.from_scipy(A, tileshape=(16, 16))
    GLOBAL["TILE_DTYPE"] = "bfloat16"
    try:
        op16 = BlockSparseOp.from_scipy(A, tileshape=(16, 16))
    finally:
        GLOBAL["TILE_DTYPE"] = "float32"
    assert op16.tiles.dtype == jnp.bfloat16
    assert op16.device_bytes() < op32.device_bytes()
    y = np.asarray(op16.apply(jnp.asarray(x)))
    scale = max(1.0, np.abs(ref).max())
    assert np.abs(y - ref).max() / scale < 5e-3
    # exact path unchanged
    y32 = np.asarray(op32.apply(jnp.asarray(x)))
    assert np.abs(y32 - ref).max() / scale < 1e-6


def test_bf16_serialize_roundtrip(tmp_path):
    import jax.numpy as jnp
    import keynet_tpu as keynet
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu import serialize
    from keynet_tpu.models import specs
    net = specs.Model([specs.Conv2d("conv1", 1, 2, 3),
                       specs.ReLU("relu1"),
                       specs.Linear("fc", 2 * 8 * 8, 4)], inshape=(1, 8, 8), seed=0)
    GLOBAL["TILE_DTYPE"] = "bfloat16"
    try:
        sensor, knet = keynet.PermutationKeynet((1, 8, 8), net, seed=3)
        x = np.random.default_rng(0).normal(size=(2, 1, 8, 8)).astype(np.float32)
        xc = sensor.fromtensor(x).encrypt().tensor()
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "k.npz")
        serialize.save_keynet(p, knet, sensor=sensor, include_keys=True)
        s2, k2 = serialize.load_keynet(p)
        y1 = np.asarray(k2.forward(xc))
    finally:
        GLOBAL["TILE_DTYPE"] = "float32"
    assert np.abs(y0 - y1).max() == 0.0


def test_bf16_block_op_state_roundtrip():
    import jax.numpy as jnp
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.serialize import _op_state, _op_restore
    rng = np.random.default_rng(2)
    A = scipy.sparse.random(100, 90, density=0.2, random_state=2).tocsr()
    GLOBAL["TILE_DTYPE"] = "bfloat16"
    try:
        op = BlockSparseOp.from_scipy(A, tileshape=(16, 16))
    finally:
        GLOBAL["TILE_DTYPE"] = "float32"
    kind, arrs, meta = _op_state(op)
    # bf16 tiles serialize as their uint16 bit pattern (npz has no bfloat16;
    # widening to f32 doubled the snapshot bytes)
    assert arrs["tiles"].dtype == np.uint16 and meta["tile_dtype"] == "bfloat16"
    op2 = _op_restore(kind, arrs, meta)
    assert op2.tiles.dtype == jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((3, 90)).astype(np.float32))
    assert np.abs(np.asarray(op.apply(x)) - np.asarray(op2.apply(x))).max() == 0.0


def test_structured_layout_apply_equals_gather():
    """PermutedBlockSparseOp's reshape/transpose layout path must match the
    generic gather path exactly (the gathers measured ~0.27 GB/s on v5e; the
    structured path runs at HBM bandwidth)."""
    import numpy as np
    import scipy.sparse
    import jax.numpy as jnp
    from keynet_tpu.ops.operators import (PermutedBlockSparseOp, conv_layout_perm,
                                          run_layout_perm, conv_layout_blocks)
    rng = np.random.default_rng(0)
    for shape, mk in [((4, 8, 8), "blk"), ((4, 8, 8), "run")]:
        C, H, W = shape
        n = C * H * W + 1
        A = scipy.sparse.random(n, n, density=0.02, random_state=1, format="csr",
                                dtype=np.float32)
        if mk == "blk":
            b = conv_layout_blocks(shape)
            perm = conv_layout_perm(shape, homogeneous=True, blocks=b)
            lay = ("blk", C, H, W, *b)
        else:
            p = 16
            perm = run_layout_perm(shape, p, homogeneous=True)
            lay = ("run", C, H * W, p)
        op_g = PermutedBlockSparseOp.from_scipy(A, perm, perm)
        op_s = PermutedBlockSparseOp.from_scipy(A, perm, perm,
                                                layout_in=lay, layout_out=lay)
        x = jnp.asarray(rng.standard_normal((3, n)).astype(np.float32))
        yg = np.asarray(op_g.apply(x))
        ys = np.asarray(op_s.apply(x))
        np.testing.assert_allclose(ys, yg, atol=1e-6)


def test_packer_chunked_tiles_cross_boundary():
    """StreamingBlockPacker stores unique tiles in 1024-tile chunks and
    concatenates on device at finalize; a matrix with >1024 unique tiles must
    round-trip exactly across the chunk boundary."""
    import numpy as np
    import scipy.sparse
    import jax.numpy as jnp
    from keynet_tpu.ops.operators import StreamingBlockPacker
    rng = np.random.default_rng(0)
    T, nt = 8, 1100                       # 1100 unique 8x8 tiles, 2 chunks
    n = T * nt
    rows = np.repeat(np.arange(n), 2)
    cols = np.concatenate([np.stack([np.full(T, b * T) + rng.integers(0, T, T),
                                     np.full(T, b * T) + rng.integers(0, T, T)],
                                    axis=1).reshape(-1) + 0
                           for b in range(nt)])
    vals = rng.standard_normal(2 * n).astype(np.float32)
    A = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    p = StreamingBlockPacker((n, n), (T, T))
    counts = np.diff(A.indptr)
    rr = np.repeat(np.arange(n, dtype=np.int64), counts)
    p.add_strip(rr, A.indices.astype(np.int64), A.data)
    op = p.finalize(detect_period=False)
    assert p.n_unique() > 1024  # crosses a chunk boundary
    x = rng.standard_normal((2, n)).astype(np.float32)
    y = np.asarray(op.apply(jnp.asarray(x)))
    exp = (A @ x.T).T
    np.testing.assert_allclose(y[:, :n], exp, atol=1e-4)


def test_periodic_block_ell_matvec_interpret():
    """Tile-resident periodic matvec kernel vs the einsum reference in
    interpret mode (TPU-only for real; semantics pinned in the CPU suite)."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import periodic_block_ell_matvec

    rng = np.random.default_rng(3)
    TM = TN = 128
    P, R, KB, n_uniq, s = 3, 4, 2, 7, 2
    n_rb = s + P * R + 1
    n_cb = 6
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    for j in range(1, R):   # impose the periodicity contract on the mid rows
        ids[s + j * P:s + (j + 1) * P] = ids[s:s + P]
    cols = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)
    B = 8
    x = rng.standard_normal((B, n_cb * TN)).astype(np.float32)

    y = np.asarray(periodic_block_ell_matvec(
        jnp.asarray(x), jnp.asarray(tiles), jnp.asarray(ids),
        jnp.asarray(cols), s, P, R, interpret=True))
    # reference: slot walk over the mid rows
    ref = np.zeros((B, P * R * TM), dtype=np.float32)
    for r in range(P * R):
        for k in range(KB):
            tid = ids[s + r, k]
            if tid == 0:
                continue
            cb = cols[s + r, k]
            ref[:, r * TM:(r + 1) * TM] += \
                x[:, cb * TN:(cb + 1) * TN] @ tiles[tid].T
    assert np.abs(y - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_block_ell_xres_kernel_interpret():
    """x-VMEM-resident slot kernel vs numpy reference in interpret mode
    (one tile DMA per slot; picked by BlockSparseOp when x fits VMEM)."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import block_ell_matmul_xres

    rng = np.random.default_rng(5)
    TM = TN = 128
    n_rb, KB, n_uniq, B = 11, 3, 9, 8  # 11 rows: exercises GROUP padding
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_rb, size=(n_rb, KB)).astype(np.int32)
    x = rng.standard_normal((B, n_rb * TN)).astype(np.float32)

    y = np.asarray(block_ell_matmul_xres(
        jnp.asarray(x), jnp.asarray(tiles), jnp.asarray(tile_ids),
        jnp.asarray(col_blk), n_rb * TM, interpret=True))
    ref = np.zeros((B, n_rb * TM), np.float32)
    for r in range(n_rb):
        for k in range(KB):
            ref[:, r*TM:(r+1)*TM] += \
                x[:, col_blk[r, k]*TN:(col_blk[r, k]+1)*TN] @ tiles[tile_ids[r, k]].T
    assert np.abs(y[:, :n_rb*TM] - ref).max() < 1e-3 * max(1.0, np.abs(ref).max())


def test_block_ell_xres2_and_grid_kernels_interpret():
    """Pair-depth x-resident kernel (odd-KB padding) and grid-pipelined
    kernel vs the numpy reference in interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import (block_ell_matmul_xres2,
                                               block_ell_matmul_grid)

    rng = np.random.default_rng(7)
    TM = TN = 128
    n_rb, KB, n_uniq, B = 11, 3, 9, 8  # odd KB: exercises pair padding
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_rb, size=(n_rb, KB)).astype(np.int32)
    x = rng.standard_normal((B, n_rb * TN)).astype(np.float32)
    ref = np.zeros((B, n_rb * TM), np.float32)
    for r in range(n_rb):
        for k in range(KB):
            ref[:, r*TM:(r+1)*TM] += \
                x[:, col_blk[r, k]*TN:(col_blk[r, k]+1)*TN] @ tiles[tile_ids[r, k]].T
    for kfn in (block_ell_matmul_xres2, block_ell_matmul_grid):
        y = np.asarray(kfn(jnp.asarray(x), jnp.asarray(tiles),
                           jnp.asarray(tile_ids), jnp.asarray(col_blk),
                           n_rb * TM, interpret=True))
        assert np.abs(y[:, :n_rb*TM] - ref).max() \
            < 1e-3 * max(1.0, np.abs(ref).max()), kfn.__name__


def test_block_ell_xresd_depths_interpret():
    """Depth-D x-resident kernel (D in {2,4,8}; KB=3 exercises zero-slot
    padding up to every depth) vs the numpy reference in interpret mode."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import block_ell_matmul_xresd

    rng = np.random.default_rng(11)
    TM = TN = 128
    n_rb, KB, n_uniq, B = 11, 3, 9, 8
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    tile_ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    col_blk = rng.integers(0, n_rb, size=(n_rb, KB)).astype(np.int32)
    x = rng.standard_normal((B, n_rb * TN)).astype(np.float32)
    ref = np.zeros((B, n_rb * TM), np.float32)
    for r in range(n_rb):
        for k in range(KB):
            ref[:, r*TM:(r+1)*TM] += \
                x[:, col_blk[r, k]*TN:(col_blk[r, k]+1)*TN] @ tiles[tile_ids[r, k]].T
    for depth in (2, 4, 8):
        y = np.asarray(block_ell_matmul_xresd(
            jnp.asarray(x), jnp.asarray(tiles), jnp.asarray(tile_ids),
            jnp.asarray(col_blk), n_rb * TM, depth=depth, interpret=True))
        assert np.abs(y[:, :n_rb*TM] - ref).max() \
            < 1e-3 * max(1.0, np.abs(ref).max()), depth


def test_periodic_kernel_multigroup_interpret():
    """Periodic kernel with P > PGROUP (two tile-buffer groups): exercises
    the double-buffered next-group prefetch path in _periodic_kernel."""
    import numpy as np
    import jax.numpy as jnp
    from keynet_tpu.ops.pallas_kernels import periodic_block_ell_matvec, PGROUP

    rng = np.random.default_rng(9)
    TM = TN = 128
    P, R, KB, n_uniq, s = PGROUP + 4, 3, 2, 11, 1  # P=12 -> n_grp=2, NGB=2
    n_rb = s + P * R
    n_cb = 5
    tiles = rng.standard_normal((n_uniq, TM, TN)).astype(np.float32)
    tiles[0] = 0.0
    ids = rng.integers(0, n_uniq, size=(n_rb, KB)).astype(np.int32)
    for j in range(1, R):
        ids[s + j * P:s + (j + 1) * P] = ids[s:s + P]
    cols = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)
    B = 8
    x = rng.standard_normal((B, n_cb * TN)).astype(np.float32)

    y = np.asarray(periodic_block_ell_matvec(
        jnp.asarray(x), jnp.asarray(tiles), jnp.asarray(ids),
        jnp.asarray(cols), s, P, R, interpret=True))
    ref = np.zeros((B, P * R * TM), dtype=np.float32)
    for r in range(P * R):
        for k in range(KB):
            tid = ids[s + r, k]
            if tid == 0:
                continue
            cb = cols[s + r, k]
            ref[:, r * TM:(r + 1) * TM] += \
                x[:, cb * TN:(cb + 1) * TN] @ tiles[tid].T
    assert np.abs(y - ref).max() < 1e-4 * max(1.0, np.abs(ref).max())


def test_periodic_apply_uses_kernel_when_forced():
    """BlockSparseOp.apply routes the periodic mid-section through the
    tile-resident kernel when USE_PALLAS='always' and stays numerically equal
    to the einsum path."""
    import numpy as np
    import scipy.sparse
    import jax.numpy as jnp
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import BlockSparseOp

    rng = np.random.default_rng(4)
    blk = rng.standard_normal((128, 128)).astype(np.float32)
    A = scipy.sparse.block_diag([blk] * 12, format="csr")
    op = BlockSparseOp.from_scipy(A, tileshape=(128, 128))
    assert op.period is not None
    x = rng.standard_normal((2, A.shape[1])).astype(np.float32)
    y_einsum = np.asarray(op.apply(jnp.asarray(x)))
    old = GLOBAL["USE_PALLAS"]
    GLOBAL["USE_PALLAS"] = "always"
    try:
        import keynet_tpu.ops.pallas_kernels as pk
        import functools as _ft
        orig = pk.periodic_block_ell_matvec
        pk.periodic_block_ell_matvec = _ft.partial(orig, interpret=True)
        try:
            y_kernel = np.asarray(op.apply(jnp.asarray(x)))
        finally:
            pk.periodic_block_ell_matvec = orig
    finally:
        GLOBAL["USE_PALLAS"] = old
    assert np.abs(y_kernel - y_einsum).max() < 1e-4


def test_grouped_row_apply_matches_dense():
    """Row-permuted repeated tile patterns (no (s,P,R) periodicity): the
    grouped-row plan engages and the apply equals the dense reference.  This
    is the stochastic-VGG conv1_1/conv2_1 core shape: a row-permuting key
    leaves hundreds of distinct tile_id row patterns with ragged
    multiplicities (find_row_groups), where the slot paths re-read tiles."""
    import jax
    import jax.numpy as jnp
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import find_row_groups
    rng = np.random.default_rng(3)
    TM = TN = 128
    U, KB, n_cb = 8, 3, 4
    tiles = (rng.standard_normal((U, TM, TN)) / np.sqrt(KB * TN)).astype(np.float32)
    tiles[0] = 0.0
    pats = rng.integers(1, U, size=(8, KB)).astype(np.int32)
    mult = [1, 2, 5, 8, 16, 32, 64, 128]
    rows = np.concatenate([[i] * m for i, m in enumerate(mult)])
    rng.shuffle(rows)
    ids = pats[rows]                                   # (64, KB), scrambled
    n_rb = len(rows)
    cols = rng.integers(0, n_cb, size=(n_rb, KB)).astype(np.int32)

    plan = find_row_groups(ids, min_saved=8)
    assert plan is not None
    assert sum(len(p) for _, _, p in plan["buckets"]) == 8
    assert sum(len(r) for _, r, _ in plan["buckets"]) == n_rb

    old = GLOBAL.get("ROWGROUP_MIN_SLOT_BYTES")
    GLOBAL["ROWGROUP_MIN_SLOT_BYTES"] = 0
    try:
        op = BlockSparseOp(jnp.asarray(tiles), jnp.asarray(ids),
                           jnp.asarray(cols), (n_rb * TM, n_cb * TN),
                           (TM, TN), nnz=1, period=None)
    finally:
        if old is None:
            GLOBAL.pop("ROWGROUP_MIN_SLOT_BYTES", None)
        else:
            GLOBAL["ROWGROUP_MIN_SLOT_BYTES"] = old
    assert op._rgroups is not None and op._grouped_wins(2)

    D = np.zeros((n_rb * TM, n_cb * TN), dtype=np.float32)
    for r in range(n_rb):
        for k in range(KB):
            D[r * TM:(r + 1) * TM, cols[r, k] * TN:(cols[r, k] + 1) * TN] += \
                tiles[ids[r, k]]
    x = rng.standard_normal((2, n_cb * TN)).astype(np.float32)
    y_ref = x @ D.T
    y = np.asarray(op.apply(jnp.asarray(x)))
    assert np.abs(y - y_ref).max() < 1e-4
    # grouped path must survive a jit round trip (pytree flatten/unflatten)
    y_jit = np.asarray(jax.jit(lambda o, xx: o.apply(xx))(op, jnp.asarray(x)))
    assert np.abs(y_jit - y_ref).max() < 1e-4


def test_pallas_gate_follows_tile_device(monkeypatch):
    """Conversion stages the op pytree on the host CPU backend
    (system.py jax.default_device(cpu)) while the axon TPU plugin still
    reports jax.default_backend() == 'tpu'; the Pallas gates must follow the
    TILES' actual device, not the backend.  Regression: the orth-VGG-224
    pool2_2 selfcheck (Block-ELL spatial factor) crashed with 'Only
    interpret mode is supported on CPU backend'."""
    rng = np.random.default_rng(0)
    A = scipy.sparse.random(256, 256, density=0.2, random_state=0,
                            dtype=np.float32, format="csr")
    op = BlockSparseOp.from_scipy(A, tileshape=(128, 128))
    import jax
    import jax.numpy as jnp
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert not op._pallas_ok(8, 128, 128)        # tiles live on cpu
    assert op._periodic_matvec_chunk(8, 256) == 0
    x = rng.standard_normal((2, 256)).astype(np.float32)
    y = np.asarray(op.apply(jnp.asarray(x)))     # einsum path, no crash
    ref = x @ np.asarray(A.todense()).T
    assert np.abs(y - ref).max() < 1e-4
