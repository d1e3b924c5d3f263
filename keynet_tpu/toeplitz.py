"""Sparse Toeplitz lowering of conv2d / avgpool2d to homogeneous matrices.

Functional spec: reference keynet/sparse.py:122-212 — a Numba nopython kernel
that loops over every (output pixel, in-channel, kernel tap, out-channel) and
emits one COO entry.  Here the same matrix is produced by vectorized numpy
broadcasting over index grids: the spatial sparsity pattern is computed once
(independent of channels) and the (out-channel, in-channel) axes are expanded
by outer addressing, chunked to bound peak memory.  Explicit zero filter taps
are *kept* as stored entries so the sparsity structure is preserved for
channel-broadcast tiling (the reference achieves this with a +offset/-offset
trick, keynet/sparse.py:184-186; scipy keeps explicit zeros natively when
constructing from COO triplets, so no trick is needed).

Conventions (identical to the reference):
  * input shape (C,U,V) vectorized channel-major; filter (M,C,P,Q), P==Q odd;
  * spatial correlation with implicit zero padding P//2 and output size
    (U//stride, V//stride) sampled at multiples of stride;
  * with bias, the result is the homogeneous matrix [W b_tiled; 0 1] of shape
    (M*(U//s)*(V//s)+1, C*U*V+1).
"""

import numpy as np
import scipy.sparse

# Cap on entries materialized per chunk while expanding channel axes.
_CHUNK_ENTRIES = 16_000_000


def _spatial_pattern(inshape, P, Q, stride, ku_range=None):
    """Spatial COO skeleton shared by every (out-channel, in-channel) pair.

    Returns (sp_rows, sp_cols, tap) where for each valid (output pixel, kernel
    tap): sp_rows = output pixel index in (U//s)*(V//s), sp_cols = input pixel
    index in U*V, tap = kernel tap index in P*Q.  ``ku_range=(k0,k1)`` restricts
    to output pixel rows k0..k1 (for streaming strip-wise emission); row
    indices stay global.
    """
    C, U, V = inshape
    Us, Vs = U // stride, V // stride
    k0, k1 = ku_range if ku_range is not None else (0, Us)
    ku = np.arange(k0, k1, dtype=np.int64)
    kv = np.arange(Vs, dtype=np.int64)
    dp = np.arange(P, dtype=np.int64) - (P - 1) // 2
    dq = np.arange(Q, dtype=np.int64) - (Q - 1) // 2

    nk = len(ku)
    u = ku[:, None, None, None] * stride + dp[None, None, :, None]     # (nk,1,P,1)
    v = kv[None, :, None, None] * stride + dq[None, None, None, :]     # (1,Vs,1,Q)
    valid = np.broadcast_to((u >= 0) & (u < U), (nk, Vs, P, Q)) \
        & np.broadcast_to((v >= 0) & (v < V), (nk, Vs, P, Q))

    out_pix = np.broadcast_to((ku[:, None] * Vs + kv[None, :])[:, :, None, None], valid.shape)
    in_pix = np.broadcast_to(u * V + v, valid.shape)
    tap = np.broadcast_to(
        (np.arange(P, dtype=np.int64)[:, None] * Q + np.arange(Q, dtype=np.int64)[None, :])[None, None],
        valid.shape)

    m = valid.reshape(-1)
    return out_pix.reshape(-1)[m], in_pix.reshape(-1)[m], tap.reshape(-1)[m]


def _expand_channels(inshape, f, stride, ku_range):
    """COO triplets (global indices) for the conv Toeplitz restricted to the
    output pixel rows in ku_range.  Expands the (M, C) channel axes over the
    shared spatial skeleton, chunked over out-channels to bound peak memory."""
    C, U, V = inshape
    M, _, P, Q = f.shape
    Us, Vs = U // stride, V // stride
    sp_rows, sp_cols, tap = _spatial_pattern(inshape, P, Q, stride, ku_range)
    n_sp = sp_rows.shape[0]
    fv = f.reshape(M, C, P * Q)

    chunk_m = max(1, min(M, _CHUNK_ENTRIES // max(1, C * n_sp)))
    parts = []
    for m0 in range(0, M, chunk_m):
        m1 = min(M, m0 + chunk_m)
        mm = np.arange(m0, m1, dtype=np.int64)
        rows = (mm[:, None, None] * (Us * Vs) + sp_rows[None, None, :])
        cols = (np.arange(C, dtype=np.int64)[None, :, None] * (U * V) + sp_cols[None, None, :])
        vals = fv[m0:m1][:, :, tap]
        shape = (m1 - m0, C, n_sp)
        parts.append((
            np.broadcast_to(rows, shape).reshape(-1).astype(np.int64),
            np.broadcast_to(cols, shape).reshape(-1).astype(np.int64),
            vals.reshape(-1).astype(np.float32),
        ))
    return (np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]))


def toeplitz_conv2d_rows(inshape, f, bias, stride, out_rows):
    """Sparse CSR holding only the given (global) output rows of the
    homogeneous conv Toeplitz matrix — the streaming-emission building block
    (rows include the bias column; the final [0..0 1] row is row M*Us*Vs).

    out_rows may be any subset; generation is restricted to the covering
    output-pixel-row range, then sliced.
    """
    f = np.asarray(f, dtype=np.float32)
    C, U, V = inshape
    M, _, P, Q = f.shape
    Us, Vs = U // stride, V // stride
    n_out, n_in = M * Us * Vs, C * U * V
    out_rows = np.asarray(out_rows, dtype=np.int64)

    body = out_rows[out_rows < n_out]
    if body.size:
        pix = body % (Us * Vs)
        k0, k1 = int((pix // Vs).min()), int((pix // Vs).max()) + 1
        rows, cols, vals = _expand_channels(inshape, f, stride, (k0, k1))
    else:
        rows = np.zeros(0, dtype=np.int64)
        cols = np.zeros(0, dtype=np.int64)
        vals = np.zeros(0, dtype=np.float32)
    if bias is not None and body.size:
        bias = np.asarray(bias, dtype=np.float32).reshape(-1)
        rows = np.concatenate([rows, body])
        cols = np.concatenate([cols, np.full(body.size, n_in, dtype=np.int64)])
        vals = np.concatenate([vals, bias[body // (Us * Vs)]])
    if np.any(out_rows == n_out):  # homogeneous last row
        rows = np.concatenate([rows, [n_out]])
        cols = np.concatenate([cols, [n_in]])
        vals = np.concatenate([vals, [np.float32(1.0)]])
    A = scipy.sparse.coo_matrix((vals, (rows, cols)),
                                shape=(n_out + 1, n_in + 1)).tocsr()
    return A[out_rows]


def toeplitz_conv2d(inshape, f, bias=None, stride=1, format="csr"):
    """Sparse matrix W such that conv2d(x, f) (correlation, padding k//2) equals
    (W @ x.flatten()) for x of shape inshape=(C,U,V).

    With ``bias`` the homogeneous matrix [W b;0 1] is returned.  See the module
    docstring for the exact semantics (spec: keynet/sparse.py:163-203).
    """
    f = np.asarray(f, dtype=np.float32)
    assert len(inshape) == 3 and f.ndim == 4
    C, U, V = inshape
    M, C2, P, Q = f.shape
    assert C2 == C, "in-channel mismatch"
    assert P == Q and P % 2 == 1, "filter must be square with odd size"
    if bias is not None:
        bias = np.asarray(bias, dtype=np.float32).reshape(-1)
        assert bias.shape[0] == M
    Us, Vs = U // stride, V // stride
    n_out, n_in = M * Us * Vs, C * U * V

    rows, cols, vals = _expand_channels(inshape, f, stride, None)

    if bias is not None:
        # bias column: every output pixel of out-channel m gets bias[m]; then
        # the homogeneous last row [0 ... 0 1].
        brows = np.arange(n_out, dtype=np.int64)
        bcols = np.full(n_out, n_in, dtype=np.int64)
        bvals = np.repeat(bias, Us * Vs).astype(np.float32)
        rows = np.concatenate([rows, brows, [n_out]])
        cols = np.concatenate([cols, bcols, [n_in]])
        vals = np.concatenate([vals, bvals, [np.float32(1.0)]])
        shape = (n_out + 1, n_in + 1)
    else:
        shape = (n_out, n_in)

    A = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=shape)
    return A.asformat(format) if format != "coo" else A


def toeplitz_avgpool2d(inshape, kernelsize, stride, format="csr"):
    """Homogeneous sparse matrix of avgpool2d = conv2d with a constant
    1/k^2 channel-diagonal filter and zero bias (spec: keynet/sparse.py:206-212)."""
    C = inshape[0]
    f = np.zeros((C, C, kernelsize, kernelsize), dtype=np.float32)
    idx = np.arange(C)
    f[idx, idx] = 1.0 / (kernelsize * kernelsize)
    return toeplitz_conv2d(inshape, f, bias=np.zeros(C, dtype=np.float32),
                           stride=stride, format=format)
