// keynet_tpu native host runtime: tile packing and Toeplitz emission hot loops.
//
// TPU-native replacement for the reference's Numba nopython tier
// (keynet/sparse.py:122-160 Toeplitz COO emission, :692-717 tile extraction,
// :781-814 tile reconstruction): the device math runs in XLA/Pallas, and these
// C++ kernels accelerate the host-side *construction* path (strip -> MXU tile
// scatter + content dedup) that feeds it.
//
// Built as a plain CPython extension (no pybind11).

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// 64-bit FNV-1a over a tile's bytes (content dedup hash).
static inline uint64_t fnv1a(const uint8_t* data, size_t n) {
    uint64_t h = 1469598103934665603ull;
    for (size_t i = 0; i < n; ++i) {
        h ^= data[i];
        h *= 1099511628211ull;
    }
    return h;
}

// Core scatter loop.  Rows are non-decreasing (row-sorted strips), so the
// (row_block -> tile index) lookup uses a direct-mapped scratch over column
// blocks, reset lazily when the row block advances — no hashing per entry.
template <typename I>
static void pack_loop(const I* rows, const I* cols, const float* vals, int64_t n,
                      int64_t TM, int64_t TN, int64_t n_cb,
                      std::vector<int64_t>& pairs, std::vector<float>& tiles,
                      std::vector<int64_t>& counts) {
    const size_t tile_elems = (size_t)TM * (size_t)TN;
    std::vector<int64_t> scratch((size_t)n_cb, -1);  // col_blk -> tile idx (current rb)
    std::vector<int64_t> touched;
    int64_t cur_rb = -1;
    for (int64_t e = 0; e < n; ++e) {
        const int64_t rb = rows[e] / TM;
        if (rb != cur_rb) {
            for (int64_t cb : touched) scratch[(size_t)cb] = -1;
            touched.clear();
            cur_rb = rb;
        }
        const int64_t cb = cols[e] / TN;
        int64_t idx = scratch[(size_t)cb];
        if (idx < 0) {
            idx = (int64_t)pairs.size();
            scratch[(size_t)cb] = idx;
            touched.push_back(cb);
            pairs.push_back(rb * n_cb + cb);
            counts.push_back(0);
            // geometric growth: plain resize() reallocates to exactly n and
            // copies everything each time -> O(P^2) bytes moved
            if (tiles.size() + tile_elems > tiles.capacity())
                tiles.reserve(std::max(tiles.capacity() * 2,
                                       tiles.size() + tile_elems));
            tiles.resize(tiles.size() + tile_elems, 0.0f);
        }
        tiles[(size_t)idx * tile_elems + (size_t)(rows[e] % TM) * TN + (cols[e] % TN)]
            = vals[e];
        counts[(size_t)idx] += 1;  // stored entries incl. explicit zeros
    }
}

// pack_strip(rows, cols, vals, TM, TN, n_cb) ->
//   (placed_pairs int64[P], placed f32[P, TM, TN], counts int64[P])
// Scatters a row-sorted COO strip into dense tiles grouped by
// (row_block * n_cb + col_block); counts = stored COO entries per placed tile
// (incl. explicit zeros, for path-independent nnz accounting).  Equivalent to
// the numpy unique+fancy-assignment in StreamingBlockPacker.add_strip,
// single pass.
PyObject* pack_strip(PyObject*, PyObject* args) {
    PyArrayObject *rows_o, *cols_o, *vals_o;
    long TM, TN, n_cb;
    if (!PyArg_ParseTuple(args, "O!O!O!lll", &PyArray_Type, &rows_o,
                          &PyArray_Type, &cols_o, &PyArray_Type, &vals_o,
                          &TM, &TN, &n_cb))
        return nullptr;
    const int rt = PyArray_TYPE(rows_o), ct = PyArray_TYPE(cols_o);
    if (rt != ct || (rt != NPY_INT64 && rt != NPY_INT32) ||
        PyArray_TYPE(vals_o) != NPY_FLOAT32 ||
        !PyArray_IS_C_CONTIGUOUS(rows_o) || !PyArray_IS_C_CONTIGUOUS(cols_o) ||
        !PyArray_IS_C_CONTIGUOUS(vals_o)) {
        PyErr_SetString(PyExc_TypeError,
                        "expect contiguous rows/cols int32|int64 (same), vals float32");
        return nullptr;
    }
    const int64_t n = (int64_t)PyArray_SIZE(rows_o);
    const float* vals = (const float*)PyArray_DATA(vals_o);

    std::vector<int64_t> pairs;
    std::vector<float> tiles;  // P * TM * TN
    std::vector<int64_t> counts;
    const size_t tile_elems = (size_t)TM * (size_t)TN;

    Py_BEGIN_ALLOW_THREADS
    if (rt == NPY_INT64)
        pack_loop((const int64_t*)PyArray_DATA(rows_o),
                  (const int64_t*)PyArray_DATA(cols_o), vals, n, TM, TN, n_cb,
                  pairs, tiles, counts);
    else
        pack_loop((const int32_t*)PyArray_DATA(rows_o),
                  (const int32_t*)PyArray_DATA(cols_o), vals, n, TM, TN, n_cb,
                  pairs, tiles, counts);
    Py_END_ALLOW_THREADS

    const npy_intp P = (npy_intp)pairs.size();
    npy_intp pd[1] = {P};
    npy_intp td[3] = {P, (npy_intp)TM, (npy_intp)TN};
    PyObject* pairs_arr = PyArray_SimpleNew(1, pd, NPY_INT64);
    PyObject* tiles_arr = PyArray_SimpleNew(3, td, NPY_FLOAT32);
    PyObject* counts_arr = PyArray_SimpleNew(1, pd, NPY_INT64);
    if (!pairs_arr || !tiles_arr || !counts_arr) return nullptr;
    std::memcpy(PyArray_DATA((PyArrayObject*)pairs_arr), pairs.data(),
                sizeof(int64_t) * (size_t)P);
    std::memcpy(PyArray_DATA((PyArrayObject*)tiles_arr), tiles.data(),
                sizeof(float) * (size_t)P * tile_elems);
    std::memcpy(PyArray_DATA((PyArrayObject*)counts_arr), counts.data(),
                sizeof(int64_t) * (size_t)P);
    return Py_BuildValue("(NNN)", pairs_arr, tiles_arr, counts_arr);
}

// tile_hashes(tiles f32[P, TM, TN]) -> uint64[P] content hashes
PyObject* tile_hashes(PyObject*, PyObject* args) {
    PyArrayObject* tiles_o;
    if (!PyArg_ParseTuple(args, "O!", &PyArray_Type, &tiles_o)) return nullptr;
    if (PyArray_TYPE(tiles_o) != NPY_FLOAT32 || PyArray_NDIM(tiles_o) != 3 ||
        !PyArray_IS_C_CONTIGUOUS(tiles_o)) {
        PyErr_SetString(PyExc_TypeError, "expect contiguous f32 [P,TM,TN]");
        return nullptr;
    }
    const npy_intp P = PyArray_DIM(tiles_o, 0);
    const size_t tile_bytes =
        (size_t)PyArray_DIM(tiles_o, 1) * PyArray_DIM(tiles_o, 2) * sizeof(float);
    const uint8_t* base = (const uint8_t*)PyArray_DATA(tiles_o);
    npy_intp d[1] = {P};
    PyObject* out = PyArray_SimpleNew(1, d, NPY_UINT64);
    if (!out) return nullptr;
    uint64_t* h = (uint64_t*)PyArray_DATA((PyArrayObject*)out);
    Py_BEGIN_ALLOW_THREADS
    for (npy_intp i = 0; i < P; ++i)
        h[i] = fnv1a(base + (size_t)i * tile_bytes, tile_bytes);
    Py_END_ALLOW_THREADS
    return out;
}

// Single-pass Toeplitz CSR emission for a requested set of output rows.
// Replaces the multi-pass numpy broadcasting path (keynet_tpu/toeplitz.py
// _rowmajor_block_csr): on the target VM, first-touch page faults on the
// ~8 GB of numpy temporaries per strip run at ~110 MB/s, so emission must be
// one pass into preallocated (pooled, warm) buffers.  Entry order per row
// matches the numpy path exactly: spatial taps (dp,dq) outer, channel inner,
// bias column last; a requested homogeneous row (r >= M*Us*Vs) is the single
// entry [n_in]=1.
static int64_t toeplitz_fill_loop(const int64_t* rows, int64_t n_rows,
                                  const float* fT, const float* bias,
                                  int64_t M, int64_t C, int64_t U, int64_t V,
                                  int64_t P, int64_t Q, int64_t stride,
                                  int64_t cap, int32_t* cols, float* vals,
                                  int64_t* indptr) {
    const int64_t Us = U / stride, Vs = V / stride, UV = U * V;
    const int64_t n_body = M * Us * Vs, n_in = C * UV;
    const int64_t hp = (P - 1) / 2, hq = (Q - 1) / 2;
    int64_t pos = 0;
    indptr[0] = 0;
    for (int64_t i = 0; i < n_rows; ++i) {
        const int64_t r = rows[i];
        if (r >= n_body) {  // homogeneous row
            if (pos + 1 > cap) return -1;
            cols[pos] = (int32_t)n_in;
            vals[pos] = 1.0f;
            ++pos;
            indptr[i + 1] = pos;
            continue;
        }
        const int64_t m = r / (Us * Vs), pix = r % (Us * Vs);
        const int64_t ku = pix / Vs, kv = pix % Vs;
        // exact per-row bound: valid tap count * C + bias entry
        const int64_t u0 = ku * stride - hp, v0 = kv * stride - hq;
        const int64_t nu = std::min(U, u0 + P) - std::max((int64_t)0, u0);
        const int64_t nv = std::min(V, v0 + Q) - std::max((int64_t)0, v0);
        if (pos + nu * nv * C + (bias ? 1 : 0) > cap) return -1;
        for (int64_t dp = 0; dp < P; ++dp) {
            const int64_t u = ku * stride + dp - hp;
            if (u < 0 || u >= U) continue;
            for (int64_t dq = 0; dq < Q; ++dq) {
                const int64_t v = kv * stride + dq - hq;
                if (v < 0 || v >= V) continue;
                const int32_t base = (int32_t)(u * V + v);
                const float* fv = fT + ((size_t)m * (P * Q) + dp * Q + dq) * C;
                for (int64_t c = 0; c < C; ++c) {
                    cols[pos] = base + (int32_t)(c * UV);
                    vals[pos] = fv[c];
                    ++pos;
                }
            }
        }
        if (bias) {
            cols[pos] = (int32_t)n_in;
            vals[pos] = bias[m];
            ++pos;
        }
        indptr[i + 1] = pos;
    }
    return pos;
}

// toeplitz_fill(rows int64[n], fT f32[M,P*Q,C], bias f32[M]|None,
//               U, V, stride, cols int32[cap] out, vals f32[cap] out,
//               indptr int64[n+1] out) -> total stored entries
PyObject* toeplitz_fill(PyObject*, PyObject* args) {
    PyArrayObject *rows_o, *ft_o, *cols_o, *vals_o, *indptr_o;
    PyObject* bias_obj;
    long U, V, stride;
    if (!PyArg_ParseTuple(args, "O!O!OlllO!O!O!", &PyArray_Type, &rows_o,
                          &PyArray_Type, &ft_o, &bias_obj, &U, &V, &stride,
                          &PyArray_Type, &cols_o, &PyArray_Type, &vals_o,
                          &PyArray_Type, &indptr_o))
        return nullptr;
    PyArrayObject* bias_o = nullptr;
    if (bias_obj != Py_None) {
        if (!PyArray_Check(bias_obj)) {
            PyErr_SetString(PyExc_TypeError, "bias must be ndarray or None");
            return nullptr;
        }
        bias_o = (PyArrayObject*)bias_obj;
    }
    if (PyArray_TYPE(rows_o) != NPY_INT64 || !PyArray_IS_C_CONTIGUOUS(rows_o) ||
        PyArray_TYPE(ft_o) != NPY_FLOAT32 || !PyArray_IS_C_CONTIGUOUS(ft_o) ||
        PyArray_NDIM(ft_o) != 3 ||
        (bias_o && (PyArray_TYPE(bias_o) != NPY_FLOAT32 ||
                    !PyArray_IS_C_CONTIGUOUS(bias_o))) ||
        PyArray_TYPE(cols_o) != NPY_INT32 || !PyArray_IS_C_CONTIGUOUS(cols_o) ||
        PyArray_TYPE(vals_o) != NPY_FLOAT32 || !PyArray_IS_C_CONTIGUOUS(vals_o) ||
        PyArray_TYPE(indptr_o) != NPY_INT64 || !PyArray_IS_C_CONTIGUOUS(indptr_o)) {
        PyErr_SetString(PyExc_TypeError,
                        "expect rows int64, fT f32[M,PQ,C], bias f32|None, "
                        "cols int32, vals f32, indptr int64 (all contiguous)");
        return nullptr;
    }
    const int64_t n_rows = (int64_t)PyArray_SIZE(rows_o);
    const int64_t M = PyArray_DIM(ft_o, 0), PQ = PyArray_DIM(ft_o, 1),
                  C = PyArray_DIM(ft_o, 2);
    // P==Q odd square kernels only (matches toeplitz_conv2d's contract)
    int64_t P = 1;
    while (P * P < PQ) ++P;
    if (P * P != PQ) {
        PyErr_SetString(PyExc_ValueError, "fT second dim must be P*P (square kernel)");
        return nullptr;
    }
    if (PyArray_SIZE(indptr_o) < n_rows + 1) {
        PyErr_SetString(PyExc_ValueError, "indptr too small");
        return nullptr;
    }
    // capacity is bounds-checked exactly per row inside the fill loop
    const int64_t cap = std::min((int64_t)PyArray_SIZE(cols_o),
                                 (int64_t)PyArray_SIZE(vals_o));
    if ((int64_t)C * U * V + 1 > INT32_MAX) {
        PyErr_SetString(PyExc_ValueError, "n_in exceeds int32 column range");
        return nullptr;
    }
    int64_t total = 0;
    Py_BEGIN_ALLOW_THREADS
    total = toeplitz_fill_loop(
        (const int64_t*)PyArray_DATA(rows_o), n_rows,
        (const float*)PyArray_DATA(ft_o),
        bias_o ? (const float*)PyArray_DATA(bias_o) : nullptr, M, C, U, V, P, P,
        stride, cap, (int32_t*)PyArray_DATA(cols_o),
        (float*)PyArray_DATA(vals_o), (int64_t*)PyArray_DATA(indptr_o));
    Py_END_ALLOW_THREADS
    if (total < 0) {
        PyErr_SetString(PyExc_ValueError, "cols/vals capacity exceeded");
        return nullptr;
    }
    return PyLong_FromLongLong((long long)total);
}

PyMethodDef methods[] = {
    {"pack_strip", pack_strip, METH_VARARGS,
     "scatter a row-sorted COO strip into (pairs, dense tiles, entry counts)"},
    {"tile_hashes", tile_hashes, METH_VARARGS, "content hash per tile"},
    {"toeplitz_fill", toeplitz_fill, METH_VARARGS,
     "single-pass CSR emission of requested Toeplitz conv rows"},
    {nullptr, nullptr, 0, nullptr},
};

struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_native", "keynet_tpu native host kernels",
    -1, methods, nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
    import_array();
    return PyModule_Create(&moduledef);
}
