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
                      std::vector<int64_t>& pairs, std::vector<float>& tiles) {
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
            // geometric growth: plain resize() reallocates to exactly n and
            // copies everything each time -> O(P^2) bytes moved
            if (tiles.size() + tile_elems > tiles.capacity())
                tiles.reserve(std::max(tiles.capacity() * 2,
                                       tiles.size() + tile_elems));
            tiles.resize(tiles.size() + tile_elems, 0.0f);
        }
        tiles[(size_t)idx * tile_elems + (size_t)(rows[e] % TM) * TN + (cols[e] % TN)]
            = vals[e];
    }
}

// pack_strip(rows, cols, vals, TM, TN, n_cb) ->
//   (placed_pairs int64[P], placed f32[P, TM, TN])
// Scatters a row-sorted COO strip into dense tiles grouped by
// (row_block * n_cb + col_block).  Equivalent to the numpy
// unique+fancy-assignment in StreamingBlockPacker.add_strip, single pass.
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
    const size_t tile_elems = (size_t)TM * (size_t)TN;

    Py_BEGIN_ALLOW_THREADS
    if (rt == NPY_INT64)
        pack_loop((const int64_t*)PyArray_DATA(rows_o),
                  (const int64_t*)PyArray_DATA(cols_o), vals, n, TM, TN, n_cb,
                  pairs, tiles);
    else
        pack_loop((const int32_t*)PyArray_DATA(rows_o),
                  (const int32_t*)PyArray_DATA(cols_o), vals, n, TM, TN, n_cb,
                  pairs, tiles);
    Py_END_ALLOW_THREADS

    const npy_intp P = (npy_intp)pairs.size();
    npy_intp pd[1] = {P};
    npy_intp td[3] = {P, (npy_intp)TM, (npy_intp)TN};
    PyObject* pairs_arr = PyArray_SimpleNew(1, pd, NPY_INT64);
    PyObject* tiles_arr = PyArray_SimpleNew(3, td, NPY_FLOAT32);
    if (!pairs_arr || !tiles_arr) return nullptr;
    std::memcpy(PyArray_DATA((PyArrayObject*)pairs_arr), pairs.data(),
                sizeof(int64_t) * (size_t)P);
    std::memcpy(PyArray_DATA((PyArrayObject*)tiles_arr), tiles.data(),
                sizeof(float) * (size_t)P * tile_elems);
    return Py_BuildValue("(NN)", pairs_arr, tiles_arr);
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

PyMethodDef methods[] = {
    {"pack_strip", pack_strip, METH_VARARGS,
     "scatter a row-sorted COO strip into (pairs, dense tiles)"},
    {"tile_hashes", tile_hashes, METH_VARARGS, "content hash per tile"},
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
