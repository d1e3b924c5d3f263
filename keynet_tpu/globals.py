"""Global configuration for keynet_tpu.

TPU-native equivalent of the reference config system (reference:
keynet/globals.py:4-34).  The reference exposed a mutable module dict with
``PROCESSES`` (multiprocess keygen) and ``VERBOSE``; on TPU parallelism comes
from XLA/vmap so ``PROCESSES`` is retained only for API compatibility.
"""

GLOBAL = {
    "PROCESSES": 1,     # accepted for API parity; keygen parallelism comes from vectorization
    "VERBOSE": False,   # print per-layer progress during keying
    "DTYPE": "float32",  # on-device dtype for keyed matrices
    "DENSE_MAX_BYTES": 256 * 1024 * 1024,  # auto-format threshold: dense below this
    "KEEP_HOST_NNZ": 50_000_000,  # keep host CSR for keyed matrices up to this nnz
    "USE_PALLAS": "auto",  # Block-ELL matmul kernel: 'auto' (TPU only) | 'always' | 'never'
    # conv layers whose Toeplitz nnz exceeds this stream strip-wise instead of
    # materializing (streaming also wins well below VGG scale)
    "STREAM_NNZ": 30_000_000,
    # MXU precision for keyed matmuls: 'highest' = true f32 (bit-faithful to the
    # reference's exact-equivalence contract, test_keynet.py:33 atol 1e-5);
    # 'default' = bf16 passes (~4-8x faster, atol ~1e-4 on LeNet-scale).
    "PRECISION": "highest",
    # keep freed large buffers on the process heap instead of returning pages
    # to the OS (see tune_allocator below); disable with KEYNET_TPU_MALLOPT=0
    "MALLOPT": True,
    # opt-in debug pass: assert A @ Ainv == I for every generated keypair
    # (keys.keypair_selfcheck; reference analog test/test_sparse.py:29-33)
    "SELFCHECK": False,
    # Block-ELL tile storage dtype: 'float32' (exact, atol 1e-5 contract) or
    # 'bfloat16' (halves HBM + tile DMA; ~1e-3 relative — the reference's own
    # VGG-depth tolerance tier, test_keynet.py:94).  f32 accumulation either way.
    "TILE_DTYPE": "float32",
    # periodic apply path: cap on the gathered x-blocks materialized per einsum
    "PERIODIC_X_CHUNK_BYTES": 256 << 20,
    # grouped-row apply (find_row_groups): only plan row-pattern dedup for
    # non-periodic Block-ELL ops whose per-forward slot traffic exceeds this
    "ROWGROUP_MIN_SLOT_BYTES": 64 << 20,
    # Kronecker-factored keyed convs (ops/kronfactor.py): 'auto' engages for
    # streaming-scale convs whose keys have identical per-channel spatial
    # blocks; 'never' disables (falls back to strip streaming)
    "KRON_FACTORED": "auto",
    # dense spatial factors are (npix, npix); cap the pixel count (1024 ->
    # <= 4 MB per factor, covers VGG-224 conv4/conv5)
    "KRON_NPIX_MAX": 1024,
    # strength floor of the secret conversion-time THIN masks
    # (streaming.split_dense_inverse on the streaming route, _block_orth_key):
    # each masked p-block gets ceil(p*alpha/2) balanced Givens rotations with
    # alpha = max(MASK_ALPHA, keygen's alpha privacy parameter), i.e. every
    # coordinate is mixed >= alpha times, so no row of a published factor can
    # equal a row of the underlying key factor (round-2 advisory: 2 fixed
    # rotations left E near-identity and leaked the dense inverse block almost
    # verbatim).  Routes whose downstream math is dense use a full Haar (QR)
    # mask instead — see MASK_DENSE_MAX_BYTES.
    "MASK_ALPHA": 2,
    # dense-Haar mask affordability gate for materialized layers: estimated
    # post-mask fill bytes (8 * n_out * min(q*p, n_in)) at or below this use
    # the statistically-optimal dense orthogonal mask (published split factor
    # exactly Haar-masked); above it the thin Givens mask keeps fill bounded
    "MASK_DENSE_MAX_BYTES": 64 << 20,
}


def tune_allocator():
    """Keep large freed buffers on the glibc heap (warm pages) instead of
    munmap-ing them back to the OS.

    Host-side conversion (Toeplitz emission, strip spgemm, packing) churns
    multi-GB numpy temporaries.  glibc serves >128 KB allocations with fresh
    mmaps and returns them on free, so every temporary pays first-touch page
    faults — measured ~110 MB/s on the target VM versus 6-16 GB/s for warm
    pages (a 60x slowdown on emission-bound layers).  Raising M_TRIM_THRESHOLD
    and disabling per-allocation mmap keeps the arena warm across strips.
    Trade-off: process RSS stays at its high-water mark; fine for conversion
    workloads, opt out with KEYNET_TPU_MALLOPT=0.
    """
    import os
    if os.environ.get("KEYNET_TPU_MALLOPT", "1") == "0" or not GLOBAL["MALLOPT"]:
        return False
    try:
        import ctypes
        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD, M_MMAP_MAX = -1, -3, -4
        ok = libc.mallopt(M_TRIM_THRESHOLD, ctypes.c_int(2**31 - 1))
        ok &= libc.mallopt(M_MMAP_THRESHOLD, ctypes.c_int(2**31 - 1))
        ok &= libc.mallopt(M_MMAP_MAX, ctypes.c_int(0))
        _madvise_heap_hugepages(libc)
        return bool(ok)
    except Exception:
        return False


def _madvise_heap_hugepages(libc=None):
    """MADV_HUGEPAGE every [heap] VMA so heap pages are THP-backed.

    With mmap disabled above, every large numpy buffer comes from brk.  The
    kernel runs THP in `madvise` mode here, so the flag must be set per VMA;
    a VMA whose flags differ from its neighbor cannot merge, so flagging
    only the initial heap VMA leaves later brk growth in fresh UN-flagged
    VMAs — hence all [heap] VMAs are flagged, after which further growth
    merges into the last (flag-matched) VMA and inherits it.  Measured on
    the target VM (scripts/profile_heap_growth.py): cold first-touch 94 →
    145 MB/s (population cost dominates, not fault count — each 2 MB fault
    pays the same ~14 ms the 512 4 KB faults did), warm page-stride touches
    13 → 27 GB/s (TLB reach).  Re-invoked at keygen entry (keys.keygen) as
    belt-and-braces for VMAs created in between.  Best effort: silently a
    no-op if /proc/self/maps is unreadable or the kernel rejects the call.
    """
    try:
        import ctypes
        if libc is None:
            libc = ctypes.CDLL(None)
        MADV_HUGEPAGE = 14
        with open("/proc/self/maps") as f:
            for line in f:
                if line.rstrip().endswith("[heap]"):
                    lo, hi = (int(a, 16) for a in line.split()[0].split("-"))
                    libc.madvise(ctypes.c_void_p(lo),
                                 ctypes.c_size_t(hi - lo), MADV_HUGEPAGE)
    except Exception:
        pass


def precision(p=None):
    import jax
    if p is not None:
        GLOBAL["PRECISION"] = p
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[GLOBAL["PRECISION"]]


def kernel_precision():
    """precision() clamped to what Mosaic's in-kernel dot lowering supports:
    HIGH (bf16x3) has no Pallas lowering rule, so the kernels round it up to
    HIGHEST — the kernels are a small share of a 'high'-mode forward and the
    clamp keeps them on the conservative side of the accuracy contract."""
    import jax
    p = precision()
    return jax.lax.Precision.HIGHEST if p == jax.lax.Precision.HIGH else p


def backend():
    """The compute backend for keyed inference (the reference returned 'scipy')."""
    return "jax"


def num_processes(n=None, backend="xla"):
    if n is not None:
        GLOBAL["PROCESSES"] = int(n)
    return GLOBAL["PROCESSES"]


def verbose(b=None):
    if b is not None:
        GLOBAL["VERBOSE"] = bool(b)
    return GLOBAL["VERBOSE"]


def vprint(*args, **kwargs):
    if GLOBAL["VERBOSE"]:
        print(*args, **kwargs)
