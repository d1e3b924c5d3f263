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
}


def precision(p=None):
    import jax
    if p is not None:
        GLOBAL["PRECISION"] = p
    return {"highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[GLOBAL["PRECISION"]]


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
