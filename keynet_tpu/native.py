"""Loader for the optional C++ host-runtime extension (native/packer.cpp).

Build with ``python setup.py build_ext --inplace``.  When absent, callers use
the vectorized numpy fallbacks; when present, strip packing runs ~5-10x faster
(single-pass scatter + dedup hash instead of sort-based numpy unique).
"""

try:
    import numpy as _np

    from keynet_tpu import _native  # built in-place into the package dir

    # stale-build probe: pack_strip must return (pairs, tiles, counts)
    _z = _np.zeros(1, dtype=_np.int64)
    if len(_native.pack_strip(_z, _z, _np.zeros(1, dtype=_np.float32), 8, 8, 1)) != 3:
        raise ImportError("stale _native build: rebuild with "
                          "`python setup.py build_ext --inplace`")

    def available():
        return True

    pack_strip = _native.pack_strip
    tile_hashes = _native.tile_hashes
    toeplitz_fill = getattr(_native, "toeplitz_fill", None)  # None: stale build
except ImportError:  # pragma: no cover - exercised when ext is not built
    _native = None

    def available():
        return False

    pack_strip = None
    tile_hashes = None
    toeplitz_fill = None
