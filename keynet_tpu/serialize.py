"""Checkpointing keyed systems (reference parity: pickled (sensor, knet)
tuples via vipy.util.save, test_keynet.py:106,144; challenge pkl).

Keyed systems here are plain arrays, so they serialize as a single .npz:
every device operator's arrays plus static metadata (format, shapes, layer
order, relu plan).  Private keys (image/embedding) are stored only when
``include_keys=True`` — a public release stores none, like
KeyedModel.public() (keynet/system.py:147-151).
"""

import io
import json

import numpy as np
import scipy.sparse
import jax.numpy as jnp

from .layer import KeyedLayer
from .ops.operators import (DenseOp, BlockSparseOp, EllOp, PermutedBlockSparseOp,
                            ChainedOp, RepeatedBlockDiagOp, KroneckerOp, TapSumOp,
                            ChannelBroadcastOp, DirectConvOp)


def _op_state(op):
    if isinstance(op, DenseOp):
        return "dense", {"W": np.asarray(op.W)}, {"nnz": op.nnz()}
    if isinstance(op, DirectConvOp):
        arrs = {"weight": np.asarray(op.weight)}
        if op.bias is not None:
            arrs["bias"] = np.asarray(op.bias)
        return "directconv", arrs, \
            {"inshape": op.inshape, "outshape": op.outshape,
             "stride": op.stride, "groups": op.groups, "nnz": op.nnz()}
    if isinstance(op, BlockSparseOp):
        arrs = {k: np.asarray(v) for k, v in op.arrays().items()}
        tile_dtype = str(op.tiles.dtype)
        if tile_dtype == "bfloat16":  # npz has no bfloat16; store the bit
            # pattern as uint16 (lossless, half the bytes of widening to f32)
            arrs["tiles"] = np.asarray(op.tiles).view(np.uint16)
        elif tile_dtype != "float32":
            arrs["tiles"] = np.asarray(op.tiles.astype(jnp.float32))
        return "block", arrs, \
            {"shape": op.shape, "tileshape": op.tileshape, "nnz": op.nnz(),
             "period": op.period, "tile_dtype": tile_dtype}
    if isinstance(op, PermutedBlockSparseOp):
        kind, arrs, meta = _op_state(op.inner)
        arrs.update({"perm_in": np.asarray(op.perm_in),
                     "perm_out_pos": np.asarray(op.perm_out_pos)})
        meta["outer_shape"] = op.shape
        meta["layout_in"] = op.layout_in
        meta["layout_out"] = op.layout_out
        return "permuted_block", arrs, meta
    if isinstance(op, EllOp):
        return "ell", {"cols": np.asarray(op.cols), "vals": np.asarray(op.vals)}, \
            {"shape": op.shape, "nnz": op.nnz()}
    if isinstance(op, RepeatedBlockDiagOp):
        return "repblockdiag", {"F": np.asarray(op.F), "bias": np.asarray(op.bias)}, \
            {"shape": op.shape, "nnz": op.nnz()}
    if isinstance(op, KroneckerOp):
        arrs = {"Cm": np.asarray(op.Cm), "Sm": np.asarray(op.Sm),
                "bias": np.asarray(op.bias)}
        if op.perm_in is not None:
            arrs["perm_in"] = np.asarray(op.perm_in)
        if op.perm_out is not None:
            arrs["perm_out"] = np.asarray(op.perm_out)
        return "kron", arrs, {"shape": op.shape, "nnz": op.nnz()}
    if isinstance(op, TapSumOp):
        return "tapsum", {"K": np.asarray(op.K), "S": np.asarray(op.S),
                          "bias": np.asarray(op.bias)}, \
            {"shape": op.shape, "nnz": op.nnz()}
    if isinstance(op, ChannelBroadcastOp):
        k, a, m = _op_state(op.inner)
        arrs = {"in_" + kk: vv for kk, vv in a.items()}
        arrs["bias_sp"] = np.asarray(op.bias_sp)
        return "chanbcast", arrs, \
            {"inner_kind": k, "inner_meta": _jsonable(m), "C": op.C,
             "nnz": op.nnz()}
    if isinstance(op, ChainedOp):
        arrs, parts = {}, []
        for i, sub in enumerate(op.ops):
            k, a, m = _op_state(sub)
            for kk, vv in a.items():
                arrs["c%d_%s" % (i, kk)] = vv
            parts.append({"kind": k, "meta": _jsonable(m)})
        return "chain", arrs, {"parts": parts, "shape": op.shape}
    raise TypeError(type(op))


def _op_restore(kind, arrs, meta):
    if kind == "dense":
        return DenseOp(jnp.asarray(arrs["W"]), nnz=meta["nnz"])
    if kind == "directconv":
        return DirectConvOp(jnp.asarray(arrs["weight"]),
                            jnp.asarray(arrs["bias"]) if "bias" in arrs else None,
                            tuple(meta["inshape"]), tuple(meta["outshape"]),
                            int(meta["stride"]), groups=int(meta["groups"]),
                            nnz=meta["nnz"])
    if kind == "block":
        tdt = meta.get("tile_dtype", "float32")
        tiles = arrs["tiles"]
        if tiles.dtype == np.uint16:  # bf16 stored as its bit pattern
            import ml_dtypes
            tiles = tiles.view(ml_dtypes.bfloat16)
        return BlockSparseOp(jnp.asarray(tiles, dtype=tdt),
                             jnp.asarray(arrs["tile_ids"]),
                             jnp.asarray(arrs["col_blk"]), tuple(meta["shape"]),
                             tuple(meta["tileshape"]), meta["nnz"],
                             period=meta.get("period"))
    if kind == "permuted_block":
        inner = _op_restore("block", arrs, meta)
        return PermutedBlockSparseOp(inner, jnp.asarray(arrs["perm_in"]),
                                     jnp.asarray(arrs["perm_out_pos"]),
                                     tuple(meta["outer_shape"]),
                                     layout_in=meta.get("layout_in"),
                                     layout_out=meta.get("layout_out"))
    if kind == "ell":
        return EllOp(jnp.asarray(arrs["cols"]), jnp.asarray(arrs["vals"]),
                     tuple(meta["shape"]), meta["nnz"])
    if kind == "repblockdiag":
        return RepeatedBlockDiagOp(jnp.asarray(arrs["F"]), jnp.asarray(arrs["bias"]),
                                   int(meta["shape"][0]) - 1, nnz=meta["nnz"])
    if kind == "kron":
        return KroneckerOp(jnp.asarray(arrs["Cm"]), jnp.asarray(arrs["Sm"]),
                           jnp.asarray(arrs["bias"]), nnz=meta["nnz"],
                           perm_in=jnp.asarray(arrs["perm_in"])
                           if "perm_in" in arrs else None,
                           perm_out=jnp.asarray(arrs["perm_out"])
                           if "perm_out" in arrs else None)
    if kind == "tapsum":
        return TapSumOp(jnp.asarray(arrs["K"]), jnp.asarray(arrs["S"]),
                        jnp.asarray(arrs["bias"]), nnz=meta["nnz"])
    if kind == "chanbcast":
        sub = {k[len("in_"):]: v for k, v in arrs.items() if k.startswith("in_")}
        inner = _op_restore(meta["inner_kind"], sub, meta["inner_meta"])
        return ChannelBroadcastOp(inner, int(meta["C"]),
                                  jnp.asarray(arrs["bias_sp"]), nnz=meta["nnz"])
    if kind == "chain":
        ops = []
        for i, part in enumerate(meta["parts"]):
            pref = "c%d_" % i
            sub = {k[len(pref):]: v for k, v in arrs.items() if k.startswith(pref)}
            ops.append(_op_restore(part["kind"], sub, part["meta"]))
        return ChainedOp(ops)
    raise ValueError(kind)


def _csr_arrays(prefix, M):
    M = scipy.sparse.csr_matrix(M)
    return {prefix + "_data": M.data, prefix + "_indices": M.indices,
            prefix + "_indptr": M.indptr,
            prefix + "_shape": np.asarray(M.shape)}


def _csr_restore(prefix, z):
    return scipy.sparse.csr_matrix(
        (z[prefix + "_data"], z[prefix + "_indices"], z[prefix + "_indptr"]),
        shape=tuple(z[prefix + "_shape"]))


def save_keynet(path, knet, sensor=None, include_keys=False):
    """Serialize a KeyedModel (and optionally its sensor keypair) to .npz."""
    arrays, manifest = {}, {"layers": [], "outshape": list(knet._outshape),
                            "include_keys": bool(include_keys)}
    for name, l in knet.layers().items():
        assert "__" not in name, \
            "layer name %r: '__' is the array-key separator" % name
        if l == "relu":
            manifest["layers"].append({"name": name, "kind": "relu"})
            continue
        kind, arrs, meta = _op_state(l.op())
        key = "layer_%s" % name
        for k, v in arrs.items():
            arrays["%s__%s" % (key, k)] = v
        manifest["layers"].append({
            "name": name, "kind": kind, "meta": _jsonable(meta),
            "relu": bool(l._relu), "repr": l._repr, "layertype": l._layertype,
            "shape": list(l.shape), "nnz": l.nnz()})
    if include_keys:
        if knet._imagekey is not None:
            arrays.update(_csr_arrays("imagekey", knet._imagekey))
        if knet._embeddingkey is not None:
            arrays.update(_csr_arrays("embeddingkey", knet._embeddingkey))
        if sensor is not None:
            arrays.update(_csr_arrays("sensor_encrypt", sensor._encryptkey))
            arrays.update(_csr_arrays("sensor_decrypt", sensor._decryptkey))
            manifest["sensor_inshape"] = list(sensor._inshape[1:])
    arrays["__manifest__"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_keynet(path):
    """Restore (sensor_or_None, KeyedModel) from save_keynet output."""
    from collections import OrderedDict
    from .system import KeyedModel, KeyedSensor

    z = np.load(path, allow_pickle=False)
    manifest = json.loads(bytes(z["__manifest__"]).decode())
    layers = OrderedDict()
    for entry in manifest["layers"]:
        name = entry["name"]
        if entry["kind"] == "relu":
            layers[name] = "relu"
            continue
        key = "layer_%s" % name
        arrs = {k.split("__", 1)[1]: z[k] for k in z.files
                if k.startswith(key + "__")}
        op = _op_restore(entry["kind"], arrs, entry["meta"])
        kl = KeyedLayer.__new__(KeyedLayer)
        kl._op = op
        kl._relu = entry["relu"]
        kl._repr = entry["repr"]
        kl._layertype = entry["layertype"]
        kl._inshape = kl._outshape = kl._tileshape = None
        kl.shape = tuple(entry["shape"])
        kl._nnz = entry["nnz"]
        kl.W = None
        layers[name] = kl

    imagekey = _csr_restore("imagekey", z) if "imagekey_data" in z.files else None
    embeddingkey = _csr_restore("embeddingkey", z) if "embeddingkey_data" in z.files else None
    knet = KeyedModel.from_layers(layers, manifest["outshape"],
                                  imagekey=imagekey, embeddingkey=embeddingkey)
    sensor = None
    if "sensor_encrypt_data" in z.files:
        sensor = KeyedSensor(tuple(manifest["sensor_inshape"]),
                             (_csr_restore("sensor_encrypt", z),
                              _csr_restore("sensor_decrypt", z)))
    return sensor, knet


def _jsonable(meta):
    out = {}
    for k, v in meta.items():
        out[k] = list(v) if isinstance(v, tuple) else v
    return out
