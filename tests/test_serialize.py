"""Keyed-system checkpointing: save -> load -> identical forward (reference
parity: pickled (sensor, knet) tuples, test_keynet.py:106; SURVEY.md 5.4)."""

import numpy as np
import pytest

import keynet_tpu as keynet
from keynet_tpu.serialize import save_keynet, load_keynet


def test_save_load_roundtrip(tmp_path):
    net = keynet.models.LeNet_AvgPool(seed=1)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0,
                                            do_output_encryption=True)
    x = np.random.default_rng(0).normal(size=(2, 1, 28, 28)).astype(np.float32)
    xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
    y0 = np.asarray(knet.forward(xc))

    p = str(tmp_path / "keynet.npz")
    save_keynet(p, knet, sensor=sensor, include_keys=True)
    sensor2, knet2 = load_keynet(p)

    y1 = np.asarray(knet2.forward(xc))
    assert np.allclose(y0, y1, atol=1e-6)
    # sensor keypair restored: encrypting with the loaded sensor matches
    xc2 = np.asarray(sensor2.fromtensor(x).encrypt().tensor())
    assert np.allclose(xc, xc2, atol=1e-5)


def test_public_save_has_no_keys(tmp_path):
    net = keynet.models.LeNet_AvgPool(seed=1)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    p = str(tmp_path / "public.npz")
    save_keynet(p, knet.public(), include_keys=False)
    sensor2, knet2 = load_keynet(p)
    assert sensor2 is None
    assert knet2.imagekey() is None and knet2.embeddingkey() is None
    # still evaluates (public cipher embedding path)
    x = np.random.default_rng(1).normal(size=(1, 1, 28, 28)).astype(np.float32)
    xc = sensor.fromtensor(x).encrypt().tensor()
    y = knet2.forward(xc)
    assert np.asarray(y).shape == (1, 10)


def test_block_sparse_op_roundtrip(tmp_path):
    """Layers in every device format survive the roundtrip."""
    from keynet_tpu.globals import GLOBAL
    old = GLOBAL["DENSE_MAX_BYTES"]
    GLOBAL["DENSE_MAX_BYTES"] = 1 << 20
    try:
        net = keynet.models.LeNet_AvgPool(seed=1)
        sensor, knet = keynet.Keynet((1, 28, 28), net,
                                     global_geometric="hierarchical_permutation",
                                     hierarchical_blockshape=(2, 2),
                                     hierarchical_permute_at_level=(0,),
                                     local_geometric="givens_orthogonal", alpha=2.0,
                                     blocksize=4, local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, memoryorder="block", seed=0)
        fmts = {type(l.op()).__name__ for l in knet.layers().values() if l != "relu"}
        assert "PermutedBlockSparseOp" in fmts and "EllOp" in fmts
        x = np.random.default_rng(0).normal(size=(1, 1, 28, 28)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "k.npz")
        save_keynet(p, knet, sensor=sensor, include_keys=True)
        _, knet2 = load_keynet(p)
        assert np.allclose(y0, np.asarray(knet2.forward(xc)), atol=1e-6)
    finally:
        GLOBAL["DENSE_MAX_BYTES"] = old


def test_bf16_tiles_roundtrip_bitwise(tmp_path):
    """bf16 device tiles are stored as their uint16 bit pattern (half the
    bytes of widening to f32) and must restore bit-identically."""
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import BlockSparseOp, PermutedBlockSparseOp
    old_dense, old_dtype = GLOBAL["DENSE_MAX_BYTES"], GLOBAL.get("TILE_DTYPE")
    GLOBAL["DENSE_MAX_BYTES"] = 1 << 20
    GLOBAL["TILE_DTYPE"] = "bfloat16"
    try:
        net = keynet.models.LeNet_AvgPool(seed=1)
        sensor, knet = keynet.Keynet((1, 28, 28), net,
                                     global_geometric="hierarchical_permutation",
                                     hierarchical_blockshape=(2, 2),
                                     hierarchical_permute_at_level=(0,),
                                     local_geometric="givens_orthogonal", alpha=2.0,
                                     blocksize=4, local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, memoryorder="block", seed=0)
        blk = next(l.op() for l in knet.layers().values()
                   if l != "relu" and isinstance(l.op(), PermutedBlockSparseOp))
        assert str(blk.inner.tiles.dtype) == "bfloat16"
        x = np.random.default_rng(0).normal(size=(1, 1, 28, 28)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "bf16.npz")
        save_keynet(p, knet, sensor=sensor, include_keys=True)
        z = np.load(p)
        tile_arrs = [z[k] for k in z.files if k.endswith("__tiles")]
        assert tile_arrs and all(a.dtype == np.uint16 for a in tile_arrs)
        _, knet2 = load_keynet(p)
        blk2 = next(l.op() for l in knet2.layers().values()
                    if l != "relu" and isinstance(l.op(), PermutedBlockSparseOp))
        assert str(blk2.inner.tiles.dtype) == "bfloat16"
        assert np.array_equal(y0, np.asarray(knet2.forward(xc)))
    finally:
        GLOBAL["DENSE_MAX_BYTES"] = old_dense
        if old_dtype is None:
            GLOBAL.pop("TILE_DTYPE", None)
        else:
            GLOBAL["TILE_DTYPE"] = old_dtype


def test_channel_broadcast_pool_roundtrip(tmp_path):
    """A ChannelBroadcastOp pool (spatial factor + per-channel bias) must
    round-trip bitwise — VGG-224 serving snapshots depend on it (the factored
    pools are what keep B=1 off the slow ELL gather path)."""
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import ChannelBroadcastOp
    old_min = GLOBAL.get("POOL_FACTOR_MIN_N")
    GLOBAL["POOL_FACTOR_MIN_N"] = 1  # engage the factored pool at 28x28 scale
    try:
        net = keynet.models.LeNet_AvgPool(seed=1)
        sensor, knet = keynet.TiledOrthogonalKeynet((1, 28, 28), net,
                                                    tilesize=14, seed=0)
        assert any(l != "relu" and isinstance(l.op(), ChannelBroadcastOp)
                   for l in knet.layers().values())
        x = np.random.default_rng(0).normal(size=(2, 1, 28, 28)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "chanbcast.npz")
        save_keynet(p, knet, sensor=sensor, include_keys=True)
        _, knet2 = load_keynet(p)
        assert any(l != "relu" and isinstance(l.op(), ChannelBroadcastOp)
                   for l in knet2.layers().values())
        assert np.array_equal(y0, np.asarray(knet2.forward(xc)))
    finally:
        if old_min is None:
            GLOBAL.pop("POOL_FACTOR_MIN_N", None)
        else:
            GLOBAL["POOL_FACTOR_MIN_N"] = old_min


def test_chain_and_repblockdiag_roundtrip(tmp_path):
    """A split/masked layer checkpoint (ChainedOp containing a
    RepeatedBlockDiagOp and a layout-carrying streamed PermutedBlockSparseOp)
    must round-trip exactly (round-2 advisory: these kinds had no test)."""
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import (ChainedOp, RepeatedBlockDiagOp,
                                          PermutedBlockSparseOp)
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, Linear
    old = GLOBAL["STREAM_NNZ"]
    GLOBAL["STREAM_NNZ"] = 100_000  # force the streaming/masked path at 28x28
    old_kron = GLOBAL["KRON_FACTORED"]
    GLOBAL["KRON_FACTORED"] = "never"  # cover the STREAMED chain kinds
    try:
        net = Model([Conv2d("conv1", 4, 4, 3), ReLU("relu1"),
                     Linear("fc1", 4 * 28 * 28, 10)],
                    inshape=(4, 28, 28), seed=2)
        sensor, knet = keynet.Keynet((4, 28, 28), net,
                                     global_geometric="hierarchical_permutation",
                                     hierarchical_blockshape=(2, 2),
                                     hierarchical_permute_at_level=(0, 1),
                                     local_geometric="doubly_stochastic", alpha=2,
                                     blocksize=14,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        kinds = {type(l.op()).__name__ for l in knet.layers().values()
                 if l != "relu"}
        assert "ChainedOp" in kinds, kinds
        chain = next(l.op() for l in knet.layers().values()
                     if l != "relu" and type(l.op()).__name__ == "ChainedOp")
        sub = {type(o).__name__ for o in chain.ops}
        assert "RepeatedBlockDiagOp" in sub and "PermutedBlockSparseOp" in sub, sub
        assert any(isinstance(o, PermutedBlockSparseOp) and o.layout_in is not None
                   for o in chain.ops)
        x = np.random.default_rng(0).normal(size=(2, 4, 28, 28)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "chain.npz")
        save_keynet(p, knet, sensor=sensor, include_keys=True)
        _, knet2 = load_keynet(p)
        y1 = np.asarray(knet2.forward(xc))
        assert np.array_equal(y0, y1)  # same arrays, same program: bitwise
    finally:
        GLOBAL["STREAM_NNZ"] = old
        GLOBAL["KRON_FACTORED"] = old_kron


def test_kron_chain_roundtrip(tmp_path):
    """A Kronecker/TapSum chain layer (the round-3 factored conv format the
    VGG-224 serving snapshots depend on) must round-trip bitwise."""
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import ChainedOp, KroneckerOp, TapSumOp
    from keynet_tpu.models.specs import Model, Conv2d, ReLU, Linear
    old = GLOBAL["STREAM_NNZ"]
    GLOBAL["STREAM_NNZ"] = 10_000  # force factored path at 16x16
    try:
        net = Model([Conv2d("conv1", 4, 4, 3), ReLU("relu1"),
                     Linear("fc1", 4 * 16 * 16, 10)], inshape=(4, 16, 16),
                    seed=2)
        sensor, knet = keynet.Keynet((4, 16, 16), net,
                                     local_geometric="givens_orthogonal",
                                     alpha=8, blocksize=16,
                                     local_photometric="uniform_random_affine",
                                     beta=1.0, gamma=1.0, seed=3)
        chain = next((l.op() for l in knet.layers().values()
                      if l != "relu" and isinstance(l.op(), ChainedOp)), None)
        assert chain is not None
        sub = {type(o).__name__ for o in chain.ops}
        assert "KroneckerOp" in sub and "TapSumOp" in sub, sub
        x = np.random.default_rng(0).normal(size=(2, 4, 16, 16)).astype(np.float32)
        xc = np.asarray(sensor.fromtensor(x).encrypt().tensor())
        y0 = np.asarray(knet.forward(xc))
        p = str(tmp_path / "kronchain.npz")
        save_keynet(p, knet, sensor=sensor, include_keys=True)
        _, knet2 = load_keynet(p)
        chain2 = next(l.op() for l in knet2.layers().values()
                      if l != "relu" and isinstance(l.op(), ChainedOp))
        assert {type(o).__name__ for o in chain2.ops} == sub
        assert np.array_equal(y0, np.asarray(knet2.forward(xc)))
    finally:
        GLOBAL["STREAM_NNZ"] = old
