"""Sensor fluent API, cipher PNG save/load with composed mat2gray key, public
release semantics (reference keynet/system.py:147-300 behaviors)."""

import os
import numpy as np
import pytest

import keynet_tpu as keynet
from keynet_tpu.homogeneous import affine_to_linear


@pytest.fixture(scope="module")
def sensor():
    s, _ = keynet.Keynet((1, 8, 8), None, global_geometric="permutation",
                         global_photometric="uniform_random_gain", beta=1.0, seed=3)
    return s


def test_encrypt_decrypt_roundtrip(sensor):
    rng = np.random.default_rng(0)
    x = rng.random((1, 1, 8, 8)).astype(np.float32) * 255
    sensor.fromtensor(x)
    assert not sensor.isencrypted()
    sensor.encrypt()
    assert sensor.isencrypted()
    cipher = np.asarray(sensor.tensor())
    assert cipher.shape == (1, 65)
    assert not np.allclose(cipher[0, :-1], x.reshape(-1), atol=1.0)  # actually scrambled
    sensor.decrypt()
    assert not sensor.isencrypted()
    assert np.allclose(np.asarray(sensor.tensor()).reshape(-1), x.reshape(-1), atol=1e-3)


def test_encrypt_idempotent(sensor):
    x = np.random.default_rng(1).random((1, 1, 8, 8)).astype(np.float32)
    c1 = np.asarray(sensor.fromtensor(x).encrypt().tensor())
    c2 = np.asarray(sensor.encrypt().tensor())  # second encrypt() is a no-op
    assert np.allclose(c1, c2)


def test_save_composes_mat2gray_key(tmp_path, sensor):
    """Saving a cipher as PNG quantizes to uint8; the returned composed key
    must decrypt the re-loaded PNG back to the plaintext within quantization
    error (reference keynet/system.py:173-181)."""
    rng = np.random.default_rng(2)
    x = rng.random((1, 1, 8, 8)).astype(np.float32) * 255
    sensor.fromtensor(x).encrypt()
    outfile, composed_key = sensor.save(str(tmp_path / "cipher.png"))
    assert os.path.exists(outfile)

    s2, _ = keynet.Keynet((1, 8, 8), None, seed=99)  # any sensor marshals the load
    s2.load(outfile, imagekey=composed_key)
    x_rec = np.asarray(s2.tensor())[0, :-1].reshape(1, 8, 8)
    assert np.abs(x_rec - x[0]).max() < 6.0  # uint8 quantization of the cipher


def test_public_keyed_sensor():
    s = keynet.PublicKeyedSensor((1, 8, 8))
    x = np.random.default_rng(3).random((1, 1, 8, 8)).astype(np.float32)
    s.fromtensor(x)
    t = np.asarray(s.tensor())
    assert t.shape == (1, 65)
    assert np.allclose(t[0, :-1], x.reshape(-1), atol=1e-6)  # identity key
    with pytest.raises(ValueError):
        s.encrypt()
    with pytest.raises(ValueError):
        s.decrypt()


def test_public_model_strips_keys():
    net = keynet.models.LeNet_AvgPool(seed=1)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    assert knet.imagekey() is not None
    knet.public()
    assert knet.imagekey() is None and knet.embeddingkey() is None
    # a public keynet still runs, returning the (plain) embedding
    x = np.random.default_rng(0).normal(size=(1, 1, 28, 28)).astype(np.float32)
    xc = sensor.fromtensor(x).encrypt().tensor()
    y = knet.forward(xc)
    assert np.asarray(y).shape[-1] == 10


def test_keyed_model_repr_and_accounting():
    net = keynet.models.LeNet_AvgPool(seed=1)
    _, knet = keynet.IdentityKeynet((1, 28, 28), net, seed=0)
    r = repr(knet)
    assert "conv1" in r and "fc3" in r
    assert knet.num_parameters() > 0
    assert knet.device_bytes() > 0


def test_load_image_file(tmp_path):
    from PIL import Image
    img = Image.fromarray(np.uint8(np.random.default_rng(5).random((32, 32, 3)) * 255))
    p = str(tmp_path / "img.png")
    img.save(p)
    s, _ = keynet.Keynet((3, 16, 16), None, seed=0)
    s.load(p)
    assert np.asarray(s.tensor()).shape == (1, 3, 16, 16)
    s2, _ = keynet.Keynet((1, 16, 16), None, seed=0)
    s2.load(p)  # grayscale conversion
    assert np.asarray(s2.tensor()).shape == (1, 1, 16, 16)


def test_nonrelu_layer_named_like_relu_is_not_skipped():
    """A non-ReLU layer whose NAME contains 'relu' must not cause its
    predecessor to be silently dropped (the merge-skip test is isinstance-based,
    not name-substring-based)."""
    from keynet_tpu.models import specs
    net = specs.Model([
        specs.Conv2d("conv1", 1, 2, 3),
        specs.Linear("relutail", 2 * 8 * 8, 4),  # adversarial name
    ], inshape=(1, 8, 8), seed=0)
    sensor, knet = keynet.IdentityKeynet((1, 8, 8), net)
    assert set(knet.layers().keys()) == {"conv1", "relutail"}
    x = np.random.default_rng(0).normal(size=(2, 1, 8, 8)).astype(np.float32)
    xc = sensor.fromtensor(x).encrypt().tensor()
    y = np.asarray(knet.forward(xc))
    y_src = np.asarray(net.forward(x))
    assert np.abs(y - y_src.reshape(y.shape)).max() < 1e-5


def test_tileshape_honored_by_device_format():
    """VERDICT round-2 #5: Tiled*Keynet tilesize must actually change the
    device tiling (Block-ELL granularity and bytes), with off-lane values
    snapped to the MXU-compatible grid."""
    import numpy as np
    from keynet_tpu.system import repair_tileshape, layergen
    from keynet_tpu.models.specs import Conv2d
    from keynet_tpu.globals import GLOBAL
    from keynet_tpu.ops.operators import PermutedBlockSparseOp

    assert repair_tileshape(None) is None
    assert repair_tileshape((128, 128)) == (128, 128)
    assert repair_tileshape((4, 4)) == (4, 4)        # divisor of 128
    assert repair_tileshape((14, 14)) == (16, 16)    # snapped (ref MNIST tile)
    assert repair_tileshape((100, 300)) == (128, 256)

    old = GLOBAL["DENSE_MAX_BYTES"]
    GLOBAL["DENSE_MAX_BYTES"] = 1 << 16  # force the Block-ELL path
    try:
        from keynet_tpu import keys
        rng = np.random.default_rng(0)
        mod = Conv2d("conv1", 4, 4, 3)
        params = {"weight": rng.standard_normal((4, 4, 3, 3)).astype(np.float32),
                  "bias": rng.standard_normal(4).astype(np.float32)}
        shape = (4, 16, 16)
        A, Ainv = keys.keygen(shape, local_geometric="givens_orthogonal",
                              alpha=8, blocksize=4,
                              local_photometric="uniform_random_affine",
                              beta=1.0, gamma=1.0, seed=3)
        l128 = layergen(mod, shape, shape, A, Ainv, params=params)
        l32 = layergen(mod, shape, shape, A, Ainv, params=params,
                       tileshape=(30, 30))  # snaps to (32, 32)
        assert isinstance(l128.op(), PermutedBlockSparseOp)
        assert isinstance(l32.op(), PermutedBlockSparseOp)
        assert l128.op().inner.tileshape == (128, 128)
        assert l32.op().inner.tileshape == (32, 32)
        assert l32.device_bytes() != l128.device_bytes()
        # both tile granularities compute the same operator
        x = rng.standard_normal((2, int(np.prod(shape)) + 1)).astype(np.float32)
        import jax.numpy as jnp
        y1 = np.asarray(l128.op().apply(jnp.asarray(x)))
        y2 = np.asarray(l32.op().apply(jnp.asarray(x)))
        assert np.abs(y1 - y2).max() < 1e-5
    finally:
        GLOBAL["DENSE_MAX_BYTES"] = old
