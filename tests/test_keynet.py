"""End-to-end keynet equivalence: keynet(encrypt(x)) == net(x) per key family
(the core invariant; reference test/test_keynet.py with the same atol tiers:
1e-5 LeNet-scale, 1e-4 photometric-affine)."""

import numpy as np
import pytest

import keynet_tpu as keynet
from keynet_tpu.models import (Model, Conv2d, AvgPool2d, ReLU, Linear,
                               BatchNorm2d, Dropout)


@pytest.fixture(scope="module")
def lenet():
    return keynet.models.LeNet_AvgPool(seed=1)


@pytest.fixture(scope="module")
def lenet_trained(mnist_lenet_avgpool_pth):
    return keynet.models.LeNet_AvgPool().load_torch_state_dict(mnist_lenet_avgpool_pth)


def _check(net, sensor, knet, atol=1e-5, x=None, batch=2):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(batch, *net.inshape)).astype(np.float32) if x is None else x
    y = np.asarray(net.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yh = np.asarray(knet.forward(xc)).flatten()
    err = np.abs(y - yh).max()
    assert err < atol, "keyed-vs-source max err %g >= %g" % (err, atol)
    return err


def test_identity_keynet(lenet_trained):
    sensor, knet = keynet.IdentityKeynet((1, 28, 28), lenet_trained, seed=0)
    _check(lenet_trained, sensor, knet, atol=1e-5)


def test_identity_keynet_nnz(lenet_trained):
    """PermutationKeynet LeNet nnz matches the reference's published per-layer
    counts summing to 323,491 (BASELINE.md; demo/lenet.ipynb cell-3)."""
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), lenet_trained, seed=0)
    assert knet.num_parameters() == 323491


def test_permutation_keynet(lenet_trained):
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), lenet_trained, seed=0)
    _check(lenet_trained, sensor, knet, atol=1e-5)


def test_pool_layers_compact(lenet_trained):
    """Keyed pools pack as ELL, not dense: device bytes stay within ~2x the
    nnz payload (8 bytes/slot) instead of the 22 MB dense footprint
    (round-1 STATUS item 5; reference stores scipy CSR, keynet/sparse.py:206)."""
    from keynet_tpu.ops.operators import EllOp
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), lenet_trained, seed=0)
    pools = [l for name, l in knet.layers().items() if "pool" in name]
    assert len(pools) == 2
    for l in pools:
        assert isinstance(l.op(), EllOp), repr(l)
        assert l.device_bytes() <= 3 * 8 * l.nnz(), \
            "pool device bytes %d > 3x nnz payload %d" % (l.device_bytes(), 8 * l.nnz())


def test_permutation_block_memoryorder(lenet_trained):
    sensor, knet = keynet.Keynet((1, 28, 28), lenet_trained,
                                 global_geometric="permutation",
                                 memoryorder="block", blocksize=14, seed=0)
    _check(lenet_trained, sensor, knet, atol=1e-5)


def test_photometric_gain(lenet):
    sensor, knet = keynet.Keynet((1, 28, 28), lenet,
                                 global_photometric="uniform_random_gain", beta=1.0, seed=0)
    _check(lenet, sensor, knet, atol=1e-5)


def test_photometric_bias(lenet):
    sensor, knet = keynet.Keynet((1, 28, 28), lenet,
                                 global_photometric="uniform_random_bias", gamma=1.0, seed=0)
    _check(lenet, sensor, knet, atol=1e-5)


def test_photometric_affine(lenet):
    sensor, knet = keynet.Keynet((1, 28, 28), lenet,
                                 global_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, seed=0)
    _check(lenet, sensor, knet, atol=1e-4)


def test_lenet_orthogonal(lenet):
    """hierarchical_rotation + block memoryorder + givens local keys
    (reference test/test_keynet.py:178-197)."""
    sensor, knet = keynet.Keynet((1, 28, 28), lenet,
                                 global_geometric="hierarchical_rotation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0,),
                                 global_photometric="uniform_random_bias",
                                 local_geometric="givens_orthogonal", alpha=2.0, blocksize=8,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="block", seed=0)
    _check(lenet, sensor, knet, atol=1e-4)


def test_lenet_orthogonal_tiled(lenet):
    sensor, knet = keynet.Keynet((1, 28, 28), lenet, tileshape=(4, 4),
                                 global_geometric="hierarchical_permutation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0, 1),
                                 global_photometric="identity",
                                 local_geometric="givens_orthogonal", alpha=2.0, blocksize=4,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="block", seed=0)
    _check(lenet, sensor, knet, atol=1e-4)


def test_stochastic_keynet(lenet):
    sensor, knet = keynet.StochasticKeynet((1, 28, 28), lenet, alpha=2, blocksize=7, seed=0)
    _check(lenet, sensor, knet, atol=1e-4)


def test_output_encryption(lenet):
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), lenet,
                                            do_output_encryption=True, seed=0)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 28, 28)).astype(np.float32)
    y = np.asarray(lenet.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    # default forward decrypts with the embedding key
    yh = np.asarray(knet.forward(xc)).flatten()
    assert np.allclose(y, yh, atol=1e-5)
    # without the key the embedding is cipher (different from plaintext)
    y_raw = np.asarray(knet.forward(xc, outkey=None)).flatten()
    assert y_raw.shape == y.shape
    assert not np.allclose(y, y_raw, atol=1e-2)


def test_cross_key_rejection(lenet_trained):
    """An image encrypted with one keynet's sensor must NOT evaluate correctly
    through a different keynet (demo/lenet.ipynb cross-keynet check).  Uses the
    trained checkpoint: untrained random weights are too small to propagate the
    permutation mismatch into a visible output difference."""
    sensor_a, knet_a = keynet.PermutationKeynet((1, 28, 28), lenet_trained, seed=1)
    sensor_b, knet_b = keynet.PermutationKeynet((1, 28, 28), lenet_trained, seed=2)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 1, 28, 28)).astype(np.float32)
    y = np.asarray(lenet_trained.forward(x)).flatten()
    xc_a = sensor_a.fromtensor(x).encrypt().tensor()
    yh_aa = np.asarray(knet_a.forward(xc_a)).flatten()
    yh_ab = np.asarray(knet_b.forward(xc_a)).flatten()
    assert np.allclose(y, yh_aa, atol=1e-5)
    assert np.abs(y - yh_ab).max() > 1e-2


# --------------------------------------------------------------- batchnorm/dropout

def MiniConvNet(batchnorm=True, seed=0):
    """Small net exercising every conversion path: dropout removal, stride-2
    conv, bn fusion ('conv2_bn'), relu-after-bn explicit keying, relu folding."""
    layers = [Dropout("dropout0", 0.2),
              Conv2d("conv1", 3, 8, 3), ReLU("relu1"),
              Conv2d("conv2", 8, 8, 3, stride=2)]
    if batchnorm:
        layers += [BatchNorm2d("conv2_bn", 8)]
    layers += [Dropout("dropout2", 0.5), ReLU("relu2"),
               Conv2d("conv3", 8, 4, 1), ReLU("relu3"),
               AvgPool2d("pool3", 3, 2),
               Linear("fc1", 4 * 4 * 4, 10)]
    return Model(layers, inshape=(3, 16, 16), seed=seed)


def test_miniconvnet_identity_bn():
    net = MiniConvNet(batchnorm=True)
    sensor, knet = keynet.IdentityKeynet((3, 16, 16), net, seed=0)
    _check(net, sensor, knet, atol=1e-5)


def test_miniconvnet_identity_nobn():
    net = MiniConvNet(batchnorm=False)
    sensor, knet = keynet.IdentityKeynet((3, 16, 16), net, seed=0)
    _check(net, sensor, knet, atol=1e-5)


def test_miniconvnet_permutation_bn():
    net = MiniConvNet(batchnorm=True)
    sensor, knet = keynet.PermutationKeynet((3, 16, 16), net, seed=0)
    _check(net, sensor, knet, atol=1e-5)


def test_miniconvnet_orthogonal_tiled():
    net = MiniConvNet(batchnorm=False)
    sensor, knet = keynet.Keynet((3, 16, 16), net, tileshape=(4, 4),
                                 global_geometric="hierarchical_permutation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0,),
                                 local_geometric="givens_orthogonal", alpha=4, blocksize=4,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="block", seed=0)
    _check(net, sensor, knet, atol=1e-4)


# ----------------------------------------------------------------- slow suite

@pytest.mark.slow
def test_allconvnet_identity_bn():
    net = keynet.models.AllConvNet(batchnorm=True, seed=3)
    sensor, knet = keynet.IdentityKeynet((3, 32, 32), net, seed=0)
    _check(net, sensor, knet, atol=1e-4, batch=1)


@pytest.mark.slow
def test_allconvnet_orthogonal_tiled():
    net = keynet.models.AllConvNet(batchnorm=False, seed=3)
    sensor, knet = keynet.Keynet((3, 32, 32), net, tileshape=(8, 8),
                                 global_geometric="hierarchical_permutation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0, 1),
                                 global_photometric="identity",
                                 local_geometric="givens_orthogonal", alpha=8, blocksize=8,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="block", seed=0)
    _check(net, sensor, knet, atol=1e-4, batch=1)
