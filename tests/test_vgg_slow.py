"""VGG-16 @ 3x224x224 end-to-end (the reference's heavyweight CLI-gated cases,
test/test_keynet.py:83-175).  ~25 min conversion: gated behind -m vgg and
meant for the TPU box; measured result recorded in README.md."""

import numpy as np
import pytest

import keynet_tpu as keynet


@pytest.mark.vgg
@pytest.mark.slow
def test_vgg16_identity():
    net = keynet.models.VGG16(seed=5)
    sensor, knet = keynet.IdentityKeynet((3, 224, 224), net, seed=0)
    x = np.random.default_rng(0).normal(size=(1, 3, 224, 224)).astype(np.float32)
    y = np.asarray(net.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yk = np.asarray(knet.forward(xc)).flatten()
    assert np.abs(y - yk).max() < 1e-3  # reference tier for VGG depth
    assert knet.num_parameters() > 10_000_000_000  # ~15.0e9 nnz
    assert knet.device_bytes() < 2e9   # tiles dedup to < 2 GB


@pytest.mark.vgg
@pytest.mark.slow
def test_vgg16_stochastic():
    """The reference stochastic recipe at 224 (test/test_keynet.py:116-130):
    hierarchical global permutation + doubly-stochastic local + local affine.
    Runs via masked re-keying chains + dense-inverse splits (streaming.py);
    the reference needs 48 host processes for this configuration."""
    net = keynet.models.VGG16(seed=5)
    sensor, knet = keynet.Keynet((3, 224, 224), net,
                                 global_geometric="hierarchical_permutation",
                                 hierarchical_blockshape=(2, 2),
                                 hierarchical_permute_at_level=(0, 1, 2),
                                 local_geometric="doubly_stochastic", alpha=2.0,
                                 blocksize=14,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="channel", seed=0)
    x = np.random.default_rng(0).normal(size=(1, 3, 224, 224)).astype(np.float32)
    y = np.asarray(net.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yk = np.asarray(knet.forward(xc)).flatten()
    assert np.abs(y - yk).max() < 1e-3


@pytest.mark.vgg
@pytest.mark.slow
def test_vgg16_orthogonal_tiled():
    """Block-local givens keys at 224 (reference test_vgg16_orthogonal recipe)."""
    net = keynet.models.VGG16(seed=5)
    sensor, knet = keynet.Keynet((3, 224, 224), net,
                                 global_geometric="identity",
                                 local_geometric="givens_orthogonal", alpha=2.0,
                                 blocksize=14,
                                 local_photometric="uniform_random_affine",
                                 beta=1.0, gamma=1.0, memoryorder="channel", seed=0)
    x = np.random.default_rng(0).normal(size=(1, 3, 224, 224)).astype(np.float32)
    y = np.asarray(net.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yk = np.asarray(knet.forward(xc)).flatten()
    assert np.abs(y - yk).max() < 1e-3
