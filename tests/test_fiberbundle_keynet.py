"""Fiber-bundle sensor + keyed model end-to-end with the reference's
fiberbundle-retrained checkpoint (reference demo/figures.py:121-179 protocol:
the model is trained on simulated fiber-bundle imagery, then keyed)."""

import numpy as np
import pytest

import keynet_tpu as keynet

FB_PTH = "/root/reference/models/mnist_lenet_avgpool_fiberbundle.pth"


def test_fiberbundle_checkpoint_keynet():
    net = keynet.models.LeNet_AvgPool().load_torch_state_dict(FB_PTH)
    sensor, knet = keynet.PermutationKeynet((1, 28, 28), net, seed=0)
    rng = np.random.default_rng(0)
    # simulate a fiber-bundle MNIST-scale image, normalize with the reference's
    # sim constants (demo/figures.py:153)
    img = np.uint8(rng.random((28, 28, 3)) * 255)
    sim = keynet.fiberbundle.transform(img, outshape=(28, 28), seed=1)
    x = np.asarray(sim, dtype=np.float32).mean(axis=2) / 255.0
    x = (x - keynet.models.zoo.MNIST_FIBERBUNDLE_MEAN) / keynet.models.zoo.MNIST_FIBERBUNDLE_STD
    x = x[None, None]
    y = np.asarray(net.forward(x)).flatten()
    xc = sensor.fromtensor(x).encrypt().tensor()
    yk = np.asarray(knet.forward(xc)).flatten()
    assert np.allclose(y, yk, atol=1e-4)


def test_optical_fiberbundle_keynet_factory(tmp_path):
    """OpticalFiberBundleKeynet: simulated sensor load + keyed model
    (the factory the reference shipped broken, keynet/system.py:512-516)."""
    from PIL import Image
    img = Image.fromarray(np.uint8(np.random.default_rng(2).random((64, 64, 3)) * 255))
    p = str(tmp_path / "scene.png")
    img.save(p)

    net = keynet.models.LeNet_AvgPool(seed=1)  # grayscale net; sensor is separate
    sensor, knet = keynet.OpticalFiberBundleKeynet(
        (3, 64, 64), None, seed=0, global_geometric="permutation")
    sensor.load(p)
    assert sensor.image().shape == (64, 64, 3)
    cipher = np.asarray(sensor.encrypt().tensor())
    assert cipher.shape == (1, 3 * 64 * 64 + 1)
    sensor.decrypt()
    assert np.asarray(sensor.tensor()).shape == (1, 3, 64, 64)
