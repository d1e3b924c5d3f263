"""Source-model parity against the torch oracle fixture (generated from the
reference's shipped MNIST checkpoints by scripts/make_test_fixtures.py)."""

import numpy as np
import pytest

import keynet_tpu as keynet

REF = "/root/reference/models"


def test_lenet_avgpool_matches_torch(lenet_oracle):
    net = keynet.models.LeNet_AvgPool().load_torch_state_dict(REF + "/mnist_lenet_avgpool.pth")
    y = np.asarray(net.forward(lenet_oracle["x"]))
    assert np.abs(y - lenet_oracle["y_avg"]).max() < 1e-4


def test_lenet_maxpool_matches_torch(lenet_oracle):
    net = keynet.models.LeNet().load_torch_state_dict(REF + "/mnist_lenet.pth")
    y = np.asarray(net.forward(lenet_oracle["x"]))
    assert np.abs(y - lenet_oracle["y_max"]).max() < 1e-4


def test_netshape_linked_list():
    net = keynet.models.LeNet_AvgPool()
    s = net.netshape()
    assert s["input"]["nextlayer"] == "conv1"
    assert s["conv1"]["outshape"] == (6, 28, 28)
    assert s["pool1"]["outshape"] == (6, 14, 14)
    assert s["pool2"]["outshape"] == (16, 7, 7)
    assert s["fc1"]["inshape"] == (784, 1, 1)
    assert s["output"]["prevlayer"] == "fc3"
    assert s["output"]["outshape"] == (10, 1, 1)


def test_allconvnet_shapes():
    net = keynet.models.AllConvNet(batchnorm=True)
    s = net.netshape()
    assert s["conv3"]["outshape"] == (96, 16, 16)
    assert s["conv3_bn"]["prevlayer"] == "conv3"
    assert s["conv6"]["outshape"] == (192, 8, 8)
    assert s["fc2"]["outshape"] == (10, 1, 1)
    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    assert np.asarray(net.forward(x)).shape == (1, 10)


def test_vgg16_shapes():
    net = keynet.models.VGG16()
    s = net.netshape()
    assert s["pool5_3"]["outshape"] == (512, 7, 7)
    assert s["fc6"]["inshape"] == (25088, 1, 1)
    assert s["fc8"]["outshape"] == (2622, 1, 1)


def test_param_count_lenet():
    net = keynet.models.LeNet_AvgPool()
    # 6*1*9+6 + 16*6*9+16 + 784*120+120 + 120*84+84 + 84*10+10 = 106,154 params
    assert net.num_parameters() == 106154


def test_prepare_vgg16_image_formula():
    """BGR swap + mean-pixel subtraction + CHW rollaxis, exactly the reference
    formula (keynet/vgg.py:9-20)."""
    import numpy as np
    from keynet_tpu.models import prepare_vgg16_image, VGG16_BGR_MEAN
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(224, 224, 3), dtype=np.uint8)
    out = prepare_vgg16_image(img)
    assert out.shape == (3, 224, 224) and out.dtype == np.float32
    exp = img[..., [2, 1, 0]].astype(np.float32) - np.asarray(
        VGG16_BGR_MEAN, dtype=np.float32)
    assert np.array_equal(out, np.rollaxis(exp, 2, 0))


def test_vgg16_preprocess_pipeline():
    """resize-256 (short side) -> center/random crop 224 -> optional blur ->
    prepare (reference keynet/vgg.py:23-35)."""
    import numpy as np
    from PIL import Image
    from keynet_tpu.models import vgg16_preprocess, VGG16_BGR_MEAN
    rng = np.random.default_rng(1)
    im = Image.fromarray(rng.integers(0, 256, size=(300, 400, 3),
                                      dtype=np.uint8))
    out = vgg16_preprocess()(im)
    assert out.shape == (3, 224, 224)
    # center crop of the 256-short-side resize: constant image survives exactly
    const = Image.new("RGB", (400, 300), (10, 20, 30))
    out_c = vgg16_preprocess()(const)
    exp = np.asarray([30, 20, 10], dtype=np.float32) - np.asarray(
        VGG16_BGR_MEAN, dtype=np.float32)
    assert np.allclose(out_c, exp.reshape(3, 1, 1))
    # jitter path is seeded-reproducible and in-bounds
    j1 = vgg16_preprocess(jitter=True, rng=np.random.default_rng(7))(im)
    j2 = vgg16_preprocess(jitter=True, rng=np.random.default_rng(7))(im)
    assert np.array_equal(j1, j2) and j1.shape == (3, 224, 224)
    # blur engages without error (the reference's branch was a latent NameError)
    b = vgg16_preprocess(blur_radius=2.0, blur_prob=1.0,
                         rng=np.random.default_rng(3))(im)
    assert b.shape == (3, 224, 224) and not np.array_equal(b, out)
