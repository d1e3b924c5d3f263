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
