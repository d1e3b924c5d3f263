"""keynet_tpu — TPU-native Key-Nets: exact encrypted inference for vision CNNs.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of visym/keynet
(Byrne, Decann, Bloom — "Key-Nets: Optical Transformation Convolutional
Networks for Privacy Preserving Vision Sensors", BMVC 2020): a keyed sensor
encrypts an image with a sparse invertible matrix, and a keynet — a source CNN
whose every linear layer W has been replaced by Ŵ = A·[W b;0 1]·A⁻¹ — produces
outputs identical to the source network on the plaintext without decrypting.

Quickstart (mirrors the reference README):

    import keynet_tpu as keynet
    net = keynet.models.LeNet_AvgPool().load_torch_state_dict('mnist_lenet_avgpool.pth')
    (sensor, knet) = keynet.PermutationKeynet(inshape=(1, 28, 28), net=net)
    y = knet.forward(sensor.load('owl.jpg').encrypt().tensor())
"""

from .version import __version__
from . import globals
globals.tune_allocator()  # warm-heap allocator policy (see globals.tune_allocator)
from . import util
from . import homogeneous
from . import toeplitz
from . import blockpermute
from . import keys
from . import fiberbundle
from . import visualize
from . import layer
from . import system
from . import models
from . import ops
from . import parallel
from . import train
from . import datasets
from . import serialize
from . import profiling
from . import challenge
from . import native

from .keys import keygen
from .layer import KeyedLayer
from .system import (KeyedModel, KeyedSensor, PublicKeyedSensor, OpticalFiberBundle,
                     Keynet, IdentityKeynet, PermutationKeynet, StochasticKeynet,
                     TiledIdentityKeynet, TiledPermutationKeynet, TiledOrthogonalKeynet,
                     OpticalFiberBundleKeynet, layergen, fuse_conv2d_and_bn)
