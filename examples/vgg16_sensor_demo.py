"""vgg16.ipynb sensor recipe (reference demo/vgg16.ipynb), TPU-native.

Builds the published stochastic sensor configuration, encrypts an image,
saves the cipher as a PNG, and decrypts it back:

    python examples/vgg16_sensor_demo.py [image.jpg]

Without an argument a synthetic test image is used (no network egress).
"""

import sys
import time

import numpy as np

from keynet_tpu.system import Keynet


def main(imgfile=None):
    t0 = time.time()
    sensor, _ = Keynet(
        inshape=(3, 224, 224), net=None, blocksize=224 // 16,
        global_geometric="hierarchical_permutation",
        hierarchical_blockshape=(2, 2),
        hierarchical_permute_at_level=(0, 1, 2, 3),
        global_photometric="blockwise_constant_bias",
        local_geometric="givens_orthogonal", alpha=224 // 16,
        local_photometric="uniform_random_affine", beta=10.0, gamma=1000.0,
        memoryorder="block", seed=42)
    print("keygen: %.1f s  %r" % (time.time() - t0, sensor))

    if imgfile:
        # VGGFace eval preprocessing (reference keynet/vgg.py:23-35): resize
        # shortest side to 256, center-crop 224, BGR mean-pixel subtraction —
        # the tensor a VGGFace checkpoint expects through the keynet.
        from PIL import Image
        from keynet_tpu.models import vgg16_preprocess
        chw = vgg16_preprocess()(Image.open(imgfile))
        sensor.fromtensor(chw[None])
    else:
        rng = np.random.default_rng(0)
        yy, xx = np.mgrid[0:224, 0:224]
        im = np.stack([128 + 100 * np.sin(xx / 12.0),
                       128 + 100 * np.cos(yy / 9.0),
                       rng.integers(0, 256, (224, 224))], axis=-1).astype(np.float32)
        sensor.fromimage(im)

    t0 = time.time()
    sensor.encrypt()
    print("encrypt: %.3f s  cipher shape %s" % (time.time() - t0,
                                                np.asarray(sensor.tensor()).shape))

    from PIL import Image
    Image.fromarray(sensor.asimage()).save("/tmp/keynet_keyed.png")
    print("keyed image -> /tmp/keynet_keyed.png")

    outfile, imagekey = sensor.save("/tmp/keynet_cipher.png")
    print("cipher PNG + composed decrypt key -> %s" % outfile)

    t0 = time.time()
    sensor.decrypt()
    print("decrypt: %.3f s" % (time.time() - t0))
    Image.fromarray(sensor.asimage()).save("/tmp/keynet_decrypted.png")
    print("decrypted image -> /tmp/keynet_decrypted.png")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
