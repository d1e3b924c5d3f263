"""The published vgg16.ipynb sensor recipe (reference demo/vgg16.ipynb cell 3):

    Keynet(inshape=(3,224,224), net=None, blocksize=224//16,
           global_geometric='hierarchical_permutation',
           hierarchical_blockshape=(2,2), hierarchical_permute_at_level=(0,1,2,3),
           global_photometric='blockwise_constant_bias',
           local_geometric='givens_orthogonal', alpha=224//16,
           local_photometric='uniform_random_affine', beta=10.0, gamma=1000.0,
           memoryorder='block')

encrypt -> show (keyed image renders) -> save -> decrypt roundtrip at
3x224x224, exactly the notebook's flow (minus vipy display calls).
"""

import numpy as np
import pytest

from keynet_tpu.system import Keynet


@pytest.mark.slow
def test_vgg16_sensor_recipe(tmp_path):
    sensor, model = Keynet(
        inshape=(3, 224, 224), net=None, blocksize=224 // 16,
        global_geometric="hierarchical_permutation",
        hierarchical_blockshape=(2, 2),
        hierarchical_permute_at_level=(0, 1, 2, 3),
        global_photometric="blockwise_constant_bias",
        local_geometric="givens_orthogonal", alpha=224 // 16,
        local_photometric="uniform_random_affine", beta=10.0, gamma=1000.0,
        memoryorder="block", seed=0)
    assert model is None  # sensor-only recipe (net=None)
    assert sensor._inshape == (1, 3, 224, 224)

    rng = np.random.default_rng(0)
    im = rng.integers(0, 256, (224, 224, 3)).astype(np.float32)

    # encrypt: homogeneous (1, 3*224*224+1) cipher
    sensor.fromimage(im).encrypt()
    assert sensor.isencrypted()
    cipher = np.asarray(sensor.tensor())
    assert cipher.shape == (1, 3 * 224 * 224 + 1)

    # the keyed image must actually be scrambled (notebook "show the keyed image")
    keyed_img = sensor.asimage()
    assert keyed_img.shape == (224, 224, 3) and keyed_img.dtype == np.uint8
    plain_img = ((im - im.min()) / (im.max() - im.min()) * 255).astype(np.uint8)
    assert np.mean(np.abs(keyed_img.astype(int) - plain_img.astype(int))) > 20

    # save the cipher as a PNG with a composed mat2gray decrypt key, reload,
    # decrypt: the full public-release flow
    out, imagekey = sensor.save(str(tmp_path / "cipher.png"))
    sensor2, _ = Keynet(inshape=(3, 224, 224), net=None)
    sensor2.load(out, imagekey=imagekey)
    dec_png = np.asarray(sensor2.decrypt()._tensor).reshape(3, 224, 224)
    # PNG is 8-bit quantized; the key conditioning (beta=10, gamma=1000)
    # amplifies quantization — the image must still be recognizably recovered
    assert np.corrcoef(dec_png.transpose(1, 2, 0).ravel(), im.ravel() / 255.0)[0, 1] > 0.95

    # direct in-memory decrypt is near-exact (float path, no quantization)
    dec = np.asarray(sensor.decrypt()._tensor).reshape(3, 224, 224)
    assert np.abs(dec.transpose(1, 2, 0) - im).max() < 1e-2
