import numpy as np

from keynet_tpu import fiberbundle


def test_simulation_shape_and_range():
    rng = np.random.default_rng(0)
    img = np.uint8(rng.random((128, 128, 3)) * 255)
    sim = fiberbundle.simulation(img, seed=1)
    assert sim.shape == (128, 128, 3)
    assert sim.min() >= 0 and sim.max() <= 255


def test_simulation_no_noise_deterministic():
    rng = np.random.default_rng(1)
    img = np.uint8(rng.random((64, 64, 3)) * 255)
    s1 = fiberbundle.simulation(img, do_camera_noise=False, seed=2)
    s2 = fiberbundle.simulation(img, do_camera_noise=False, seed=2)
    assert np.array_equal(s1, s2)


def test_crosstalk_changes_image():
    rng = np.random.default_rng(2)
    img = np.uint8(rng.random((64, 64, 3)) * 255)
    s0 = fiberbundle.simulation(img, do_camera_noise=False, h_xtalk=0.0, v_xtalk=0.0, seed=3)
    s1 = fiberbundle.simulation(img, do_camera_noise=False, h_xtalk=0.2, v_xtalk=0.2, seed=3)
    assert not np.array_equal(s0, s1)


def test_transform_outshape():
    rng = np.random.default_rng(3)
    img = np.uint8(rng.random((32, 32, 3)) * 255)
    out = fiberbundle.transform(img, outshape=(32, 32), seed=4)
    assert np.asarray(out).shape == (32, 32, 3)


def test_camera_noise_saturation():
    x = np.full((8, 8), 1e9)
    adu = fiberbundle.camera_noise(x, s_pixel=30.0)
    assert adu.max() <= 2 ** 12 - 1
