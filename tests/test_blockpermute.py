import numpy as np

from keynet_tpu.blockpermute import (block_permute, hierarchical_block_permute,
                                     hierarchical_block_permutation,
                                     permutation_vector_to_matrix)


def test_block_permute_preserves_content():
    rng = np.random.default_rng(0)
    img = np.arange(16 * 16 * 3).reshape(16, 16, 3)
    out = block_permute(img, (4, 4), rng)
    assert sorted(out.reshape(-1)) == sorted(img.reshape(-1))
    # blocks move whole: each 4x4x3 block of out equals SOME block of img
    blocks_in = {img[i:i+4, j:j+4].tobytes() for i in range(0, 16, 4) for j in range(0, 16, 4)}
    blocks_out = {out[i:i+4, j:j+4].tobytes() for i in range(0, 16, 4) for j in range(0, 16, 4)}
    assert blocks_in == blocks_out


def test_hierarchical_permute_is_permutation():
    img = np.arange(32 * 32).reshape(32, 32)
    out = hierarchical_block_permute(img, (2, 2), [0, 1], seed=1)
    assert sorted(out.reshape(-1)) == sorted(img.reshape(-1))
    assert not np.array_equal(out, img)


def test_hierarchical_twist_is_rotation_hierarchy():
    img = np.arange(16 * 16).reshape(16, 16)
    out = hierarchical_block_permute(img, (2, 2), [0], seed=2, twist=True)
    assert sorted(out.reshape(-1)) == sorted(img.reshape(-1))


def test_permutation_vector_matches_image_permute():
    """Permutation vector applied to the flattened image equals the permuted
    image (the identity verified by reference test/test_blockpermute.py:62-73)."""
    imgshape = (16, 16, 3)
    rng = np.random.default_rng(3)
    img = rng.normal(size=imgshape)
    rng_a = np.random.default_rng(7)
    rng_b = np.random.default_rng(7)
    out = hierarchical_block_permute(img, (2, 2), [0, 1], rng=rng_a)
    perm = hierarchical_block_permutation(imgshape, (2, 2), [0, 1], rng=rng_b)
    assert np.allclose(img.reshape(-1)[perm], out.reshape(-1))
    P = permutation_vector_to_matrix(perm)
    assert np.allclose(P @ img.reshape(-1), out.reshape(-1))


def test_ragged_blockshape_repair():
    img = np.arange(28 * 28).reshape(28, 28)
    out = hierarchical_block_permute(img, (3, 3), [0], seed=4, strict=False)
    assert sorted(out.reshape(-1)) == sorted(img.reshape(-1))


def test_seed_determinism():
    imgshape = (16, 16, 1)
    p1 = hierarchical_block_permutation(imgshape, (2, 2), [0, 1], seed=5)
    p2 = hierarchical_block_permutation(imgshape, (2, 2), [0, 1], seed=5)
    p3 = hierarchical_block_permutation(imgshape, (2, 2), [0, 1], seed=6)
    assert np.array_equal(p1, p2)
    assert not np.array_equal(p1, p3)
