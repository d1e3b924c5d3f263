"""Unit test for the structure attack in scripts/attack_bundle.py.

Runs the attack math (value-set clustering -> tap labeling -> direction
search -> consistency-checked grid embedding) on a synthetic
permutation-conjugated conv Toeplitz — the exact object a PermutationKeynet
publishes as its first keyed layer (reference keynet/layer.py:35 with
permutation A) — and asserts exact recovery of weights and image, up to the
attack's provable dihedral ambiguity.  CPU, <1 s; the full bundle pipeline
is exercised by `python scripts/attack_bundle.py` (results in
docs/DESIGN.md §7).
"""
import itertools
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
from attack_bundle import (best_dihedral_corr, cluster_rows_by_valueset,
                           label_taps, recover_grid)

from keynet_tpu.toeplitz import toeplitz_conv2d


@pytest.mark.parametrize("seed", [0, 7])
def test_permutation_attack_recovers_weights_and_image(seed):
    rng = np.random.default_rng(seed)
    H = W = 10
    n_ch, n_pix = 3, H * W
    f = rng.normal(size=(n_ch, 1, 3, 3)).astype(np.float32)
    W1 = toeplitz_conv2d((1, H, W), f, bias=None, stride=1,
                         format="csr").toarray()
    p_out = rng.permutation(n_ch * n_pix)
    p_in = rng.permutation(n_pix)
    Wc = W1[p_out][:, p_in]                   # P_out · W1 · P_in^T

    cl = cluster_rows_by_valueset(Wc)
    assert cl is not None
    protos, row2ch = cl
    assert len(protos) == n_ch
    # weights recovered exactly (as value sets)
    rec_sets = sorted(sorted(map(float, p)) for p in protos)
    true_sets = sorted(sorted(map(float, w.ravel())) for w in f)
    for a, b in zip(rec_sets, true_sets):
        assert np.allclose(a, b, atol=0)

    dirs4 = [(0, 1), (0, -1), (1, 0), (-1, 0)]
    pos = None
    for ch in range(n_ch):
        tl = label_taps(Wc, row2ch, ch, H, W)
        if tl is None:
            continue
        v_center, edges, _ = tl
        n_ok = 0
        for perm in itertools.permutations(edges):
            lab = {v_center: (0, 0)}
            lab.update(zip(perm, dirs4))
            p = recover_grid(Wc, row2ch, ch, lab, H, W)
            if p is not None:
                n_ok += 1
                pos = p
        if pos is not None:
            # exactly the dihedral orbit survives the consistency check
            assert n_ok == 8
            break
    assert pos is not None

    # applying the recovered layout to a cipher recovers the plaintext
    img = rng.normal(size=n_pix)
    cipher = img[p_in]                         # what the sensor publishes
    rec = np.zeros(n_pix)
    rec[pos] = cipher
    corr = best_dihedral_corr(rec.reshape(H, W), img.reshape(H, W))
    assert corr > 0.9999


def test_attack_aborts_on_mixtures():
    rng = np.random.default_rng(1)
    # dense random rows: no permutation structure — clustering must abort
    assert cluster_rows_by_valueset(rng.normal(size=(40, 50))) is None
