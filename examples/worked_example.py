"""Worked 2x2 example of the Key-Nets construction (reference demo/figures.py:29-88):
a single 2x2 image, one keyed linear layer, showing the homogeneous algebra
Ŵ = A1·[W b;0 1]·A0⁻¹ producing identical outputs on the cipher.

    PYTHONPATH=. python examples/worked_example.py
"""

import numpy as np
import scipy.sparse

from keynet_tpu.homogeneous import affine_to_linear_matrix, numpy_homogenize
from keynet_tpu.keys import keygen

np.set_printoptions(precision=3, suppress=True)


def main():
    rng = np.random.default_rng(0)
    x = rng.random((2, 2)).astype(np.float32)        # the "image"
    W = rng.normal(size=(4, 4)).astype(np.float32)   # a linear layer
    b = rng.normal(size=4).astype(np.float32)

    A0, A0inv = keygen((1, 2, 2), global_geometric="permutation",
                       global_photometric="uniform_random_gain", beta=1.0, seed=1)
    A1, A1inv = keygen((4, 1, 1), global_geometric="permutation", seed=2)

    xh = numpy_homogenize(x)                         # [x; 1]
    cipher = A0 @ xh                                 # keyed sensor output
    print("image x           :", x.ravel())
    print("cipher A0·[x;1]   :", cipher)

    Wh = affine_to_linear_matrix(W, b)               # [W b; 0 1]
    What = scipy.sparse.csr_matrix(A1) @ Wh @ scipy.sparse.csr_matrix(A0inv)
    y_cipher = What @ cipher                         # keyed layer on cipher
    y_plain = W @ x.ravel() + b                      # source layer on plaintext
    y_decrypted = (A1inv @ y_cipher)[:-1]
    print("source  W·x + b   :", y_plain)
    print("keyed   Ŵ·cipher  :", np.asarray(y_cipher).ravel())
    print("decrypted         :", np.asarray(y_decrypted).ravel())
    print("max err           : %.2e" % np.abs(y_decrypted - y_plain).max())


if __name__ == "__main__":
    main()
