"""Micro-scale run of the Fig.-6 fiber-bundle protocol script
(scripts/run_fiberbundle_fig6.py; reference demo/figures.py:121-179):
simulate -> estimate constants -> retrain -> validate -> keyed validate.
Synthetic data (zero egress), tiny sizes — exercises every protocol step and
asserts the keyed forward reproduces the source accuracy exactly."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def test_fig6_protocol_micro():
    from run_fiberbundle_fig6 import run
    r = run(epochs=1, n_train=96, n_test=64, batch_size=32, verbose=False)
    assert 0.0 < r["mu"] < 1.0 and r["std"] > 0.0
    assert "raw_ckpt_on_sim" in r and "reference_fb_ckpt_on_sim" in r
    # Fig.-6 invariant: the keyed forward IS the source forward
    assert r["retrained_keyed"] == r["retrained_on_sim"]
