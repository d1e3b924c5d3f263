"""Probe the 128-block clustering of EllOp factor columns in a saved keynet
snapshot (round-5 serving work, docs/SERVING.md round 4: the thin EllOp mask
factors are the B=1/B=8 floor).

The candidate reformulation gathers ONE 128-aligned input row per (output
row, distinct 128-block) pair instead of one per ELL entry, then reduces the
K taps in-lane with precomputed 128-wide lane weights; its win is K / D̄ where
D̄ is the mean number of distinct ``col // 128`` values per output row.  This
probe reports the D distribution per EllOp in the snapshot so the regime
switch is measured, not guessed (CLAUDE.md: probe before rerouting).

Pure numpy over the raw .npz — no net reconstruction, no device.

  python scripts/probe_ell_lane_groups.py /tmp/vgg_stoch_r5.npz
"""
import sys
import zipfile

import numpy as np


def probe(path):
    with np.load(path, allow_pickle=False) as z:
        names = [n for n in z.files if n.endswith("_cols")]
        for name in sorted(names):
            cols = z[name]
            vals = z[name[:-5] + "_vals"]
            n_out, K = cols.shape
            live = vals != 0
            blk = np.where(live, cols // 128, -1)
            blk_sorted = np.sort(blk, axis=1)
            # distinct non-(-1) blocks per row
            d = (np.diff(blk_sorted, axis=1) != 0).sum(axis=1) + 1
            d = d - (blk_sorted[:, 0] == -1) * (
                (blk_sorted != -1).any(axis=1).astype(np.int64))
            d = np.maximum(d, (live.any(axis=1)).astype(np.int64))
            hist = np.bincount(d, minlength=K + 1)
            kpr = live.sum(1).mean()
            print("%-48s rows=%8d K=%2d nnz/row=%.1f  D mean=%.2f max=%d" %
                  (name[:-5], n_out, K, kpr, d.mean(), d.max()))
            print("    D hist: " + "  ".join(
                "%d:%d" % (i, c) for i, c in enumerate(hist) if c))
            # memory of the lane-weight form at the padded max D
            Dmax = int(d.max())
            mb = n_out * Dmax * (128 * 4 + 4) / 1e6
            print("    lane-weight form @Dmax=%d: %.0f MB f32 "
                  "(current ELL %.0f MB); gather rows %.2fM (entries %.2fM)" %
                  (Dmax, mb, n_out * K * 8 / 1e6, n_out * Dmax / 1e6,
                   n_out * K / 1e6))


if __name__ == "__main__":
    probe(sys.argv[1] if len(sys.argv) > 1 else "/tmp/vgg_stoch_r5.npz")
