"""Measure first-touch rate on heap GROWTH under the tuned allocator.

The upfront keygen window is dominated by first-touch page faults as the
glibc heap grows (CLAUDE.md; docs/STATUS_R3.md "Known gaps").  This isolates
that cost: allocate `GB` of fresh heap via numpy (mmap disabled by
tune_allocator, so this is brk growth), write one byte per 4 KB page, and
report the touch rate plus the heap VMA's AnonHugePages from smaps.

Usage: PYTHONPATH=/root/repo python scripts/profile_heap_growth.py [GB]
       KEYNET_TPU_MALLOPT=0 ... for the untuned control.
"""
import sys
import time

import numpy as np

import keynet_tpu  # noqa: F401  (import runs tune_allocator)

gb = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
n = int(gb * (1 << 30))

buf = np.empty(n, dtype=np.uint8)
t0 = time.time()
buf[::4096] = 1  # one write per 4 KB page = one first-touch fault each
dt = time.time() - t0
print("first touch of %.1f GB fresh heap: %.2fs = %.0f MB/s"
      % (gb, dt, n / dt / 1e6), flush=True)

t0 = time.time()
buf[::4096] = 2
dt = time.time() - t0
print("re-touch (warm): %.3fs = %.0f MB/s" % (dt, n / dt / 1e6))

# heap VMA hugepage accounting
try:
    with open("/proc/self/smaps") as f:
        block, inblock = [], False
        for line in f:
            if line.rstrip().endswith("[heap]"):
                inblock = True
            elif inblock and line[0].isupper():
                if line.startswith(("AnonHugePages", "Size", "Rss")):
                    block.append(line.strip())
                if line.startswith("VmFlags"):
                    block.append(line.strip())
                    break
        print("[heap] " + "; ".join(block))
except OSError:
    pass
