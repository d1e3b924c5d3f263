"""Tracing/profiling utilities (reference parity: Stopwatch spans +
nnz accounting, SURVEY.md section 5.1; keynet/layer.py:31-41, system.py:153).

Adds jax.profiler integration so keygen/forward spans show up in TensorBoard
traces, plus a per-layer accounting report (nnz, device bytes, format)."""

import contextlib
import time


class Stopwatch:
    """Wall-clock span timer with the reference's fluent feel."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = self._last = time.perf_counter()
        return self

    def since(self, reset=False):
        now = time.perf_counter()
        dt = now - self._t0
        if reset:
            self._t0 = now
        return dt

    def lap(self):
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        return dt

    def __enter__(self):
        return self.reset()

    def __exit__(self, *exc):
        self.elapsed = self.since()


@contextlib.contextmanager
def trace(name, tensorboard_dir=None):
    """jax.profiler trace region; with tensorboard_dir also captures a device
    trace viewable in TensorBoard/XProf."""
    import jax
    ctx = jax.profiler.trace(tensorboard_dir) if tensorboard_dir else contextlib.nullcontext()
    with ctx:
        with jax.profiler.TraceAnnotation(name):
            yield


def annotate(name):
    import jax
    return jax.profiler.TraceAnnotation(name)


def layer_report(knet):
    """Per-layer accounting table: format, shape, nnz, device bytes
    (reference: per-layer nnz repr, keynet/layer.py:84-86)."""
    rows = []
    for name, l in knet.layers().items():
        if l == "relu":
            rows.append({"layer": name, "format": "elementwise-relu",
                         "shape": None, "nnz": 0, "device_bytes": 0})
        else:
            rows.append({"layer": name, "format": type(l.op()).__name__,
                         "shape": tuple(l.shape), "nnz": l.nnz(),
                         "device_bytes": l.device_bytes()})
    return rows


def print_layer_report(knet):
    rows = layer_report(knet)
    total_nnz = sum(r["nnz"] for r in rows)
    total_b = sum(r["device_bytes"] for r in rows)
    for r in rows:
        print("%-12s %-22s %-22s nnz=%-12d %8.2f MB"
              % (r["layer"], r["format"], r["shape"], r["nnz"],
                 r["device_bytes"] / 1e6))
    print("%-12s %-22s %-22s nnz=%-12d %8.2f MB"
          % ("TOTAL", "", "", total_nnz, total_b / 1e6))
    return rows
