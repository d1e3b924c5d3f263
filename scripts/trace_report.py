"""Summarize a jax.profiler trace directory: total device-lane time and the
top ops by accumulated duration.

The device lane is what matters on this box — host wall times through the
axon tunnel are dominated by dispatch/roundtrip (CLAUDE.md); the per-op
device durations are the ground truth the round-2/3 serving optimizations
were driven by (docs/SERVING.md).

  python scripts/trace_report.py /tmp/stochtrace [--top 25] [--merge-re]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace(root):
    pats = [os.path.join(root, "**", "*.trace.json.gz"),
            os.path.join(root, "**", "*.trace.json")]
    hits = []
    for p in pats:
        hits.extend(glob.glob(p, recursive=True))
    if not hits:
        raise SystemExit("no trace.json[.gz] under %s" % root)
    return max(hits, key=os.path.getmtime)


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--strip-ids", action="store_true", default=True,
                    help="merge ops differing only in trailing .N ids")
    ap.add_argument("--scopes", type=int, default=0,
                    help="aggregate by the first N components of the jax "
                         "named_scope path (event args tf_op/name) instead "
                         "of the HLO op name")
    args = ap.parse_args()

    path = find_trace(args.trace_dir)
    events = load_events(path)

    # map pid -> process name, keep device (TPU/accelerator) lanes
    pname = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pname[e["pid"]] = e.get("args", {}).get("name", "")
    dev_pids = {pid for pid, n in pname.items()
                if re.search(r"TPU|/device:|XLA Op|Device", n, re.I)
                and not re.search(r"host|python|steps", n, re.I)}

    per_op = collections.Counter()
    n_ops = 0
    spans = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        if args.scopes:
            # the xplane->trace conversion carries the framework op path
            # (jit(run)/layername.OpClass/...) in args; aggregate by its
            # leading components for per-layer/per-link tables
            a = e.get("args", {}) or {}
            path = a.get("tf_op") or a.get("name") or ""
            if path:
                name = "/".join(path.split("/")[:args.scopes])
        if args.strip_ids:
            name = re.sub(r"[.\d]+$", "", name)
        per_op[name] += dur
        n_ops += 1
        spans.append((float(e.get("ts", 0.0)), dur))

    if not spans:
        lanes = sorted({pname.get(e.get("pid"), "?") for e in events
                        if e.get("ph") == "X"})
        raise SystemExit("no device-lane events; lanes present: %s" % lanes)

    # wall extent of the device lane (includes gaps) vs busy sum
    t0 = min(ts for ts, _ in spans)
    t1 = max(ts + d for ts, d in spans)
    busy = sum(per_op.values())
    print("trace: %s" % path)
    print("device lanes: %s" % sorted(pname[p] for p in dev_pids))
    print("device busy %.1f ms over %d op executions; lane extent %.1f ms"
          % (busy / 1e3, n_ops, (t1 - t0) / 1e3))
    print("%-64s %10s %7s" % ("op (ids merged)", "total ms", "%busy"))
    for name, dur in per_op.most_common(args.top):
        print("%-64s %10.2f %6.1f%%" % (name[:64], dur / 1e3, 100 * dur / busy))


if __name__ == "__main__":
    main()
