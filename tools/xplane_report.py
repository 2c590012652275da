#!/usr/bin/env python
"""Op-level device-time report from a jax.profiler trace.

tensorboard isn't usable here, but the xplane protobuf schema ships with
tensorflow, so this parses the raw trace: aggregate device-plane event
durations by HLO op category / name and print the top-k.

Usage:
  python tools/xplane_report.py <trace_dir> [--top 30]
  # trace_dir is the dir passed to jax.profiler.trace(); the newest
  # plugins/profile/*/ *.xplane.pb under it is used.
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys


def find_xplane(trace_dir: str) -> str:
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not pats:
        raise SystemExit(f"no *.xplane.pb under {trace_dir}")
    return pats[-1]


def load_planes(path: str):
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())
    return xspace.planes


_FUSION_RE = re.compile(r"\.\d+$")


def aggregate(planes, device_only=True):
    """{plane_name: {op_name: (total_ps, count)}} from line events."""
    out = {}
    for plane in planes:
        if device_only and not (
            "TPU" in plane.name or "GPU" in plane.name or "/device:" in plane.name
        ):
            continue
        ev_names = plane.event_metadata
        agg = collections.defaultdict(lambda: [0, 0])
        # avoid double counting: when an "XLA Ops" line exists, module- and
        # step-level lines on the same plane nest the same time
        lines = plane.lines
        # "Async XLA Ops" events overlap the sync line and span their waits
        op_lines = [l for l in lines if l.name == "XLA Ops"]
        if not op_lines:
            op_lines = [l for l in lines if "Ops" in l.name]
        if op_lines:
            lines = op_lines
        for line in lines:
            for ev in line.events:
                md = ev_names.get(ev.metadata_id)
                name = md.name if md else str(ev.metadata_id)
                a = agg[name]
                a[0] += ev.duration_ps
                a[1] += 1
        if agg:
            out[plane.name] = agg
    return out


def bucket(name: str) -> str:
    """Collapse HLO op names into readable buckets."""
    n = _FUSION_RE.sub("", name)
    for key in ("convolution", "dot", "fusion", "reduce", "copy", "transpose",
                "all-reduce", "scatter", "gather", "while", "select", "rng",
                "dynamic-slice", "dynamic-update-slice", "custom-call",
                "broadcast", "iota", "convert", "pad", "concatenate"):
        if key in n:
            return key
    return n[:40]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="report raw op names, not buckets")
    ap.add_argument("--all-planes", action="store_true")
    args = ap.parse_args()

    path = find_xplane(args.trace_dir)
    print(f"# {path}", file=sys.stderr)
    planes = load_planes(path)
    per_plane = aggregate(planes, device_only=not args.all_planes)
    if not per_plane:
        names = [p.name for p in planes]
        raise SystemExit(f"no device planes found; planes = {names}")
    for pname, agg in per_plane.items():
        items = collections.defaultdict(lambda: [0, 0])
        for name, (ps, cnt) in agg.items():
            key = name if args.raw else bucket(name)
            items[key][0] += ps
            items[key][1] += cnt
        total_ps = sum(v[0] for v in items.values())
        print(f"\n== plane: {pname}  total {total_ps / 1e9:.3f} ms")
        rows = sorted(items.items(), key=lambda kv: -kv[1][0])[: args.top]
        for name, (ps, cnt) in rows:
            print(f"  {ps / 1e9:9.3f} ms  {100 * ps / max(total_ps, 1):5.1f}%  "
                  f"x{cnt:<6d} {name}")


if __name__ == "__main__":
    main()
