"""Summarize a JAX xplane.pb trace: top device ops by total self time.

Usage: python _xplane_summary.py <logdir> [n]
"""
import glob
import json
import sys

from xprof.convert import raw_to_tool_data as rtd


def main():
    logdir = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    xs = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data([xs[-1]], "framework_op_stats", {})
    tables = json.loads(data)
    t = tables[0]
    cols = [c["id"] for c in t["cols"]]
    rows = [dict(zip(cols, [c["v"] for c in r["c"]])) for r in t["rows"]]
    dev = [r for r in rows if r["host_or_device"] == "Device"]
    total = sum(r["total_self_time"] for r in dev)
    dev.sort(key=lambda r: -r["total_self_time"])
    print(f"{'self_us':>10} {'%':>6} {'cum%':>6} {'occ':>5}  operation")
    cum = 0.0
    for r in dev[:n]:
        cum += r["total_self_time"]
        name = r["operation"][:110]
        print(f"{r['total_self_time']:10.0f} {100*r['total_self_time']/total:6.2f} "
              f"{100*cum/total:6.2f} {int(r['occurrences']):5d}  {name}")
    print(f"device total self time: {total/1e3:.2f} ms")


if __name__ == "__main__":
    main()
