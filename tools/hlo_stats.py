#!/usr/bin/env python
"""Convert an xplane.pb capture to hlo_stats and print top self-time ops and
a category rollup (gviz-JSON output of xprof's hlo_stats tool).

Usage: python tools/hlo_stats.py <xplane.pb> [topn] [steps_in_trace]
"""
import json
import sys
from collections import defaultdict

from xprof.convert import raw_to_tool_data as rtd


def load_rows(xplane):
    data, _ = rtd.xspace_to_tool_data([xplane], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]
    rows = []
    for r in tbl["rows"]:
        rows.append({k: (c or {}).get("v") for k, c in zip(cols, r["c"])})
    return rows


def main():
    xplane = sys.argv[1]
    topn = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    steps = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    rows = load_rows(xplane)
    if not rows:
        print("no rows")
        return
    tkey = "total_self_time" if "total_self_time" in rows[0] else None
    if tkey is None:
        tkey = next((k for k in rows[0] if "self" in k), None)
    if tkey is None:
        print("columns:", list(rows[0].keys()))
        return
    cats = defaultdict(float)
    total = 0.0
    for r in rows:
        t = float(r.get(tkey) or 0)
        cats[r.get("category", "?")] += t
        total += t
    print(f"TOTAL self time: {total/1000:.1f} ms ({steps:g} steps) -> {total/steps/1000:.2f} ms/step")
    print("\n== categories (ms/step) ==")
    for c, t in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {t/steps/1000:8.2f}  {c}")
    print(f"\n== top {topn} ops (ms/step) ==")
    rows.sort(key=lambda r: -float(r.get(tkey) or 0))
    for r in rows[:topn]:
        expr = str(r.get("hlo_op_expression", ""))[:150]
        print(f"  {float(r.get(tkey) or 0)/steps/1000:8.3f}  "
              f"{str(r.get('category','?')):26s} {str(r.get('hlo_op_name',''))[:44]:44s} {expr}")


if __name__ == "__main__":
    main()
