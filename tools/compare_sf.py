"""Scaling-ratio report: per-query sf1/sf0.1 wall-time ratios.

Reads BENCH_SF1.json (a bench.py BENCH_DETAIL snapshot taken at
.scratch/sf1) and the committed sf0.1 BENCH_DETAIL.json, normalizes both
by their calibration probe (pure-codegen fixed work — cancels host-speed
drift between the two runs), and prints queries sorted by normalized
ratio. For a 10x data multiply, a ratio ≲ 10 is linear-or-better
(constant-dominated queries sit near 1); ratios well above 10 are the
superlinear tails SCALE.md must explain or fix.

Usage: python tools/compare_sf.py [sf1_json] [sf01_json]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf1_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "BENCH_SF1.json")
    sf01_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(ROOT, "BENCH_DETAIL.json")
    d1 = json.load(open(sf1_path))
    d0 = json.load(open(sf01_path))
    q1, q0 = d1["queries"], d0["queries"]
    c1, c0 = q1["calibration"], q0["calibration"]
    skip = {"startup_and_warmup", "calibration"}
    rows = []
    for name, t1 in q1.items():
        if name in skip or name.startswith("upsert_"):
            continue
        t0 = q0.get(name)
        if t0 is None or t0 == 0:
            continue
        rows.append((name, t0, t1, (t1 / c1) / (t0 / c0)))
    rows.sort(key=lambda r: -r[3])
    print(f"calibration sf0.1={c0:.3f}s sf1={c1:.3f}s (ratios normalized)")
    print(f"{'query':42s} {'sf0.1':>7s} {'sf1':>8s} {'ratio':>7s}")
    for name, t0, t1, ratio in rows:
        flag = "  <-- superlinear" if ratio > 15 else ""
        print(f"{name:42s} {t0:7.2f} {t1:8.2f} {ratio:7.1f}{flag}")
    med = sorted(r[3] for r in rows)[len(rows) // 2]
    print(f"\n{len(rows)} queries; median normalized ratio {med:.1f} "
          f"(10x data); errors at sf1: {list(d1.get('errors', {}))}")


if __name__ == "__main__":
    main()
