"""Similarity-decade scaling table: per-query wall times across
sf0.1 / sf1 / sf3 / sf10 (1x / 10x / 30x / 100x documents+embeddings),
calibration-normalized, rendered as the SCALE.md markdown table.

Reads the four ``.scratch/BENCH_SIM_<label>_sf*.json`` files produced by
the ``SPARK_GRAFT_ONLY=l1_,l2_,l3_`` bench subset runs (label defaults to
``r9``, the committed similarity-decade measurement — pass ``--label rN``
to render a re-measure without editing this file). Ratios are
(t_sfX / cal_sfX) / (t_sf0.1 / cal_sf0.1) — the calibration probe is
fixed pure-codegen work, cancelling host-speed drift between runs.
A query is flagged when its 100x ratio exceeds 100 (superlinear past
the data multiply itself).

Usage: python tools/sim_decades.py [--markdown] [--label r9]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = [("sf0.1", 1), ("sf1", 10), ("sf3", 30), ("sf10", 100)]


def main() -> None:
    label = "r9"
    if "--label" in sys.argv:
        label = sys.argv[sys.argv.index("--label") + 1]
    runs = {}
    for name, _ in SCALES:
        path = os.path.join(ROOT, ".scratch", f"BENCH_SIM_{label}_{name}.json")
        runs[name] = json.load(open(path))
    base = runs["sf0.1"]
    names = list(base["queries"])
    md = "--markdown" in sys.argv
    cal = {s: runs[s]["calibration"] for s, _ in SCALES}
    if md:
        print("| query | sf0.1 s | sf1 s (×) | sf3 s (×) | sf10 s (×) |")
        print("|---|---|---|---|---|")
    else:
        print(f"{'query':34s}" + "".join(f"{s:>14s}" for s, _ in SCALES))
        print("calibrations:", {s: round(c, 3) for s, c in cal.items()})
    flagged = []
    for q in names:
        t0 = base["queries"][q]
        cells = [f"{t0:.2f}"]
        for s, mult in SCALES[1:]:
            t = runs[s]["queries"].get(q)
            if t is None:
                err = (runs[s].get("errors") or {}).get(q, "absent")
                cells.append(f"ERR({err[:18]})")
                flagged.append((q, s, "error"))
                continue
            ratio = (t / cal[s]) / (t0 / cal["sf0.1"])
            cells.append(f"{t:.2f} ({ratio:.1f}x)")
            if s == "sf10" and ratio > 100:
                flagged.append((q, s, f"{ratio:.0f}x"))
        if md:
            print(f"| `{q}` | " + " | ".join(cells) + " |")
        else:
            print(f"{q:34s}" + "".join(f"{c:>14s}" for c in cells))
    print()
    print(
        f"calibrations: "
        + ", ".join(f"{s} {cal[s]:.3f}s" for s, _ in SCALES)
    )
    if flagged:
        print("FLAGGED (sf10 normalized ratio > 100x, or error):")
        for q, s, r in flagged:
            print(f"  {q} @ {s}: {r}")
    else:
        print("no query exceeds the 100x-at-100x envelope; no errors")


if __name__ == "__main__":
    main()
