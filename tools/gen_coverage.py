"""Regenerate COVERAGE.md from SURVEY.md §2 and the query registry.

Parses every `| CODE | operator | ...` row of SURVEY.md's §2 operator
inventory (so the coverage map can never go stale against the survey —
the r11 verdict's item 7: the old generator hard-coded the 66 base
codes and left the 100+ extension codes unmapped), then maps each code
to the registered queries carrying it as a tag. Raises when a survey
code has NO registered query — a renamed query or dropped tag can never
silently open a coverage hole.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ---- parse SURVEY.md §2: (code, short operator description), in order
codes: list[tuple[str, str]] = []
in_s2 = False
seen = set()
with open(os.path.join(ROOT, "SURVEY.md")) as f:
    for line in f:
        if line.startswith("## 2. Operator inventory"):
            in_s2 = True
            continue
        if in_s2 and re.match(r"^## \d", line):
            break
        if not in_s2:
            continue
        m = re.match(r"^\| ([A-Z]+[0-9]+\+?) \| ([^|]+) \|", line)
        if m and m.group(1) not in seen:
            seen.add(m.group(1))
            codes.append((m.group(1), m.group(2).strip()))

# ---- map codes -> queries: explicit tags PLUS the repo-wide naming
# convention (query names are prefixed with their lowercase code:
# `g2_triangle_counts` -> G2, `dq3_...` -> DQ3)
tags: dict[str, list[str]] = {}
for name, spec in catalog.REGISTRY.items():
    carried = set(spec.tags)
    m = re.match(r"^([a-z]+[0-9]+)_", name)
    if m:
        carried.add(m.group(1).upper())
    for t in carried:
        tags.setdefault(t, []).append(name)
for qs in tags.values():
    qs.sort()

# the survey's "L6+" row is tagged "L6" by its queries (the + marks the
# r11 extension of an existing family, not a distinct tag namespace)
ALIAS = {"L6+": "L6"}

# codes with no driver-contract query BY DESIGN, each covered by a
# dedicated pytest instead (documented in their SURVEY rows)
PYTEST_ONLY = {
    "T14": "pytest `tests/test_transform_with_state.py` (env-bounded: "
    "needs protobuf; feature-probed with a fail-fast contract, zero "
    "skips — not in the driver contract by design)",
}

oracles = catalog.all_oracles()
missing = [
    c
    for c, _d in codes
    if not tags.get(ALIAS.get(c, c)) and c not in PYTEST_ONLY
]
if missing:
    raise SystemExit(
        f"SURVEY §2 codes with no registered query tag: {missing}"
    )

out = []
out.append("# COVERAGE — SURVEY.md §2 inventory -> registered queries\n")
out.append("Auto-generated (`python tools/gen_coverage.py`) by parsing the")
out.append("SURVEY.md §2 tables, so every §2 code — base inventory AND the")
out.append("§2.12+ extension rows — maps to >=1 entry in")
out.append("`__spark_entry__.py::queries()`; `oracle` marks DuckDB-checked")
out.append("entries (the driver's hash gate), `rows-only` the SQL-inexpressible")
out.append("ones. Library operators live in")
out.append("`weather_etl_docker_airflow_project_spark/operators|streaming|sources`.\n")
out.append("| code | operator | queries | oracle |")
out.append("|---|---|---|---|")
for code, desc in codes:
    if code in PYTEST_ONLY and not tags.get(code):
        out.append(f"| {code} | {desc} | {PYTEST_ONLY[code]} | — |")
        continue
    qs = tags.get(ALIAS.get(code, code), [])
    qtxt = ", ".join(f"`{q}`" for q in qs)
    otxt = ", ".join("yes" if q in oracles else "rows-only" for q in qs)
    out.append(f"| {code} | {desc} | {qtxt} | {otxt} |")

n = len(catalog.REGISTRY)
no = len(oracles)
rows_only = sorted(set(catalog.REGISTRY) - set(oracles))
out.append(
    f"\n**{len(codes)} survey codes; {n} queries total, {no} oracle-checked,"
    f" {n - no} rows-only.**"
)
out.append("Rows-only (engine-specific sketch/codebook values, the documented")
out.append("weaker check — each error-gated by a dedicated pytest instead):")
out.append(", ".join(f"`{q}`" for q in rows_only) + ".")
path = os.path.join(ROOT, "COVERAGE.md")
open(path, "w").write("\n".join(out) + "\n")
print(
    f"wrote {path}: {len(codes)} codes, {n} queries, {no} oracle-checked, "
    f"rows-only: {rows_only}"
)
