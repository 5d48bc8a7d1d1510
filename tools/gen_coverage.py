"""Regenerate COVERAGE.md from the query registry."""
import sys, inspect, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from weather_etl_docker_airflow_project_spark.plans import catalog

DESC = {
 "S1":"REST/JSON source","S2":"JSON decode, nested schema","S3":"JDBC sink (append)",
 "S4":"DDL: database/user bootstrap","S5":"DDL: create table, explicit schema",
 "S6":"Parquet scan","S7":"CSV/JSON scan with schema","S8":"Partitioned parquet sink",
 "S9":"In-memory source","P1":"Nested projection/flatten/rename","P2":"Array-element struct access",
 "P3":"Equality-conjunction filter","P4":"Null/missing guard","P5":"Comparison/IN/LIKE/BETWEEN",
 "P6":"Column-pruned projection","J1":"Inner equi-join","J2":"Outer joins","J3":"Broadcast hash join",
 "J4":"Left-semi join","J5":"Left-anti join (dedup upsert)","J6":"Theta join","J7":"Range join",
 "J8":"As-of join","J9":"Cross join","A1":"COUNT(*) with predicate","A2":"Grouped sum/avg/min/max/count",
 "A3":"Distinct / count-distinct","A4":"Approx count-distinct (HLL)","A5":"Rollup / cube",
 "A6":"Filtered aggregate","A7":"collect_list / collect_set","W1":"Ranking windows","W2":"lag/lead",
 "W3":"Frame-spec moving aggregates","O1":"Global sort","O2":"Limit","O3":"Grouped top-k","O4":"min_by/max_by",
 "U1":"Union","U2":"Intersect","U3":"Except","F1":"Epoch->UTC timestamp","F2":"Fixed-offset local time",
 "F3":"Timestamp format","F4":"String interpolation/concat","F5":"Date/time suite","F6":"String suite",
 "F7":"Math suite","F8":"Conditional suite","F9":"JSON functions","F10":"Array functions",
 "F11":"Map functions","F12":"Hash/id functions","F13":"Casts","T1":"Micro-batch trigger",
 "T2":"Effectively-once dedup sink","T3":"At-least-once retry/checkpoint","T4":"Event-time watermark",
 "T5":"Tumbling/sliding window agg","T6":"Session window","T7":"Stateful dedup with TTL",
 "T8":"Arbitrary stateful op","L1":"Exact dedup (content hash)","L2":"Near-dup (MinHash-LSH/SimHash/Jaccard/cosine)",
 "L3":"Similarity search (brute-force + LSH ANN)","L4":"Text analysis","L5":"Multimodal columns",
}
tags = {}
for name, spec in catalog.REGISTRY.items():
    for t in spec.tags:
        tags.setdefault(t, []).append(name)

out = []
out.append("# COVERAGE — SURVEY.md §2 inventory -> registered queries\n")
out.append("Auto-generated (`python tools/gen_coverage.py`). Every row of the")
out.append("SURVEY.md §2 operator inventory maps to >=1 entry in")
out.append("`__spark_entry__.py::queries()`; `oracle` marks DuckDB-checked")
out.append("entries (the driver's hash gate), `rows-only` the SQL-inexpressible")
out.append("ones. Library operators live in `weather_etl_docker_airflow_project_spark/operators|streaming|sources`.\n")
out.append("| code | operator | queries | oracle |")
out.append("|---|---|---|---|")
order = ([f"S{i}" for i in range(1,10)]+[f"P{i}" for i in range(1,7)]+[f"J{i}" for i in range(1,10)]+
         [f"A{i}" for i in range(1,8)]+[f"W{i}" for i in range(1,4)]+[f"O{i}" for i in range(1,5)]+
         [f"U{i}" for i in range(1,4)]+[f"F{i}" for i in range(1,14)]+[f"T{i}" for i in range(1,9)]+
         [f"L{i}" for i in range(1,6)])
oracles = catalog.all_oracles()
for code in order:
    qs = tags.get(code, [])
    qtxt = ", ".join(f"`{q}`" for q in qs) or "—"
    otxt = ", ".join("yes" if q in oracles else "rows-only" for q in qs) or "—"
    out.append(f"| {code} | {DESC[code]} | {qtxt} | {otxt} |")
n = len(catalog.REGISTRY); no = len(oracles)
out.append(f"\n**{n} queries total, {no} oracle-checked, {n-no} rows-only**")
out.append("(rows-only: `a4_approx_count_distinct` — HLL sketch values are")
out.append("engine-specific by design; `t2_weather_stream_upsert` — sink/")
out.append("checkpoint temp dirs invisible to the oracle, determinism asserted")
out.append("by tests/test_weather_fidelity.py).")
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
open(path, "w").write("\n".join(out) + "\n")
print(f"wrote {path}: {n} queries, {no} oracle-checked")
