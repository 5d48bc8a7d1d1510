"""Physical-plan audit: dump a per-query plan-shape summary to PLANS.md.

For every registered query whose builder is pure-lazy (no side-effecting
scratch writes / stream drains at build time), build the DataFrame at
sf0.001 and summarize the FORMATTED physical plan: number of Exchanges,
join strategies, whole-stage-codegen spans, Python eval nodes, and top-k
vs global-sort. This is the at-a-glance evidence that each operator
compiles to the plan you'd want at 100 TB — regenerate with
``python tools/plan_audit.py`` after plan-affecting changes.

Queries that EXECUTE during construction (sink round-trips, incremental
maintenance replays, availableNow streams, persisted-index builds) are
listed but not plan-audited here — their plan properties are asserted in
tests/test_plan_shapes.py and their executed shapes described in
SCALE.md.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weather_etl_docker_airflow_project_spark.plans import catalog  # noqa: E402
from weather_etl_docker_airflow_project_spark.session import build_session  # noqa: E402

SF = "/root/testdata/sf0.001"

# builders with side effects at construction time (writes, stream drains,
# driver-side replays) — everything else must stay pure-lazy, and this
# audit doubles as the regression gate for that property
EAGER_PREFIXES = (
    "t2_", "t5_", "t6_", "t7_", "t8_", "t9_", "t10_", "t11_", "t12_",
    "t13_", "t15_", "t16_", "t17_", "t18_",
    "s5_", "s7_", "s8_", "s10_", "s11_", "s12_", "s13_", "s14_", "s16_",
    "s17_", "s18_", "s19_",
    "a16_", "a17_", "a21_", "dq4_",
    "l3_ann_persisted", "l4_inverted_probe",
    "l3_pq_search", "l3_mmr",  # driver-fit / checkpointed pools
    "l3_ivf_",  # ivf_cells collects the seed matrix at build (capped)
    "l4_bpe_train",  # iterative driver-argmax rounds
    "g1_",  # adjacency localCheckpoint
    "cdc1_",  # snapshot writes
    "l6_deterministic_shuffle",
)


def _is_eager(name: str) -> bool:
    return name.startswith(EAGER_PREFIXES)

JOIN_KINDS = [
    "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
    "BroadcastNestedLoopJoin", "CartesianProduct",
]


def summarize(plan: str) -> dict[str, object]:
    joins = []
    for k in JOIN_KINDS:
        n = len(re.findall(rf"\b{k}\b", plan))
        if n:
            joins.append(f"{k.replace('Join', '')}×{n}" if n > 1 else k.replace("Join", ""))
    return {
        "exchanges": len(
            re.findall(r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)", plan)
        ),
        "joins": " ".join(joins) or "—",
        "codegen": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "topk": "✓" if "TakeOrderedAndProject" in plan else "",
        "python": len(re.findall(r"MapInPandas|ArrowEvalPython|MapInArrow|FlatMapGroupsInPandas|PythonUDTF|BatchEvalPython|PythonMapInArrow", plan)),
    }


def main() -> None:
    # AQE off for the audit only: AdaptiveSparkPlan hides the codegen-span
    # markers until execution; the static initial plan is what we audit
    spark = build_session(
        app_name="plan-audit",
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    rows, eager = [], []
    for name, spec in catalog.REGISTRY.items():
        if _is_eager(name):
            eager.append(name)
            continue
        try:
            df = spec.fn(spark, SF)
            buf = io.StringIO()
            with redirect_stdout(buf):
                # simple mode: shows `Exchange hashpartitioning(...)` args
                # and `*(n)` whole-stage-codegen span ids
                df.explain()
            s = summarize(buf.getvalue())
            rows.append((name, s))
        except Exception as e:  # noqa: BLE001 - audit must list, not die
            msg = str(e)[:60].replace("|", "/").replace("\n", " ")
            rows.append((name, {"exchanges": "ERR", "joins": msg,
                                "codegen": "", "topk": "", "python": ""}))
    out = [
        "# PLANS — physical-plan shape per query (sf0.001, auto-generated)",
        "",
        "Regenerate: `python tools/plan_audit.py`. Columns: shuffles =",
        "Exchange operators in the plan; joins = join strategies chosen;",
        "wsc = distinct WholeStageCodegen spans; topk =",
        "TakeOrderedAndProject (no global sort); py = Arrow/pandas Python",
        "eval nodes (the deliberate slow-path stages).",
        "",
        "| query | shuffles | joins | wsc | topk | py |",
        "|---|---|---|---|---|---|",
    ]
    for name, s in sorted(rows):
        out.append(
            f"| `{name}` | {s['exchanges']} | {s['joins']} | {s['codegen']} "
            f"| {s['topk']} | {s['python']} |"
        )
    out += [
        "",
        "**On the BroadcastNestedLoop rows:** every BNL above broadcasts a",
        "BOUNDED tiny side by construction — a scalar/seed subquery",
        "(l3_ivf/knn/bm25 corpus stats, weighted-sample total), a bucket or",
        "day spine (j7 ranges, ts9's ≤ number-of-days spine), or the",
        "deliberate J9 cross-join grid on deduped dims. None sits on a",
        "fact×fact pair; the plan-shape tests assert the big-side joins",
        "never degrade to BNL.",
        "",
        f"**Eager builders (not plan-audited here; {len(eager)}):** executed",
        "shapes covered by tests/test_plan_shapes.py + SCALE.md —",
        ", ".join(f"`{n}`" for n in sorted(eager)),
        "",
    ]
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    n_err = sum(1 for _, x in rows if x["exchanges"] == "ERR")
    print(
        f"wrote PLANS.md: {len(rows) - n_err} audited, {n_err} ERRORED, "
        f"{len(eager)} eager-skipped"
    )


if __name__ == "__main__":
    main()
