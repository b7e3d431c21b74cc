"""Flag queries whose final global sort samples an EXPENSIVE chain.

A global ``orderBy`` plans as Exchange(rangepartitioning); computing
its bounds runs a sampling pass that re-executes the exchange's child
plan end to end (see functions/barrier.py). This audit walks every
registry key's physical plan (plan compile only — nothing executes)
and flags keys where, between the rangepartitioning exchange and the
next materialization boundary (another Exchange, an InMemoryTableScan,
or the scan itself), an expensive operator appears: Join, Window,
Generate, MapInPandas / ArrowEval, or a python eval node. Those keys
pay that operator twice per run.

Usage: python tools/sort_sampler_audit.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BOUNDARY = re.compile(
    r"Exchange |InMemoryTableScan|Scan parquet|ReusedExchange|TableCacheQueryStage"
)
EXPENSIVE = re.compile(
    r"Join |Window |Generate |MapInPandas|ArrowEval|BatchEvalPython|MapInArrow"
)


def audit_plan(plan: str) -> list[str]:
    """Expensive operator names between the FIRST rangepartitioning
    exchange and the next materialization boundary, in pre-order text
    order. An inner rangepartitioning exchange IS a boundary (it
    materializes the chain for the outer sort's sampler), so once the
    scan has started another range exchange ends it rather than
    re-arming it (ADVICE r11: nested-sort plans were misreported)."""
    lines = plan.splitlines()
    out: list[str] = []
    started = False
    for ln in lines:
        if "rangepartitioning" in ln and "Exchange" in ln:
            if started:
                break
            started = True
            continue
        if not started:
            continue
        if BOUNDARY.search(ln):
            break
        m = EXPENSIVE.search(ln)
        if m:
            out.append(m.group(0).strip())
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-sort-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    qs = e.queries()
    n_flag = 0
    for k in sorted(qs):
        if only and k not in only:
            continue
        try:
            df = qs[k](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as ex:  # noqa: BLE001
            print(f"{k}: ERROR {ex}")
            continue
        hits = audit_plan(plan)
        if hits:
            n_flag += 1
            print(f"{k}: {hits}")
    print(f"# flagged {n_flag}")


if __name__ == "__main__":
    main()
