"""Dump .explain("formatted") output for registry keys to plans/<tag>/.

Usage: python tools/plan_dump.py <tag> <suffix> <key> [key ...]
Writes plans/<tag>/<key>_<suffix>.txt for each key (suffix is
"before"/"after" per the optimization-round evidence contract).

SF dir comes from $SPARK_GRAFT_SF_DIR (default sf0.1 — plan SHAPE is
scale-independent for these queries; the suffixed files are evidence of
plan structure, not timings).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag, suffix, keys = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")
    for k in keys:
        df = qs[k](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{k}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
