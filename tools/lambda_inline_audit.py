"""Flag plans where a heavy subtree is inlined INSIDE a lambda body.

Project collapsing substitutes a projected expression into every
reference, including references inside higher-order-function lambda
bodies — where it is then re-evaluated PER ARRAY ELEMENT (the
pipe_curation r12 find: the full tokenize chain ran twice per token
pair, O(tokens²) per doc). This audit compiles every registry key's
physical plan (nothing executes) and reports keys whose
``lambdafunction(...)`` bodies contain an expensive call.

Usage: python tools/lambda_inline_audit.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Heavy per-evaluation subtrees: regex engines, hashing, string split.
HEAVY = re.compile(r"regexp_replace\(|split\(|md5\(|sha2\(|unbase64\(")


def lambda_bodies(expr: str):
    """Yield the balanced-paren body of every lambdafunction( in expr."""
    for m in re.finditer(r"lambdafunction\(", expr):
        depth, i = 1, m.end()
        while i < len(expr) and depth:
            if expr[i] == "(":
                depth += 1
            elif expr[i] == ")":
                depth -= 1
            i += 1
        yield expr[m.end(): i - 1]


def audit_plan(plan: str) -> list[str]:
    hits = []
    for body in lambda_bodies(plan):
        # nested lambdas are yielded separately; report the heavy call
        m = HEAVY.search(body)
        if m:
            hits.append(m.group(0).rstrip("("))
    return sorted(set(hits))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from pypers_spark.session import get_session

    spark = get_session("pypers_spark-lambda-audit")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
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
