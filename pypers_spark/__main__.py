"""``python -m pypers_spark <path> [--run ...]`` — CLI entry point.

``python -m pypers_spark --submit-smoke`` instead runs the
multi-executor packaging smoke (pypers_spark/submit.py): zip the
package, start local-cluster executors, prove the Arrow-UDF path works
across real process boundaries.
"""

import sys

if __name__ == "__main__":
    if "--submit-smoke" in sys.argv[1:]:
        from pypers_spark.submit import submit_smoke

        ok = submit_smoke()
        print("submit-smoke:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)
    if "--executor-loss-smoke" in sys.argv[1:]:
        from pypers_spark.submit import executor_loss_smoke

        ok = executor_loss_smoke()
        print("executor-loss-smoke:", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)
    from pypers_spark.cli import run_cli

    sys.exit(0 if run_cli() else 1)
