"""``python -m pypers_spark <path> [--run ...]`` — CLI entry point."""

import sys

from pypers_spark.cli import run_cli

if __name__ == "__main__":
    sys.exit(0 if run_cli() else 1)
