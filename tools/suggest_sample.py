"""Driver-sample steering: list registry keys the per-round driver has
never sampled, prioritized, so future 50-key driver rounds close the
sampling gap instead of re-drawing already-driver-verified keys.

Reads every committed CORRECTNESS_r*.json (the driver's 50-key samples)
at the repo root, diffs against the live registry, and prints one JSON
line plus a readable listing to stderr. Priority order:

1. keys never sampled by any driver round AND added most recently
   (registry order is insertion order — later modules last), newest
   first: new operators have the least cross-round evidence;
2. remaining never-sampled keys.

Every key — sampled or not — is also covered by the committed
CORRECTNESS_FULL artifacts (driver-identical comparator, all keys);
this tool only steers the independent driver-side re-verification.

Usage: python tools/suggest_sample.py  [writes nothing; prints]
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def driver_sampled_keys() -> dict[str, list[str]]:
    """key -> rounds in which a driver CORRECTNESS file sampled it."""
    seen: dict[str, list[str]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        tag = os.path.basename(path).removesuffix(".json").removeprefix("CORRECTNESS_")
        with open(path) as fh:
            data = json.load(fh)
        for key in data:
            seen.setdefault(key, []).append(tag)
    return seen


def main() -> None:
    import __spark_entry__ as e

    registry = list(e.queries())  # insertion order == registration order
    sampled = driver_sampled_keys()
    never = [k for k in registry if k not in sampled]
    # Newest registrations first: the tail of the registry is the most
    # recent round's operators, which have zero cross-round evidence.
    prioritized = list(reversed(never))
    print(
        f"{len(registry)} registered, {len(sampled)} ever driver-sampled, "
        f"{len(never)} never sampled:",
        file=sys.stderr,
    )
    for k in prioritized:
        print(f"  {k}", file=sys.stderr)
    print(
        json.dumps(
            {
                "n_registered": len(registry),
                "n_driver_sampled": len(sampled),
                "n_never_sampled": len(never),
                "suggest_first": prioritized,
            }
        )
    )


if __name__ == "__main__":
    main()
