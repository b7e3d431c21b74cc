"""SURVEY.md §2/§8 is the coverage contract — keep its query count true.

The round-3 verdict flagged doc drift (SURVEY said 123 while the
registry had 126); this pins the canonical count line in §8 to
``len(REGISTRY)`` so drift fails CI instead of accumulating.
"""

from __future__ import annotations

import pathlib
import re


def test_survey_query_count_matches_registry():
    from pypers_spark.operators import ORACLES, REGISTRY

    survey = (pathlib.Path(__file__).parent.parent / "SURVEY.md").read_text()
    m = re.search(r"Registered queries: (\d+)", survey)
    assert m, "SURVEY.md §8 must carry the 'Registered queries: N' line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"SURVEY.md says {m.group(1)} queries, registry has {len(REGISTRY)} — "
        "update SURVEY.md §2/§7/§8"
    )
    # every registered query is oracled (or deliberately rows-only)
    assert set(ORACLES) <= set(REGISTRY)


def test_every_registry_key_appears_in_survey():
    from pypers_spark.operators import REGISTRY

    survey = (pathlib.Path(__file__).parent.parent / "SURVEY.md").read_text()
    missing = [k for k in REGISTRY if k not in survey]
    assert not missing, f"registry keys absent from SURVEY.md §2: {missing}"
