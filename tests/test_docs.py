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


def test_no_double_division_truncate_cast():
    """Source-convention lint (VERDICT r6 "Next round" item 3): the
    repo's truncate-vs-round discipline requires integer division to
    be spelled as SQL integer `div` or explicit ``floor()`` — never as
    a double division followed by ``.cast("long"/"int")``, which
    truncates the correctly-rounded double quotient and silently
    diverges from an oracle's integer `//` whenever the quotient is
    inexact in binary.  The r6 bloom word-index slip
    (pipeline_q.py, `(pos / 32).cast("long")`) motivated this lint."""
    pat = re.compile(r"/\s*[^)]*\)\s*\.cast\(\"(?:long|int)\"\)")
    offenders = []
    for path in sorted(
        (REPO / "ngram_analytics_spark").rglob("*.py")
    ):
        for i, line in enumerate(
            path.read_text().splitlines(), start=1
        ):
            if "floor" in line:
                continue
            if pat.search(line):
                offenders.append(f"{path.name}:{i}: {line.strip()}")
    assert not offenders, (
        "double-division-then-truncate-cast sites (spell integer "
        f"`div` or explicit floor()): {offenders}"
    )
