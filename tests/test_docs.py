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


def test_graded_first_matches_generator():
    """VERDICT r11 item 6: the graded window is GENERATED, not
    hand-maintained — tools/graded_window.py derives it from (a) keys
    with no driver CORRECTNESS row, (b) keys whose function/oracle
    text changed since the round base, (c) the stalest-graded tail.
    This pin makes 'edited a query, forgot the window' a test failure
    instead of a straggler next round (the r10 4-key incident)."""
    import importlib.util
    import subprocess

    import pytest

    try:
        subprocess.run(
            ["git", "rev-parse", "HEAD"],
            cwd=REPO, capture_output=True, check=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("not a git checkout — window generator needs git")

    spec = importlib.util.spec_from_file_location(
        "graded_window", REPO / "tools" / "graded_window.py"
    )
    gw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gw)
    if gw.newest_archive_untracked():
        pytest.skip(
            "post-grade state: the newest CORRECTNESS_r*.json is not "
            "committed yet, so the committed GRADED_FIRST predates it "
            "by construction — regenerate at round open (VERDICT r12 "
            "item 1)"
        )
    want = gw.compute_window()
    assert tuple(GRADED_FIRST) == want, (
        "GRADED_FIRST is stale — regenerate with "
        "`python tools/graded_window.py` and paste the tuple into "
        "ngram_analytics_spark/queries/__init__.py"
    )


def test_graded_window_attribution_follows_aliases(tmp_path):
    """VERDICT r12 item 7: a helper re-exported under another name
    (``from m import foo as bar`` / ``bar = foo``) must attribute a
    change to ``foo`` through to query text that references ``bar``,
    transitively — plain text matching on ``foo`` alone misses it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graded_window", REPO / "tools" / "graded_window.py"
    )
    gw = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gw)

    mod = tmp_path / "reexport.py"
    mod.write_text(
        "from ngram_analytics_spark.operators.dedup import foo as bar\n"
        "baz = bar\n"
        "unrelated = other_name\n"
    )
    got = gw.expand_aliases({"foo"}, [str(mod)])
    assert got == {"foo", "bar", "baz"}  # chained, fixpoint-closed
    # a name with no alias edges passes through untouched
    assert gw.expand_aliases({"nope"}, [str(mod)]) == {"nope"}


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


def test_bench_stdout_is_headline_only():
    """bench.py must print EXACTLY one JSON line (the compact headline).

    The driver tail-captures stdout: a detail dict on any earlier line
    can be sliced into the capture window and misread — BENCH_r04 was
    voided by an inlined extended dict, and BENCH_r07's tail recorded
    57 extended_spread RATIOS as per-query seconds (VERDICT r7 "What's
    wrong" §1).  Detail lives only in bench_detail.json."""
    import ast

    tree = ast.parse((REPO / "bench.py").read_text())
    prints = [
        node
        for node in ast.walk(tree)
        if isinstance(node, ast.Call)
        and isinstance(node.func, ast.Name)
        and node.func.id == "print"
    ]
    assert len(prints) == 1, (
        f"bench.py has {len(prints)} print() calls; the driver's tail "
        "capture requires stdout to be exactly the one headline line"
    )


def test_survey_declared_key_counts_match_registry():
    """Any 'NNN declared keys' phrase in SURVEY.md must equal the live
    registry size (VERDICT r7 "What's wrong" §4: Phase-7 prose said 289
    while the registry held 294 — prose may never drift from code)."""
    survey = (REPO / "SURVEY.md").read_text()
    reg = build_registry()
    stale = [
        m
        for m in re.findall(r"(\d+) declared (?:query )?keys", survey)
        if int(m) != len(reg.queries)
    ]
    assert not stale, (
        f"SURVEY.md claims declared-key counts {stale} but the registry "
        f"holds {len(reg.queries)} — update the prose (or drop the number)"
    )


def test_no_tokenizer_expression_inside_positional_lambdas():
    """Array-building expressions must be HOISTED to their own
    projected column before any positional lambda consumes them:
    ``ngram_col(F.split(...))`` / ``skipgram_col(F.split(...))`` /
    ``element_at(F.split(...), i)`` re-evaluate the split once per
    lambda ELEMENT — O(tokens^2) per document.  Invisible on the
    short shipped corpus, 18-74x on 100x-longer documents at equal
    token mass (tools/longdoc_probe.py, round 9).  Pass a hoisted
    column name instead; the hoisted column is referenced >= 2 times
    by the n-gram operators, so CollapseProject cannot re-inline the
    non-cheap split."""
    pat = re.compile(
        r"(?:ngram_col|skipgram_col)\(\s*F\.split\("
        r"|element_at\(\s*F\.split\("
        r"|\.substr\(\s*i\b"
    )
    offenders = []
    for path in sorted(
        (REPO / "ngram_analytics_spark" / "queries").rglob("*.py")
    ):
        src = path.read_text()
        for m in pat.finditer(src):
            line = src.count("\n", 0, m.start()) + 1
            offenders.append(f"{path.name}:{line}")
    assert not offenders, (
        "tokenizer expression inside a positional lambda — hoist "
        f"the split to its own projection first: {offenders}"
    )


def test_every_power_sum_documents_its_headroom():
    """r11 tick-sum audit (VERDICT r10 item 3 'make that universal'):
    any query whose source sums a PRODUCT of columns (the power-sum
    shape that silently wrapped q_ml_spearman at ~5.5e4 rows and
    q_ml_brier at ~9.2e6 rows) must either accumulate in 128-bit
    (DECIMAL(38,0)/HUGEINT) or carry a greppable headroom note in its
    docstring stating where int64 runs out and what to widen."""
    import importlib
    import inspect

    mods = (
        "corpus_q", "events_q", "graph_q", "llm_q", "pipeline_q",
        "quality_q", "relational", "relational2", "relational3",
        "relational4", "relational5", "relational6", "relational7",
        "sampling_q", "text_q", "timeseries_q", "udf_q", "layout_q",
    )
    # paren-tolerant (ADVICE r11): F.sum(F.col("a") * F.col("b")) has
    # a ')' before the '*', and SQL spellings multiply function calls
    # — allow one level of nested parens on the left operand in both
    # branches so those call sites stay inside the audit.
    power_sum = re.compile(
        r"F\.sum\((?:[^()\n]|\([^()\n]*\))*\*"
        r"|sum\(\s*(?:\w+\([^()\n]*\)|\w+)\s*\*"
    )
    note = re.compile(
        r"headroom|wrap|int64-safe|DECIMAL|HUGEINT|128-bit", re.I
    )
    undocumented = []
    for m in mods:
        mod = importlib.import_module(
            f"ngram_analytics_spark.queries.{m}"
        )
        for name, fn in vars(mod).items():
            if not name.startswith("q_") or not callable(fn):
                continue
            try:
                src = inspect.getsource(fn)
            except (OSError, TypeError):
                continue
            if power_sum.search(src) and not (
                note.search(fn.__doc__ or "") or note.search(src)
            ):
                undocumented.append(f"{m}.{name}")
    assert not undocumented, (
        "power-sum aggregates with neither 128-bit accumulation nor a "
        f"headroom docstring note: {undocumented}"
    )
