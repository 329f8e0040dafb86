"""Generate the differential driver's graded-first window mechanically.

VERDICT r11 item 6: ``GRADED_FIRST`` in ``queries/__init__.py`` was
hand-maintained each round, and the human step caused the r10 4-key
straggle (keys landing after the snapshot missed the window).  This
tool derives the window from evidence instead:

1. **Ungraded keys** — registered keys with no row in ANY
   ``CORRECTNESS_r*.json`` (new this round): highest correctness risk.
2. **Directly changed keys** — keys whose implementing function
   (decorator + oracle + body) intersects ``git diff`` hunks since
   the ROUND BASE (the commit that added the newest
   ``CORRECTNESS_r*.json``): their differential CONTRACT changed, so
   they must re-grade this round.
3. **Stalest tail** — everything else, oldest driver grade first,
   filling the window to ``WINDOW`` keys.

Keys that reference a changed top-level helper/operator/constant
(one-hop INDIRECT changes) are printed as a comment for visibility
but do NOT displace the stale tail: their own contract text is
unchanged, pytest covers the shared code path, and they re-grade via
the normal oldest-first rotation — otherwise one touched helper
(e.g. the streaming stage-dir cleanup) would evict the entire
re-certification cohort from the window.

Usage:
    python tools/graded_window.py          # print the tuple source
    python tools/graded_window.py --check  # exit 1 if GRADED_FIRST stale

``tests/test_docs.py::test_graded_first_matches_generator`` pins the
committed tuple to this computation, so editing a query without
regenerating the window fails the suite — the bounded-staleness
rotation (VERDICT r11 item 1) no longer depends on anyone remembering.

Limitations (documented, deliberate): attribution is ONE hop — a
change to a helper's helper is only caught if the outer helper's text
also changed; non-assignment module-level edits (imports, comments)
attribute to nothing. Aliased re-exports (``from m import foo as
bar``, ``bar = foo``) ARE followed to a fixpoint (r13,
:func:`expand_aliases`).
"""

from __future__ import annotations

import ast
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "ngram_analytics_spark")
WINDOW = 50


def latest_grades() -> dict[str, int]:
    """key -> newest round with a driver CORRECTNESS row for it."""
    latest: dict[str, int] = {}
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            for k in json.load(fh):
                latest[k] = max(latest.get(k, 0), rnd)
    return latest


def _archive_rounds_desc() -> list[int]:
    rounds = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", f)
        if m:
            rounds.add(int(m.group(1)))
    return sorted(rounds, reverse=True)


def newest_archive_untracked() -> bool:
    """True in the POST-GRADE state: the newest CORRECTNESS_r*.json
    exists on disk but is not in HEAD (the driver wrote it after the
    round's last commit). The committed GRADED_FIRST tuple predates
    that file by construction, so the doc lint skips instead of
    flagging the inherent mismatch (VERDICT r12 item 1)."""
    rounds = _archive_rounds_desc()
    if not rounds:
        return False
    newest = f"CORRECTNESS_r{rounds[0]:02d}.json"
    try:
        out = subprocess.run(
            ["git", "ls-files", "--error-unmatch", newest],
            cwd=REPO, capture_output=True, text=True,
        )
        return out.returncode != 0
    except FileNotFoundError:
        return False


def round_base_commit() -> str | None:
    """The commit that ADDED the newest COMMITTED CORRECTNESS file =
    the round boundary; diffs against it are 'changed this round'.
    A never-committed newest archive (the post-grade state) falls
    back to the next-newest committed one with a warning instead of
    silently disabling changed-key detection (ADVICE r12)."""
    for rnd in _archive_rounds_desc():
        name = f"CORRECTNESS_r{rnd:02d}.json"
        try:
            out = subprocess.run(
                ["git", "log", "--diff-filter=A", "--format=%H", "--",
                 name],
                cwd=REPO, capture_output=True, text=True, check=True,
            ).stdout.split()
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
        if out:
            return out[-1]
        print(
            f"warning: {name} is not committed — falling back to the"
            " next-newest committed archive as the round base",
            file=sys.stderr,
        )
    return None


def _diff_new_ranges(base: str, path: str) -> list[tuple[int, int]]:
    """New-side (worktree) line ranges touched since ``base``."""
    try:
        out = subprocess.run(
            ["git", "diff", "-U0", base, "--", path],
            cwd=REPO, capture_output=True, text=True, check=True,
        ).stdout
    except (subprocess.CalledProcessError, FileNotFoundError):
        return []
    ranges = []
    for m in re.finditer(r"^@@ -\S+ \+(\d+)(?:,(\d+))? @@", out, re.M):
        start = int(m.group(1))
        n = int(m.group(2)) if m.group(2) is not None else 1
        # pure deletion (n == 0): attribute to the anchor line
        ranges.append((start, start + max(n, 1) - 1))
    return ranges


def _top_level_spans(path: str):
    """(name, key, lo, hi) for top-level defs/assigns in ``path``;
    ``key`` is the REG.register first-arg for query functions (the
    registry key can differ from the def name), else None."""
    with open(path) as fh:
        tree = ast.parse(fh.read())
    spans = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            lo = min(
                [node.lineno] + [d.lineno for d in node.decorator_list]
            )
            key = None
            for d in node.decorator_list:
                if (
                    isinstance(d, ast.Call)
                    and d.args
                    and isinstance(d.args[0], ast.Constant)
                    and isinstance(d.args[0].value, str)
                ):
                    key = d.args[0].value
            spans.append((node.name, key, lo, node.end_lineno))
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = (
                node.targets
                if isinstance(node, ast.Assign)
                else [node.target]
            )
            for t in targets:
                if isinstance(t, ast.Name):
                    spans.append(
                        (t.id, None, node.lineno, node.end_lineno)
                    )
        elif isinstance(node, ast.ClassDef):
            spans.append(
                (node.name, None, node.lineno, node.end_lineno)
            )
    return spans


def expand_aliases(touched: set[str], files) -> set[str]:
    """Close a changed-name set over import/assign ALIASES (VERDICT
    r12 item 7): a helper imported as ``from m import foo as bar`` or
    re-bound as ``bar = foo`` is referenced in query text by the NAME
    ``bar``, which plain text matching on ``foo`` misses. Iterates to
    a fixpoint so chained re-exports (foo -> bar -> baz) attribute
    too. Plain same-name re-exports (``from m import foo``) need no
    expansion — the text match already finds ``foo``."""
    edges: dict[str, set[str]] = {}  # source name -> alias names
    for path in files:
        try:
            with open(path) as fh:
                tree = ast.parse(fh.read())
        except (OSError, SyntaxError):
            continue
        for node in tree.body:
            if isinstance(node, ast.ImportFrom):
                for a in node.names:
                    if a.asname and a.asname != a.name:
                        edges.setdefault(a.name, set()).add(a.asname)
            elif isinstance(node, ast.Assign):
                if isinstance(node.value, ast.Name):
                    for t in node.targets:
                        if isinstance(t, ast.Name) and t.id != node.value.id:
                            edges.setdefault(node.value.id, set()).add(t.id)
    out = set(touched)
    frontier = set(touched)
    while frontier:
        nxt = set()
        for name in frontier:
            nxt |= edges.get(name, set()) - out
        out |= nxt
        frontier = nxt
    return out


def changed_keys(
    registry_keys, base: str | None = None
) -> tuple[set[str], set[str]]:
    """(direct, indirect): keys whose own function text changed since
    ``base`` vs keys only referencing a changed top-level name (or an
    alias of one — see :func:`expand_aliases`)."""
    base = base or round_base_commit()
    if base is None:
        return set(), set()
    query_files = sorted(
        glob.glob(os.path.join(PKG, "queries", "*.py"))
    )
    pkg_files = sorted(
        p for p in glob.glob(os.path.join(PKG, "**", "*.py"),
                             recursive=True)
    )
    keys = set(registry_keys)
    direct: set[str] = set()
    indirect: set[str] = set()
    touched_names: set[str] = set()  # changed top-level helper names

    for path in pkg_files:
        ranges = _diff_new_ranges(base, path)
        if not ranges:
            continue
        spans = _top_level_spans(path)
        in_queries = os.path.dirname(path) == os.path.join(
            PKG, "queries"
        )
        for name, key, lo, hi in spans:
            if not any(a <= hi and lo <= b for a, b in ranges):
                continue
            reg_key = key if key in keys else (
                name if name in keys else None
            )
            if in_queries and reg_key:
                direct.add(reg_key)
            else:
                touched_names.add(name)

    if touched_names:
        touched_names = expand_aliases(touched_names, pkg_files)
        # one-hop attribution: query functions referencing a changed
        # top-level name (helper/operator/constant) changed too
        ident = re.compile(
            r"\b(" + "|".join(map(re.escape, sorted(touched_names)))
            + r")\b"
        )
        for path in query_files:
            src = open(path).read()
            if not ident.search(src):
                continue
            for name, key, lo, hi in _top_level_spans(path):
                reg_key = key if key in keys else (
                    name if name in keys else None
                )
                if reg_key is None:
                    continue
                seg = "\n".join(
                    src.split("\n")[lo - 1:hi]
                )
                if ident.search(seg) and reg_key not in direct:
                    indirect.add(reg_key)
    return direct, indirect


def compute_window(
    window: int = WINDOW, with_indirect: bool = False
):
    sys.path.insert(0, REPO)
    from ngram_analytics_spark.queries import build_registry

    reg_keys = list(build_registry().queries)
    grades = latest_grades()
    ungraded = [k for k in reg_keys if k not in grades]
    direct, indirect = changed_keys(reg_keys)
    changed_ordered = [
        k for k in reg_keys if k in direct and k in grades
    ]
    head = ungraded + changed_ordered
    tail = sorted(
        (k for k in reg_keys if k not in head and k in grades),
        key=lambda k: (grades[k], k),
    )
    win = tuple((head + tail)[:window])
    if with_indirect:
        return win, sorted(indirect)
    return win


def main() -> int:
    win, indirect = compute_window(with_indirect=True)
    lines = ["GRADED_FIRST: tuple[str, ...] = ("]
    lines += [f'    "{k}",' for k in win]
    lines.append(")")
    if indirect:
        lines.append(
            "# indirect (one-hop helper) changes, re-graded via"
            " rotation:"
        )
        lines.append(f"#   {', '.join(indirect)}")
    src = "\n".join(lines)
    if "--check" in sys.argv:
        from ngram_analytics_spark.queries import GRADED_FIRST

        if tuple(GRADED_FIRST) != win:
            print("STALE — regenerate with: python tools/graded_window.py")
            print(src)
            return 1
        print(f"GRADED_FIRST is current ({len(win)} keys)")
        return 0
    print(src)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
