"""Long-document robustness probe (VERDICT r8 "Next round" item 7).

The shipped corpus' documents are short (~100-300 tokens), which hides
token-quadratic shapes: q_text_cooc's r8 band-residual self-join was
correct and fast on it, and quadratic on a real pretraining corpus.
This probe makes such shapes measurable: two synthetic corpora with
IDENTICAL total token mass but 100x different document length —

  short: 1000 docs x 100 tokens   (the shipped shape)
  long :   10 docs x 10000 tokens (one 100x-longer-doc shard)

and times every documents-only text/dedup query on both. For an
operator linear in document length the long/short ratio stays near 1
(bounded above by ~3.2x task-skew: 10 docs < 32 cores); a quadratic
shape pays 100x more per-doc work and reads >> 5.

Text is deterministic (positional arithmetic, no RNG): a 211-word
vocabulary cycled with a per-doc stride, plus a shared boilerplate
sentence every 17 positions so dedup/boilerplate operators have
structure to find.

Usage: python tools/longdoc_probe.py [query ...]
Writes nothing to the repo; prints a markdown table for BASELINE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

#: documents-only queries whose per-doc work depends on token count
PROBE_QUERIES = [
    "q_text_cooc",
    "q_ngram_bigram",
    "q_ngram_topk",
    "q_text_collocation",
    "q_ngram_skipgram",
    "q_ngram_chars",
    "q_text_repetition",
    "q_text_chunk",
    "q_doc_lm_score",
    "q_bpe_pair_counts",
    "q_bpe_apply",
    "q_text_fingerprint_exact",
    "q_dedup_jaccard",
    "q_dedup_minhash_exact",
    "q_dedup_simhash_exact",
    "q_dedup_containment",
    "q_dedup_paragraph",
    "q_text_tfidf_exact",
    "q_text_keywords",
    "q_text_entropy",
    "q_text_quality",
    "q_text_langid",
    "q_boilerplate",
    "q_text_bm25",
    "q_ngram_kneser_ney",
    "q_text_cloze",
    "q_text_tokens",
    # --- r10 additions (token-length-dependent kernels) ---
    "q_dedup_substring",
    "q_bpe_encode",
    "q_text_readability",
    "q_text_diversity",
    # --- late-r10 additions ---
    "q_text_mixed_script",
    "q_dedup_cross_source",
    "q_text_burstiness",
]

TOTAL_TOKENS = 100_000
VOCAB = 211  # prime: per-doc stride cycles the whole vocabulary


def make_corpus(path: str, n_docs: int, doc_len: int) -> None:
    import duckdb

    rows = []
    for d in range(n_docs):
        stride = (d % (VOCAB - 1)) + 1
        toks = []
        for i in range(doc_len):
            if i % 17 == 5:
                toks.append("shared boilerplate sentinel")
            else:
                toks.append(f"w{(i * stride + d) % VOCAB}")
        text = " ".join(toks)
        rows.append((d, text, "en", f"src{d % 7}", len(text)))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
        " lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?, ?, ?)", rows
    )
    os.makedirs(path, exist_ok=True)
    con.execute(
        "COPY documents TO '"
        + os.path.join(path, "documents.parquet")
        + "' (FORMAT parquet)"
    )


def main() -> int:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    names = sys.argv[1:] or PROBE_QUERIES

    base = os.path.join(tempfile.gettempdir(), "nas-longdoc-probe")
    shutil.rmtree(base, ignore_errors=True)
    short_dir = os.path.join(base, "short")
    long_dir = os.path.join(base, "long")
    make_corpus(short_dir, TOTAL_TOKENS // 100, 100)
    make_corpus(long_dir, TOTAL_TOKENS // 10_000, 10_000)

    from ngram_analytics_spark.queries import build_registry
    from ngram_analytics_spark.session import get_spark

    spark = get_spark(app_name="nas-longdoc-probe")
    qs = build_registry().queries

    def timed(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        return best

    print("| query | short s | long s | long/short |")
    print("|---|---|---|---|")
    flagged = []
    for name in names:
        if name not in qs:
            continue
        try:
            ts = timed(name, short_dir)
            tl = timed(name, long_dir)
        except Exception as ex:  # schema mismatch etc. — report, move on
            print(f"| {name} | ERROR | {type(ex).__name__} | — |")
            continue
        ratio = tl / ts if ts > 0 else float("inf")
        mark = " **SUPER-LINEAR?**" if ratio > 5 else ""
        if ratio > 5:
            flagged.append(name)
        print(f"| {name} | {ts:.2f} | {tl:.2f} | {ratio:.1f}{mark} |")
    print()
    print(
        "flagged (>5x at equal token mass):",
        flagged if flagged else "none",
    )
    shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
