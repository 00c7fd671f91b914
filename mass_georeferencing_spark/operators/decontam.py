"""Benchmark decontamination — drop training docs that overlap an eval set.

The standard pretraining-corpus hygiene step (popularized by the GPT-3
appendix): a document is contaminated if it shares ANY length-``n`` token
n-gram with the benchmark corpus; contaminated documents are removed before
training. No reference counterpart (the reference is a georeferencing
engine); this belongs to the brief's training-data operator family next to
dedup/quality/lang-ID.

Spark-first shape, built for the asymmetry of the problem — the benchmark
side is small (eval sets: 10^3-10^6 grams), the docs side is the 100 TB
corpus:

1. benchmark grams are hashed (``xxhash64``) and DISTINCT — a few MB — and
   ride a broadcast hash join;
2. the docs side explodes its token n-grams as 8-byte hashes only (never
   gram strings), one linear JVM pass (``transform`` over a ``sequence`` —
   no Python), and LEFT SEMI joins the broadcast set: the join output is
   contaminated doc ids, bounded by the corpus row count, not the gram
   count;
3. the final ANTI join keys on the doc id.

Nothing here shuffles gram-sized data: the semi join is map-side against the
broadcast, and only (doc_id) survives it. Collisions: xxhash64 over 64 bits
at 10^6 benchmark grams gives a ~1e-7 birthday false-positive rate per
corpus gram — a conservative drop (never a miss), the right direction for
decontamination.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_ngram_hashes(text: Column, n: int) -> Column:
    """Lowercased whitespace-token n-gram hashes as ``array<long>`` — pure
    JVM (split → sequence → transform → xxhash64 over the joined gram).
    Documents shorter than ``n`` tokens produce an empty array."""
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    ).otherwise(F.array())
    return F.transform(
        idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i, n)))
    )


def contaminated_ids(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Distinct ids of docs sharing ≥1 token n-gram with the benchmark."""
    bench_grams = (
        benchmark.select(
            F.explode(token_ngram_hashes(F.col(bench_text_col), n)).alias("_g")
        )
        .distinct()
    )
    doc_grams = docs.select(
        id_col, F.explode(token_ngram_hashes(F.col(text_col), n)).alias("_g")
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), on="_g", how="left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Remove every doc sharing ≥1 token n-gram with the benchmark corpus."""
    bad = contaminated_ids(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col, bench_text_col=bench_text_col
    )
    return docs.join(bad, on=id_col, how="left_anti")
