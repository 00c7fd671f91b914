"""HTML → text extraction: the input_hint's byte-identical-per-url invariant.

Three layers of evidence:
1. the REAL pages table (rendered html with head/script/style noise and
   entity-encoded body) round-trips: extract_text_col(html) == text for every
   url, byte-for-byte — with the precondition (whitespace-normalized corpus)
   asserted, not assumed;
2. adversarial texts (literal markup, entities, quotes, ampersand pile-ups)
   survive render → extract;
3. the DuckDB SQL twin of the extractor agrees with the Spark extractor
   value-for-value over the same pages.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mass_georeferencing_spark.operators.extract import (
    extract_sql,
    extract_text_col,
    render_html_col,
)
from mass_georeferencing_spark.sources import synthetic as syn
from tools.parity import compare, duck_connect

from conftest import SF_DIR


def test_corpus_is_whitespace_normalized(spark):
    """Precondition for byte-identity: no leading/trailing ws, no runs, no
    tabs/newlines in the corpus text (else extraction = normalized text)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bad = docs.where(
        (F.col("text") != F.trim(F.col("text")))
        | F.col("text").rlike(r"\s\s")
        | F.col("text").rlike(r"[\t\n\r]")
    ).count()
    assert bad == 0


def test_pages_html_is_real_markup(spark):
    """The invariant must be earned: html is NOT just the text bytes."""
    pages = syn.pages_df(spark, SF_DIR)
    row = pages.select(F.decode("html", "UTF-8").alias("h"), "text").first()
    assert row.h != row.text
    assert "<script>" in row.h and "<style>" in row.h
    assert row.h.startswith("<!DOCTYPE html>")
    assert row.h.endswith("</body></html>")


def test_extract_round_trips_every_page_byte_identical(spark):
    pages = syn.pages_df(spark, SF_DIR)
    n = pages.count()
    ok = pages.where(extract_text_col(F.col("html")) == F.col("text")).count()
    assert ok == n > 0


ADVERSARIAL = [
    "plain words only",
    "literal <p> tag and </script> closer inside text",
    "ampersand & and double && and entity-looking &amp; &lt; &nbsp; strings",
    'quotes "double" and \'single\' plus &#39; literal',
    "less<than and greater>than unspaced",
    "trailing entity &",
    "<",
    "&amp;lt;",
]


def test_adversarial_texts_round_trip(spark):
    df = spark.createDataFrame(
        [(f"u{i}", t) for i, t in enumerate(ADVERSARIAL)], "url string, text string"
    )
    rendered = df.withColumn("html", render_html_col(F.col("url"), F.col("text")))
    out = rendered.select(
        "text", extract_text_col(F.col("html")).alias("got")
    ).collect()
    for r in out:
        assert r.got == r.text, (r.text, r.got)


def _fuzz_texts(n: int = 500) -> list[str]:
    """Deterministic fuzz corpus honoring the whitespace precondition: tokens
    drawn (seeded) from printable ASCII minus whitespace — heavy on markup
    metacharacters and entity fragments — joined by single spaces."""
    import random

    rng = random.Random(1234)
    alphabet = [chr(c) for c in range(33, 127)]  # printable, no space
    spicy = ["&", "<", ">", "&amp;", "&lt;", "&gt;", "&nbsp;", "&#39;",
             "<p>", "</p>", "</script>", "<style>", "\"q\"", "'s'", "&&", "<<>"]
    out = []
    for _ in range(n):
        n_tok = rng.randint(1, 12)
        toks = []
        for _ in range(n_tok):
            if rng.random() < 0.4:
                toks.append(rng.choice(spicy))
            else:
                toks.append("".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))))
        out.append(" ".join(toks))
    return out


def test_fuzzed_texts_round_trip(spark):
    texts = _fuzz_texts()
    df = spark.createDataFrame(
        [(f"f{i}", t) for i, t in enumerate(texts)], "url string, text string"
    )
    rendered = df.withColumn("html", render_html_col(F.col("url"), F.col("text")))
    bad = rendered.where(extract_text_col(F.col("html")) != F.col("text"))
    rows = bad.select("text", extract_text_col(F.col("html")).alias("got")).collect()
    assert not rows, rows[:3]


def test_extractor_sql_twin_matches_spark(spark):
    pages = syn.pages_df(spark, SF_DIR)
    got = pages.select(
        "url", extract_text_col(F.col("html")).alias("extracted")
    ).toPandas()
    con = duck_connect(SF_DIR)
    want = con.execute(
        syn.with_ctes(
            f"SELECT url, {extract_sql('html')} AS extracted FROM pages",
            syn.PAGES_CTE,
        )
    ).fetchdf()
    con.close()
    assert len(got) > 0
    errs = compare("extract_twin", got, want)
    assert not errs, errs
