"""Benchmark decontamination: planted-overlap units + a DuckDB string-gram
value oracle over the real documents table (the Spark side joins on xxhash64
gram hashes; at test scale the hash is injective, so the string-gram oracle
pins exact equality)."""

import duckdb
from pyspark.sql import functions as F

from mass_georeferencing_spark.operators import decontam

from conftest import SF_DIR

N = 5  # short grams so the tiny sf0.001 corpus produces real overlap


def test_planted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "prefix words then the quick brown fox jumps suffix"),
            (4, "too short"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, "THE QUICK   BROWN fox Jumps")],  # case + whitespace normalize
        "bid bigint, text string",
    )
    kept = {
        r.doc_id
        for r in decontam.decontaminate(docs, bench, n=N).select("doc_id").collect()
    }
    # docs 1 and 3 share the 5-gram "the quick brown fox jumps"; 2 and 4 survive
    assert kept == {2, 4}
    bad = {
        r.doc_id for r in decontam.contaminated_ids(docs, bench, n=N).collect()
    }
    assert bad == {1, 3}


def test_matches_duckdb_string_gram_oracle(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    # benchmark = every 37th doc's text (guaranteed real overlap, including
    # with OTHER docs sharing template vocabulary)
    bench = docs.where(F.col("doc_id") % 37 == 0).select(F.col("text"))
    got = {r.doc_id for r in decontam.contaminated_ids(docs, bench, n=N).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    grams = (
        "CASE WHEN len(t) >= {n} THEN list_transform(range(1, len(t) - {n} + 2), "
        "i -> array_to_string(list_slice(t, i, i + {n} - 1), ' ')) "
        "ELSE [] END"
    ).format(n=N)
    want = {
        r[0]
        for r in con.execute(
            f"""
        WITH tok AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
          FROM documents),
        dg AS (SELECT doc_id, unnest({grams}) AS g FROM tok),
        bg AS (SELECT DISTINCT unnest({grams}) AS g FROM tok WHERE doc_id % 37 = 0)
        SELECT DISTINCT doc_id FROM dg JOIN bg USING (g)
        """
        ).fetchall()
    }
    assert len(got) > 0
    assert got == want
    # the benchmark members themselves are contaminated by construction
    members = {r.doc_id for r in docs.where(F.col("doc_id") % 37 == 0).collect()}
    long_enough = {
        r.doc_id
        for r in docs.where(
            (F.col("doc_id") % 37 == 0) & (F.size(F.split(F.trim(F.lower("text")), r"\s+")) >= N)
        ).collect()
    }
    assert long_enough <= got


def test_jvm_only_plan(spark):
    # the gram pipeline is pure JVM — no Arrow/Python nodes anywhere
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    bench = docs.limit(5)
    out = decontam.decontaminate(docs, bench, n=N)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
