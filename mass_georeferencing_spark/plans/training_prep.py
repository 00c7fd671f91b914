"""Composed training-data preparation dataflow over the documents table.

The brief's training-data operators (benchmark decontamination, language-ID,
quality + repetition scoring, exact and near dedup, stratified corpus mixing,
token counting, fingerprinting) each exist as standalone contract queries;
this plan composes them the way a pretraining-corpus job actually runs them —
one dataflow, cheap filters first, expensive dedup late, mixing last, every
stage reusing the operator modules unchanged:

  documents → benchmark decontamination (13-gram hash semi/anti join;
              optional — on when a ``benchmark`` frame is given)
            → language-ID (trigram profiles, Arrow UDF)
            → quality score (pure JVM) → keep quality ≥ min_quality
            → repetition filter (Gopher-family dup-line / top-2gram
              fractions; optional — on when thresholds are given)
            → exact dedup on the normalization-stable fingerprint
              (keep the lowest doc_id per fingerprint)
            → MinHash-LSH near-dup pairs (banded, bucket-capped) + exact
              Jaccard verify → removal policy (greedy or components)
            → deterministic stratified mix (optional — on when ``mix_rates``
              is given; md5-threshold per stratum, zero shuffle)
            → annotate survivors (token counts, fingerprint, pred_lang)

Two near-dup removal policies (``removal=``):

- ``'greedy'`` (default): drop every doc that appears as the HIGHER id of a
  verified pair — one anti-join, no iteration. Never keeps a verified pair,
  and keeps a SUPERSET of what components-removal keeps (every component
  minimum is never a higher id): on a star (a~c, b~c, NOT a~b) it keeps both
  a and b, which are not near-dups of each other.
- ``'components'``: transitive clustering via
  operators/dedup.py:duplicate_components (min-label propagation with
  pointer jumping), keep each component's minimum id. Drops more on stars/
  chains by treating near-duplication as transitive — the policy most
  published dedup pipelines use for web corpora, at the cost of O(log
  diameter) iterative rounds.

Stage-order rationale: decontamination runs FIRST (a contaminated doc must
never influence later stages or survive via a dedup representative swap);
the per-doc filters (lang/quality/repetition) run before any shuffle so they
ride the scan; the stratified mix runs AFTER dedup so sampling rates apply
to unique documents (mixing before dedup would re-weight by duplication
count). Language profiles train on a bounded sample of the RAW table — a
side input, deliberately independent of which filter stages are enabled.

Scale shape (SCALE.md): decontamination is a broadcast semi-join riding the
scan (nothing gram-sized shuffles); the filters run in the scan stage
(repetition adds two linear explode→count aggregations keyed on (doc, unit));
exact dedup is one hash aggregation on the fingerprint; the LSH stages are
the capped banded joins from operators/dedup.py; the final anti-join keys on
doc_id; the mix is a map-side md5-threshold filter. Nothing quadratic,
nothing collected to the driver except the bounded lang-profile sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.decontam import decontaminate
from ..operators.dedup import lsh_dropped_buckets, minhash_dedup_pairs
from ..operators.sampling import stratified_sample
from ..operators.textstats import (
    bpe_token_count,
    build_lang_profiles,
    content_fingerprint,
    language_id_udf,
    quality_score,
    repetition_metrics,
)
from ..sources.tables import load_table


def prepare_training_corpus(
    spark: SparkSession,
    sf_dir: str,
    min_quality: float = 70.0,
    jaccard_threshold: float = 0.5,
    lang_profile_sample: int = 200,
    removal: str = "greedy",
    benchmark: DataFrame | None = None,
    decontam_n: int = 13,
    max_dup_line_frac: float | None = None,
    max_top_2gram_char_frac: float | None = None,
    mix_rates: dict[str, float] | None = None,
    mix_salt: str = "mgs",
) -> dict[str, DataFrame]:
    """Run the composed corpus-prep dataflow; returns stage frames keyed by
    name (``corpus`` is the final cleaned table). The three optional stages
    (decontamination, repetition filter, stratified mix) activate when their
    inputs are supplied and are no-ops otherwise."""
    raw_docs = load_table(spark, sf_dir, "documents")

    # profiles are a bounded side input trained on the raw table, so the
    # classifier is identical whichever optional stages are enabled
    profiles = build_lang_profiles(raw_docs, max_sample=lang_profile_sample)
    lang_id = language_id_udf(profiles)

    docs = raw_docs
    if benchmark is not None:
        docs = decontaminate(docs, benchmark, n=decontam_n)

    scored = quality_score(docs).withColumn("pred_lang", lang_id(F.col("text")))
    kept = scored.where(F.col("quality") >= F.lit(min_quality))
    if max_dup_line_frac is not None or max_top_2gram_char_frac is not None:
        kept = repetition_metrics(kept)
        if max_dup_line_frac is not None:
            kept = kept.where(F.col("dup_line_frac") <= F.lit(max_dup_line_frac))
        if max_top_2gram_char_frac is not None:
            kept = kept.where(
                F.col("top_2gram_char_frac") <= F.lit(max_top_2gram_char_frac)
            )

    # exact dedup: one hash aggregation on the normalization-stable
    # fingerprint; the lowest doc_id represents its group
    fp = kept.withColumn("fingerprint", content_fingerprint(F.col("text")))
    reps = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    exact_unique = fp.join(reps, on=["fingerprint", "doc_id"])  # semi by construction

    # near-dup removal: verified pairs over the exact-unique survivors only
    # (pairs among already-removed exact dups would be wasted work), then one
    # anti-join dropping the higher id of each verified pair
    pairs = minhash_dedup_pairs(
        exact_unique.select("doc_id", "text"), threshold=jaccard_threshold
    )
    if removal == "components":
        from ..operators.dedup import duplicate_components

        comps = duplicate_components(pairs)
        drop = comps.where(F.col("doc_id") != F.col("component_id")).select("doc_id")
    elif removal == "greedy":
        drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    else:  # pragma: no cover
        raise ValueError(f"unknown removal policy {removal!r}")
    survivors = exact_unique.join(drop, on="doc_id", how="left_anti")

    # stratified mix LAST: rates apply to unique, decontaminated documents
    mixed = (
        stratified_sample(survivors, mix_rates, strata_col="lang", salt=mix_salt)
        if mix_rates is not None
        else survivors
    )

    corpus = (
        mixed.withColumn("bpe_tokens", bpe_token_count(F.col("text")).cast("long"))
        .select(
            "doc_id",
            "lang",
            "pred_lang",
            "quality",
            "n_tokens",
            "bpe_tokens",
            "fingerprint",
            "text",
        )
    )
    return {
        "decontaminated": docs,
        "scored": scored,
        "kept": kept,
        "exact_unique": exact_unique,
        "near_dup_pairs": pairs,
        "survivors": survivors,
        "mixed": mixed,
        # bounded coverage is never silent (dedup.py module rule): the buckets
        # the cap removed from near-dup detection, for the job log / metrics
        # sink — empty on healthy corpora
        "dropped_buckets": lsh_dropped_buckets(
            exact_unique.select("doc_id", "text"), method="minhash"
        ),
        "corpus": corpus,
    }
