"""Blocked fuzzy similarity join — THE core operator (J1/J2).

Reference semantics (batch_georeferencing/functions.py:258-309):
- score1 = partial_ratio(locality, candidate_name_ascii)            (:272)
- score2 = token_set_ratio(locality_nostop_ascii, candidate_name_ascii) (:277)
- score_state = partial_ratio(stateprovince, candidate_state_ascii) (:289)
- keep pairs with score1 + score2 > 140                             (:292)

The reference achieves tractability by *blocking*: candidates are fetched per
(species, country[, state]) before scoring (batch_georeferencing.py:129-499,
SURVEY.md O1). Here blocking is an equi-join on the block key (lang plays
countrycode) — Catalyst turns it into a broadcast hash join when the gazetteer
slice is small, else a shuffled hash join; AQE splits skewed blocks.

Scale design (100 TB):
1. **Dedup-before-score**: groups and candidates repeat the same (query, name)
   strings many times. Scoring runs over DISTINCT queries × DISTINCT names per
   block — the distinct query side is repartitioned round-robin and the distinct
   name side broadcast-joined onto it, so the pair space is generated, scored,
   and threshold-filtered in ONE fully parallel stage with no pair-level shuffle.
2. **Vectorized scoring**: the bit-parallel LCS DP runs as uint64 numpy ops over
   the whole Arrow batch (functions/fuzzy_batch.py), chunked to stay L2-resident.
   No per-row Python dispatch (input_hint).
3. **Threshold-before-join-back**: only surviving pairs (orders of magnitude
   fewer) join back as groups ⋈ pairs ⋈ candidates — the blocked cross product
   is never materialized, and both join-backs are broadcast-able (AQE promotes
   them from measured runtime sizes). This replaces the reference's pg_trgm GIN
   index role (SURVEY.md O4) with blocking + dedup + vectorization.
4. **State scores deduplicated** the same way: distinct (state, province) pairs
   scored once, broadcast back.
5. **Salting**: optional `salt` splits a hot block key into ``salt`` sub-blocks —
   megacity/no-state skew (SURVEY.md §7.3). With the broadcast pair-generation
   path, hot keys never shuffle at all, so this matters only for the
   ``dedup_pairs=False`` blocked-product fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..functions import fuzzy, fuzzy_batch

FUZZY_SUM_THRESHOLD = 140.0  # functions.py:292 (score1 + score2 > 140)

_SCORE_SCHEMA = StructType(
    [
        StructField("score1", DoubleType()),
        StructField("score2", DoubleType()),
    ]
)


def _char_counts(s: str) -> dict[str, int]:
    d: dict[str, int] = {}
    for ch in s:
        d[ch] = d.get(ch, 0) + 1
    return d


def _msect(ca: dict[str, int], cb: dict[str, int]) -> int:
    if len(cb) < len(ca):
        ca, cb = cb, ca
    return sum(min(v, cb[k]) for k, v in ca.items() if k in cb)


def score_pair(
    q_full: str, q_nostop: str, name: str, threshold: float | None = FUZZY_SUM_THRESHOLD
) -> tuple[float, float]:
    """(partial_ratio(q_full, name), token_set_ratio(q_nostop, name)).

    When ``threshold`` is set, pairs provably below it short-circuit to (0, 0) —
    sound ONLY under a downstream ``score1 + score2 > threshold`` filter (the
    returned zeros land below any nonnegative threshold, so the row is dropped
    either way). Bounds: for any alignment window w (full OR boundary-clipped),
    LCS(s, w) ≤ min(msect, |w|) where msect is the multiset char intersection
    of the two full strings, so 200·LCS/(|s|+|w|) ≤ 200·msect/(|s|+msect)
    (maximized at |w| = msect); with zero shared characters every token_set
    reconstruction ratio is 0 too (empty/empty edge cases handled first).
    """
    if threshold is not None and q_full and name:
        ca = _char_counts(q_full)
        cb = _char_counts(name)
        ms = _msect(ca, cb)
        if ms == 0:
            # score1 = 0 for sure; score2 = 0 unless q_nostop shares chars or is
            # empty (empty-vs-nonempty token_set is 0 as well, so only the
            # both-empty case below can score).
            if q_nostop and _msect(_char_counts(q_nostop), cb) == 0:
                return 0.0, 0.0
        else:
            ls = max(min(len(q_full), len(name)), 1)
            bound1 = 200.0 * ms / (ls + ms)
            if bound1 + 100.0 <= threshold:
                # even a perfect score2 cannot lift the sum over the threshold
                return 0.0, 0.0
    s1 = fuzzy.partial_ratio(q_full, name)
    s2 = fuzzy.token_set_ratio(q_nostop, name)
    return s1, s2


def _score_batch(
    qf: pd.Series, qn: pd.Series, nm: pd.Series, threshold: float | None
) -> pd.DataFrame:
    """Vectorized batch scoring (functions/fuzzy_batch.py): the bit-parallel
    LCS DP runs as uint64 numpy ops across the whole Arrow batch.

    With a ``threshold`` (the downstream ``score1 + score2 > threshold``
    filter), the cheap token_set kernel runs FIRST and the expensive
    window-scanning partial_ratio runs only for pairs that could still pass:
    score1 ≤ 100 always, so score2 ≤ threshold − 100 means the pair is dropped
    either way and its score1 short-circuits to 0 — the same soundness
    argument as :func:`score_pair`'s scalar prune. On blocked pair spaces most
    pairs are dissimilar, so most skip the partial_ratio scan entirely.
    ``threshold=None`` keeps both scores exact for every pair."""
    a = qf.fillna("").astype(str).tolist()
    b = qn.fillna("").astype(str).tolist()
    c = nm.fillna("").astype(str).tolist()
    n = len(a)
    # 4k-pair chunks keep each worker's bitmask tables L2-resident; full-batch
    # vectors thrash the shared LLC when every core scores at once (measured
    # 2x loss at 32 cores on one socket)
    chunk = 4000
    s1 = np.zeros(n, dtype=np.float64)
    s2 = np.empty(n, dtype=np.float64)
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        s2[i:j] = fuzzy_batch.batch_token_set_ratio(b[i:j], c[i:j])
    if threshold is None:
        need = np.arange(n)
    else:
        # token_set-first prune: score1 ≤ 100 always, so s2 ≤ threshold − 100
        # means the pair fails the downstream sum filter either way and its
        # score1 short-circuits to 0 (same soundness as score_pair's prune)
        need = np.nonzero(s2 > threshold - 100.0)[0]
    if len(need):
        # window-scan cost per chunk is max(len(name)) · max(len(query)) over
        # the CHUNK: length-sort the surviving pairs so same-length pairs
        # share chunks and no short pair pays a long pair's window count
        # (per-pair results are independent — order is a pure perf knob)
        order = need[np.argsort([len(c[k]) * 64 + len(a[k]) for k in need], kind="stable")]
        for i in range(0, len(order), chunk):
            sub = order[i : i + chunk]
            s1[sub] = fuzzy_batch.batch_partial_ratio(
                [a[k] for k in sub], [c[k] for k in sub]
            )
    return pd.DataFrame({"score1": s1, "score2": s2}, index=qf.index)


def make_fuzzy_scores_udf(threshold: float | None = FUZZY_SUM_THRESHOLD):
    """Build the scoring UDF; ``threshold`` enables the prune short-circuit and
    MUST equal the downstream filter's threshold (None disables pruning)."""

    @F.pandas_udf(_SCORE_SCHEMA)
    def fuzzy_scores(qf: pd.Series, qn: pd.Series, nm: pd.Series) -> pd.DataFrame:
        return _score_batch(qf, qn, nm, threshold)

    return fuzzy_scores


@F.pandas_udf(DoubleType())
def partial_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        fuzzy_batch.batch_partial_ratio(
            a.fillna("").astype(str).tolist(), b.fillna("").astype(str).tolist()
        ),
        index=a.index,
    )


@F.pandas_udf(DoubleType())
def token_set_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        fuzzy_batch.batch_token_set_ratio(
            a.fillna("").astype(str).tolist(), b.fillna("").astype(str).tolist()
        ),
        index=a.index,
    )


@F.pandas_udf(DoubleType())
def ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series(
        fuzzy_batch.batch_ratio(
            a.fillna("").astype(str).tolist(), b.fillna("").astype(str).tolist()
        ),
        index=a.index,
    )


def fuzzy_candidate_join(
    groups: DataFrame,
    candidates: DataFrame,
    block_keys: list[str] | None = None,
    query_col: str = "mention_folded",
    query_nostop_col: str = "mention_nostop_folded",
    name_col: str = "name_folded",
    state_query_col: str = "state",
    state_cand_col: str = "stateprovince_folded",
    threshold: float = FUZZY_SUM_THRESHOLD,
    with_state: bool = True,
    dedup_pairs: bool | str = True,
    broadcast_candidates: bool = False,
    broadcast_scored_pairs: bool = False,
    salt: int | None = None,
    prune: bool = True,
) -> DataFrame:
    """Blocked fuzzy theta-join: groups × candidates within block, scored and
    thresholded (functions.py:258-292).

    Returns groups ⋈ candidates columns + score1, score2 [, score_state].
    ``with_state=False`` mirrors the reference's no-state branch
    (batch_georeferencing.py:193, functions.py:268 state flag).

    ``dedup_pairs``: True/'broadcast' = distinct-pair scoring with the name
    side broadcast (the default; right when the per-block name vocabulary is
    dimension-sized); 'shuffle' = the same distinct-pair dedup via a shuffled
    equi-join on the block key — no size cap on either side, AQE splits skewed
    blocks, pass ``salt`` when block cardinality is tiny; False = no pair
    dedup at all (the raw blocked product — only for benchmarking the dedup
    win). All three produce identical results (tests/test_fuzzy_join_paths.py).
    """
    block_keys = block_keys or ["lang"]
    cand = candidates
    if salt and salt > 1:
        # replicate candidates across `salt` sub-blocks; groups pick one
        # deterministically → hot keys spread over `salt` reducers.
        cand = cand.withColumn(
            "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
        )
        groups = groups.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(query_col)), F.lit(salt)).cast("int")
        )
        block_keys = [*block_keys, "_salt"]
    if broadcast_candidates:
        cand = F.broadcast(cand)

    scores_udf = make_fuzzy_scores_udf(threshold if prune else None)
    if dedup_pairs:
        # Dedup-before-score, restated for scale:
        # 1. the pair space is DISTINCT queries × DISTINCT names per block —
        #    both tiny relative to their source tables. The query side is
        #    repartitioned round-robin BEFORE the pair join, so the exploded
        #    pairs are born spread across 2×parallelism partitions and the
        #    scoring UDF + threshold filter run in that same stage: no
        #    pair-level shuffle, no distinct over the pair set, and AQE's
        #    byte-based coalescing never sees (and can't starve) the
        #    Python-expensive stage.
        # 2. the threshold filter runs on scored pairs BEFORE any join-back —
        #    the surviving set is orders of magnitude smaller.
        # 3. the final result is groups ⋈ pairs ⋈ candidates in THAT order —
        #    the blocked (groups × candidates) product is never materialized;
        #    both join-backs are broadcast-able (AQE promotes from runtime
        #    sizes) and equality on (block key, query/name) keeps exact
        #    blocking semantics.
        # n_d is broadcast: it is the DISTINCT name set, far smaller than the
        # gazetteer; if a deployment's per-block name vocabulary outgrows
        # broadcast range, pass dedup_pairs=False (blocked shuffle join).
        q_d = groups.select(*block_keys, query_col, query_nostop_col).distinct()
        n_d = cand.select(*block_keys, name_col).distinct()
        parallelism = groups.sparkSession.sparkContext.defaultParallelism
        if dedup_pairs == "shuffle":
            # both distinct sides shuffled on the block key: no broadcast-range
            # cap on the name vocabulary. The caller chose this mode BECAUSE
            # the name side is too big to broadcast, so the shuffled hash join
            # is requested explicitly (size stats on a distinct agg are
            # estimates Catalyst could get wrong). The scoring UDF inherits
            # the join's block-hash distribution — AQE's skew-join split
            # handles hot blocks, and `salt` spreads a tiny block-key space.
            pairs = q_d.join(n_d.hint("shuffle_hash"), on=block_keys)
        else:
            pairs = q_d.repartition(2 * parallelism).join(F.broadcast(n_d), on=block_keys)
        scored_pairs = (
            pairs.withColumn(
                "_s", scores_udf(F.col(query_col), F.col(query_nostop_col), F.col(name_col))
            )
            .select(
                *block_keys,
                query_col,
                query_nostop_col,
                name_col,
                F.col("_s.score1").alias("score1"),
                F.col("_s.score2").alias("score2"),
            )
            .where(F.col("score1") + F.col("score2") > F.lit(threshold))
        )
        if broadcast_scored_pairs:
            # force-broadcast when the caller KNOWS the surviving set is small;
            # default False lets AQE decide from the measured size
            scored_pairs = F.broadcast(scored_pairs)
        scored = groups.join(
            scored_pairs, on=[*block_keys, query_col, query_nostop_col]
        ).join(cand, on=[*block_keys, name_col])
    else:
        blocked = groups.join(cand, on=block_keys)
        scored = blocked.withColumn(
            "_s", scores_udf(F.col(query_col), F.col(query_nostop_col), F.col(name_col))
        ).withColumn("score1", F.col("_s.score1")).withColumn("score2", F.col("_s.score2")).drop("_s")

    scored = scored.where(F.col("score1") + F.col("score2") > F.lit(threshold))
    if with_state:
        # state similarity, same dedup-before-score treatment: the distinct
        # (state, stateprovince) pair set is tiny (admin vocabularies), so one
        # small UDF pass + a broadcast join-back replaces scoring every result
        # row. The pair set is built from the join INPUTS (distinct states ×
        # distinct candidate provinces), not from `scored`, so the expensive
        # subtree is never referenced twice.
        q_s = groups.select(F.col(state_query_col)).distinct()
        n_s = cand.select(F.col(state_cand_col)).distinct()
        sd = q_s.crossJoin(F.broadcast(n_s))
        sds = sd.withColumn(
            "score_state", partial_ratio_udf(F.col(state_query_col), F.col(state_cand_col))
        )
        scored = scored.join(F.broadcast(sds), on=[state_query_col, state_cand_col])
    if salt and salt > 1:
        scored = scored.drop("_salt")
    return scored


def fuzzy_mean_join(
    groups: DataFrame,
    candidates: DataFrame,
    block_keys: list[str] | None = None,
    query_col: str = "mention_folded",
    name_col: str = "name_folded",
    state_query_col: str = "state",
    state_cand_col: str = "stateprovince_folded",
    method: str = "partial",
    threshold: float = 80.0,
    dedup_pairs: bool = True,
) -> DataFrame:
    """J2 — the older engine's variant (old/shiny/match_localities/match_SI_GBIF.py:43-71):
    score = (locality_sim + state_sim) / 2, keep > threshold; method switches
    partial_ratio vs token_set_ratio (:55,64).

    ``dedup_pairs=True`` (default) gives J2 the same scale treatment as J1
    (:func:`fuzzy_candidate_join`): both similarity kernels score DISTINCT
    string pairs, never the blocked groups × candidates product —

    1. locality scores run over distinct (block key, query, name) with the
       query side explicitly repartitioned and the distinct name side
       broadcast, so the UDF stage is fully parallel (AQE's byte-based
       coalescing never sees it) and nothing pair-product-sized shuffles;
    2. state scores run over the tiny distinct (state, province) cross;
    3. the mean + threshold apply on the distinct 4-tuple space — orders of
       magnitude smaller than the result on repetitive web text — and only
       surviving tuples join back (groups ⋈ tuples ⋈ candidates, both
       join-backs AQE-decided).

    Identical results to the blocked product by construction (the score is a
    pure function of the four strings; tests/test_fuzzy_join_paths.py pins
    it, including NULL text columns): the four text columns are joined on
    internal NULL→'' coalesced keys, matching the kernels' own fillna('') —
    a NULL name/state is scored as '' in both paths, never silently dropped.
    ``dedup_pairs=False`` keeps the raw blocked product as the equivalence
    baseline (scores every result row; a pair-explosion at scale).
    """
    block_keys = block_keys or ["lang"]
    udf = partial_ratio_udf if method == "partial" else token_set_ratio_udf
    if not dedup_pairs:
        blocked = groups.join(candidates, on=block_keys)
        scored = blocked.withColumn(
            "score",
            (udf(F.col(query_col), F.col(name_col)) + udf(F.col(state_query_col), F.col(state_cand_col)))
            / F.lit(2.0),
        )
        return scored.where(F.col("score") > F.lit(threshold))

    parallelism = groups.sparkSession.sparkContext.defaultParallelism

    def _nn(c: str) -> Column:
        return F.coalesce(F.col(c).cast("string"), F.lit(""))

    g = groups.withColumn("_j2q", _nn(query_col)).withColumn("_j2s", _nn(state_query_col))
    c = candidates.withColumn("_j2n", _nn(name_col)).withColumn("_j2p", _nn(state_cand_col))
    q_d = g.select(*block_keys, "_j2q", "_j2s").distinct()
    n_d = c.select(*block_keys, "_j2n", "_j2p").distinct()
    # locality kernel over distinct (block, query) × distinct (block, name):
    # generate-in-place above an explicit repartition (NOTES.md lesson 1 — a
    # compute-heavy UDF over a small-byte set must not be byte-coalesced)
    loc_scored = (
        q_d.select(*block_keys, "_j2q")
        .distinct()
        .repartition(2 * parallelism)
        .join(F.broadcast(n_d.select(*block_keys, "_j2n").distinct()), on=block_keys)
        .withColumn("_sloc", udf(F.col("_j2q"), F.col("_j2n")))
    )
    # state kernel over the tiny distinct (state, province) cross
    st_scored = (
        g.select("_j2s")
        .distinct()
        .crossJoin(F.broadcast(c.select("_j2p").distinct()))
        .withColumn("_sst", udf(F.col("_j2s"), F.col("_j2p")))
    )
    # distinct 4-tuple space: attach each name's provinces and each query's
    # states (JVM-only joins), combine the two score maps, threshold BEFORE
    # any join-back
    surviving = (
        loc_scored.join(n_d, on=[*block_keys, "_j2n"])
        .join(q_d, on=[*block_keys, "_j2q"])
        .join(F.broadcast(st_scored), on=["_j2s", "_j2p"])
        .withColumn("score", (F.col("_sloc") + F.col("_sst")) / F.lit(2.0))
        .where(F.col("score") > F.lit(threshold))
        .drop("_sloc", "_sst")
    )
    return (
        g.join(surviving, on=[*block_keys, "_j2q", "_j2s"])
        .join(c, on=[*block_keys, "_j2n", "_j2p"])
        .drop("_j2q", "_j2s", "_j2n", "_j2p")
    )
