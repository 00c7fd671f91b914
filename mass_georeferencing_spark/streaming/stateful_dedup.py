"""Custom stateful streaming operator: cross-micro-batch exact dedup.

``applyInPandasWithState`` keyed by content fingerprint: the first page carrying
a given fingerprint is emitted, later arrivals (same batch or any later batch)
are suppressed — the streaming analog of operators/dedup.exact_dedup, with the
seen-set held in Spark's state store instead of a shuffle. State per key is one
tiny row (first_seen url), so memory scales with DISTINCT content, not traffic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fingerprint string, url string, lang string, n_suppressed bigint"
STATE_SCHEMA = "first_url string, n_seen bigint"


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    fingerprint = key[0]
    batch = pd.concat(list(pdfs), ignore_index=True)
    if state.exists:
        first_url, n_seen = state.get
        state.update((first_url, n_seen + len(batch)))
        return iter(())  # duplicate content: suppress everything
    first = batch.iloc[0]
    state.update((str(first["url"]), len(batch)))
    return iter(
        [
            pd.DataFrame(
                {
                    "fingerprint": [fingerprint],
                    "url": [first["url"]],
                    "lang": [first["lang"]],
                    "n_suppressed": [len(batch) - 1],
                }
            )
        ]
    )


def stream_exact_dedup(pages: DataFrame) -> DataFrame:
    """Streaming pages → first-seen rows per content fingerprint."""
    keyed = pages.withColumn(
        "fingerprint", F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    )
    return (
        keyed.groupBy("fingerprint")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
