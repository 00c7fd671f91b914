"""Single-node throughput: reference execution pattern vs this engine.

The reference scores candidates row-at-a-time with pandas ``.apply`` over
rapidfuzz calls (batch_georeferencing/functions.py:272,277 —
``df.apply(lambda row: fuzz.partial_ratio(...), axis=1)``), single process,
per-(species,country) SQL round-trips. This tool reproduces that execution
pattern faithfully (same scalar scoring functions, same pandas .apply shape)
and times it against the engine's vectorized batch kernel on identical pairs —
the per-pair cost ratio IS the single-node speedup, before any parallelism.

Run: python tools/reference_compare.py [n_pairs]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from mass_georeferencing_spark.functions import fuzzy, fuzzy_batch

VOCAB = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima "
    "mike november oscar papa quebec romeo sierra tango lake river mountain fort "
    "san santa new old upper lower"
).split()


def make_pairs(n: int) -> pd.DataFrame:
    rng = random.Random(42)
    rows = []
    for _ in range(n):
        mention = " ".join(rng.sample(VOCAB, 2))
        name = " ".join(rng.sample(VOCAB, rng.randint(2, 4)))
        rows.append((mention, mention, name))
    return pd.DataFrame(rows, columns=["locality", "locality_nostop", "name"])


def reference_style(df: pd.DataFrame) -> pd.Series:
    # the reference's shape: one python lambda per row, two scorer calls
    # (functions.py:272 partial_ratio, :277 token_set_ratio)
    s1 = df.apply(lambda row: fuzzy.partial_ratio(row["locality"], row["name"]), axis=1)
    s2 = df.apply(
        lambda row: fuzzy.token_set_ratio(row["locality_nostop"], row["name"]), axis=1
    )
    return s1 + s2


def engine_style(df: pd.DataFrame):
    s1 = fuzzy_batch.batch_partial_ratio(df["locality"].tolist(), df["name"].tolist())
    s2 = fuzzy_batch.batch_token_set_ratio(
        df["locality_nostop"].tolist(), df["name"].tolist()
    )
    return s1 + s2


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    df = make_pairs(n)

    t0 = time.time()
    ref = reference_style(df)
    t_ref = time.time() - t0

    t0 = time.time()
    eng = engine_style(df)
    t_eng = time.time() - t0

    assert (ref.to_numpy() == eng).all(), "kernels disagree"
    print(
        json.dumps(
            {
                "n_pairs": n,
                "reference_apply_s": round(t_ref, 2),
                "reference_pairs_per_s": round(n / t_ref),
                "engine_batch_s": round(t_eng, 2),
                "engine_pairs_per_s": round(n / t_eng),
                "single_core_speedup": round(t_ref / t_eng, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
