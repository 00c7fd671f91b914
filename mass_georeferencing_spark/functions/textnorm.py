"""Text-normalization kernels: stopword strip, NFD->ASCII fold, located_at concat.

Reference semantics (pinned by tests/test_textnorm.py):

- stopword strip (batch_georeferencing/batch_georeferencing.py:149):
  ``' '.join(w for w in s.split() if w not in STOPWORDS)`` — case-sensitive token
  membership against the (lowercase) NLTK English list, applied BEFORE the fold.
- ASCII fold (batch_georeferencing.py:151, functions.py:264-265):
  ``unicodedata.normalize('NFD', s).encode('ascii', 'ignore').decode('utf-8')``.
- located_at concat (queries.py:32-44):
  ``trim(leading ', ' from replace(a||', '||b||', '||c||', '||d, ', , ', ''))``.
- garbage-locality filter (queries.py:18):
  ``lower(locality) not in ('none', 'unknown', 'no locality data')``.

The fold and stopword strip are pandas-vectorized (``Series.str.normalize`` is a
C-level loop; the stopword strip is a single compiled regex substitution) and exposed
both as Series kernels (for use inside other pandas UDFs) and as ready-made
``pandas_udf`` columns.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# The NLTK English stopword list (public, frozen here for determinism — the
# reference loads it via nltk.corpus.stopwords.words('english'),
# batch_georeferencing.py:125).
ENGLISH_STOPWORDS: tuple[str, ...] = (
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you", "you're",
    "you've", "you'll", "you'd", "your", "yours", "yourself", "yourselves", "he",
    "him", "his", "himself", "she", "she's", "her", "hers", "herself", "it", "it's",
    "its", "itself", "they", "them", "their", "theirs", "themselves", "what",
    "which", "who", "whom", "this", "that", "that'll", "these", "those", "am", "is",
    "are", "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if", "or",
    "because", "as", "until", "while", "of", "at", "by", "for", "with", "about",
    "against", "between", "into", "through", "during", "before", "after", "above",
    "below", "to", "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when", "where", "why",
    "how", "all", "any", "both", "each", "few", "more", "most", "other", "some",
    "such", "no", "nor", "not", "only", "own", "same", "so", "than", "too", "very",
    "s", "t", "can", "will", "just", "don", "don't", "should", "should've", "now",
    "d", "ll", "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't", "hasn",
    "hasn't", "haven", "haven't", "isn", "isn't", "ma", "mightn", "mightn't",
    "mustn", "mustn't", "needn", "needn't", "shan", "shan't", "shouldn",
    "shouldn't", "wasn", "wasn't", "weren", "weren't", "won", "won't", "wouldn",
    "wouldn't",
)

_STOPWORD_SET = frozenset(ENGLISH_STOPWORDS)
# token-boundary regex alternation; longest-first so "don't" beats "don"
_STOPWORD_RE = re.compile(
    r"(?:(?<=\s)|^)(?:"
    + "|".join(re.escape(w) for w in sorted(_STOPWORD_SET, key=len, reverse=True))
    + r")(?=\s|$)"
)
_WS_RE = re.compile(r"\s+")

GARBAGE_LOCALITIES = ("none", "unknown", "no locality data")


def strip_stopwords_series(s: pd.Series) -> pd.Series:
    """Drop exact (case-sensitive) NLTK stopword tokens; collapse whitespace."""
    filled = s.fillna("").astype(str)
    out = filled.str.replace(_STOPWORD_RE, "", regex=True)
    return out.str.replace(_WS_RE, " ", regex=True).str.strip()


def ascii_fold_series(s: pd.Series) -> pd.Series:
    """NFD-normalize then drop non-ASCII bytes (reference fold, byte-for-byte)."""
    filled = s.fillna("").astype(str)
    return (
        filled.str.normalize("NFD")
        .str.encode("ascii", errors="ignore")
        .str.decode("utf-8")
    )


@F.pandas_udf(StringType())
def strip_stopwords_udf(s: pd.Series) -> pd.Series:
    return strip_stopwords_series(s)


@F.pandas_udf(StringType())
def ascii_fold_udf(s: pd.Series) -> pd.Series:
    return ascii_fold_series(s)


def located_at(*cols: Column) -> Column:
    """Hierarchical place string with empty-segment collapse (queries.py:32-44).

    SQL original: ``trim(leading ', ' FROM replace(a||', '||b||', '||c, ', , ', ''))``.
    Built entirely from JVM functions (codegen-friendly).
    """
    joined = F.concat_ws(", ", *[F.coalesce(c, F.lit("")) for c in cols])
    # postgres replace() is a single pass; repeated empties need two passes at most
    # for the reference's 4-column usage — replicate the single-pass semantics.
    collapsed = F.regexp_replace(joined, r", , ", ", ")
    return F.regexp_replace(collapsed, r"^(, )+", "")


def garbage_locality_filter(col: Column) -> Column:
    """P2: keep rows whose lowercase locality is not a known garbage value."""
    return ~F.lower(col).isin(list(GARBAGE_LOCALITIES))


def normalize_key(col: Column) -> Column:
    """Deterministic blocking/group key: lower + trim + whitespace collapse (JVM)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
