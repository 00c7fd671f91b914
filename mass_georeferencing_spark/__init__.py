"""mass-georeferencing-spark: a from-scratch PySpark-native spatial-join + tiling engine.

Reimplements the query semantics of Smithsonian/Mass-Georeferencing (reference at
/root/reference, analyzed in SURVEY.md) as an idiomatic Spark dataflow:

- fuzzy locality-string candidate matching (indel/partial/token-set ratios over
  stopword-stripped, ASCII-folded text; reference: batch_georeferencing/functions.py:258-309)
- gazetteer layer normalization + unions (reference: batch_georeferencing/queries.py)
- cell-indexed spatial joins: point-in-polygon, kNN via cell-ring expansion,
  distance-banded range scoring, raster<->vector zonal lookup
  (reference: batch_georeferencing/functions.py:16-230)
- score aggregation, top-k ranking, threshold pruning
  (reference: batch_georeferencing/functions.py:292-346)
- training-data-pipeline extensions: dedup (exact/minhash-LSH/simhash/ngram-jaccard),
  ANN similarity search, text quality/language-id, multimodal binary-column plumbing.

All hot paths are built-in pyspark.sql.functions (JVM, whole-stage codegen) or
vectorized pandas/Arrow UDFs; no per-row Python anywhere.
"""

__version__ = "0.1.0"
