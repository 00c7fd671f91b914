"""Pure kernels (no Spark dependency in the hot paths): fuzzy string scoring
(scalar + batch-vectorized), text normalization, WKB/ray-cast geometry, and the
hierarchical cell grid. Imported inside Arrow-batched UDFs on executors."""

from . import cells, fuzzy, fuzzy_batch, geo, textnorm

__all__ = ["cells", "fuzzy", "fuzzy_batch", "geo", "textnorm"]
