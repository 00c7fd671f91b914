from .tables import TABLES, load_table, register_views
from .synthetic import (
    pages_df,
    mentions_df,
    gazetteer_df,
    aoi_df,
    elevation_grid_df,
    PAGES_CTE,
    MENTIONS_CTE,
    GAZETTEER_CTE,
    AOI_CTE,
    ELEV_CTE,
    with_ctes,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "pages_df",
    "mentions_df",
    "gazetteer_df",
    "aoi_df",
    "elevation_grid_df",
    "PAGES_CTE",
    "MENTIONS_CTE",
    "GAZETTEER_CTE",
    "AOI_CTE",
    "ELEV_CTE",
    "with_ctes",
]
