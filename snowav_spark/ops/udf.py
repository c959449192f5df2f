"""UDF extension points (SURVEY.md §2.8): where users plug custom numpy
grid math into the engine.

The engine's own operators never need Python (everything in the contract
is built-in expressions); these are the sanctioned escape hatches, in
preference order:

1. ``pandas_udf`` — vectorized scalar math over Arrow batches.  The
   direct analog of the reference's whole-grid numpy expressions
   (ref:snowav/framework/process.py cold-content masking etc.): the numpy
   code is unchanged, Spark streams column batches through it.  ~10–100×
   row-at-a-time Python UDFs; still slower than built-ins — use only for
   math Catalyst can't express.
2. ``applyInPandas`` — grouped-map over one group's rows as a pandas
   frame.  The analog of the reference's per-basin masked step: group by
   basin, get the basin's pixels as a frame, run arbitrary numpy.  The
   group must fit in executor memory — group by (basin, date), never by
   basin alone, at raster scale.

Both run as Arrow transfers (engine conf enables Arrow); neither
participates in oracle grading (SURVEY §2.8: UDF outputs are not
SQL-replicable in general).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructType

# Default cold-content threshold (W·h/m²) below which SWE is 'unavailable'
# — a parameter in the reference too (SURVEY §1.3 [L]).
COLD_CONTENT_THRESHOLD = -5.0


@F.pandas_udf(DoubleType())
def available_swe(swe_mm: pd.Series, coldcont: pd.Series) -> pd.Series:
    """Vectorized cold-content masking: SWE counts as 'available' only
    where cold content exceeds the threshold (ref:process.py semantics).
    Example pandas_udf — plain numpy-on-Series, Arrow-batched."""
    return swe_mm.where(coldcont >= COLD_CONTENT_THRESHOLD, 0.0)


def per_group_apply(
    df: DataFrame,
    group_cols: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: StructType | str,
) -> DataFrame:
    """Grouped-map escape hatch: run ``fn`` over each group's rows as a
    pandas frame (the reference's per-basin numpy step).

    Scale contract: one group must fit in executor memory — include the
    date (or another splitter) in ``group_cols`` for raster data."""
    return df.groupBy(*group_cols).applyInPandas(fn, schema)


def basin_percentile_summary(df: DataFrame) -> DataFrame:
    """Worked example of per_group_apply: per-(basin, date) numpy quantile
    summary of pixel values — the shape of the reference's tablizer-style
    input summaries, with the numpy untouched."""

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        v = pdf["value"].to_numpy()
        return pd.DataFrame(
            {
                "basin_id": [pdf["basin_id"].iloc[0]],
                "date": [pdf["date"].iloc[0]],
                "p25": [float(np.quantile(v, 0.25))],
                "p50": [float(np.quantile(v, 0.50))],
                "p75": [float(np.quantile(v, 0.75))],
                "n_px": [int(len(v))],
            }
        )

    return per_group_apply(
        df,
        ["basin_id", "date"],
        summarize,
        "basin_id string, date date, p25 double, p50 double, p75 double, n_px long",
    )
