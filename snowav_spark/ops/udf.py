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
3. ``udtf`` (Spark 4) — Python table functions for row→rows expansion
   whose output shape built-in generators can't express.  Registered
   UDTFs compose with ``LATERAL`` so each input row drives its own
   expansion (``BandLegendUDTF`` below).  Per-row Python, NOT
   Arrow-batched — prefer ``explode``/``transform``/``sequence`` when
   they fit (every contract generator does); this is the escape hatch
   for genuinely procedural expansions.

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


try:  # Spark 4 Python UDTF — absent on older runtimes
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="band int, lo double, hi double")
    class BandLegendUDTF:
        """Worked UDTF example: expand one run's elevation band edges
        into (band, lo, hi) legend rows — the reference's per-run band
        legend (SURVEY §1.3) as a table function.  Each input row emits
        its own variable-length expansion, so with LATERAL every run
        carries its own edge list:

            spark.udtf.register("band_legend", BandLegendUDTF)
            SELECT r.run_id, b.* FROM runs r,
                   LATERAL band_legend(r.edges) b
        """

        def eval(self, edges):  # noqa: D102 — contract set by @udtf
            if edges is None:
                return
            for i in range(len(edges) - 1):
                yield i, float(edges[i]), float(edges[i + 1])

    HAS_UDTF = True
except ImportError:  # pragma: no cover
    BandLegendUDTF = None
    HAS_UDTF = False


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
