"""ZonalStatistics (class AGG) — join + grouped aggregation.

Reference: /root/reference/whitebox-tools-app/src/tools/math_stat_analysis/
zonal_statistics.rs:391-464 — per integer zone: n, total, mean, min, max,
range, *sample* standard deviation (n-1, :425-443; n=1 left at 0,
:448-450), and median = lower-middle for odd counts / average of the two
middles for even counts over the sorted values (:447-464). NoData excluded.

Spark plan: single hash aggregate (partial + final, map-side combine free
from Catalyst); exact median via F.percentile(0.5), which interpolates the
two middles — identical to the reference's rule. One shuffle on zone_id,
unavoidable and minimal; skewed giant zones are absorbed by partial
aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zonal_statistics(
    cells: DataFrame,
    *,
    zone: str = "zone_id",
    value: str = "value",
    nodata: float | None = None,
) -> DataFrame:
    """-> DataFrame(zone_id, n, total, mean_v, min_v, max_v, range_v, sd, median)."""
    v = F.col(value)
    df = cells.filter(v.isNotNull())
    if nodata is not None:
        df = df.filter(v != F.lit(nodata))
    return df.groupBy(F.col(zone).alias("zone_id")).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("total"),
        F.avg(v).alias("mean_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        (F.max(v) - F.min(v)).alias("range_v"),
        F.coalesce(F.stddev_samp(v), F.lit(0.0)).alias("sd"),
        F.percentile(v, F.lit(0.5)).alias("median"),
    )


def zonal_statistics_oracle_sql(source_sql: str, zone: str, value: str) -> str:
    """DuckDB mirror: quantile_cont interpolates like F.percentile."""
    return f"""
SELECT {zone} AS zone_id,
       count({value}) AS n,
       sum({value}) AS total,
       avg({value}) AS mean_v,
       min({value}) AS min_v,
       max({value}) AS max_v,
       max({value}) - min({value}) AS range_v,
       coalesce(stddev_samp({value}), 0.0) AS sd,
       quantile_cont({value}, 0.5) AS median
FROM ({source_sql})
WHERE {value} IS NOT NULL
GROUP BY 1
"""
