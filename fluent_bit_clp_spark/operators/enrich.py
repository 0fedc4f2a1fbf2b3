"""Broadcast-join enrichment stage (north_rule: lookup enrich).

The reference's only join-like operation is the per-record log-level map
lookup (`/root/reference/plugins/out_clp_s3_v2/out_clp_s3_v2.go:344-375`);
the north_rule generalizes it to role/tool lookup-table enrichment.  All
three dims are tiny (≤21 rows) → **forced broadcast hash joins**: the fact
side never shuffles, the plan stays a single map stage regardless of input
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fluent_bit_clp_spark.functions import levels as L


def enrich(df: DataFrame, spark: SparkSession, text_col: str = "text") -> DataFrame:
    """level_id (alias map + default-info), role_id/sink_class, tool_id/tool_tag."""
    out = L.with_level(df, spark, text_col)
    roles = F.broadcast(L.role_lookup_table(spark))
    out = out.join(roles, "role", "left")
    tools = F.broadcast(L.tool_lookup_table(spark))
    out = out.join(tools, "tool", "left")
    return out
