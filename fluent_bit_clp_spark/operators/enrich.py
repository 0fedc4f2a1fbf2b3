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


def _literal_lookup(col: str, mapping: dict, default=None) -> F.Column:
    """Constant-folded map literal lookup — no broadcast stage, no exchange;
    stays inside whole-stage codegen."""
    pairs = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    got = F.element_at(F.create_map(*pairs), F.col(col))
    return got if default is None else F.coalesce(got, F.lit(default))


def enrich(
    df: DataFrame,
    spark: SparkSession,
    text_col: str = "text",
    method: str = "literal",
) -> DataFrame:
    """level_id (alias map + default-info), role_id/sink_class, tool_id/tool_tag.

    ``method="literal"`` (default): the three dims are static ≤21-row
    tables, so they fold into map literals — zero broadcast exchanges,
    zero extra stages (measured: each broadcast build costs a serial
    ~0.3-0.5 s stage per action).  ``method="broadcast"``: classic
    broadcast hash joins — use for external/large lookup tables; this is
    the plan shape the oracle query ``p6_level_histogram`` exercises.
    """
    if method == "broadcast":
        out = L.with_level(df, spark, text_col)
        out = out.join(F.broadcast(L.role_lookup_table(spark)), "role", "left")
        out = out.join(F.broadcast(L.tool_lookup_table(spark)), "tool", "left")
        return out
    out = df.withColumn("level_raw", L.extract_level_token(text_col))
    out = out.withColumn(
        "level_id",
        _literal_lookup("level_raw", L.LOG_LEVEL_ALIASES, L.DEFAULT_LEVEL),
    )
    return with_route_lookups(out)


def with_route_lookups(df: DataFrame) -> DataFrame:
    """Only the role/tool dimension lookups (no level regex over ``text``).

    Everything the route key (``operators.route.sink_column``) depends on —
    used standalone by the narrow block-offsets pass, which must not touch
    the wide ``text`` column beyond ``octet_length``.
    """
    out = df.withColumn(
        "role_id", _literal_lookup("role", {r: i for r, i, _ in L.ROLE_LOOKUP})
    ).withColumn(
        "sink_class", _literal_lookup("role", {r: s for r, _, s in L.ROLE_LOOKUP})
    )
    return out.withColumn(
        "tool_id", _literal_lookup("tool", {t: i for t, i, _ in L.TOOL_LOOKUP})
    ).withColumn(
        "tool_tag", _literal_lookup("tool", {t: g for t, _, g in L.TOOL_LOOKUP})
    )
