"""Default schema over the driver test tables (TESTDATA.md).

Maps the TPC-H-ish star schema into yupana-style time-series tables, the way
yupana-schema/.../Tables.scala:31-115 declares its domain tables:

- ``lineitem`` ≙ items_kkm (item-position-level facts; time = l_shipdate)
- ``orders``   ≙ receipt   (receipt-level facts;     time = o_orderdate)
- ``events``   ≙ a generic ingest table              (time = ts)
- ``documents`` / ``embeddings`` — LLM-pipeline tables (not time series; the
  datapipe operators read them directly)

Small tables (customer/part/supplier/nation/region) are exposed as
ExternalLinks — yupana's replacement for joins (ExternalLink.scala:25-48) —
and compile to broadcast joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import types as yt
from .schema import Dimension, ExternalLink, LinkField, Metric, Schema, Table


def _parquet(name: str):
    def load(spark: SparkSession, sf_dir: str) -> DataFrame:
        # memoized base read: link sources are re-read by every enrichment
        # query; the listing/footer round trip dominates small-query latency
        from .schema import cached_parquet

        return cached_parquet(spark, f"{sf_dir}/{name}.parquet")

    return load


CUSTOMER_LINK = ExternalLink(
    name="CustomerLink",
    dimension="o_custkey",
    key_column="c_custkey",
    fields=(
        LinkField("c_name", yt.STRING),
        LinkField("c_nationkey", yt.INT),
        LinkField("c_acctbal", yt.DOUBLE),
        LinkField("c_mktsegment", yt.STRING),
    ),
    source=_parquet("customer"),
)

PART_LINK = ExternalLink(
    name="PartLink",
    dimension="l_partkey",
    key_column="p_partkey",
    fields=(
        LinkField("p_name", yt.STRING),
        LinkField("p_brand", yt.STRING),
        LinkField("p_type", yt.STRING),
        LinkField("p_size", yt.INT),
        LinkField("p_retailprice", yt.DOUBLE),
    ),
    source=_parquet("part"),
)

SUPPLIER_LINK = ExternalLink(
    name="SupplierLink",
    dimension="l_suppkey",
    key_column="s_suppkey",
    fields=(
        LinkField("s_name", yt.STRING),
        LinkField("s_nationkey", yt.INT),
        LinkField("s_acctbal", yt.DOUBLE),
    ),
    source=_parquet("supplier"),
)


ORDERS_LINK = ExternalLink(
    name="OrdersLink",
    dimension="l_orderkey",
    key_column="o_orderkey",
    fields=(
        LinkField("o_orderstatus", yt.STRING),
        LinkField("o_orderpriority", yt.STRING),
        LinkField("o_totalprice", yt.DOUBLE),
    ),
    source=_parquet("orders"),
)

ITEMS_INVERTED_INDEX = ExternalLink(
    name="ItemsInvertedIndex",
    dimension="l_partkey",
    key_column="p_partkey",
    fields=(LinkField("phrase", yt.STRING),),
    source=_parquet("part"),
    match_mode="index",
    text_column="p_name",
)

RELATED_ITEMS = ExternalLink(
    name="RelatedItemsCatalog",
    dimension="l_partkey",
    key_column="p_partkey",
    fields=(LinkField("phrase", yt.STRING),),
    source=_parquet("part"),
    match_mode="related",
    text_column="p_name",
    related_key="l_orderkey",
)

LINEITEM = Table(
    name="lineitem",
    time_column="l_shipdate",
    dimensions=(
        Dimension("l_orderkey", yt.LONG),
        Dimension("l_partkey", yt.LONG),
        Dimension("l_suppkey", yt.LONG),
        Dimension("l_linenumber", yt.INT),
        Dimension("l_returnflag", yt.STRING, kind="dictionary"),
        Dimension("l_linestatus", yt.STRING, kind="dictionary"),
    ),
    metrics=(
        Metric("l_quantity", yt.DOUBLE),
        Metric("l_extendedprice", yt.DOUBLE),
        Metric("l_discount", yt.DOUBLE),
        Metric("l_tax", yt.DOUBLE),
    ),
    external_links=(PART_LINK, SUPPLIER_LINK, ORDERS_LINK,
                    ITEMS_INVERTED_INDEX, RELATED_ITEMS),
)

ORDERS = Table(
    name="orders",
    time_column="o_orderdate",
    dimensions=(
        Dimension("o_orderkey", yt.LONG),
        Dimension("o_custkey", yt.LONG),
        Dimension("o_orderstatus", yt.STRING, kind="dictionary"),
        Dimension("o_orderpriority", yt.STRING, kind="dictionary"),
    ),
    metrics=(Metric("o_totalprice", yt.DOUBLE),),
    external_links=(CUSTOMER_LINK,),
)

EVENTS = Table(
    name="events",
    time_column="ts",
    dimensions=(
        Dimension("user_id", yt.LONG),
        Dimension("event_type", yt.STRING, kind="dictionary"),
    ),
    metrics=(
        Metric("event_id", yt.LONG),
        Metric("value", yt.DOUBLE),
        Metric("props", yt.STRING),
    ),
)


def default_schema() -> Schema:
    return Schema().add(LINEITEM).add(ORDERS).add(EVENTS)


def standard_rollups():
    """Shipped rollup set ≙ ReceiptRollups.scala:26-56 (receipt_by_day/
    week/month) + ItemRollups (item_kkms_by_month), re-expressed over the
    fixture fact tables."""
    from . import expressions as E
    from . import types as yt
    from .operators.rollup import Rollup

    def dec(col):
        return E.Cast(E.Field(col, yt.DOUBLE), yt.decimal(18, 4))

    by = []
    for unit in ("day", "week", "month"):
        by.append(Rollup(
            name=f"orders_by_{unit}",
            from_table="orders",
            to_table=f"orders_by_{unit}",
            time_trunc=unit,
            group_by=("o_orderstatus",),
            aggregates=(
                (E.sum_(dec("o_totalprice")), "total_sum"),
                (E.count(E.Field("o_orderkey", yt.LONG)), "orders_count"),
            ),
        ))
    by.append(Rollup(
        name="item_orders_by_month",
        from_table="lineitem",
        to_table="item_orders_by_month",
        time_trunc="month",
        group_by=("l_partkey",),
        aggregates=(
            (E.sum_(dec("l_quantity")), "quantity_sum"),
            (E.count(E.Field("l_orderkey", yt.LONG)), "row_count"),
        ),
    ))
    return by
