"""Edge-case differential fixture #4: relational/TPC-H-shaped operators
re-run against DuckDB with hazard rows APPENDED to the sf0.001 tables —
an empty region, a nation with no customers/suppliers, a supplier with no
lineitems, a never-ordered part, a customer with no orders, an order with
no lineitems, and zero-revenue lineitems (price = discount = 0) landing
inside every date window the queries filter on.

These are the classic empty-group / zero-denominator hazards: ratio
queries (promo revenue, market share) divide by window sums that can now
be zero-contribution, correlation sees zero-variance groups, and every
outer-join key has at least one unmatched row in both directions.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pytest

from engine import registry

registry.load_all()

SRC_SF = "/root/testdata/sf0.001"

EDGE_KEYS = [
    "agg_pricing_summary",
    "agg_revenue_by_nation",
    "agg_promo_revenue",
    "agg_market_share",
    "agg_priority_class",
    "agg_volume_shipping",
    "agg_customer_order_dist",
    "agg_global_sales_opp",
    "agg_top_supplier",
    "agg_important_stock",
    "agg_supplier_part_cnt",
    "agg_small_qty_revenue",
    "agg_forecast_revenue",
    "agg_order_priority_check",
    "agg_product_profit",
    "agg_returned_items",
    "agg_large_volume_customer",
    "agg_shipping_priority",
    "agg_stats",
    "agg_corr_regression",
    "join_min_cost_supplier",
    "join_excess_supply",
    "join_waiting_orders",
    "join_star_schema",
    "dq_referential_integrity",
    "dq_accepted_values",
    "cdc_join_ivm",
]


@pytest.fixture(scope="module")
def edge_tpch_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("edge_tpch"))
    for f in os.listdir(SRC_SF):
        shutil.copy(os.path.join(SRC_SF, f), os.path.join(base, f))

    def extend(table, rows, schema):
        src = spark.read.parquet(os.path.join(SRC_SF, f"{table}.parquet"))
        extra = spark.createDataFrame(rows, schema)
        out = src.unionByName(extra.select(src.columns))
        out.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(base, f"{table}.parquet")
        )

    extend("region", [(90, "EMPTYREG")], "r_regionkey long, r_name string")
    extend(
        "nation",
        [(90, "GHOSTLAND", 90)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    extend(
        "supplier",
        [(9000, "Supplier#000009000", 90, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    extend(
        "part",
        [(9000, "ghost widget", "Brand#99", "GHOST TYPE", 1, 0.0)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size long, p_retailprice double",
    )
    extend(
        "customer",
        [(99000, "Customer#000099000", 90, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long, c_acctbal double,"
        " c_mktsegment string",
    )
    extend(
        "orders",
        [
            # order with NO lineitems, zero total, inside common windows
            (990000, 99000, "O", 0.0, datetime(1996, 6, 1), "1-URGENT"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    li = spark.read.parquet(os.path.join(SRC_SF, "lineitem.parquet"))
    first = li.limit(1).collect()[0]
    extend(
        "lineitem",
        [
            # zero-revenue line on an EXISTING order/part/supp, in-window
            (
                int(first.l_orderkey), int(first.l_partkey), int(first.l_suppkey),
                99, 1.0, 0.0, 0.0, 0.0, "N", "O", datetime(1995, 9, 15),
            ),
            # zero-quantity, zero-everything line (range-check violation)
            (
                int(first.l_orderkey), int(first.l_partkey), int(first.l_suppkey),
                98, 0.0, 0.0, 0.0, 0.0, "A", "F", datetime(1996, 6, 2),
            ),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber long,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp_ntz",
    )
    return base


@pytest.mark.parametrize("name", EDGE_KEYS)
def test_edge_tpch_key(spark, edge_tpch_dir, name):
    from tests.oracle import check_key

    check_key(spark, name, edge_tpch_dir)
