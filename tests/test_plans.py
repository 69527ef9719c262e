"""Plan-property regression tests: the physical plans the 100 TB design
depends on must not silently degrade (pushdown, broadcast joins,
WindowGroupLimit).  See PERF.md."""

import io
from contextlib import redirect_stdout

import pytest

from dataclass_array_spark.workload import QUERIES

SF = "/root/testdata/sf0.001"


def plan(spark, name):
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name].fn(spark, SF).explain("formatted")
    return buf.getvalue()


def test_q6_filters_pushed(spark):
    p = plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in p and "PushedFilters: []" not in p


def test_star_joins_broadcast(spark):
    for q in ("q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"):
        assert "BroadcastHashJoin" in plan(spark, q), q


def test_topk_window_group_limit(spark):
    assert "WindowGroupLimit" in plan(spark, "topk_orders_per_segment")


def test_scan_column_pruning(spark):
    # q6 touches 4 lineitem columns; the scan must not read all 11
    p = plan(spark, "q6_forecast_revenue")
    rs = [l for l in p.splitlines() if "ReadSchema" in l]
    assert rs and "l_returnflag" not in rs[0] and "l_quantity" in rs[0]
