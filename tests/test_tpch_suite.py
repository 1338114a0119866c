"""The complete TPC-H suite must stay registered and oracled: all 22
query shapes run through the engine (Q1 lives as ``pricing_summary``,
Q17 as ``small_quantity_revenue``; the rest under ``tpch_qN_*``).
A rename or dropped oracle fails here before the driver notices."""

from __future__ import annotations

from cid_etl_spark.queries import oracle_queries, spark_queries

#: q-number -> registry name
TPCH_ROSTER = {
    1: "pricing_summary",
    2: "tpch_q2_min_cost_supplier",
    3: "tpch_q3_shipping_priority",
    4: "tpch_q4_order_priority",
    5: "tpch_q5_local_supplier_volume",
    6: "tpch_q6_forecast_revenue",
    7: "tpch_q7_nation_volume",
    8: "tpch_q8_market_share",
    9: "tpch_q9_product_profit",
    10: "tpch_q10_returned_items",
    11: "tpch_q11_important_stock",
    12: "tpch_q12_late_shipments",
    13: "tpch_q13_customer_distribution",
    14: "tpch_q14_promo_effect",
    15: "tpch_q15_top_supplier",
    16: "tpch_q16_parts_supplier",
    17: "small_quantity_revenue",
    18: "tpch_q18_large_orders",
    19: "tpch_q19_discounted_revenue",
    20: "tpch_q20_part_promotion",
    21: "tpch_q21_waiting_orders",
    22: "tpch_q22_global_sales",
}


def test_all_22_tpch_shapes_registered_and_oracled():
    q, o = spark_queries(), oracle_queries()
    missing = {n: name for n, name in TPCH_ROSTER.items() if name not in q}
    unoracled = {n: name for n, name in TPCH_ROSTER.items() if name not in o}
    assert not missing, f"TPC-H shapes missing from registry: {missing}"
    assert not unoracled, f"TPC-H shapes without DuckDB oracle: {unoracled}"
    assert len(TPCH_ROSTER) == 22
