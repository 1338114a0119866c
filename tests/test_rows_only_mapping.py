"""The rows-only honesty surface (VERDICT r10 #8): every registered
query WITHOUT a DuckDB oracle must map to a driver-green hash-verified
twin via ``ROWS_ONLY_VERIFIED_BY``, and the mapping must stay
structurally sound as the registry evolves — a new rows-only query
without a twin, a twin losing its oracle, or a stale entry naming a
deregistered query all fail here.  Pure registry introspection, no
Spark session.
"""

from __future__ import annotations

from cid_etl_spark.queries import (
    ROWS_ONLY_VERIFIED_BY,
    oracle_queries,
    spark_queries,
)


def test_every_rows_only_query_has_a_twin():
    queries = set(spark_queries())
    oracled = set(oracle_queries())
    rows_only = queries - oracled
    assert rows_only == set(ROWS_ONLY_VERIFIED_BY), (
        "rows-only queries and the verified-by mapping diverged: "
        f"unmapped={sorted(rows_only - set(ROWS_ONLY_VERIFIED_BY))}, "
        f"stale={sorted(set(ROWS_ONLY_VERIFIED_BY) - rows_only)}"
    )


def test_every_twin_is_registered_and_oracled():
    queries = set(spark_queries())
    oracled = set(oracle_queries())
    for rows_only, twin in ROWS_ONLY_VERIFIED_BY.items():
        assert twin in queries, f"{rows_only}: twin {twin} not registered"
        assert twin in oracled, (
            f"{rows_only}: twin {twin} has no DuckDB oracle — it cannot "
            "certify anything"
        )
        assert twin != rows_only


def test_driver_contract_exposes_the_mapping():
    import __spark_entry__ as entry

    assert entry.rows_only_verified_by() == dict(ROWS_ONLY_VERIFIED_BY)
