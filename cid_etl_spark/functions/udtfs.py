"""Python UDTFs (user-defined TABLE functions) — SURVEY §2.9.

The reference's only "UDF surface" is row-wise ``Series.apply`` of
scalar Python functions (etl_cid10.py:78-80,127-129,261); scalar
parity lives in functions/strings.py as pure Column expressions.  This
module covers the TABLE-function side of §2.9 with Spark 4's native
Python UDTF API: one input row → many output rows, usable from both
the DataFrame API and ``LATERAL`` SQL.

UDTFs run in the Python worker (Arrow-batched input), so they are the
slow path by design — use them for genuinely row-expanding logic that
has no ``explode(expr)`` form (here: parsing an arbitrary JSON object
whose keys are unknown at plan time).  At scale the cost is linear in
input rows and fully partition-parallel: no shuffle is introduced by
the UDTF itself.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="prop_key string, prop_value string")
class FlattenJsonProps:
    """Flatten one JSON-object string into ``(key, value)`` rows.

    Value rendering matches DuckDB ``json_extract_string``: strings
    unquoted, numbers/booleans/null in their JSON literal form, nested
    objects/arrays as compact JSON.  Malformed or non-object input
    yields no rows (the quarantine pattern — never poison the batch).
    """

    def eval(self, props: str):  # noqa: ANN001 - UDTF signature
        if props is None:
            return
        try:
            obj = json.loads(props)
        except (ValueError, TypeError):
            return
        if not isinstance(obj, dict):
            return
        for k, v in obj.items():
            if isinstance(v, str):
                out = v
            elif v is None:
                out = None
            elif isinstance(v, bool):
                out = "true" if v else "false"
            else:
                out = json.dumps(v, separators=(",", ":"))
            yield k, out


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL use (``LATERAL flatten_json_props(col)``)."""
    spark.udtf.register("flatten_json_props", FlattenJsonProps)
