"""CLI dispatcher — parity with the reference's ``main``
(etl_cid10.py:374-404): same flag surface, same two modes, same
"insufficient parameters" failure for a partial combined-mode spec.

Run as ``python -m cid_etl_spark.cli --datasus_dir DIR --out out.csv``
or with the five combined-mode paths.  The session comes from the
package factory; on a cluster, spark-submit supplies the master and
these flags stay identical.
"""

from __future__ import annotations

import argparse
from collections.abc import Sequence


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="cid-etl-spark",
        description="CID-10 ETL: consolidates DATASUS and structured WHO sources",
    )
    parser.add_argument("--datasus", help="flat DATASUS CSV (codigo;descricao)")
    parser.add_argument("--chapters", help="chapters.csv (structured source)")
    parser.add_argument("--blocks", help="blocks.csv (structured source)")
    parser.add_argument("--categories", help="categories.csv (structured source)")
    parser.add_argument("--subcategories", help="subcategories.csv (structured source)")
    parser.add_argument(
        "--datasus_dir",
        help="directory with the official DataSUS CSVs "
        "(CAPITULOS/GRUPOS/CATEGORIAS/SUBCATEGORIAS)",
    )
    parser.add_argument(
        "--include-bare-categories",
        action="store_true",
        help="official mode only: also emit category-grain rows (an "
        "extension beyond the reference, whose official-mode output "
        "contains subcategory codes only)",
    )
    parser.add_argument("--out", default="cid10_consolidado.csv", help="output CSV path")
    parser.add_argument(
        "--run-query",
        metavar="NAME",
        help="run a registered engine query by name instead of the CID "
        "pipeline (see cid_etl_spark.queries); prints --show rows",
    )
    parser.add_argument(
        "--sf-dir",
        default="/root/testdata/sf0.01",
        help="fixture/table directory for --run-query",
    )
    parser.add_argument(
        "--show", type=int, default=20, help="rows to print for --run-query"
    )
    return parser


def main(argv: Sequence[str] | None = None) -> str:
    """Dispatch on ``--datasus_dir`` exactly like the reference
    (etl_cid10.py:386-395); returns the output path."""
    args = build_parser().parse_args(argv)

    from cid_etl_spark.plans.cid_pipeline import run_etl, run_etl_from_datasus_dir
    from cid_etl_spark.session import get_spark

    spark = get_spark("cid-etl-cli")
    if args.run_query:
        from cid_etl_spark.queries import spark_queries

        queries = spark_queries()
        if args.run_query not in queries:
            raise SystemExit(
                f"unknown query {args.run_query!r}; available: "
                + ", ".join(sorted(queries))
            )
        df = queries[args.run_query](spark, args.sf_dir)
        df.show(args.show, truncate=False)
        return args.run_query
    if args.datasus_dir:
        _, metrics = run_etl_from_datasus_dir(
            spark,
            args.datasus_dir,
            output_csv=args.out,
            include_bare_categories=args.include_bare_categories,
        )
    else:
        required = [
            args.datasus,
            args.chapters,
            args.blocks,
            args.categories,
            args.subcategories,
        ]
        if not all(required):
            raise SystemExit(
                "Insufficient parameters: pass --datasus_dir OR all of "
                "--datasus/--chapters/--blocks/--categories/--subcategories"
            )
        _, metrics = run_etl(
            spark,
            args.datasus,
            args.chapters,
            args.blocks,
            args.categories,
            args.subcategories,
            output_csv=args.out,
        )
    print(
        f"total codes: {metrics['total']}; "
        f"missing hierarchy: {metrics.get('missing_hierarchy', 0)}"
    )
    print(f"exported: {args.out}")
    return args.out


if __name__ == "__main__":
    main()
