"""Golden whole-pipeline test (SURVEY §5.2): a tiny CID-10-shaped
fixture through both entry points, checking the full semantics —
hierarchy joins, range joins, priority dedup, normalization — that the
per-operator oracle queries can't cover end-to-end.
"""

from __future__ import annotations

import csv
import os

import pytest

from cid_etl_spark.plans.cid_pipeline import (
    OUTPUT_COLUMNS,
    run_etl,
    run_etl_from_datasus_dir,
)


def _write_csv(path, header, rows, sep=",", encoding="utf-8"):
    with open(path, "w", newline="", encoding=encoding) as f:
        w = csv.writer(f, delimiter=sep)
        w.writerow(header)
        w.writerows(rows)
    return path


@pytest.fixture()
def combined_fixture(tmp_path):
    d = str(tmp_path)
    files = {
        # mixed case + whitespace exercise normalize_code; A09.9 exists in
        # both sources → priority dedup must keep Estruturada
        "datasus": _write_csv(
            os.path.join(d, "datasus.csv"),
            ["codigo", "descricao"],
            [
                [" a09.9 ", "datasus title for A09.9"],
                ["B15.0", "Hepatite A com coma"],
                ["Z99.9", "no category match"],  # NULL hierarchy + quality count
            ],
        ),
        "chapters": _write_csv(
            os.path.join(d, "chapters.csv"),
            ["chapter_code", "chapter_title"],
            [["A00-B99", "Infecciosas"]],
        ),
        "blocks": _write_csv(
            os.path.join(d, "blocks.csv"),
            ["block_id", "block_title", "chapter_code"],
            [["A00-A09", "Intestinais"], ["B15-B19", "Hepatites"]],
        ),
        "categories": _write_csv(
            os.path.join(d, "categories.csv"),
            ["category_code", "category_title", "block_id", "chapter_code"],
            [
                ["A09", "Diarreia", "A00-A09", "A00-B99"],
                ["B15", "Hepatite A", "B15-B19", "A00-B99"],
            ],
        ),
        "subcategories": _write_csv(
            os.path.join(d, "subcategories.csv"),
            ["subcategory_code", "subcategory_title", "category_code"],
            [["A09.9", "Diarreia nao especificada", "A09"]],
        ),
    }
    return files


def test_run_etl_combined(spark, combined_fixture, tmp_path):
    out_csv = str(tmp_path / "out" / "cid.csv")
    final, metrics = run_etl(
        spark,
        combined_fixture["datasus"],
        combined_fixture["chapters"],
        combined_fixture["blocks"],
        combined_fixture["categories"],
        combined_fixture["subcategories"],
        output_csv=out_csv,
    )
    rows = {r["cid_codigo"]: r.asDict() for r in final.collect()}

    assert list(final.columns) == list(OUTPUT_COLUMNS)
    # unique on code after dedup
    assert len(rows) == final.count() == 3
    # priority dedup: structured wins over DATASUS for A09.9
    assert rows["A09.9"]["fonte"] == "Estruturada"
    assert rows["A09.9"]["titulo"] == "Diarreia nao especificada"
    assert rows["A09.9"]["cid_categoria"] == "A09"
    assert rows["A09.9"]["cid_subcategoria"] == "A09.9"
    assert rows["A09.9"]["bloco_codigo"] == "A00-A09"
    assert rows["A09.9"]["capitulo_codigo"] == "A00-B99"
    # DATASUS-only row enriched through the category map
    assert rows["B15.0"]["fonte"] == "DATASUS"
    assert rows["B15.0"]["bloco_codigo"] == "B15-B19"
    assert rows["B15.0"]["cid_subcategoria"] == "B15.0"
    # no category match → NULL hierarchy, counted by quality metric
    assert rows["Z99.9"]["bloco_codigo"] is None
    assert metrics == {"total": 3, "missing_hierarchy": 1}
    # sink parity: single file with UTF-8 BOM, all-quoted, ';'-separated
    with open(out_csv, "rb") as f:
        head = f.read(64)
    assert head.startswith(b"\xef\xbb\xbf")
    assert b'"cid_codigo";"cid_categoria"' in head


@pytest.fixture()
def datasus_dir_fixture(tmp_path):
    d = str(tmp_path / "official")
    os.makedirs(d)
    # official dialect: ';'-separated latin1, names carry the fragments
    _write_csv(
        os.path.join(d, "CID-10-CAPITULOS.csv"),
        ["CATINIC", "CATFIM", "DESCRICAO"],
        [["A00", "B99", "Cap I Infecciosas"], ["C00", "D48", "Cap II Neoplasias"]],
        sep=";",
        encoding="latin1",
    )
    _write_csv(
        os.path.join(d, "CID-10-GRUPOS.csv"),
        ["CATINIC", "CATFIM", "DESCRICAO"],
        [["A00", "A09", "Intestinais"], ["C00", "C14", "Labio e boca"]],
        sep=";",
        encoding="latin1",
    )
    _write_csv(
        os.path.join(d, "CID-10-CATEGORIAS.csv"),
        ["CAT", "DESCRICAO"],
        [["A09", "Diarreia"], ["C02", "Neoplasia da lingua"]],
        sep=";",
        encoding="latin1",
    )
    _write_csv(
        os.path.join(d, "CID-10-SUBCATEGORIAS.csv"),
        ["SUBCAT", "DESCRICAO"],
        # one 4-char code and one with blank 4th char (format_subcat branches)
        [["A099", "Diarreia nao especificada"], ["C02 ", "Lingua SOE"]],
        sep=";",
        encoding="latin1",
    )
    return d


def test_run_etl_from_datasus_dir(spark, datasus_dir_fixture):
    """Strict reference parity (default): the flat list is the
    structured output itself (etl_cid10.py:350-353), so the union/dedup
    adds NO new codes — the output is exactly the structured branch's
    codes, every row fonte='Estruturada'."""
    final, metrics = run_etl_from_datasus_dir(spark, datasus_dir_fixture)
    rows = {r["cid_codigo"]: r.asDict() for r in final.collect()}

    # structured codes only: A09.9 (dotted) and C02 ('C02 ' → bare);
    # bare category A09 does NOT appear (the reference's output never
    # contains undivided-category rows)
    assert set(rows) == {"A09.9", "C02"}
    # range join attached the right block/chapter to A09.9
    assert rows["A09.9"]["bloco_codigo"] == "A00-A09"
    assert rows["A09.9"]["capitulo_codigo"] == "A00-B99"
    assert rows["C02"]["bloco_codigo"] == "C00-C14"
    assert rows["C02"]["capitulo_codigo"] == "C00-D48"
    # every code collides with its DATASUS re-derivation; Estruturada wins
    assert {r["fonte"] for r in rows.values()} == {"Estruturada"}
    assert metrics["total"] == 2
    assert metrics["missing_hierarchy"] == 0


def test_run_etl_from_datasus_dir_bare_categories_extension(
    spark, datasus_dir_fixture
):
    """The documented extension: include_bare_categories=True adds
    category-grain rows (e.g. undivided A09) the reference's
    official-mode output would not contain."""
    final, metrics = run_etl_from_datasus_dir(
        spark, datasus_dir_fixture, include_bare_categories=True
    )
    rows = {r["cid_codigo"]: r.asDict() for r in final.collect()}

    # A09.9 and C02 from subcats; A09 + C02 from categories → C02 dedups
    assert set(rows) == {"A09.9", "C02", "A09"}
    assert rows["A09"]["bloco_codigo"] == "A00-A09"
    assert rows["A09"]["fonte"] == "DATASUS"
    # structured branch still wins the C02 collision
    assert rows["C02"]["fonte"] == "Estruturada"
    assert metrics["total"] == 3
    assert metrics["missing_hierarchy"] == 0


def test_cli_combined_mode(spark, combined_fixture, tmp_path, capsys):
    from cid_etl_spark.cli import main

    out_csv = str(tmp_path / "cli_out.csv")
    got = main(
        [
            "--datasus", combined_fixture["datasus"],
            "--chapters", combined_fixture["chapters"],
            "--blocks", combined_fixture["blocks"],
            "--categories", combined_fixture["categories"],
            "--subcategories", combined_fixture["subcategories"],
            "--out", out_csv,
        ]
    )
    assert got == out_csv
    assert os.path.exists(out_csv)
    printed = capsys.readouterr().out
    assert "total codes:" in printed and "exported:" in printed


def test_cli_insufficient_params(spark):
    import pytest

    from cid_etl_spark.cli import main

    with pytest.raises(SystemExit, match="Insufficient"):
        main(["--datasus", "/nope.csv"])


def test_cli_run_query_mode(spark, capsys):
    from cid_etl_spark.cli import main

    got = main(
        ["--run-query", "listagg_nations", "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert got == "listagg_nations"
    out = capsys.readouterr().out
    assert "r_name" in out and "n_nations" in out


def test_cli_run_query_unknown_name(spark):
    import pytest as _pytest

    from cid_etl_spark.cli import main

    with _pytest.raises(SystemExit, match="unknown query"):
        main(["--run-query", "no_such_query"])
