"""Ingest adapters: report CSV (junk header/footer, ';' sep, ',' decimals,
Latin-1), carve-between, JSON flatten, Excel stub."""

from __future__ import annotations

import os

import pytest

from etl_spark.sources import (
    carve_between,
    flatten_struct,
    read_json_records,
    read_report_csv,
    read_excel_sheets,
)

REPORT = (
    "Relatório de Produção\n"
    "Período: 2024-01\n"
    "\n"
    "municipio;quantidade;valor\n"
    "São Paulo;10;1.234,56\n"
    "Rio;20;99,10\n"
    "Fonte: SISAB\n"
)


def test_read_report_csv(spark, tmp_root):
    path = os.path.join(tmp_root, "rel.csv")
    with open(path, "w", encoding="ISO-8859-1") as fh:
        fh.write(REPORT)
    df = read_report_csv(
        spark, path, sep=";", encoding="ISO-8859-1",
        decimal_comma_cols=["valor"], skip_leading=2, footer_prefix="Fonte:",
    )
    rows = {r["municipio"]: (r["quantidade"], r["valor"]) for r in df.collect()}
    assert rows == {"São Paulo": ("10", 1234.56), "Rio": ("20", 99.10)}


def test_report_csv_wider_than_default_raises_then_roundtrips(spark, tmp_root):
    """>64-column report (the reference's variable-width SISAB production
    reports, sisab/producao.py:1016-1045): the default scan must FAIL
    LOUDLY (silent truncation corrupts rename-map ingests); a larger
    max_width round-trips every column."""
    from etl_spark.sources.adapters import ReportWidthOverflow

    n_cols = 70
    header = ";".join(f"col{i}" for i in range(n_cols))
    row = ";".join(str(i * 10) for i in range(n_cols))
    path = os.path.join(tmp_root, "wide.csv")
    with open(path, "w") as fh:
        fh.write(f"Banner junk\n{header}\n{row}\n")

    with pytest.raises(ReportWidthOverflow):
        read_report_csv(spark, path, sep=";", skip_leading=1)

    df = read_report_csv(spark, path, sep=";", skip_leading=1, max_width=128)
    assert df.columns == [f"col{i}" for i in range(n_cols)]
    got = df.collect()[0]
    assert got["col0"] == "0" and got["col69"] == "690"


def test_converted_sheet_wider_than_default_raises_then_roundtrips(spark, tmp_root):
    from etl_spark.sources.adapters import (
        ReportWidthOverflow, read_converted_sheet_csv,
    )

    n_cols = 80
    header = ",".join(f"H{i}" for i in range(n_cols))
    row = ",".join(f"v{i}" for i in range(n_cols))
    path = os.path.join(tmp_root, "wide_sheet.csv")
    with open(path, "w") as fh:
        # banner rows carry separators (a converted sheet keeps its grid);
        # fully-blank lines would be skipped by the CSV parser
        fh.write(f"Title,,,\nCompetência: 2024-01,,,\n,,,\n{header}\n{row}\n")

    with pytest.raises(ReportWidthOverflow):
        read_converted_sheet_csv(spark, path, header_row=3)

    df = read_converted_sheet_csv(spark, path, header_row=3, max_width=96)
    assert df.columns == [f"H{i}" for i in range(n_cols)]
    assert df.collect()[0]["H79"] == "v79"


def test_carve_between():
    page = "junk\n\n\n\nmunicipio;q\nX;1\n\n\nFonte: SISAB"
    body = carve_between(page, "\n\n\n", "\n\n\nFonte:")
    assert body == "municipio;q\nX;1"


def test_read_json_flatten(spark, tmp_root):
    path = os.path.join(tmp_root, "recs.json")
    with open(path, "w") as fh:
        fh.write('[{"id": 1, "endereco": {"cep": "01001", "uf": {"sigla": "SP"}}},'
                 '{"id": 2, "endereco": {"cep": null, "uf": {"sigla": "RJ"}}}]')
    df = read_json_records(spark, path)
    assert set(df.columns) == {"id", "endereco_cep", "endereco_uf_sigla"}
    got = {r["id"]: (r["endereco_cep"], r["endereco_uf_sigla"]) for r in df.collect()}
    assert got == {1: ("01001", "SP"), 2: (None, "RJ")}


def test_excel_stub(spark):
    with pytest.raises(NotImplementedError):
        read_excel_sheets(spark, "/nonexistent.xlsx", ["Sheet1"])


def test_pandas_style_headers():
    from etl_spark.sources.adapters import pandas_style_headers

    got = pandas_style_headers(
        ["Cod", "AJUSTE*", None, "AJUSTE*", "", "Valor Total do Custeio"]
    )
    assert got == ["Cod", "AJUSTE*", "Unnamed: 2", "AJUSTE*.1", "Unnamed: 4",
                   "Valor Total do Custeio"]
    # a literal 'X.1' header must not collide with the mangled duplicate,
    # in either order (both verified against pandas 2.2.2 read_csv)
    assert pandas_style_headers(["A", "A.1", "A"]) == ["A", "A.1", "A.2"]
    assert pandas_style_headers(["A", "A", "A.1"]) == ["A", "A.2", "A.1"]


def test_read_converted_sheet_csv(spark, tmp_root):
    """e-Gestor sheet semantics under CSV conversion (the xlsx reader is
    env-gated): header at row 3, duplicate 'AJUSTE*' and blank headers
    mangled pandas-style, then resolved by the per-sheet rename map —
    reference egestor/relatorio_financiamento/tratamento.py:491-565."""
    from etl_spark.sources.adapters import read_converted_sheet_csv

    sheet = (
        "RELATÓRIO DE PAGAMENTOS,,,\n"
        "Competência: 2024-01,,,\n"
        ",,,\n"
        "UF,AJUSTE*,AJUSTE*,\n"
        "SP,10,20,\n"
        "RJ,1,2,3\n"
    )
    path = os.path.join(tmp_root, "acoes_sb.csv")
    with open(path, "w") as fh:
        fh.write(sheet)
    df = read_converted_sheet_csv(
        spark, path, header_row=3,
        sheet_renames={
            "AJUSTE*": "pagamento_esb_adicional",
            "AJUSTE*.1": "pagamento_adicional_uom",
            "Unnamed: 3": "pagamento_desconto",
        },
    )
    assert df.columns == ["UF", "pagamento_esb_adicional",
                          "pagamento_adicional_uom", "pagamento_desconto"]
    got = {r["UF"]: (r["pagamento_esb_adicional"], r["pagamento_adicional_uom"],
                     r["pagamento_desconto"]) for r in df.collect()}
    # SP's blank 4th cell must not truncate the 'Unnamed: 3' column away —
    # RJ's value under the blank header survives
    assert got == {"SP": ("10", "20", None), "RJ": ("1", "2", "3")}


def test_with_retries_recovers_and_propagates():
    from etl_spark.sources.retry import retrying, with_retries

    calls = {"n": 0}
    sleeps: list[float] = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient listing miss")
        return "landed"

    assert with_retries(flaky, attempts=4, base_delay=0.1,
                        sleep=sleeps.append) == "landed"
    assert calls["n"] == 3
    assert sleeps == [0.1, 0.2]  # exponential backoff between tries

    # exhausted attempts re-raise the last error
    calls["n"] = -10
    with pytest.raises(OSError):
        with_retries(flaky, attempts=2, base_delay=0, sleep=lambda s: None)

    # non-retryable errors propagate immediately
    boom = {"n": 0}

    def parse_error():
        boom["n"] += 1
        raise ValueError("bad payload")

    with pytest.raises(ValueError):
        with_retries(parse_error, attempts=5, sleep=lambda s: None)
    assert boom["n"] == 1

    @retrying(attempts=3, base_delay=0, sleep=lambda s: None)
    def decorated(x):
        return x * 2

    assert decorated(21) == 42
