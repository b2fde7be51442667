"""Landed-file ingest adapters (SURVEY.md §2.1 long tail).

The reference scrapes live endpoints (SISAB Selenium forms, CNES REST,
e-Gestor Excel) and then parses what it downloaded. The scraping is a
non-goal (driver mandate: no external data); these adapters reproduce the
*parsing* capabilities over landed files:

- semicolon-separated, comma-decimal, Latin-1 report CSV with junk
  header/footer lines (sisab/comum.py:398-438,
  modelo_sisab_producao.py:47-66: CSV carved between blank-line markers);
- REST JSON record lists with nested payloads flattened to columns
  (scnes/extracao_lista_cnes.py:18-71, brasilapi/cep.py:97-107);
- multi-sheet Excel (egestor/relatorio_financiamento/extracao.py:130-259)
  — STUBBED: no xlsx library ships in this environment; the function
  raises ``NotImplementedError`` unless openpyxl is importable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = [
    "carve_between", "read_report_csv", "read_json_records",
    "flatten_struct", "read_excel_sheets", "pandas_style_headers",
    "read_converted_sheet_csv", "ReportWidthOverflow",
]


class ReportWidthOverflow(ValueError):
    """A report carries more columns than ``max_width`` — raised instead of
    silently truncating (the reference's SISAB production reports have
    variable column sets, sisab/producao.py:1016-1045; a rename-map-driven
    ingest of a silently-truncated frame would corrupt downstream).
    Re-read with a larger ``max_width``."""


def _check_width_overflow(raw, max_width: int, path: str) -> None:
    """The wide scan schema carries one SENTINEL column past ``max_width``;
    any non-null cell there means the file is wider than the scan — fail
    loudly (one combinable filter+limit job)."""
    sentinel = f"_c{max_width}"
    if raw.filter(F.col(sentinel).isNotNull()).limit(1).count():
        raise ReportWidthOverflow(
            f"{path}: report has more than max_width={max_width} columns; "
            f"pass a larger max_width (silent truncation would corrupt a "
            f"rename-map-driven ingest)"
        )


def carve_between(text: str, start_marker: str, end_marker: str) -> str:
    """Cut the CSV body out of a scraped page payload (driver-side,
    control-plane-sized — the reference carves between '\\n\\n\\n' and
    '\\n\\n\\nFonte:')."""
    lo = text.index(start_marker) + len(start_marker)
    hi = text.index(end_marker, lo)
    return text[lo:hi].strip("\n")


def read_report_csv(
    spark: SparkSession,
    path: str,
    sep: str = ";",
    encoding: str = "ISO-8859-1",
    decimal_comma_cols: list[str] | None = None,
    skip_leading: int = 0,
    footer_prefix: str | None = None,
    header: bool = True,
    schema: StructType | str | None = None,
    max_width: int = 64,
) -> DataFrame:
    """Report-CSV scan: separator/encoding knobs, leading-junk skip,
    footer strip by prefix, and comma-decimal conversion — all as
    declarative ops so Catalyst still prunes/pushes down.

    ``skip_leading`` drops the first N *parsed* rows (blank lines are
    already skipped by the CSV reader — count only junk rows with content);
    ``footer_prefix`` drops trailer lines like 'Fonte:'. ``max_width``
    bounds the wide scan the skip-leading path uses; a wider report raises
    :class:`ReportWidthOverflow` instead of silently truncating.
    """
    if skip_leading:
        # Spark CSV has no skipRows: read the file as an over-wide
        # all-string table (junk lines parse as mostly-NULL rows), index
        # rows, drop the junk prefix, then promote the first surviving row
        # to the header. Valid for single-file reports (the reference's
        # case: one scraped download at a time) — monotonically_increasing_
        # id is file-ordered within one input partition.
        from pyspark.sql.types import StringType, StructField as SF, StructType as ST

        # +1 sentinel column past max_width: detects (instead of dropping)
        # a report wider than the scan
        wide = ST([SF(f"_c{i}", StringType(), True) for i in range(max_width + 1)])
        raw = (
            spark.read.options(sep=sep, encoding=encoding, header="false",
                               mode="PERMISSIVE")
            .schema(wide).csv(path)
            # single frozen partition => _rid is a stable file-order row
            # number across the header collect and the body scan
            .coalesce(1)
            .withColumn("_rid", F.monotonically_increasing_id())
            .filter(F.col("_rid") >= skip_leading)
            .localCheckpoint(eager=True)
        )
        _check_width_overflow(raw, max_width, path)
        raw = raw.drop(f"_c{max_width}")
        if header:
            hdr = raw.orderBy("_rid").limit(1).collect()[0]
            names = [(f"_c{i}", hdr[f"_c{i}"]) for i in range(max_width)
                     if hdr[f"_c{i}"] is not None]
            raw = raw.filter(F.col("_rid") > hdr["_rid"])
            df = raw.select(*[F.col(c).alias(n) for c, n in names])
        else:
            df = raw.drop("_rid")
    else:
        reader = spark.read.options(sep=sep, encoding=encoding,
                                    header=str(header).lower())
        if schema is not None:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "false")
        df = reader.csv(path)
    if footer_prefix is not None:
        first = df.columns[0]
        df = df.filter(
            ~F.coalesce(F.col(first).cast("string"), F.lit("")).startswith(footer_prefix)
        )
    for c in decimal_comma_cols or []:
        df = df.withColumn(
            c,
            F.regexp_replace(F.regexp_replace(F.col(c).cast("string"), r"\.", ""), ",", ".")
            .try_cast("double"),
        )
    return df


def read_json_records(
    spark: SparkSession, path: str, flatten: bool = True
) -> DataFrame:
    """REST-landed JSON (one object per line or array file); nested structs
    optionally flattened to `a_b` columns."""
    df = spark.read.option("multiLine", "true").json(path)
    return flatten_struct(df) if flatten else df


def flatten_struct(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively flatten struct columns into scalar columns
    (the reference's nested-JSON path gets with defaults)."""
    while True:
        struct_cols = [f.name for f in df.schema.fields
                       if f.dataType.typeName() == "struct"]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in struct_cols:
                for sub in f.dataType.fieldNames():  # type: ignore[union-attr]
                    cols.append(F.col(f"{f.name}.{sub}").alias(f"{f.name}{sep}{sub}"))
            else:
                cols.append(F.col(f.name))
        df = df.select(*cols)


def pandas_style_headers(names: list[str | None]) -> list[str]:
    """Reproduce pandas' header mangling that the reference's per-sheet
    rename maps are written against (egestor/relatorio_financiamento/
    tratamento.py:491-565): a blank/missing header at position i becomes
    ``Unnamed: {i}``; a repeated header gets ``.1``, ``.2``... suffixes
    (``AJUSTE*``, ``AJUSTE*.1``)."""
    filled = [
        (raw or "").strip() or f"Unnamed: {i}" for i, raw in enumerate(names)
    ]
    originals = set(filled)
    out: list[str] = []
    used: set[str] = set()
    counts: dict[str, int] = {}
    for name in filled:
        if name not in used:
            used.add(name)
            out.append(name)
            continue
        # duplicate: suffix like pandas' CSV parser, which skips over any
        # candidate appearing ANYWHERE in the original header row — a
        # literal 'A.1' later in the row must keep its name, so the
        # mangled duplicate becomes 'A.2' (["A","A","A.1"] →
        # ["A","A.2","A.1"], verified against pandas 2.2.2)
        base = name
        k = counts.get(base, 0) + 1
        cand = f"{base}.{k}"
        while cand in used or cand in originals:
            k += 1
            cand = f"{base}.{k}"
        counts[base] = k
        used.add(cand)
        out.append(cand)
    return out


def read_converted_sheet_csv(
    spark: SparkSession,
    path: str,
    header_row: int = 3,
    sheet_renames: dict[str, str] | None = None,
    sep: str = ",",
    encoding: str = "UTF-8",
    max_width: int = 64,
) -> DataFrame:
    """One e-Gestor report sheet, pre-converted to CSV (the environment has
    no xlsx reader — see :func:`read_excel_sheets`): skip the title/banner
    rows above ``header_row`` (pandas ``header=3`` semantics,
    egestor/.../extracao.py:130-259), mangle the header row pandas-style so
    duplicate ("AJUSTE*.1") and blank ("Unnamed: 16") labels are
    addressable, then apply the per-sheet rename map
    (tratamento.py:491-565). A sheet wider than ``max_width`` raises
    :class:`ReportWidthOverflow` instead of silently truncating."""
    from pyspark.sql.types import StringType, StructField as SF, StructType as ST

    wide = ST([SF(f"_c{i}", StringType(), True) for i in range(max_width + 1)])
    raw = (
        spark.read.options(sep=sep, encoding=encoding, header="false",
                           mode="PERMISSIVE")
        .schema(wide).csv(path)
        # one partition + materialize: monotonically_increasing_id is only
        # a stable file-order row number within a single frozen partition
        # (these are control-plane-sized converted report sheets)
        .coalesce(1)
        .withColumn("_rid", F.monotonically_increasing_id())
        .filter(F.col("_rid") >= header_row)
        .localCheckpoint(eager=True)
    )
    _check_width_overflow(raw, max_width, path)
    raw = raw.drop(f"_c{max_width}")
    hdr_rows = raw.orderBy("_rid").limit(1).collect()
    if not hdr_rows:
        raise ValueError(
            f"{path}: no header row at index {header_row} (file too short)"
        )
    hdr = hdr_rows[0]
    # width includes trailing BLANK headers that still carry data in ANY
    # row (they become 'Unnamed: N' — the whole point): probe every row,
    # not just the first, so a leading null cell can't truncate a column
    width_of_row = F.greatest(
        *[F.when(F.col(f"_c{i}").isNotNull(), F.lit(i + 1)).otherwise(F.lit(0))
          for i in range(max_width)]
    )
    width = raw.agg(F.max(width_of_row)).collect()[0][0] or 0
    names = pandas_style_headers([hdr[f"_c{i}"] for i in range(width)])
    body = raw.filter(F.col("_rid") > hdr["_rid"])
    df = body.select(
        *[F.col(f"_c{i}").alias(n) for i, n in enumerate(names)]
    )
    for old, new in (sheet_renames or {}).items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def read_excel_sheets(
    spark: SparkSession, path: str, sheets: list[str], header_row: int = 3
):
    """Multi-sheet Excel scan (egestor equivalent). Requires openpyxl,
    which is not in this container — real plumbing gated behind the
    import."""
    try:
        import openpyxl  # noqa: F401
        import pandas as pd
    except ImportError as exc:
        raise NotImplementedError(
            "read_excel_sheets needs openpyxl (not available in this "
            "environment); land the sheets as CSV/parquet instead"
        ) from exc
    out = {}
    for sheet in sheets:
        pdf = pd.read_excel(path, sheet_name=sheet, header=header_row)
        out[sheet] = spark.createDataFrame(pdf)
    return out
