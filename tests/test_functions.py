"""M1 unit tests: scalar cleaning/date/text functions + DE-PARA plans
(mirrors the reference's transform-shape + schema-contract tests,
/root/reference/tests/siasus/teste_procedimentos.py:67-155)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from etl_spark.functions import (
    decode_bool,
    doc_fingerprint,
    money_brl_to_double,
    normalize_text,
    null_if_all_nines,
    null_if_all_zeros,
    null_if_blank,
    parse_aaaamm,
    parse_aaaammdd,
    parse_dmy,
    portable_hash60,
    punct_ratio,
    stopword_ratio,
    token_count,
    word_shingles,
    zfill,
    strip_non_digits,
)
from etl_spark.functions.hashing import portable_hash60_sql
from etl_spark.plans import (
    SchemaContractError,
    apply_de_para,
    check_contract,
    impose_types,
    with_additive_columns,
)


def one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("r")).collect()[0]["r"]


def test_null_sentinels(spark):
    assert one(spark, null_if_blank("x"), x="  ") is None
    assert one(spark, null_if_blank("x"), x="a") == "a"
    assert one(spark, null_if_all_zeros("x"), x="000000") is None
    assert one(spark, null_if_all_zeros("x"), x="010") == "010"
    assert one(spark, null_if_all_nines("x"), x="999") is None


def test_bool_decode_and_codes(spark):
    assert one(spark, decode_bool("x", ["1"], ["0"]), x="1") is True
    assert one(spark, decode_bool("x", ["S"], ["N"]), x="N") is False
    assert one(spark, decode_bool("x", ["1"], ["2"]), x="7") is None
    assert one(spark, zfill("x", 6), x="123") == "000123"
    assert one(spark, strip_non_digits("x"), x="12.34-5/6 *") == "123456"


def test_money_and_normalize(spark):
    assert one(spark, money_brl_to_double("x"), x="R$ 1.234,56") == pytest.approx(1234.56)
    assert one(spark, normalize_text("x"), x="  Ação; de Saúde! ") == "acao_de_saude"
    # decomposition-generated long tail: Vietnamese, Romanian comma-below,
    # pinyin tone vowels, Welsh, digraph + ĳ ligatures, non-decomposing strokes
    assert one(spark, normalize_text("x"), x="Tiếng Việt Thư Ngỏ") == \
        "tieng_viet_thu_ngo"
    assert one(spark, normalize_text("x"), x="Știința Țării") == "stiinta_tarii"
    assert one(spark, normalize_text("x"), x="Nǚ Lǜshī ǊEGOŠ Ĳsselmeer") == \
        "nu_lushi_njegos_ijsselmeer"
    assert one(spark, normalize_text("x"), x="Ŵŷ Ḋáṁ ȘȚ øłđħŧ") == \
        "wy_dam_st_oldht"


def test_date_parsers(spark):
    assert one(spark, parse_aaaammdd("x"), x="20240131") == dt.date(2024, 1, 31)
    assert one(spark, parse_aaaammdd("x"), x="garbage") is None  # coerce
    assert one(spark, parse_aaaamm("x"), x="202403") == dt.date(2024, 3, 1)
    assert one(spark, parse_dmy("x"), x="31/01/2024") == dt.date(2024, 1, 31)


def test_text_features(spark):
    assert one(spark, token_count("x"), x="a  b   c") == 3
    sh = one(spark, word_shingles("x", 2), x="a b c d")
    assert sh == ["a b", "b c", "c d"]
    assert one(spark, punct_ratio("x"), x="ab!?") == pytest.approx(0.5)
    assert one(spark, stopword_ratio("x"), x="the cat and dog") == pytest.approx(0.5)
    assert one(spark, doc_fingerprint("x"), x="a b c d") == min(
        one(spark, portable_hash60(F.lit(s))) for s in ["a b c", "b c d"]
    )


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    vals = ["", "abc", "the quick brown fox", "ação"]
    got = [one(spark, portable_hash60(F.lit(v))) for v in vals]
    con = duckdb.connect()
    want = [
        con.execute(f"select {portable_hash60_sql('?')}", [v]).fetchone()[0]
        for v in vals
    ]
    assert got == want


def test_de_para_and_types(spark):
    df = spark.createDataFrame([("01", "x", "z")], ["PA_CODUNI", "PA_EXTRA", "IGNORED"])
    out = apply_de_para(df, {"PA_CODUNI": "estabelecimento_id", "PA_EXTRA": "extra"})
    assert out.columns == ["estabelecimento_id", "extra"]
    with pytest.raises(SchemaContractError):
        apply_de_para(df, {"MISSING": "m"})
    typed = impose_types(out.selectExpr("'7' as n", "estabelecimento_id"), {"n": "bigint"})
    assert dict(typed.dtypes)["n"] == "bigint"
    with pytest.raises(SchemaContractError):
        impose_types(out, {"nope": "int"})


def test_additive_backfill_and_contract(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    out = with_additive_columns(df, {"b": "string", "a": "bigint"})
    assert out.columns == ["a", "b"]
    assert out.collect()[0]["b"] is None

    src = StructType.fromDDL("PA_CODUNI string, PA_QTD string")
    dst = StructType.fromDDL("estabelecimento_id string, quantidade string, id string")
    check_contract(src, {"PA_CODUNI": "estabelecimento_id", "PA_QTD": "quantidade"},
                   dst, ignore_dest=("id",))
    with pytest.raises(SchemaContractError):
        check_contract(src, {"PA_CODUNI": "estabelecimento_id"}, dst, ignore_dest=("id",))


def test_roman_month_codes(spark):
    from etl_spark.functions import month_pt_to_num, roman_to_int, valid_code_array

    assert one(spark, roman_to_int("x"), x=" xiv ") == 14
    assert one(spark, roman_to_int("x"), x="IIII") is None
    assert one(spark, month_pt_to_num("x"), x="Março") == 3
    assert one(spark, month_pt_to_num("x"), x="febuary") is None
    assert one(spark, valid_code_array("x"), x="causa: X65.2 / b24; X652!") == "{X652,B24}"
    assert one(spark, valid_code_array("x"), x="nada") == "{}"


def test_char_ngrams_short_strings(spark):
    from etl_spark.functions import char_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("",), ("a",), ("ab",), ("abc",), ("abca",), (None,)], "x string"
    )
    got = {r["x"]: r["g"] for r in df.select(
        "x", char_ngrams("x", 3).alias("g")).collect()}
    assert got[""] == [] and got["a"] == [] and got["ab"] == []
    assert got["abc"] == ["abc"]
    assert sorted(got["abca"]) == ["abc", "bca"]
    assert got[None] is None


def test_value_percentiles_approx_bounded_error(spark):
    """The approx_percentile scale variant (t-digest sketch, map-side
    combinable) must track the exact gate within a bounded error — the
    documented 100 TB path actually exercised (the sketch is not
    bit-reproducible in DuckDB, so this pytest is its gate)."""
    from etl_spark.queries import q_value_percentiles, q_value_percentiles_approx

    sf = "/root/testdata/sf0.001"
    exact = {r["event_type"]: r for r in q_value_percentiles(spark, sf).collect()}
    approx = {r["event_type"]: r for r in q_value_percentiles_approx(spark, sf).collect()}
    assert set(exact) == set(approx) and exact
    # the sketch's guarantee is on RANK, not value (exact `percentile`
    # interpolates between order stats; approx returns a real data value,
    # which can differ arbitrarily in value where the tail is sparse):
    # the returned value's empirical CDF position must sit within
    # eps + O(1/n) of the requested quantile
    values = {}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for et, a in approx.items():
        assert a["n"] == exact[et]["n"]
        vs = sorted(values[et])
        n = len(vs)
        margin = 1.0 / 10000 + 2.0 / n
        for q, target in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            rank = sum(1 for v in vs if v <= a[q]) / n
            lo = sum(1 for v in vs if v < a[q]) / n
            assert lo - margin <= target <= rank + margin, (et, q, a[q])
