"""Unit tests for the scalar cleaning layer (SURVEY §2.8 C1–C8, C18–C20).

Edge rows mirror FIXTURES.md: empty strings, all-zeros, all-nines,
'999' sentinels, invalid romans, short codes needing zfill.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sm_etl_cloud_run_spark.functions import cleaning


def _col(spark, values, fn):
    df = spark.createDataFrame([(v,) for v in values], "x string")
    return [r["y"] for r in df.select(fn(F.col("x")).alias("y")).collect()]


def test_empty_to_null(spark):
    assert _col(spark, ["", "a", " "], cleaning.empty_to_null) == [None, "a", " "]


def test_all_zeros_to_null(spark):
    vals = ["0", "00000000000000", "010", "", None]
    assert _col(spark, vals, cleaning.all_zeros_to_null) == [None, None, "010", "", None]


def test_all_nines_to_null(spark):
    vals = ["9", "999999", "919", "99a"]
    assert _col(spark, vals, cleaning.all_nines_to_null) == [None, None, "919", "99a"]


def test_literal_to_null(spark):
    vals = ["999", "99", "998", None]
    out = _col(spark, vals, lambda c: cleaning.literal_to_null(c, "999"))
    assert out == [None, "99", "998", None]


def test_decode_bool_01_tristate(spark):
    vals = ["1", "0", "", "2", None]
    out = _col(spark, vals, cleaning.decode_bool_01)
    assert out == [True, False, None, None, None]


def test_decode_bool_flag_keeps_null(spark):
    vals = ["M", "I", None]
    out = _col(spark, vals, lambda c: cleaning.decode_bool_flag(c, "M"))
    assert out == [True, False, None]


def test_roman_decode_with_passthrough(spark):
    vals = ["I", "IV", "XII", "XXIV", "ABC", "", "XLIX"]
    out = _col(spark, vals, lambda c: cleaning.roman_to_int_string(c, max_value=50))
    assert out == ["1", "4", "12", "24", "ABC", "", "49"]


def test_strip_non_digits(spark):
    vals = ["CRM-12345", "12.34/5", "abc"]
    assert _col(spark, vals, cleaning.strip_non_digits) == ["12345", "12345", ""]


def test_zfill(spark):
    vals = ["7", "1234", "12345"]
    assert _col(spark, vals, lambda c: cleaning.zfill(c, 4)) == ["0007", "1234", "12345"]


def test_parse_decimal_comma(spark):
    vals = ["1.234,56", "0,5", "12", None]
    out = _col(spark, vals, cleaning.parse_decimal_comma)
    assert out == [1234.56, 0.5, 12.0, None]


def test_fill_zero_long(spark):
    df = spark.createDataFrame([(1,), (None,)], "x long")
    out = [r["y"] for r in df.select(cleaning.fill_zero_long(F.col("x")).alias("y")).collect()]
    assert out == [1, 0]


def test_plan_lsh_bands_tracks_threshold():
    """MMDS §3.4: (1/b)^(1/r) ≈ the S-curve midpoint — low thresholds
    want many bands (high recall), high thresholds want long bands
    (high precision); the planner must recover that monotonicity."""
    import pytest

    from sm_etl_cloud_run_spark.operators.dedup import plan_lsh_bands

    b_low, r_low = plan_lsh_bands(0.2, 64)
    b_mid, r_mid = plan_lsh_bands(0.5, 64)
    b_high, r_high = plan_lsh_bands(0.9, 64)
    assert b_low * r_low == b_mid * r_mid == b_high * r_high == 64
    assert b_low >= b_mid >= b_high and r_low <= r_mid <= r_high
    # the chosen midpoint brackets the target threshold reasonably
    for t, (b, r) in ((0.2, (b_low, r_low)), (0.5, (b_mid, r_mid)), (0.9, (b_high, r_high))):
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.25
    with pytest.raises(ValueError):
        plan_lsh_bands(1.5, 64)


def test_strip_html_tags_entities_whitespace(spark):
    from sm_etl_cloud_run_spark.functions.text import strip_html

    rows = [
        ("<html><head><style>p{color:red}</style></head>"
         "<body><p>Hello &amp; welcome</p><script>alert('x')</script>"
         "<div>a &lt;b&gt;   c</div></body></html>",),
        ("no markup at all",),
        ("<br/><br/>&nbsp;",),
        # double-escaped entities decode ONE level: &amp;lt; is the
        # TEXT '&lt;', not a '<' (requires &amp; to decode last)
        ("&amp;lt;tag&amp;gt; and &amp;amp;",),
    ]
    df = spark.createDataFrame(rows, "raw string")
    got = [r["t"] for r in df.select(strip_html(F.col("raw")).alias("t")).collect()]
    assert got == ["Hello & welcome a <b> c", "no markup at all", "",
                   "&lt;tag&gt; and &amp;"]


def test_remove_boilerplate_lines_corpus_level(spark):
    from sm_etl_cloud_run_spark.operators.dedup import remove_boilerplate_lines

    footer = "Copyright 2024 Example Corp All Rights Reserved"
    nav = "Home | Products | About Us | Contact"
    docs = spark.createDataFrame(
        [
            (1, f"{nav}\nunique article one\nok\n{footer}"),
            (2, f"{nav}\nanother unique text\n{footer}"),
            (3, f"{nav}\nthird body line here\n{footer}"),
            (4, "standalone document with no chrome"),
            (5, f"{nav}\n{footer}"),  # every line is chrome
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["clean_text"]
           for r in remove_boilerplate_lines(docs, min_df=3).collect()}
    assert out[1] == "unique article one\nok"       # 'ok' too short to be chrome
    assert out[2] == "another unique text"
    assert out[3] == "third body line here"
    assert out[4] == "standalone document with no chrome"
    # a fully-boilerplate doc surfaces as EMPTY, it does not vanish
    assert out[5] == ""
    assert set(out) == {1, 2, 3, 4, 5}
