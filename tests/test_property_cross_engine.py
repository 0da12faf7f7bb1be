"""Property-based cross-engine parity: the normalization / type kernels
must agree with their DuckDB oracle twins on arbitrary inputs, not just on
the synthetic corpus. Hypothesis generates adversarial strings (entities,
asides, unicode, digits); each batch is evaluated by BOTH engines and
compared value-by-value.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mannheimsearchjoinsengine_spark.functions.normalize import (
    duck_norm_key,
    duck_norm_tokens,
    duck_simple_norm,
    norm_key,
    norm_tokens,
    simple_norm,
)
from mannheimsearchjoinsengine_spark.functions.typeguess import duck_guess_type, guess_type

_SPARK = None


def _spark():
    global _SPARK
    if _SPARK is None:
        from mannheimsearchjoinsengine_spark.session import get_spark

        _SPARK = get_spark(app_name="prop-tests", cores=4)
        _SPARK.sparkContext.setLogLevel("ERROR")
    return _SPARK


# printable ASCII + the markup the normalizers special-case + some unicode
_weird = st.text(
    alphabet=st.sampled_from(
        list("abcXYZ012 .,|{}()[]<>&;/-_'\"$%\n\t") + ["é", "ß", "漢"]
    ),
    min_size=0,
    max_size=40,
)
_markup = st.sampled_from(
    ["&nbsp;", "&amp;", "(aside)", "[sic]", "<b>tag</b>", "{a|b}", "1,234",
     "500 km2", "10/31/1912", "true", "http://x.y", "3.14, -2.5"]
)
_value = st.lists(st.one_of(_weird, _markup), min_size=1, max_size=4).map(" ".join)
# NULL must round-trip identically too (ADVICE r03: duck_clear_string used to
# collapse NULL to '' → 'null' while Spark propagates NULL)
_value_or_null = st.one_of(st.none(), _value)


def _compare(values: list[str], spark_col, duck_expr: str, cast=None):
    spark = _spark()
    df = spark.createDataFrame([(v,) for v in values], "v: string")
    got = [r.o for r in df.select(spark_col(F.col("v")).alias("o")).collect()]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"v": values}))
    want = [r[0] for r in con.execute(f"SELECT {duck_expr} FROM t").fetchall()]
    assert got == want, next(
        (v, g, w) for v, g, w in zip(values, got, want) if g != w
    )


@settings(max_examples=20, deadline=None)
@given(st.lists(_value_or_null, min_size=1, max_size=25))
def test_norm_key_cross_engine(values):
    _compare(values, norm_key, duck_norm_key("v"))


@settings(max_examples=20, deadline=None)
@given(st.lists(_value, min_size=1, max_size=25))
def test_norm_tokens_cross_engine(values):
    _compare(values, norm_tokens, duck_norm_tokens("v"))


@settings(max_examples=20, deadline=None)
@given(st.lists(_value, min_size=1, max_size=25))
def test_simple_norm_cross_engine(values):
    _compare(values, simple_norm, duck_simple_norm("v"))


@settings(max_examples=20, deadline=None)
@given(st.lists(_value, min_size=1, max_size=25))
def test_guess_type_cross_engine(values):
    _compare(values, guess_type, duck_guess_type("v"))


@settings(max_examples=20, deadline=None)
@given(st.lists(_value_or_null, min_size=1, max_size=25))
def test_clear_string_cross_engine(values):
    from mannheimsearchjoinsengine_spark.functions.normalize import (
        clear_string,
        duck_clear_string,
    )

    _compare(values, clear_string, duck_clear_string("v"))


@settings(max_examples=20, deadline=None)
@given(st.lists(_value_or_null, min_size=1, max_size=25))
def test_fastjoin_norm_cross_engine(values):
    """P3 twin parity (kg_fastjoin_norm oracle expression): clearString →
    strip non-Basic-Latin → truncate to 127 chars."""
    from mannheimsearchjoinsengine_spark.functions.normalize import (
        duck_clear_string,
        fastjoin_norm,
    )

    duck = (
        "substring(regexp_replace("
        + duck_clear_string("v")
        + r", '[^\x00-\x7F]', '', 'g'), 1, 127)"
    )
    _compare(values, fastjoin_norm, duck)


def test_clear_string_golden():
    """Lucene WordDelimiterFilter parity goldens
    (StringNormalizer.java:83-141): camelCase + acronym splits, possessive
    strip, digit boundaries, stop set, '$' append, greedy bracket removal,
    custom-stopword hook, empty→'null'."""
    from mannheimsearchjoinsengine_spark.functions.normalize import clear_string

    spark = _spark()

    def run(vals, **kw):
        df = spark.createDataFrame([(v,) for v in vals], ["v"])
        rows = df.select("v", clear_string(F.col("v"), **kw).alias("o")).collect()
        return {r.v: r.o for r in rows}

    got = run([
        "PowerShot", "XMLParser2000", "O'Neil's", "The Lord of the Rings",
        "Cost $5", "$", "founded by founder editing editor", "&nbsp;hello",
        "5m", "mixedCASEWord",
    ])
    assert got["PowerShot"] == "power shot"            # splitOnCaseChange
    assert got["XMLParser2000"] == "xml parser 2000"   # acronym + digit boundary
    assert got["O'Neil's"] == "o neil"                 # stemEnglishPossessive
    assert got["The Lord of the Rings"] == "lord rings"  # Lucene stop set
    assert got["Cost $5"] == "cost 5 $"                # '$' quirk (:136-139)
    assert got["$"] == "null"                          # empty → NULL_VALUE
    assert got["founded by founder editing editor"] == "founded founder editing editor"
    assert got["&nbsp;hello"] == "hello"
    assert got["5m"] == "5 m"                          # splitOnNumerics
    assert got["mixedCASEWord"] == "mixed case word"

    # greedy bracket removal: Java '\(.*\)' spans first '(' to LAST ')'
    assert run(["x (b) c (d) y"], remove_brackets=True)["x (b) c (d) y"] == "x y"
    # custom-stopword hook (StringNormalizer.java:116-124), case-insensitive
    assert run(["Acme Corp"], custom_stopwords=["Acme"])["Acme Corp"] == "corp"
