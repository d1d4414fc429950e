"""Property-based tests (hypothesis) for the text-grammar parsers.

The reference proves its composite decoder against hand-picked literals
(py-tests/test_custom_types.py:135-181); the binary-protocol decoder it
uses (pg_custom_types.rs:169-213) can't be fuzzed without a live server.
Our text-grammar parser CAN: serialize arbitrary field lists with
PostgreSQL's own output quoting rules, parse them back, and require the
round trip to be the identity — for any fields, not just the fixtures.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pg2parquet_spark.typemap.composites import _tokenize

NEEDS_QUOTE = set(',()"\\ \t\n')


def pg_serialize_composite(fields: list[str | None]) -> str:
    """PostgreSQL's composite output syntax (docs §8.16.6): NULL renders as
    an unquoted empty field; a non-NULL value is double-quoted when empty or
    containing delimiter/quote/backslash/whitespace, with " doubled and
    backslash doubled inside quotes."""
    out = []
    for v in fields:
        if v is None:
            out.append("")
        elif v == "" or any(c in NEEDS_QUOTE for c in v):
            out.append('"' + v.replace("\\", "\\\\").replace('"', '""') + '"')
        else:
            out.append(v)
    return "(" + ",".join(out) + ")"


field_value = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_characters="\x00"  # PG text can't hold NUL
        ),
        max_size=25,
    ),
)


@settings(max_examples=300, derandomize=True, deadline=None)
@given(st.lists(field_value, min_size=1, max_size=6))
def test_composite_text_grammar_roundtrip(fields):
    assert _tokenize(pg_serialize_composite(fields)) == fields


@settings(max_examples=300, derandomize=True, deadline=None)
@given(st.lists(field_value, min_size=1, max_size=4))
def test_composite_grammar_agrees_with_python_csvish_oracle(fields):
    """Cross-check: parsing then re-serializing is also the identity (the
    serializer is injective on canonical forms, so this pins both
    directions)."""
    text = pg_serialize_composite(fields)
    assert pg_serialize_composite(_tokenize(text)) == text


def test_composite_udf_matches_tokenizer_on_generated_corpus(spark):
    """One Spark pass: a deterministic sample of adversarial composites goes
    through the Arrow-batched UDF; results must equal the pure-Python
    tokenizer field-for-field (the UDF wraps _tokenize — this pins the
    Arrow/pandas plumbing: nulls, padding, masking)."""
    from pyspark.sql import functions as F

    from pg2parquet_spark.typemap.composites import parse_composite_udf

    corpus: list[list[str | None]] = [
        [None, None, None],
        ["", None, '"'],
        ["a,b", "(c)", "d\\e"],
        ['x""y', " lead", "trail "],
        ["plain", "", None],
        ["\\", '"""', ",,,"],
        ["nested(paren", ')"', '\\"'],
        ["tab\there", "nl\nhere", "sp ace"],
    ]
    rows = [(i, pg_serialize_composite(f)) for i, f in enumerate(corpus)]
    df = spark.createDataFrame(rows, "id long, txt string")
    parsed = df.select(
        "id", parse_composite_udf(F.col("txt"), ["f1", "f2", "f3"]).alias("s")
    ).orderBy("id")
    got = [[r.s.f1, r.s.f2, r.s.f3] for r in parsed.collect()]
    want = [(f + [None] * 3)[:3] for f in corpus]
    assert got == want
