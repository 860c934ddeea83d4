"""Tokenizer: losslessness + Python/DuckDB agreement (the SQL-oracle bridge)."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from mmgraphrag_ray.corpus import generate_files_table
from mmgraphrag_ray.tokenizer import TOKEN_PATTERN, decode, encode, truncate_tokens

ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=300
).map(lambda s: s.replace("\x0b", " "))


@given(ascii_text)
@settings(max_examples=200, deadline=None)
def test_lossless_roundtrip(text):
    assert decode(encode(text)) == text


@given(st.text(alphabet="ab c\nd\t(){}.0123_", max_size=200))
@settings(max_examples=100, deadline=None)
def test_lossless_with_whitespace(text):
    assert decode(encode(text)) == text


def test_python_duckdb_agreement_on_corpus():
    table = generate_files_table(8)
    con = duckdb.connect()
    for content in table.column("content").to_pylist():
        py = encode(content)
        sql = con.execute(
            "select regexp_extract_all(?, ?)", [content, TOKEN_PATTERN]
        ).fetchone()[0]
        assert py == sql


@given(ascii_text)
@settings(max_examples=100, deadline=None)
def test_python_duckdb_agreement_random(text):
    con = duckdb.connect()
    sql = con.execute(
        "select regexp_extract_all(?, ?)", [text, TOKEN_PATTERN]
    ).fetchone()[0]
    assert encode(text) == sql


def test_truncate_tokens():
    text = "alpha beta gamma delta"
    toks = encode(text)
    assert truncate_tokens(text, 2) == "".join(toks[:2])
    assert truncate_tokens(text, 99) == text
