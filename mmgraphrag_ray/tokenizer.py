"""Deterministic regex tokenizer — the sandbox stand-in for tiktoken.

The reference tokenizes with tiktoken gpt-4o (base.py:119-134) for
1200/100-token chunk windows (preprocessing.py:30-78, 76-78).  tiktoken is
unavailable offline, so this module defines a lossless regex tokenization
whose semantics are reproducible BOTH in Python (`re.findall`) and in DuckDB
(`regexp_extract_all` / RE2) so every token-window operator has an exact SQL
oracle.

Losslessness: every character of an ASCII text is consumed by exactly one
token (letters-with-optional-leading-space, digit runs, punctuation runs,
whitespace runs), so ``"".join(encode(t)) == t``.  The corpus generator only
emits ASCII with ``\\n``/``\\t`` whitespace, where Python ``\\s`` and RE2
``\\s`` agree.
"""

from __future__ import annotations

import re

# Keep in sync with SQL oracles in __ray_entry__.py (DuckDB RE2 uses the same
# pattern string).  Alternation priority (leftmost-first) matches between
# Python re and RE2; verified by tests/test_tokenizer.py.
TOKEN_PATTERN = r" ?[A-Za-z_]+| ?[0-9]+| ?[^A-Za-z_0-9\s]+|\s+"

_TOKEN_RE = re.compile(TOKEN_PATTERN)


def encode(text: str) -> list[str]:
    """Tokenize text into a lossless list of string tokens."""
    return _TOKEN_RE.findall(text)


def decode(tokens: list[str]) -> str:
    """Inverse of :func:`encode` (plain concatenation)."""
    return "".join(tokens)


def num_tokens(text: str) -> int:
    return len(_TOKEN_RE.findall(text))


def truncate_tokens(text: str, max_tokens: int) -> str:
    """Decode of the first ``max_tokens`` tokens (reference base.py:128-134
    decode_tokens_by_tiktoken over a token-slice)."""
    return "".join(_TOKEN_RE.findall(text)[:max_tokens])
