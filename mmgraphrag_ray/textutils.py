"""Scalar text/hash helpers mirroring the reference's semantics.

Reference cites: clean_str base.py:54-63, split_string_by_multi_markers
base.py:66-71, is_float_regex base.py:138-139, compute_mdhash_id
base.py:105-106.  Implemented from the documented behavior, not copied.
"""

from __future__ import annotations

import hashlib
import html
import re

_CONTROL_RE = re.compile(r"[\x00-\x1f\x7f-\x9f]")
_FLOAT_RE = re.compile(r"^[-+]?[0-9]*\.?[0-9]+$")


def clean_str(value):
    """HTML-unescape, strip, drop control chars (reference base.py:54-63)."""
    if not isinstance(value, str):
        return value
    return _CONTROL_RE.sub("", html.unescape(value.strip()))


def split_by_markers(content: str, markers: list[str]) -> list[str]:
    """Split on any literal marker, strip pieces, drop empties
    (reference base.py:66-71)."""
    if not markers:
        return [content]
    parts = re.split("|".join(re.escape(m) for m in markers), content)
    return [p.strip() for p in parts if p.strip()]


def is_float_str(value: str) -> bool:
    """Reference base.py:138-139."""
    return bool(_FLOAT_RE.match(value))


def md5_hex(content: str) -> str:
    return hashlib.md5(content.encode()).hexdigest()


def mdhash_id(content: str, prefix: str = "") -> str:
    """``prefix + md5hex(content)`` (reference base.py:105-106)."""
    return prefix + md5_hex(content)


def sha256_hex(content: str) -> str:
    """Per-row content invariant column (north_rule: content sha256 equality)."""
    return hashlib.sha256(content.encode()).hexdigest()


_COMMENT_RE = re.compile(r"(?m)^[ \t]*#[^\n]*\n?")
_DOCSTRING_RE = re.compile(r'(?s)""".*?"""')


def strip_code_comments(code: str) -> str:
    """Code normalizer — the code-corpus analog of the reference's markdown
    image-ref stripper (M8, pdf2md_preprocessing.py:260-263: one regexp_sub).
    Removes whole-line # comments and triple-quoted docstrings."""
    return _DOCSTRING_RE.sub("", _COMMENT_RE.sub("", code))


def extract_json_objects(text: str):
    """Lenient extraction of the first {...} or [{...}] JSON value embedded in
    model-ish text, with per-item salvage for lists (reference M12,
    llm.py:144-197: locate braces, json.loads, fall back item-by-item)."""
    import json as _json

    for open_ch, close_ch in (("[", "]"), ("{", "}")):
        start = text.find(open_ch)
        if start == -1:
            continue
        end = text.rfind(close_ch)
        if end <= start:
            continue
        blob = text[start : end + 1]
        try:
            return _json.loads(blob)
        except _json.JSONDecodeError:
            if open_ch == "[":
                items = []
                for piece in re.findall(r"\{[^{}]*\}", blob):
                    try:
                        items.append(_json.loads(piece))
                    except _json.JSONDecodeError:
                        continue
                if items:
                    return items
    return None


def enclose_with_quotes(value) -> str:
    """Numbers unquoted, strings stripped of existing quotes then wrapped
    (reference base.py:249-255)."""
    import numbers

    if isinstance(value, numbers.Number):
        return str(value)
    return '"' + str(value).strip().strip("'").strip('"') + '"'


def list_of_list_to_csv(data: list[list]) -> str:
    """Prompt-context CSV formatter (reference base.py:258-265)."""
    return "\n".join(
        ",\t".join(enclose_with_quotes(cell) for cell in row) for row in data
    )


def truncate_list_by_token_size(items: list, key, max_token_size: int) -> list:
    """Prefix-sum token budget cut (reference base.py:215-245); tokens from
    the sandbox regex tokenizer."""
    from .tokenizer import num_tokens

    if max_token_size <= 0:
        return []
    total = 0
    for i, item in enumerate(items):
        total += num_tokens(key(item))
        if total > max_token_size:
            return items[:i]
    return items
