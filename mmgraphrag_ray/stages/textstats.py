"""Text-analysis operators for training-data pipelines over `documents`.

Quality scoring / token counting / fingerprinting in the spirit of the
reference's text utilities (token budgets base.py:215-245, clean_str
base.py:54-63), designed so every measure has an exact DuckDB oracle:
counts come from the same regexes on both sides, ratios are a single IEEE
division of identical integer operands.
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..tokenizer import TOKEN_PATTERN

WORD_RE = r"[A-Za-z]+"
PUNCT_RE = r"[^A-Za-z0-9\s]"
DIGIT_RE = r"[0-9]"
WS_RE = r"\s+"


class TextStatsStage:
    """Per-document counts/ratios (actor pool: regexes compiled once)."""

    def __init__(self):
        self.word = re.compile(WORD_RE)
        self.punct = re.compile(PUNCT_RE)
        self.digit = re.compile(DIGIT_RE)
        self.token = re.compile(TOKEN_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_pylist()
        n_chars, n_words, n_puncts, n_digits, n_toks, pratio = [], [], [], [], [], []
        for t in texts:
            c = len(t)
            w = len(self.word.findall(t))
            p = len(self.punct.findall(t))
            d = len(self.digit.findall(t))
            k = len(self.token.findall(t))
            n_chars.append(c)
            n_words.append(w)
            n_puncts.append(p)
            n_digits.append(d)
            n_toks.append(k)
            pratio.append(p / c if c else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
                "n_words": pa.array(n_words, pa.int64()),
                "n_punct": pa.array(n_puncts, pa.int64()),
                "n_digits": pa.array(n_digits, pa.int64()),
                "n_tokens": pa.array(n_toks, pa.int64()),
                "punct_ratio": pa.array(pratio, pa.float64()),
            }
        )


class FingerprintStage:
    """Document fingerprint: md5 of whitespace-collapsed lowercased text —
    the normalization-hash dedup key family (reference uses raw-content md5,
    base.py:105-106; this is its canonicalized variant)."""

    def __init__(self):
        self.ws = re.compile(WS_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        fps = [
            hashlib.md5(self.ws.sub(" ", t.lower()).strip().encode()).hexdigest()
            for t in texts
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "fingerprint": pa.array(fps, pa.string()),
            }
        )


def doc_text_stats(documents_ds):
    return documents_ds.map_batches(
        TextStatsStage, batch_format="pyarrow", concurrency=(1, 4)
    )


def doc_fingerprints(documents_ds):
    return documents_ds.map_batches(
        FingerprintStage, batch_format="pyarrow", concurrency=(1, 4)
    )
