"""Byte-pair-encoding tokenizer training primitives over `documents`.

The first stage of training any BPE/WordPiece tokenizer (Sennrich et al.
2016; the GPT-2/tiktoken pipeline) is corpus-scale symbol-pair counting:
count words, explode each DISTINCT word into adjacent symbol pairs
weighted by its corpus frequency, pick the most frequent pair, merge, and
repeat.  At 100 TB the load-bearing observation is that after the first
word-count pass every further round operates on the VOCABULARY (millions
of rows), not the corpus (billions) — exactly how this module shapes the
work:

- ``word_counts``: per-batch Counter combiner (one row per distinct word
  per batch) + one bucketed grouped sum — the only corpus-wide pass.
- ``bpe_pair_counts``: adjacent symbol-pair counts over the distinct-word
  table, each pair occurrence weighted by the word's count; top-k by
  (count desc, pair asc).  Word-level work only.
- ``bpe_learn``: n_merges rounds of count -> argmax -> apply-merge, the
  actual BPE training loop.  Driver state per round is ONE pair (the
  argmax); the vocab table stays distributed and is re-mapped in place.

The reference engine has no tokenizer-training stage (its tokenizer is a
frozen tiktoken model, mm_utils.py); this extends the lexical family of
stages/index.py.  Pair counting uses OVERLAPPING adjacent positions
("aaa" -> "a a" twice) per the original get_stats; merge application is
greedy left-to-right non-overlapping, also per the original.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

TOKEN_RE = r"[a-z]+"


class _WordCountStage:
    """Per-batch combiner: distinct-word partial counts."""

    def __init__(self, text_col: str):
        self.word = re.compile(TOKEN_RE)
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        counts: Counter = Counter()
        for text in batch.column(self.text_col).to_pylist():
            counts.update(self.word.findall(text.lower()))
        return pa.table(
            {
                "w": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )


def word_counts(documents_ds, text_col: str = "text"):
    """-> Dataset(w, n): corpus word frequencies (the one corpus-wide pass)."""
    from .groupagg import bucketed_groupby_agg

    parts = documents_ds.map_batches(
        _WordCountStage(text_col), batch_format="pyarrow"
    )
    return bucketed_groupby_agg(parts, keys=["w"], aggs={"n": ("n", "sum")})


def _word_pairs(symbols: list[str]) -> dict[str, int]:
    """Adjacent-pair occurrences in one word, OVERLAPPING positions
    ('aaa' -> 'a a' twice) — the original Sennrich get_stats semantics and
    what a positional SQL scan counts.  (Merge APPLICATION is greedy
    left-to-right non-overlapping, also per the original.)  Keys are
    space-joined ('l r') so multi-char symbols stay unambiguous."""
    out: dict[str, int] = {}
    for a, b in zip(symbols, symbols[1:]):
        p = a + " " + b
        out[p] = out.get(p, 0) + 1
    return out


def _pair_partials(batch: pd.DataFrame, sym_col: str) -> pd.DataFrame:
    counts: dict[str, int] = {}
    for syms, n in zip(batch[sym_col], batch["n"]):
        for p, k in _word_pairs(list(syms)).items():
            counts[p] = counts.get(p, 0) + k * int(n)
    return pd.DataFrame(
        {"pair": list(counts.keys()),
         "n": pd.Series(list(counts.values()), dtype="int64")}
    )


def bpe_pair_counts(documents_ds, k: int = 30, text_col: str = "text"):
    """Top-k adjacent CHARACTER pairs by corpus frequency — BPE round 1.

    -> Dataset(pair, n, rank), rank by (n desc, pair asc).  Pair work runs
    over the distinct-word table only; the per-batch dict combiner bounds
    shuffle rows by distinct-pairs-per-batch (<= 26^2 here)."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    wc = word_counts(documents_ds, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(_syms=batch["w"].map(list))
        return _pair_partials(b, "_syms")

    sums = bucketed_groupby_agg(
        wc.map_batches(explode, batch_format="pandas"),
        keys=["pair"],
        aggs={"n": ("n", "sum")},
    ).map_batches(lambda b: b.assign(_g=np.int64(0)), batch_format="pandas")
    top = grouped_topk(sums, keys=["_g"], order_col="n", k=k,
                       tie_cols=["pair"])
    # round-1 symbols are single chars: drop the separator so the pair
    # column is the 2-char substring the SQL mirror scans
    return top.map_batches(
        lambda b: b.assign(pair=b["pair"].str.replace(" ", "", regex=False))[
            ["pair", "n", "rank"]
        ],
        batch_format="pandas",
    )


def bpe_learn(documents_ds, n_merges: int = 8, text_col: str = "text"):
    """The BPE training loop: n_merges rounds of pair-count -> argmax ->
    merge-apply over the distributed symbol-sequence vocabulary.

    Returns (merges, vocab_ds): ``merges`` = the learned merge list in
    order (left, right, count); ``vocab_ds`` = Dataset(w, n, symbols)
    with the final symbol segmentation (symbols joined by a space).

    Scale shape: each round is one vocabulary-bounded combiner + bucketed
    sum + a 1-row argmax reduce, then a stateless re-map of the vocab;
    driver state per round is the single winning pair.  The corpus is
    touched exactly once (word_counts)."""
    from .groupagg import bucketed_groupby_agg
    from .window import grouped_topk

    vocab = word_counts(documents_ds, text_col).map_batches(
        lambda b: b.assign(symbols=b["w"].map(lambda w: " ".join(w))),
        batch_format="pandas",
    ).materialize()

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        def explode(batch: pd.DataFrame) -> pd.DataFrame:
            b = batch.assign(_syms=batch["symbols"].str.split(" "))
            return _pair_partials(b, "_syms")

        sums = bucketed_groupby_agg(
            vocab.map_batches(explode, batch_format="pandas"),
            keys=["pair"],
            aggs={"n": ("n", "sum")},
        ).map_batches(
            lambda b: b.assign(_g=np.int64(0)), batch_format="pandas"
        )
        best = grouped_topk(
            sums, keys=["_g"], order_col="n", k=1, tie_cols=["pair"]
        ).take_all()
        if not best or best[0]["n"] < 2:
            break
        win_pair, win_n = best[0]["pair"], int(best[0]["n"])
        left, right = win_pair.split(" ", 1)
        merges.append((left, right, win_n))

        pat = re.compile(
            rf"(?<!\S){re.escape(left)} {re.escape(right)}(?!\S)"
        )

        def apply_merge(batch: pd.DataFrame, pat=pat, l=left, r=right):
            out = batch.copy()
            # vectorized: pandas dispatches the compiled regex sub at the
            # C/str-accessor level instead of a Python lambda per row
            out["symbols"] = out["symbols"].str.replace(pat, l + r, regex=True)
            return out

        from ..arrowutil import sever_lineage

        # sever: n_merges sequential rounds rebind vocab; carrying the
        # full plan forward grows driver-side plan handling exponentially
        vocab = sever_lineage(vocab.map_batches(
            apply_merge, batch_format="pandas"
        ))

    return merges, vocab


def bpe_encode_counts(documents_ds, n_merges: int = 5, text_col: str = "text",
                      id_col: str = "doc_id"):
    """Tokenizer APPLICATION — the other half of the BPE story: train
    ``n_merges`` merges with :func:`bpe_learn`, then encode the corpus
    under the learned segmentation and report per-document token counts
    (the compression/token-budget measurement that decides whether a
    trained tokenizer ships).

    Encoding never re-runs merge logic per document: a word's token count
    under the final vocab is just ``len(symbols(w))``, so the corpus pass
    emits per-doc distinct-word counts (combiner) and ONE bucketed join
    against the vocabulary's symbol-length table prices every word.
    Documents with no [a-z]+ words are absent (inner-join semantics,
    shared with the mirror).

    -> Dataset(doc_id, n_words, n_tokens_bpe)."""
    from collections import Counter

    from .groupagg import bucketed_groupby_agg
    from .join import bucketed_join

    _, vocab = bpe_learn(documents_ds, n_merges=n_merges, text_col=text_col)
    nsyms = vocab.map_batches(
        lambda b: pd.DataFrame({
            "w": b["w"],
            "n_syms": b["symbols"].str.split(" ").str.len().astype("int64"),
        }),
        batch_format="pandas",
    ).materialize()

    word = re.compile(TOKEN_RE)

    def doc_word_counts(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ws, cs = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            for w, c in Counter(word.findall(str(text).lower())).items():
                ids.append(int(doc_id))
                ws.append(w)
                cs.append(c)
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "w": pd.array(ws, dtype="string"),
            "c": np.asarray(cs, dtype=np.int64),
        })

    dwc = documents_ds.map_batches(doc_word_counts, batch_format="pandas")
    joined = bucketed_join(dwc, nsyms, on="w", small_side="right")
    priced = joined.map_batches(
        lambda b: pd.DataFrame({
            "doc_id": b["doc_id"],
            "c": b["c"].astype("int64"),
            "toks": b["c"].astype("int64") * b["n_syms"].astype("int64"),
        }),
        batch_format="pandas",
    )
    return bucketed_groupby_agg(
        priced, keys=["doc_id"],
        aggs={"n_words": ("c", "sum"), "n_tokens_bpe": ("toks", "sum")},
    )
