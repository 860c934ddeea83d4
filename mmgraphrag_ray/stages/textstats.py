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


# Module-level singletons: these stages are stateless-cheap (compiled
# regexes only), so they run as TASK pools on already-warm workers and scale
# with the cluster instead of being capped by a fixed actor-pool size.
_TEXT_STATS = TextStatsStage()
_FINGERPRINT = FingerprintStage()


def doc_text_stats(documents_ds):
    return documents_ds.map_batches(_TEXT_STATS, batch_format="pyarrow")


def doc_fingerprints(documents_ds):
    return documents_ds.map_batches(_FINGERPRINT, batch_format="pyarrow")


# ------------------------------------------------------------- language id

# tiny stopword inventories for an n-gram-free heuristic language ID
_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"},
    "es": {"el", "la", "los", "las", "y", "es", "que", "en", "por", "una"},
    "it": {"il", "la", "che", "e", "di", "un", "per", "sono", "con", "del"},
}


class LangIdStage:
    """Heuristic language ID: argmax of per-language stopword hits over
    lowercased word tokens; ties or zero hits -> 'unknown'. Deterministic."""

    def __init__(self):
        self.word = re.compile(r"[A-Za-z]+")

    def predict(self, text: str) -> str:
        words = [w.lower() for w in self.word.findall(text)]
        counts = {
            lang: sum(1 for w in words if w in sw)
            for lang, sw in _LANG_STOPWORDS.items()
        }
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[0][1] == 0 or (len(best) > 1 and best[0][1] == best[1][1]):
            return "unknown"
        return best[0][0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "lang_pred": pa.array([], pa.string())}
            )
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(
                    [self.predict(t) for t in batch.column("text").to_pylist()],
                    pa.string(),
                ),
            }
        )


_LANG_ID = LangIdStage()


def doc_lang_id(documents_ds):
    return documents_ds.map_batches(_LANG_ID, batch_format="pyarrow")


# ---------------------------------------------------------- quality scoring

# fixed inventory so the DuckDB oracle can inline the same list
_QUALITY_STOPWORDS = sorted(
    {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
     "a", "an", "on", "with", "as", "by", "at", "this", "are", "be"}
)


class QualityScoreStage:
    """Heuristic document quality (the C4/Gopher-style rule family):
    stopword ratio, mean word length, non-alnum ratio, and a composite
    score = stopword_ratio * 0.5 + bounded_word_len * 0.3 + alnum_ratio
    * 0.2 — every term an IEEE op over integer counts shared with the SQL
    oracle, so the score is engine-exact."""

    def __init__(self):
        self.word = re.compile(WORD_RE)
        self.alnum = re.compile(r"[A-Za-z0-9]")
        self.stop = frozenset(_QUALITY_STOPWORDS)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        n_stop, n_words, wlen_sum, n_alnum, n_chars = [], [], [], [], []
        for t in texts:
            words = self.word.findall(t)
            n_words.append(len(words))
            n_stop.append(sum(1 for w in words if w.lower() in self.stop))
            wlen_sum.append(sum(len(w) for w in words))
            n_alnum.append(len(self.alnum.findall(t)))
            n_chars.append(len(t))
        sr = [s / w if w else 0.0 for s, w in zip(n_stop, n_words)]
        mw = [l / w if w else 0.0 for l, w in zip(wlen_sum, n_words)]
        ar = [a / c if c else 0.0 for a, c in zip(n_alnum, n_chars)]
        score = [
            s * 0.5 + min(m / 10.0, 1.0) * 0.3 + a * 0.2
            for s, m, a in zip(sr, mw, ar)
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "stopword_ratio": pa.array(sr, pa.float64()),
                "mean_word_len": pa.array(mw, pa.float64()),
                "alnum_ratio": pa.array(ar, pa.float64()),
                "quality_score": pa.array(score, pa.float64()),
            }
        )


_QUALITY = QualityScoreStage()


def doc_quality_scores(documents_ds):
    return documents_ds.map_batches(_QUALITY, batch_format="pyarrow")


# ------------------------------------------------------- repetition signals

class RepetitionStage:
    """Gopher-style repetition signals per document (the rule family used
    to drop boilerplate/templated text from training corpora): duplicate
    non-empty-line count and the most frequent word bigram.  All outputs
    are integers/strings (ratios left to the consumer), so the whole table
    is bit-exact against the SQL oracle.

    Columns: n_lines (non-empty after strip), n_dup_lines (lines minus
    distinct lines), n_bigrams, top_bigram (tie -> lexicographically
    smallest; '' when < 2 words), top_bigram_cnt."""

    def __init__(self):
        self.word = re.compile(r"[a-z]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_lines, n_dup, n_big, top_bg, top_cnt = [], [], [], [], []
        for t in texts:
            lines = [l for l in t.split("\n") if l.strip() != ""]
            n_lines.append(len(lines))
            n_dup.append(len(lines) - len(set(lines)))
            ws = self.word.findall(t.lower())
            bigs = Counter(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)
            )
            n_big.append(sum(bigs.values()))
            if bigs:
                best = min(bigs.items(), key=lambda kv: (-kv[1], kv[0]))
                top_bg.append(best[0])
                top_cnt.append(best[1])
            else:
                top_bg.append("")
                top_cnt.append(0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "n_dup_lines": pa.array(n_dup, pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "top_bigram": pa.array(top_bg, pa.string()),
                "top_bigram_cnt": pa.array(top_cnt, pa.int64()),
            }
        )


_REPETITION = RepetitionStage()


def doc_repetition_stats(documents_ds):
    return documents_ds.map_batches(_REPETITION, batch_format="pyarrow")


# ------------------------------------------------------------ top-k n-grams

class NgramCountStage:
    """Per-batch n-gram combiner (actor pool: regex compiled once).

    Emits PARTIAL counts — one row per distinct n-gram per batch — so the
    shuffle moves a bounded vocabulary table, never per-occurrence rows
    (the pre-aggregation rule for wide groupbys at corpus scale)."""

    def __init__(self, n: int = 2):
        self.n = n
        self.word = re.compile(WORD_RE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        acc: Counter = Counter()
        for text in batch.column("text").to_pylist():
            ws = [w.lower() for w in self.word.findall(text)]
            for i in range(len(ws) - self.n + 1):
                acc[" ".join(ws[i : i + self.n])] += 1
        return pa.table(
            {
                "ngram": pa.array(list(acc.keys()), pa.string()),
                "cnt": pa.array(list(acc.values()), pa.int64()),
            }
        )


def doc_topk_ngrams(documents_ds, n: int = 2, k: int = 20):
    """Global top-k most frequent word n-grams over `documents.text`.

    Three-layer scale shape: (1) per-batch combiner (NgramCountStage),
    (2) bucketed partial-sum groupby — each n-gram's total lands whole in
    one bucket, (3) per-block top-k candidates, then one tiny global sort
    over <= blocks x k rows.  Ties rank (cnt desc, ngram asc) — the exact
    row_number() order of the SQL oracle."""
    import pandas as pd

    from .groupagg import bucketed_groupby_agg

    partials = documents_ds.map_batches(
        NgramCountStage(n), batch_format="pyarrow"
    )
    counts = bucketed_groupby_agg(partials, ["ngram"], {"cnt": ("cnt", "sum")})

    def block_topk(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"ngram": pd.Series(dtype="string"), "cnt": pd.Series(dtype="int64")})
        return b.sort_values(
            ["cnt", "ngram"], ascending=[False, True], kind="mergesort"
        ).head(k)[["ngram", "cnt"]]

    cand = counts.map_batches(block_topk, batch_format="pandas")
    return cand.sort(["cnt", "ngram"], descending=[True, False]).limit(k)


# --------------------------------------------------- secret scanning

# applied IN ORDER — later patterns scan the already-redacted text, so
# overlap is resolved identically on both engines (RE2 and Python re
# agree on all three: no backrefs, no lookarounds)
SECRET_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("hex", r"\b[a-fA-F0-9]{16,}\b", "<HEX>"),
    ("num", r"\b[0-9]{4,}\b", "<NUM>"),
)


# compiled once per worker process at import — a stateless TASK pool
# scales with the cluster (no actor-pool concurrency cap; cf. the round-1
# (1,4) starvation finding)
_SECRET_COMPILED = [(n, re.compile(p), r) for n, p, r in SECRET_PATTERNS]


def secret_scan(files_ds, key_cols=("repo", "path"), text_col="content"):
    """Credential/PII scan + redaction over a code corpus — the hygiene
    pass training pipelines run before using crawled source code (the
    BigCode/The Stack preprocessing family): emails, long hex tokens
    (api-key/shasum shaped), and long numeric literals are counted and
    replaced with typed placeholders, in SECRET_PATTERNS order so overlap
    resolves identically on both engines.

    -> Dataset(key_cols..., n_email, n_hex, n_num, clean_md5): per-file
    match counts per pattern family plus the md5 of the fully redacted
    text (the md5 pins the exact redaction output in the SQL oracle
    without shipping the cleaned bytes through the compare)."""
    key_cols = list(key_cols)

    def scan(batch):
        out = batch[key_cols].copy()
        s = batch[text_col].astype(str)
        for name, pat, repl in _SECRET_COMPILED:
            out[f"n_{name}"] = s.str.count(pat).astype("int64")
            s = s.str.replace(pat, repl, regex=True)
        out["clean_md5"] = s.map(
            lambda t: hashlib.md5(t.encode()).hexdigest()
        )
        return out

    return files_ds.map_batches(scan, batch_format="pandas")


def winnow_fingerprints(docs_ds, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 4, w: int = 4):
    """Winnowing document fingerprints (Schleimer et al. 2003 — the MOSS
    local plagiarism-detection algorithm): hash every word k-gram, slide a
    window of ``w`` consecutive hashes, select each window's minimum
    (RIGHTMOST minimum on ties — the paper's robust-winnowing rule), and
    dedupe selected positions.  Guarantees every match of length >= w+k-1
    tokens shares a fingerprint, with density ~2/(w+1) — the principled
    sparse alternative to hashing every window (dup_passages).

    -> Dataset(doc_id, n_grams, n_selected, fp16): gram count, selected
    fingerprint count, and the md5[:16] of the position-ordered selected
    'pos:hash' string (the doc's compact fingerprint signature).  Docs
    shorter than k tokens emit (0, 0, md5 of '')-style rows.

    Shape: stateless vectorized map (numpy sliding-window argmin per doc);
    one short row per doc, no shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    word = re.compile(r"[a-z0-9]+")

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ngs, nss, fps = [], [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            toks = word.findall(str(text).lower())
            n = len(toks) - k + 1
            if n < 1:
                ids.append(int(doc_id)); ngs.append(0); nss.append(0)
                fps.append(hashlib.md5(b"").hexdigest()[:16])
                continue
            h = np.fromiter(
                (int(hashlib.md5(
                    " ".join(toks[i:i + k]).encode()
                ).hexdigest()[:8], 16) for i in range(n)),
                dtype=np.int64, count=n,
            )
            if n <= w:
                # single (short) window over all grams
                sel_pos = np.array([n - 1 - int(np.argmin(h[::-1]))])
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, w)
                # rightmost min: argmin over the reversed window
                sel = (w - 1) - np.argmin(win[:, ::-1], axis=1)
                sel_pos = np.unique(sel + np.arange(len(win)))
            sig = " ".join(f"{p}:{h[p]}" for p in sel_pos)
            ids.append(int(doc_id))
            ngs.append(int(n))
            nss.append(int(len(sel_pos)))
            fps.append(hashlib.md5(sig.encode()).hexdigest()[:16])
        return pd.DataFrame({
            id_col: pd.Series(ids, dtype="int64"),
            "n_grams": pd.Series(ngs, dtype="int64"),
            "n_selected": pd.Series(nss, dtype="int64"),
            "fp16": pd.Series(fps, dtype=object),
        })

    return docs_ds.map_batches(fp, batch_format="pandas")


def doc_token_entropy(docs_ds, id_col: str = "doc_id", text_col: str = "text"):
    """Integer token-diversity (entropy) surrogate per document — the
    repetition-vs-diversity quality signal next to doc_repetition: for
    token multiset {tf_t} with S = Σ tf_t,

        H' = S·ilog2(S) − Σ_t tf_t·ilog2(tf_t),  ilog2(x) = bit_length−1

    i.e. Shannon entropy · S in bits with both logs floored to integers —
    exact on both engines (DuckDB mirror: length(bin(x)) − 1), zero for a
    doc that is one token repeated 2^k times, maximal for all-distinct
    tokens.  -> Dataset(doc_id, n_tokens, n_distinct, entropy_s).

    Shape: stateless per-batch map (one Counter per doc), one short row
    per doc, no shuffle."""
    from collections import Counter

    import numpy as np
    import pandas as pd

    word = re.compile(r"[a-z]+")

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        ids, n_toks, n_dist, ents = [], [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            tf = Counter(word.findall(str(text).lower()))
            s = sum(tf.values())
            h = (
                s * (s.bit_length() - 1)
                - sum(c * (c.bit_length() - 1) for c in tf.values())
                if s
                else 0
            )
            ids.append(int(doc_id))
            n_toks.append(s)
            n_dist.append(len(tf))
            ents.append(h)
        return pd.DataFrame({
            "doc_id": np.asarray(ids, dtype=np.int64),
            "n_tokens": np.asarray(n_toks, dtype=np.int64),
            "n_distinct": np.asarray(n_dist, dtype=np.int64),
            "entropy_s": np.asarray(ents, dtype=np.int64),
        })

    return docs_ds.map_batches(stats, batch_format="pandas")


def vocab_setops(docs_ds, source_a: str, source_b: str,
                 text_col: str = "text", source_col: str = "source"):
    """Distributed set algebra over derived sets — the INTERSECT / EXCEPT
    family the reference lacks entirely (SURVEY §2.8 "No intersect/except
    operators"): the distinct token vocabularies of two corpus slices,
    reduced to one row per token with membership flags and the set-op
    verdict ('both' / 'a_only' / 'b_only').  Vocabulary drift between
    corpus slices (new jargon, disappearing terms) is the practical use.

    Shape: per-batch distinct (token, side) flag rows (combiner — a
    token repeated in a batch emits once), then ONE bucketed grouped max
    per token.  No row ever carries text.  -> Dataset(token, in_a, in_b,
    status)."""
    import numpy as np
    import pandas as pd

    from .groupagg import bucketed_groupby_agg

    word = re.compile(r"[a-z]+")

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        toks, in_a, in_b = [], [], []
        for src, text in zip(batch[source_col], batch[text_col]):
            a = src == source_a
            b = src == source_b
            if not (a or b):
                continue
            for t in set(word.findall(str(text).lower())):
                toks.append(t)
                in_a.append(1 if a else 0)
                in_b.append(1 if b else 0)
        df = pd.DataFrame({
            "token": pd.array(toks, dtype="string"),
            "in_a": np.asarray(in_a, dtype=np.int64),
            "in_b": np.asarray(in_b, dtype=np.int64),
        })
        # batch-local combiner: one row per (token) with or-ed flags
        if len(df):
            df = df.groupby("token", sort=False, as_index=False).max()
        return df

    merged = bucketed_groupby_agg(
        docs_ds.map_batches(flags, batch_format="pandas"),
        keys=["token"],
        aggs={"in_a": ("in_a", "max"), "in_b": ("in_b", "max")},
    )

    def verdict(b: pd.DataFrame) -> pd.DataFrame:
        status = np.where(
            (b["in_a"] > 0) & (b["in_b"] > 0), "both",
            np.where(b["in_a"] > 0, "a_only", "b_only"),
        )
        return b.assign(status=status)

    return merged.map_batches(verdict, batch_format="pandas")


def lang_confusion(documents_ds, label_col: str = "lang"):
    """Classifier-evaluation confusion matrix for the heuristic language
    ID: exact (labeled lang, predicted lang) counts over the corpus —
    the precision/recall input for tuning the stopword inventories.

    Shape: the LangIdStage scan (stateless task pool, patterns compiled
    per worker) emits (label, prediction) pairs; ONE vocabulary-bounded
    combiner reduce.  -> Dataset(lang, lang_pred, n)."""
    import pyarrow as pa

    from .groupagg import bucketed_groupby_agg

    stage = LangIdStage()

    def pairs(batch: pa.Table) -> pa.Table:
        preds = [stage.predict(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "lang": batch.column(label_col),
            "lang_pred": pa.array(preds, pa.string()),
        })

    return bucketed_groupby_agg(
        documents_ds.map_batches(pairs, batch_format="pyarrow"),
        keys=["lang", "lang_pred"],
        aggs={"n": (None, "count")},
    )
