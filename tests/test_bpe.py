"""stages/bpe.py — BPE pair counting + the distributed merge-learn loop."""

import pandas as pd
import ray.data

from mmgraphrag_ray.stages.bpe import (
    _word_pairs,
    bpe_learn,
    bpe_pair_counts,
    word_counts,
)


def _docs():
    return pd.DataFrame(
        {
            "text": [
                "low lower lowest low low",
                "new newer newest new",
                "wider wide wide new low",
                "",
                "aaaa aa baaab",
            ]
        }
    )


def _serial_bpe(df, n_merges):
    """Plain-Python reference: Sennrich get_stats (overlapping counts) +
    greedy left-to-right merge apply."""
    import re
    from collections import Counter

    wc = Counter()
    for t in df.text:
        wc.update(re.findall(r"[a-z]+", t.lower()))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        stats = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] += wc[w]
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n = best
        if n < 2:
            break
        merges.append((l, r, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, {w: " ".join(s) for w, s in vocab.items()}


def test_word_pairs_overlapping_counts():
    assert _word_pairs(list("aaa")) == {"a a": 2}
    assert _word_pairs(["ab", "a", "ab"]) == {"ab a": 1, "a ab": 1}
    assert _word_pairs(["x"]) == {}


def test_pair_counts_match_serial_and_split_invariant():
    df = _docs()

    def run(nblocks):
        return (
            bpe_pair_counts(ray.data.from_pandas(df).repartition(nblocks), k=50)
            .to_pandas()
            .sort_values("rank")
            .reset_index(drop=True)
        )

    a, b = run(1), run(5)
    pd.testing.assert_frame_equal(a, b)
    # serial expectation for the top pair: 'lo' appears in low/lower/lowest
    import re
    from collections import Counter

    wc = Counter()
    for t in df.text:
        wc.update(re.findall(r"[a-z]+", t.lower()))
    stats = Counter()
    for w, n in wc.items():
        for i in range(len(w) - 1):
            stats[w[i : i + 2]] += n
    exp = sorted(stats.items(), key=lambda kv: (-kv[1], kv[0]))
    got = list(zip(a["pair"], a["n"]))
    assert got == [(p, n) for p, n in exp[: len(got)]]


def test_bpe_learn_matches_serial_reference():
    df = _docs()
    merges, vocab_ds = bpe_learn(ray.data.from_pandas(df).repartition(3),
                                 n_merges=6)
    exp_merges, exp_vocab = _serial_bpe(df, 6)
    assert merges == exp_merges
    v = vocab_ds.to_pandas().set_index("w")["symbols"].to_dict()
    assert v == exp_vocab


def test_bpe_learn_identical_run_merge_on_runs():
    # 'aaaa' must merge pairwise: a a a a -> aa aa -> aaaa
    df = pd.DataFrame({"text": ["aaaa aaaa aaaa"]})
    merges, vocab_ds = bpe_learn(ray.data.from_pandas(df), n_merges=2)
    assert [(l, r) for l, r, _ in merges] == [("a", "a"), ("aa", "aa")]
    v = vocab_ds.to_pandas()
    assert v.loc[v.w == "aaaa", "symbols"].iloc[0] == "aaaa"


def test_word_counts_combiner_exact():
    df = _docs()
    wc = (
        word_counts(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .set_index("w")["n"]
        .to_dict()
    )
    assert wc["low"] == 4 and wc["new"] == 3 and wc["aa"] == 1


def test_tokenizer_fertility_hand_computed(tmp_path):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from mmgraphrag_ray.pipelines.relational import doc_tokenizer_fertility

    d = str(tmp_path)
    # fertility floor: every word encodes to >= 1 token, so
    # fertility_ppm >= 1e6; langs partition the doc set
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["ab ab ab cd", "ab cd cd", "xy"], pa.string()),
        "lang": pa.array(["aa", "aa", "bb"], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = doc_tokenizer_fertility(d).to_pandas().set_index("lang")
    assert set(out.index) == {"aa", "bb"}
    assert out.loc["aa", "n_docs"] == 2 and out.loc["bb", "n_docs"] == 1
    assert out.loc["aa", "n_words"] == 7 and out.loc["bb", "n_words"] == 1
    for lang in ("aa", "bb"):
        assert out.loc[lang, "n_tokens_bpe"] >= out.loc[lang, "n_words"]
        assert out.loc[lang, "fertility_ppm"] >= 1_000_000
        assert out.loc[lang, "fertility_ppm"] == (
            out.loc[lang, "n_tokens_bpe"] * 1_000_000
            // out.loc[lang, "n_words"])
