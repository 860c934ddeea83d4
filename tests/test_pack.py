"""stages/pack.py — sequence packing via distributed prefix sum.

The operator's contract: ``start_off`` is the exclusive prefix sum of
per-doc token counts in doc_id order, and each doc's span maps to the
fixed-size training windows it lands in.  The reference point is a plain
single-process cumsum over the same token counts.
"""

import re

import pandas as pd
import ray.data

from mmgraphrag_ray.stages.pack import TOKEN_RE, pack_sequences

WORD = re.compile(TOKEN_RE)


def _docs():
    texts = [
        "alpha beta gamma",          # 3 tokens
        "",                          # empty doc: zero-width span
        "one two three four five " * 120,  # 600 tokens: crosses a window
        "x",                         # 1 token
        "   \t\n ",                  # whitespace only -> 0 tokens
        "seven eight " * 40,         # 80 tokens
    ]
    return pd.DataFrame({"doc_id": pd.Series(range(6), dtype="int64"),
                         "text": pd.Series(texts, dtype=object)})


def _expected(df: pd.DataFrame, window: int) -> pd.DataFrame:
    n = df["text"].map(lambda t: len(WORD.findall(t.lower()))).astype("int64")
    start = n.cumsum() - n
    end = start + n
    last_pos = end.where(n == 0, end - 1)
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "n_tokens": n,
            "start_off": start,
            "end_off": end,
            "first_seq": start // window,
            "last_seq": (last_pos // window).astype("int64"),
        }
    )


def _run(df, window, range_size, nblocks):
    ds = ray.data.from_pandas(df).repartition(nblocks)
    out = pack_sequences(ds, window=window, range_size=range_size)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_pack_sequences_matches_serial_scan():
    df = _docs()
    got = _run(df, window=512, range_size=2, nblocks=3)
    pd.testing.assert_frame_equal(got, _expected(df, 512))


def test_pack_sequences_block_and_range_split_invariant():
    df = _docs()
    a = _run(df, window=64, range_size=1, nblocks=1)
    b = _run(df, window=64, range_size=3, nblocks=4)
    pd.testing.assert_frame_equal(a, b)


def test_pack_sequences_window_spans():
    # 600-token doc starting at offset 3 with window=64 spans many windows
    df = _docs()
    got = _run(df, window=64, range_size=100, nblocks=2)
    row = got[got["doc_id"] == 2].iloc[0]
    assert row["n_tokens"] == 600
    assert row["start_off"] == 3
    assert row["first_seq"] == 0
    assert row["last_seq"] == (3 + 600 - 1) // 64
    # empty docs occupy zero tokens: first_seq == last_seq, end == start
    empty = got[got["doc_id"] == 1].iloc[0]
    assert empty["start_off"] == empty["end_off"]
    assert empty["first_seq"] == empty["last_seq"]


def test_pack_manifest_covers_every_token_exactly_once():
    from mmgraphrag_ray.stages.pack import pack_manifest

    df = _docs()
    spans = pack_sequences(
        ray.data.from_pandas(df).repartition(3), window=64, range_size=2
    )
    man = pack_manifest(spans, window=64).to_pandas()
    # ranges clamp to the window
    assert (man["tok_start"] >= 0).all() and (man["tok_end"] <= 64).all()
    assert (man["tok_end"] > man["tok_start"]).all()
    # per-doc coverage: the union of within-seq ranges has the doc's length
    per_doc = man.assign(n=man["tok_end"] - man["tok_start"]).groupby("doc_id")["n"].sum()
    exp = _expected(df, 64).set_index("doc_id")["n_tokens"]
    for doc, n in exp.items():
        assert per_doc.get(doc, 0) == n
    # interior sequences of the 600-token doc are full windows
    doc2 = man[man["doc_id"] == 2].sort_values("seq_id")
    interior = doc2.iloc[1:-1]
    assert ((interior["tok_start"] == 0) & (interior["tok_end"] == 64)).all()
    # zero-token docs emit nothing
    assert 1 not in man["doc_id"].values and 4 not in man["doc_id"].values


def test_pivot_agg_min_timestamps():
    from mmgraphrag_ray.stages.reshape import pivot_agg

    df = pd.DataFrame(
        {
            "u": pd.Series([1, 1, 1, 2, 2], dtype="int64"),
            "t": pd.to_datetime(
                ["2024-01-03", "2024-01-01", "2024-01-02",
                 "2024-01-05", "2024-01-04"]
            ).astype("datetime64[us]"),
            "e": pd.Series(["a", "a", "b", "b", "b"], dtype=object),
        }
    )
    got = (
        pivot_agg(ray.data.from_pandas(df).repartition(3), ["u"], "e", "t",
                  op="min", categories=["a", "b"])
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    assert got.loc[0, "min_a"] == pd.Timestamp("2024-01-01")
    assert got.loc[0, "min_b"] == pd.Timestamp("2024-01-02")
    assert pd.isna(got.loc[1, "min_a"])  # user 2 has no 'a' events
    assert got.loc[1, "min_b"] == pd.Timestamp("2024-01-04")


def test_repo_context_pack_order_and_md5():
    import hashlib

    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.pack import repo_context_pack

    df = pd.DataFrame(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["b.py", "a.py", "x.py"],
            "content": ["B", "A", "X"],
        }
    )
    out = (
        repo_context_pack(ray.data.from_pandas(df).repartition(3), n_buckets=4)
        .to_pandas()
        .sort_values("repo")
        .reset_index(drop=True)
    )
    blob_r1 = "<<<a.py>>>\nA\n<<<b.py>>>\nB"  # path order, not input order
    assert out.loc[0, "packed_md5"] == hashlib.md5(blob_r1.encode()).hexdigest()
    assert out.loc[0, "n_files"] == 2 and out.loc[0, "total_chars"] == 2
    assert out.loc[1, "n_files"] == 1
