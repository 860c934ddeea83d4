"""stages/blocking.py — sorted-neighborhood candidate pairs: serial parity,
block-boundary exactness, duplicate-key determinism."""

import pandas as pd
import ray.data

from mmgraphrag_ray.stages.blocking import sorted_neighborhood_pairs


def _serial(keys_ids, window):
    rows = sorted((str(k), str(i)) for k, i in keys_ids)
    out = []
    for a in range(len(rows)):
        for b in range(a + 1, min(a + window + 1, len(rows))):
            out.append((rows[a][0], rows[a][1], rows[b][0], rows[b][1],
                        b - a))
    return pd.DataFrame(out, columns=["ka", "ida", "kb", "idb", "dist"])


def _norm(df):
    df = df.copy()
    df["dist"] = df["dist"].astype("int64")
    for c in ("ka", "ida", "kb", "idb"):
        df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_sorted_neighborhood_serial_parity_across_boundaries():
    # 40 keys over several prefixes; block=8 forces many boundary pairs
    keys = [f"{c}{n:02d}" for c in "abcd" for n in range(10)]
    ids = [f"id{j}" for j in range(len(keys))]
    df = pd.DataFrame({"name": keys, "rid": ids})
    for blocks in (1, 5):
        ds = ray.data.from_pandas(df).repartition(blocks)
        got = sorted_neighborhood_pairs(
            ds, "name", "rid", window=3, prefix_len=1, block=8
        ).to_pandas()
        want = _serial(zip(keys, ids), 3)
        pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_sorted_neighborhood_duplicate_keys_tiebreak_on_id():
    df = pd.DataFrame({"name": ["x", "x", "x", "y"],
                       "rid": ["3", "1", "2", "0"]})
    got = sorted_neighborhood_pairs(
        ray.data.from_pandas(df), "name", "rid", window=1, prefix_len=1
    ).to_pandas()
    want = _serial([("x", "3"), ("x", "1"), ("x", "2"), ("y", "0")], 1)
    pd.testing.assert_frame_equal(_norm(got), _norm(want))


def test_levenshtein_matches_duckdb():
    import duckdb

    from mmgraphrag_ray.stages.blocking import levenshtein

    cases = [("abc", "abd"), ("", "xyz"), ("kitten", "sitting"),
             ("FN_19_20", "FN_19_2"), ("same", "same"), ("ab", "ba")]
    con = duckdb.connect()
    for a, b in cases:
        want = con.sql(f"select levenshtein('{a}', '{b}')").fetchone()[0]
        assert levenshtein(a, b) == want, (a, b)


def test_fuzzy_key_pairs_filters_by_edit():
    from mmgraphrag_ray.stages.blocking import fuzzy_key_pairs

    df = pd.DataFrame({
        "name": ["alpha", "alphb", "beta", "gamma_long_name"],
        "rid": ["1", "2", "3", "4"],
    })
    got = fuzzy_key_pairs(
        ray.data.from_pandas(df), "name", "rid", window=3, max_edit=1,
        prefix_len=1,
    ).to_pandas()
    assert list(zip(got["ka"], got["kb"])) == [("alpha", "alphb")]
    assert list(got["edit"]) == [1]
