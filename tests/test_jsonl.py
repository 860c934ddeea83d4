"""JSONL sink/source round-trip fidelity (sources/jsonl.py)."""

import sys

import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.sources.jsonl import read_jsonl, write_jsonl


def test_jsonl_roundtrip_preserves_tricky_strings(tmp_path):
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                'line one\nline "two"\ttabbed',
                "unicode: é中文 \U0001f600",
                "backslash \\ and / slash",
                "",
            ],
            "n": [10, -3, 0, 2**40],
        }
    )
    out = write_jsonl(ray.data.from_pandas(df), str(tmp_path / "out"))
    back = (
        read_jsonl(out)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "text", "n"]]
    )
    pd.testing.assert_frame_equal(back, df, check_dtype=False)


def test_write_jsonl_replaces_stale_files(tmp_path):
    d = str(tmp_path / "out")
    write_jsonl(ray.data.from_pandas(pd.DataFrame({"a": range(100)})), d)
    write_jsonl(ray.data.from_pandas(pd.DataFrame({"a": range(5)})), d)
    assert read_jsonl(d).count() == 5
