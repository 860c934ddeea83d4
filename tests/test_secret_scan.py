"""stages/textstats.py secret_scan — pattern counts, redaction order,
and the clean_md5 contract."""

import hashlib

import pandas as pd
import ray.data

from mmgraphrag_ray.stages.textstats import secret_scan


def _files():
    return pd.DataFrame(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["a.py", "b.py", "c.py"],
            "content": [
                # email + long hex + long num
                "token = 'deadbeefdeadbeef'\nmail = 'ops@example.com'\nport = 443\npin = 12345",
                # all-digit 16+ run counts as HEX (hex pattern runs first)
                "x = 1234567890123456\ny = 9999",
                "clean code, no secrets at all",
            ],
        }
    )


def test_secret_scan_counts_and_redaction_md5():
    out = (
        secret_scan(ray.data.from_pandas(_files()))
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    a = out.iloc[0]
    assert (a.n_email, a.n_hex, a.n_num) == (1, 1, 1)  # 443 is too short
    expected_clean = (
        "token = '<HEX>'\nmail = '<EMAIL>'\nport = 443\npin = <NUM>"
    )
    assert a.clean_md5 == hashlib.md5(expected_clean.encode()).hexdigest()

    b = out.iloc[1]
    assert (b.n_email, b.n_hex, b.n_num) == (0, 1, 1)
    assert b.clean_md5 == hashlib.md5(
        "x = <HEX>\ny = <NUM>".encode()
    ).hexdigest()

    c = out.iloc[2]
    assert (c.n_email, c.n_hex, c.n_num) == (0, 0, 0)
    assert c.clean_md5 == hashlib.md5(
        "clean code, no secrets at all".encode()
    ).hexdigest()


def test_secret_scan_split_invariant():
    df = pd.concat([_files()] * 10, ignore_index=True)
    df["path"] = [f"p{i}.py" for i in range(len(df))]

    def run(nblocks):
        return (
            secret_scan(ray.data.from_pandas(df).repartition(nblocks))
            .to_pandas()
            .sort_values(["repo", "path"])
            .reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(run(1), run(6))
