"""run_expectations: declarative data-quality rules, one streaming pass."""

import sys

import numpy as np
import pandas as pd
import ray.data

sys.path.insert(0, "/root/repo")

from mmgraphrag_ray.stages.profile import expect, run_expectations


def _run(df, rules):
    return (
        run_expectations(ray.data.from_pandas(df).repartition(4), rules)
        .to_pandas()
        .set_index("rule")
    )


def test_rule_kinds_count_violations():
    df = pd.DataFrame(
        {
            "x": [1.0, 5.0, 51.0, np.nan, -2.0, 10.0],
            "flag": ["A", "N", "Z", None, "R", "A"],
            "code": ["ab1", "zz9", "bad!", "a", None, "ok2"],
        }
    )
    out = _run(df, [
        expect("x_range", "x", "between", lo=0, hi=50),
        expect("x_not_null", "x", "not_null"),
        expect("flag_set", "flag", "in_set", values=("A", "N", "R")),
        expect("code_re", "code", "regex_match", pattern="[a-z]+[0-9]"),
    ])
    assert (out["n_checked"] == 6).all()
    # x: 51 out of range, nan violates, -2 out of range -> 3
    assert out.loc["x_range", "n_violations"] == 3
    assert out.loc["x_not_null", "n_violations"] == 1
    # flag: Z and None -> 2
    assert out.loc["flag_set", "n_violations"] == 2
    # code: 'bad!' (fullmatch fails), 'a' (no digit), None -> 3
    assert out.loc["code_re", "n_violations"] == 3


def test_partials_fold_across_blocks():
    df = pd.DataFrame({"x": list(range(100)) + [None] * 7})
    out = _run(df, [expect("nn", "x", "not_null")])
    assert out.loc["nn", "n_checked"] == 107
    assert out.loc["nn", "n_violations"] == 7


def test_unknown_kind_raises():
    import pytest

    df = pd.DataFrame({"x": [1]})
    with pytest.raises(Exception):
        _run(df, [expect("bad", "x", "no_such_kind")])


def test_winnow_fingerprints_guarantee_and_density():
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.textstats import winnow_fingerprints

    # identical docs share the fingerprint digest; a short doc gets the
    # empty digest; selection is sparse (<= n_grams)
    t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": [t, t, "one two"]})
    out = (
        winnow_fingerprints(ray.data.from_pandas(df), k=4, w=4)
        .to_pandas().set_index("doc_id")
    )
    assert out.loc[1, "fp16"] == out.loc[2, "fp16"]
    assert out.loc[1, "n_grams"] == 7
    assert 1 <= out.loc[1, "n_selected"] <= 7
    assert out.loc[3, "n_grams"] == 0 and out.loc[3, "n_selected"] == 0
