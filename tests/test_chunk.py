"""Chunker semantics vs reference chunking_by_token_size
(preprocessing.py:30-69): window/stride boundaries, token counts, md5 ids."""

import hashlib

import pyarrow as pa

from mmgraphrag_ray.stages.chunk import make_chunker
from mmgraphrag_ray.tokenizer import encode


def _batch(contents, **extra):
    n = len(contents)
    cols = {
        "content": pa.array(contents, pa.large_string()),
        "doc_id": pa.array(extra.get("doc_id", ["d"] * n)),
        "repo": pa.array(["r"] * n),
        "path": pa.array(["p"] * n),
        "lang": pa.array(["python"] * n),
        "content_sha256": pa.array(["s"] * n),
    }
    return pa.table(cols)


def test_single_window():
    fn = make_chunker(10, 2)
    text = "one two three"
    out = fn(_batch([text])).to_pydict()
    assert out["chunk_order_index"] == [0]
    assert out["tokens"] == [len(encode(text))]
    assert out["content"] == [text]
    assert out["chunk_id"][0] == "chunk-" + hashlib.md5(text.encode()).hexdigest()


def test_window_boundaries_and_overlap():
    # 12 tokens, window 5, overlap 2 -> starts at 0,3,6,9
    words = "a0 a1 a2 a3 a4 a5"  # encode -> 12 tokens (letter+digit pairs... )
    toks = encode(words)
    fn = make_chunker(5, 2)
    out = fn(_batch([words])).to_pydict()
    starts = list(range(0, len(toks), 3))
    assert out["chunk_order_index"] == list(range(len(starts)))
    for i, start in enumerate(starts):
        assert out["content"][i] == "".join(toks[start : start + 5]).strip()
        assert out["tokens"][i] == min(5, len(toks) - start)


def test_empty_content_yields_no_chunks():
    fn = make_chunker(10, 2)
    assert fn(_batch([""])).num_rows == 0


def test_lineage_carried():
    fn = make_chunker(4, 1)
    out = fn(_batch(["x y z w q r s t"], doc_id=["docA"])).to_pydict()
    assert set(out["doc_id"]) == {"docA"}
    assert set(out["content_sha256"]) == {"s"}


def test_content_stripped():
    fn = make_chunker(100, 10)
    out = fn(_batch(["  leading and trailing   "])).to_pydict()
    assert out["content"] == ["leading and trailing"]


def test_doc_topk_ngrams_counts_and_ties(ray_session):
    """Combiner + bucketed sum + global top-k: exact counts, deterministic
    (cnt desc, ngram asc) tie order."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.stages.textstats import doc_topk_ngrams

    docs = pd.DataFrame(
        {
            "text": [
                "alpha beta alpha beta gamma",
                "alpha beta delta alpha",
                "zz yy",
            ]
        }
    )
    out = doc_topk_ngrams(ray.data.from_pandas(docs), n=2, k=3).to_pandas()
    # pairs: (alpha beta) x3, (beta alpha) x1, (beta gamma) x1,
    # (beta delta) x1, (delta alpha) x1, (zz yy) x1
    assert list(out.ngram) == ["alpha beta", "beta alpha", "beta delta"]
    assert list(out.cnt) == [3, 1, 1]
