"""Symbol-ref resolution (J1 analog), code normalizer (M8 analog),
lenient JSON extraction (M12)."""

import pandas as pd
import ray.data

from mmgraphrag_ray.textutils import extract_json_objects, strip_code_comments
from mmgraphrag_ray.stages.resolve import resolve_symbol_refs


def test_resolve_symbol_refs_prefers_locality_then_min_chunk():
    ent = pd.DataFrame(
        {
            "entity_name": ['"HELPER"', '"HELPER"'],
            "entity_type": ['"FUNCTION"', '"FUNCTION"'],
            "description": ["x", "x"],
            "source_id": ["chunk-b", "chunk-a"],
        }
    )
    rel = pd.DataFrame(
        {
            "src_id": ['"HELPER"'],
            "tgt_id": ['"PKG_1.MOD_9"'],
            "weight": [2.0],
            "description": ['"Module pkg_1.mod_9 calls helper."'],
            "source_id": ["chunk-z"],
            "order": [1],
        }
    )
    chunks = pd.DataFrame(
        {
            "chunk_id": ["chunk-a", "chunk-b"],
            # chunk-b mentions the caller's package words -> higher score
            "content": ["def helper(): pass", "# module pkg_1 mod_9 context\ndef helper(): pass"],
        }
    )
    out = resolve_symbol_refs(
        ray.data.from_pandas(rel), ray.data.from_pandas(ent), ray.data.from_pandas(chunks)
    ).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r.caller_module == "pkg_1.mod_9"
    assert r.symbol == '"HELPER"'
    assert r.def_chunk_id == "chunk-b"  # locality score wins
    assert r.score >= 3


def test_resolve_tie_breaks_min_chunk_id():
    ent = pd.DataFrame(
        {
            "entity_name": ['"F"', '"F"'],
            "entity_type": ['"FUNCTION"', '"FUNCTION"'],
            "description": ["x", "x"],
            "source_id": ["chunk-bbb", "chunk-aaa"],
        }
    )
    rel = pd.DataFrame(
        {
            "src_id": ['"F"'],
            "tgt_id": ['"M"'],
            "weight": [2.0],
            "description": ['"Module zzz calls f."'],
            "source_id": ["c"],
            "order": [1],
        }
    )
    chunks = pd.DataFrame(
        {"chunk_id": ["chunk-aaa", "chunk-bbb"], "content": ["def f()", "def f()"]}
    )
    out = resolve_symbol_refs(
        ray.data.from_pandas(rel), ray.data.from_pandas(ent), ray.data.from_pandas(chunks)
    ).to_pandas()
    assert out.iloc[0].def_chunk_id == "chunk-aaa"


def test_strip_code_comments():
    code = '# header\ndef f(a):\n    """doc."""\n    # inline-line comment\n    return a\n'
    out = strip_code_comments(code)
    assert "#" not in out and "doc." not in out and "return a" in out


def test_extract_json_objects():
    assert extract_json_objects('noise {"a": 1} trailing') == {"a": 1}
    assert extract_json_objects('x [{"a": 1}, {"b": 2}] y') == [{"a": 1}, {"b": 2}]
    # salvage: malformed list with one good item
    assert extract_json_objects('[{"a": 1}, {bad}]') == [{"a": 1}]
    assert extract_json_objects("no json here") is None
