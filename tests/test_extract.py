"""Record-grammar parser edge cases (FIXTURES.md F3; reference
text2graph.py:34-71, 118-138, 370-394) and the deterministic code extractor."""

from mmgraphrag_ray.stages.extract import (
    parse_wire,
    render_wire,
)

D = "<|>"


def test_basic_entity_and_relationship():
    wire = (
        f'("entity"{D}"PARSE_CONFIG"{D}"FUNCTION"{D}"Parses the config file.")##\n'
        f'("relationship"{D}"PARSE_CONFIG"{D}"LOAD_JSON"{D}"parse_config calls load_json."{D}8)##\n'
        "<|COMPLETE|>"
    )
    ents, rels = parse_wire(wire)
    assert ents == [
        {
            "entity_name": '"PARSE_CONFIG"',
            "entity_type": '"FUNCTION"',
            "description": '"Parses the config file."',
        }
    ]
    assert len(rels) == 1
    r = rels[0]
    # undirected canonicalization: sorted pair (text2graph.py:441-443)
    assert (r["src_id"], r["tgt_id"]) == ('"LOAD_JSON"', '"PARSE_CONFIG"')
    assert r["weight"] == 8.0


def test_too_few_fields_dropped():
    wire = f'("entity"{D}"A"{D}"T")##("relationship"{D}"A"{D}"B"{D}"d")##<|COMPLETE|>'
    ents, rels = parse_wire(wire)
    assert ents == [] and rels == []


def test_non_float_weight_defaults_to_1():
    wire = f'("relationship"{D}"A"{D}"B"{D}"d"{D}heavy)##<|COMPLETE|>'
    _, rels = parse_wire(wire)
    assert rels[0]["weight"] == 1.0


def test_blank_entity_name_dropped():
    # a name that cleans to empty (control chars only) is dropped
    # (text2graph.py:60-62); NOTE a quoted-empty '""' is truthy and survives,
    # and whitespace-only fields are already removed by the marker splitter
    # (base.py:66-71), shifting the field list.
    wire = f'("entity"{D}\x01\x02{D}"T"{D}"d")##<|COMPLETE|>'
    ents, rels = parse_wire(wire)
    assert ents == [] and rels == []
    wire2 = f'("entity"{D}""{D}"T"{D}"d")##<|COMPLETE|>'
    ents2, _ = parse_wire(wire2)
    assert ents2[0]["entity_name"] == '""'


def test_record_without_parentheses_skipped():
    wire = f'no parens here##("entity"{D}"A"{D}"T"{D}"d")##<|COMPLETE|>'
    ents, _ = parse_wire(wire)
    assert len(ents) == 1


def test_clean_str_html_and_control_chars():
    wire = f'("entity"{D}"A&amp;B\x01"{D}"T"{D}"desc\x1f here")##<|COMPLETE|>'
    ents, _ = parse_wire(wire)
    assert ents[0]["entity_name"] == '"A&B"'
    assert ents[0]["description"] == '"desc here"'


def test_upper_casing():
    wire = f'("entity"{D}"lower_name"{D}"func"{D}"d")##<|COMPLETE|>'
    ents, _ = parse_wire(wire)
    assert ents[0]["entity_name"] == '"LOWER_NAME"'
    assert ents[0]["entity_type"] == '"FUNC"'


def test_extra_fields_relationship_uses_last_as_weight():
    wire = f'("relationship"{D}"A"{D}"B"{D}"d"{D}"x"{D}3.5)##<|COMPLETE|>'
    _, rels = parse_wire(wire)
    assert rels[0]["weight"] == 3.5


# ------------------------------------------------------------- renderer


def test_render_no_module_marker():
    assert parse_wire(render_wire("def f(a):\n    pass")) == ([], [])


def test_render_module_defs_imports_calls():
    content = (
        "# module: pkg.m\n"
        "import other.mod\n"
        "class Big:\n"
        "def f_one(a, b):\n"
        "    x0 = helper(a)\n"
    )
    ents, rels = parse_wire(render_wire(content))
    names = {e["entity_name"] for e in ents}
    assert names == {'"PKG.M"', '"OTHER.MOD"', '"BIG"', '"F_ONE"'}
    kinds = {(r["src_id"], r["tgt_id"]): r["weight"] for r in rels}
    assert kinds[('"OTHER.MOD"', '"PKG.M"')] == 7.0
    assert kinds[('"BIG"', '"PKG.M"')] == 9.0
    assert kinds[('"F_ONE"', '"PKG.M"')] == 9.0
    assert kinds[('"HELPER"', '"PKG.M"')] == 2.0
    # helper is never an entity -> UNKNOWN backfill candidate downstream
    assert '"HELPER"' not in names


def test_actor_pool_extraction_path():
    """The actor-pool seam for model-backed extractors (cfg.extract_actor_pool)
    must produce identical mentions to the task-pool default."""
    import pandas as pd
    import ray.data

    from mmgraphrag_ray.config import KGConfig
    from mmgraphrag_ray.stages.extract import extract_mentions

    chunks = pd.DataFrame(
        {
            "chunk_id": ["c1", "c2"],
            "content": [
                "# module: m1\ndef f(a):\n    x0 = g(a)\n",
                "# module: m2\nimport m1\n",
            ],
            "doc_id": ["d1", "d2"],
            "repo": ["r", "r"],
            "path": ["p1", "p2"],
            "content_sha256": ["s1", "s2"],
            "chunk_order_index": [0, 0],
        }
    )
    ds = ray.data.from_pandas(chunks)
    a = extract_mentions(ds, KGConfig()).to_pandas()
    b = extract_mentions(
        ds, KGConfig(extract_actor_pool=True, extract_concurrency=(1, 2))
    ).to_pandas()
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    b = b[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_batch_extract_parity_with_wire_grammar():
    """The vectorized batch extractor must emit exactly the rows of
    parse_wire(render_wire(content)) per chunk (the conformance contract)."""
    from mmgraphrag_ray.stages.extract import _batch_extract

    contents = [
        "# module: pkg.m\nimport other.mod\nclass Big:\ndef f_one(a):\n    x0 = helper(a)\n",
        "def orphan(a):\n    pass\n",  # no module marker -> nothing
        "import early\n# module: late\nimport early\n",  # marker mid-chunk, dup import
        "# module: a\n# module: b\nimport c\n",  # first marker wins
        "",
    ]
    ents, rels = _batch_extract(contents)
    for i, content in enumerate(contents):
        want_e, want_r = parse_wire(render_wire(content))
        got_e = sorted((r[1], r[2], r[3]) for r in ents if r[0] == i)
        exp_e = sorted((e["entity_name"], e["entity_type"], e["description"]) for e in want_e)
        assert got_e == exp_e, f"chunk {i} entities"
        got_r = sorted((r[1], r[2], r[3], r[4]) for r in rels if r[0] == i)
        exp_r = sorted((r["src_id"], r["tgt_id"], r["description"], r["weight"]) for r in want_r)
        assert got_r == exp_r, f"chunk {i} rels"


def test_gleaning_rounds_accumulate_and_merge():
    """A model seam that yields extra records on the glean round (reference
    text2graph.py:329-351) must have them accumulated per A1 mention
    semantics (appended mention rows that merge downstream)."""
    from mmgraphrag_ray.stages.extract import COMPLETION_DELIM, WireExtractor, render_wire

    D = "<|>"

    def model_fn(content, history):
        if not history:
            return render_wire(content)
        if len(history) == 1:  # first glean round finds one more entity + rel
            return (
                f'("entity"{D}"EXTRA"{D}"FUNCTION"{D}"Found on glean.")##\n'
                f'("relationship"{D}"EXTRA"{D}"M1"{D}"glean rel."{D}3)##\n'
                + COMPLETION_DELIM
            )
        return COMPLETION_DELIM

    ext = WireExtractor(model_fn=model_fn, max_gleaning=2)
    ents, rels = ext.extract_chunk("# module: m1\ndef f(a):\n    pass\n")
    names = [e["entity_name"] for e in ents]
    assert '"EXTRA"' in names and '"M1"' in names and '"F"' in names
    pairs = {(r["src_id"], r["tgt_id"]) for r in rels}
    assert ('"EXTRA"', '"M1"') in pairs  # undirected-canonicalized glean rel


def test_gleaning_loop_check_stops_early():
    from mmgraphrag_ray.stages.extract import COMPLETION_DELIM, WireExtractor

    calls = []

    def model_fn(content, history):
        calls.append(len(history))
        return COMPLETION_DELIM

    # loop_fn returns False -> stop after the first glean round
    ext = WireExtractor(model_fn=model_fn, max_gleaning=5,
                        loop_fn=lambda content, history: False)
    ext.extract_chunk("# module: m\n")
    assert calls == [0, 1]  # initial extract + exactly one glean


def test_gleaning_zero_is_identity_with_default_seam():
    """With the deterministic seam, any max_gleaning yields the same rows
    (glean rounds return only the completion delimiter)."""
    from mmgraphrag_ray.stages.extract import WireExtractor

    content = "# module: m1\nimport x\ndef f(a):\n    y0 = g(a)\n"
    base = WireExtractor(max_gleaning=0).extract_chunk(content)
    gleaned = WireExtractor(max_gleaning=3).extract_chunk(content)
    assert base == gleaned
