"""CLI entry — the reference's script entry point (§3.3,
mmgraphrag_test.py / run_job.sh) as a Ray job driver:

    python -m mmgraphrag_ray index  --corpus DIR --out DIR [--no-canonicalize]
    python -m mmgraphrag_ray query  --out DIR "question text"
    python -m mmgraphrag_ray bench-corpus --n 8000 --tag mytag

Owns the Ray session (library code never calls ray.init); on a cluster the
same module runs under `ray job submit -- python -m mmgraphrag_ray ...`.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mmgraphrag_ray")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_index = sub.add_parser("index", help="build the KG from a files corpus")
    p_index.add_argument("--corpus", required=True)
    p_index.add_argument("--out", required=True)
    p_index.add_argument("--no-canonicalize", action="store_true")

    p_query = sub.add_parser("query", help="local-query context over an indexed out dir")
    p_query.add_argument("--out", required=True)
    p_query.add_argument("text")

    p_cur = sub.add_parser(
        "curate", help="training-data hygiene pass over the documents table"
    )
    p_cur.add_argument("--sf-dir", required=True)
    p_cur.add_argument("--out", required=True)

    p_corp = sub.add_parser("bench-corpus", help="generate a deterministic corpus")
    p_corp.add_argument("--n", type=int, required=True)
    p_corp.add_argument("--tag", default="cli")

    args = parser.parse_args(argv)

    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from mmgraphrag_ray.runtime import configure

    configure()
    try:
        if args.cmd == "bench-corpus":
            from mmgraphrag_ray.corpus import ensure_corpus_n

            print(ensure_corpus_n(args.n, args.tag))
        elif args.cmd == "curate":
            from mmgraphrag_ray.pipelines.curate import run_curation

            t0 = time.time()
            stats = run_curation(args.sf_dir, args.out)
            print(
                json.dumps(
                    {**stats, "wall_sec": round(time.time() - t0, 2)},
                    indent=2,
                )
            )
        elif args.cmd == "index":
            from mmgraphrag_ray.pipelines.kg import run_kg

            t0 = time.time()
            stages = run_kg(
                args.corpus, args.out, canonicalize=not args.no_canonicalize
            )
            print(
                json.dumps(
                    {"stages": stages, "wall_sec": round(time.time() - t0, 2)},
                    indent=2,
                )
            )
        elif args.cmd == "query":
            from mmgraphrag_ray.query import build_local_context
            from mmgraphrag_ray.state.lineage import read_stage

            out = args.out
            nodes = read_stage(out, "canonical_nodes" if os.path.exists(
                os.path.join(out, "canonical_nodes")) else "nodes")
            edges = read_stage(out, "canonical_edges" if os.path.exists(
                os.path.join(out, "canonical_edges")) else "edges")
            chunks = read_stage(out, "chunks")
            if os.path.exists(os.path.join(out, "entity_vecs")):
                vecs = read_stage(out, "entity_vecs")
            else:
                # index --no-canonicalize doesn't persist entity_vecs:
                # build them on the fly from the nodes we just loaded
                from mmgraphrag_ray.stages.embed import build_entity_vecs

                vecs = build_entity_vecs(nodes)
            ctx = build_local_context(
                args.text, nodes, edges, chunks, vecs,
                audit_dir=os.path.join(out, "audit"),
            )
            print("-----Entities-----")
            print(ctx["entities_csv"])
            print("-----Relationships-----")
            print(ctx["relations_csv"])
            print("-----Sources-----")
            print(ctx["text_units_csv"][:2000])
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
