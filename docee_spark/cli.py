"""spark-submit entrypoint: webtext parquet in → KG tables out.

Cluster submission (the north-rule shape)::

    zip -r docee_spark.zip docee_spark
    spark-submit --py-files docee_spark.zip docee_spark/cli.py \\
        --input s3://bucket/webtext --output s3://bucket/kg \\
        --mode clique --store s3://bucket/stages --fingerprint <snapshot-id>

Local smoke::

    python -m docee_spark.cli --synth 1000 --output /tmp/kg_out

Resumability: pass ``--store`` + ``--fingerprint`` (the input table's
snapshot id) — stages whose manifest records the same fingerprint are
skipped on rerun (stages/pipeline.py::StageStore).

Incremental recrawl: ``--append`` treats the input as ONE crawl batch —
appended to the store's webtext stage as an Iceberg-style append
snapshot, extracted via the incremental scan's delta only, and folded
into the existing KG with replacement-per-document merge semantics.
Idempotent per batch fingerprint.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description="DocEE-style webtext → KG pipeline")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="webtext parquet path/table")
    src.add_argument("--input-warc", help="WARC file glob (.warc/.warc.gz)")
    src.add_argument("--synth", type=int, help="synthesize N fixture docs instead")
    p.add_argument("--output", required=True, help="output dir for KG tables")
    p.add_argument("--mode", default="clique",
                   choices=["clique", "edag", "greedy", "dcfee",
                            "trigger", "trigger_incremental"])
    p.add_argument("--fused", action="store_true",
                   help="deep-fused heuristic path (fastest; no stage tables)")
    p.add_argument("--langs", default=None, help="comma-separated lang filter")
    p.add_argument("--store", default=None, help="stage-table dir (resumable)")
    p.add_argument("--fingerprint", default="", help="input snapshot id")
    p.add_argument("--entity-dict", default=None,
                   help="json file: surface → coarse type")
    p.add_argument("--tagger-model", default=None,
                   help="CharTagger .npz → tag with the trained model (M1)")
    p.add_argument("--adj-scorer", default=None,
                   help="AdjScorer .npz → trained adjacency matrix (M6)")
    p.add_argument("--ent-fix-mode", default="n", choices=["n", "-", "f"],
                   help="J4 span snapping for the model tagger")
    p.add_argument("--rearrange-max-len", type=int, default=None,
                   help="T2 sentence re-arrangement cap (chars)")
    p.add_argument("--template", default="zheng2019_trigger_graph",
                   help="event-schema template by name (the reference's "
                        "get_event_template): zheng2019_trigger_graph/"
                        "chfinann or wikievents_w_tgg/wikievents")
    p.add_argument("--num-triggers", type=int, default=-1,
                   help="|R| pseudo-trigger tier for trigger modes "
                        "(-1 = guessing mode, reference default)")
    p.add_argument("--emit-links", action="store_true",
                   help="also extract <a href> links from the input html "
                        "and write links/ + host_edges/ next to the KG "
                        "tables (the crawl-frontier graph)")
    p.add_argument("--refine", action="store_true",
                   help="run the full crawl refinery ahead of extraction "
                        "(robots/blocklist/url-dedup hygiene, quality "
                        "gate, PII redaction, exact+MinHash dedup, "
                        "decontamination — stages/refinery.py); every "
                        "stage commits to --store (default: "
                        "<output>/_stages)")
    p.add_argument("--robots", default=None,
                   help="parquet of (host, body) robots.txt captures "
                        "(with --refine)")
    p.add_argument("--blocklist", default=None,
                   help="parquet of (domain) blocked suffixes "
                        "(with --refine)")
    p.add_argument("--decontam-eval", default=None,
                   help="parquet of (doc_id, text) benchmark docs to "
                        "decontaminate against (with --refine)")
    p.add_argument("--link-aliases", default=None,
                   help="parquet of (entity_id, alias) — enable trained "
                        "entity-link scoring: fuzzy triple surfaces "
                        "resolve to these ids before the LSH fallback")
    p.add_argument("--compact-mb", type=int, default=None,
                   help="after the run, compact every committed stage "
                        "table to ~this many MB per file (Iceberg "
                        "rewrite_data_files analog; requires --store "
                        "or --refine)")
    p.add_argument("--ntriples", action="store_true",
                   help="also serialize the KG as N-Triples lines "
                        "(<output>/ntriples, one string column)")
    p.add_argument("--append", action="store_true",
                   help="incremental recrawl ingestion: the input is ONE "
                        "crawl batch — append it to the store's webtext "
                        "stage (Iceberg append snapshot), run extraction "
                        "ONLY on the incremental scan's delta, and fold "
                        "the result into the existing KG with "
                        "merge_triples (replacement semantics per doc). "
                        "Requires --store and --fingerprint (the batch "
                        "id); idempotent — re-submitting an already-"
                        "merged batch is a no-op resume")
    p.add_argument("--rollback", default=None, metavar="STAGE:ID",
                   help="maintenance action: point the stage's current "
                        "snapshot back to ID (Iceberg rollback_to_"
                        "snapshot) and exit — no pipeline run; requires "
                        "--store. Use --synth 0 as the input placeholder")
    p.add_argument("--expire-snapshots", type=int, default=None,
                   metavar="KEEP",
                   help="after the run (or standalone with --synth 0), "
                        "expire all but the newest KEEP snapshots of "
                        "every committed stage (the current snapshot is "
                        "always retained); requires a stage store")
    args = p.parse_args(argv)

    # absolute imports: spark-submit runs this file as a plain __main__
    # script (no parent package), with `docee_spark` supplied by
    # --py-files — relative imports would break under that invocation
    from docee_spark.fixtures import distributed_corpus, heuristic_entity_dict
    from docee_spark.session import get_spark
    from docee_spark.stages.pipeline import StageStore, run_pipeline
    from docee_spark.stages.sinks import write_kg

    # snapshot maintenance short-circuits: pure manifest operations, no
    # Spark session, no pipeline run (--synth 0 is the input placeholder)
    if args.rollback is not None:
        if not args.store:
            p.error("--rollback requires --store")
        stage, _, sid = args.rollback.rpartition(":")
        if not stage or not sid.isdigit():
            p.error("--rollback takes STAGE:ID (e.g. triples:3)")
        rec = StageStore(args.store).rollback(stage, int(sid))
        print(json.dumps({"rolled_back": stage,
                          "current_snapshot_id": rec["snapshot_id"],
                          "input_fingerprint": rec["input_fingerprint"]}))
        return 0
    if args.expire_snapshots is not None and args.synth == 0:
        if not args.store:
            p.error("--expire-snapshots requires --store")
        store = StageStore(args.store)
        expired = {
            m["stage"]: store.expire_snapshots(
                m["stage"], args.expire_snapshots
            )
            for m in store.counters()
        }
        print(json.dumps({"expired": expired}))
        return 0

    spark = get_spark("docee_kg")
    if args.input:
        web = spark.read.parquet(args.input)
    elif args.input_warc:
        from docee_spark.stages.warc import webtext_from_warc

        web = webtext_from_warc(spark, args.input_warc)
    else:
        web = distributed_corpus(spark, args.synth)

    if args.entity_dict:
        with open(args.entity_dict) as f:
            entity_dict = json.load(f)
    else:
        entity_dict = heuristic_entity_dict()

    model = scorer = None
    if args.tagger_model:
        from docee_spark.model.char_tagger import load_tagger

        model = load_tagger(args.tagger_model)
        entity_dict = None  # the trained tagger replaces the dictionary
    if args.adj_scorer:
        # pass the raw arrays through: score_adjacency dispatches the
        # scorer class on artifact keys (logistic / biaffine / doc-ctx /
        # RGCN), so every variant loads with the same flag
        import numpy as np

        with np.load(args.adj_scorer, allow_pickle=False) as z:
            scorer = dict(z.items())

    event_types = None
    if args.template not in ("zheng2019_trigger_graph", "chfinann"):
        from docee_spark.config import get_event_template

        event_types = get_event_template(args.template)

    t0 = time.time()
    if args.append:
        if not args.store or not args.fingerprint:
            p.error("--append requires --store and --fingerprint "
                    "(the crawl batch id)")
        if args.refine or args.fused:
            p.error("--append is the staged incremental path; it is "
                    "incompatible with --refine/--fused")
        from docee_spark.stages.canonicalize import merge_triples

        store = StageStore(args.store)
        fp = args.fingerprint
        if store.exists("triples") and store.is_committed("triples", fp):
            # the whole batch (ingest + merge) already landed: resume
            result = {
                "triples": store.load("triples"),
                "vertices": store.load("vertices"),
                "edges": store.load("edges"),
            }
            batch_rows = 0
        else:
            if store.fingerprint_in_history("webtext", fp):
                # ingested but merge didn't commit (crash between the
                # two): recover the batch's snapshot, recompute its delta
                rec = next(
                    r
                    for r in reversed(store.snapshots("webtext"))
                    if r.get("input_fingerprint") == fp
                )
            else:
                store.commit("webtext", web, fp, mode="append")
                rec = store.snapshots("webtext")[-1]
            if rec.get("parent_id") is None:
                delta = store.load("webtext", rec["snapshot_id"])
            else:
                delta = store.incremental_scan(
                    "webtext", rec["parent_id"], rec["snapshot_id"]
                )
            batch_rows = rec.get("n_rows_added") or delta.count()
            # extraction runs ONLY on the delta (∝ batch, not corpus);
            # no inner store — the merged KG is the committed artifact
            out = run_pipeline(
                delta,
                entity_dict=entity_dict,
                mode=args.mode,
                model=model,
                adj_scorer=scorer,
                ent_fix_mode=args.ent_fix_mode,
                rearrange_max_len=args.rearrange_max_len,
                event_types=event_types,
                num_triggers=args.num_triggers,
            )
            if store.exists("triples"):
                old = store.load("triples")
                merged, vertices, edges = merge_triples(old, out["triples"])
            else:
                merged, vertices, edges = (
                    out["triples"], out["vertices"], out["edges"],
                )
            result = {
                "triples": store.commit("triples", merged, fp),
                "vertices": store.commit("vertices", vertices, fp),
                "edges": store.commit("edges", edges, fp),
            }
        write_kg(result, args.output)
        print(json.dumps({
            "triples": result["triples"].count(),
            "batch_docs": int(batch_rows),
            "seconds": round(time.time() - t0, 1),
            "mode": f"{args.mode}+append",
            "output": args.output,
        }))
        return 0
    if args.refine:
        if args.fused or model is not None or scorer is not None:
            p.error("--refine composes the staged heuristic pipeline; "
                    "it is incompatible with --fused/--tagger-model/"
                    "--adj-scorer")
        from docee_spark.stages.refinery import run_refinery

        store = StageStore(args.store or f"{args.output}/_stages")
        result = run_refinery(
            web,
            store,
            args.fingerprint or "cli",
            robots=spark.read.parquet(args.robots) if args.robots else None,
            blocked=(
                spark.read.parquet(args.blocklist) if args.blocklist else None
            ),
            eval_df=(
                spark.read.parquet(args.decontam_eval)
                if args.decontam_eval
                else None
            ),
            entity_dict=entity_dict,
            mode=args.mode,
            use_html=True,
        )
    else:
        store = StageStore(args.store) if args.store else None
        result = run_pipeline(
            web,
            entity_dict=entity_dict,
            mode=args.mode,
            fused="deep" if args.fused else False,
            langs=tuple(args.langs.split(",")) if args.langs else None,
            store=store,
            input_fingerprint=args.fingerprint,
            use_html=True,
            model=model,
            adj_scorer=scorer,
            ent_fix_mode=args.ent_fix_mode,
            rearrange_max_len=args.rearrange_max_len,
            event_types=event_types,
            num_triggers=args.num_triggers,
            link_aliases=(
                spark.read.parquet(args.link_aliases)
                if args.link_aliases
                else None
            ),
        )
    write_kg(result, args.output)
    if args.ntriples:
        from docee_spark.operators.kgformat import to_ntriples

        to_ntriples(
            spark.read.parquet(f"{args.output}/vertices"),
            spark.read.parquet(f"{args.output}/edges"),
        ).write.mode("overwrite").parquet(f"{args.output}/ntriples")
    if args.emit_links:
        from docee_spark.operators.linkgraph import extract_links, host_edges

        links = extract_links(web.filter(web["html"].isNotNull()))
        links.write.mode("overwrite").parquet(f"{args.output}/links")
        host_edges(spark.read.parquet(f"{args.output}/links")).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/host_edges")
    compacted = None
    if args.compact_mb:
        if store is None:
            p.error("--compact-mb requires a stage store (--store/--refine)")
        target = args.compact_mb * 1024 * 1024
        compacted = {
            m["stage"]: store.compact(m["stage"], target)
            for m in store.counters()
        }
    expired = None
    if args.expire_snapshots is not None:
        if store is None:
            p.error("--expire-snapshots requires a stage store "
                    "(--store/--refine)")
        expired = {
            m["stage"]: store.expire_snapshots(
                m["stage"], args.expire_snapshots
            )
            for m in store.counters()
        }
    n = spark.read.parquet(f"{args.output}/triples").count()
    summary = {
        "triples": n,
        "seconds": round(time.time() - t0, 1),
        "mode": args.mode,
        "output": args.output,
    }
    if args.refine:
        summary["stage_rows"] = {
            k: v.get("n_rows") for k, v in result["counters"].items()
        }
    if compacted is not None:
        summary["compacted_files"] = {
            k: [v["files_before"], v["files_after"]] for k, v in compacted.items()
        }
    if expired is not None:
        summary["expired_snapshots"] = expired
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
