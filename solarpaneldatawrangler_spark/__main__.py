"""CLI entry point — the Spark-native counterpart of the reference's
run_entire_process.py / process_city_shapes.py argparse tools.

    python -m solarpaneldatawrangler_spark list
    python -m solarpaneldatawrangler_spark query q01_priority_scan \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m solarpaneldatawrangler_spark explain q06_broadcast_join_agg
    python -m solarpaneldatawrangler_spark pipeline-demo --out /tmp/out
"""

from __future__ import annotations

import argparse
import sys


def _spark(cpus: int | None = None):
    from solarpaneldatawrangler_spark.session import get_spark

    return get_spark("spark-wrangler-cli", cpus=cpus)


def cmd_list(_args) -> int:
    from solarpaneldatawrangler_spark.plans import CATALOG

    for name, spec in sorted(CATALOG.items()):
        kind = "oracle" if spec.oracle else "rows-only"
        first_line = (spec.doc or "").split(". ")[0][:100]
        print(f"{name:28s} [{kind}] {first_line}")
    return 0


def cmd_query(args) -> int:
    from solarpaneldatawrangler_spark.plans import CATALOG

    if args.name not in CATALOG:
        print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
        return 2
    df = CATALOG[args.name].fn(_spark(args.cpus), args.sf_dir)
    df.show(args.limit, truncate=False)
    return 0


def cmd_explain(args) -> int:
    from solarpaneldatawrangler_spark.plans import CATALOG

    if args.name not in CATALOG:
        print(f"unknown query: {args.name} (see `list`)", file=sys.stderr)
        return 2
    CATALOG[args.name].fn(_spark(args.cpus), args.sf_dir).explain("formatted")
    return 0


def cmd_pipeline_demo(args) -> int:
    """Run the full E1 pipeline on a synthetic city with the mock
    classifier and write MapRoulette JSONL (offline-safe demo)."""
    from pyspark.sql import functions as F

    import json

    from solarpaneldatawrangler_spark.pipeline import run_pipeline
    from solarpaneldatawrangler_spark.sources.geojson import write_jsonl
    from solarpaneldatawrangler_spark.sources.nominatim import parse_nominatim_response

    spark = _spark(args.cpus)
    d = 0.05
    lon0, lat0 = -100.0, 40.0
    ring = [[lon0, lat0], [lon0 + d, lat0], [lon0 + d, lat0 + d], [lon0, lat0 + d], [lon0, lat0]]
    # start from a canned Nominatim response (first result is a Point,
    # which the parser must skip — gather_city_shapes.py:46-55)
    body = json.dumps(
        [
            {"display_name": "Demo City (node)", "geojson": {"type": "Point", "coordinates": [lon0, lat0]}},
            {"display_name": "Demo City, DC", "geojson": {"type": "Polygon", "coordinates": [ring]}},
        ]
    )
    responses = spark.createDataFrame([("Demo City, DC", body)], "req_id string, body string")
    city = parse_nominatim_response(responses, key_cols=["req_id"]).select(
        F.col("display_name").alias("name"), "rings"
    )
    osm = spark.createDataFrame([(lon0 + d / 2, lat0 + d / 2)], "longitude double, latitude double")

    def mock_classify(tiles):
        return tiles.withColumn(
            "panel_softmax",
            F.when((F.col("column") + F.col("row")) % 7 == 0, 0.9).otherwise(0.05),
        )

    out = run_pipeline(city, osm, mock_classify, zoom=args.zoom)
    write_jsonl(out, args.out, single_file=True)
    n = spark.read.text(args.out).count()
    print(f"wrote {n} GeoJSON feature lines to {args.out}")
    return 0


def cmd_curate_demo(args) -> int:
    """Run the corpus-curation pipeline over the documents table and
    print the per-stage report (the text twin of pipeline-demo)."""
    from solarpaneldatawrangler_spark.pipeline_text import curate_corpus
    from solarpaneldatawrangler_spark.sources.star import load_table

    spark = _spark(args.cpus)
    docs = load_table(spark, args.sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    out, rep = curate_corpus(
        docs,
        min_quality=args.min_quality,
        language=args.language or None,
        jaccard_threshold=args.jaccard,
    )
    print(
        f"input={rep.n_input} exact_dedup={rep.n_after_exact_dedup} "
        f"near_dedup={rep.n_after_near_dedup} quality={rep.n_after_quality} "
        f"language={rep.n_after_language} output={rep.n_output}"
    )
    out.select("doc_id", "lang", "source").show(10)
    if args.release:
        from solarpaneldatawrangler_spark.operators.curation import (
            verify_corpus_jsonl,
            write_corpus_jsonl,
        )

        manifest = write_corpus_jsonl(
            out.select("doc_id", "text", "lang", "source"),
            args.release,
            n_shards=args.release_shards,
        )
        ok = verify_corpus_jsonl(spark, args.release)
        print(
            f"released {manifest['total_docs']} docs in "
            f"{manifest['n_shards']} JSONL shards to {args.release} "
            f"(manifest verified: {ok})"
        )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="solarpaneldatawrangler_spark")
    p.add_argument("--cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    q = sub.add_parser("query", help="run a catalog query and show rows")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)

    e = sub.add_parser("explain", help="print a query's physical plan")
    e.add_argument("name")
    e.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    d = sub.add_parser("pipeline-demo", help="run the E2E pipeline on a synthetic city")
    d.add_argument("--out", default="/tmp/spark_wrangler_demo_out")
    d.add_argument("--zoom", type=int, default=15)

    c = sub.add_parser("curate-demo", help="run the corpus-curation pipeline on documents")
    c.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    c.add_argument("--min-quality", type=float, default=0.2)
    c.add_argument("--language", default="en")
    c.add_argument("--jaccard", type=float, default=0.8)
    c.add_argument("--release", default=None,
                   help="also write the survivors as sharded JSONL + manifest here")
    c.add_argument("--release-shards", type=int, default=8)

    args = p.parse_args(argv)
    return {
        "list": cmd_list,
        "query": cmd_query,
        "explain": cmd_explain,
        "pipeline-demo": cmd_pipeline_demo,
        "curate-demo": cmd_curate_demo,
    }[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
