"""spark-submit entry point for the link-graph tier — pages → host graph
→ PageRank → crawl priorities:

    spark-submit --py-files htmlps.zip jobs/graph_job.py \
        --pages <pages parquet | synth:<sf_dir> | warc:<glob>> \
        --output <dir> [--partitions 256] [--iterations 3] \
        [--budget-pages 0] [--hits] [--communities] [--reciprocity]
        [--collapse-domains]

Chain (each step's scale shape documented at its op):

  pages → extract_page_meta (ONE Arrow stage: outlinks per page)
        → host_edges (explode + parse_url + groupBy-count)
        → pagerank_fixed_point (bit-exact integer mass units)
        → host_graph_stats (degrees/weights/reciprocity)
        → [crawl_budget when --budget-pages > 0]
        → parquet: <out>/edges, <out>/ranks (ranks ⋈ stats [⋈ quota])

Emits ONE JSON line of graph metrics (pages, hosts, edges, total edge
weight, top host by rank).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet dir, synth:<sf_dir>, or warc:<glob>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--budget-pages", type=int, default=0,
                    help="also assign proportional crawl quotas (0 = skip)")
    ap.add_argument("--hits", action="store_true",
                    help="also compute integer-exact HITS hubs/authorities "
                         "and join them onto ranks")
    ap.add_argument("--communities", action="store_true",
                    help="also run deterministic label propagation and "
                         "join the community id onto ranks")
    ap.add_argument("--collapse-domains", action="store_true",
                    help="collapse hosts to their PSL registered domain "
                         "BEFORE ranking (blog.example.co.uk and "
                         "www.example.co.uk become one node; "
                         "ops/web.registered_domain_psl — pure-codegen "
                         "suffix match, then one re-aggregate of the "
                         "edge list): rank domains, not subdomains, so "
                         "subdomain farms cannot multiply their vote")
    ap.add_argument("--reciprocity", action="store_true",
                    help="join per-host link reciprocity (out_n / "
                         "reciprocated_n / reciprocity_ppm — the "
                         "link-exchange screen) onto the ranks table")
    ap.add_argument("--seeds", default="",
                    help="comma-separated trusted seed hosts (required by "
                         "--trustrank / --seed-depth)")
    ap.add_argument("--trustrank", action="store_true",
                    help="also run seed-gated TrustRank (spam demotion) and "
                         "join the trust mass onto ranks")
    ap.add_argument("--seed-depth", type=int, default=0,
                    help="also compute min click-depth from the seed set "
                         "(BFS, this many hops) and join seed_dist onto "
                         "ranks (unreached hosts stay NULL)")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from html_parser_spark.ops.html_meta import extract_page_meta
    from html_parser_spark.ops.linkgraph import (
        crawl_budget,
        host_edges,
        host_graph_stats,
        pagerank_fixed_point,
    )
    from html_parser_spark.spark.pipeline import salted_repartition

    spark = SparkSession.getActiveSession()
    if spark is None:
        from html_parser_spark.spark.session import get_spark

        spark = get_spark(app_name="graph-job")

    if args.pages.startswith("synth:"):
        from html_parser_spark.data.pages import pages_df

        pages = pages_df(spark, args.pages.split(":", 1)[1], include_fixtures=False)
    elif args.pages.startswith("warc:"):
        from html_parser_spark.sources.warc import read_warc

        pages = read_warc(spark, args.pages.split(":", 1)[1])
    else:
        pages = spark.read.parquet(args.pages)
    if args.limit:
        pages = pages.limit(args.limit)
    pages = pages.select("url", "html")
    if args.partitions:
        pages = salted_repartition(pages, args.partitions)
    n_pages = pages.count()

    meta = extract_page_meta(pages).select("url", "outlinks")
    edges = host_edges(meta)
    if args.collapse_domains:
        from html_parser_spark.ops.web import registered_domain_psl

        edges = (
            edges.select(
                registered_domain_psl(F.col("src")).alias("src"),
                registered_domain_psl(F.col("dst")).alias("dst"),
                "weight",
            )
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.sum("weight").cast("long").alias("weight"))
        )
    edges.write.mode("overwrite").parquet(os.path.join(args.output, "edges"))
    edges = spark.read.parquet(os.path.join(args.output, "edges"))

    ranks = pagerank_fixed_point(edges, iterations=args.iterations)
    stats = host_graph_stats(edges)
    out = ranks.join(stats, "node", "left")
    if args.hits:
        from html_parser_spark.ops.linkgraph import hits_fixed_point

        out = out.join(
            hits_fixed_point(edges, iterations=args.iterations), "node", "left"
        )
    if args.communities:
        from html_parser_spark.ops.linkgraph import label_propagation

        out = out.join(
            label_propagation(edges, iterations=args.iterations), "node", "left"
        )
    if args.reciprocity:
        from html_parser_spark.ops.linkgraph import reciprocity

        out = out.join(
            reciprocity(edges).withColumnRenamed("host", "node"),
            "node",
            "left",
        )
    if args.trustrank or args.seed_depth > 0:
        if not args.seeds:
            raise SystemExit("--trustrank/--seed-depth require --seeds")
        seeds = spark.createDataFrame(
            [(h.strip(),) for h in args.seeds.split(",") if h.strip()],
            ["node"],
        )
        if args.trustrank:
            from html_parser_spark.ops.linkgraph import trustrank_fixed_point

            out = out.join(
                trustrank_fixed_point(
                    edges, seeds, iterations=args.iterations
                ).withColumnRenamed("rank", "trust"),
                "node",
                "left",
            )
        if args.seed_depth > 0:
            from html_parser_spark.ops.linkgraph import seed_distance

            out = out.join(
                seed_distance(edges, seeds, max_hops=args.seed_depth)
                .withColumnRenamed("dist", "seed_dist"),
                "node",
                "left",
            )
    if args.budget_pages > 0:
        out = crawl_budget(out, args.budget_pages)
    out.write.mode("overwrite").parquet(os.path.join(args.output, "ranks"))
    out = spark.read.parquet(os.path.join(args.output, "ranks"))

    top = out.orderBy(F.desc("rank")).first()
    agg = edges.agg(
        F.count("*").alias("edges"),
        F.coalesce(F.sum("weight"), F.lit(0)).cast("long").alias("weight"),
    ).collect()[0]
    print(json.dumps({
        "job": "graph",
        "pages": int(n_pages),
        "hosts": int(out.count()),
        "edges": int(agg["edges"]),
        "edge_weight": int(agg["weight"]),
        "top_host": top["node"] if top else None,
        "top_rank": int(top["rank"]) if top else 0,
        **({"communities": int(out.select("community").distinct().count())}
           if args.communities else {}),
        **({"seed_reached": int(
                out.filter(F.col("seed_dist").isNotNull()).count())}
           if args.seed_depth > 0 else {}),
        **({"reciprocal_hosts": int(
                out.filter(F.col("reciprocity_ppm") > 0).count())}
           if args.reciprocity else {}),
    }))


if __name__ == "__main__":
    main()
