"""spark-submit entry point for the COMPOSED crawl-to-corpus pipeline —
the whole extract→curate→graph chain as ONE resumable job:

    spark-submit --py-files htmlps.zip jobs/flagship_job.py \
        --pages <parquet | synth:<sf_dir> | warc:<glob>> --output <dir> \
        [--robots <parquet>] [--partitions 64] [--min-tokens 10] \
        [--gopher] [--scrub-pii] [--span-dedup-tokens 0] \
        [--chunk-tokens 0] [--iterations 3] [--budget-pages 0] \
        [--stop-after extract|graph|curate|chunks] [--limit 0]

Stage DAG (each stage's scale shape documented at its op):

  pages ──robots gate──▶ EXTRACT   FUSED kernel (ops/page_kernel.py): ONE
                                   parse per page → main-content strip +
                                   outlinks + meta robots; chunk-level
                                   resume via CheckpointedExtraction
                                   (anti-join of done urls — a killed run
                                   re-does at most the in-flight chunk)
                                                          → <out>/extract/
  extract ─────────────▶ GRAPH    materialized outlinks → host edges →
                                   integer PageRank [→ crawl budget] — no
                                   second parse of any page → <out>/graph/
  extract ─────────────▶ CURATE   noindex gate → canon url → latest
                                   capture → [host-line dedup] → quality
                                   gate [+Gopher] → [span dedup] → [PII]
                                   → near-dup survivors → split
                                                          → <out>/curate/docs
  curate ──────────────▶ CHUNKS   context-window chunk plan (optional)
                                                          → <out>/curate/chunks

Cross-stage resume: every completed stage writes a ``_STAGE_DONE.json``
marker carrying a CONTENT fingerprint of its input (row count + xor of
per-row xxhash64 over the key columns) PLUS the stage's own options; a
re-run skips a stage iff its marker exists AND the fingerprint still
matches (so adding, replacing, or re-crawling pages — or changing a
stage flag like --c4-lines or --chunk-tokens — invalidates the affected
stages automatically, while a same-input same-config re-run recomputes
nothing).  The extract stage is
additionally resumable WITHIN the stage through the chunked checkpoint.
Every stage also appends one row to ``<out>/_stage_lineage`` —
(stage, action ran/skipped, input_fingerprint, rows_out, wall_sec) — on
top of the extract stage's own per-partition lineage, so the whole DAG's
history is queryable.

``--stop-after`` ends the run at a stage boundary (the test harness uses
it to simulate a kill between stages).  Emits ONE JSON line of combined
metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ("extract", "graph", "curate", "chunks")


def _marker_path(stage_dir: str) -> str:
    return os.path.join(stage_dir, "_STAGE_DONE.json")


def _fingerprint(df, *cols) -> tuple[int, str]:
    """(row count, "count:xor-of-xxhash64(cols)") — a CONTENT fingerprint,
    not a bare cardinality: replacing the input with a different same-size
    subset (e.g. an unordered limit picking other rows, or re-crawled
    captures under the same urls) must invalidate downstream stages, which
    a row count alone cannot see.  bit_xor of per-row hashes is
    order/partitioning-independent; the count guards the xor's one blind
    spot (duplicate rows cancelling pairwise).  One partial-agg pass."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(" + ", ".join(cols) + "))").alias("x"),
    ).first()
    return int(row["n"]), f"{row['n']}:{row['x']}"


def _stage_done(stage_dir: str, fingerprint: str) -> bool:
    try:
        with open(_marker_path(stage_dir)) as f:
            return json.load(f).get("input_fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def _write_marker(stage_dir: str, fingerprint: str, **metrics) -> None:
    os.makedirs(stage_dir, exist_ok=True)
    tmp = _marker_path(stage_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"input_fingerprint": fingerprint, **metrics}, f)
    os.replace(tmp, _marker_path(stage_dir))  # atomic: no torn marker


def _append_stage_lineage(spark, out_dir, stage, action, fingerprint,
                          rows_out, wall_sec) -> None:
    row = [(stage, action, str(fingerprint), int(rows_out), float(wall_sec))]
    spark.createDataFrame(
        row, "stage string, action string, input_fingerprint string, "
             "rows_out long, wall_sec double"
    ).coalesce(1).write.mode("append").parquet(
        os.path.join(out_dir, "_stage_lineage")
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True,
                    help="pages parquet dir, synth:<sf_dir>, or warc:<glob>")
    ap.add_argument("--output", required=True)
    ap.add_argument("--robots", default="",
                    help="parquet of robots.txt bodies (host, body)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--min-tokens", type=int, default=10)
    ap.add_argument("--gopher", action="store_true")
    ap.add_argument("--scrub-pii", action="store_true")
    ap.add_argument("--span-dedup-tokens", type=int, default=0)
    ap.add_argument(
        "--host-line-dedup", action="store_true",
        help="strip lines repeated across a host's pages (CCNet-style "
             "cross-page boilerplate, ops/corpus.host_line_dedup) before "
             "the quality gates",
    )
    ap.add_argument(
        "--host-line-pct", type=int, default=5,
        help="a line is host-boilerplate when on >=2 pages AND >= this "
             "percent of the host's pages (--host-line-dedup)",
    )
    ap.add_argument("--chunk-tokens", type=int, default=0)
    ap.add_argument("--c4-lines", action="store_true",
                    help="C4 line-level cleaning before the doc gates")
    ap.add_argument("--pack-seq-len", type=int, default=0,
                    help="write the packed-sequence export per split (0=off)")
    ap.add_argument("--num-hashes", type=int, default=8)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--budget-pages", type=int, default=0)
    ap.add_argument("--max-html-bytes", type=int, default=8 * 1024 * 1024)
    ap.add_argument("--stop-after", choices=STAGES, default="")
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F

    from html_parser_spark.ops.page_kernel import extract_page_full
    from html_parser_spark.spark.checkpoint import CheckpointedExtraction
    from html_parser_spark.spark.pipeline import salted_repartition

    spark = SparkSession.getActiveSession()
    if spark is None:
        from html_parser_spark.spark.session import get_spark

        spark = get_spark(app_name="flagship-job")

    # ---- source + politeness gate (shared by extract and graph) -----------
    if args.pages.startswith("synth:"):
        from html_parser_spark.data.pages import pages_df

        pages = pages_df(spark, args.pages.split(":", 1)[1], include_fixtures=True)
    elif args.pages.startswith("warc:"):
        from html_parser_spark.sources.warc import read_warc

        pages = read_warc(spark, args.pages.split(":", 1)[1]).select(
            "url", "warc_ts", "html", F.lit(None).cast("string").alias("lang")
        )
    else:
        pages = spark.read.parquet(args.pages)
    if args.limit:
        # deterministic subset: a bare limit() without an order can pick a
        # different subset per run/partitioning, silently desynchronizing
        # resumed stages; TakeOrderedAndProject keeps this a per-partition
        # top-n + merge, not a full sort shuffle (dev/test knob anyway)
        pages = pages.orderBy("url", "warc_ts").limit(args.limit)
    if args.robots:
        from html_parser_spark.ops.robots import (
            parse_robots,
            robots_filter,
            robots_groups,
        )

        robots = spark.read.parquet(args.robots)
        pages = robots_filter(
            pages, parse_robots(robots), groups=robots_groups(robots)
        )
    pages = pages.select("url", "warc_ts", "html", "lang")
    from pyspark import StorageLevel

    # both extract and graph consume the gated pages; persist so a WARC
    # source is inflated (and robots evaluated) once, not per stage
    pages = pages.persist(StorageLevel.MEMORY_AND_DISK)
    n_pages, fp_pages = _fingerprint(pages, "url", "warc_ts")

    # A stage marker must bind to BOTH the input content and the options
    # that shape the stage's output — otherwise rerunning with a changed
    # flag (e.g. adding --c4-lines) would silently skip recomputation.
    # Config rides inside the fingerprint string; same-config reruns
    # still match, and markers written before this scheme simply re-run
    # once (conservative).
    def _with_cfg(fp: str, *pairs) -> str:
        return fp + "|cfg:" + ",".join(f"{k}={v}" for k, v in pairs)

    fp_ex = _with_cfg(fp_pages, ("partitions", args.partitions),
                      ("max_html_bytes", args.max_html_bytes))
    fp_g = _with_cfg(fp_pages, ("iterations", args.iterations),
                     ("budget_pages", args.budget_pages))

    report: dict = {"job": "flagship", "pages_in": n_pages,
                    "stages": {}}

    def finish(stage: str) -> bool:
        return args.stop_after == stage

    # ---- stage 1: EXTRACT (chunk-resumable main-content strip) ------------
    ex_dir = os.path.join(args.output, "extract")
    t0 = time.time()
    if _stage_done(ex_dir, fp_ex):
        results = spark.read.parquet(os.path.join(ex_dir, "data"))
        report["stages"]["extract"] = {
            "action": "skipped", "docs": results.count()}
        _append_stage_lineage(spark, args.output, "extract", "skipped",
                             fp_ex, report["stages"]["extract"]["docs"],
                             time.time() - t0)
    else:
        def _mc(src):
            src = src.select("url", "warc_ts", "html", "lang")
            if args.partitions:
                src = salted_repartition(src, args.partitions)
            # FUSED kernel: one parse per page feeds the main-content walk
            # AND the metadata walk — outlinks materialize here so the
            # graph stage never re-parses, and robots feeds the curate
            # stage's noindex gate
            return extract_page_full(
                src, max_html_bytes=args.max_html_bytes or None
            ).select(
                "url", "warc_ts", "lang", "main_text", "n_blocks",
                "n_content_blocks", "content_chars", "boiler_chars",
                "outlinks", "robots",
                F.length("html").alias("n_bytes_in"),
            )

        # The chunked checkpoint resumes by anti-joining done urls — the
        # right behavior when the INPUT grew (only new pages re-extract),
        # but wrong when the stage CONFIG changed (done rows carry the
        # old config's output).  Split the mismatch: same config ->
        # incremental resume; changed config -> clear and redo fully.
        # The config is pinned at stage START (_STAGE_CONFIG.json written
        # before the first chunk): a run killed mid-extract leaves chunks
        # but no completion marker, and a changed --partitions /
        # --max-html-bytes re-run must still wipe those chunks instead of
        # anti-join-mixing rows from two configs.  The completion marker
        # is the fallback for dirs created before this scheme.
        cfg_path = os.path.join(ex_dir, "_STAGE_CONFIG.json")
        new_cfg = fp_ex.split("|cfg:")[-1]
        old_cfg = ""
        try:
            with open(cfg_path) as _f:
                old_cfg = json.load(_f).get("cfg", "")
        except (OSError, ValueError):
            try:
                with open(_marker_path(ex_dir)) as _f:
                    _old_fp = json.load(_f).get("input_fingerprint", "")
                old_cfg = _old_fp.split("|cfg:")[-1] if _old_fp else ""
            except (OSError, ValueError):
                old_cfg = ""
        if old_cfg and old_cfg != new_cfg:
            import shutil

            shutil.rmtree(ex_dir, ignore_errors=True)
        os.makedirs(ex_dir, exist_ok=True)
        with open(cfg_path + ".tmp", "w") as _f:
            json.dump({"cfg": new_cfg}, _f)
        os.replace(cfg_path + ".tmp", cfg_path)
        ck = CheckpointedExtraction(spark, ex_dir)
        m = ck.run(pages, transform=_mc)
        results = ck.results()
        n_res = results.count()
        _write_marker(ex_dir, fp_ex, docs=n_res)
        report["stages"]["extract"] = {
            "action": "ran", "docs": n_res, "docs_new": m["docs"],
            "chunk": m["chunk"]}
        _append_stage_lineage(spark, args.output, "extract", "ran",
                             fp_ex, n_res, time.time() - t0)
    if finish("extract"):
        print(json.dumps(report))
        return

    # ---- stage 2: GRAPH (host link graph / PageRank / crawl budget) -------
    g_dir = os.path.join(args.output, "graph")
    t0 = time.time()
    if _stage_done(g_dir, fp_g):
        report["stages"]["graph"] = {"action": "skipped"}
        _append_stage_lineage(spark, args.output, "graph", "skipped",
                             fp_g, 0, time.time() - t0)
    else:
        from html_parser_spark.ops.linkgraph import (
            crawl_budget,
            host_edges,
            host_graph_stats,
            pagerank_fixed_point,
        )

        # outlinks were materialized by the fused extract kernel — the
        # graph stage is pure relational work over the extract output,
        # no second parse of any page
        meta = results.select("url", "outlinks")
        edges = host_edges(meta)
        edges.write.mode("overwrite").parquet(os.path.join(g_dir, "edges"))
        edges = spark.read.parquet(os.path.join(g_dir, "edges"))
        ranks = pagerank_fixed_point(edges, iterations=args.iterations)
        stats = host_graph_stats(edges)
        out = ranks.join(stats, "node", "left")
        if args.budget_pages > 0:
            out = crawl_budget(out, args.budget_pages)
        out.write.mode("overwrite").parquet(os.path.join(g_dir, "ranks"))
        n_hosts = spark.read.parquet(os.path.join(g_dir, "ranks")).count()
        _write_marker(g_dir, fp_g, hosts=n_hosts)
        report["stages"]["graph"] = {
            "action": "ran", "hosts": n_hosts, "edges": edges.count()}
        _append_stage_lineage(spark, args.output, "graph", "ran",
                             fp_g, n_hosts, time.time() - t0)
    if finish("graph"):
        print(json.dumps(report))
        return

    # ---- stage 3: CURATE (extract output → training-ready docs) -----------
    from jobs.curate_job import curate_docs

    from html_parser_spark.ops.web import canonicalize_url, latest_capture

    n_extracted, fp_extract = _fingerprint(results, "url", "warc_ts")
    fp_cu = _with_cfg(
        fp_extract,
        ("min_tokens", args.min_tokens), ("gopher", args.gopher),
        ("span", args.span_dedup_tokens), ("pii", args.scrub_pii),
        ("hashes", args.num_hashes), ("bands", args.bands),
        ("hld", args.host_line_dedup), ("hld_pct", args.host_line_pct),
        ("c4", args.c4_lines),
    )
    cu_dir = os.path.join(args.output, "curate")
    out_docs = os.path.join(cu_dir, "docs")
    t0 = time.time()
    if _stage_done(cu_dir, fp_cu):
        final = spark.read.parquet(out_docs)
        report["stages"]["curate"] = {
            "action": "skipped", "docs": final.count()}
        _append_stage_lineage(spark, args.output, "curate", "skipped",
                             fp_cu, report["stages"]["curate"]["docs"],
                             time.time() - t0)
    else:
        from html_parser_spark.ops.html_meta import noindex_filter

        # honor page-level REP before training-data curation: a page whose
        # meta robots says noindex is excluded the same way robots.txt-
        # disallowed pages never entered the pipeline
        res = (
            noindex_filter(results)
            .where(F.col("main_text").isNotNull())
            .select(
                canonicalize_url("url").alias("url"),
                "warc_ts",
                F.col("main_text").alias("extracted_text"),
                "lang",
            )
        )
        res = latest_capture(res)
        n_host_lines = None
        if args.host_line_dedup:
            from pyspark import StorageLevel as _SL

            from html_parser_spark.ops.corpus import host_line_dedup

            # url is unique after latest_capture, so it is the line-dedup
            # doc id; host comes straight off it.  Persist before the two
            # consumers (metric agg + join) so the three-shuffle dedup
            # plan runs once
            hosted = res.withColumn(
                "_host", F.parse_url(F.col("url"), F.lit("HOST"))
            )
            hld = host_line_dedup(
                hosted, host_col="_host", id_col="url",
                text_col="extracted_text",
                min_pages=2, pct_pages=args.host_line_pct,
            ).persist(_SL.MEMORY_AND_DISK)
            n_host_lines = int(
                hld.agg(F.sum("n_lines_removed")).collect()[0][0] or 0
            )
            res = res.drop("extracted_text").join(
                hld.select(
                    F.col("doc_id").alias("url"),
                    F.col("clean_text").alias("extracted_text"),
                ),
                "url",
            )
        docs = res.select(
            F.xxhash64("url").alias("doc_id"),
            F.col("extracted_text").alias("text"),
            "lang",
        )
        if args.c4_lines:
            # C4 line-level cleaning before the doc-level gates (same
            # placement as curate_job --c4-lines)
            from html_parser_spark.ops.text import c4_line_filter

            cleaned = c4_line_filter(docs).where("page_keep").select(
                "doc_id", F.col("clean_text").alias("text")
            )
            docs = docs.select("doc_id", "lang").join(cleaned, "doc_id").select(
                "doc_id", "text", "lang"
            )
        curated, funnel = curate_docs(
            docs,
            min_tokens=args.min_tokens,
            gopher=args.gopher,
            span_dedup_tokens=args.span_dedup_tokens,
            scrub_pii=args.scrub_pii,
            num_hashes=args.num_hashes,
            bands=args.bands,
        )
        curated.write.mode("overwrite").partitionBy("split").parquet(out_docs)
        final = spark.read.schema(curated.schema).parquet(out_docs)
        n_final = final.count()
        _write_marker(cu_dir, fp_cu, **funnel)
        report["stages"]["curate"] = {
            "action": "ran", **funnel, "docs": n_final,
            **({"host_lines_removed": n_host_lines}
               if n_host_lines is not None else {}),
        }
        _append_stage_lineage(spark, args.output, "curate", "ran",
                             fp_cu, n_final, time.time() - t0)
    if finish("curate"):
        print(json.dumps(report))
        return

    # ---- stage 4: CHUNKS (optional context-window plan) --------------------
    if args.chunk_tokens > 0:
        from html_parser_spark.ops.corpus import chunk_plan

        n_docs_final, fp_final = _fingerprint(final, "doc_id")
        fp_ch = _with_cfg(fp_final, ("chunk_tokens", args.chunk_tokens))
        ch_dir = os.path.join(cu_dir, "chunks_stage")
        out_chunks = os.path.join(cu_dir, "chunks")
        t0 = time.time()
        if _stage_done(ch_dir, fp_ch):
            n_chunks = spark.read.parquet(out_chunks).count()
            action = "skipped"
        else:
            chunks = chunk_plan(final, chunk_tokens=args.chunk_tokens)
            chunks.write.mode("overwrite").parquet(out_chunks)
            n_chunks = spark.read.parquet(out_chunks).count()
            _write_marker(ch_dir, fp_ch, chunks=n_chunks)
            action = "ran"
        report["stages"]["chunks"] = {"action": action, "chunks": n_chunks}
        _append_stage_lineage(spark, args.output, "chunks", action,
                             fp_ch, n_chunks, time.time() - t0)

    # ---- stage 5: SEQUENCES (optional packed training export) --------------
    if args.pack_seq_len > 0:
        from html_parser_spark.ops.corpus import (
            materialize_sequences,
            pack_sequences,
        )

        n_docs_final, fp_final = _fingerprint(final, "doc_id")
        fp_sq = _with_cfg(fp_final, ("pack_seq_len", args.pack_seq_len))
        sq_dir = os.path.join(cu_dir, "sequences_stage")
        out_seqs = os.path.join(cu_dir, "sequences")
        t0 = time.time()
        split_names = sorted(
            r["split"] for r in final.select("split").distinct().collect()
        )
        if _stage_done(sq_dir, fp_sq):
            n_seqs = (
                spark.read.parquet(out_seqs).count()
                if os.path.isdir(out_seqs)
                else 0
            )
            action = "skipped"
        else:
            # clear first: the per-split overwrite only replaces splits
            # present in THIS run; a rerun whose split set shrank must not
            # leave a stale split=<name> dir in the read path
            import shutil

            shutil.rmtree(out_seqs, ignore_errors=True)
            for split_name in split_names:
                part = final.where(F.col("split") == split_name).select(
                    "doc_id", "text"
                )
                plan = pack_sequences(part, seq_len=args.pack_seq_len)
                materialize_sequences(part, plan).write.mode(
                    "overwrite"
                ).parquet(os.path.join(out_seqs, f"split={split_name}"))
            n_seqs = (
                spark.read.parquet(out_seqs).count() if split_names else 0
            )
            _write_marker(sq_dir, fp_sq, sequences=n_seqs)
            action = "ran"
        report["stages"]["sequences"] = {"action": action, "sequences": n_seqs}
        _append_stage_lineage(spark, args.output, "sequences", action,
                             fp_sq, n_seqs, time.time() - t0)

    pages.unpersist()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
