#!/usr/bin/env python
"""Benchmark harness: headline spatial-join + tiling pipeline plus operator suite.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<q>": sec, ...}, "sf": <sf>, "docs_per_sec": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR      input tables dir   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS        local[N] cores     (default 32)
  SPARK_GRAFT_BENCH_DOCS  synthetic webpage rows for the headline pipeline
                          (default 150000)
  SPARK_GRAFT_BENCH_MIN_GBPS   cold-page probe trust threshold (default 2.0);
                          below it the bench sleep-retries before starting
  SPARK_GRAFT_BENCH_MAX_WAIT_S max total sleep-retry (default 1800); if the
                          host is still degraded the run proceeds with
                          "host_degraded": true in the JSON
  SPARK_GRAFT_BENCH_MID_WAIT_S  total mid-suite sleep-retry budget when a
                          between-chunk probe reads degraded (default 900)
  SPARK_GRAFT_BENCH_PROBE_EVERY suite queries per probe bracket (default 6)

The headline measures end-to-end docs/sec of:
  synth input_hint table -> JVM parse -> Arrow footprint kernel -> H3/S2 encode
  -> fused PIP/kNN resolve vs the 864-plot broadcast dim -> z9..14 tile fan-out
with all results reduced by count() (nothing collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # In-band host-health GATE: cold-page first-touch bandwidth. This
    # sandbox's memory backing intermittently degrades ~1000x for cold pages
    # (measured + documented in BENCH/BASELINE.md) while CPU stays full
    # speed — timings captured in that window measure the host's page-fault
    # service, not plans (BENCH_r03.json was such an artifact). The bench now
    # REFUSES to start while the probe reads < SPARK_GRAFT_BENCH_MIN_GBPS
    # (default 2 GB/s), sleep-retrying up to SPARK_GRAFT_BENCH_MAX_WAIT_S
    # (default 1800 s). If the window never clears, it runs anyway but marks
    # the artifact "host_degraded": true and re-probes after the suite, so a
    # contaminated capture is always self-describing.
    import numpy as np

    def _probe_gbps() -> float:
        x = np.zeros(10_000_000)
        t = time.time()
        x.copy()
        return round(8 * 10_000_000 / max(time.time() - t, 1e-9) / 1e9, 3)

    trust_gbps = float(os.environ.get("SPARK_GRAFT_BENCH_MIN_GBPS", "2.0"))
    max_wait_s = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_WAIT_S", "1800"))
    host_gbps = _probe_gbps()
    waited = 0.0
    while host_gbps < trust_gbps and waited < max_wait_s:
        print(
            f"[bench] cold-page probe {host_gbps} GB/s < {trust_gbps} GB/s "
            f"(degraded host window) — retrying in 60s "
            f"({int(waited)}/{int(max_wait_s)}s waited)",
            file=sys.stderr,
        )
        time.sleep(60.0)
        waited += 60.0
        host_gbps = _probe_gbps()
    host_degraded = host_gbps < trust_gbps
    if host_degraded:
        print(
            f"[bench] WARNING: probe still {host_gbps} GB/s after "
            f"{int(waited)}s — running anyway; artifact marked host_degraded",
            file=sys.stderr,
        )

    import __spark_entry__ as entrymod
    from extractors_metadata_spark.plans.pipeline import run_pipeline_counts
    from extractors_metadata_spark.session import get_spark
    from extractors_metadata_spark.synth import plot_rings, synth_webpages

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 4, 8),
        # measured on this box: AQE partition coalescing under-provisions the
        # Python-UDF reduce stages (BENCH/BASELINE.md)
        extra_conf={"spark.sql.adaptive.coalescePartitions.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    timings: dict[str, float] = {}
    plots_pdf = plot_rings()

    # --- headline: full document pipeline --------------------------------------
    # input materialized as parquet (untimed): the engine's real input is a
    # table on disk, and the timed region should measure scan -> parse ->
    # footprint -> resolve -> tiles, not the synthetic generator.
    import shutil
    import tempfile

    pages_dir = os.path.join(tempfile.gettempdir(), f"bench_pages_{n_docs}")
    if not os.path.isdir(pages_dir):
        synth_webpages(spark, n_docs, partitions=cpus * 2).write.mode("overwrite").parquet(
            pages_dir + ".tmp"
        )
        shutil.move(pages_dir + ".tmp", pages_dir)

    t0 = time.time()
    pages = spark.read.parquet(pages_dir)
    n_dp, n_tiles = run_pipeline_counts(spark, pages, plots_pdf)
    t_pipeline = time.time() - t0
    timings["pipeline_datapoints_tiles"] = round(t_pipeline, 3)
    docs_per_sec = round(n_docs / t_pipeline, 1)

    # PER-CHUNK probe gating (round-5): BENCH_r04 passed the start gate and
    # the host degraded mid-suite (end probe 0.194 GB/s), leaving half the
    # per-query numbers as unlabeled upper bounds. Now the suite runs in
    # chunks of PROBE_EVERY queries with a probe between chunks; a query's
    # number is trusted only if BOTH bracketing probes read >= the threshold,
    # else it lands in "degraded_queries". On a failed mid-suite probe the
    # harness sleep-retries within a bounded budget before pressing on.
    probe_every = int(os.environ.get("SPARK_GRAFT_BENCH_PROBE_EVERY", "6"))
    mid_wait_budget = float(os.environ.get("SPARK_GRAFT_BENCH_MID_WAIT_S", "900"))
    probes: list[float] = []
    degraded_queries: list[str] = []

    def _gated_probe() -> float:
        nonlocal mid_wait_budget
        g = _probe_gbps()
        while g < trust_gbps and mid_wait_budget > 0:
            print(
                f"[bench] mid-suite probe {g} GB/s < {trust_gbps} — sleeping 60s "
                f"({int(mid_wait_budget)}s budget left)",
                file=sys.stderr,
            )
            time.sleep(60.0)
            mid_wait_budget -= 60.0
            g = _probe_gbps()
        probes.append(g)
        return g

    headline_probe = _gated_probe()
    if host_degraded or headline_probe < trust_gbps:
        degraded_queries.append("pipeline_datapoints_tiles")

    # --- operator suite on the driver tables ------------------------------------
    # BEST-OF-K per query (k=3, report min): wall times on this box vary ~2x
    # run-to-run (VM noise, documented in BENCH/BASELINE.md) — a single-pass
    # timing measures the noise, not the plan. The headline pipeline above
    # stays single-pass (it is the expensive end-to-end number; its noise is
    # bounded separately by the scaling harness's best-of-k protocol).
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    suite = [
        "pip_contains", "knn_nearest", "tile_assign", "cells_encode",
        "q1_pricing", "window_topk", "anti_join",
        "dedup_exact", "minhash_pairs", "token_stats", "lang_id",
        "ngram_jaccard", "ann_topk", "ann_ivf", "simhash",
        # round-3 additions: corpus stats + SRP near-pairs (aggregates keep
        # every upstream column load-bearing under count())
        "vocab_topk", "tfidf_topk", "srp_pairs_verify",
        # round-4 additions — each stays load-bearing under count(): the
        # session agg groups on window output, asof's window feeds the
        # match-back join keys, interval_join is an inner join, domain_cap
        # filters on rank. (url_dedup is NOT timed here: count() would prune
        # its survivor window + canonicalization to a bare scan.)
        "session_stats", "asof_join", "interval_join", "domain_cap",
        # sketch suite + linkgraph: hll_estimate's single-row aggregate keeps
        # the whole register build load-bearing (hll_registers would be a
        # row-preserving left join under count()); cms/bloom/pagerank all
        # filter or aggregate through their joins.
        "hll_estimate", "cms_verify", "bloom_prune", "pagerank",
        # late round-4 additions: sq_topk's rank filter keeps the int8
        # encode + integer dots load-bearing; the quantile estimate
        # aggregates through the sketch build; source_mix's threshold
        # filter forces the hash. (stream_* queries are excluded — they
        # are foreachBatch drains timed by tools/stream_bench.py.)
        "sq_topk", "quantile_estimate_verify", "source_mix",
        # line_dedup's row count flows through explode -> winner agg ->
        # keep join -> doc agg, so count() pays every shuffle (only the
        # final string reassembly prunes). zorder_key is NOT timed: count()
        # would prune the bit-interleave to the tile kernel already timed
        # by tile_assign (CLAUDE.md count() rule).
        "line_dedup",
        # bbox_overlap's row count IS the refine filter's output (box-cover
        # UDF + cell join + pair distinct + rect_overlap kernel all load-
        # bearing); decontaminate is NOT timed: its left join back to the
        # flag base is count()-prunable (provably unique build side).
        "bbox_overlap",
        # session additions: spatial_cluster's label propagation runs
        # EAGERLY (checkpointed rounds) inside the timed construction, and
        # its size join keeps the radius edges load-bearing; tile_smooth's
        # count() is the post-scatter groupBy cardinality, so the x9
        # fan-out + re-sum (and the upstream per-tile counts) all execute.
        # cdc_verify is NOT timed: it is snapshot-write-dominated (3 commits
        # to a temp table), which stream_bench-style harnesses own.
        "spatial_cluster", "tile_smooth",
        # inverted_index's count() is the postings cardinality (explode +
        # both aggregates + the df join all load-bearing); cell_compact's
        # per-level rounds run eagerly in construction; sketch_gate's
        # filter forces the sketch build + broadcast threshold join.
        # scan_legs / polygon_stats / text_normalize are NOT timed:
        # count() prunes their UDF/projection output (CLAUDE.md rule).
        "inverted_index", "cell_compact", "sketch_gate",
        # session additions: tile_pyramid's count() is the union of every
        # level's aggregate (base Arrow tile pass + full cascade execute);
        # bm25_topk and weighted_sample count() through rank filters, so
        # scoring UDF + window + joins are load-bearing; kmeans_verify's
        # three Lloyd rounds run EAGERLY (driver centroid sync per round)
        # inside the timed construction — the final count() prunes only
        # the last assignment projection.
        "tile_pyramid", "bm25_topk", "weighted_sample", "kmeans_verify",
        # stay_points: count() is the (user, run) group cardinality — run
        # ids depend on the step-distance UDF, so the Arrow kernel + both
        # windows are load-bearing. pmi_pairs: count() passes the
        # c_ab >= min_pair filter, so presence build + pair join + count
        # aggregate all execute (only the PMI projection prunes).
        "stay_points", "pmi_pairs",
        # shingle_cosine: count() passes the sim_fp threshold filter, so
        # the banded shingle build + pair join + dots/norms all execute
        # (pure codegen — no UDF to prune). rollup_stats: count() is the
        # grouping-set output cardinality (Expand + aggregate execute).
        "shingle_cosine", "rollup_stats",
        # resample_track: count() is the grid-explode cardinality — lag
        # window, gap filter and sequence fan-out all load-bearing (the
        # interpolation projection prunes, pure codegen anyway).
        # sliding_windows: count() is the (window, key) aggregate output.
        "resample_track", "sliding_windows",
        # typo_pairs / funnel_steps / triangles / overlay_area / pq_topk:
        # every one of these counts() through a filter, top-k rank, or
        # join-shaped aggregate, so the candidate generation (blocked
        # lev join, sorted fold, wedge join, 24x explode + window, ADC)
        # is load-bearing end-to-end. (quality_percentile/mad_outliers
        # are row-preserving projections — count() would prune them to a
        # scan, so they are NOT timed; CLAUDE.md count() rule.)
        "typo_pairs", "funnel_steps", "triangles", "overlay_area", "pq_topk",
        # late additions: ripley_k / od_matrix / session_rules / hll_pyramid
        # count() through aggregates whose keys depend on the full upstream
        # (radius join, endpoint argmin + tile UDF, session windows + pair
        # join, register cascade). snap_to_path / quality_percentile /
        # mad_outliers are row-preserving projections — NOT timed
        # (CLAUDE.md count() rule).
        "ripley_k", "od_matrix", "session_rules", "hll_pyramid",
        # round-4 late additions: interval_union / streaks count() through
        # per-user aggregates fed by ordered windows (islands load-bearing);
        # gini counts the 5-group aggregate (window + rollup execute);
        # rrf_fusion's rank filter keeps all three window sorts; k_core's
        # peel rounds run EAGERLY (localCheckpoint per round) inside the
        # timed construction. (move_rose / acf / local_moran are
        # row-preserving or near-projection shapes close to already-timed
        # plans — NOT timed, CLAUDE.md count() rule.)
        "interval_union", "streaks", "gini", "rrf_fusion", "k_core",
        # prefix_join's count() is the qualifying-pair cardinality (global
        # order aggregate + rank windows + candidate and verify joins all
        # load-bearing); convoy_pairs counts through the max_run filter, so
        # tile UDF + pair join + islands windows all execute; mmr_select's
        # 9-row output depends on every greedy stage (persisted candidate
        # scan runs once — the plan-audit fix).
        "prefix_join", "convoy_pairs", "mmr_select",
        # session-4 additions: bpe_merges / principal_axis / shortest_paths
        # / convex_hull all run their bounded rounds EAGERLY (per-round
        # collect or localCheckpoint) inside the timed construction — the
        # final count() prunes only a bounded projection. quadtree's leaf
        # keys depend on the level-count dims, contact_crossings counts
        # through the orientation filter + hour join, mutual_knn through
        # both rank filters + the reciprocal join. (lm_quality /
        # exact_substr / locf_resample / sax_words are row-preserving or
        # aggregate-key-prunable under count() — NOT timed, CLAUDE.md rule.)
        "bpe_merges", "principal_axis", "shortest_paths", "convex_hull",
        "quadtree", "contact_crossings", "mutual_knn",
        # round-5 additions, count()-load-bearing each: slope_aspect /
        # semivariogram / mann_kendall count() through scatter/lag/cell
        # aggregates; hausdorff_pairs / winnow_pairs / image_ahash_pairs /
        # ripley_per_user pass threshold filters or keyed aggregates, so
        # candidate joins + verifies execute; naive_bayes and rake_keywords
        # count() through argmax/rank filters; rabin_dedup through the
        # chunk-hash rollup; hits / d8_flow / watershed / tile_blobs run
        # their rounds EAGERLY (collect or localCheckpoint per round)
        # inside the timed construction; dsir_select / adamic_adar are
        # TakeOrdered top-k (ordering forces full scoring); z_range_plan's
        # count() is the merged-range cardinality (descent + merge windows
        # load-bearing); host_graph counts the host rollup (regex + explode
        # execute). (blocklist_hits / outlinks / viewshed / pii_redact are
        # row-preserving or left-join-count-prunable — NOT timed,
        # CLAUDE.md count() rule.)
        "slope_aspect", "hausdorff_pairs", "mann_kendall", "naive_bayes",
        "hits", "rake_keywords", "winnow_pairs", "rabin_dedup",
        "image_ahash_pairs", "ripley_per_user", "d8_flow", "watershed",
        "tile_blobs", "semivariogram", "dsir_select", "adamic_adar",
        "z_range_plan", "host_graph",
        # session-6 additions: textrank's top-k rank filter keeps the chunk
        # pair join + the eager integer-pagerank rounds load-bearing;
        # cost_distance runs its two min-plus squarings + 12 Bellman-Ford
        # super-rounds EAGERLY (checkpointed edge frame, per-round counts)
        # inside the timed construction; greedy_cover's 8 argmax collects
        # are the work. (ppr_seeds is the pagerank plan with a seed
        # conditional — near-duplicate of a timed plan, NOT timed;
        # robots_filter / tile_median / window_ranks / retrieval_eval are
        # row-preserving or left-join-count-prunable — NOT timed,
        # CLAUDE.md count() rule.)
        "textrank", "cost_distance", "greedy_cover",
        # kcenter_coreset's 7 argmax collects run EAGERLY per round (the
        # greedy_cover/bpe shape) — construction is the measurement.
        # (emerging_hotspots is the already-timed mann_kendall plan plus
        # one scatter aggregate — near-duplicate, NOT timed.)
        "kcenter_coreset",
        # lsh_eval's single confusion row aggregates through the full-outer
        # marker join, so the poly-minhash chain AND the exact all-pairs
        # shingle truth join are both load-bearing under count().
        "lsh_eval",
        # containment_pairs counts() through the integer containment
        # threshold filter, so the shingle self-join + size joins are
        # load-bearing end-to-end.
        "containment_pairs",
        # dup_cluster_sizes runs the pointer-jumping CC rounds EAGERLY over
        # the minhash pair graph; wavefront_profile checkpoints each BFS
        # hop eagerly — construction is the measurement for both.
        # (doc_novelty's news-side left join is count-prunable (unique
        # build side) and graph_profile / isochrone_bands are near-
        # duplicates of timed plans — NOT timed, CLAUDE.md count() rule.)
        "dup_cluster_sizes", "wavefront_profile",
        # curation_yield composes quality gate + kept-set minhash + eager
        # CC survivors + the per-source rollup — the aggregate keys
        # depend on every join, so the whole funnel executes.
        "curation_yield",
        # session-7 additions: c4_filters' doc rollup keys on every line's
        # reason column, so segmentation + augmentation + the first-match
        # CASE all execute under count(); boilerplate_lines' final count
        # aggregates through the (source, txt) frequency join, keeping the
        # line self-aggregate + flag join load-bearing.
        # (readability / encoding_scan are row-preserving projections —
        # count() prunes the entire column pipeline — NOT timed,
        # CLAUDE.md count() rule.)
        "c4_filters", "boilerplate_lines",
        # kmv_distinct's per-lang aggregate forces the distinct-hash
        # exchange + window rank + exact-count join under count().
        "kmv_distinct",
        # knn_classify's confusion aggregate keys on vote outcomes, so the
        # brute-force cosine rank, label join and argmax all execute.
        "knn_classify",
        # ql_dirichlet's top-k rank filter forces the postings scan,
        # candidate expansion and per-term UDF under count() (the bm25
        # shape with the extra zero-tf expansion join).
        "ql_dirichlet",
        # ktruss runs its peel rounds EAGERLY (localCheckpoint + count per
        # round) — construction is the measurement, the k_core shape with
        # a triangle enumeration inside each round.
        "ktruss",
        # crawl_schedule's count() is the frontier cardinality: the anchor
        # regex explode + the distinct-inlink aggregate are load-bearing
        # (the rank/worker projection prunes — documented, acceptable:
        # the aggregate dominates).
        "crawl_schedule",
        # ccnet_buckets' row count is the scored-doc cardinality coming out
        # of the LM aggregate, so the bigram join + fixed-point UDF + lang
        # window all execute (the bucket CASE prunes — acceptable: the LM
        # pass dominates).
        "ccnet_buckets",
        # hrw_shards' per-doc aggregate forces the 9x hash fan-out + max
        # under count(). (token_apportion is a source-dim frame — tiny by
        # construction, NOT timed.)
        "hrw_shards",
        # (dtw_pairs' only filter precedes the DP UDF, so count() prunes
        # the DP column entirely and the pair frame is user-cap bounded —
        # NOT timed, CLAUDE.md count() rule; frechet_pairs same plan.)
        # wl_colors' row count is the node set coming out of round 3's
        # aggregate chain, so all 3 refinement rounds (join + sorted
        # collect + hash) execute under count().
        "wl_colors",
        # zipf_fit aggregates per lang through the window rank + ln UDF;
        # sprt_test's decision join keys on the window running sum —
        # both fully load-bearing under count().
        "zipf_fit", "sprt_test",
        # hybrid_retrieval's top-10 rank filter sits on the fused score,
        # so BOTH ranker pipelines + the outer-join fusion execute.
        "hybrid_retrieval",
        # (warc_parse / quadkey_encode are row-preserving projections and
        # ingest_gate's screens are prunable columns over unique-key inner
        # joins — count-prunable, NOT timed, CLAUDE.md count() rule.)
        # session-8 additions: good_turing's count() is the number of
        # distinct low frequencies out of two stacked aggs; kneser_ney's
        # top-200 TakeOrdered sits on the bigram agg + two inner marginal
        # joins (cardinality unprovable -> joins execute).
        "good_turing", "kneser_ney",
        # viterbi_match's count() is the obs x decoded-step join, whose
        # cardinality comes from posexploding the Viterbi UDF output —
        # the DP executes. track_diameter's count() is the per-user best
        # frame: the pair self-join + composite argmax execute.
        "viterbi_match", "track_diameter",
        # join_counts is one row out of the full lattice/edge agg chain.
        "join_counts",
        # (gopher_rules is a row-preserving projection — count-prunable,
        # NOT timed; lcss_pairs shares dtw_pairs' prunable-UDF plan —
        # NOT timed, same rule.)
        # cohens_kappa is one row out of the confusion + marginal aggs;
        # str_pack's leaf count needs both rank phases and the MBR agg;
        # bowtie_classes builds its BFS rounds eagerly (localCheckpoint)
        # and its 4-row output sits on the class joins.
        "cohens_kappa", "str_pack", "bowtie_classes",
        # (polyline_encode's string column prunes under count() — NOT
        # timed, CLAUDE.md count() rule.)
        # ams_f2 and bootstrap_stats end in rep/row-keyed aggregates of
        # hash fan-outs — fully load-bearing under count().
        "ams_f2", "bootstrap_stats",
        # ransac_lines' 32-row output is the candidate-keyed aggregate of
        # the broadcast score pass; simrank builds its rounds eagerly
        # (localCheckpoint) and count() sits on the final pair frame.
        "ransac_lines", "simrank",
        # line_raster's cardinality IS the DDA cell count (the explode
        # bound comes from the window-pair cell math); image_phash is a
        # mapInPandas whose cardinality Spark cannot prune — the DCT
        # kernel executes under count() (image_ahash_pairs precedent).
        "line_raster", "image_phash",
        # anchor_text's count() sits on the top-k window filter over the
        # regex-parsed pair counts; redirect_resolve builds its doubling
        # rounds eagerly (localCheckpoint). (stream_dedup_verify is a
        # foreachBatch drain — stream_bench territory, NOT timed here.)
        "anchor_text", "redirect_resolve",
        # one_rule's single row is the global argmin over the cumulative
        # grid (the whole chain executes); audio_energy is a mapInPandas
        # whose cardinality Spark cannot prune.
        "one_rule", "audio_energy",
        # marching_squares' cardinality is the case filter over the
        # corner-flag joins — the occupancy agg + joins execute.
        # shapley_attribution's 3 rows come off the purchase argmin +
        # touch distinct + mask algebra — fully load-bearing.
        "marching_squares", "shapley_attribution",
        # geary_c is one row off the edge-difference + moment aggs;
        # jenks_breaks builds its DP stages eagerly (localCheckpoint +
        # bounded backtrack collects).
        "geary_c", "jenks_breaks",
        # anf_registers builds its register-max rounds eagerly
        # (localCheckpoint per hop); count() reads the hop rollups.
        "anf_registers",
        # modularity counts the community rollup — the label_prop rounds
        # run EAGERLY (localCheckpoint per round) inside the timed
        # construction, and the e_in/deg joins feed the count.
        "modularity",
        # rich_club counts the 16-row threshold table off the degree +
        # min-endpoint-degree joins (left joins load-bearing via the
        # coalesce projection under count()? no — count is the literal
        # 16; NOT timed, count() rule).
        # heaps_fit is one row off the shingle-arrival agg + ln moments.
        "heaps_fit",
        # grid_upsample's cardinality is the doubled-lattice union of
        # shifted joins over the occupancy agg.
        "grid_upsample",
        # morph_close's count IS the closing cardinality (dilate-distinct
        # + erosion support filter both load-bearing); raster_rle's count
        # is the number of runs off the lag window. (erosion_depth is
        # count-preserving over occupied cells — NOT timed, count() rule.)
        "morph_close", "raster_rle",
        # voronoi_alloc counts the labeled occupancy (cell-preserving)
        # BUT the min_by fold + broadcast product are inner to the
        # grouped agg — count() keeps them load-bearing.
        "voronoi_alloc",
        # dunning_g2's count is the k11>=2 collocation set off the bigram
        # agg + marginal joins (filter load-bearing; UDF column pruned by
        # count() but the contingency joins are the cost).
        "dunning_g2",
        # stem_vocab counts the stem dictionary off the explode + CASE +
        # distinct aggs (conflation load-bearing).
        "stem_vocab",
        # theil_decomp counts the 5-row group table — the within-term
        # Arrow pass + group agg are inner to the join (load-bearing).
        "theil_decomp",
        # posting_compress counts the term dictionary off the postings
        # dedupe + gap window (varint agg load-bearing).
        "posting_compress",
        # colocation_pi counts the feature-pair rollup: the radius join,
        # type joins and distinct-participation aggs all load-bearing.
        "colocation_pi",
        # isotonic_fit counts the fitted grid (pair fan-out + suffix-min
        # + argmax join all load-bearing under the inner fit join).
        "isotonic_fit",
        # kaplan_meier counts the distinct-duration life table (subject
        # agg + risk windows load-bearing).
        "kaplan_meier",
        # changepoint_split counts the per-key argmax frame (window +
        # max_by inner to the agg — load-bearing).
        "changepoint_split",
        # runs_test counts the per-user table off the median-rank +
        # run-lag windows (left-join coalesce keeps them load-bearing).
        "runs_test",
        # hodges_lehmann counts the per-key median frame (Walsh pair
        # fan-out + rank window load-bearing through the rn filter).
        "hodges_lehmann",
        # swalign_pairs (like lcss/dtw) is pair-preserving off the
        # broadcast candidate join — dtw-family stays untimed (count()
        # rule); the kernels are exercised by the oracle sweeps.
        # shot_boundaries counts the (video, frame) fan-out off the fused
        # Arrow fingerprint pass + lag window (fan-out load-bearing).
        "shot_boundaries",
        # huff_model counts the pivoted point frame off the knn candidate
        # join + re-rank (the knn path is the cost and is load-bearing
        # through the pivot's inner aggregate).
        "huff_model",
        # allen_census counts the per-user census frame: the per-key
        # pair join + relation CASE + agg are all load-bearing.
        "allen_census",
        # ridge_fit counts the per-lang coefficient frame: the 9-sum
        # partial agg over the full scan is load-bearing.
        "ridge_fit",
        # perceptron_fit's R scan-aggregates run during query
        # construction (driver-held weights), so count() times them.
        "perceptron_fit",
        # huffman_cost counts the per-lang cost frame: the 26-sum
        # letter-weight agg + the bounded applyInPandas construction
        # are load-bearing through the grouped output.
        "huffman_cost",
        # soundex_blocks counts the phonetic-block agg (postings +
        # vocab + chain all load-bearing); code_size_compare counts the
        # per-term sizing agg off the gap window.
        "soundex_blocks",
        "code_size_compare",
        # harmonic_centrality counts the per-seed rollup off the BFS
        # rounds (actions run during construction); ntt_autocorr counts
        # the (key, lag) fan-out off the Arrow NTT pass; rbo_overlap and
        # calibration_bins count bounded frames off load-bearing aggs.
        "harmonic_centrality",
        "ntt_autocorr",
        "rbo_overlap",
        "calibration_bins",
        # cramer_von_mises counts the per-user U frame (rank windows +
        # agg load-bearing); matrix_profile counts the (key, window)
        # fan-out off the Arrow pair pass.
        "cramer_von_mises",
        "matrix_profile",
        # burst_detect counts the (key, bin) labeling off the Arrow DP
        # pass; species_richness/bray_curtis count postings-derived
        # aggregates; salt_plan counts the hot-cell advisor agg.
        "burst_detect",
        "species_richness",
        "bray_curtis",
        "salt_plan",
        # critical_path / attack_robustness count graph rollups whose
        # relaxation rounds run at query-construction time; friedman /
        # front_coding / adler32 / zonemap_audit count load-bearing aggs.
        "critical_path",
        "attack_robustness",
        "friedman_test",
        "front_coding",
        "adler32",
        "zonemap_audit",
        # temporal_reach counts the (seed,node) arrival table off the
        # relaxation rounds; record_linkage counts surviving scored
        # pairs; cidr_match counts the block rollup off the range join.
        "temporal_reach",
        "record_linkage",
        "cidr_match",
        # lttb_downsample counts the (key, rank) selection off the
        # Arrow selection pass over the zero-fill grid.
        "lttb_downsample",
        # h_index/qq_points/max_window/roc_auc/entropy_bound/text_tiling
        # count rank/agg frames with load-bearing upstream windows.
        "h_index",
        "max_window",
        "roc_auc",
        "entropy_bound",
        "text_tiling",
        # sorted_neighborhood/record-family, pr_curve, unique_prefix,
        # perm_test, triad_census count rank/agg frames with
        # load-bearing windows/fan-outs.
        "sorted_neighborhood",
        "triad_census",
        "pr_curve",
        "unique_prefix",
        "perm_test",
        "wilcoxon_signed",
        "bh_fdr",
        "brown_forsythe",
        "capture_recapture",
        "cochran_q",
        "mcnemar",
        "kruskal_wallis",
        "durbin_watson",
        "spatial_keyword",
        "stress_centrality",
        "boruvka_emst",
        "gbm_stumps",
        "toponym_resolve",
        "seasonal_decompose",
        "vw_simplify",
        "interval_schedule",
        "cochran_armitage",
        "gale_shapley",
        "seasonal_mk",
        "knapsack_pack",
        "radiation_model",
        "privacy_audit",
        "basket_lift",
        "debruijn_euler",
        "hash_ring",
        "sd_ellipse",
        "hhi_concentration",
        "type_tile_affinity",
        "edr_pairs",
        "dyad_census",
        "kdtree_split",
        "interval_depth",
        "max_drawdown",
        "hist_equalize",
        "quantile_map",
        "greedy_coloring",
        "jonckheere",
        "min_circle",
        "page_trend",
        "mood_median",
        "ansari_bradley",
        "schnabel",
        # session-11 row-preserving per-doc UDF queries (aho_scan,
        # suffix_lrs, string_period, bwt_runs) are NOT timed: count()
        # prunes their struct kernel (CLAUDE.md rule — the image_dhash
        # precedent). spatial_keyword keeps the dist kernel load-bearing
        # (the ranking window sorts on dist_cm); vw/interval/gale are
        # FlatMapGroupsInPandas row-count-determining, so count() pays
        # the kernel. toponym_resolve's count() pays the codegen mention
        # scan + filter + join (its dist kernel feeds only the pruned
        # aggregate — annotated, accepted).
        # image_dhash is row-preserving (one fingerprint per url) — NOT
        # timed (count() rule); image_ahash_pairs already times the
        # shared pixel+band machinery. holt_forecast is key-preserving
        # (one row per user off the grouped kernel) — NOT timed either.
    ]
    qs = entrymod.queries()
    chunk_start_ok = probes[-1] >= trust_gbps
    chunk_names: list[str] = []
    for qi, name in enumerate(suite):
        best = float("inf")
        for _ in range(runs_per_query):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        chunk_names.append(name)
        if (qi + 1) % probe_every == 0 or qi == len(suite) - 1:
            chunk_end_ok = _gated_probe() >= trust_gbps
            if not (chunk_start_ok and chunk_end_ok):
                degraded_queries.extend(chunk_names)
            chunk_start_ok = chunk_end_ok
            chunk_names = []

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "spatial-join + tile-assignment suite wall time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "docs": n_docs,
                "datapoints": n_dp,
                "tiles": n_tiles,
                "docs_per_sec": docs_per_sec,
                "cpus": cpus,
                "runs_per_query": runs_per_query,
                "host_cold_page_gbps": host_gbps,
                "host_cold_page_gbps_end": probes[-1],
                "probes": probes,
                "probe_every": probe_every,
                "degraded_queries": sorted(set(degraded_queries)),
                # host_degraded now means: ANY per-query number is untrusted
                # (start gate failed, or any probe bracket failed mid-suite)
                "host_degraded": host_degraded or bool(degraded_queries),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
