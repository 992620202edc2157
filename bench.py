#!/usr/bin/env python
"""Benchmark harness.

Prints ONE JSON line:
  {"metric": "kg_pipeline_sec", "value": <headline seconds>,
   "unit": "sec", "queries": {...per-query seconds...},
   "sf": <dir>, "num_cpus": N, "pages": n, "triples": n,
   "triples_per_sec": r}

Headline = the flagship KG pipeline (pages → parse → mention/link →
canonicalize → dedup → count) over pages synthesized from
$GRAFT_SF_DIR (default /root/testdata/sf0.1), page synthesis cached
to parquet and excluded from timing; one untimed read warms the OS
page cache so the measurement is compute + shuffle, not cold disk.

--scaling: runs this same bench in two fresh processes at
RAY_GRAFT_CPUS=8 and 32 on identical input and reports both
throughputs + efficiency = (t8/t32)/(32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "4"))
TRIALS = max(1, int(os.environ.get("GRAFT_TRIALS", "2")))


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from ferenda_ray.pipelines.corpus import (materialize_pages, read_pages,
                                              read_pages_slim)
    from ferenda_ray.pipelines.kg import kg_triples_streaming
    from ferenda_ray.pipelines import queries as Q

    # page synthesis cached + warmed (untimed)
    pages_dir = materialize_pages(SF_DIR, replicate=REPLICATE)
    n_pages = rd.read_parquet(pages_dir).count()

    # untimed warmup: one full untimed pass spins up worker processes
    # AND a full-size emitter actor pool (a small slice only warms as
    # many actors as it has blocks — the timed run would then pay
    # ~10 s of actor ramp; measured 20 s cold vs 8 s steady-state).
    # Steady-state is the right thing to measure: a 100-TB job pays
    # actor start-up once against hours of runtime.
    kg_triples_streaming(read_pages(pages_dir),
                         pages_slim=read_pages_slim(pages_dir)).count()

    timings: dict[str, float] = {}

    # min over GRAFT_TRIALS full SWEEPS (not adjacent repeats): the
    # shared sandbox's many-core throughput swings ±2-3x in windows
    # that last minutes — back-to-back trials of one query land in the
    # same window, but whole-sweep repeats are minutes apart, so the
    # per-query minimum across sweeps actually escapes a bad window
    n_triples = 0

    def kg_run():
        nonlocal n_triples
        n_triples = kg_triples_streaming(
            read_pages(pages_dir),
            pages_slim=read_pages_slim(pages_dir)).count()

    def warc_ingest(_sf):
        """WARC acquisition path: the cached pages corpus re-packed
        once (untimed) into Common-Crawl-style per-record-member
        .warc.gz shards, then timed read_warc → pages_from_warc."""
        import glob
        import gzip as _gzip

        import pyarrow.parquet as _pq

        from ferenda_ray.sources.warc import pages_from_warc, read_warc

        wdir = "/tmp/ferenda_ray_warc/%s" % os.path.basename(
            pages_dir.rstrip("/"))
        marker = os.path.join(wdir, "_SUCCESS")
        if not os.path.exists(marker):
            import shutil

            shutil.rmtree(wdir, ignore_errors=True)
            os.makedirs(wdir)
            shards = [open(os.path.join(wdir, "part-%02d.warc.gz" % i),
                           "wb") for i in range(16)]
            i = 0
            for pf in sorted(glob.glob(pages_dir + "/*.parquet")):
                for b in _pq.ParquetFile(pf).iter_batches(
                        columns=["url", "warc_ts", "html"]):
                    urls = b["url"].to_pylist()
                    tss = b["warc_ts"].to_pylist()
                    htmls = b["html"].to_pylist()
                    for url, ts, html in zip(urls, tss, htmls):
                        body = html.encode() if isinstance(html, str) \
                            else (html or b"")
                        http = (("HTTP/1.1 200 OK\r\nContent-Type: "
                                 "text/html\r\nContent-Length: %d\r\n"
                                 % len(body)).encode()
                                + b"\r\n" + body)
                        rec = (("WARC/1.0\r\nWARC-Type: response\r\n"
                                "WARC-Target-URI: %s\r\n"
                                "WARC-Date: %s\r\n"
                                "Content-Length: %d\r\n"
                                % (url,
                                   ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
                                   len(http))).encode()
                               + b"\r\n" + http + b"\r\n\r\n")
                        shards[i % 16].write(_gzip.compress(rec))
                        i += 1
            for f in shards:
                f.close()
            with open(marker, "w") as f:
                f.write("ok")
        paths = sorted(glob.glob(wdir + "/*.warc.gz"))
        return pages_from_warc(read_warc(paths))

    # scaling legs skip the query sweep: the efficiency ratio is
    # computed on the flagship alone, and a 14-query sweep per leg
    # only adds host-contention exposure to the measurement window
    if os.environ.get("GRAFT_SWEEP", "1") == "0":
        for _ in range(TRIALS):
            t0 = time.time()
            kg_run()
            dt = time.time() - t0
            if ("kg_pipeline" not in timings
                    or dt < timings["kg_pipeline"]):
                timings["kg_pipeline"] = round(dt, 3)
        kg_sec = timings["kg_pipeline"]
        result = {
            "metric": "kg_pipeline_sec", "value": round(kg_sec, 3),
            "unit": "sec", "queries": timings, "sf": SF_DIR,
            "num_cpus": NUM_CPUS, "pages": int(n_pages),
            "triples": int(n_triples),
            "triples_per_sec": round(n_triples / kg_sec, 1),
        }
        ray.shutdown()
        return result

    SWEEP = [("kg_pipeline", lambda _sf: kg_run()),
             ("q1_pricing", Q.q1_pricing),
             ("doc_token_counts", Q.doc_token_counts),
             ("events_windows", Q.events_windows),
             ("embed_knn", Q.embed_knn),
             ("canonicalize_cc", Q.canonicalize_cc),
             ("minhash_neardup", Q.minhash_neardup),
             ("revenue_by_nation", Q.revenue_by_nation),
             ("priority_lineitems", Q.priority_lineitems),
             ("pack_token_chunks", Q.pack_token_chunks),
             ("curation_pipeline", Q.curation_pipeline),
             ("doc_dsir_score", Q.doc_dsir_score),
             ("doc_decontaminate", Q.doc_decontaminate),
             ("kg_pagerank", Q.kg_pagerank),
             ("embed_kmeans", Q.embed_kmeans),
             ("semantic_dedup", Q.semantic_dedup),
             ("kg_cocite_triangles", Q.kg_cocite_triangles),
             ("doc_chunks", Q.doc_chunks),
             ("kg_kcore", Q.kg_kcore),
             ("doc_quality_classifier", Q.doc_quality_classifier),
             ("kg_mention_contexts", Q.kg_mention_contexts),
             ("bm25_search", Q.bm25_search),
             ("collocation_pmi", Q.collocation_pmi),
             ("mmr_search", Q.mmr_search),
             ("rrf_hybrid_search", Q.rrf_hybrid_search),
             ("q3_shipping", Q.q3_shipping),
             ("kg_trustrank", Q.kg_trustrank),
             ("kg_label_propagation", Q.kg_label_propagation),
             ("q18_large_orders", Q.q18_large_orders),
             ("q17_small_qty_revenue", Q.q17_small_qty_revenue),
             ("doc_normalized_dedup", Q.doc_normalized_dedup),
             ("kg_link_prediction", Q.kg_link_prediction),
             ("fulltext_indexed_search", Q.fulltext_indexed_search),
             ("orders_zorder", Q.orders_zorder),
             ("q21_blame_supplier", Q.q21_blame_supplier),
             ("q11_important_parts", Q.q11_important_parts),
             ("q10_returned_customers", Q.q10_returned_customers),
             ("orders_zorder_scan", Q.orders_zorder_scan),
             ("q7_nation_volume", Q.q7_nation_volume),
             ("training_shards", Q.training_shards),
             ("q2_min_cost_supplier", Q.q2_min_cost_supplier),
             ("q8_market_share", Q.q8_market_share),
             ("q16_supplier_count", Q.q16_supplier_count),
             ("basket_part_pairs", Q.basket_part_pairs),
             ("doc_range_layout", Q.doc_range_layout),
             ("orders_checksum", Q.orders_checksum),
             ("events_daily_type_mask", Q.events_daily_type_mask),
             ("lineitem_fk_orphans", Q.lineitem_fk_orphans),
             ("orderkey_join_stats", Q.orderkey_join_stats),
             ("source_compaction_plan", Q.source_compaction_plan),
             ("user_value_twa", Q.user_value_twa),
             ("orders_winsorized_mean", Q.orders_winsorized_mean),
             ("orders_analyze_stats", Q.orders_analyze_stats),
             ("q20_excess_suppliers", Q.q20_excess_suppliers),
             ("events_sliding_dau", Q.events_sliding_dau),
             ("events_late_arrivals", Q.events_late_arrivals),
             ("fulltext_delta_search", Q.fulltext_delta_search),
             ("embed_ivf_add_knn", Q.embed_ivf_add_knn),
             ("kg_anchor_text", Q.kg_anchor_text),
             ("segment_price_median", Q.segment_price_median),
             ("source_embedding_coherence",
              Q.source_embedding_coherence),
             ("audience_overlap_matrix", Q.audience_overlap_matrix),
             ("events_value_trend", Q.events_value_trend),
             ("orders_decile_report", Q.orders_decile_report),
             ("doc_k_anonymity", Q.doc_k_anonymity),
             ("events_cusum_alarms", Q.events_cusum_alarms),
             ("orders_time_travel", Q.orders_time_travel),
             ("orders_dq_expectations", Q.orders_dq_expectations),
             ("lineitem_weighted_median", Q.lineitem_weighted_median),
             ("bloom_fpr_audit", Q.bloom_fpr_audit),
             ("orders_price_mad", Q.orders_price_mad),
             ("orderkey_join_sample_estimate",
              Q.orderkey_join_sample_estimate),
             ("embed_squant_recall", Q.embed_squant_recall),
             ("orders_dow_seasonality", Q.orders_dow_seasonality),
             ("events_peak_concurrency", Q.events_peak_concurrency),
             ("lineitem_sequence_audit", Q.lineitem_sequence_audit),
             ("orders_pit_dimension_join",
              Q.orders_pit_dimension_join),
             ("user_interarrival_histogram",
              Q.user_interarrival_histogram),
             ("vocab_zipf_spectrum", Q.vocab_zipf_spectrum),
             ("orders_median_of_means", Q.orders_median_of_means),
             ("orders_backlog_aging", Q.orders_backlog_aging),
             ("customer_rfm_segments", Q.customer_rfm_segments),
             ("customer_pareto_concentration",
              Q.customer_pareto_concentration),
             ("events_session_lifetable",
              Q.events_session_lifetable),
             ("user_churn_labels", Q.user_churn_labels),
             ("funnel_latency_median", Q.funnel_latency_median),
             ("orders_price_drift", Q.orders_price_drift),
             ("part_neyman_allocation", Q.part_neyman_allocation),
             ("vocab_heaps_curve", Q.vocab_heaps_curve),
             ("user_event_gini_impurity",
              Q.user_event_gini_impurity),
             ("lineitem_model_auc", Q.lineitem_model_auc),
             ("lineitem_pr_curve", Q.lineitem_pr_curve),
             ("events_chi2_independence",
              Q.events_chi2_independence),
             ("basket_rule_lift", Q.basket_rule_lift),
             ("orders_jackknife_variance",
              Q.orders_jackknife_variance),
             ("orders_forecast_backtest",
              Q.orders_forecast_backtest),
             ("kg_transitivity", Q.kg_transitivity),
             ("customer_revenue_gini", Q.customer_revenue_gini),
             ("events_fano_overdispersion",
              Q.events_fano_overdispersion),
             ("kg_degree_assortativity",
              Q.kg_degree_assortativity),
             ("customer_cohort_ltv", Q.customer_cohort_ltv),
             ("part_price_index", Q.part_price_index),
             ("kg_rich_club", Q.kg_rich_club),
             ("er_blocking_quality", Q.er_blocking_quality),
             ("events_touch_attribution",
              Q.events_touch_attribution),
             ("lineitem_fairness_audit", Q.lineitem_fairness_audit),
             ("lineitem_conformal_threshold",
              Q.lineitem_conformal_threshold),
             ("events_cuped_reduction", Q.events_cuped_reduction),
             ("events_srm_check", Q.events_srm_check),
             ("orders_duplicate_payments",
              Q.orders_duplicate_payments),
             ("orders_quantile_sketch_audit",
              Q.orders_quantile_sketch_audit),
             ("orders_theil_sen_trend", Q.orders_theil_sen_trend),
             ("orders_fulfillment_leadtime",
              Q.orders_fulfillment_leadtime),
             ("doc_l_diversity", Q.doc_l_diversity),
             ("orders_dow_anova", Q.orders_dow_anova),
             ("orders_runs_test", Q.orders_runs_test),
             ("events_power_analysis", Q.events_power_analysis),
             ("user_bot_score_census", Q.user_bot_score_census),
             ("brand_share_shift", Q.brand_share_shift),
             ("lang_tokenizer_fertility",
              Q.lang_tokenizer_fertility),
             ("orders_stl_strength", Q.orders_stl_strength),
             ("kg_component_census", Q.kg_component_census),
             ("customer_purchase_dispersion",
              Q.customer_purchase_dispersion),
             ("part_markup_census", Q.part_markup_census),
             ("supplier_sla_compliance", Q.supplier_sla_compliance),
             ("cm_error_audit", Q.cm_error_audit),
             ("orderkey_gap_audit", Q.orderkey_gap_audit),
             ("events_stickiness_ratio",
              Q.events_stickiness_ratio),
             ("events_slo_burn_rate", Q.events_slo_burn_rate),
             ("brand_return_rate", Q.brand_return_rate),
             ("events_bounce_rate", Q.events_bounce_rate),
             ("er_fellegi_sunter", Q.er_fellegi_sunter),
             ("lineitem_ks_test", Q.lineitem_ks_test),
             ("lineitem_mann_whitney", Q.lineitem_mann_whitney),
             ("part_kendall_tau", Q.part_kendall_tau),
             ("events_sprt_decision", Q.events_sprt_decision),
             ("embed_knn_ivf_planted", Q.embed_knn_ivf_planted),
             ("er_fs_em_weights", Q.er_fs_em_weights),
             ("split_leakage_safe", Q.split_leakage_safe),
             ("lang_ppl_buckets", Q.lang_ppl_buckets),
             ("doc_gopher_rules", Q.doc_gopher_rules),
             ("orders_croston_demand", Q.orders_croston_demand),
             ("vocab_good_turing", Q.vocab_good_turing),
             ("orders_xbar_control", Q.orders_xbar_control),
             ("vocab_textrank_keywords", Q.vocab_textrank_keywords),
             ("doc_readability_fk", Q.doc_readability_fk),
             ("kg_attack_robustness", Q.kg_attack_robustness),
             ("doc_mattr", Q.doc_mattr),
             ("events_burstiness_gb", Q.events_burstiness_gb),
             ("bm25_ndcg_eval", Q.bm25_ndcg_eval),
             ("doc_readability_lix", Q.doc_readability_lix),
             ("doc_boilerplate_share", Q.doc_boilerplate_share),
             ("doc_novelty_share", Q.doc_novelty_share),
             # round-4/5 surfaces (VERDICT r4 #4): XSLT transform,
             # push sink, WARC acquisition, composed search endpoint
             ("xslt_toc_extract", Q.xslt_toc_extract),
             ("push_roundtrip", Q.push_roundtrip),
             ("archived_versions", Q.archived_versions),
             ("crawl_delta_status", Q.crawl_delta_status),
             ("warc_ingest", warc_ingest),
             ("search_api", Q.search_api),
             ("search_api_stats", Q.search_api_stats),
             ("pdf_textboxes", Q.pdf_textboxes),
             ("pdf_roundtrip", Q.pdf_roundtrip),
             ("docx_roundtrip", Q.docx_roundtrip),
             ("pdf_margins", Q.pdf_margins),
             ("pdf_sections", Q.pdf_sections),
             ("pdf_pagination", Q.pdf_pagination),
             ("search_autocomplete", Q.search_autocomplete),
             ("search_api_boosted", Q.search_api_boosted)]

    for _ in range(TRIALS):
        for name, fn in SWEEP:
            t0 = time.time()
            out = fn(SF_DIR)
            if hasattr(out, "count"):
                out.count()  # consume
            elif out is not None:
                len(out)
            dt = time.time() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 3)

    kg_sec = timings["kg_pipeline"]

    result = {
        "metric": "kg_pipeline_sec",
        "value": round(kg_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "pages": int(n_pages),
        "triples": int(n_triples),
        "triples_per_sec": round(n_triples / kg_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_SWEEP="0")
        cmd = [sys.executable, os.path.abspath(__file__)]
        # hard-cap PHYSICAL cores with taskset: ray.init(num_cpus=8)
        # only limits logical task slots — Arrow kernels, plasma and
        # worker aux threads would still use all 32 cores, inflating
        # the small-"cluster" baseline and understating true scaling
        if os.path.exists("/usr/bin/taskset"):
            cmd = ["/usr/bin/taskset", "-c", "0-%d" % (ncpu - 1)] + cmd
        out = subprocess.run(cmd,
                             env=env, capture_output=True, text=True,
                             check=True, cwd=os.path.dirname(os.path.abspath(__file__)))
        return json.loads(out.stdout.strip().splitlines()[-1])

    lo_cpus = int(os.environ.get("GRAFT_SCALE_LO", "8"))
    hi_cpus = int(os.environ.get("GRAFT_SCALE_HI", "32"))
    # ALTERNATE the legs and take per-leg minima: the sandbox's
    # contention comes in multi-minute windows (BASELINE.md), so two
    # sequential legs can land in different windows and corrupt the
    # ratio in either direction. Interleaved pairs give both legs the
    # same window exposure; the per-leg minimum is the documented
    # stable estimator under this noise (same rationale as the
    # sweep-min in run_bench).
    pairs = int(os.environ.get("GRAFT_SCALE_PAIRS", "2"))
    lo_runs, hi_runs = [], []
    for _ in range(pairs):
        lo_runs.append(run(lo_cpus))
        hi_runs.append(run(hi_cpus))
    lo = min(lo_runs, key=lambda r: r["value"])
    hi = min(hi_runs, key=lambda r: r["value"])
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_%d" % lo_cpus: lo["value"],
        "sec_%d" % hi_cpus: hi["value"],
        "tps_%d" % lo_cpus: lo["triples_per_sec"],
        "tps_%d" % hi_cpus: hi["triples_per_sec"],
        "all_sec_%d" % lo_cpus: [r["value"] for r in lo_runs],
        "all_sec_%d" % hi_cpus: [r["value"] for r in hi_runs],
        "sf": SF_DIR,
        "pages": lo["pages"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
