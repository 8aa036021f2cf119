"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship distributed crawl on the sf0.001-scale
synthetic pages table (FIXTURES.md — the driver testdata has no pages
table; BASELINE.json's input shape is synthesized deterministically).

``queries()`` exposes one callable per implemented operator/pipeline from
SURVEY.md §2 plus the training-data layer; ``oracle_sql()`` gives the
DuckDB equivalent for every SQL-expressible one.  Crawl-semantics queries
(visit ordering, seen set, extracted text) are oracled against GOLDEN
PARQUET produced by the pure-Python single-threaded reference simulator
(``pipelines/simulator.py`` — an independent sequential implementation of
the reference's worker loop; FIXTURES.md §5) — the SQL just reads those
files, so the comparison is Ray-distributed-engine vs sequential-oracle.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any, Dict

import pyarrow as pa

from methanol_web_crawler_ray.config import default_config
from methanol_web_crawler_ray.pipelines import ann, graph, relops, textops
from methanol_web_crawler_ray.stages import extract

# the sf tier the driver's correctness gate uses (TESTDATA.md)
_GOLD_BASE = "/tmp/mwc_golden"
_CKPT_BASE = "/tmp/mwc_entry_ckpt"

_CRAWL_SEEDS = ["http://host-0000.example/", "http://host-0001.example/",
                "http://host-0002.example/"]


def _crawl_cfg():
    return default_config(depth_limit=6, external=True)


def _pages_dir(sf_dir: str) -> str:
    from methanol_web_crawler_ray.sources import pagegen

    return pagegen.pages_dir_for(sf_dir)


def _golden_dir(sf_dir: str) -> str:
    """Golden crawl outputs from the PURE-PYTHON rounds simulator (no
    Ray) — regenerated only when absent."""
    import pyarrow.parquet as pq

    from methanol_web_crawler_ray.pipelines import simulator as sim
    from methanol_web_crawler_ray.pipelines.hostloop import DictFetcher
    from methanol_web_crawler_ray.sources import pagegen

    from methanol_web_crawler_ray._fingerprint import golden_fp

    pdir = _pages_dir(sf_dir)
    gdir = os.path.join(_GOLD_BASE,
                        f"{os.path.basename(pdir)}-{golden_fp()}")
    marker = os.path.join(gdir, "_DONE")
    if os.path.exists(marker):
        return gdir
    os.makedirs(gdir, exist_ok=True)
    fetch = DictFetcher(pagegen.load_fetch_dict(pdir))
    res = sim.simulate_rounds(_crawl_cfg(), fetch, _CRAWL_SEEDS)
    pq.write_table(
        pa.table(
            {
                "url": [v[0] for v in res.visits],
                "host": [v[1] for v in res.visits],
                "depth": pa.array([v[2] for v in res.visits], pa.int32()),
                "round_num": pa.array([v[3] for v in res.visits], pa.int64()),
                "seq": pa.array([v[4] for v in res.visits], pa.int64()),
            }
        ),
        os.path.join(gdir, "golden_visits.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "url": [t["url"] for t in res.targets],
                "url_hash": [t["url_hash"] for t in res.targets],
                "filetype": [t["filetype"] for t in res.targets],
            }
        ),
        os.path.join(gdir, "golden_targets.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "url": list(res.texts),
                "text": [v.decode("utf-8", "surrogateescape")
                         for v in res.texts.values()],
            }
        ),
        os.path.join(gdir, "golden_texts.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "filetype": list(res.ft_counts),
                "n": pa.array([res.ft_counts[k] for k in res.ft_counts],
                              pa.int64()),
            }
        ),
        os.path.join(gdir, "golden_counts.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return gdir


_crawl_memo: Dict[str, str] = {}


def _run_crawl(sf_dir: str) -> str:
    """Run the distributed crawl once per sf_dir; memoize the CHECKPOINT
    DIR (queries read it back as lazy Datasets — nothing crawl-sized
    folds through the driver)."""
    if sf_dir in _crawl_memo:
        return _crawl_memo[sf_dir]
    from methanol_web_crawler_ray.pipelines import crawl

    pdir = _pages_dir(sf_dir)
    ck = os.path.join(_CKPT_BASE, os.path.basename(pdir))
    shutil.rmtree(ck, ignore_errors=True)
    crawl.crawl_rounds(_crawl_cfg(), pdir, _CRAWL_SEEDS, ckpt_dir=ck,
                       concurrency=4)
    _crawl_memo[sf_dir] = ck
    return ck


def entry() -> Any:
    """Flagship: the distributed politeness-rounds crawl on sf0.001."""
    from methanol_web_crawler_ray.pipelines import crawl

    return crawl.visits_ds(_run_crawl("/root/testdata/sf0.001"))


# ---------------------------------------------------------------------------
# queries


def _q_crawl_visits(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import crawl

    return crawl.visits_ds(_run_crawl(sf_dir))


def _q_crawl_targets(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import crawl

    return crawl.targets_ds(_run_crawl(sf_dir))


def _q_crawl_texts(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import crawl

    return crawl.texts_ds(_run_crawl(sf_dir))


def _q_crawl_counts(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import crawl

    return crawl.ft_counts_ds(_run_crawl(sf_dir))


def _q_page_text(sf_dir: str):
    """Vectorized extract-text over the WHOLE pages table (M10/M11) —
    byte-identity vs the golden text column."""
    from methanol_web_crawler_ray.stages.extract import page_text

    return page_text(_pages_dir(sf_dir))


def _q_page_links(sf_dir: str):
    """Per-page raw link extraction (M5/M6/M7) in document order — vs the
    generator's by-construction golden_links."""
    from methanol_web_crawler_ray.stages.extract import page_links

    return page_links(_pages_dir(sf_dir))


def _q_media_decode(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import multimodal

    return multimodal.media_decode()


def _q_media_features(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import multimodal

    return multimodal.media_features()


def _q_media_frames(sf_dir: str):
    from methanol_web_crawler_ray.pipelines import multimodal

    return multimodal.media_frames()


def _q_page_anchors(sf_dir: str):
    """<a>-tag anchor-text extraction (extension kernel) vs the
    generator's by-construction golden."""
    from methanol_web_crawler_ray.stages.extract import page_anchors

    return page_anchors(_pages_dir(sf_dir))


def _q_page_anchor_text(sf_dir: str):
    """Per-target inlink anchor-text aggregation (extraction → resolve →
    combiner-friendly double groupby)."""
    from methanol_web_crawler_ray.stages.extract import anchor_text_agg

    return anchor_text_agg(_pages_dir(sf_dir))


def _q_page_dup_titles(sf_dir: str):
    from methanol_web_crawler_ray.stages.extract import dup_titles

    return dup_titles(_pages_dir(sf_dir))


def _q_page_titles(sf_dir: str):
    """The stock 'title' parser (M15) distributed through the real
    parse-chain runtime, vs the generator's by-construction titles."""
    from methanol_web_crawler_ray.stages.extract import page_titles

    return page_titles(_pages_dir(sf_dir))


def _q_media_stdlib_decode(sf_dir: str):
    """REAL stdlib-format decode (BMP/PPM/WAV/PPM-stream) — the same
    DecodeMeta actor stage with codec='stdlib' over real-format payloads,
    gated against the generator's by-construction metadata."""
    from methanol_web_crawler_ray.pipelines import multimodal

    return multimodal.media_decode(multimodal.stdlib_media_dir_for(),
                                   codec="stdlib")


def _q_ftp_entries(sf_dir: str):
    """ftpparse (S3/M8) over all 9 LIST dialects — vs the generator's
    by-construction golden entries."""
    from methanol_web_crawler_ray.pipelines import ftp

    return ftp.ftp_entries()


def _q_page_xmlconv(sf_dir: str):
    """xmlconv (M9) over every html page — byte-compared against the
    generator's by-construction golden_xml table."""
    from methanol_web_crawler_ray.stages.extract import page_xmlconv

    return page_xmlconv(_pages_dir(sf_dir))


def _q_page_classify(sf_dir: str):
    """ftindex URL→filetype decision tree (F1-F4) over every page URL —
    vs the generator's by-construction golden_classify table."""
    from methanol_web_crawler_ray.stages.extract import page_classify

    return page_classify(_pages_dir(sf_dir))


def _q_page_canonicalize(sf_dir: str):
    """Extraction chained into canonical resolution (M5-M7 → M1-M4) —
    vs the generator's by-construction golden_canon table."""
    from methanol_web_crawler_ray.stages.extract import page_canonicalize_links

    return page_canonicalize_links(_pages_dir(sf_dir))


def _q_page_host_stats(sf_dir: str):
    """Per-host corpus statistics (the host-directory aggregate) over
    the pages table — grouped sums with in-batch partial aggregation."""
    from methanol_web_crawler_ray.stages.extract import host_stats

    return host_stats(_pages_dir(sf_dir))


def _q_page_url_depth(sf_dir: str):
    """URL path-depth histogram over the pages table (crawl-shape
    audit for the O2 depth cutoff)."""
    from methanol_web_crawler_ray.stages.extract import url_depth_dist

    return url_depth_dist(_pages_dir(sf_dir))


def _q_page_snapshot_latest(sf_dir: str):
    """Latest capture per URL over the multi-snapshot captures table
    (Common-Crawl recrawl dedup; warc_ts column of the input shape)."""
    from methanol_web_crawler_ray.stages.extract import snapshot_latest

    return snapshot_latest(_pages_dir(sf_dir))


def _q_page_host_freshness(sf_dir: str):
    """Per-host recrawl freshness rollup (n_urls, n_captures, ts span)
    over the captures table — the crawl scheduler's staleness input."""
    from methanol_web_crawler_ray.stages.extract import host_freshness

    return host_freshness(_pages_dir(sf_dir))


def _q_page_change_rate(sf_dir: str):
    """Per-URL content drift over the captures table: captures vs
    distinct md5 text versions — the adaptive-revisit signal."""
    from methanol_web_crawler_ray.stages.extract import snapshot_change_rate

    return snapshot_change_rate(_pages_dir(sf_dir))


def _q_page_url_filter(sf_dir: str):
    """URL-level corpus filter (RefinedWeb/UT1 style): broadcast
    link-farm blocklist (hosts over the page-count bar) + literal URL
    penalty substrings, flagged per URL."""
    from methanol_web_crawler_ray.stages.extract import url_filter

    return url_filter(_pages_dir(sf_dir))


def _q_page_url_templates(sf_dir: str):
    """Per-host digit-collapsed URL path templates with counts — the
    crawler-trap / URL-pattern audit signal."""
    from methanol_web_crawler_ray.stages.extract import url_templates

    return url_templates(_pages_dir(sf_dir))


def _q_page_mirrors(sf_dir: str):
    """Cross-host mirror families: page texts verbatim on >=2 hosts
    (md5-keyed, 16-byte shuffle), via the live extraction chain."""
    from methanol_web_crawler_ray.stages.extract import page_mirrors

    return page_mirrors(_pages_dir(sf_dir))


def _q_page_revisit_schedule(sf_dir: str):
    """Integer-exact adaptive revisit schedule over the captures
    history (mean observed change interval / 2x-span backoff / cold
    default)."""
    from methanol_web_crawler_ray.stages.extract import revisit_schedule

    return revisit_schedule(_pages_dir(sf_dir))


def _q_page_snapshot_diff(sf_dir: str):
    """Line-level added/removed counts between consecutive captures of
    each URL (md5-per-line identity on both sides)."""
    from methanol_web_crawler_ray.stages.extract import snapshot_diff

    return snapshot_diff(_pages_dir(sf_dir))


def _q_page_cdx(sf_dir: str):
    """CDX-style index records (SURT urlkey, capture ts, content
    digest) over the captures history."""
    from methanol_web_crawler_ray.stages.extract import cdx_index

    return cdx_index(_pages_dir(sf_dir))


def _q_page_host_budget(sf_dir: str):
    """Per-host polite fetch budget: robots Crawl-delay floored at the
    friendly-mode spacing, times page count."""
    from methanol_web_crawler_ray.stages.extract import host_budget

    return host_budget(_pages_dir(sf_dir))


def _q_page_boilerplate(sf_dir: str):
    """Per-host boilerplate-line detection: distinct text lines on >=50%
    of a host's pages (template chrome)."""
    from methanol_web_crawler_ray.stages.extract import boilerplate_stats

    return boilerplate_stats(_pages_dir(sf_dir))


def _q_page_canon_rules(sf_dir: str):
    """Canonicalization-rule firing counts over every extracted ref
    (the M1-M4 regression dashboard)."""
    from methanol_web_crawler_ray.stages.extract import canon_rules_audit

    return canon_rules_audit(_pages_dir(sf_dir))


def _q_page_robots_audit(sf_dir: str):
    """Per-host robots coverage: allowed/denied page counts under the
    reference's allow-first filter (M13), real kernel per URL."""
    from methanol_web_crawler_ray.stages.extract import robots_audit

    return robots_audit(_pages_dir(sf_dir))


def _q_page_outlink_stats(sf_dir: str):
    """Per-page outlink audit (ref/resolve/external/dynamic counts,
    M4 hostcmp semantics for the external flag)."""
    from methanol_web_crawler_ray.stages.extract import outlink_stats

    return outlink_stats(_pages_dir(sf_dir))


def _q_page_recrawl_plan(sf_dir: str):
    """Politeness-aware recrawl plan: per-host fetch order + scheduled
    times from adaptive due-times and the host's effective delay."""
    from methanol_web_crawler_ray.stages.extract import recrawl_plan

    return recrawl_plan(_pages_dir(sf_dir))


def _q_page_redirects(sf_dir: str):
    """Redirect-chain terminal resolution over page_meta (worker.c:809
    20-cap), pointer-doubling above the size gate — loops and over-cap
    chains emit ('', -1)."""
    from methanol_web_crawler_ray.stages.extract import redirect_resolve

    return redirect_resolve(_pages_dir(sf_dir))


def queries() -> dict[str, Callable[[str], Any]]:
    # DICT ORDER IS THE GATING ORDER: the driver records only the FIRST
    # 50 entries per round.  Round-5 rotation (VERDICT r4 ask #1): the 63
    # queries never driver-gated in rounds 1-4 (all of round 4's
    # additions) lead the dict, in their original relative order, so
    # CORRECTNESS_r05 gates 50 of them; the 13 that remain past the cap
    # plus the 65 already driver-green in r1-r4 (each with at least one
    # green row in a CORRECTNESS_r0*.json) form the tail.  Every tail
    # query stays covered by the local strict gate (tools/local_gate.py)
    # and the pytest suite.
    return {
        # ---- never-driver-gated until round 5 (63) ----
        "page_anchors": _q_page_anchors,
        "page_anchor_text": _q_page_anchor_text,
        "page_titles": _q_page_titles,
        # per-source language purity (mixing-table sanity check)
        "doc_source_lang_purity": textops.source_lang_purity,
        # ---- round-4 additions (past the gating cap; local-gate +
        # pytest oracled like the rest of the tail)
        "doc_span_dedup": textops.span_dedup,
        "doc_dsir_weights": textops.dsir_weights,
        "doc_bm25_topk": textops.bm25_topk,
        "page_url_filter": _q_page_url_filter,
        # SemDeDup (Abbas et al. 2023): kmeans-bucketed semantic near-dup
        "emb_semdedup": ann.emb_semdedup,
        # embedding-norm distribution (batch-sanity audit, quantized)
        "emb_norm_dist": ann.emb_norm_dist,
        # link-graph degree counts (inbound-link quality signal)
        "graph_degrees": graph.link_degrees,
        # WIMBD-style corpus bigram heavy hitters (Misra-Gries + verify)
        "doc_top_bigrams": textops.top_bigrams,
        # SoftDeDup-style duplication reweighting (keep + downweight)
        "doc_dup_weights": textops.dup_weights,
        # host-level link graph (the crawl-scheduler / host-reputation
        # aggregation of the closed edge set)
        "graph_host_graph": graph.link_host_graph,
        # mutual-link pairs (link-farm / site-boundary signal)
        "graph_reciprocal": graph.link_reciprocal,
        # global triangle count (Cohen MR wedge-join, no broadcast)
        "graph_triangles": graph.link_triangles,
        "graph_neighbor_jaccard": graph.link_neighbor_jaccard,
        # WIMBD-style boolean AND corpus search, tf-ranked top-k
        "doc_search": textops.search_topk,
        # Heaps-law vocabulary growth curve (corpus saturation signal)
        "doc_vocab_growth": textops.vocab_growth,
        # per-doc OOV rate vs the corpus top-k vocab (coverage audit)
        "doc_oov_rate": textops.oov_rate,
        # RAG sliding-window chunking (overlapping windows + digest)
        "doc_chunks": textops.doc_chunks,
        # MinHash banding recall vs exact ground truth (dedup eval)
        "doc_dedup_recall": textops.dedup_recall,
        # corpus chunk-duplication profile (digest-count rollup)
        "doc_chunk_dedup": textops.chunk_dedup_stats,
        # per-doc novel-3-gram contribution (marginal-value curve)
        "doc_novelty": textops.doc_novelty,
        # ordered-stage product-analytics funnel per user
        "rel_events_funnel": relops.events_funnel,
        # daily volume vs per-type mean (integer anomaly score)
        "rel_events_anomaly": relops.events_anomaly,
        # product-quantization codes (FAISS-style vector compression)
        "emb_pq_codes": ann.emb_pq_codes,
        # duplicated-n-gram fraction (MassiveText/RefinedWeb signal)
        "doc_dup_ngrams": textops.dup_ngrams,
        # cohort retention matrix (first-day cohorts, day offsets)
        "rel_events_retention": relops.events_retention,
        # PQ asymmetric-distance top-k (FAISS ADC search path)
        "ann_topk_adc": ann.ann_topk_adc,
        # HITS hubs/authorities (Kleinberg mutual reinforcement)
        "graph_hits": graph.link_hits,
        # temperature-resampled language mixing weights (T=2)
        "doc_lang_weights": textops.lang_weights,
        # BPE tokenizer merge learning (Sennrich et al. '16)
        "doc_bpe_merges": textops.bpe_merges,
        # learned-merge corpus tokenization + compression signal
        "doc_bpe_tokenize": textops.bpe_tokenize,
        # declared-vs-detected language confusion matrix
        "doc_lang_confusion": textops.lang_confusion,
        # in/out-degree power-law histogram
        "graph_degree_dist": graph.degree_dist,
        # TPC-H Q3 shape: big-big shuffle hash join + top-k
        "rel_order_revenue": relops.order_revenue_topk,
        # distributed Lloyd k-means (k·dim-bounded exchange per round)
        "emb_kmeans": ann.emb_kmeans,
        # market-basket pair support (A-Priori L2 pass)
        "rel_events_cooccur": relops.events_cooccur,
        # 2-hop reachability (frontier fanout estimate)
        "graph_2hop": graph.link_2hop,
        # GloVe-style window co-occurrence matrix build
        "doc_word_cooccur": textops.word_cooccur,
        # WIMBD cross-source n-gram overlap audit
        "doc_source_overlap": textops.source_overlap,
        # top-N per key (deterministic per-user top events)
        "rel_top_events": relops.top_events_per_user,
        # URL path-depth histogram (spider-trap audit)
        "page_url_depth": _q_page_url_depth,
        # degree-assortativity integer moments (Newman r numerators)
        "graph_assortativity": graph.link_assortativity,
        # grouped exact quantiles (per-type percentile_disc, no sort)
        "rel_value_quantiles": relops.value_quantiles,
        # redirect-chain resolution (pointer doubling, 20-cap)
        "page_redirects": _q_page_redirects,
        # TrustRank: seed-host-personalized PageRank (spam demotion)
        "graph_trustrank": graph.link_trustrank,
        # bounded k-core peeling over the undirected link graph
        "graph_kcore": graph.link_kcore,
        # URL path-template mining (crawler-trap audit)
        "page_url_templates": _q_page_url_templates,
        # cross-host mirror detection by exact text digest
        "page_mirrors": _q_page_mirrors,
        # adaptive revisit schedule (Cho-Garcia-Molina integers)
        "page_revisit_schedule": _q_page_revisit_schedule,
        # line-level deltas between consecutive captures
        "page_snapshot_diff": _q_page_snapshot_diff,
        # recall@k of the LSH path vs exact brute force
        "ann_recall": ann.ann_recall,
        # recall@k of the PQ-ADC path (compression-loss dial)
        "ann_recall_adc": ann.ann_recall_adc,
        # frontier expansion: inlink-ranked uncrawled URLs
        "graph_frontier_candidates": graph.frontier_candidates,
        # CDX index records (SURT urlkey + ts + digest)
        "page_cdx": _q_page_cdx,
        # politeness budget planner (robots delay x page count)
        "page_host_budget": _q_page_host_budget,
        # host-template boilerplate detection (>=50% line rule)
        "page_boilerplate": _q_page_boilerplate,
        # canonicalizer rule-firing audit (M1-M4 dashboard)
        "page_canon_rules": _q_page_canon_rules,
        # per-host robots allow/deny coverage (M13 allow-first filter)
        "page_robots_audit": _q_page_robots_audit,
        # per-page outlink audit (external flag = M4 hostcmp)
        "page_outlink_stats": _q_page_outlink_stats,
        # politeness-aware recrawl plan over the captures family
        "page_recrawl_plan": _q_page_recrawl_plan,
        # ---- driver-green in rounds 1-4 (65) ----
        # FTP LIST parser over the multi-dialect listings table (S3/M8)
        "ftp_entries": _q_ftp_entries,
        # multimodal plumbing (deterministic fake codec)
        "media_decode": _q_media_decode,
        "media_features": _q_media_features,
        "media_frames": _q_media_frames,
        "media_stdlib_decode": _q_media_stdlib_decode,
        # windowed relational ops
        "rel_events_sliding": relops.events_sliding_window,
        "rel_events_sessionize": relops.events_sessionize,
        # NEW round 4: warc_ts recrawl-history operators (input_hint
        # coverage — the captures table is the multi-snapshot history)
        "page_snapshot_latest": _q_page_snapshot_latest,
        "page_host_freshness": _q_page_host_freshness,
        "page_change_rate": _q_page_change_rate,
        # CCNet head/middle/tail corpus split by LM-coverage terciles
        "doc_lm_buckets": textops.lm_buckets,
        # C4-style corpus-wide line-level exact dedup, reported per doc
        "doc_line_dedup": textops.line_dedup,
        # Gopher quality rules (Rae et al. 2021 App. A), integer flags
        "doc_gopher_rules": textops.gopher_rules,
        # crawl engine (SURVEY §2 / §3) — oracled vs the sequential
        # reference simulator's golden parquet
        "crawl_visits": _q_crawl_visits,
        "crawl_targets": _q_crawl_targets,
        "crawl_texts": _q_crawl_texts,
        "crawl_ft_counts": _q_crawl_counts,
        # standalone parse/convert kernels over the whole pages table
        "page_text": _q_page_text,
        "page_xmlconv": _q_page_xmlconv,
        "page_classify": _q_page_classify,
        "page_host_stats": _q_page_host_stats,
        # text analysis (SQL-oracled)
        "doc_token_stats": textops.token_stats,
        "doc_lang_counts": textops.lang_counts,
        "doc_source_stats": textops.source_stats,
        "doc_exact_dedup": textops.exact_dedup,
        # dedup family
        "doc_minhash_dedup": textops.minhash_dedup,
        "doc_dup_clusters": textops.dup_clusters,
        "doc_tfidf": textops.tfidf_top_terms,
        "doc_simhash_pairs": textops.simhash_pairs,
        "doc_ngram_jaccard": textops.ngram_jaccard_pairs,
        "doc_corpus_clean": textops.corpus_clean,
        "doc_top_tokens": textops.top_tokens,
        "doc_substring_overlap": textops.substring_overlap,
        "doc_distinct_kmv": textops.distinct_tokens_kmv,
        "doc_postings": textops.postings,
        "doc_length_quantiles": textops.length_quantiles,
        "doc_global_rank": textops.global_rank,
        "doc_pack_shards": textops.pack_shards,
        "doc_pack_sequences": textops.pack_sequences,
        "doc_lm_coverage": textops.lm_coverage,
        "doc_decontaminate": textops.decontaminate,
        "doc_sample_stratified": textops.sample_stratified,
        # link-graph analytics (iterative algorithm, fixed-point exact)
        "graph_pagerank": graph.link_pagerank,
        "graph_components": graph.link_components,
        # similarity search
        "ann_topk": ann.ann_topk,
        "ann_topk_lsh": ann.ann_topk_lsh,
        "ann_topk_ivf": ann.ann_topk_ivf,
        "embedding_neardup": ann.embedding_neardup,
        "emb_clusters": ann.emb_clusters,
        # relational wide ops (SQL-oracled)
        "rel_lineitem_agg": relops.lineitem_agg,
        "rel_segment_revenue": relops.segment_revenue,
        "rel_top_parts": relops.top_parts,
        "rel_events_by_type": relops.events_by_type,
        "rel_events_window": relops.events_window,
        "rel_events_asof": relops.events_asof,
        # ---- r3-green queries with independent pytest oracles:
        # sacrificed to the driver's 50-row gating cap (doc_langid /
        # doc_pii_scrub joined the tail to gate the warc_ts operators;
        # rel_events_range_join / rel_price_band_join to gate
        # page_change_rate / doc_lm_buckets — all four r3-green;
        # doc_line_dedup / doc_gopher_rules additionally push
        # rel_events_by_type / rel_events_window / rel_events_asof past
        # the cap — all r3-green, all pytest-oracled in
        # tests/test_relops.py)
        "rel_events_range_join": relops.events_range_join,
        "rel_price_band_join": relops.price_band_join,
        "page_links": _q_page_links,
        "page_canonicalize": _q_page_canonicalize,
        "doc_quality": textops.quality,
        "doc_bpe_tokens": textops.bpe_token_stats,
        "doc_repetition": textops.repetition,
        "doc_fingerprints": textops.fingerprints,
        "doc_langid": textops.langid,
        "doc_pii_scrub": textops.pii_scrub,
        # ---- round-5 additions (tail: local-gate + pytest oracled) ----
        # per-user event-type transition matrix (first-order Markov)
        "rel_events_markov": relops.events_markov,
        # duplicate-title audit over the real 'title' parse chain
        "page_dup_titles": _q_page_dup_titles,
        # IVF-probed PQ asymmetric-distance search (FAISS IVFPQ shape)
        "ann_topk_ivfpq": ann.ann_topk_ivfpq,
        # recall@k of the IVFPQ path (pruning x compression dial)
        "ann_recall_ivfpq": ann.ann_recall_ivfpq,
        # PMI collocation mining over the heavy-hitter bigrams (WIMBD)
        "doc_pmi_bigrams": textops.pmi_bigrams,
        # label-propagation communities (bounded sync LPA rounds)
        "graph_lpa": graph.link_lpa,
        # TPC-H Q5 shape: 6-table local-supplier revenue per nation
        "rel_local_supplier_volume": relops.local_supplier_volume,
        # host-level PageRank (the frontier scheduler's reputation)
        "graph_host_pagerank": graph.host_pagerank,
    }


def _bm25_sql() -> str:
    """Integer-BM25 oracle: per-term CASE arms generated from the same
    BM25_* constants the Ray side reads, every // chain identical."""
    k1, b = textops.BM25_K1M, textops.BM25_BM
    tf_cols = ", ".join(
        "len(list_filter(toks, x -> x = '" + t.replace("'", "''")
        + f"'))::BIGINT AS tf{i}"
        for i, t in enumerate(textops.BM25_TERMS))
    df_cols = ", ".join(
        f"(count(*) FILTER (WHERE tf{i} > 0))::BIGINT AS df{i}"
        for i in range(len(textops.BM25_TERMS)))
    arms = " + ".join(
        f"(CASE WHEN tf{i} > 0 AND df{i} > 0 THEN "
        f"(((1000 * n) // df{i}) * "
        f"((1000 * tf{i} * ({k1} + 1000)) // "
        f"(1000 * tf{i} + ({k1} * (1000 - {b} + "
        f"({b} * dl * n) // tt)) // 1000))) // 1000 "
        f"ELSE 0 END)"
        for i in range(len(textops.BM25_TERMS)))
    return (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        "st AS (SELECT count(*)::BIGINT AS n, "
        "greatest(sum(len(toks)), 1)::BIGINT AS tt FROM t), "
        f"tf AS (SELECT doc_id, len(toks)::BIGINT AS dl, {tf_cols} "
        "FROM t), "
        f"df AS (SELECT {df_cols} FROM tf), "
        f"s AS (SELECT doc_id, ({arms})::BIGINT AS score "
        "FROM tf, st, df), "
        "r AS (SELECT doc_id, score, row_number() OVER "
        "(ORDER BY score DESC, doc_id)::BIGINT AS rank "
        "FROM s WHERE score > 0) "
        f"SELECT doc_id, score, rank FROM r WHERE rank <= "
        f"{textops.BM25_TOPK}"
    )


def oracle_sql() -> dict[str, str]:
    # golden files for the crawl queries are produced HERE (cheap, pure
    # python) so the paths referenced below exist before DuckDB runs
    gold = _golden_dir("/root/testdata/sf0.01")
    pdir = _pages_dir("/root/testdata/sf0.01")
    stop = "('the','a','of','and','to')"
    langprof = textops.write_langid_profiles("/tmp/mwc_langid_profiles.parquet")
    mhparams = textops.write_minhash_params("/tmp/mwc_minhash_params.parquet")
    piidocs = textops.pii_documents_path("/root/testdata/sf0.01")
    lshp = ann.write_lsh_planes("/tmp/mwc_lsh_planes_topk.parquet",
                                ann.LSH_SEED, ann.LSH_TABLES, ann.LSH_PLANES)
    ndp = ann.write_lsh_planes("/tmp/mwc_lsh_planes_nd.parquet",
                               ann.ND_SEED, ann.ND_TABLES, ann.ND_PLANES)
    emb_aug = ann.augmented_embeddings_path("/root/testdata/sf0.01")
    ivfc = ann.write_ivf_centroids("/tmp/mwc_ivf_centroids.parquet",
                                   "/root/testdata/sf0.01")
    pqc = ann.write_pq_codebook("/tmp/mwc_pq_codebook.parquet",
                                "/root/testdata/sf0.01")
    from methanol_web_crawler_ray.pipelines import ftp as _ftp
    from methanol_web_crawler_ray.pipelines import multimodal as _mm
    from methanol_web_crawler_ray.sources.captures import captures_path

    media_dir = _mm.media_dir_for()
    smedia_dir = _mm.stdlib_media_dir_for()
    _ftp_dir = _ftp.ftp_dir_for()
    cap = captures_path(pdir)
    # corpus bigram-LM coverage (shared by doc_lm_coverage and, as a
    # subquery, doc_lm_buckets): positional md5-31-bit bigram keys (the
    # shingle key family), model = keys with corpus count >=
    # LM_MIN_COUNT capped at the LM_TOP_V most frequent, coverage
    # decided in integer permille
    lm_cov_sql = (
        "WITH t AS (SELECT doc_id, "
        "regexp_extract_all(lower(text), '\\S+') AS toks "
        "FROM documents), "
        "g0 AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN "
        "list_transform(range(1, len(toks)), i -> "
        "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) "
        "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
        "ELSE [] END AS grams FROM t), "
        "gx AS (SELECT doc_id, CAST(md5_number_lower(g) & "
        "2147483647::UBIGINT AS BIGINT) AS x "
        "FROM g0, UNNEST(grams) AS u(g)), "
        f"model AS (SELECT x FROM gx GROUP BY x "
        f"HAVING count(*) >= {textops.LM_MIN_COUNT} "
        # top-V vocabulary cap, ties by key ascending (exactly the
        # Ray side's sort_values([c desc, x asc]).head(top_v))
        f"ORDER BY count(*) DESC, x LIMIT {textops.LM_TOP_V}), "
        "per AS (SELECT gx.doc_id, count(*)::BIGINT AS nb, "
        "count(m.x)::BIGINT AS nk FROM gx "
        "LEFT JOIN model m USING (x) GROUP BY gx.doc_id) "
        "SELECT d.doc_id, COALESCE(per.nb, 0)::BIGINT AS n_bigrams, "
        "COALESCE(per.nk, 0)::BIGINT AS n_known, "
        "(CASE WHEN COALESCE(per.nb, 0) > 0 "
        "THEN (per.nk * 1000) // per.nb ELSE 0 END)::BIGINT "
        "AS coverage_permille "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )
    d = {
        "crawl_visits": (
            f"SELECT url, host, depth, round_num, seq FROM "
            f"read_parquet('{gold}/golden_visits.parquet')"
        ),
        "crawl_targets": (
            f"SELECT url, url_hash, filetype FROM "
            f"read_parquet('{gold}/golden_targets.parquet')"
        ),
        "crawl_texts": (
            f"SELECT url, text FROM read_parquet('{gold}/golden_texts.parquet')"
        ),
        "crawl_ft_counts": (
            f"SELECT filetype, n FROM read_parquet('{gold}/golden_counts.parquet')"
        ),
        "page_text": (
            f"SELECT url, text FROM read_parquet('{pdir}/pages.parquet')"
        ),
        "page_links": (
            f"SELECT url, link_seq, ref_raw FROM "
            f"read_parquet('{pdir}/golden_links.parquet')"
        ),
        "page_xmlconv": (
            f"SELECT url, xhtml FROM "
            f"read_parquet('{pdir}/golden_xml.parquet')"
        ),
        # anchor extraction vs the by-construction golden; the
        # aggregation re-derives targets distributed, the oracle uses the
        # golden's by-construction canon column
        "page_anchors": (
            f"SELECT url, anchor_seq, href_raw, anchor FROM "
            f"read_parquet('{pdir}/golden_anchors.parquet')"
        ),
        "page_anchor_text": (
            f"SELECT canon AS target, count(*)::BIGINT AS n_anchors, "
            f"count(DISTINCT url)::BIGINT AS n_sources, "
            f"min(anchor) AS top_anchor FROM "
            f"read_parquet('{pdir}/golden_anchors.parquet') GROUP BY canon"
        ),
        # M15 stock 'title' parser via the real chain runtime
        "page_titles": (
            f"SELECT url, title FROM "
            f"read_parquet('{pdir}/golden_titles.parquet')"
        ),
        "rel_events_markov": relops.markov_oracle_sql(),
        "doc_pmi_bigrams": textops.pmi_oracle_sql(),
        "graph_lpa": graph.lpa_oracle_sql(pdir),
        "rel_local_supplier_volume": relops.q5_oracle_sql(),
        "graph_host_pagerank": graph.host_pagerank_oracle_sql(pdir),
        "ann_topk_ivfpq": ann.ivfpq_oracle_sql(ivfc, pqc),
        "page_dup_titles": (
            "WITH t AS (SELECT title, split_part(url, '/', 3) AS host "
            f"FROM read_parquet('{pdir}/golden_titles.parquet')) "
            "SELECT title, count(*)::BIGINT AS n_pages, "
            "count(DISTINCT host)::BIGINT AS n_hosts FROM t "
            "GROUP BY title"
        ),
        "page_classify": (
            f"SELECT url, filetype FROM "
            f"read_parquet('{pdir}/golden_classify.parquet')"
        ),
        "page_canonicalize": (
            f"SELECT url, link_seq, canon FROM "
            f"read_parquet('{pdir}/golden_canon.parquet')"
        ),
        "doc_token_stats": (
            "SELECT doc_id, length(regexp_extract_all(text,'\\S+'))::BIGINT "
            "AS n_tokens, length(text)::BIGINT AS n_chars FROM documents"
        ),
        "doc_quality": (
            "SELECT doc_id, length(text)::BIGINT AS n_chars, "
            "len(list_filter(regexp_extract_all(text,'\\S+'), "
            f"x -> x IN {stop}))::BIGINT AS n_stop, "
            "(length(text) BETWEEN 50 AND 5000 AND "
            "len(list_filter(regexp_extract_all(text,'\\S+'), "
            f"x -> x IN {stop})) >= 1)::BIGINT AS quality_ok FROM documents"
        ),
        "doc_lang_counts": (
            "SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang"
        ),
        "doc_source_stats": (
            "SELECT source, count(*)::BIGINT AS n_docs, "
            "sum(length(text))::BIGINT AS total_chars "
            "FROM documents GROUP BY source"
        ),
        "doc_exact_dedup": (
            "SELECT min(doc_id) AS doc_id FROM documents GROUP BY text"
        ),
        # composed cleaning pipeline: quality gate -> lang filter ->
        # exact dedup (min doc_id per text) -> token stats
        "doc_corpus_clean": (
            "WITH q AS (SELECT doc_id, text FROM documents "
            "WHERE lang = 'en' AND length(text) BETWEEN 50 AND 5000 "
            "AND len(list_filter(regexp_extract_all(text,'\\S+'), "
            f"x -> x IN {stop})) >= 1), "
            "k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY text) "
            "SELECT q.doc_id, "
            "length(regexp_extract_all(q.text,'\\S+'))::BIGINT AS n_tokens, "
            "length(q.text)::BIGINT AS n_chars FROM q JOIN k USING (doc_id)"
        ),
        # corpus-wide heavy hitters (exact top-50, tie-break on token)
        "doc_top_tokens": (
            "WITH t AS (SELECT unnest(regexp_extract_all(text, '\\S+')) "
            "AS token FROM documents), "
            "c AS (SELECT token, count(*)::BIGINT AS cnt FROM t "
            "GROUP BY token), "
            "r AS (SELECT token, cnt, row_number() OVER "
            "(ORDER BY cnt DESC, token) AS rank FROM c) "
            "SELECT token, cnt, rank FROM r WHERE rank <= 50"
        ),
        # SoftDeDup reweighting: exact-content cluster size + integer
        # inverse weight per member
        "doc_dup_weights": (
            "WITH h AS (SELECT doc_id, md5(text) AS k FROM documents), "
            "c AS (SELECT k, count(*)::BIGINT AS n FROM h GROUP BY k) "
            "SELECT h.doc_id, c.n AS cluster_size, "
            "(1000 // c.n)::BIGINT AS weight_permille "
            "FROM h JOIN c USING (k)"
        ),
        # corpus-wide bigram heavy hitters (WIMBD-style; exact top-50)
        "doc_top_bigrams": (
            "WITH t AS (SELECT regexp_extract_all(text, '\\S+') AS toks "
            "FROM documents), "
            "bg AS (SELECT toks[CAST(i AS INT)] || ' ' || "
            "toks[CAST(i + 1 AS INT)] AS token "
            "FROM t, UNNEST(range(1, len(toks))) AS u(i)), "
            "c AS (SELECT token, count(*)::BIGINT AS cnt FROM bg "
            "GROUP BY token), "
            "r AS (SELECT token, cnt, row_number() OVER "
            "(ORDER BY cnt DESC, token) AS rank FROM c) "
            "SELECT token, cnt, rank FROM r WHERE rank <= 50"
        ),
        "ann_topk": (
            "WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings "
            "WHERE vec_id < 5), "
            "s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id, "
            "list_cosine_similarity(e.embedding, q.qe) AS sim "
            "FROM embeddings e CROSS JOIN q WHERE e.vec_id != q.qid), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "FROM s) SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 10"
        ),
        # minhash-LSH dedup: md5-keyed 31-bit shingles, 64 exact integer
        # permutations (a*x+b < 2^63 — no wrap on either side), 16x4
        # banding replayed as band-vector equality, exact integer Jaccard
        # verification (inter*5 >= union*4)
        "doc_minhash_dedup": (
            textops.minhash_cte_prefix(mhparams) + " "
            f"SELECT idb AS doc_id, min(ida)::BIGINT AS dup_of FROM j "
            f"WHERE un > 0 "
            f"AND inter * {textops.THRESH_DEN} >= un * {textops.THRESH_NUM} "
            "GROUP BY idb"
        ),
        # near-dup clusters: the same verified pair set, then K unrolled
        # min-label propagation rounds over the undirected pair graph;
        # non-dup docs come back as singleton clusters
        "doc_dup_clusters": textops.dup_clusters_oracle_sql(mhparams),
        # integer tf-idf (score = tf * ((SCALE*N) // df), ties by term):
        # exact on both sides, top-3 per document
        "doc_tfidf": (
            "WITH t AS (SELECT doc_id, unnest("
            "regexp_extract_all(lower(text), '\\S+')) AS tok "
            "FROM documents), "
            "tf AS (SELECT doc_id, tok, count(*)::BIGINT AS tf "
            "FROM t GROUP BY doc_id, tok), "
            "df AS (SELECT tok, count(DISTINCT doc_id)::BIGINT AS df "
            "FROM t GROUP BY tok), "
            "n AS (SELECT count(*)::BIGINT AS n FROM documents), "
            "s AS (SELECT tf.doc_id, tf.tok, "
            f"tf.tf * (({textops.TFIDF_SCALE} * n.n) // df.df) AS score "
            "FROM tf JOIN df USING (tok) CROSS JOIN n), "
            "r AS (SELECT doc_id, tok, score, row_number() OVER "
            "(PARTITION BY doc_id ORDER BY score DESC, tok) AS rank "
            "FROM s) "
            "SELECT doc_id, tok AS term, score::BIGINT AS score, rank "
            f"FROM r WHERE rank <= {textops.TFIDF_TOPK}"
        ),
        # simhash: md5-keyed Charikar fingerprints; the banded pipeline is
        # COMPLETE for hamming<=3 (pigeonhole over 4x16-bit chunks) EXCEPT
        # buckets over SH_BUCKET_CAP (degenerate-value guard) — the oracle
        # replays the same banded+capped candidate generation, then the
        # exact bit_count(xor)<=3 verify
        "doc_simhash_pairs": (
            "WITH toks AS (SELECT doc_id, unnest(list_distinct("
            "regexp_extract_all(lower(text), '\\S+'))) AS tok "
            "FROM documents), "
            "th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM toks), "
            "bits AS (SELECT doc_id, i AS bit, "
            "SUM(CASE WHEN (h >> CAST(i AS INT)) & 1 = 1 THEN 1 ELSE -1 END)"
            " AS v FROM th, UNNEST(range(64)) AS b(i) GROUP BY doc_id, i), "
            "fp AS (SELECT doc_id, SUM(CASE WHEN v > 0 THEN "
            "(1::UBIGINT << CAST(bit AS INT))::HUGEINT ELSE 0 END)"
            " AS f FROM bits GROUP BY doc_id), "
            "allfp AS (SELECT d.doc_id, COALESCE(fp.f, 0)::UBIGINT AS f "
            "FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id), "
            "chunks AS (SELECT doc_id, f, c AS chunk, "
            "(f >> CAST(16 * c AS INT)) & 65535 AS val "
            "FROM allfp, UNNEST(range(4)) AS r(c)), "
            "hot AS (SELECT chunk, val FROM chunks GROUP BY chunk, val "
            f"HAVING count(*) >= 2 AND count(*) <= {textops.SH_BUCKET_CAP}), "
            "cand AS (SELECT DISTINCT a.doc_id AS ida, a.f AS fa, "
            "b.doc_id AS idb, b.f AS fb "
            "FROM chunks a JOIN hot h ON a.chunk = h.chunk AND a.val = h.val "
            "JOIN chunks b ON b.chunk = a.chunk AND b.val = a.val "
            "AND a.doc_id < b.doc_id), "
            "pairs AS (SELECT ida, idb FROM cand "
            "WHERE bit_count(xor(fa, fb)) <= 3) "
            "SELECT idb AS doc_id, min(ida)::BIGINT AS dup_of "
            "FROM pairs GROUP BY idb"
        ),
        # exact n-gram Jaccard join: prefix filtering over value-sorted
        # shingle sets (recall 1.0 by construction modulo the shared
        # NJ_BUCKET_CAP degenerate guard), identical integer verify
        "doc_ngram_jaccard": textops.ngram_jaccard_oracle_sql(),
        # winnowing fingerprints (SIGMOD'03 Fig.5): k-gram md5-hex hashes,
        # window-min with rightmost tie — replayed with a window function
        # + position-of-min join; short docs (< w grams / < k chars) take
        # the single whole-window / whole-string path on both sides
        "doc_fingerprints": (
            textops.fingerprints_cte_prefix() + " "
            "SELECT DISTINCT doc_id, pos::BIGINT AS pos, wmin AS fp FROM sel"
        ),
        # exact substring overlap: pairs sharing >= SS_MIN_SHARED distinct
        # winnowing-selected windows (>= FP_K identical normalized chars
        # each), boilerplate fingerprints capped on both sides
        "doc_substring_overlap": textops.substring_overlap_oracle_sql(),
        # BPE-ish pre-tokenizer counts (pattern shared with the Ray stage;
        # the embedded quote is SQL-doubled)
        "doc_bpe_tokens": (
            "SELECT doc_id, "
            f"len(regexp_extract_all(text, "
            f"'{textops.BPE_PAT.replace(chr(39), chr(39) * 2)}'))::BIGINT "
            "AS n_bpe_tokens, "
            "len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_ws_tokens "
            "FROM documents"
        ),
        # fixed-point PageRank: edges from the golden canon table (value-
        # equal to the live extract→canonicalize chain per the
        # page_canonicalize gate), iterations unrolled as CTE stages
        "graph_pagerank": graph.pagerank_oracle_sql(pdir),
        # connected components: K min-label rounds over the undirected
        # edge set, same unrolled-CTE replay
        "graph_components": graph.components_oracle_sql(pdir),
        # per-node in/out degree over the same closed edge set
        "graph_degrees": graph.degrees_oracle_sql(pdir),
        # SemDeDup: IVF integer assignment + within-cluster pairwise
        # cosine (wide margins), cluster cap replicated
        "emb_semdedup": ann.semdedup_oracle_sql(emb_aug, ivfc),
        # norm dist: quantized unnest + per-vector sum + bucket rollup
        "emb_norm_dist": ann.emb_norm_dist_oracle_sql(),
        # KMV distinct-count sketch, replayed exactly: k smallest md5
        # hashes of the distinct tokens; < k distinct → exact count,
        # else (k-1)·2^64 // kth in HUGEINT, clamped to int64
        "doc_distinct_kmv": (
            "WITH t AS (SELECT DISTINCT unnest("
            "regexp_extract_all(text, '\\S+')) AS tok FROM documents), "
            "h AS (SELECT DISTINCT md5_number_lower(tok) AS hv FROM t), "
            f"k AS (SELECT hv FROM h ORDER BY hv LIMIT {textops.KMV_K}), "
            "agg AS (SELECT count(*)::BIGINT AS n_kept, "
            "COALESCE(max(hv), 0)::UBIGINT AS kth FROM k) "
            "SELECT n_kept, kth AS kth_hash, "
            f"CASE WHEN n_kept < {textops.KMV_K} THEN n_kept "
            f"ELSE CAST(LEAST(({textops.KMV_K} - 1)::HUGEINT * "
            "18446744073709551616::HUGEINT // kth::HUGEINT, "
            "9223372036854775807::HUGEINT) AS BIGINT) END AS est_distinct "
            "FROM agg"
        ),
        # inverted-index build: per-token document frequency + md5 digest
        # of the ascending posting list
        "doc_postings": (
            "WITH p AS (SELECT DISTINCT doc_id, unnest(list_distinct("
            "regexp_extract_all(lower(text), '\\S+'))) AS token "
            "FROM documents) "
            "SELECT token, count(*)::BIGINT AS df, "
            "md5(string_agg(CAST(doc_id AS VARCHAR), ',' "
            "ORDER BY doc_id)) AS postings_md5 FROM p GROUP BY token"
        ),
        # exact length quantiles: percentile_disc rule replayed in
        # integers — smallest n_chars with cum_count*1000 >= q*total
        "doc_length_quantiles": (
            "WITH lens AS (SELECT length(text)::BIGINT AS n_chars "
            "FROM documents), "
            "tot AS (SELECT count(*)::BIGINT AS n FROM lens), "
            "h AS (SELECT n_chars, count(*)::BIGINT AS c FROM lens "
            "GROUP BY n_chars), "
            "cum AS (SELECT n_chars, sum(c) OVER "
            "(ORDER BY n_chars)::BIGINT AS cc FROM h), "
            "qs(q_permille) AS (VALUES (10),(50),(250),(500),(750),"
            "(950),(990)) "
            "SELECT q.q_permille::BIGINT AS q_permille, "
            "min(cum.n_chars)::BIGINT AS n_chars "
            "FROM qs q CROSS JOIN cum CROSS JOIN tot "
            "WHERE cum.cc * 1000 >= q.q_permille * tot.n "
            "GROUP BY q.q_permille"
        ),
        # global total-order rank by (length, doc_id) — row_number replay
        "doc_global_rank": (
            "SELECT doc_id, row_number() OVER "
            "(ORDER BY length(text), doc_id)::BIGINT AS rank "
            "FROM documents"
        ),
        # corpus bigram-LM coverage (the shared CTE hoisted above the
        # dict so doc_lm_buckets can replay it as a subquery)
        "doc_lm_coverage": lm_cov_sql,
        # CCNet head/middle/tail split: descending-percentile value
        # thresholds — t_q = the LARGEST score v with count(scores >=
        # v) x 1000 >= q x total; head = score >= t_333, middle =
        # score >= t_667, else tail (ties land in the better bucket)
        "doc_lm_buckets": (
            f"WITH cov AS (SELECT * FROM ({lm_cov_sql})), "
            "h AS (SELECT coverage_permille AS v, count(*)::BIGINT AS c "
            "FROM cov GROUP BY v), "
            "tot AS (SELECT count(*)::BIGINT AS n FROM cov), "
            "cum AS (SELECT v, sum(c) OVER (ORDER BY v DESC)::BIGINT "
            "AS cc FROM h), "
            f"th AS (SELECT max(v) AS t FROM cum, tot "
            f"WHERE cc * 1000 >= {textops.LM_BUCKET_Q[0]} * tot.n), "
            f"tm AS (SELECT max(v) AS t FROM cum, tot "
            f"WHERE cc * 1000 >= {textops.LM_BUCKET_Q[1]} * tot.n) "
            "SELECT cov.doc_id, cov.coverage_permille, "
            "CASE WHEN cov.coverage_permille >= th.t THEN 'head' "
            "WHEN cov.coverage_permille >= tm.t THEN 'middle' "
            "ELSE 'tail' END AS bucket FROM cov, th, tm"
        ),
        # line-level exact dedup (C4 §2.2 pass, per-doc outcome): a
        # candidate line is any '\n'-split segment whose
        # strip(' \t\r') is non-empty; the corpus-wide keeper per
        # md5(stripped line) is the min (doc_id, idx) occurrence,
        # encoded as doc_id*2^32+idx exactly like the Ray side
        "doc_line_dedup": (
            "WITH lines AS (SELECT doc_id, "
            "generate_subscripts(parts, 1)::BIGINT AS idx, "
            "unnest(parts) AS line FROM (SELECT doc_id, "
            "string_split(text, chr(10)) AS parts FROM documents)), "
            "cand AS (SELECT doc_id, idx, "
            "md5(trim(line, ' ' || chr(9) || chr(13))) AS k "
            "FROM lines WHERE trim(line, ' ' || chr(9) || chr(13)) <> ''), "
            "keeper AS (SELECT k, min(doc_id * 4294967296 + idx) AS mo "
            "FROM cand GROUP BY k), "
            "kept AS (SELECT (mo // 4294967296)::BIGINT AS doc_id, "
            "count(*)::BIGINT AS n_kept FROM keeper GROUP BY 1), "
            "tot AS (SELECT doc_id, count(*)::BIGINT AS n_lines "
            "FROM cand GROUP BY doc_id) "
            "SELECT t.doc_id, t.n_lines, "
            "(t.n_lines - coalesce(kp.n_kept, 0))::BIGINT AS n_dup "
            "FROM tot t LEFT JOIN kept kp USING (doc_id) ORDER BY t.doc_id"
        ),
        # Gopher rules: every count is a per-row list expression (no
        # unnest), every threshold an integer comparison mirroring the
        # Ray side exactly; '\S+' token parity with doc_token_stats
        "doc_gopher_rules": (
            "WITH c AS (SELECT doc_id, "
            "length(regexp_extract_all(text, '\\S+'))::BIGINT AS n_words, "
            "length(regexp_replace(text, '\\s+', '', 'g'))::BIGINT "
            "AS nw_chars, "
            "len(string_split(text, chr(10)))::BIGINT AS n_lines, "
            "(length(text) - length(replace(text, '#', '')))::BIGINT "
            "AS n_hash, "
            "((length(text) - length(replace(text, '...', ''))) // 3)"
            "::BIGINT AS n_ell, "
            "len(list_filter(string_split(text, chr(10)), x -> "
            "starts_with(ltrim(x, ' ' || chr(9)), '-') OR "
            "starts_with(ltrim(x, ' ' || chr(9)), '*') OR "
            "starts_with(ltrim(x, ' ' || chr(9)), '•')))::BIGINT "
            "AS n_bullet, "
            "len(list_filter(string_split(text, chr(10)), x -> "
            "ends_with(rtrim(x, ' ' || chr(9) || chr(13)), '...') OR "
            "ends_with(rtrim(x, ' ' || chr(9) || chr(13)), '…')))::BIGINT "
            "AS n_ell_ln, "
            "len(list_filter(regexp_extract_all(text, '\\S+'), "
            "x -> regexp_matches(x, '[A-Za-z]')))::BIGINT AS n_alpha, "
            "len(list_distinct(list_filter("
            "regexp_extract_all(lower(text), '\\S+'), x -> x IN "
            "('the','be','to','of','and','that','have','with'))))::BIGINT "
            "AS n_stopw FROM documents) "
            "SELECT doc_id, n_words, n_lines, "
            f"(n_words BETWEEN {textops.GOPHER_MIN_WORDS} AND "
            f"{textops.GOPHER_MAX_WORDS})::BIGINT AS ok_nwords, "
            "(3 * n_words <= nw_chars AND nw_chars <= 10 * n_words)"
            "::BIGINT AS ok_meanlen, "
            "(10 * (n_hash + n_ell) <= n_words)::BIGINT AS ok_symbol, "
            "(10 * n_bullet <= 9 * n_lines)::BIGINT AS ok_bullet, "
            "(10 * n_ell_ln <= 3 * n_lines)::BIGINT AS ok_ellipsis, "
            "(5 * n_alpha >= 4 * n_words)::BIGINT AS ok_alpha, "
            "(n_stopw >= 2)::BIGINT AS ok_stop, "
            f"(n_words BETWEEN {textops.GOPHER_MIN_WORDS} AND "
            f"{textops.GOPHER_MAX_WORDS} "
            "AND 3 * n_words <= nw_chars AND nw_chars <= 10 * n_words "
            "AND 10 * (n_hash + n_ell) <= n_words "
            "AND 10 * n_bullet <= 9 * n_lines "
            "AND 10 * n_ell_ln <= 3 * n_lines "
            "AND 5 * n_alpha >= 4 * n_words "
            "AND n_stopw >= 2)::BIGINT AS gopher_ok FROM c"
        ),
        # shard packing: exclusive global byte offset in (byte-length,
        # doc_id) order → fixed-size shard assignment (window-cumsum
        # replay; strlen = UTF-8 BYTES exactly like the Ray side's
        # pc.binary_length; the (length, doc_id) key is unique so RANGE
        # framing == ROWS)
        "doc_pack_shards": (
            "WITH o AS (SELECT doc_id, "
            "(sum(strlen(text)) OVER (ORDER BY strlen(text), doc_id) "
            "- strlen(text))::BIGINT AS offset_bytes FROM documents) "
            f"SELECT doc_id, offset_bytes, "
            f"(offset_bytes // {textops.SHARD_BYTES})::BIGINT AS shard_id "
            "FROM o"
        ),
        # concat-and-chunk sequence packing: per-(doc, sequence) span
        # rows over the (n_tokens, doc_id)-ordered token stream
        "doc_pack_sequences": textops.pack_sequences_oracle_sql(),
        # decontamination: distinct word-3-gram keys (the minhash shingle
        # key) of the doc_id % BENCH_MOD benchmark members, probed by
        # every other document
        "doc_decontaminate": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS toks FROM documents), "
            "sh0 AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
            "list_transform(range(1, len(toks) - 1), i -> "
            "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] || ' ' "
            "|| toks[CAST(i AS INT) + 2]) "
            "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
            "ELSE [] END AS grams FROM t), "
            "sh AS (SELECT doc_id, list_distinct(list_transform(grams, "
            "g -> CAST(md5_number_lower(g) & 2147483647::UBIGINT AS BIGINT)"
            ")) AS xs FROM sh0), "
            f"bench AS (SELECT DISTINCT u.x FROM sh, UNNEST(sh.xs) AS u(x) "
            f"WHERE doc_id % {textops.BENCH_MOD} = 0), "
            f"probe AS (SELECT doc_id, xs FROM sh "
            f"WHERE doc_id % {textops.BENCH_MOD} != 0), "
            "hits AS (SELECT p.doc_id, count(*)::BIGINT AS n "
            "FROM probe p, UNNEST(p.xs) AS u(x), bench b "
            "WHERE b.x = u.x GROUP BY p.doc_id) "
            "SELECT p.doc_id, len(p.xs)::BIGINT AS n_shingles, "
            "COALESCE(h.n, 0)::BIGINT AS n_hits, "
            "(COALESCE(h.n, 0) > 0)::BIGINT AS contaminated "
            "FROM probe p LEFT JOIN hits h ON h.doc_id = p.doc_id"
        ),
        # stratified sampling: md5-lower-8-LE(doc_id-as-string) ‰ selector
        # with per-language keep rates — pure function of the row
        "doc_sample_stratified": (
            "SELECT doc_id, lang, source FROM documents "
            "WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 1000 < "
            f"CASE WHEN lang = 'en' THEN {textops.SAMPLE_PERMILLE['en']} "
            f"WHEN lang = 'de' THEN {textops.SAMPLE_PERMILLE['de']} "
            f"ELSE {textops.SAMPLE_DEFAULT_PERMILLE} END"
        ),
        # repetition filter: duplicate word-2-gram fraction, integer-exact
        # n_dup * den <= n_bigrams * num decision
        "doc_repetition": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS toks FROM documents), "
            "g AS (SELECT doc_id, CASE WHEN len(toks) >= 2 THEN "
            "list_transform(range(1, len(toks)), i -> "
            "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) "
            "ELSE [] END AS grams FROM t) "
            "SELECT doc_id, len(grams)::BIGINT AS n_bigrams, "
            "(len(grams) - len(list_distinct(grams)))::BIGINT AS n_dup, "
            "(CASE WHEN (len(grams) - len(list_distinct(grams))) "
            f"* {textops.REP_DEN} <= len(grams) * {textops.REP_NUM} "
            "THEN 1 ELSE 0 END)::BIGINT AS rep_ok FROM g"
        ),
        # PII scrub over the planted fixture: counts from the original
        # text, md5 of the redacted text (same RE2-safe patterns both
        # sides; replacement order email → ip → phone)
        "doc_pii_scrub": (
            f"WITH d AS (SELECT doc_id, text FROM "
            f"read_parquet('{ann.pq_sql_ref(piidocs)}')) "
            "SELECT doc_id, "
            f"len(regexp_extract_all(text, '{textops.PII_EMAIL}'))::BIGINT "
            "AS n_emails, "
            f"len(regexp_extract_all(text, '{textops.PII_IPV4}'))::BIGINT "
            "AS n_ips, "
            f"len(regexp_extract_all(text, '{textops.PII_PHONE}'))::BIGINT "
            "AS n_phones, "
            "md5(regexp_replace(regexp_replace(regexp_replace(text, "
            f"'{textops.PII_EMAIL}', '<EMAIL>', 'g'), "
            f"'{textops.PII_IPV4}', '<IP>', 'g'), "
            f"'{textops.PII_PHONE}', '<PHONE>', 'g')) AS clean_md5 FROM d"
        ),
        # langid: character-bigram cosine argmax, decided in INTEGERS
        # (cross-multiplied dot²/|q|² comparison + fixed tie-break prio) —
        # the SQL replays the identical decision over the same profile
        # table the Ray stage builds from its constants
        "doc_langid": (
            "WITH t AS (SELECT doc_id, ' ' || "
            "regexp_replace(lower(substring(text,1,1000)), '\\s+', ' ', 'g')"
            " || ' ' AS s FROM documents), "
            "g AS (SELECT doc_id, substring(s, CAST(i AS INT), 2) AS gram "
            "FROM t, UNNEST(range(1, length(s))) AS u(i)), "
            "dg AS (SELECT doc_id, gram, count(*)::BIGINT AS cnt "
            "FROM g GROUP BY doc_id, gram), "
            f"prof AS (SELECT * FROM read_parquet('{langprof}')), "
            "langs AS (SELECT DISTINCT lang, prio, n2 FROM prof), "
            "dots AS (SELECT dg.doc_id, p.lang, "
            "SUM(dg.cnt * p.cnt)::BIGINT AS dot "
            "FROM dg JOIN prof p ON dg.gram = p.gram "
            "GROUP BY dg.doc_id, p.lang), "
            "score AS (SELECT d.doc_id, l.lang, l.prio, l.n2, "
            "COALESCE(dots.dot, 0) AS dot "
            "FROM (SELECT doc_id FROM t) d CROSS JOIN langs l "
            "LEFT JOIN dots ON dots.doc_id = d.doc_id AND dots.lang = l.lang) "
            "SELECT s.doc_id, s.lang AS lang_pred FROM score s "
            "WHERE NOT EXISTS (SELECT 1 FROM score m "
            "WHERE m.doc_id = s.doc_id AND m.lang != s.lang "
            "AND (m.dot*m.dot*s.n2 > s.dot*s.dot*m.n2 "
            "OR (m.dot*m.dot*s.n2 = s.dot*s.dot*m.n2 AND m.prio < s.prio)))"
        ),
        # LSH top-k: bucket bits are signs of exact INTEGER dot products
        # (quantized embeddings x integer planes), so candidacy replays
        # identically; ranking reuses list_cosine_similarity like ann_topk
        "ann_topk_lsh": (
            "WITH qv AS (SELECT vec_id, CAST(i AS INT) AS dim, "
            f"CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * {ann.QSCALE}) "
            "AS BIGINT) AS q FROM embeddings, UNNEST(range(64)) AS d(i)), "
            f"pl AS (SELECT * FROM read_parquet('{lshp}')), "
            "dots AS (SELECT qv.vec_id, pl.tbl, pl.plane, "
            "SUM(qv.q * pl.w) AS dot FROM qv JOIN pl ON pl.dim = qv.dim "
            "GROUP BY qv.vec_id, pl.tbl, pl.plane), "
            "bk AS (SELECT vec_id, tbl, SUM(CASE WHEN dot > 0 THEN "
            "(1::BIGINT << CAST(plane AS INT)) ELSE 0 END) AS b "
            "FROM dots GROUP BY vec_id, tbl), "
            "qb AS (SELECT vec_id AS qid, tbl, b FROM bk WHERE vec_id < 5), "
            f"pr AS (SELECT qid, tbl, xor(xor(b::UBIGINT, CASE WHEN i < "
            f"{ann.LSH_PLANES} THEN (1::UBIGINT << CAST(i AS INT)) ELSE 0 "
            f"END), CASE WHEN j < {ann.LSH_PLANES} THEN "
            "(1::UBIGINT << CAST(j AS INT)) ELSE 0 END)::BIGINT AS pb "
            f"FROM qb, UNNEST(range({ann.LSH_PLANES + 1})) AS a(i), "
            f"UNNEST(range({ann.LSH_PLANES + 1})) AS c(j) "
            f"WHERE i <= j AND (j = {ann.LSH_PLANES} OR i < j)), "
            "cand AS (SELECT DISTINCT pr.qid, bk.vec_id FROM pr "
            "JOIN bk ON bk.tbl = pr.tbl AND bk.b = pr.pb "
            "WHERE bk.vec_id != pr.qid), "
            "s AS (SELECT c.qid AS query_id, c.vec_id AS neighbor_id, "
            "list_cosine_similarity(e.embedding, q.embedding) AS sim "
            "FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id "
            "JOIN embeddings q ON q.vec_id = c.qid), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "FROM s) SELECT query_id, neighbor_id, rank FROM r "
            "WHERE rank <= 10"
        ),
        # IVF top-k: list assignment = exact integer distance argmin
        # against the shared quantized centroids (ties -> lowest cid);
        # probes = each query's n_probe nearest lists, same ordering
        "ann_topk_ivf": (
            "WITH qv AS (SELECT vec_id, CAST(i AS INT) AS dim, "
            f"CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * {ann.QSCALE}) "
            "AS BIGINT) AS q FROM embeddings, UNNEST(range(64)) AS d(i)), "
            f"cent AS (SELECT * FROM read_parquet('{ivfc}')), "
            "dist AS (SELECT qv.vec_id, c.cid, "
            "SUM((qv.q - c.c) * (qv.q - c.c)) AS d2 "
            "FROM qv JOIN cent c ON c.dim = qv.dim "
            "GROUP BY qv.vec_id, c.cid), "
            "rk AS (SELECT vec_id, cid, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dist), "
            "lab AS (SELECT vec_id, cid FROM rk WHERE rn = 1), "
            "qprobe AS (SELECT vec_id AS qid, cid FROM rk "
            f"WHERE vec_id < 5 AND rn <= {ann.IVF_PROBE}), "
            "cand AS (SELECT DISTINCT qp.qid, l.vec_id FROM qprobe qp "
            "JOIN lab l ON l.cid = qp.cid WHERE l.vec_id != qp.qid), "
            "s AS (SELECT c.qid AS query_id, c.vec_id AS neighbor_id, "
            "list_cosine_similarity(e.embedding, q.embedding) AS sim "
            "FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id "
            "JOIN embeddings q ON q.vec_id = c.qid), "
            "r AS (SELECT query_id, neighbor_id, row_number() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank "
            "FROM s) SELECT query_id, neighbor_id, rank FROM r "
            "WHERE rank <= 10"
        ),
        # near-dup: same integer bucket replay over the augmented table
        # (planted pairs at cosine ~0.995 vs threshold 0.98 — wide-margin
        # float verification), bucket-size cap replicated
        "embedding_neardup": (
            f"WITH emb AS (SELECT * FROM "
            f"read_parquet('{ann.pq_sql_ref(emb_aug)}')), "
            "qv AS (SELECT vec_id, CAST(i AS INT) AS dim, "
            f"CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * {ann.QSCALE}) "
            "AS BIGINT) AS q FROM emb, UNNEST(range(64)) AS d(i)), "
            f"pl AS (SELECT * FROM read_parquet('{ndp}')), "
            "dots AS (SELECT qv.vec_id, pl.tbl, pl.plane, "
            "SUM(qv.q * pl.w) AS dot FROM qv JOIN pl ON pl.dim = qv.dim "
            "GROUP BY qv.vec_id, pl.tbl, pl.plane), "
            "bk AS (SELECT vec_id, tbl, SUM(CASE WHEN dot > 0 THEN "
            "(1::BIGINT << CAST(plane AS INT)) ELSE 0 END) AS b "
            "FROM dots GROUP BY vec_id, tbl), "
            "hot AS (SELECT tbl, b FROM bk GROUP BY tbl, b "
            f"HAVING count(*) > 1 AND count(*) <= {ann.ND_BUCKET_CAP}), "
            "m AS (SELECT bk.* FROM bk JOIN hot ON hot.tbl = bk.tbl "
            "AND hot.b = bk.b), "
            "cand AS (SELECT DISTINCT x.vec_id AS ida, y.vec_id AS idb "
            "FROM m x JOIN m y ON x.tbl = y.tbl AND x.b = y.b "
            "AND x.vec_id < y.vec_id), "
            "v AS (SELECT c.ida, c.idb FROM cand c "
            "JOIN emb a ON a.vec_id = c.ida JOIN emb b ON b.vec_id = c.idb "
            "WHERE list_cosine_similarity(a.embedding, b.embedding) "
            f">= {ann.ND_THRESHOLD}) "
            "SELECT idb AS vec_id, min(ida)::BIGINT AS dup_of FROM v "
            "GROUP BY idb"
        ),
        # k-means cluster stats: assignment = the IVF oracle's exact
        # integer argmin (ties -> lowest cid) against the shared
        # quantized centroids; per-cluster count + integer inertia
        "emb_clusters": (
            "WITH qv AS (SELECT vec_id, CAST(i AS INT) AS dim, "
            f"CAST(round(CAST(embedding[CAST(i AS INT) + 1] AS DOUBLE) * {ann.QSCALE}) "
            "AS BIGINT) AS q FROM embeddings, UNNEST(range(64)) AS d(i)), "
            f"cent AS (SELECT * FROM read_parquet('{ivfc}')), "
            "dist AS (SELECT qv.vec_id, c.cid, "
            "SUM((qv.q - c.c) * (qv.q - c.c)) AS d2 "
            "FROM qv JOIN cent c ON c.dim = qv.dim "
            "GROUP BY qv.vec_id, c.cid), "
            "rk AS (SELECT vec_id, cid, d2, row_number() OVER "
            "(PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dist), "
            "lab AS (SELECT vec_id, cid, d2 FROM rk WHERE rn = 1) "
            "SELECT cid::BIGINT AS cid, count(*)::BIGINT AS n_vecs, "
            "sum(d2)::BIGINT AS sum_d2 FROM lab GROUP BY cid"
        ),
        # per-host pages-table aggregate (host = URL authority; html in
        # BYTES, text in unicode chars)
        # warc_ts recrawl-history ops over the derived captures table
        # (timestamps compared as exact epoch-microsecond BIGINTs)
        "page_snapshot_latest": (
            "WITH c AS (SELECT url, epoch_us(warc_ts)::BIGINT AS ts_us, "
            f"length(text)::BIGINT AS tc FROM read_parquet('{cap}')), "
            "m AS (SELECT url AS murl, count(*)::BIGINT AS n_captures, "
            "max(ts_us) AS mts FROM c GROUP BY url) "
            "SELECT c.url, c.ts_us, m.n_captures, c.tc AS text_chars "
            "FROM c JOIN m ON c.url = m.murl AND c.ts_us = m.mts"
        ),
        "page_host_freshness": (
            "WITH c AS (SELECT url, split_part(url, '/', 3) AS host, "
            f"epoch_us(warc_ts)::BIGINT AS ts FROM read_parquet('{cap}')), "
            "u AS (SELECT host, url, count(*)::BIGINT AS n_captures, "
            "min(ts) AS f, max(ts) AS l FROM c GROUP BY host, url) "
            "SELECT host, count(*)::BIGINT AS n_urls, "
            "sum(n_captures)::BIGINT AS n_captures, "
            "min(f)::BIGINT AS first_ts_us, max(l)::BIGINT AS last_ts_us "
            "FROM u GROUP BY host"
        ),
        # per-URL content drift: captures vs distinct md5 text versions
        "page_change_rate": (
            "SELECT url, count(*)::BIGINT AS n_captures, "
            "count(DISTINCT md5(text))::BIGINT AS n_versions, "
            "(count(DISTINCT md5(text)) > 1)::BIGINT AS changed "
            f"FROM read_parquet('{cap}') GROUP BY url"
        ),
        "page_host_stats": (
            "SELECT split_part(url, '/', 3) AS host, "
            "count(*)::BIGINT AS n_pages, "
            "sum(octet_length(html))::BIGINT AS total_html_bytes, "
            "sum(length(text))::BIGINT AS total_text_chars "
            f"FROM read_parquet('{pdir}/pages.parquet') GROUP BY host"
        ),
        "rel_lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "sum(CAST(l_quantity AS BIGINT))::BIGINT AS sum_qty, "
            "sum(CAST(floor(l_extendedprice*100+0.5) AS BIGINT))::BIGINT "
            "AS sum_base_cents, count(*)::BIGINT AS count_order "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "rel_segment_revenue": (
            "SELECT c_mktsegment, "
            "sum(CAST(floor(o_totalprice*100+0.5) AS BIGINT))::BIGINT "
            "AS revenue_cents, count(*)::BIGINT AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY c_mktsegment"
        ),
        "rel_top_parts": (
            "SELECT p_partkey, CAST(floor(p_retailprice*100+0.5) AS BIGINT) "
            "AS price_cents FROM part "
            "ORDER BY price_cents DESC, p_partkey LIMIT 10"
        ),
        "rel_events_by_type": (
            "SELECT event_type, "
            "sum(CAST(floor(value*100+0.5) AS BIGINT))::BIGINT AS value_cents, "
            "count(*)::BIGINT AS n FROM events GROUP BY event_type"
        ),
        "rel_events_window": (
            "SELECT event_type, "
            "(CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 "
            "AS window_start, "
            "sum(CAST(floor(value*100+0.5) AS BIGINT))::BIGINT "
            "AS value_cents, count(*)::BIGINT AS n "
            "FROM events GROUP BY event_type, window_start"
        ),
        # as-of join: running last view per user, equal-ts views sort
        # before clicks (allow-exact-match), ties by event_id — identical
        # ordered scan on both sides; -1 = no prior view
        "rel_events_asof": (
            "WITH ev AS (SELECT event_id, ts, user_id, event_type "
            "FROM events WHERE event_type IN ('click', 'view')), "
            "scan AS (SELECT *, last_value(CASE WHEN event_type = 'view' "
            "THEN event_id END IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, (event_type = 'click'), event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lv "
            "FROM ev) "
            "SELECT event_id, COALESCE(lv, -1)::BIGINT AS prev_view_id "
            "FROM scan WHERE event_type = 'click'"
        ),
        # keyed temporal range join: views strictly BEFORE the click,
        # within the 600 s lookback, same user
        "rel_events_range_join": (
            "WITH c AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type = 'click'), "
            "v AS (SELECT user_id, ts FROM events "
            "WHERE event_type = 'view') "
            "SELECT c.event_id, count(v.ts)::BIGINT AS n_prior_views "
            "FROM c LEFT JOIN v ON v.user_id = c.user_id "
            "AND v.ts >= c.ts - INTERVAL 600 SECOND AND v.ts < c.ts "
            "GROUP BY c.event_id"
        ),
        # broadcast interval-table join: same non-uniform [lo, hi) bands
        # as relops.PRICE_BANDS
        "rel_price_band_join": (
            "WITH bands(band_id, lo_cents, hi_cents) AS (VALUES "
            + ", ".join(f"({b}, {lo}, {hi})"
                        for b, lo, hi in relops.PRICE_BANDS) + "), "
            "p AS (SELECT CAST(floor(p_retailprice*100+0.5) AS BIGINT) "
            "AS cents FROM part) "
            "SELECT band_id, lo_cents, count(*)::BIGINT AS n_parts, "
            "sum(cents)::BIGINT AS sum_price_cents "
            "FROM p JOIN bands ON p.cents >= bands.lo_cents "
            "AND p.cents < bands.hi_cents "
            "GROUP BY band_id, lo_cents"
        ),
        # hopping window, size 3600 s / hop 900 s: every event lands in
        # exactly 4 hop-aligned windows (size % hop == 0)
        "rel_events_sliding": (
            "SELECT event_type, "
            "(CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900 - o.r * 900 "
            "AS window_start, "
            "sum(CAST(floor(value*100+0.5) AS BIGINT))::BIGINT "
            "AS value_cents, count(*)::BIGINT AS n "
            "FROM events CROSS JOIN "
            "(SELECT range AS r FROM range(4)) o "
            "GROUP BY event_type, window_start"
        ),
        "rel_events_sessionize": (
            "SELECT user_id, count(*)::BIGINT AS n_events, "
            "sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END)"
            "::BIGINT AS n_sessions FROM (SELECT user_id, "
            "epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) "
            "AS gap FROM events) GROUP BY user_id"
        ),
        # ftp listings vs the generator's by-construction entries
        "ftp_entries": (
            f"SELECT listing_id, seq, name, is_dir, size FROM "
            f"read_parquet('{_ftp_dir}/golden_entries.parquet')"
        ),
        # media decode vs the generator's by-construction metadata
        "media_decode": (
            f"SELECT media_id, kind, dim_a, dim_b, body_len FROM "
            f"read_parquet('{media_dir}/golden_decode.parquet')"
        ),
        # feature-extract vs the generator's formula-derived histogram
        "media_features": (
            f"SELECT media_id, bucket, cnt FROM "
            f"read_parquet('{media_dir}/golden_features.parquet')"
        ),
        # REAL stdlib decode (BMP/PPM/WAV/concatenated-PPM video) vs the
        # generator's construction-derived metadata
        "media_stdlib_decode": (
            f"SELECT media_id, kind, dim_a, dim_b, body_len FROM "
            f"read_parquet('{smedia_dir}/golden_decode.parquet')"
        ),
        # frame-sample vs the generator's frame grid
        "media_frames": (
            f"SELECT media_id, frame_idx FROM "
            f"read_parquet('{media_dir}/golden_frames.parquet')"
        ),
        # non-overlapping SPAN_W-token window keeper dedup (Lee et al.
        # 2022 proxy): first occurrence = min(doc_id*2^32 + idx), the
        # line_dedup encoding; tail < w tokens dropped (len//w windows)
        "doc_span_dedup": (
            "WITH t AS (SELECT doc_id, "
            "regexp_extract_all(lower(text), '\\S+') AS toks "
            "FROM documents), "
            "w AS (SELECT doc_id, CAST(i AS BIGINT) AS idx, "
            "md5(array_to_string(toks["
            f"CAST((i-1)*{textops.SPAN_W}+1 AS INT):"
            f"CAST(i*{textops.SPAN_W} AS INT)], ' ')) AS k "
            f"FROM t, UNNEST(range(1, len(toks)//{textops.SPAN_W} + 1)) "
            "AS u(i)), "
            "keeper AS (SELECT k, min(doc_id * 4294967296 + idx) AS mo "
            "FROM w GROUP BY k), "
            "kept AS (SELECT (mo // 4294967296)::BIGINT AS doc_id, "
            "count(*)::BIGINT AS n_kept FROM keeper GROUP BY 1), "
            "tot AS (SELECT doc_id, count(*)::BIGINT AS n_windows "
            "FROM w GROUP BY doc_id) "
            "SELECT tot.doc_id, tot.n_windows, "
            "(tot.n_windows - coalesce(kp.n_kept, 0))::BIGINT AS n_dup "
            "FROM tot LEFT JOIN kept kp USING (doc_id) ORDER BY tot.doc_id"
        ),
        # DSIR hashed-bigram importance: md5-31-bit positional bigram
        # keys (the lm_coverage family) folded into DSIR_BUCKETS;
        # target = lang DSIR_TARGET_LANG, source = the rest,
        # self-inclusive; weight = 1000*sum_t // (sum_t+sum_s)
        "doc_dsir_weights": (
            "WITH t AS (SELECT doc_id, lang, "
            "regexp_extract_all(lower(text), '\\S+') AS toks "
            "FROM documents), "
            "g0 AS (SELECT doc_id, lang, CASE WHEN len(toks) >= 2 THEN "
            "list_transform(range(1, len(toks)), i -> "
            "toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1]) "
            "WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] "
            "ELSE [] END AS grams FROM t), "
            "gx AS (SELECT doc_id, lang, "
            "CAST((md5_number_lower(g) & 2147483647::UBIGINT) "
            f"% {textops.DSIR_BUCKETS} AS BIGINT) AS b "
            "FROM g0, UNNEST(grams) AS u(g)), "
            "model AS (SELECT b, "
            "(count(*) FILTER (WHERE lang = "
            f"'{textops.DSIR_TARGET_LANG}'))::BIGINT AS tc, "
            "(count(*) FILTER (WHERE lang <> "
            f"'{textops.DSIR_TARGET_LANG}'))::BIGINT AS sc "
            "FROM gx GROUP BY b), "
            "per AS (SELECT gx.doc_id, count(*)::BIGINT AS n_grams, "
            "sum(m.tc)::BIGINT AS sum_t, sum(m.sc)::BIGINT AS sum_s "
            "FROM gx JOIN model m USING (b) GROUP BY gx.doc_id) "
            "SELECT d.doc_id, coalesce(per.n_grams, 0)::BIGINT "
            "AS n_grams, coalesce(per.sum_t, 0)::BIGINT AS sum_t, "
            "coalesce(per.sum_s, 0)::BIGINT AS sum_s, "
            "(CASE WHEN coalesce(per.sum_t, 0) + coalesce(per.sum_s, 0) "
            "> 0 THEN (per.sum_t * 1000) // (per.sum_t + per.sum_s) "
            "ELSE 0 END)::BIGINT AS w_permille "
            "FROM documents d LEFT JOIN per USING (doc_id)"
        ),
        # integer BM25 top-k: idf = (1000*N)//df, permille length norm
        # and tf saturation, // chains written exactly as the Ray side
        "doc_bm25_topk": _bm25_sql(),
        # URL filter: farm blocklist (host page-count >= bar) + literal
        # penalty substrings; split_part host parity with host_stats
        "page_url_filter": (
            "WITH p AS (SELECT url, split_part(url, '/', 3) AS host "
            f"FROM read_parquet('{pdir}/pages.parquet')), "
            "farm AS (SELECT host FROM p GROUP BY host "
            f"HAVING count(*) >= {extract.FARM_MIN_PAGES}) "
            "SELECT p.url, p.host, "
            "(p.host IN (SELECT host FROM farm))::BIGINT AS is_farm, "
            + " + ".join(
                "(lower(p.url) LIKE '%"
                + w.replace("'", "''") + "%')::BIGINT"
                for w in extract.URL_PENALTIES)
            + " AS n_penalties, "
            "((p.host IN (SELECT host FROM farm)) OR ("
            + " OR ".join(
                "lower(p.url) LIKE '%" + w.replace("'", "''") + "%'"
                for w in extract.URL_PENALTIES)
            + "))::BIGINT AS blocked FROM p"
        ),
        # host-level link graph: same closed edge set, split_part hosts
        "graph_host_graph": graph.host_graph_oracle_sql(pdir),
        # mutual links: closed-edge self-join, a<b
        "graph_reciprocal": graph.reciprocal_oracle_sql(pdir),
        # triangle count: undirected distinct edges, ordered 3-way join
        "graph_triangles": graph.triangles_oracle_sql(pdir),
        "graph_neighbor_jaccard": graph.neighbor_jaccard_oracle_sql(pdir),
        # boolean AND search: list_filter token tf, same ranking
        "doc_search": textops.search_oracle_sql(),
        # Heaps growth: min(doc_id) per token, integer-division buckets
        "doc_vocab_growth": textops.vocab_growth_oracle_sql(),
        # OOV: top-k vocab CTE + per-doc LEFT JOIN membership counts
        "doc_oov_rate": textops.oov_rate_oracle_sql(),
        # chunking: UNNEST(range) starts, char substr, md5 digests
        "doc_chunks": textops.doc_chunks_oracle_sql(),
        # chunk-dup profile: digest-count CTE over the chunking oracle
        "doc_chunk_dedup": textops.chunk_dedup_oracle_sql(),
        # novelty: min(doc_id) per shingle key, per-doc novel counts
        "doc_novelty": textops.doc_novelty_oracle_sql(),
        # funnel: chained min-ts stage CTEs, >= semantics
        "rel_events_funnel": relops.funnel_oracle_sql(),
        # anomaly: grouped daily counts + per-type integer permille
        "rel_events_anomaly": relops.events_anomaly_oracle_sql(),
        # PQ assignment: quantized unnest ⋈ codebook, integer argmin
        "emb_pq_codes": ann.pq_oracle_sql(pqc),
        # dup n-grams: shared bigram-key CTE, df over distinct docs
        "doc_dup_ngrams": textops.dup_ngrams_oracle_sql(),
        # retention: first day per user, distinct offsets, epoch days
        "rel_events_retention": relops.retention_oracle_sql(),
        # ADC: code assignment CTEs + query-row distance-table join
        "ann_topk_adc": ann.adc_oracle_sql(pqc),
        # HITS: two unrolled mutual-reinforcement half-round CTE stages
        "graph_hits": graph.hits_oracle_sql(pdir),
        # temperature language mix: grouped count + corrected isqrt
        "doc_lang_weights": textops.lang_weights_oracle_sql(),
        # BPE merges: per-round best-pair LIMIT 1 + bracketed replace
        "doc_bpe_merges": textops.bpe_merges_oracle_sql(),
        # BPE apply: merge cascade to final seqs + docs⟕wtok unnest join
        "doc_bpe_tokenize": textops.bpe_tokenize_oracle_sql(),
        # degree histogram: degrees CTE re-grouped by value
        "graph_degree_dist": graph.degree_dist_oracle_sql(pdir),
        # Q3: same cents expression, date slice, join + ORDER BY LIMIT
        "rel_order_revenue": relops.order_revenue_oracle_sql(),
        # k-means: unrolled assign/update CTE rounds, trunc-div means
        "emb_kmeans": ann.emb_kmeans_oracle_sql(),
        # co-occurrence: distinct (user,type) self-join, a<b
        "rel_events_cooccur": relops.events_cooccur_oracle_sql(),
        # 2-hop: wedge join ∪ edges, distinct, self-free count
        "graph_2hop": graph.twohop_oracle_sql(pdir),
        # co-occurrence: position-shift unnest join, least/greatest key
        "doc_word_cooccur": textops.word_cooccur_oracle_sql(),
        # source overlap: distinct (key,source) self-join, b ≥ a
        "doc_source_overlap": textops.source_overlap_oracle_sql(),
        # top-N per key: row_number() window replay
        "rel_top_events": relops.top_events_oracle_sql(),
        # depth histogram: split length clamp replay
        "page_url_depth": (
            "SELECT greatest(len(string_split(url, '/')) - 3, 0)"
            "::BIGINT AS depth, count(*)::BIGINT AS n_pages "
            f"FROM read_parquet('{pdir}/pages.parquet') GROUP BY depth"),
        # assortativity: degrees CTE joined onto edges twice, six sums
        "graph_assortativity": graph.assortativity_oracle_sql(pdir),
        # grouped quantiles: window-cumsum percentile_disc replay
        "rel_value_quantiles": relops.value_quantiles_oracle_sql(),
        # redirect resolution: bounded recursive-CTE chase, 20-cap
        "page_redirects": (
            "WITH RECURSIVE r AS ("
            "SELECT url, location FROM "
            f"read_parquet('{pdir}/page_meta.parquet') "
            "WHERE status BETWEEN 300 AND 399 "
            "AND location IS NOT NULL), "
            "chase(u, cur, h) AS ("
            "SELECT url, location, 1 FROM r UNION ALL "
            "SELECT c.u, r.location, c.h + 1 FROM chase c "
            "JOIN r ON c.cur = r.url WHERE c.h <= 21), "
            "term AS (SELECT c.u, c.cur, c.h FROM chase c "
            "LEFT JOIN r ON c.cur = r.url WHERE r.url IS NULL) "
            "SELECT r0.url, "
            "coalesce(CASE WHEN t.h < 20 THEN t.cur END, '') "
            "AS final_url, "
            "coalesce(CASE WHEN t.h < 20 THEN t.h END, -1)::BIGINT "
            "AS hops FROM r r0 LEFT JOIN term t ON t.u = r0.url"),
        # TrustRank: unrolled fixed point, CASE-gated teleport
        "graph_trustrank": graph.trustrank_oracle_sql(pdir),
        # k-core: unrolled peel rounds over the shared edge CTE
        "graph_kcore": graph.kcore_oracle_sql(pdir),
        # boilerplate: distinct (host,url,line-md5) unnest, per-line
        # page counts vs host totals, 50% threshold
        "page_boilerplate": (
            "WITH p AS (SELECT split_part(url, '/', 3) AS host, url, "
            f"text FROM read_parquet('{pdir}/pages.parquet') "
            "WHERE text <> ''), "
            "hp AS (SELECT host, count(*)::BIGINT AS n_pages FROM p "
            "GROUP BY host), "
            "l AS (SELECT DISTINCT host, url, md5(u.line) AS k FROM p, "
            "UNNEST(string_split(text, chr(10))) AS u(line)), "
            "lc AS (SELECT host, k, count(*)::BIGINT AS c FROM l "
            "GROUP BY host, k) "
            "SELECT lc.host, max(hp.n_pages)::BIGINT AS n_pages, "
            "count(*)::BIGINT AS n_lines, "
            "sum(CASE WHEN 2 * lc.c >= hp.n_pages THEN 1 ELSE 0 END)"
            "::BIGINT AS n_boilerplate "
            "FROM lc JOIN hp ON hp.host = lc.host GROUP BY lc.host"),
        # canonicalizer-rule audit: same string predicates as the Ray
        # classifier, one FILTER arm per rule over links ⋈ canon
        "page_canon_rules": (
            "WITH c AS (SELECT gl.ref_raw, gc.canon FROM "
            f"read_parquet('{pdir}/golden_links.parquet') gl JOIN "
            f"read_parquet('{pdir}/golden_canon.parquet') gc "
            "USING (url, link_seq)) "
            "SELECT 'absolute_url' AS rule, count(*) FILTER ("
            "regexp_matches(ref_raw, '^[a-zA-Z][a-zA-Z0-9+.-]*://'))"
            "::BIGINT AS n_refs FROM c "
            "UNION ALL SELECT 'absolute_path', count(*) FILTER ("
            "NOT regexp_matches(ref_raw, '^[a-zA-Z][a-zA-Z0-9+.-]*://') "
            "AND ref_raw LIKE '/%')::BIGINT FROM c "
            "UNION ALL SELECT 'relative', count(*) FILTER ("
            "NOT regexp_matches(ref_raw, '^[a-zA-Z][a-zA-Z0-9+.-]*://') "
            "AND ref_raw NOT LIKE '/%')::BIGINT FROM c "
            "UNION ALL SELECT 'fragment', count(*) FILTER ("
            "contains(ref_raw, '#'))::BIGINT FROM c "
            "UNION ALL SELECT 'entity_amp', count(*) FILTER ("
            "contains(ref_raw, '&amp;'))::BIGINT FROM c "
            "UNION ALL SELECT 'dynamic', count(*) FILTER ("
            "contains(ref_raw, '?'))::BIGINT FROM c "
            "UNION ALL SELECT 'dropped', count(*) FILTER ("
            "canon IS NULL)::BIGINT FROM c"),
        # robots coverage audit: line-state machine replayed in SQL —
        # UA enable via last_value IGNORE NULLS window, allow-first
        # verdict = any-allow-prefix OR no-deny-prefix (the add_rule
        # hoist makes all allows precede all denys, filter.c:60-97)
        "page_robots_audit": (
            "WITH p AS (SELECT split_part(url, '/', 3) AS host, url, "
            "regexp_replace(url, '^[a-z]+://[^/]*', '') AS path, text "
            f"FROM read_parquet('{pdir}/pages.parquet')), "
            "r AS (SELECT host, text FROM p "
            "WHERE url LIKE '%/robots.txt'), "
            "ln AS (SELECT host, generate_subscripts(ls, 1) AS i, "
            "unnest(ls) AS line FROM (SELECT host, "
            "string_split(text, chr(10)) AS ls FROM r)), "
            "kv AS (SELECT host, i, split_part(line, ':', 1) AS opt, "
            "ltrim(substr(line, strpos(line, ':') + 1)) AS val "
            "FROM ln WHERE contains(line, ':') "
            "AND NOT starts_with(ltrim(line), '#')), "
            "st AS (SELECT host, opt, val, coalesce(last_value("
            "CASE WHEN opt = 'User-agent' THEN (val = '*' OR "
            "contains('Methabot', val)) END IGNORE NULLS) "
            "OVER (PARTITION BY host ORDER BY i "
            "ROWS UNBOUNDED PRECEDING), true) AS en FROM kv), "
            "al AS (SELECT host, list(val) AS lv FROM st "
            "WHERE en AND opt = 'Allow' GROUP BY host), "
            "di AS (SELECT host, list(val) AS lv FROM st "
            "WHERE en AND opt = 'Disallow' GROUP BY host), "
            "pg AS (SELECT p.host, (coalesce(len(list_filter(al.lv, "
            "x -> starts_with(p.path, x))), 0) > 0 OR "
            "coalesce(len(list_filter(di.lv, "
            "x -> starts_with(p.path, x))), 0) = 0) AS ok "
            "FROM p LEFT JOIN al ON al.host = p.host "
            "LEFT JOIN di ON di.host = p.host "
            "WHERE p.url NOT LIKE '%/robots.txt') "
            "SELECT host, count(*)::BIGINT AS n_pages, "
            "sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_allowed, "
            "sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_denied "
            "FROM pg GROUP BY host"),
        # outlink stats: links ⋈ canon rollup; external via the M4
        # www-equivalence (lower + optional 'www.' strip on either side)
        "page_outlink_stats": (
            "WITH l AS (SELECT gl.url, gc.canon, "
            "lower(split_part(gl.url, '/', 3)) AS h1, "
            "lower(split_part(coalesce(gc.canon, ''), '/', 3)) AS h2 "
            f"FROM read_parquet('{pdir}/golden_links.parquet') gl JOIN "
            f"read_parquet('{pdir}/golden_canon.parquet') gc "
            "USING (url, link_seq)) "
            "SELECT url, count(*)::BIGINT AS n_refs, "
            "sum(CASE WHEN canon IS NOT NULL THEN 1 ELSE 0 END)"
            "::BIGINT AS n_resolved, "
            "sum(CASE WHEN canon IS NOT NULL AND NOT (h1 = h2 OR "
            "h1 = 'www.' || h2 OR 'www.' || h1 = h2) THEN 1 ELSE 0 END)"
            "::BIGINT AS n_external, "
            "sum(CASE WHEN canon IS NOT NULL AND contains(canon, '?') "
            "THEN 1 ELSE 0 END)::BIGINT AS n_dynamic "
            "FROM l GROUP BY url"),
        # host budget: robots delay extract + host rollup join
        "page_host_budget": (
            "WITH p AS (SELECT split_part(url, '/', 3) AS host, url, "
            f"text FROM read_parquet('{pdir}/pages.parquet')), "
            "c AS (SELECT host, count(*)::BIGINT AS n_pages FROM p "
            "GROUP BY host), "
            "d AS (SELECT host, coalesce(max(CASE WHEN url LIKE "
            "'%/robots.txt' THEN try_cast(regexp_extract(text, "
            "'Crawl-delay: ([0-9]+)', 1) AS BIGINT) END), 0) AS delay "
            "FROM p GROUP BY host) "
            "SELECT c.host, c.n_pages, d.delay::BIGINT AS crawl_delay_s, "
            "(c.n_pages * greatest(d.delay, 10))::BIGINT AS budget_s "
            "FROM c JOIN d ON c.host = d.host"),
        # CDX records: list_reverse SURT + path regex + md5
        "page_cdx": (
            "SELECT array_to_string(list_reverse(string_split("
            "split_part(url, '/', 3), '.')), ',') || ')' || "
            "(CASE WHEN regexp_replace(url, '^[a-z]+://[^/]*', '') "
            "= '' THEN '/' ELSE "
            "regexp_replace(url, '^[a-z]+://[^/]*', '') END) AS surt, "
            "epoch_us(warc_ts)::BIGINT AS ts_us, url, md5(text) "
            f"AS digest FROM read_parquet('{cap}')"),
        # frontier candidates: anti-join vs pages, per-dst rollup
        "graph_frontier_candidates": (
            "WITH pl AS (SELECT url AS src, canon AS dst FROM "
            f"read_parquet('{pdir}/golden_canon.parquet') "
            "WHERE canon IS NOT NULL), "
            "pu AS (SELECT DISTINCT url FROM "
            f"read_parquet('{pdir}/pages.parquet')), "
            "e AS (SELECT DISTINCT src, dst FROM pl "
            "LEFT JOIN pu ON pu.url = pl.dst WHERE pu.url IS NULL) "
            "SELECT dst AS url, count(*)::BIGINT AS n_inlinks, "
            "count(DISTINCT split_part(src, '/', 3))::BIGINT "
            "AS n_src_hosts, min(src) AS first_src FROM e GROUP BY dst"),
        # snapshot diff: lag() window over per-capture line-hash
        # lists, list_filter set differences
        "page_snapshot_diff": (
            "WITH c AS (SELECT url, epoch_us(warc_ts)::BIGINT AS ts, "
            "list_distinct(list_transform(string_split(text, chr(10)), "
            "x -> md5(x))) AS ls FROM "
            f"read_parquet('{cap}')), "
            "w AS (SELECT url, ts, ls, lag(ls) OVER "
            "(PARTITION BY url ORDER BY ts) AS pls FROM c) "
            "SELECT url, ts AS ts_us, "
            "len(list_filter(ls, x -> NOT list_contains(pls, x)))"
            "::BIGINT AS n_added, "
            "len(list_filter(pls, x -> NOT list_contains(ls, x)))"
            "::BIGINT AS n_removed FROM w WHERE pls IS NOT NULL"),
        # revisit schedule: distinct-version CTE, integer gap CASE
        "page_revisit_schedule": (
            "WITH c AS (SELECT url, md5(text) AS k, "
            "epoch_us(warc_ts)::BIGINT AS ts FROM "
            f"read_parquet('{cap}')), "
            "u AS (SELECT url, count(*)::BIGINT AS nc, "
            "count(DISTINCT k)::BIGINT AS nv, min(ts) AS lo, "
            "max(ts) AS hi FROM c GROUP BY url) "
            "SELECT url, nc AS n_captures, nv AS n_versions, "
            "hi AS last_ts_us, (hi + CASE "
            "WHEN nv > 1 THEN (hi - lo) // (nv - 1) "
            "WHEN nc > 1 THEN 2 * (hi - lo) "
            "ELSE 2592000000000 END)::BIGINT AS next_fetch_us FROM u"),
        # mirrors: md5 over the GOLDEN text column (page_text is
        # gate-proven byte-identical to it), >=2-host groups
        "page_mirrors": (
            "WITH p AS (SELECT url, split_part(url, '/', 3) AS host, "
            "md5(text) AS dg FROM "
            f"read_parquet('{pdir}/pages.parquet') WHERE text <> '') "
            "SELECT dg AS text_md5, count(*)::BIGINT AS n_urls, "
            "count(DISTINCT host)::BIGINT AS n_hosts, "
            "min(url) AS canonical_url FROM p GROUP BY dg "
            "HAVING count(DISTINCT host) >= 2"),
        # URL templates: same two regex rewrites, two-key count
        "page_url_templates": (
            "WITH p AS (SELECT split_part(url, '/', 3) AS host, "
            "regexp_replace(regexp_replace(url, '^[a-z]+://[^/]*', "
            "''), '[0-9]+', 'N', 'g') AS raw FROM "
            f"read_parquet('{pdir}/pages.parquet')) "
            "SELECT host, CASE WHEN raw = '' THEN '/' ELSE raw END "
            "AS template, count(*)::BIGINT AS n_urls FROM p "
            "GROUP BY host, template"),
    }
    # confusion matrix replays the full doc_langid decision SQL as a CTE
    d["doc_lang_confusion"] = textops.lang_confusion_oracle_sql(
        d["doc_langid"])
    # per-source purity composes the same langid decision SQL
    d["doc_source_lang_purity"] = textops.source_lang_purity_oracle_sql(
        d["doc_langid"])
    # recall@k composes the exact and LSH oracles as subqueries
    d["ann_recall"] = (
        f"SELECT e.query_id, count(*)::BIGINT AS n_exact, "
        f"(SELECT count(*) FROM ({d['ann_topk_lsh']}) x "
        f"WHERE x.query_id = e.query_id)::BIGINT AS n_approx, "
        f"(1000 * sum(CASE WHEN a.neighbor_id IS NOT NULL "
        f"THEN 1 ELSE 0 END) // greatest(count(*), 1))::BIGINT "
        f"AS recall_permille "
        f"FROM ({d['ann_topk']}) e LEFT JOIN ({d['ann_topk_lsh']}) a "
        f"ON a.query_id = e.query_id "
        f"AND a.neighbor_id = e.neighbor_id GROUP BY e.query_id")
    # ADC recall: same composition against the PQ-ADC oracle
    d["ann_recall_adc"] = (
        f"SELECT e.query_id, count(*)::BIGINT AS n_exact, "
        f"(SELECT count(*) FROM ({d['ann_topk_adc']}) x "
        f"WHERE x.query_id = e.query_id)::BIGINT AS n_approx, "
        f"(1000 * sum(CASE WHEN a.neighbor_id IS NOT NULL "
        f"THEN 1 ELSE 0 END) // greatest(count(*), 1))::BIGINT "
        f"AS recall_permille "
        f"FROM ({d['ann_topk']}) e LEFT JOIN ({d['ann_topk_adc']}) a "
        f"ON a.query_id = e.query_id "
        f"AND a.neighbor_id = e.neighbor_id GROUP BY e.query_id")
    # IVFPQ recall: same composition against the IVFPQ oracle
    d["ann_recall_ivfpq"] = (
        f"SELECT e.query_id, count(*)::BIGINT AS n_exact, "
        f"(SELECT count(*) FROM ({d['ann_topk_ivfpq']}) x "
        f"WHERE x.query_id = e.query_id)::BIGINT AS n_approx, "
        f"(1000 * sum(CASE WHEN a.neighbor_id IS NOT NULL "
        f"THEN 1 ELSE 0 END) // greatest(count(*), 1))::BIGINT "
        f"AS recall_permille "
        f"FROM ({d['ann_topk']}) e LEFT JOIN ({d['ann_topk_ivfpq']}) a "
        f"ON a.query_id = e.query_id "
        f"AND a.neighbor_id = e.neighbor_id GROUP BY e.query_id")
    # dedup banding-recall composes the exact-pairs and minhash oracles
    d["doc_dedup_recall"] = (
        f"WITH tt AS (SELECT DISTINCT id_b AS doc FROM "
        f"({d['doc_ngram_jaccard']})), "
        f"ff AS (SELECT DISTINCT doc_id AS doc FROM "
        f"({d['doc_minhash_dedup']})), "
        "s AS (SELECT (SELECT count(*) FROM tt)::BIGINT AS n_true, "
        "(SELECT count(*) FROM ff)::BIGINT AS n_flagged, "
        "(SELECT count(*) FROM tt JOIN ff USING (doc))::BIGINT "
        "AS n_hit) "
        "SELECT n_true, n_flagged, n_hit, "
        "CASE WHEN n_true > 0 THEN n_hit * 1000 // n_true "
        "ELSE 0 END::BIGINT AS recall_permille, "
        "CASE WHEN n_flagged > 0 THEN n_hit * 1000 // n_flagged "
        "ELSE 0 END::BIGINT AS precision_permille FROM s")
    # recrawl plan composes the revisit oracle: per-host row_number
    # over due-times, schedule via the closed-form running max
    # sched = delay*rn + max(due - delay*rn) over the ordered prefix
    d["page_recrawl_plan"] = (
        f"WITH rs AS ({d['page_revisit_schedule']}), "
        "p AS (SELECT url, split_part(url, '/', 3) AS host, "
        "next_fetch_us FROM rs), "
        "dl AS (SELECT split_part(url, '/', 3) AS host, "
        "greatest(coalesce(max(try_cast(regexp_extract(text, "
        "'Crawl-delay: ([0-9]+)', 1) AS BIGINT)), 0), 10) * 1000000 "
        f"AS delay_us FROM read_parquet('{pdir}/pages.parquet') "
        "WHERE url LIKE '%/robots.txt' GROUP BY 1), "
        "r AS (SELECT p.url, p.host, p.next_fetch_us, "
        "coalesce(dl.delay_us, 10000000)::BIGINT AS delay_us, "
        "row_number() OVER (PARTITION BY p.host "
        "ORDER BY p.next_fetch_us, p.url) AS rn "
        "FROM p LEFT JOIN dl ON dl.host = p.host) "
        "SELECT url, host, rn::BIGINT AS fetch_seq, next_fetch_us, "
        "(delay_us * rn + max(next_fetch_us - delay_us * rn) "
        "OVER (PARTITION BY host ORDER BY rn "
        "ROWS UNBOUNDED PRECEDING))::BIGINT AS scheduled_us FROM r")
    return d
