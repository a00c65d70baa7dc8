"""Certification-schedule manifest (VERDICT r04 item 4 / ADVICE r04).

The external driver hash-certifies only the FIRST 50 entries of
``__spark_entry__.queries()``; queries rotated into the tail are trusted on
the premise that their implementing code is UNCHANGED since the round that
certified them. This module makes that premise checkable in CI instead of
prose:

- ``build_manifest()`` records, per gate query: a sha256 of the gate
  callable's source, of its oracle SQL, of its harness module's shared
  UPPERCASE constants, and of every ENGINE module it executes through
  (module granularity for engine code; function granularity only for the
  two declarative query-pack files, whose entries are self-contained
  Spark/SQL pairs).
- ``python scripts/cert_manifest.py`` rewrites ``tests/cert_manifest.json``
  — run it ONLY when the _CERT_TAIL set has just been (re)verified, i.e.
  after rotating every touched query into _CERT_FIRST. Since r12 the
  rule is mechanical, not prose: regeneration REFUSES (SystemExit) when
  any still-guarded gate's hashes drifted from the committed manifest
  (rotation_violations), closing the r11 additive-change loophole.
- ``tests/test_entry_contract.py`` fails if any _CERT_TAIL query's hashes
  differ from the committed manifest, forcing the rotation.

Known granularity limits (documented, accepted): module-level *private*
helpers inside the query packs (e.g. _docs_split) are not hashed per-query;
they are covered by the UPPERCASE-constant hash only when they read shared
constants. Engine code — where regressions actually live — is hashed
wholesale.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MANIFEST_PATH = os.path.join(REPO, "tests", "cert_manifest.json")

_P = "openapc_olap_spark"

# Engine modules every gate executes through (session bootstrap + loaders).
_COMMON = [f"{_P}/session.py"]
_QUERY_STACK = [f"{_P}/query.py", f"{_P}/cuts.py", f"{_P}/model.py",
                f"{_P}/tpch.py"]
# e-gate closure, verified against the gate callables' actual imports
# (etl_queries.py imports etl/openapc + session at module level and
# etl/coverage + model inside gate bodies; etl/openapc.py imports only
# etl/schemas; etl/coverage.py imports nothing package-local). yamls.py /
# server.py / query.py are NOT in any e-gate's execution path — the two
# exceptions carry explicit DEPS entries below: e18 drives QueryEngine
# (query stack) and e19 drives catalog.load_manifest (catalog.py, which
# imports model.py).
_ETL_STACK = [f"{_P}/etl/openapc.py", f"{_P}/etl/coverage.py",
              f"{_P}/etl/schemas.py", f"{_P}/model.py"]
_OPS = f"{_P}/operators"
_MEMO = [f"{_OPS}/_memo.py"]

# Per-query ENGINE-module dependencies (repo-relative). Over-inclusion is
# safe (it only forces extra rotation); omission is the failure mode, so
# lists err broad.
DEPS: dict[str, list[str]] = {}
for _q in ["q01_facts_page", "q02_cut_point", "q03_cut_range", "q04_cut_set",
           "q05_cut_negate", "q06_aggregate_summary", "q07_drilldown",
           "q08_multi_drilldown", "q09_order_topk", "q10_pagination_cells",
           "q11_envelope_rollup", "q12_point_lookup", "q13_fact_by_id",
           "q14_members", "q15_total_percentage"]:
    DEPS[_q] = _QUERY_STACK[:]
DEPS["q16_cell_http"] = _QUERY_STACK + [f"{_P}/server.py"]
DEPS["q17_model_http"] = _QUERY_STACK + [f"{_P}/server.py",
                                         f"{_P}/catalog.py"]
# e-gates resolve by prefix in deps_for() -> _ETL_STACK, except gates whose
# gate callable provably executes through a narrower closure (verified
# against the callable's imports; coverage.py imports no other etl module):
DEPS["e18_partition_prune"] = _ETL_STACK + _QUERY_STACK
DEPS["e19_manifest_roundtrip"] = _ETL_STACK + [f"{_P}/catalog.py"]
DEPS["e20_json_cache"] = [f"{_P}/etl/coverage.py"]
DEPS["e17_cache_upsert"] = [f"{_P}/etl/coverage.py",
                            f"{_P}/sources/txn.py"]
DEPS["e14_annual_pubdates"] = [f"{_P}/etl/coverage.py"]
DEPS["e15_hybrid_catalog"] = [f"{_P}/etl/coverage.py"]
DEPS["e09_journal_id"] = [f"{_P}/etl/coverage.py"]
DEPS["e05_coverage_zerofill"] = []   # load_tables + inline ops only

_X_DEPS = {
    "x01_dedup_summary": [f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x02_ngram_jaccard": [f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x03_minhash_neardup": [f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x04_simhash_neardup": [f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x05_ann_topk": [f"{_OPS}/similarity.py"] + _MEMO,
    "x06_lsh_neardup_embeddings": [f"{_OPS}/similarity.py",
                                   f"{_OPS}/dedup.py"] + _MEMO,
    "x07_text_metrics": [f"{_OPS}/text.py"],
    "x08_langid_distribution": [f"{_OPS}/text.py"],
    "x09_tumbling_daily": [f"{_OPS}/windows.py"],
    "x10_sliding_windows": [f"{_OPS}/windows.py"],
    "x11_session_stats": [f"{_OPS}/windows.py"],
    "x12_props_json": [],
    "x13_salted_drilldown": [f"{_OPS}/skew.py"],
    "x14_ngram_jaccard_capped": [f"{_OPS}/text.py",
                                 f"{_OPS}/dedup.py"] + _MEMO,
    "x15_media_metadata": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x16_quality_deciles": [f"{_OPS}/text.py"],
    "x17_ivf_ann": [f"{_OPS}/similarity.py"] + _MEMO,
    "x18_lsh_neardup_capped": [f"{_OPS}/similarity.py",
                               f"{_OPS}/dedup.py"] + _MEMO,
    "x19_image_dims": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x20_pii_redaction": [f"{_OPS}/text.py"],
    "x21_repetition_deciles": [f"{_OPS}/text.py"],
    "x22_vocab_top": [f"{_OPS}/text.py"],
    "x23_wav_metadata": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x24_audio_headers": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x25_streaming_tumbling": [f"{_P}/streaming/__init__.py",
                               f"{_OPS}/windows.py"],
    "x26_streaming_dedup": [f"{_P}/streaming/__init__.py"],
    "x27_winnow_fingerprints": [f"{_OPS}/text.py"],
    "x28_curation_funnel": [f"{_OPS}/curation.py", f"{_OPS}/text.py"],
    "x29_sequence_packing": [f"{_OPS}/packing.py", f"{_OPS}/text.py"],
    # r15 narrowing (window arithmetic for the text.py rotation, VERDICT
    # r14 #1): x30/x39/x43/x48/x57 execute ONLY packing.hash_split /
    # stratified_sample / deterministic_shuffle / rebalance_mixture /
    # mixture.temperature_resample — none of which reference the text
    # module (text.py enters packing.py solely through pack_sequences/
    # pack_summary's text.token_count default, the x29 path). The gates'
    # callables call no text function either, and _docs_split is a plain
    # repartition. tests/test_entry_contract.py pins this closure at
    # source level (test_narrowed_deps_gates_stay_text_free), so a later
    # edit that adds a text reference to those functions fails CI until
    # the DEPS entries are re-broadened and the gates rotated.
    "x30_hash_split": [f"{_OPS}/packing.py"],
    "x31_profile": [f"{_OPS}/profile.py"],
    "x32_image_decode": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x33_stateful_sessions": [f"{_P}/streaming/__init__.py",
                              f"{_P}/streaming/stateful.py"],
    "x34_wav_decode": [f"{_OPS}/multimodal.py"] + _MEMO,
    "x35_duplicate_groups": [f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x36_ivf_index": [f"{_OPS}/similarity.py"] + _MEMO,
    "x37_asof_join": [f"{_OPS}/temporal.py"],
    "x38_interval_join": [f"{_OPS}/temporal.py"],
    "x39_stratified_sample": [f"{_OPS}/packing.py"],
    "x40_decontaminate": [f"{_OPS}/decontam.py", f"{_OPS}/text.py"],
    "x41_bloom_semi_join": [f"{_OPS}/bloom.py"],
    "x42_topk_per_group": [f"{_OPS}/ranking.py"],
    "x43_deterministic_shuffle": [f"{_OPS}/packing.py"],
    "x44_cms_estimates": [f"{_OPS}/sketches.py", f"{_OPS}/packing.py",
                          f"{_OPS}/text.py"],
    "x45_tfidf_top_terms": [f"{_OPS}/tfidf.py", f"{_OPS}/ranking.py",
                            f"{_OPS}/text.py"],
    "x46_quantize_embeddings": [f"{_OPS}/quantize.py"],
    "x47_chunk_documents": [f"{_OPS}/chunking.py", f"{_OPS}/text.py"],
    "x48_rebalance_mixture": [f"{_OPS}/packing.py"],
    "x49_incremental_dedup": [f"{_OPS}/dedup.py", f"{_OPS}/bloom.py",
                              f"{_OPS}/text.py",
                              f"{_P}/sources/txn.py"] + _MEMO,
    "x50_streaming_cms": [f"{_P}/streaming/__init__.py",
                          f"{_P}/streaming/sketches.py",
                          f"{_OPS}/sketches.py", f"{_OPS}/packing.py",
                          f"{_OPS}/text.py"],
    "x51_orc_roundtrip": [f"{_P}/sources/io.py"],
    "x52_pretraining_pipeline": [f"{_OPS}/pipeline.py", f"{_OPS}/chunking.py",
                                 f"{_OPS}/decontam.py", f"{_OPS}/packing.py",
                                 f"{_OPS}/text.py"],
    "x53_semantic_dedup": [f"{_OPS}/semdedup.py", f"{_OPS}/similarity.py",
                           f"{_OPS}/dedup.py"] + _MEMO,
    "x54_unigram_logprob": [f"{_OPS}/lm.py", f"{_OPS}/text.py"],
    "x55_bpe_train": [f"{_OPS}/bpe.py", f"{_OPS}/text.py",
                      f"{_OPS}/dedup.py"] + _MEMO,
    "x56_domain_stats": [f"{_OPS}/web.py", f"{_OPS}/text.py"],
    "x57_temperature_resample": [f"{_OPS}/mixture.py", f"{_OPS}/packing.py"],
    "x58_bigram_logprob": [f"{_OPS}/lm.py", f"{_OPS}/text.py"],
    "x59_cluster_outliers": [f"{_OPS}/semdedup.py", f"{_OPS}/similarity.py",
                             f"{_OPS}/dedup.py"] + _MEMO,
    "x60_stream_stream_join": [f"{_P}/streaming/__init__.py",
                               f"{_P}/streaming/joins.py"],
    "x61_bpe_encode": [f"{_OPS}/bpe.py", f"{_OPS}/text.py",
                       f"{_OPS}/dedup.py"] + _MEMO,
    "x62_quality_rules": [f"{_OPS}/rules.py", f"{_OPS}/text.py"],
    "x63_event_funnel": [f"{_OPS}/funnel.py"],
    "x64_cohort_retention": [f"{_OPS}/cohort.py"],
    "x65_url_dedup": [f"{_OPS}/urlnorm.py"],
    "x66_line_dedup": [f"{_OPS}/linededup.py"],
    "x67_char_entropy": [f"{_OPS}/stats.py"],
    "x68_canonical_docs": [f"{_OPS}/dedup.py", f"{_OPS}/text.py"] + _MEMO,
    "x69_percentile_filter": [f"{_OPS}/stats.py"],
    "x70_rolling_features": [f"{_OPS}/rolling.py"],
    "x71_size_sharding": [f"{_OPS}/sharding.py"],
    "x72_kmeans_fit": [f"{_OPS}/kmeans.py", f"{_OPS}/similarity.py"] + _MEMO,
    "x73_dsir_weights": [f"{_OPS}/dsir.py", f"{_OPS}/packing.py",
                         f"{_OPS}/text.py"],
    "x74_span_dedup": [f"{_OPS}/spandedup.py", f"{_OPS}/text.py"],
    "x75_sample_per_group": [f"{_OPS}/sampling.py", f"{_OPS}/ranking.py"],
    "x76_ccnet_buckets": [f"{_OPS}/ccnet.py", f"{_OPS}/lm.py",
                          f"{_OPS}/text.py"],
    "x77_logreg_quality": [f"{_OPS}/logreg.py", f"{_OPS}/text.py"],
    "x78_curation_chain": [f"{_OPS}/spandedup.py", f"{_OPS}/lm.py",
                           f"{_OPS}/ccnet.py", f"{_OPS}/sampling.py",
                           f"{_OPS}/ranking.py", f"{_OPS}/text.py"],
    "x79_bm25_topk": [f"{_OPS}/bm25.py", f"{_OPS}/text.py"],
    "x80_pagerank": [f"{_OPS}/graph.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x81_pmi_cooccurrence": [f"{_OPS}/cooc.py", f"{_OPS}/lm.py",
                             f"{_OPS}/text.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x82_hashed_features": [f"{_OPS}/featurehash.py", f"{_OPS}/text.py",
                            f"{_OPS}/packing.py"],
    "x83_zorder_layout": [f"{_OPS}/zorder.py"],
    "x84_pca_projection": [f"{_OPS}/pca.py", f"{_OPS}/logreg.py"],
    "x85_fuzzy_linkage": [f"{_OPS}/fuzzy.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x86_weighted_sample": [f"{_OPS}/sampling.py", f"{_OPS}/ranking.py"],
    # dedup.py: the x87 gate runs knn_graph(method='both'), which executes
    # dedup._materialized (ADVICE r09 — omission is the failure mode)
    "x87_knn_graph": [f"{_OPS}/knn.py", f"{_OPS}/similarity.py",
                      f"{_OPS}/pca.py", f"{_OPS}/dedup.py"] + _MEMO,
    "x88_unigram_tokenizer": [f"{_OPS}/unigram.py", f"{_OPS}/text.py",
                              f"{_OPS}/logreg.py",
                              f"{_OPS}/dedup.py"] + _MEMO,
    "x90_unigram_encode": [f"{_OPS}/unigram.py", f"{_OPS}/text.py",
                           f"{_OPS}/logreg.py",
                           f"{_OPS}/dedup.py"] + _MEMO,
    "x89_pca_block": [f"{_OPS}/pca.py", f"{_OPS}/logreg.py"],
    # pq imports pca (clean prefilter) + knn (_row_topk_np); the Lloyd
    # trainer pulls kmeans (-> similarity) — deps err broad
    "x91_ivf_pq_ann": [f"{_OPS}/pq.py", f"{_OPS}/pca.py",
                       f"{_OPS}/knn.py", f"{_OPS}/kmeans.py",
                       f"{_OPS}/similarity.py", f"{_OPS}/dedup.py"]
    + _MEMO,
    "x92_stream_dedup_commit": [f"{_P}/streaming/incremental.py",
                                f"{_P}/sources/txn.py",
                                f"{_OPS}/dedup.py", f"{_OPS}/bloom.py",
                                f"{_OPS}/text.py"] + _MEMO,
    "x93_incremental_near_dup": [f"{_P}/sources/txn.py",
                                 f"{_OPS}/dedup.py",
                                 f"{_OPS}/text.py"] + _MEMO,
    # x94 drives the transactional PQ index (pq.py + sources/txn.py);
    # pq's import closure matches x91's (pca clean prefilter, knn
    # _row_topk_np, kmeans->similarity via the Lloyd trainer)
    "x94_pq_index_upsert": [f"{_OPS}/pq.py", f"{_OPS}/pca.py",
                            f"{_OPS}/knn.py", f"{_OPS}/kmeans.py",
                            f"{_OPS}/similarity.py",
                            f"{_P}/sources/txn.py"] + _MEMO,
    # x95 = x94's closure + the streaming driver module
    "x95_stream_vector_index": [f"{_P}/streaming/vectors.py",
                                f"{_OPS}/pq.py", f"{_OPS}/pca.py",
                                f"{_OPS}/knn.py", f"{_OPS}/kmeans.py",
                                f"{_OPS}/similarity.py",
                                f"{_P}/sources/txn.py"] + _MEMO,
    # r11 second half: the TxnTable DML/incremental-read gates drive
    # the storage layer alone (no operator modules)
    "x96_txn_delete": [f"{_P}/sources/txn.py"] + _MEMO,
    "x97_txn_skipping": [f"{_P}/sources/txn.py"] + _MEMO,
    "x98_txn_changes": [f"{_P}/sources/txn.py"] + _MEMO,
    # WordPiece reuses bpe's corpus/pair aggregations + text.tokens
    "x99_wordpiece_train": [f"{_OPS}/wordpiece.py", f"{_OPS}/bpe.py",
                            f"{_OPS}/text.py"],
    "x100_wordpiece_encode": [f"{_OPS}/wordpiece.py", f"{_OPS}/bpe.py",
                              f"{_OPS}/text.py"],
    "x101_txn_zorder": [f"{_OPS}/zorder.py",
                        f"{_P}/sources/txn.py"] + _MEMO,
    "x102_txn_stream_changes": [f"{_P}/sources/txn_stream.py",
                                f"{_P}/sources/txn.py",
                                f"{_P}/streaming/__init__.py"] + _MEMO,
    "x103_txn_merge": [f"{_P}/sources/txn.py"] + _MEMO,
    # lm imports text; the default-model path materializes via dedup
    "x104_kn_logprob": [f"{_OPS}/lm.py", f"{_OPS}/text.py",
                        f"{_OPS}/dedup.py"] + _MEMO,
    # r12: evolution-crossing CDF and incremental rebucket drive the
    # storage layer alone
    "x105_txn_evolve_changes": [f"{_P}/sources/txn.py"] + _MEMO,
    "x106_txn_rebucket": [f"{_P}/sources/txn.py"] + _MEMO,
    "x107_stream_keyed_cdf": [f"{_P}/sources/txn_stream.py",
                              f"{_P}/sources/txn.py"] + _MEMO,
    # r13: trained NB lang-id (langid imports packing._md5_bucket and
    # materializes the model frames via dedup._materialized)
    "x108_langid_confusion": [f"{_OPS}/langid.py", f"{_OPS}/packing.py",
                              f"{_OPS}/dedup.py",
                              f"{_OPS}/text.py"] + _MEMO,
    # r13: managed keyed-CDF driver — x107's store closure + the stream
    "x109_keyed_cdf_managed": [f"{_P}/sources/txn_stream.py",
                               f"{_P}/sources/txn.py"] + _MEMO,
    # r13: CDF-to-table replication — same closure as x109
    "x110_cdf_replica": [f"{_P}/sources/txn_stream.py",
                         f"{_P}/sources/txn.py"] + _MEMO,
    # r14: incremental aggregate maintenance (retraction-based) over the
    # managed keyed CDF — same store+stream closure as x109/x110
    "x111_incremental_agg": [f"{_P}/sources/txn_stream.py",
                             f"{_P}/sources/txn.py"] + _MEMO,
    # r14: trained lang-id composed into the CCNet stack — x108's
    # closure + the LM/CCNet stage it feeds
    "x112_langid_ccnet": [f"{_OPS}/langid.py", f"{_OPS}/packing.py",
                          f"{_OPS}/ccnet.py", f"{_OPS}/lm.py",
                          f"{_OPS}/text.py",
                          f"{_OPS}/dedup.py"] + _MEMO,
    # r14: filtered replica / filtered aggregate — the x109/x110 closure
    "x113_filtered_replica": [f"{_P}/sources/txn_stream.py",
                              f"{_P}/sources/txn.py"] + _MEMO,
    "x114_filtered_agg": [f"{_P}/sources/txn_stream.py",
                          f"{_P}/sources/txn.py"] + _MEMO,
}
DEPS.update(_X_DEPS)


def deps_for(name: str) -> list[str]:
    if name in DEPS:
        mods = DEPS[name]
    elif name.startswith("e"):
        mods = _ETL_STACK
    else:
        raise KeyError(f"no dependency mapping for gate {name!r}; add one "
                       f"to scripts/cert_manifest.py DEPS")
    return sorted(set(mods + _COMMON))


def _sha_file(rel: str) -> str:
    with open(os.path.join(REPO, rel), "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _sha_text(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _const_sha(mod) -> str:
    """Hash of the harness module's shared UPPERCASE constants (the values
    gate callables read besides their own source). Excluded, because they
    change whenever a gate is ADDED — which is not a semantic change to
    existing gates — and would otherwise force wholesale re-baselining on
    exactly the commits the tail-drift guard should bite: the
    QUERIES/ORACLES registries, the _CERT_* rotation schedules, and the
    per-gate _X*_SQL oracle literals (each gate's own oracle is already
    hashed per-query)."""
    import re
    consts = {}
    for k, v in sorted(vars(mod).items()):
        if (k.isupper() and k not in ("QUERIES", "ORACLES")
                and not k.startswith("_CERT")
                and not re.fullmatch(r"_[EQX]\d+\w*_?SQL", k)
                and isinstance(v, (int, float, str, bool, list, tuple))):
            consts[k] = repr(v)
    return _sha_text(json.dumps(consts, sort_keys=True))


def build_manifest() -> dict:
    import sys
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    qs = entry.queries()
    oracles = entry.oracle_sql()
    out: dict = {"modules": {}, "queries": {}}
    needed: set[str] = set()
    for name, fn in qs.items():
        mods = deps_for(name)
        needed.update(mods)
        out["queries"][name] = {
            "src": _sha_text(inspect.getsource(fn)),
            "oracle": _sha_text(oracles.get(name, "")),
            "consts": _const_sha(inspect.getmodule(fn)),
            "deps": mods,
        }
    for rel in sorted(needed):
        out["modules"][rel] = _sha_file(rel)
    return out


def rotation_violations(new: dict, old: dict) -> list[str]:
    """VERDICT r11 'What's wrong' #2 — the additive-change loophole: a
    commit that changes an engine module WITHOUT rotating its dependent
    tail gates used to be able to silently re-stamp the manifest (the
    r11 instances: lm.py +91/-0 re-stamped x54/x58/x76/x78, zorder.py
    +27/-0 re-stamped x83). Regeneration now refuses: any guarded gate
    (_CERT_TAIL or _CERT_REFRESH) whose callable source, oracle SQL,
    shared constants, or ANY engine-module dependency hash differs from
    the COMMITTED manifest must first rotate into _CERT_FIRST — even
    when the diff is provably additive. There is deliberately no
    override flag; the escape hatch IS the rotation."""
    import sys
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry
    guarded = set(entry._CERT_TAIL) | set(entry._CERT_REFRESH)
    out = []
    for name, rec in sorted(new["queries"].items()):
        if name not in guarded:
            continue
        orec = old.get("queries", {}).get(name)
        if orec is None:
            out.append(f"{name}: guarded but absent from the committed "
                       f"manifest — new gates start in _CERT_FIRST")
            continue
        for field in ("src", "oracle", "consts"):
            if rec[field] != orec[field]:
                out.append(f"{name}: {field} changed — rotate into "
                           f"_CERT_FIRST before regenerating")
        # ADVICE r12: the deps LIST itself is part of the certified
        # surface — a guarded gate that grows (or shrinks) an engine
        # dependency re-stamped without a violation before, a residual
        # form of the additive-change loophole. Compare the lists, and
        # treat a dep with no hash in the committed manifest as drift
        # (it was never covered by the certifying round).
        if rec["deps"] != orec.get("deps"):
            out.append(f"{name}: engine dependency list changed "
                       f"({orec.get('deps')} -> {rec['deps']}) — rotate "
                       f"into _CERT_FIRST before regenerating")
        for mod in rec["deps"]:
            omods = old.get("modules", {})
            if mod not in omods:
                out.append(f"{name}: engine module {mod} has no hash in "
                           f"the committed manifest — rotate into "
                           f"_CERT_FIRST before regenerating")
            elif new["modules"][mod] != omods[mod]:
                out.append(f"{name}: engine module {mod} changed — "
                           f"rotate into _CERT_FIRST before regenerating")
    return out


def main() -> None:
    manifest = build_manifest()
    old = {}
    if os.path.exists(MANIFEST_PATH):
        with open(MANIFEST_PATH) as f:
            old = json.load(f)
    bad = rotation_violations(manifest, old)
    if bad:
        raise SystemExit(
            "cert_manifest: REFUSING to re-stamp guarded gates whose code "
            "or dependencies drifted (rotate them into _CERT_FIRST "
            "first):\n" + "\n".join(f"  {b}" for b in bad))
    with open(MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {MANIFEST_PATH}: {len(manifest['queries'])} queries, "
          f"{len(manifest['modules'])} modules")


if __name__ == "__main__":
    main()
