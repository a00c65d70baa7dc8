"""Round-6 library operators composed as one curation chain over the
real sf0.001 corpus: span dedup -> LM scoring -> CCNet buckets ->
head+middle keep -> exact-k per-group sample. Asserts the chain's
schema, conservation properties, and end-to-end determinism across
partitionings — the shape the round-7 composed gate will formalize."""

import pytest
from pyspark.sql import functions as F

from openapc_olap_spark.operators import (ccnet, lm, sampling, spandedup)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "lang", "text"))


def _run_chain(df, k=5):
    cleaned = spandedup.remove_repeated_spans(df, w=8, max_docs=2)
    scored = (lm.doc_mean_logprob(cleaned)
              .join(cleaned.select("doc_id", "lang"), "doc_id")
              .withColumnRenamed("mean_logprob", "score"))
    bucketed = ccnet.perplexity_buckets(scored)
    keep = bucketed.filter(F.col("bucket").isin("head", "middle"))
    return sampling.sample_k_per_group(keep, ["lang"], k=k,
                                       id_col="doc_id")


def test_chain_runs_and_conserves(spark, docs):
    out = _run_chain(docs).collect()
    assert out                                   # non-empty end to end
    langs = {}
    for r in out:
        langs[r["lang"]] = langs.get(r["lang"], 0) + 1
        assert r["bucket"] in ("head", "middle")
        assert 1 <= r["rk"] <= 5
    n_langs = docs.select("lang").distinct().count()
    assert len(langs) == n_langs                 # every language sampled
    assert all(v <= 5 for v in langs.values())


def test_chain_deterministic_across_partitionings(spark, docs):
    a = {r["doc_id"] for r in _run_chain(docs.coalesce(1)).collect()}
    b = {r["doc_id"]
         for r in _run_chain(docs.repartition(9, "doc_id")).collect()}
    assert a == b
