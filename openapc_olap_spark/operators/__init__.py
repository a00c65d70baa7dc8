"""Driver-mandated LLM-data-pipeline operators (SURVEY.md §2.9), built for
100 TB scale: dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search (brute-force + LSH-bucketed ANN), text
analysis (lang-id, quality, tokens, fingerprints), multimodal binary columns,
and event-window analytics.

Design rule: built-in pyspark.sql.functions everywhere the semantics allow
(JVM-side, codegen'd, Catalyst-visible); Arrow-batched pandas UDFs only where
genuinely needed (multimodal decode); never row-at-a-time Python.
"""

from openapc_olap_spark.operators import (  # noqa: F401
    bloom,
    bm25,
    bpe,
    ccnet,
    cooc,
    chunking,
    cohort,
    curation,
    decontam,
    dedup,
    dsir,
    featurehash,
    funnel,
    fuzzy,
    graph,
    kmeans,
    knn,
    linededup,
    lm,
    logreg,
    mixture,
    multimodal,
    packing,
    pca,
    pipeline,
    profile,
    quantize,
    ranking,
    rolling,
    rules,
    sampling,
    semdedup,
    sharding,
    similarity,
    sketches,
    skew,
    spandedup,
    stats,
    temporal,
    text,
    tfidf,
    unigram,
    urlnorm,
    web,
    windows,
    zorder,
)
