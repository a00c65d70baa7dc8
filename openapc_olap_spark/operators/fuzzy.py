"""Fuzzy string matching / record linkage (SURVEY.md §2.9 X2 extension —
the approximate-key join a curation stack needs where exact dedup stops:
title/author/venue variants, OCR'd strings, near-identical metadata rows
from different feeds. Reference has no equivalent; driver-mandated
LLM-pipeline surface).

Classic blocked edit-distance join, Spark-first:

1. **q-gram postings blocking.** Each NORMALIZED string is padded with
   q-1 sentinel chars on both ends (Gravano et al. 2001 — so short and
   boundary-edited strings still share grams) and emits its q-grams
   WITH MULTIPLICITY as (gram, cnt) pairs; an equi-join on the gram
   pairs only strings sharing at least one (never all-pairs).
   ``gram_cap`` drops grams occurring in more than cap strings BEFORE
   the join — the stopword-gram guard, same df-cap discipline as
   ngram_jaccard (x14).
2. **Count-filter pruning.** One edit changes at most q padded grams,
   so strings within edit distance k share (as a MULTISET — shared =
   sum over grams of min(cnt_a, cnt_b)) at least

       bound = max(|a|, |b|) + q - 1 - k*q

   padded q-grams (|s| + q - 1 grams per string). Applied on the
   aggregated shared count BEFORE any expensive verify; pairs failing
   the bound never reach levenshtein. Counting DISTINCT grams here
   would under-count strings with repeated grams and silently prune
   true pairs (ADVICE r07) — multiplicity is load-bearing.
3. **Exact short-string path.** When max(|a|, |b|) <= L0 :=
   q*(k-1) + 1 the bound is <= 0 and blocking guarantees nothing (two
   length-2 strings at distance 2 can share zero grams), so the tiny
   <=L0-length stratum is verified exactly: a length-banded nested-loop
   join of the short set against itself. Short x long pairs never land
   here (the bound only degenerates when BOTH sides are short, since it
   uses the max length), so the two candidate regions are disjoint and
   together complete.
4. **Exact verify.** ``F.levenshtein`` (JVM, codegen) on the surviving
   sliver; identical semantics in DuckDB's levenshtein, so the whole
   operator is oracle-replayable.

The postings carry (gram, id, cnt) only — strings join back onto the
candidate PAIRS, so the wide columns never ride the gram exchange. The
(gram, cnt) run-length pairs are built JVM-side from one array_sort
(no groupBy shuffle): the only exchanges are the pair join and its
aggregation.

**Self-tuning blocking (VERDICT r07 #2).** The join volume is
sum over grams of C(df, 2) (self form) or sum of df_l * df_r (join
form) — one hot gram (low-entropy keys, e.g. hex tokens at q=3) makes
it quadratic and the job times out instead of failing fast.
``max_candidates`` arms a one-pass gram-df probe BEFORE the pair join:
if the measured volume exceeds the budget, ``auto_q=True`` retries the
probe at q+1, q+2 (longer grams are strictly more selective; ANY q is
correct, the bound adapts), and if nothing fits the call raises with
the measured per-q volumes instead of submitting a doomed join. The
winning probe's materialized gram base is REUSED by the real join
(ADVICE r08 — no rebuild), so an armed probe costs one df-aggregate,
not extra corpus passes. Zero probe cost when the knobs are off.

**Collapse-exact blocking (ADVICE r08).** Edit distance depends only
on the normalized string, so on duplicate-heavy key corpora (the
normal record-linkage shape: millions of rows, thousands of distinct
keys) ``collapse_exact=True`` first collapses identical normalized
strings to their min-id representative, runs the ENTIRE
block-bound-verify pipeline at distinct-string grain, then expands
matched string-classes back to id pairs (plus the intra-class dist-0
pairs). Gram doc-frequencies then count distinct STRINGS, not rows —
a constant infix shared by every row of a 100 TB feed no longer
creates a corpus-hot gram, and the blocking volume scales with key
entropy instead of corpus size. The id-pair OUTPUT is unchanged
(inherently |true pairs|-sized); only the candidate work collapses.

Sentinel: ``\\x01`` (never produced by the lower/whitespace
normalization; a real \\x01 in input text would merely weaken the
filter's tightness by one gram, never its soundness).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SENTINEL = "\x01"


def _norm(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def qgrams(col: Column | str, q: int = 3) -> Column:
    """Distinct PADDED q-grams of the lowercased, whitespace-normalized
    string -> array<string> (q-1 sentinel chars each side, so every
    string — even the empty one, for q >= 2 — carries grams). The
    distinct view of :func:`qgram_counts`; kept for callers that only
    need set blocking."""
    return F.array_distinct(
        F.transform(qgram_counts(col, q), lambda p: p["gram"]))


def qgram_counts(col: Column | str, q: int = 3) -> Column:
    """Padded q-grams WITH MULTIPLICITY -> array<struct<gram,cnt>>,
    built entirely JVM-side: sort the gram array once, then emit one
    struct per run (run-length encoding via index arithmetic) — no
    shuffle, no UDF. Multiplicity is what makes the Gravano count
    filter sound on strings with repeated grams (ADVICE r07). Default
    q=3 matches :func:`qgrams` / :func:`fuzzy_duplicates` (ADVICE r08
    — the old q=1 default silently handed callers unigrams, the
    weakest, hottest blocking keys)."""
    c = F.col(col) if isinstance(col, str) else col
    pad = F.lit(_SENTINEL * (q - 1))
    p = F.concat(pad, _norm(c), pad)
    n_grams = F.length(p) - q + 1           # = len(norm) + q - 1
    grams = F.when(n_grams >= 1, F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: p.substr(i, F.lit(q)))
    ).otherwise(F.array().cast("array<string>"))
    sg = F.array_sort(grams)
    # 0-based start index of every run of equal grams
    starts = F.filter(
        F.transform(sg, lambda _, i: i),
        lambda i: (i == 0) | (F.element_at(sg, i + 1)
                              != F.element_at(sg, i)))
    n_starts = F.size(starts)
    return F.transform(
        starts,
        lambda s, j: F.struct(
            F.element_at(sg, s + 1).alias("gram"),
            (F.when(j == n_starts - 1, F.size(sg))
             .otherwise(F.element_at(starts, j + 2)) - s)
            .cast("int").alias("cnt")))


def _short_len(q: int, max_dist: int) -> int:
    """L0: the longest max-side length at which the count bound
    degenerates (bound <= 0) — both-short pairs go to the exact path."""
    return q * (max_dist - 1) + 1


def _bound(la: Column | str, lb: Column | str, q: int,
           max_dist: int) -> Column:
    return (F.greatest(la, lb) + F.lit(q - 1) - F.lit(max_dist * q))


def _normed(df: DataFrame, col: str, id_col: str) -> DataFrame:
    """(id, s): ids aliased, strings normalized once up front."""
    return df.select(F.col(id_col).alias("id"), _norm(col).alias("s"))


def _gram_base(sdf: DataFrame, q: int) -> DataFrame:
    """Materialized (id, s, __gc) gram base over a pre-normalized
    (id, s) frame — persisted because the pair join consumes it from
    both sides (and the probe reads it first when armed)."""
    from openapc_olap_spark.operators.dedup import _materialized, _spread
    return _materialized(_spread(sdf.select(
        "id", "s", qgram_counts(F.col("s"), q).alias("__gc"))))


def _postings(base: DataFrame, gram_cap: int | None) -> DataFrame:
    post = base.select(
        "id", F.length("s").alias("__len"),
        F.explode("__gc").alias("__p")
    ).select("id", "__len", F.col("__p.gram").alias("gram"),
             F.col("__p.cnt").alias("cnt"))
    if gram_cap is not None:
        # df = number of STRINGS containing the gram (postings are one
        # row per (id, gram) by construction)
        small = (post.groupBy("gram")
                 .agg(F.count(F.lit(1)).alias("__n"))
                 .filter(F.col("__n") <= gram_cap)
                 .select("gram"))
        post = post.join(small, ["gram"], "left_semi")
    return post


def _probe_self(base: DataFrame, post: DataFrame, q: int,
                max_dist: int) -> dict:
    """Candidate-pair volume of the SELF join at these dials: sum over
    grams of C(df, 2) plus the short-stratum C(n_short, 2) — two tiny
    aggregates over the already-materialized base."""
    blocked = (post.groupBy("gram")
               .agg(F.count(F.lit(1)).alias("__n"))
               .agg(F.sum(F.col("__n") * (F.col("__n") - 1) / 2)
                    .cast("long").alias("v"))
               .first()["v"]) or 0
    n_short = base.filter(
        F.length("s") <= _short_len(q, max_dist)).count()
    short_pairs = n_short * (n_short - 1) // 2
    return {"q": q, "blocked_pairs": int(blocked), "n_short": int(n_short),
            "short_pairs": int(short_pairs),
            "total": int(blocked) + int(short_pairs)}


def _cross_postings(bl: DataFrame, br: DataFrame,
                    gram_cap: int | None) -> tuple[DataFrame, DataFrame]:
    """Two-frame postings with the gram_cap measured on the UNION df
    (a gram hot on either side floods the join either way)."""
    pl, pr = _postings(bl, None), _postings(br, None)
    if gram_cap is not None:
        counts = (pl.select("gram").unionByName(pr.select("gram"))
                  .groupBy("gram").agg(F.count(F.lit(1)).alias("__n"))
                  .filter(F.col("__n") <= gram_cap).select("gram"))
        pl = pl.join(counts, ["gram"], "left_semi")
        pr = pr.join(counts, ["gram"], "left_semi")
    return pl, pr


def _probe_cross(bl: DataFrame, br: DataFrame, q: int, max_dist: int,
                 gram_cap: int | None) -> dict:
    """Candidate-pair volume of the TWO-FRAME join: sum over grams of
    df_l * df_r plus the short-stratum n_short_l * n_short_r cross
    product (ADVICE r08 — fuzzy_join previously had no probe at all)."""
    pl, pr = _cross_postings(bl, br, gram_cap)
    dfl = pl.groupBy("gram").agg(F.count(F.lit(1)).alias("__nl"))
    dfr = pr.groupBy("gram").agg(F.count(F.lit(1)).alias("__nr"))
    blocked = (dfl.join(dfr, ["gram"])
               .agg(F.sum(F.col("__nl").cast("long")
                          * F.col("__nr").cast("long")).alias("v"))
               .first()["v"]) or 0
    sl = bl.filter(F.length("s") <= _short_len(q, max_dist)).count()
    sr = br.filter(F.length("s") <= _short_len(q, max_dist)).count()
    return {"q": q, "blocked_pairs": int(blocked),
            "n_short_l": int(sl), "n_short_r": int(sr),
            "short_pairs": int(sl) * int(sr),
            "total": int(blocked) + int(sl) * int(sr)}


def estimate_blocking_volume(df: DataFrame, col: str = "text",
                             id_col: str = "doc_id", q: int = 3,
                             max_dist: int = 2,
                             gram_cap: int | None = None) -> dict:
    """One-pass probe of the candidate-pair volume the blocked SELF
    join would produce at these dials — {"q", "blocked_pairs",
    "n_short", "short_pairs", "total"}, driver-sized scalars. The
    standalone form builds (and releases) its own gram base; an armed
    ``max_candidates`` run inside :func:`fuzzy_duplicates` reuses the
    winning base instead."""
    base = _gram_base(_normed(df, col, id_col), q)
    try:
        return _probe_self(base, _postings(base, gram_cap), q, max_dist)
    finally:
        base.unpersist()


def estimate_join_volume(left: DataFrame, right: DataFrame,
                         col: str = "text", left_id: str = "id_l",
                         right_id: str = "id_r", q: int = 3,
                         max_dist: int = 2,
                         gram_cap: int | None = None) -> dict:
    """Two-frame companion of :func:`estimate_blocking_volume`:
    sum over grams of df_l * df_r plus the short-stratum cross
    product."""
    bl = _gram_base(_normed(left, col, left_id), q)
    br = _gram_base(_normed(right, col, right_id), q)
    try:
        return _probe_cross(bl, br, q, max_dist, gram_cap)
    finally:
        bl.unpersist()
        br.unpersist()


def _volume_error(tried: list[dict], max_candidates: int) -> ValueError:
    detail = "; ".join(
        f"q={v['q']}: {v['blocked_pairs']} blocked + {v['short_pairs']} "
        f"short = {v['total']}" for v in tried)
    return ValueError(
        f"fuzzy blocking volume exceeds max_candidates={max_candidates} "
        f"at every probed q ({detail}). Raise max_candidates, set/lower "
        f"gram_cap (drops hot grams, may lose recall), collapse_exact=True "
        f"(duplicate-heavy corpora), or pass a larger q explicitly.")


def _pick_q(sdf: DataFrame, q: int, max_dist: int,
            gram_cap: int | None, max_candidates: int,
            auto_q: bool) -> tuple[int, DataFrame]:
    """Probe q (and q+1, q+2 under ``auto_q``) against the budget;
    return the first q THAT FITS together with its already-materialized
    gram base (reused by the real join — ADVICE r08), or raise with the
    measured volumes. Losing bases are unpersisted."""
    tried = []
    for q_eff in range(q, q + (3 if auto_q else 1)):
        base = _gram_base(sdf, q_eff)
        vol = _probe_self(base, _postings(base, gram_cap), q_eff, max_dist)
        if vol["total"] <= max_candidates:
            return q_eff, base
        tried.append(vol)
        base.unpersist()
    raise _volume_error(tried, max_candidates)


def _pick_q_join(sl: DataFrame, sr: DataFrame, q: int, max_dist: int,
                 gram_cap: int | None, max_candidates: int,
                 auto_q: bool) -> tuple[int, DataFrame, DataFrame]:
    """Cross-frame twin of :func:`_pick_q`: returns the winning q with
    BOTH materialized gram bases."""
    tried = []
    for q_eff in range(q, q + (3 if auto_q else 1)):
        bl, br = _gram_base(sl, q_eff), _gram_base(sr, q_eff)
        vol = _probe_cross(bl, br, q_eff, max_dist, gram_cap)
        if vol["total"] <= max_candidates:
            return q_eff, bl, br
        tried.append(vol)
        bl.unpersist()
        br.unpersist()
    raise _volume_error(tried, max_candidates)


def _verify(cands: DataFrame, sa: DataFrame, sb: DataFrame,
            max_dist: int) -> DataFrame:
    return (cands.join(sa, ["id_a"]).join(sb, ["id_b"])
            .withColumn("dist", F.levenshtein("__sa", "__sb"))
            .filter(F.col("dist") <= max_dist)
            .select("id_a", "id_b", "dist"))


def _self_pairs(base: DataFrame, post: DataFrame, q: int,
                max_dist: int) -> DataFrame:
    """Blocked + short strata of the self form over a prepared gram
    base: (id_a, id_b, dist), id_a < id_b."""
    l, r = post.alias("l"), post.alias("r")
    short_max = _short_len(q, max_dist)
    shared = (l.join(r, (F.col("l.gram") == F.col("r.gram"))
                     & (F.col("l.id") < F.col("r.id")))
              .groupBy(F.col("l.id").alias("id_a"),
                       F.col("r.id").alias("id_b"))
              .agg(F.sum(F.least("l.cnt", "r.cnt")).alias("__shared"),
                   F.first("l.__len").alias("__la"),
                   F.first("r.__len").alias("__lb")))
    cands = (shared.filter(
                (F.greatest("__la", "__lb") > short_max)
                & (F.col("__shared") >= _bound("__la", "__lb", q, max_dist)))
             .select("id_a", "id_b"))
    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("__sa"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("__sb"))
    blocked = _verify(cands, sa, sb, max_dist)
    # exact path for the degenerate-bound stratum (both sides <= L0):
    # a length-banded nested-loop join over the tiny short set — AQE
    # broadcasts it; the probe priced it as C(n_short, 2)
    sh = base.filter(F.length("s") <= short_max)
    a, b = sh.alias("a"), sh.alias("b")
    short = (a.join(b, (F.col("a.id") < F.col("b.id"))
                    & (F.abs(F.length("a.s") - F.length("b.s"))
                       <= max_dist))
             .select(F.col("a.id").alias("id_a"),
                     F.col("b.id").alias("id_b"),
                     F.levenshtein("a.s", "b.s").alias("dist"))
             .filter(F.col("dist") <= max_dist))
    return blocked.unionByName(short)


def _validate(max_dist: int, q: int, max_candidates: int | None,
              auto_q: bool) -> None:
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if q < 1:
        raise ValueError(f"q must be >= 1, got {q}")
    if auto_q and max_candidates is None:
        raise ValueError("auto_q requires max_candidates (the budget "
                         "the probe tunes against)")


def fuzzy_duplicates(df: DataFrame, col: str = "text",
                     id_col: str = "doc_id", max_dist: int = 2,
                     q: int = 3,
                     gram_cap: int | None = None,
                     max_candidates: int | None = None,
                     auto_q: bool = False,
                     collapse_exact: bool = False) -> DataFrame:
    """Self-join form: (id_a, id_b, dist) for ALL pairs with
    levenshtein(norm_a, norm_b) <= max_dist, id_a < id_b. Distance is
    on the NORMALIZED strings (lowercase, collapsed whitespace) — the
    linkage convention; identical-after-normalization pairs surface
    with dist 0. ``gram_cap`` trades recall for volume (documented
    knob); ``max_candidates`` (+ ``auto_q``) arms the fail-fast volume
    probe; ``collapse_exact`` runs the pipeline at distinct-string
    grain and expands matches back to id pairs — see the module
    docstring."""
    _validate(max_dist, q, max_candidates, auto_q)
    norm_df = _normed(df, col, id_col)
    reps = None
    if collapse_exact:
        from openapc_olap_spark.operators.dedup import _materialized
        # one row per DISTINCT normalized string; min member id is the
        # class representative (and the id the string-grain pipeline
        # sees). Materialized: the expansion joins read it again.
        reps = _materialized(
            norm_df.groupBy("s").agg(F.min("id").alias("rid")))
        work = reps.select(F.col("rid").alias("id"), "s")
    else:
        work = norm_df
    if max_candidates is not None:
        q, base = _pick_q(work, q, max_dist, gram_cap, max_candidates,
                          auto_q)
    else:
        base = _gram_base(work, q)
    pairs = _self_pairs(base, _postings(base, gram_cap), q, max_dist)
    if not collapse_exact:
        return pairs
    # expand string-class matches back to id pairs. Classes are
    # disjoint, so every cross-class member pair appears exactly once;
    # least/greatest restores id_a < id_b (member ids interleave across
    # classes). Intra-class pairs are dist 0 by construction. The
    # member map is SPREAD before the expansion joins: it inherits the
    # (often 1-2-split) scan partitioning, and the output-bound
    # million-pair expansion would otherwise run on those few tasks.
    from openapc_olap_spark.operators.dedup import _spread
    mem = _spread(norm_df.join(reps, ["s"]).select("id", "rid"))
    ma = mem.select(F.col("rid").alias("id_a"), F.col("id").alias("__a"))
    mb = mem.select(F.col("rid").alias("id_b"), F.col("id").alias("__b"))
    cross = (pairs.join(ma, ["id_a"]).join(mb, ["id_b"])
             .select(F.least("__a", "__b").alias("id_a"),
                     F.greatest("__a", "__b").alias("id_b"), "dist"))
    x, y = mem.alias("x"), mem.alias("y")
    same = (x.join(y, (F.col("x.rid") == F.col("y.rid"))
                   & (F.col("x.id") < F.col("y.id")))
            .select(F.col("x.id").alias("id_a"),
                    F.col("y.id").alias("id_b"),
                    F.lit(0).cast("int").alias("dist")))
    return cross.unionByName(same)


_CHK_M1, _CHK_M2 = 2147483647, 1000000007
_CHK_C1, _CHK_C2 = 1000003, 7919


def linkage_stats(df: DataFrame, col: str = "text",
                  id_col: str = "doc_id", max_dist: int = 2,
                  q: int = 3,
                  gram_cap: int | None = None,
                  max_candidates: int | None = None,
                  auto_q: bool = False) -> DataFrame:
    """Aggregate-grain twin of ``fuzzy_duplicates(collapse_exact=True)``
    (VERDICT r09 #2): per (dist, len_sum) — len_sum = the two normalized
    lengths summed — the matched-pair COUNT and two modular checksums of
    the pair set, WITHOUT ever materializing the id pairs.

    The checksums are symmetric per-pair terms

        chk_k = ( sum over pairs {a,b} of f_k(a) + f_k(b) ) mod M_k,
        f_k(x) = (x * C_k) mod M_k

    so they decompose at STRING-CLASS grain: for distinct normalized
    strings A, B matched at dist d, the n_A*n_B cross pairs contribute
    n_B * sum_A f_k + n_A * sum_B f_k, and a class of size n contributes
    C(n,2) intra pairs (dist 0) with (n-1) * sum f_k — all computable
    from per-class (n, sum f_k, len) scalars. The blocking /
    count-bound / levenshtein pipeline runs at distinct-string grain
    exactly as collapse_exact does; only the output-bound expansion
    (24.8M id pairs at sf10 — the r09 gate's own bottleneck) is replaced
    by the closed form. A wrong, missing, or extra pair shifts both
    checksums; pair-grain oracles replay the same sums directly.

    Overflow envelope (exact in int64): per-class sums apply mod before
    combining, so every product is < M_k^2 < 2^62; class sizes must stay
    < 2^31 for the C(n,2) term (any realistic key-entropy corpus).
    """
    _validate(max_dist, q, max_candidates, auto_q)
    from openapc_olap_spark.operators.dedup import _materialized

    norm_df = _normed(df, col, id_col)
    cls = _materialized(
        norm_df.groupBy("s").agg(
            F.min("id").alias("rid"),
            F.count(F.lit(1)).alias("n"),
            F.pmod(F.sum(F.pmod(F.col("id") * _CHK_C1, F.lit(_CHK_M1))),
                   F.lit(_CHK_M1)).alias("sf1"),
            F.pmod(F.sum(F.pmod(F.col("id") * _CHK_C2, F.lit(_CHK_M2))),
                   F.lit(_CHK_M2)).alias("sf2")))
    work = cls.select(F.col("rid").alias("id"), "s")
    if max_candidates is not None:
        q, base = _pick_q(work, q, max_dist, gram_cap, max_candidates,
                          auto_q)
    else:
        base = _gram_base(work, q)
    spairs = _self_pairs(base, _postings(base, gram_cap), q, max_dist)
    ca = cls.select(F.col("rid").alias("id_a"), F.col("n").alias("__na"),
                    F.col("sf1").alias("__f1a"),
                    F.col("sf2").alias("__f2a"),
                    F.length("s").alias("__la"))
    cb = cls.select(F.col("rid").alias("id_b"), F.col("n").alias("__nb"),
                    F.col("sf1").alias("__f1b"),
                    F.col("sf2").alias("__f2b"),
                    F.length("s").alias("__lb"))
    cross = (spairs.join(ca, ["id_a"]).join(cb, ["id_b"])
             .select(
                 F.col("dist"),
                 (F.col("__la") + F.col("__lb")).alias("len_sum"),
                 (F.col("__na") * F.col("__nb")).alias("n_pairs"),
                 F.pmod(F.pmod("__nb", F.lit(_CHK_M1)) * F.col("__f1a")
                        + F.pmod("__na", F.lit(_CHK_M1)) * F.col("__f1b"),
                        F.lit(_CHK_M1)).alias("c1"),
                 F.pmod(F.pmod("__nb", F.lit(_CHK_M2)) * F.col("__f2a")
                        + F.pmod("__na", F.lit(_CHK_M2)) * F.col("__f2b"),
                        F.lit(_CHK_M2)).alias("c2")))
    intra = (cls.filter(F.col("n") >= 2)
             .select(
                 F.lit(0).cast("int").alias("dist"),
                 (F.length("s") * 2).alias("len_sum"),
                 (F.col("n") * (F.col("n") - 1) / 2)
                 .cast("long").alias("n_pairs"),
                 F.pmod(F.pmod(F.col("n") - 1, F.lit(_CHK_M1))
                        * F.col("sf1"), F.lit(_CHK_M1)).alias("c1"),
                 F.pmod(F.pmod(F.col("n") - 1, F.lit(_CHK_M2))
                        * F.col("sf2"), F.lit(_CHK_M2)).alias("c2")))
    return (cross.unionByName(intra)
            .groupBy("dist", "len_sum")
            .agg(F.sum("n_pairs").cast("long").alias("n_pairs"),
                 F.pmod(F.sum("c1"), F.lit(_CHK_M1))
                 .cast("long").alias("chk1"),
                 F.pmod(F.sum("c2"), F.lit(_CHK_M2))
                 .cast("long").alias("chk2")))


def fuzzy_join(left: DataFrame, right: DataFrame, col: str,
               left_id: str = "id_l", right_id: str = "id_r",
               max_dist: int = 2, q: int = 3,
               gram_cap: int | None = None,
               max_candidates: int | None = None,
               auto_q: bool = False,
               collapse_exact: bool = False) -> DataFrame:
    """Two-frame form: (left_id, right_id, dist) for cross-frame pairs
    within ``max_dist`` — the record-linkage join (match a dirty feed
    against a canonical table). Same multiset blocking + padded bound +
    exact short stratum + verify as :func:`fuzzy_duplicates`, and the
    same ``max_candidates``/``auto_q`` fail-fast probe (ADVICE r08 —
    the cross-frame volume is sum over grams of df_l * df_r plus the
    short-stratum cross product) and ``collapse_exact`` string-grain
    collapse on BOTH sides."""
    _validate(max_dist, q, max_candidates, auto_q)
    nl, nr = _normed(left, col, left_id), _normed(right, col, right_id)
    rl = rr = None
    if collapse_exact:
        from openapc_olap_spark.operators.dedup import _materialized
        rl = _materialized(nl.groupBy("s").agg(F.min("id").alias("rid")))
        rr = _materialized(nr.groupBy("s").agg(F.min("id").alias("rid")))
        wl = rl.select(F.col("rid").alias("id"), "s")
        wr = rr.select(F.col("rid").alias("id"), "s")
    else:
        wl, wr = nl, nr
    if max_candidates is not None:
        q, bl, br = _pick_q_join(wl, wr, q, max_dist, gram_cap,
                                 max_candidates, auto_q)
    else:
        bl, br = _gram_base(wl, q), _gram_base(wr, q)
    pl, pr = _cross_postings(bl, br, gram_cap)
    pl = pl.select(F.col("id").alias("__id_l"),
                   F.col("__len").alias("__la"), "gram",
                   F.col("cnt").alias("__cl"))
    pr = pr.select(F.col("id").alias("__id_r"),
                   F.col("__len").alias("__lb"), "gram",
                   F.col("cnt").alias("__cr"))
    short_max = _short_len(q, max_dist)
    shared = (pl.join(pr, ["gram"])
              .groupBy("__id_l", "__id_r")
              .agg(F.sum(F.least("__cl", "__cr")).alias("__shared"),
                   F.first("__la").alias("__la"),
                   F.first("__lb").alias("__lb")))
    cands = (shared.filter(
                (F.greatest("__la", "__lb") > short_max)
                & (F.col("__shared")
                   >= _bound("__la", "__lb", q, max_dist)))
             .select("__id_l", "__id_r"))
    blocked = (cands
               .join(bl.select(F.col("id").alias("__id_l"),
                               F.col("s").alias("__s_l")), ["__id_l"])
               .join(br.select(F.col("id").alias("__id_r"),
                               F.col("s").alias("__s_r")), ["__id_r"])
               .withColumn("dist", F.levenshtein("__s_l", "__s_r"))
               .filter(F.col("dist") <= max_dist)
               .select(F.col("__id_l").alias("__wl"),
                       F.col("__id_r").alias("__wr"), "dist"))
    shl = bl.filter(F.length("s") <= short_max).alias("a")
    shr = br.filter(F.length("s") <= short_max).alias("b")
    short = (shl.join(shr, F.abs(F.length("a.s") - F.length("b.s"))
                      <= max_dist)
             .select(F.col("a.id").alias("__wl"),
                     F.col("b.id").alias("__wr"),
                     F.levenshtein("a.s", "b.s").alias("dist"))
             .filter(F.col("dist") <= max_dist))
    pairs = blocked.unionByName(short)
    if collapse_exact:
        ml = nl.join(rl, ["s"]).select(F.col("rid").alias("__wl"),
                                       F.col("id").alias("__el"))
        mr = nr.join(rr, ["s"]).select(F.col("rid").alias("__wr"),
                                       F.col("id").alias("__er"))
        pairs = (pairs.join(ml, ["__wl"]).join(mr, ["__wr"])
                 .select(F.col("__el").alias("__wl"),
                         F.col("__er").alias("__wr"), "dist"))
    return pairs.select(F.col("__wl").alias(left_id),
                        F.col("__wr").alias(right_id), "dist")
