"""Fuzzy matching (operators/fuzzy.py) vs a pure-Python BRUTE-FORCE
reference: all pairs, exact levenshtein on normalized strings — the
semantic contract, deliberately NOT a replay of the blocking/bound
(ADVICE r07: a reference that reimplements the operator's own filter
cannot catch an unsound filter)."""

import pytest

from openapc_olap_spark.operators import fuzzy

NAMES = [
    (1, "Johann Sebastian Bach"),
    (2, "johann sebastian bach"),      # dist 0 after normalization
    (3, "Johann Sebastien Bach"),      # 1 substitution
    (4, "J. S. Bach"),
    (5, "Wolfgang Amadeus Mozart"),
    (6, "Wolfgang  Amadeus Mozrat"),   # swap + double space
    (7, "Ludwig van Beethoven"),
    (8, "Ludwig von Beethoven"),       # 1 substitution
    (9, "completely different"),
]

# the ADVICE r07 adversarial set: repeated-gram strings where the
# DISTINCT-gram count bound silently pruned a true pair, plus short /
# empty strings that carry no unpadded grams at all
NASTY = [
    (1, "aaaaaaaaaaaa"),               # 12 x 'a'
    (2, "aaaaaaaaaaab"),               # dist 1, shared DISTINCT grams = 1
    (3, "aaaabaaaabaa"),               # dist 2 from id 1
    (4, "ab"), (5, "ac"), (6, "cd"),   # short: zero shared grams possible
    (7, ""), (8, "a"), (9, "xy"),
    (10, "abcdefghijkl"),
]


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(s):
    import re
    return re.sub(r"\s+", " ", s.lower()).strip()


def _brute_pairs(rows, max_dist):
    out = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            lo, hi = min(ia, ib), max(ia, ib)
            d = _py_lev(_norm(sa), _norm(sb))
            if d <= max_dist:
                out[(lo, hi)] = d
    return out


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, ["doc_id", "text"]).repartition(3)


@pytest.fixture(scope="module")
def nasty_df(spark):
    return spark.createDataFrame(NASTY, ["doc_id", "text"]).repartition(3)


def test_self_pairs_match_brute_force(spark, names_df):
    for k in (0, 1, 2, 3):
        got = {(r["id_a"], r["id_b"]): r["dist"] for r in
               fuzzy.fuzzy_duplicates(names_df, max_dist=k).collect()}
        assert got == _brute_pairs(NAMES, k), f"max_dist {k}"
    # the expected structure at k=2: case/space variants + single subs
    got2 = {(r["id_a"], r["id_b"]): r["dist"] for r in
            fuzzy.fuzzy_duplicates(names_df, max_dist=2).collect()}
    assert got2[(1, 2)] == 0 and got2[(1, 3)] == 1 and got2[(7, 8)] == 1
    assert got2[(5, 6)] == 2
    assert not any(9 in p for p in got2)


def test_repeated_gram_and_short_strings_match_brute_force(spark, nasty_df):
    """The ADVICE r07 soundness cases: multiset counting keeps
    'aaaaaaaaaaaa' ~ 'aaaaaaaaaaab' (distinct-gram count 1 < bound);
    the exact short stratum finds 'ab' ~ 'ac' and 'ab' ~ 'cd' (zero
    shared grams); padding keeps '' ~ 'a'."""
    for k in (0, 1, 2):
        got = {(r["id_a"], r["id_b"]): r["dist"] for r in
               fuzzy.fuzzy_duplicates(nasty_df, max_dist=k).collect()}
        assert got == _brute_pairs(NASTY, k), f"max_dist {k}"
    got2 = _brute_pairs(NASTY, 2)
    assert got2[(1, 2)] == 1          # the repeated-gram pair survives
    assert got2[(4, 5)] == 1 and got2[(4, 6)] == 2 and got2[(7, 8)] == 1
    # and at several q (any q is correct; only cost changes)
    for q in (1, 2, 4):
        got = {(r["id_a"], r["id_b"]): r["dist"] for r in
               fuzzy.fuzzy_duplicates(nasty_df, max_dist=2, q=q).collect()}
        assert got == got2, f"q {q}"


def test_two_frame_join(spark):
    canon = spark.createDataFrame(
        [(100, "New York"), (200, "Los Angeles"), (300, "Chicago"),
         (400, "ab")],
        ["cid", "text"])
    dirty = spark.createDataFrame(
        [(1, "new  york"), (2, "Los Angelos"), (3, "Chicagoo"),
         (4, "Houston"), (5, "cd")],
        ["rid", "text"])
    got = {(r["rid"], r["cid"]): r["dist"] for r in
           fuzzy.fuzzy_join(dirty, canon, "text", left_id="rid",
                            right_id="cid", max_dist=2).collect()}
    # (5, 400): 'cd' ~ 'ab' dist 2 shares zero grams — the cross-frame
    # short stratum must find it
    assert got == {(1, 100): 0, (2, 200): 1, (3, 300): 1, (5, 400): 2}


def test_gram_cap_and_validation(spark, names_df):
    # an absurd cap of 1 kills every shared gram -> no BLOCKED
    # candidates (the long strings here are all > L0, so the short
    # stratum is empty too)
    assert fuzzy.fuzzy_duplicates(names_df, max_dist=2,
                                  gram_cap=1).count() == 0
    with pytest.raises(ValueError):
        fuzzy.fuzzy_duplicates(names_df, max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy.fuzzy_duplicates(names_df, q=0)
    with pytest.raises(ValueError, match="auto_q requires"):
        fuzzy.fuzzy_duplicates(names_df, auto_q=True)


def test_volume_probe_and_fail_fast(spark, nasty_df, names_df):
    vol = fuzzy.estimate_blocking_volume(nasty_df, col="text", q=3,
                                         max_dist=2)
    assert vol["q"] == 3 and vol["total"] == (vol["blocked_pairs"]
                                              + vol["short_pairs"])
    assert vol["n_short"] == 6 and vol["short_pairs"] == 15
    assert vol["blocked_pairs"] > 0
    # generous budget: runs, correct
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           fuzzy.fuzzy_duplicates(nasty_df, max_dist=2,
                                  max_candidates=10_000).collect()}
    assert got == _brute_pairs(NASTY, 2)
    # hopeless budget: measured-volume error, not a doomed join
    with pytest.raises(ValueError, match="blocking volume exceeds"):
        fuzzy.fuzzy_duplicates(nasty_df, max_dist=2, max_candidates=1,
                               auto_q=True)
    # the SCALING.md low-entropy shape: hex tokens, where the q=3 gram
    # space (16^3) saturates and every gram goes hot, but q=5 (16^5) is
    # sparse — auto_q must escalate inside the budget and stay correct
    import hashlib
    rows = [(i, hashlib.md5(str(i).encode()).hexdigest())
            for i in range(400)]
    low = spark.createDataFrame(rows, ["doc_id", "text"])
    v3 = fuzzy.estimate_blocking_volume(low, q=3, max_dist=1)
    v5 = fuzzy.estimate_blocking_volume(low, q=5, max_dist=1)
    assert v5["blocked_pairs"] < v3["blocked_pairs"]
    budget = v3["total"] - 1
    assert v5["total"] <= budget     # escalation has room to land
    got = fuzzy.fuzzy_duplicates(low, max_dist=1, max_candidates=budget,
                                 auto_q=True)
    assert got.count() == 0          # md5 hexes are all >1 edit apart


def test_collapse_exact_matches_plain(spark):
    """ADVICE r08 / x85 scale fix: collapse_exact runs blocking at
    distinct-string grain and expands back — the id-pair output must be
    IDENTICAL to the plain path, including intra-class dist-0 pairs and
    short-stratum classes."""
    rows = []
    for i in range(60):
        variant = i % 4
        base = f"src{i % 2} rec {i % 3}"
        s = [base, base.upper(), base[:2] + "x" + base[3:],
             base[:-1] + "z"][variant]
        rows.append((i, s))
    rows += [(100, "ab"), (101, "AB"), (102, "ac")]   # short classes
    df = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(4)
    want = _brute_pairs(rows, 2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           fuzzy.fuzzy_duplicates(df, max_dist=2,
                                  collapse_exact=True).collect()}
    assert got == want
    plain = {(r["id_a"], r["id_b"]): r["dist"] for r in
             fuzzy.fuzzy_duplicates(df, max_dist=2).collect()}
    assert got == plain
    # and with the probe armed: the budget is judged at CLASS grain, so
    # a duplicate-heavy corpus fits a budget its row grain never could
    distinct = sorted({_norm(s) for _, s in rows})
    cls_vol = fuzzy.estimate_blocking_volume(
        spark.createDataFrame(list(enumerate(distinct)),
                              ["doc_id", "text"]), max_dist=2)
    got2 = {(r["id_a"], r["id_b"]): r["dist"] for r in
            fuzzy.fuzzy_duplicates(df, max_dist=2, collapse_exact=True,
                                   max_candidates=cls_vol["total"]).collect()}
    assert got2 == want


def test_join_probe_and_auto_q(spark):
    """ADVICE r08: fuzzy_join carries the same fail-fast volume probe
    as fuzzy_duplicates (cross-frame law: sum of df_l*df_r + short
    cross product)."""
    import hashlib
    left = spark.createDataFrame(
        [(i, hashlib.md5(str(i).encode()).hexdigest())
         for i in range(200)], ["rid", "text"])
    right = spark.createDataFrame(
        [(i, hashlib.md5(str(i + 500).encode()).hexdigest())
         for i in range(200)], ["cid", "text"])
    v3 = fuzzy.estimate_join_volume(left, right, "text", left_id="rid",
                                    right_id="cid", q=3, max_dist=1)
    v5 = fuzzy.estimate_join_volume(left, right, "text", left_id="rid",
                                    right_id="cid", q=5, max_dist=1)
    assert v5["blocked_pairs"] < v3["blocked_pairs"]
    assert v3["total"] == v3["blocked_pairs"] + v3["short_pairs"]
    # hopeless budget fails fast with measured volumes
    with pytest.raises(ValueError, match="blocking volume exceeds"):
        fuzzy.fuzzy_join(left, right, "text", left_id="rid",
                         right_id="cid", max_dist=1, max_candidates=1)
    # auto_q escalates to q=5 inside the v3-1 budget and stays correct
    got = fuzzy.fuzzy_join(left, right, "text", left_id="rid",
                           right_id="cid", max_dist=1,
                           max_candidates=v3["total"] - 1, auto_q=True)
    assert got.count() == 0
    with pytest.raises(ValueError, match="auto_q requires"):
        fuzzy.fuzzy_join(left, right, "text", auto_q=True)


def test_join_collapse_exact_matches_plain(spark):
    canon = [(100, "New York"), (200, "new  york"), (300, "Chicago")]
    dirty = [(1, "new york"), (2, "NEW YORK"), (3, "Chicagoo"),
             (4, "Houston")]
    cdf = spark.createDataFrame(canon, ["cid", "text"])
    ddf = spark.createDataFrame(dirty, ["rid", "text"])
    plain = {(r["rid"], r["cid"]): r["dist"] for r in
             fuzzy.fuzzy_join(ddf, cdf, "text", left_id="rid",
                              right_id="cid", max_dist=2).collect()}
    coll = {(r["rid"], r["cid"]): r["dist"] for r in
            fuzzy.fuzzy_join(ddf, cdf, "text", left_id="rid",
                             right_id="cid", max_dist=2,
                             collapse_exact=True).collect()}
    assert coll == plain
    assert coll[(1, 100)] == 0 and coll[(2, 200)] == 0
    assert coll[(3, 300)] == 1 and not any(r == 4 for r, _ in coll)


def test_qgram_counts_default_q_matches_module_convention(spark):
    """ADVICE r08: qgram_counts defaulted to q=1 while everything else
    defaults to q=3 — a caller relying on the default silently got
    unigrams, the weakest blocking keys."""
    from pyspark.sql import functions as F
    df = spark.createDataFrame([("abc",)], ["s"])
    got = df.select(fuzzy.qgram_counts("s").alias("g")).first()["g"]
    grams = sorted(p["gram"] for p in got)
    assert all(len(g) == 3 for g in grams)    # trigrams, not unigrams
    want = df.select(fuzzy.qgram_counts("s", 3).alias("g")).first()["g"]
    assert got == want


def _pair_grain_stats(pairs):
    """Reference: compute linkage_stats' contract directly from the
    materialized (id_a, id_b, dist) pair set + a norm-length map."""
    M1, M2 = 2147483647, 1000000007
    C1, C2 = 1000003, 7919
    agg = {}
    for a, b, d, ls in pairs:
        key = (d, ls)
        n, c1, c2 = agg.get(key, (0, 0, 0))
        agg[key] = (n + 1,
                    (c1 + (a * C1) % M1 + (b * C1) % M1) % M1,
                    (c2 + (a * C2) % M2 + (b * C2) % M2) % M2)
    return agg


def test_linkage_stats_matches_pair_grain(spark):
    """VERDICT r09 #2: linkage_stats must equal the per-(dist, len_sum)
    count + dual-checksum rollup of fuzzy_duplicates(collapse_exact) —
    computed here at pair grain from the materialized pair set —
    including duplicate-heavy classes (intra dist-0 pairs), near pairs,
    and singletons."""
    rows = [(1, "alpha beta"), (2, "ALPHA  beta"), (7, "alpha beta"),
            (3, "alpha betA"),      # dist 1 from the class above
            (4, "gamma"), (5, "gamm"), (6, "delta"),
            (9, "unrelated string here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    lens = {i: len(norm(s)) for i, s in rows}
    pairs = [(r["id_a"], r["id_b"], r["dist"],
              lens[r["id_a"]] + lens[r["id_b"]])
             for r in fuzzy.fuzzy_duplicates(
                 df, max_dist=2, collapse_exact=True).collect()]
    want = _pair_grain_stats(pairs)
    got = {(r["dist"], r["len_sum"]): (r["n_pairs"], r["chk1"], r["chk2"])
           for r in fuzzy.linkage_stats(df, max_dist=2).collect()}
    assert got == want
    assert any(d == 0 for d, _ in got)        # intra-class pairs present
    assert any(d > 0 for d, _ in got)         # cross-class pairs present


def test_linkage_stats_probe_knobs(spark):
    """max_candidates / auto_q wire through to the string-grain probe."""
    rows = [(i, f"name {i % 3}") for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = fuzzy.linkage_stats(df, max_dist=1, max_candidates=100,
                              auto_q=True).collect()
    # the 3 classes are all within dist 1 of each other: every cross pair
    # matches too, so the full C(30,2) pair set is covered
    assert sum(r["n_pairs"] for r in got) == 30 * 29 // 2
    assert {r["dist"] for r in got} == {0, 1}
    with pytest.raises(ValueError, match="auto_q requires"):
        fuzzy.linkage_stats(df, auto_q=True)
