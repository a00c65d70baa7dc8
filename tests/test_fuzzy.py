"""Fuzzy matching (operators/fuzzy.py) vs a pure-Python blocked
edit-distance reference with the same q-gram blocking + count bound."""

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


def _py_lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_pairs(rows, max_dist, q=3):
    import re

    def norm(s):
        return re.sub(r"\s+", " ", s.lower()).strip()

    def grams(s):
        s = norm(s)
        if len(s) <= q:
            return {s}
        return {s[i:i + q] for i in range(len(s) - q + 1)}

    out = {}
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            a, b = (ia, sa), (ib, sb)
            if ia > ib:
                a, b = b, a
            na, nb = norm(a[1]), norm(b[1])
            shared = len(grams(a[1]) & grams(b[1]))
            bound = max(max(len(na), len(nb)) - (q - 1) - max_dist * q, 1)
            if shared >= bound:
                d = _py_lev(na, nb)
                if d <= max_dist:
                    out[(a[0], b[0])] = d
    return out


@pytest.fixture(scope="module")
def names_df(spark):
    return spark.createDataFrame(NAMES, ["doc_id", "text"]).repartition(3)


def test_self_pairs_match_python(spark, names_df):
    for k in (0, 1, 2, 3):
        got = {(r["id_a"], r["id_b"]): r["dist"] for r in
               fuzzy.fuzzy_duplicates(names_df, max_dist=k).collect()}
        assert got == _py_pairs(NAMES, k), f"max_dist {k}"
    # the expected structure at k=2: case/space variants + single subs
    got2 = {(r["id_a"], r["id_b"]): r["dist"] for r in
            fuzzy.fuzzy_duplicates(names_df, max_dist=2).collect()}
    assert got2[(1, 2)] == 0 and got2[(1, 3)] == 1 and got2[(7, 8)] == 1
    assert got2[(5, 6)] == 2
    assert not any(9 in p for p in got2)


def test_two_frame_join(spark):
    canon = spark.createDataFrame(
        [(100, "New York"), (200, "Los Angeles"), (300, "Chicago")],
        ["cid", "text"])
    dirty = spark.createDataFrame(
        [(1, "new  york"), (2, "Los Angelos"), (3, "Chicagoo"),
         (4, "Houston")],
        ["rid", "text"])
    got = {(r["rid"], r["cid"]): r["dist"] for r in
           fuzzy.fuzzy_join(dirty, canon, "text", left_id="rid",
                            right_id="cid", max_dist=2).collect()}
    assert got == {(1, 100): 0, (2, 200): 1, (3, 300): 1}


def test_gram_cap_and_validation(spark, names_df):
    # an absurd cap of 1 kills every shared gram -> no candidates
    assert fuzzy.fuzzy_duplicates(names_df, max_dist=2,
                                  gram_cap=1).count() == 0
    with pytest.raises(ValueError):
        fuzzy.fuzzy_duplicates(names_df, max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy.fuzzy_duplicates(names_df, q=0)
