"""Randomized DML-sequence model test for the transactional store: a
TxnTable driven through a seeded random sequence of upsert / append /
delete / merge / compact commits must, at every committed version,

- match a driver-side dict model (current read),
- time-travel to any retained version's model snapshot,
- emit a keyed CDF (read_changes v-1 -> v) equal to the model's
  per-version diff (insert / update_postimage / delete classes), and
- converge a replicate_keyed_cdf replica seeded at v0 to the final
  state.

One seeded sequence, one Spark session — the randomized-coverage
complement to the targeted tests in test_txn.py / test_txn_stream.py.
"""

import random

from pyspark.sql import functions as F

from openapc_olap_spark.sources import txn
from openapc_olap_spark.sources.txn import TxnTable

NB = 4
VALS = ["red", "blue", "green", "amber"]


def _df(spark, rows):
    return txn.add_bucket(
        spark.createDataFrame(rows, "k string, seq long, val string"),
        ["k"], NB)


def _state(t):
    return {r["k"]: (r["seq"], r["val"]) for r in
            t.read().select("k", "seq", "val").collect()}


def _diff(prev, cur, preimages=False):
    """The keyed change classes read_changes must emit for prev -> cur;
    with ``preimages`` the update_preimage class (OLD row of every
    updated key) joins the expectation."""
    out = set()
    for k, row in cur.items():
        if k not in prev:
            out.add(("insert", k, *row))
        elif prev[k] != row:
            out.add(("update_postimage", k, *row))
            if preimages:
                out.add(("update_preimage", k, *prev[k]))
    for k, row in prev.items():
        if k not in cur:
            out.add(("delete", k, *row))
    return out


def test_random_dml_sequence_matches_model(spark, tmp_path):
    rng = random.Random(1307)
    pool = [f"k{i:02d}" for i in range(30)]
    fresh = [f"n{i:02d}" for i in range(40)]   # append-only new keys

    model = {k: (0, rng.choice(VALS)) for k in rng.sample(pool, 10)}
    t = TxnTable.create(
        spark, str(tmp_path / "t"),
        _df(spark, [(k, s, v) for k, (s, v) in model.items()]),
        "bucket", meta={"n_buckets": NB})
    history = {0: dict(model)}
    seq = 0

    for _step in range(12):
        seq += 1
        op = rng.choice(["upsert", "upsert", "delete", "append",
                         "merge", "compact"])
        if op == "compact":
            t.compact()
            # a layout commit: no row changes
            history[t.version()] = dict(model)
            continue
        if op == "append":
            ks = [fresh.pop() for _ in range(rng.randint(1, 3))]
            rows = [(k, seq, rng.choice(VALS)) for k in ks]
            t.append(_df(spark, rows))
            for k, s, v in rows:
                assert k not in model
                model[k] = (s, v)
        elif op == "delete":
            color = rng.choice(VALS)
            t.delete(f"val = '{color}'")
            model = {k: r for k, r in model.items() if r[1] != color}
        elif op == "upsert":
            ks = rng.sample(pool, rng.randint(1, 5))
            rows = [(k, seq, rng.choice(VALS)) for k in ks]
            t.upsert(_df(spark, rows), ["k"], "seq")
            for k, s, v in rows:
                model[k] = (s, v)
        else:  # merge with a matched-delete clause
            ks = set(rng.sample(pool + sorted(model), rng.randint(1, 4)))
            rows = [(k, seq, rng.choice(VALS + ["DROP"])) for k in ks]
            t.merge(_df(spark, rows), ["k"], "seq",
                    matched_delete="s.val = 'DROP'")
            pre = dict(model)
            for k, s, v in rows:
                if v == "DROP" and k in pre:
                    del model[k]            # WHEN MATCHED AND ... DELETE
                else:
                    model[k] = (s, v)       # update, or insert (a DROP
                    # row on an UNMATCHED key inserts — matched_delete
                    # applies to matched pairs only, SQL MERGE semantics)
        history[t.version()] = dict(model)
        assert _state(t) == model, f"divergence after {op} at v{t.version()}"

    final_v = t.version()
    assert set(history) == set(range(final_v + 1))

    # time travel to every retained version
    for v in (0, final_v // 2, final_v - 1, final_v):
        got = {r["k"]: (r["seq"], r["val"]) for r in
               t.read(version=v).select("k", "seq", "val").collect()}
        assert got == history[v], f"time travel to v{v} diverged"

    # keyed CDF per version == model diff (preimage-complete: the
    # update_preimage class must cover exactly the updated keys' OLD
    # rows — the retraction input maintain_aggregate consumes)
    for v in range(1, final_v + 1):
        ch = t.read_changes(v - 1, v, keys=["k"],
                            include_preimages=True)
        got = {(r["_change_type"], r["k"], r["seq"], r["val"])
               for r in ch.select("_change_type", "k", "seq",
                                  "val").collect()}
        assert got == _diff(history[v - 1], history[v],
                            preimages=True), f"CDF at v{v}"

    # a replica seeded at v0 converges to the final state
    from openapc_olap_spark.sources.txn_stream import (
        VERSION_COL,
        replicate_keyed_cdf,
    )
    seed = t.read(version=0).withColumn(VERSION_COL,
                                        F.lit(0).cast("long"))
    dst = TxnTable.create(spark, str(tmp_path / "replica"), seed,
                          "bucket", meta={"n_buckets": NB})
    q = replicate_keyed_cdf(spark, t.path, ["k"], dst,
                            checkpoint_dir=str(tmp_path / "ckpt"),
                            n_buckets=NB)
    q.awaitTermination()
    got = {r["k"]: (r["seq"], r["val"]) for r in
           dst.read().select("k", "seq", "val").collect()}
    assert got == history[final_v]

    # a FILTERED replica (where val <> 'red') converges too — random
    # value updates cross the predicate boundary in both directions,
    # color deletes remove passing and non-passing keys alike
    fdst = TxnTable.create(
        spark, str(tmp_path / "filtered"),
        t.read(version=0).filter("val <> 'red'")
        .withColumn(VERSION_COL, F.lit(0).cast("long")),
        "bucket", meta={"n_buckets": NB})
    q = replicate_keyed_cdf(spark, t.path, ["k"], fdst,
                            checkpoint_dir=str(tmp_path / "fckpt"),
                            n_buckets=NB, where="val <> 'red'")
    q.awaitTermination()
    got = {r["k"]: (r["seq"], r["val"]) for r in
           fdst.read().select("k", "seq", "val").collect()}
    assert got == {k: r for k, r in history[final_v].items()
                   if r[1] != "red"}

    # a maintained aggregate (grouped on val, so every value update is a
    # group-crossing retraction and every color delete empties groups)
    # seeded at v0 converges to the final state's from-scratch aggregate
    from openapc_olap_spark.sources.txn_stream import (
        maintain_aggregate,
        read_aggregate,
        seed_aggregate,
    )
    aggs = {"n": ("count", "*"), "seq_sum": ("sum", "seq")}
    adst = seed_aggregate(spark, t.read(version=0), ["val"], aggs,
                          str(tmp_path / "agg"), NB, version=0)
    q = maintain_aggregate(spark, t.path, ["k"], ["val"], aggs, adst,
                           checkpoint_dir=str(tmp_path / "agg_ckpt"),
                           n_buckets=NB)
    q.awaitTermination()

    def _agg_state():
        return {(r["val"], r["n"], r["seq_sum"]) for r in
                read_aggregate(adst, ["val"], aggs).collect()}

    exp: dict = {}
    for _k, (s, v) in history[final_v].items():
        n, ss = exp.get(v, (0, 0))
        exp[v] = (n + 1, ss + s)
    want = {(v, n, ss) for v, (n, ss) in exp.items()}
    assert _agg_state() == want
    assert int(adst.snapshot()["meta"]["agg_watermark"]) == final_v
    # an idle re-drain (no new commits) is a strict no-op
    v_dst = adst.version()
    q = maintain_aggregate(spark, t.path, ["k"], ["val"], aggs, adst,
                           checkpoint_dir=str(tmp_path / "agg_ckpt"),
                           n_buckets=NB)
    q.awaitTermination()
    assert adst.version() == v_dst and _agg_state() == want
