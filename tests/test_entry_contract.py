"""Driver-contract regression net: the whole `__spark_entry__` surface —
entry(), every queries() entry, and every oracle_sql() twin — runs inside
pytest at sf0.001, using the same comparator as scripts/oracle_check.py.

The external twin-runner (and the driver) compare at sf0.01; this keeps a
broken query or a drifted oracle from surviving `pytest -q` even when the
script isn't run.
"""

import importlib.util
import os
import sys

import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import __spark_entry__ as entrymod

_SPEC = importlib.util.spec_from_file_location(
    "oracle_check", os.path.join(_ROOT, "scripts", "oracle_check.py"))
oracle_check = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(oracle_check)

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_stable_frame(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["l_returnflag", "l_linestatus", "price_amount_sum",
                          "price_num_items", "price_amount_avg", "qty_sum"]


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    assert not (set(qs) - set(os_)), "every query should carry an oracle"


def test_certification_window_invariants():
    """The driver checks the FIRST 50 queries() entries (insertion order) —
    README 'Certification schedule'. Guard the schedule: every entry of
    _CERT_FIRST (never-certified / touched-this-round) must sit inside the
    window, _CERT_REFRESH (old certs re-run for freshness) fills the
    window's free slots, anything past position 50 must be refresh-spill or
    _CERT_TAIL (both manifest-guarded), and the declared names must be
    unique, disjoint across lists, and fully oracled."""
    qs = entrymod.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    window = set(names[:50])
    assert set(entrymod._CERT_FIRST) <= window, \
        "a never-certified gate fell outside the driver's 50-query window"
    pending = [n for n in names if n in set(entrymod._CERT_PENDING)]
    refresh = [n for n in names if n in set(entrymod._CERT_REFRESH)]
    tail_names = [n for n in names if n in set(entrymod._CERT_TAIL)]
    n_spill = max(0, len(entrymod._CERT_FIRST) + len(pending)
                  + len(refresh) - 50)
    spill = refresh[len(refresh) - n_spill:] if n_spill else []
    assert names[50:] == spill + tail_names, \
        "post-window order must be refresh-spill then _CERT_TAIL"
    # the lists must PARTITION the declared set exactly: an unlisted query
    # would land in the mid-section — maybe outside the window, never
    # driver-certified AND invisible to the manifest tail check
    head, tail = set(entrymod._CERT_FIRST), set(entrymod._CERT_TAIL)
    pend = set(entrymod._CERT_PENDING)
    refr = set(entrymod._CERT_REFRESH)
    lists = [head, pend, refr, tail]
    for i, a in enumerate(lists):
        for b in lists[i + 1:]:
            assert not (a & b), "a query cannot be in two schedule lists"
    orphans = set(names) - head - tail - pend - refr
    assert not orphans, \
        f"queries missing from the certification schedule: {sorted(orphans)}"
    assert len(head) + len(pend) + len(refr) >= 50, \
        "window underfilled: grow _CERT_REFRESH to spend all 50 driver slots"


@pytest.mark.slow  # the 151-gate sweep — duplicated by scripts/oracle_check.py
def test_all_declared_queries_match_oracles_at_sf0001(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = oracle_check.duck_con(SF_DIR)
    failures = []
    for name, fn in sorted(qs.items()):
        ok, msg = oracle_check.compare_one(spark, con, SF_DIR, name, fn,
                                           oracles.get(name))
        if not ok:
            failures.append(msg)
    assert not failures, "\n".join(failures)


# One cheap gate per engine family: the default (not-slow) suite keeps a
# cross-surface oracle smoke even though the full 151-gate sweep moved
# behind the slow marker (VERDICT r14 #2 — the driver's pytest window).
_SMOKE_GATES = [
    "q06_aggregate_summary",      # query/cuts/model stack
    "e09_journal_id",             # etl/coverage stack
    "x07_text_metrics",           # text
    "x27_winnow_fingerprints",    # winnowing / kgram
    "x30_hash_split",             # packing (narrowed-DEPS band)
    "x54_unigram_logprob",        # lm
    "x73_dsir_weights",           # dsir
    "x96_txn_delete",             # transactional store
]


def test_declared_query_smoke_subset_at_sf0001(spark):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = oracle_check.duck_con(SF_DIR)
    failures = []
    for name in _SMOKE_GATES:
        ok, msg = oracle_check.compare_one(spark, con, SF_DIR, name,
                                           qs[name], oracles.get(name))
        if not ok:
            failures.append(msg)
    assert not failures, "\n".join(failures)


def test_cert_tail_code_unchanged_since_manifest():
    """The tail premise, enforced (VERDICT r04 item 4): a _CERT_TAIL query
    sits outside the driver's 50-query window ONLY because its code is
    unchanged since the round that certified it. tests/cert_manifest.json
    records, per gate: sha256 of the callable source, its oracle SQL, the
    harness module's shared constants, and every engine module it executes
    through. Any drift here fails — rotate the query into _CERT_FIRST and
    regenerate the manifest (scripts/cert_manifest.py)."""
    import hashlib
    import inspect
    import json

    spec = importlib.util.spec_from_file_location(
        "cert_manifest", os.path.join(_ROOT, "scripts", "cert_manifest.py"))
    cm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cm)

    with open(os.path.join(_ROOT, "tests", "cert_manifest.json")) as f:
        manifest = json.load(f)

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    problems = []
    for name in list(entrymod._CERT_TAIL) + list(entrymod._CERT_REFRESH):
        rec = manifest["queries"].get(name)
        if rec is None:
            problems.append(f"{name}: not in cert_manifest.json")
            continue
        fn = qs[name]
        src = hashlib.sha256(inspect.getsource(fn).encode()).hexdigest()
        if src != rec["src"]:
            problems.append(f"{name}: gate callable source changed")
        osha = hashlib.sha256(oracles.get(name, "").encode()).hexdigest()
        if osha != rec["oracle"]:
            problems.append(f"{name}: oracle SQL changed")
        if cm._const_sha(inspect.getmodule(fn)) != rec["consts"]:
            problems.append(f"{name}: harness shared constants changed")
        for mod in rec["deps"]:
            if cm._sha_file(mod) != manifest["modules"][mod]:
                problems.append(f"{name}: engine module {mod} changed")
    assert not problems, (
        "tail queries must be rotated into _CERT_FIRST (and the manifest "
        "regenerated) when their code changes:\n" + "\n".join(problems))


def test_cert_manifest_regen_refuses_unrotated_drift():
    """VERDICT r11 #2 (the additive-change loophole, closed): regenerating
    the manifest while a guarded gate's engine dep / source / oracle hash
    drifted must refuse — rotation into _CERT_FIRST is the only path. The
    violation detector is exercised against synthetic drift of each class;
    a clean rebuild against the committed manifest reports none."""
    import json

    spec = importlib.util.spec_from_file_location(
        "cert_manifest", os.path.join(_ROOT, "scripts", "cert_manifest.py"))
    cm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cm)
    with open(os.path.join(_ROOT, "tests", "cert_manifest.json")) as f:
        committed = json.load(f)
    fresh = cm.build_manifest()
    assert cm.rotation_violations(fresh, committed) == []
    guarded = entrymod._CERT_TAIL[0]
    # class 1: an engine-module dep drifts (the r11 lm.py/zorder.py shape)
    drift = json.loads(json.dumps(committed))
    mod = fresh["queries"][guarded]["deps"][0]
    drift["modules"][mod] = "0" * 64
    bad = cm.rotation_violations(fresh, drift)
    assert any(guarded in b and mod in b for b in bad)
    # class 2: the gate callable's own source drifts
    drift = json.loads(json.dumps(committed))
    drift["queries"][guarded]["src"] = "0" * 64
    assert any(guarded in b and "src" in b
               for b in cm.rotation_violations(fresh, drift))
    # class 3: a guarded gate with no committed record at all
    drift = json.loads(json.dumps(committed))
    del drift["queries"][guarded]
    assert any(guarded in b for b in cm.rotation_violations(fresh, drift))
    # class 4 (ADVICE r12): the deps LIST drifted — e.g. the gate gained a
    # new engine-module import absent from the certifying round's manifest
    drift = json.loads(json.dumps(committed))
    drift["queries"][guarded]["deps"] = (
        committed["queries"][guarded]["deps"][1:])
    assert any(guarded in b and "dependency list" in b
               for b in cm.rotation_violations(fresh, drift))
    # class 5 (ADVICE r12): a dep module with no hash in the committed
    # manifest's modules map counts as drift, not a silent pass
    drift = json.loads(json.dumps(committed))
    mod = fresh["queries"][guarded]["deps"][0]
    del drift["modules"][mod]
    bad = cm.rotation_violations(fresh, drift)
    assert any(guarded in b and "no hash" in b for b in bad)


def test_narrowed_deps_gates_stay_text_free():
    """r15 DEPS narrowing guard: x30/x39/x43/x48/x57 list packing.py /
    mixture.py WITHOUT text.py because their execution closure —
    packing.hash_split, stratified_sample, deterministic_shuffle,
    rebalance_mixture, mixture_fractions, _md5_bucket and
    mixture.temperature_resample, plus the five gate callables — never
    references the text module (text.py reaches packing.py only through
    pack_sequences/pack_summary's text.token_count default, the x29
    path). Pin that closure at source level: if any of these functions
    gains a text reference, this fails until the DEPS entries are
    re-broadened and the gates rotated into _CERT_FIRST."""
    import inspect

    from openapc_olap_spark.operators import mixture, packing

    closure = [packing.hash_split, packing.stratified_sample,
               packing.deterministic_shuffle, packing.rebalance_mixture,
               packing.mixture_fractions, packing._md5_bucket,
               mixture.temperature_resample]
    qs = entrymod.queries()
    closure += [qs[n] for n in
                ["x30_hash_split", "x39_stratified_sample",
                 "x43_deterministic_shuffle", "x48_rebalance_mixture",
                 "x57_temperature_resample"]]
    for fn in closure:
        src = inspect.getsource(fn)
        assert "text." not in src and "import text" not in src, (
            f"{fn.__qualname__} now references the text module — "
            f"re-broaden the narrowed DEPS entries in "
            f"scripts/cert_manifest.py and rotate the five gates")


def test_cert_manifest_covers_every_gate():
    """Every declared gate has a manifest record and a dependency mapping,
    so a future tail rotation can never silently lack coverage."""
    import json

    spec = importlib.util.spec_from_file_location(
        "cert_manifest", os.path.join(_ROOT, "scripts", "cert_manifest.py"))
    cm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cm)
    with open(os.path.join(_ROOT, "tests", "cert_manifest.json")) as f:
        manifest = json.load(f)
    for name in entrymod.queries():
        assert name in manifest["queries"], f"{name}: regenerate manifest"
        assert cm.deps_for(name), name
