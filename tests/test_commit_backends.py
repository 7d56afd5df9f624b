"""Commit-backend seam: POSIX-rename vs CAS manifest-pointer publication,
compaction crash windows, and the single-writer fence.

The storage layer's exactly-once claims previously held only on
rename-atomic filesystems (SCALING.md documented the object-store gap);
these tests pin the adapter that closes it: every FreqTable/AggState
transaction funnels through ``commit.CommitBackend``, the CAS backend
never renames, a racing writer loses LOUDLY (CommitConflict), and a fenced
writer fails LOUDLY (WriterFenced) instead of interleaving commits."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import types as T

from incresql_spark import commit
from incresql_spark.commit import (
    CasPointerCommitBackend,
    CommitConflict,
    RenameCommitBackend,
    WriterFence,
    WriterFenced,
)
from incresql_spark.frequency import FreqTable
from incresql_spark.materialize import AggState


def _schema():
    return T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("v", T.StringType()),
    ])


def test_backend_for_reads_session_conf(spark):
    assert isinstance(commit.backend_for(spark), RenameCommitBackend)
    spark.conf.set(commit.BACKEND_CONF, "cas")
    try:
        assert isinstance(commit.backend_for(spark), CasPointerCommitBackend)
        with pytest.raises(ValueError, match="unknown"):
            spark.conf.set(commit.BACKEND_CONF, "s4")
            commit.backend_for(spark)
    finally:
        spark.conf.unset(commit.BACKEND_CONF)


def test_cas_freqtable_full_lifecycle_without_rename(spark, tmp_path, monkeypatch):
    """The whole FreqTable lifecycle (insert, delete, compact, delta,
    point-in-time scan) through the CAS backend — with os.rename/os.replace
    forbidden for the duration, proving no commit path still depends on
    rename atomicity."""
    t = FreqTable(spark, str(tmp_path / "cas_t"),
                  backend=CasPointerCommitBackend())
    t.create(_schema())

    def _no_rename(*a, **k):
        raise AssertionError("CAS backend must never rename")

    monkeypatch.setattr(os, "rename", _no_rename)
    monkeypatch.setattr(os, "replace", _no_rename)
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], _schema()), ts_ms=1000)
    t.insert(spark.createDataFrame([(3, "c")], _schema()), ts_ms=2000)
    assert sorted((r.k, r.v) for r in t.scan().collect()) == [
        (1, "a"), (2, "b"), (3, "c")]
    assert sorted(r.k for r in t.scan(as_of_ms=1000).collect()) == [1, 2]
    t.delete_where("k = 2")
    assert sorted(r.k for r in t.scan().collect()) == [1, 3]
    t.compact()
    assert sorted(r.k for r in t.scan().collect()) == [1, 3]
    # exactly one live segment, committed via its marker object
    [seg] = t._segments()
    assert os.path.exists(os.path.join(seg["dir"], "_segmeta.json"))
    # post-compaction delta from the head cursor is empty, as usual
    assert t.delta(seg["seq"]).count() == 0


def test_cas_unsealed_segment_is_invisible_then_reclaimed(spark, tmp_path):
    """Under CAS, parquet lands at the final key BEFORE the marker PUT; a
    crash in between leaves an unmarked seg dir that must be invisible to
    readers and reclaimed by the next write."""
    t = FreqTable(spark, str(tmp_path / "cas_crash"),
                  backend=CasPointerCommitBackend())
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a")], _schema()))
    # simulate the crash: data files under a final seg name, no marker;
    # backdate the mtime past the orphan grace window so GC may reclaim it
    orphan = os.path.join(t.path, "seg-1000-deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as fh:
        fh.write(b"not really parquet")
    os.utime(orphan, (1000, 1000))
    assert [r.k for r in t.scan().collect()] == [1]  # invisible, not fatal
    t.insert(spark.createDataFrame([(2, "b")], _schema()))
    assert not os.path.isdir(orphan), "stale unsealed segment not reclaimed"
    assert sorted(r.k for r in t.scan().collect()) == [1, 2]


def test_compact_publishes_before_deleting_inputs(spark, tmp_path, monkeypatch):
    """Crash-ordering of compaction: the merged segment is sealed BEFORE
    the input segments are deleted.  A crash in between leaves inputs
    subsumed (span-covered) — readers must NOT double-count them, and the
    next compact reclaims the leftovers.  The pre-round-11 order (delete
    inputs, then publish) lost the whole table in this window."""
    import incresql_spark.frequency as freq_mod

    t = FreqTable(spark, str(tmp_path / "cmp"))
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], _schema()), ts_ms=1000)
    t.insert(spark.createDataFrame([(2, "b"), (3, "c")], _schema()), ts_ms=2000)

    real_rmtree = shutil.rmtree

    def crashing_rmtree(*a, **k):
        raise RuntimeError("simulated crash before input deletion")

    monkeypatch.setattr(freq_mod.shutil, "rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="simulated crash"):
        t.compact()
    monkeypatch.setattr(freq_mod.shutil, "rmtree", real_rmtree)

    # merged + both inputs coexist on disk, but reads see each row once
    seg_dirs = [n for n in os.listdir(t.path) if n.startswith("seg-")]
    assert len(seg_dirs) == 3
    got = sorted((r.k, r.v) for r in t.scan().collect())
    assert got == [(1, "a"), (2, "b"), (2, "b"), (3, "c")]
    # (2,'b') appears twice because it was inserted twice — multiset
    # semantics — NOT because the subsumed inputs leak through; prove it
    # by frequency: k=2 carries total freq 2, not 4
    unexp = {r["k"]: r["__freq"] for r in t.scan(expand=False).collect()}
    assert unexp == {1: 1, 2: 2, 3: 1}
    # the next compact reclaims the subsumed leftovers
    t.compact()
    seg_dirs = [n for n in os.listdir(t.path) if n.startswith("seg-")]
    assert len(seg_dirs) == 1
    assert sorted(r.k for r in t.scan().collect()) == [1, 2, 2, 3]


def test_cas_manifest_contention_loser_fails_loudly(tmp_path):
    """Two writers CAS the same manifest version: exactly one wins; the
    loser raises CommitConflict and its manifest object is removed — the
    committed state is byte-for-byte the winner's."""
    b = CasPointerCommitBackend()
    path = str(tmp_path / "state")
    os.makedirs(path)
    b.publish_manifest(path, 0, {"version": 0, "who": "A"})
    with pytest.raises(CommitConflict, match="committed by another writer"):
        b.publish_manifest(path, 0, {"version": 0, "who": "B"})
    assert b.load_manifest(path)["who"] == "A"
    # the loser's orphan object was cleaned up
    mobjs = [f for f in os.listdir(path) if f.startswith("mobj-")]
    assert len(mobjs) == 1
    # the winner continues normally at the next version
    b.publish_manifest(path, 1, {"version": 1, "who": "A"})
    assert b.load_manifest(path)["version"] == 1


def test_cas_aggstate_two_writer_contention(spark, tmp_path):
    """End-to-end AggState race under CAS: writer B loses the pointer CAS
    to writer A (who lands the same version first), B's write_buckets
    raises CommitConflict, and the state serves exactly A's commit."""
    path = str(tmp_path / "agg")
    key_schema = "k INT, cnt BIGINT"

    a = AggState(spark, path, num_buckets=4, backend=CasPointerCommitBackend())
    b = AggState(spark, path, num_buckets=4, backend=CasPointerCommitBackend())

    df_a = spark.createDataFrame([(1, 10), (2, 20)], key_schema)
    df_b = spark.createDataFrame([(1, 99)], key_schema)
    touched = list(range(4))

    orig = b.backend.publish_manifest

    def racing_publish(state_path, version, payload, fence_epoch=None):
        # the rival writer commits the same version a moment earlier
        a.write_buckets(df_a, ["k"], touched)
        orig(state_path, version, payload, fence_epoch=fence_epoch)

    b.backend.publish_manifest = racing_publish
    with pytest.raises(CommitConflict):
        b.write_buckets(df_b, ["k"], touched)

    got = sorted((r.k, r.cnt) for r in a.read().collect())
    assert got == [(1, 10), (2, 20)], "state must be exactly the winner's"
    # and the loser can retry from the fresh manifest like any writer
    b.backend.publish_manifest = orig
    merged = spark.createDataFrame([(1, 109), (2, 20)], key_schema)
    b.write_buckets(merged, ["k"], touched)
    got = sorted((r.k, r.cnt) for r in b.read().collect())
    assert got == [(1, 109), (2, 20)]


def test_cas_aggstate_lifecycle_and_retention(spark, tmp_path):
    """AggState through CAS: versions advance via the pointer, old
    generations are retired, reads always serve the committed manifest."""
    st = AggState(spark, str(tmp_path / "life"), num_buckets=4,
                  backend=CasPointerCommitBackend())
    sch = "k INT, cnt BIGINT"
    st.write_buckets(spark.createDataFrame([(1, 1)], sch), ["k"],
                     list(range(4)), extra={"cursor": 7})
    st.write_buckets(spark.createDataFrame([(1, 2), (5, 1)], sch), ["k"],
                     list(range(4)))
    st.write_buckets(spark.createDataFrame([(1, 3), (5, 1), (9, 4)], sch),
                     ["k"], list(range(4)))
    m = st._load_manifest()
    assert m["version"] == 2
    assert m["cursor"] == 7, "extras must carry across commits"
    assert sorted((r.k, r.cnt) for r in st.read().collect()) == [
        (1, 3), (5, 1), (9, 4)]
    # retention: at most 2 pointer generations + their objects remain
    assert len(st.backend.manifest_versions(st.path)) <= 2
    mobjs = [f for f in os.listdir(st.path) if f.startswith("mobj-")]
    assert len(mobjs) <= 2


def test_writer_fence_takeover_fails_old_writer_loudly(spark, tmp_path):
    """Two FreqTable writers on one directory: the second acquires the
    fence (takeover — no stale-lock brickage after a crash), after which
    the FIRST writer's next commit raises WriterFenced BEFORE publishing
    anything.  Segment seqs never interleave."""
    path = str(tmp_path / "fenced")
    wa = FreqTable(spark, path)
    wa.create(_schema())
    wa.acquire_writer_fence()
    wa.insert(spark.createDataFrame([(1, "a")], _schema()))

    wb = FreqTable(spark, path)
    wb.acquire_writer_fence()  # takeover
    wb.insert(spark.createDataFrame([(2, "b")], _schema()))

    with pytest.raises(WriterFenced, match="fenced by epoch"):
        wa.insert(spark.createDataFrame([(3, "x")], _schema()))
    with pytest.raises(WriterFenced):
        wa.compact()

    # state holds exactly the fenced-writer's pre-fence row + B's row
    assert sorted(r.k for r in wb.scan().collect()) == [1, 2]
    # seqs strictly increase and never duplicate; takeover fence bumps
    # BURN a slot each (round 13), so gaps are expected, density is not
    seqs = [s["seq"] for s in wb._segments()]
    assert seqs == sorted(seqs) and len(set(seqs)) == len(seqs)


def test_writer_fence_aggstate(spark, tmp_path):
    """Same fence discipline on the AggState commit path."""
    path = str(tmp_path / "fenced_agg")
    sch = "k INT, cnt BIGINT"
    a = AggState(spark, path, num_buckets=2)
    a.acquire_writer_fence()
    a.write_buckets(spark.createDataFrame([(1, 1)], sch), ["k"], [0, 1])

    b = AggState(spark, path, num_buckets=2)
    b.acquire_writer_fence()
    with pytest.raises(WriterFenced):
        a.write_buckets(spark.createDataFrame([(1, 2)], sch), ["k"], [0, 1])
    # the new owner proceeds; state reflects its commit only
    b.write_buckets(spark.createDataFrame([(1, 5)], sch), ["k"], [0, 1])
    assert [(r.k, r.cnt) for r in b.read().collect()] == [(1, 5)]


def test_writer_fence_epoch_acquire_is_exclusive(tmp_path):
    """The epoch create is O_EXCL: racing acquirers get distinct epochs
    and the highest one owns the directory."""
    path = str(tmp_path / "ep")
    os.makedirs(path)
    f1 = WriterFence.acquire(path)
    f2 = WriterFence.acquire(path)
    assert f2.epoch == f1.epoch + 1
    with pytest.raises(WriterFenced):
        f1.check()
    f2.check()  # current owner passes


def test_rename_backend_reclaims_legacy_unmarked_segment(spark, tmp_path):
    """Pre-seam crash garbage (parquet written to a final seg dir, crash
    before _segmeta.json) is invisible and reclaimed under the rename
    backend too."""
    t = FreqTable(spark, str(tmp_path / "legacy"))
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a")], _schema()))
    orphan = os.path.join(t.path, "seg-1-cafecafe")
    os.makedirs(orphan)
    assert [r.k for r in t.scan().collect()] == [1]
    t.insert(spark.createDataFrame([(2, "b")], _schema()))
    assert not os.path.isdir(orphan)
    assert sorted(r.k for r in t.scan().collect()) == [1, 2]


def test_engine_end_to_end_on_cas_backend(spark, tmp_path):
    """The WHOLE SQL engine on the CAS backend: DDL, inserts, deletes,
    COMPACT, point-in-time-consuming incremental MV refresh — selected
    purely via the session conf, no code changes.  This is the adapter
    completeness check: if any commit path still assumed rename
    atomicity implicitly, the engine (whose tables/state all construct
    their backend from the conf) would diverge or crash here."""
    from incresql_spark.engine import Engine

    spark.conf.set(commit.BACKEND_CONF, "cas")
    try:
        e = Engine(spark, str(tmp_path / "wh_cas"))

        def q(sql):
            return e.execute_statement(sql).pipes()

        e.execute_statement("CREATE TABLE t (k INT, v TEXT)")
        e.execute_statement("INSERT INTO t VALUES (1,'a'),(2,'b'),(2,'b')")
        e.execute_statement("INSERT INTO t VALUES (3,'c')")
        assert q("SELECT k, count(*) AS n FROM t GROUP BY k ORDER BY k") == [
            "|1|1|", "|2|2|", "|3|1|"]
        e.execute_statement("DELETE FROM t WHERE k = 2 LIMIT 1")
        e.execute_statement("COMPACT TABLE t")
        assert q("SELECT k FROM t ORDER BY k") == ["|1|", "|2|", "|3|"]
        # incremental MV over the CAS-backed state
        e.execute_statement(
            "CREATE MATERIALIZED VIEW mv_cas AS "
            "SELECT v, count(*) AS n FROM t GROUP BY v"
        )
        e.execute_statement("INSERT INTO t VALUES (4,'a')")
        e.execute_statement("REFRESH MATERIALIZED VIEW mv_cas")
        assert q("SELECT v, n FROM mv_cas ORDER BY v") == [
            "|a|2|", "|b|1|", "|c|1|"]
        # no rename-backend artifacts anywhere in the warehouse
        for root, _dirs, files in os.walk(str(tmp_path / "wh_cas")):
            for f in files:
                assert not f.startswith("manifest-"), os.path.join(root, f)
    finally:
        spark.conf.unset(commit.BACKEND_CONF)


def test_maintainer_fence_two_instances(spark, tmp_path):
    """Two IncrementalMinHashDedup maintainers pointed at one state dir
    with fence=True: the second instance's acquisition fences the first,
    whose next add_batch raises WriterFenced before touching state."""
    from incresql_spark.streaming.minhash_incremental import (
        IncrementalMinHashDedup,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "an entirely different document about spark and parquet files")],
        "doc_id BIGINT, text STRING",
    )
    path = str(tmp_path / "mh_state")
    m1 = IncrementalMinHashDedup(spark, path, fence=True)
    m1.add_batch(docs)

    m2 = IncrementalMinHashDedup(spark, path, fence=True)  # takeover
    with pytest.raises(WriterFenced):
        m1.add_batch(docs.withColumn("doc_id", docs.doc_id + 10))
    # the new owner operates normally over the state the old one built
    m2.add_batch(docs.withColumn("doc_id", docs.doc_id + 100))


def test_write_json_atomic_crash_leaves_old_file(tmp_path, monkeypatch):
    """Control files (catalogs, schema.json, geometry pins, MV metas) are
    published write-then-rename: a crash mid-write must leave the OLD
    document readable, never a truncated one that bricks every later
    json.load."""
    import json as _json

    target = str(tmp_path / "ctl.json")
    commit.write_json_atomic(target, {"gen": 1})

    real_dump = _json.dump

    def torn_dump(obj, fh, **kw):
        fh.write('{"gen": 2, "tru')  # partial bytes, then the crash
        raise RuntimeError("simulated crash mid-write")

    monkeypatch.setattr(commit.json, "dump", torn_dump)
    with pytest.raises(RuntimeError, match="mid-write"):
        commit.write_json_atomic(target, {"gen": 2})
    monkeypatch.setattr(commit.json, "dump", real_dump)

    with open(target) as fh:
        assert _json.load(fh) == {"gen": 1}
    commit.write_json_atomic(target, {"gen": 3})
    with open(target) as fh:
        assert _json.load(fh) == {"gen": 3}


def test_cas_aggstate_recovers_from_crashed_refresh_leftovers(spark, tmp_path):
    """Crashed-refresh recovery is backend-independent.  Since round 13
    the next commit does not need to reclaim the orphans FIRST (new dirs
    are writer-unique, so no name can collide); it must simply land
    cleanly, and the version-scoped post-commit sweep then reclaims the
    orphans.  Repeat the rename-backend recovery scenario under CAS."""
    path = str(tmp_path / "agg_crash")
    sch = "k INT, cnt BIGINT"
    st = AggState(spark, path, num_buckets=4, backend=CasPointerCommitBackend())
    st.write_buckets(spark.createDataFrame([(1, 1), (2, 2)], sch), ["k"],
                     list(range(4)))
    m = st._load_manifest()
    nxt = m["version"] + 1
    # simulate the crash: uncommitted v-{nxt} under every live bucket plus
    # a leftover stage dir, pointer never advanced
    for b in m["buckets"]:
        d = os.path.join(path, f"b-{b}", f"v-{nxt}")
        os.makedirs(d)
        with open(os.path.join(d, "junk.parquet"), "w") as fh:
            fh.write("crashed")
    os.makedirs(os.path.join(path, f"stage-{nxt}", "__bkt=0"))

    st.write_buckets(spark.createDataFrame([(1, 5), (2, 2)], sch), ["k"],
                     list(range(4)))
    assert sorted((r.k, r.cnt) for r in st.read().collect()) == [(1, 5), (2, 2)]
    assert st._load_manifest()["version"] == nxt


def test_randomized_compact_crash_differential(spark, tmp_path):
    """Randomized history of inserts / deletes / compactions with crashes
    injected at BOTH compaction crash points (before the seal: stage
    garbage only; after the seal, before input deletion: subsumed inputs
    coexist with the merged segment), checked after every step against a
    Python multiset model.  This is the differential that pins the new
    publish-first compaction + span-subsumption reader rule under
    arbitrary interleavings, for both commit backends."""
    import random
    from collections import Counter

    import incresql_spark.frequency as freq_mod

    rng = random.Random(20260815)

    for backend_name, backend in (("rename", RenameCommitBackend()),
                                  ("cas", CasPointerCommitBackend())):
        t = FreqTable(spark, str(tmp_path / f"rand_{backend_name}"),
                      backend=backend)
        t.create(T.StructType([T.StructField("k", T.IntegerType())]))
        model: Counter = Counter()
        ts = 1000

        def check():
            got = Counter(r["k"] for r in t.scan().collect())
            assert got == +model, f"{backend_name}: {got} != {+model}"

        for step in range(14):
            op = rng.choice(["insert", "insert", "delete", "compact",
                             "crash_compact"])
            ts += 1000
            if op == "insert":
                ks = [rng.randrange(6) for _ in range(rng.randrange(1, 4))]
                t.insert(spark.createDataFrame([(k,) for k in ks], "k INT"),
                         ts_ms=ts)
                model.update(ks)
            elif op == "delete":
                k = rng.randrange(6)
                t.delete_where(f"k = {k}")
                model[k] = 0
            elif op == "compact":
                t.compact()
            else:
                if len(t._segments()) < 2:
                    t.compact()  # nothing to merge — no crash point exists
                    check()
                    continue
                # crash inside compact at a random point: the seal itself
                # (stage only published for rename = nothing visible; for
                # CAS the marker never lands = dir invisible), or the
                # input-deletion pass right after the seal
                point = rng.choice(["pre_seal", "post_seal"])
                if point == "pre_seal":
                    orig_seal = t.backend.seal_segment

                    def crash_seal(*a, **kw):
                        raise RuntimeError("crash before seal")

                    t.backend.seal_segment = crash_seal
                    try:
                        with pytest.raises(RuntimeError, match="before seal"):
                            t.compact()
                    except BaseException:
                        t.backend.seal_segment = orig_seal
                        raise
                    t.backend.seal_segment = orig_seal
                else:
                    real_rmtree = shutil.rmtree

                    def crash_rmtree(*a, **kw):
                        raise RuntimeError("crash before input deletion")

                    freq_mod.shutil.rmtree = crash_rmtree
                    try:
                        with pytest.raises(RuntimeError,
                                           match="input deletion"):
                            t.compact()
                    finally:
                        freq_mod.shutil.rmtree = real_rmtree
            check()
        # final compaction converges to one live segment, same contents
        t.compact()
        check()
        assert len(t._segments()) <= 1


def test_writer_fence_composes_with_cas_backend(spark, tmp_path):
    """Fence and CAS are orthogonal and compose: a fenced CAS writer is
    fenced out by a takeover exactly as on the rename backend."""
    path = str(tmp_path / "fenced_cas")
    wa = FreqTable(spark, path, backend=CasPointerCommitBackend())
    wa.create(_schema())
    wa.acquire_writer_fence()
    wa.insert(spark.createDataFrame([(1, "a")], _schema()))
    wb = FreqTable(spark, path, backend=CasPointerCommitBackend())
    wb.acquire_writer_fence()
    with pytest.raises(WriterFenced):
        wa.insert(spark.createDataFrame([(2, "x")], _schema()))
    wb.insert(spark.createDataFrame([(3, "b")], _schema()))
    assert sorted(r.k for r in wb.scan().collect()) == [1, 3]


def test_writer_fence_acquire_races_across_processes(tmp_path):
    """O_EXCL epoch acquisition is race-free across real processes: N
    concurrent acquirers all succeed and receive N distinct epochs."""
    import multiprocessing as mp

    path = str(tmp_path / "mp_fence")
    os.makedirs(path)

    def worker(p, q):
        from incresql_spark.commit import WriterFence

        q.put(WriterFence.acquire(p).epoch)

    ctx = mp.get_context("fork")
    q = ctx.Queue()
    procs = [ctx.Process(target=worker, args=(path, q)) for _ in range(8)]
    for p in procs:
        p.start()
    epochs = [q.get(timeout=30) for _ in procs]
    for p in procs:
        p.join(timeout=30)
    assert sorted(epochs) == list(range(8)), epochs


# --- round 12: flock-atomic guard, marker/retire hardening, dup spans -------
def test_fence_guard_blocks_takeover_until_inflight_commit_finishes(tmp_path):
    """The check-then-publish window is now ATOMIC: a takeover's acquire()
    blocks on the guard's flock until the in-flight commit finishes, and
    the old writer's NEXT commit raises WriterFenced — so no straggler
    commit can ever land after acquire() returns (round-11 verdict task 3;
    previously a descheduled writer could land exactly one)."""
    import threading
    import time as _time

    path = str(tmp_path / "fenced")
    os.makedirs(path)
    old = WriterFence.acquire(path)

    in_window = threading.Event()
    release = threading.Event()
    published = []

    def old_writer_commit():
        with old.guard():
            in_window.set()
            release.wait(timeout=30)
            published.append("old-commit")  # the in-flight publication

    t = threading.Thread(target=old_writer_commit)
    t.start()
    assert in_window.wait(timeout=30)

    acquired = []

    def takeover():
        acquired.append(WriterFence.acquire(path))

    t2 = threading.Thread(target=takeover)
    t2.start()
    t2.join(timeout=0.5)
    # acquire must BLOCK while the old writer's guard holds the flock
    assert t2.is_alive() and not acquired
    assert not published  # and the commit has not completed yet either

    release.set()
    t.join(timeout=30)
    t2.join(timeout=30)
    # in-flight commit finished strictly BEFORE the takeover completed
    assert published == ["old-commit"]
    assert acquired and acquired[0].epoch == old.epoch + 1
    # ... and the fenced writer can never land another commit
    with pytest.raises(WriterFenced):
        with old.guard():
            raise AssertionError("fenced writer re-entered the commit window")


def test_torn_segment_marker_is_invisible_and_reclaimed(spark, tmp_path):
    """A marker that exists but is EMPTY/unparseable (a pre-link-protocol
    writer died between O_EXCL create and the body write) must read as
    uncommitted — skipped by _segments, reclaimed by the next write —
    instead of failing every subsequent scan with JSONDecodeError
    (round-11 advice).  The CAS seal itself now publishes markers via
    scratch + hard-link, so it can no longer produce one."""
    for backend in (RenameCommitBackend(), CasPointerCommitBackend()):
        t = FreqTable(spark, str(tmp_path / f"torn-{backend.name}"),
                      backend=backend)
        t.create(_schema())
        t.insert(spark.createDataFrame([(1, "a")], _schema()))
        # backdated mtime: outside the CAS backend's orphan grace window
        torn = os.path.join(t.path, "seg-1000-t0rnt0rn")
        os.makedirs(torn)
        open(os.path.join(torn, "_segmeta.json"), "w").close()  # torn: empty
        os.utime(torn, (1000, 1000))
        assert [r.k for r in t.scan().collect()] == [1], backend.name
        t.insert(spark.createDataFrame([(2, "b")], _schema()))
        assert not os.path.isdir(torn), (
            f"{backend.name}: torn-marker segment not reclaimed")
        assert sorted(r.k for r in t.scan().collect()) == [1, 2]


def test_cas_seal_never_leaves_torn_marker_on_crash(tmp_path, monkeypatch):
    """Crash INSIDE seal_segment (between scratch write and hard-link) must
    leave no _segmeta.json at all — the marker appears with its full body
    or not at all."""
    b = CasPointerCommitBackend()
    seg_dir = tmp_path / "t" / "seg-1-aa"
    seg_dir.mkdir(parents=True)

    def crashing_link(src, dst):
        raise RuntimeError("simulated crash before marker link")

    monkeypatch.setattr(commit.os, "link", crashing_link)
    with pytest.raises(RuntimeError, match="simulated crash"):
        b.seal_segment(str(tmp_path / "t"), "seg-1-aa", {"seq": 0})
    assert not os.path.exists(seg_dir / "_segmeta.json")
    monkeypatch.undo()
    # and the real protocol seals fine afterwards
    b.seal_segment(str(tmp_path / "t"), "seg-1-aa", {"seq": 0})
    assert commit._marker_is_committed(str(seg_dir / "_segmeta.json"))


def test_retire_manifests_is_version_scoped(tmp_path):
    """retire_manifests only GCs artifacts from versions STRICTLY below the
    oldest kept pointer — a racing publisher's in-flight scratch and
    manifest object (always at >= the newest committed version) survive
    the pass (round-11 advice: the unscoped pass could unlink them
    mid-publish, turning CommitConflict into an arbitrary exception)."""
    b = CasPointerCommitBackend()
    path = str(tmp_path / "state")
    os.makedirs(path)
    for v in range(5):
        b.publish_manifest(path, v, {"version": v})
    ptr_dir = os.path.join(path, "_ptr")
    # a racing publisher mid-flight at the next version: scratch + object
    with open(os.path.join(ptr_dir, ".ptr-5-beefbeef"), "w") as fh:
        fh.write("mobj-5-beefbeef.json")
    with open(os.path.join(path, "mobj-5-beefbeef.json"), "w") as fh:
        fh.write("{}")
    # and a crashed OLD writer's scratch at a retired version
    with open(os.path.join(ptr_dir, ".ptr-0-deadbeef"), "w") as fh:
        fh.write("gone")

    b.retire_manifests(path, keep=2)

    assert b.manifest_versions(path) == [3, 4]
    names = set(os.listdir(ptr_dir)) | set(os.listdir(path))
    assert ".ptr-5-beefbeef" in names, "in-flight scratch was GC'd"
    assert "mobj-5-beefbeef.json" in names, "in-flight manifest was GC'd"
    assert ".ptr-0-deadbeef" not in names, "retired-version scratch kept"
    live = {f for f in os.listdir(path) if f.startswith("mobj-")}
    assert not any(b._name_version(f) is not None and b._name_version(f) < 3
                   for f in live - {"mobj-5-beefbeef.json"})
    # the racing publisher completes cleanly after the retire pass
    b.publish_manifest(path, 5, {"version": 5})
    assert b.load_manifest(path) == {"version": 5}


def test_duplicate_seq_span_fails_loudly(spark, tmp_path):
    """Two sealed segments claiming the same (min_seq, seq) span — what two
    unfenced concurrent writers produce — must be a loud read error, never
    a silent double-count (round-11 advice)."""
    import json as _json

    t = FreqTable(spark, str(tmp_path / "dup"))
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a")], _schema()))
    seg = [n for n in os.listdir(t.path) if n.startswith("seg-")][0]
    clone = os.path.join(t.path, "seg-9999999999999-c10nec10")
    shutil.copytree(os.path.join(t.path, seg), clone)
    with pytest.raises(ValueError, match="both claim seq span"):
        t.scan().collect()


def test_reader_sees_constant_multiset_at_every_compaction_step(
        spark, tmp_path, monkeypatch):
    """Live interleaving of a READER with compact(): snapshot a second
    table handle's full (tuple -> freq) Counter immediately before and
    after EVERY mutation compact() performs (each rmtree and the seal);
    the multiset must be identical at every interleaving point — the
    span-subsumption drop is the guard (round-11 verdict task 6: the
    crash differential covered torn executions, not a concurrent read)."""
    from collections import Counter

    import incresql_spark.frequency as freq_mod

    t = FreqTable(spark, str(tmp_path / "interleave"))
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a"), (2, "b")], _schema()), ts_ms=1000)
    t.insert(spark.createDataFrame([(2, "b"), (3, "c")], _schema()), ts_ms=2000)
    t.insert(spark.createDataFrame([(1, "a")], _schema()), ts_ms=3000)

    reader = FreqTable(spark, t.path)  # independent handle, same directory

    def snapshot():
        return Counter(
            {(r["k"], r["v"]): r["__freq"]
             for r in reader.scan(expand=False).collect()}
        )

    expected = snapshot()
    assert expected == {(1, "a"): 2, (2, "b"): 2, (3, "c"): 1}
    seen = [expected]

    real_rmtree = shutil.rmtree
    real_seal = t.backend.seal_segment

    def observing_rmtree(*a, **k):
        seen.append(snapshot())
        real_rmtree(*a, **k)
        seen.append(snapshot())

    def observing_seal(*a, **k):
        seen.append(snapshot())
        real_seal(*a, **k)
        seen.append(snapshot())

    monkeypatch.setattr(freq_mod.shutil, "rmtree", observing_rmtree)
    monkeypatch.setattr(t.backend, "seal_segment", observing_seal)
    t.compact()
    monkeypatch.undo()

    assert len(seen) >= 5  # seal + >= 2 input deletions, observed both sides
    for i, snap in enumerate(seen):
        assert snap == expected, f"reader diverged at interleaving point {i}"
    # post-compaction steady state too
    assert snapshot() == expected


def test_randomized_two_writer_fence_differential(spark, tmp_path):
    """Randomized schedule of two fenced writers interleaving acquire/insert
    on ONE table directory: an insert succeeds iff its writer holds the
    NEWEST epoch, every stale-writer insert raises WriterFenced (never
    silently lands), and the final multiset equals exactly the successful
    inserts — the guard's whole contract under adversarial interleaving,
    on both backends."""
    import random
    from collections import Counter

    for backend_cls in (RenameCommitBackend, CasPointerCommitBackend):
        rng = random.Random(0xF37)
        path = str(tmp_path / f"duel-{backend_cls.name}")
        writers = [FreqTable(spark, path, backend=backend_cls()),
                   FreqTable(spark, path, backend=backend_cls())]
        writers[0].create(_schema())
        writers[0].acquire_writer_fence()
        writers[1].acquire_writer_fence()  # immediately fences writer 0
        newest = 1
        model: Counter = Counter()
        next_k = 0
        for _ in range(14):
            w = rng.randrange(2)
            if rng.random() < 0.4:
                writers[w].acquire_writer_fence()
                newest = w
                continue
            row = (next_k, f"w{w}")
            next_k += 1
            if w == newest:
                writers[w].insert(spark.createDataFrame([row], _schema()))
                model[row] += 1
            else:
                with pytest.raises(WriterFenced):
                    writers[w].insert(spark.createDataFrame([row], _schema()))
        got = Counter({(r["k"], r["v"]): r["__freq"]
                       for r in writers[newest].scan(expand=False).collect()})
        assert got == model, backend_cls.name


def test_environment_oserror_on_marker_read_propagates(spark, tmp_path):
    """An OSError that is NOT FileNotFoundError while reading a marker
    (EMFILE, EACCES, EIO ...) says nothing about commit state — it must
    PROPAGATE, never read as 'uncommitted': GC rmtree's segments on that
    verdict (deleting acknowledged data) and _segments would silently
    serve an incomplete multiset to readers (round-12 advice)."""
    t = FreqTable(spark, str(tmp_path / "envfault"))
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a")], _schema()))
    seg = next(n for n in os.listdir(t.path) if n.startswith("seg-"))
    marker = os.path.join(t.path, seg, "_segmeta.json")

    real_open = open

    def flaky_open(path, *a, **kw):
        if str(path) == marker:
            raise PermissionError(13, "transient EACCES", str(path))
        return real_open(path, *a, **kw)

    import builtins

    orig = builtins.open
    builtins.open = flaky_open
    try:
        # the GC verdict must fail loudly, not classify as uncommitted
        with pytest.raises(PermissionError):
            commit._marker_is_committed(marker)
        # ... so clean_stale_segments cannot reclaim the committed segment
        with pytest.raises(PermissionError):
            RenameCommitBackend().clean_stale_segments(t.path)
        # and a reader errors instead of serving the table minus this seg
        with pytest.raises(PermissionError):
            t._segments()
    finally:
        builtins.open = orig
    assert os.path.isdir(os.path.join(t.path, seg))
    assert [r.k for r in t.scan().collect()] == [1]


def _noop_flock(monkeypatch):
    """Remove the POSIX flock entirely — the object-store condition: the
    fence must then hold by CAS arbitration alone."""
    import contextlib as _ctx

    @classmethod
    @_ctx.contextmanager
    def no_flock(cls, path):
        yield

    monkeypatch.setattr(commit.WriterFence, "_flock", no_flock)


def test_two_writer_fence_differential_without_flock(spark, tmp_path,
                                                     monkeypatch):
    """The randomized two-fenced-writer differential with _flock
    monkeypatched to a NO-OP (round-12 verdict task 3 'done' criterion):
    on a store with no flock, epoch files + the sequence-slot CAS alone
    must keep every stale-writer insert loud and the multiset exact."""
    import random
    from collections import Counter

    _noop_flock(monkeypatch)
    for backend_cls in (RenameCommitBackend, CasPointerCommitBackend):
        rng = random.Random(0xF38)
        path = str(tmp_path / f"nolock-{backend_cls.name}")
        writers = [FreqTable(spark, path, backend=backend_cls()),
                   FreqTable(spark, path, backend=backend_cls())]
        writers[0].create(_schema())
        writers[0].acquire_writer_fence()
        writers[1].acquire_writer_fence()
        newest = 1
        model: Counter = Counter()
        next_k = 0
        for _ in range(14):
            w = rng.randrange(2)
            if rng.random() < 0.4:
                writers[w].acquire_writer_fence()
                newest = w
                continue
            row = (next_k, f"w{w}")
            next_k += 1
            if w == newest:
                writers[w].insert(spark.createDataFrame([row], _schema()))
                model[row] += 1
            else:
                with pytest.raises(WriterFenced):
                    writers[w].insert(spark.createDataFrame([row], _schema()))
        got = Counter({(r["k"], r["v"]): r["__freq"]
                       for r in writers[newest].scan(expand=False).collect()})
        assert got == model, backend_cls.name


def test_straggler_segment_commit_loses_by_cas_alone(spark, tmp_path,
                                                     monkeypatch):
    """A fenced straggler DESCHEDULED INSIDE its own commit — epoch check
    and sequence computation done BEFORE the takeover, seal attempted
    after — must still lose, with no flock: the takeover's fence bump
    burned the very sequence slot the straggler computed, so its
    allocate_seq CAS raises WriterFenced and its segment never becomes
    visible (round-12 verdict task 3: fencing atomic with the commit
    CAS, object-store-valid).  The stale pre-takeover view is simulated
    by freezing both inputs of the straggler's sequence computation
    (its epoch-dir read and its slot listing) at their pre-takeover
    values; the CAS itself runs against the REAL directory."""
    import incresql_spark.frequency as freq_mod

    _noop_flock(monkeypatch)
    for backend_cls in (RenameCommitBackend, CasPointerCommitBackend):
        path = str(tmp_path / f"straggler-{backend_cls.name}")
        old = FreqTable(spark, path, backend=backend_cls())
        old.create(_schema())
        old.acquire_writer_fence()
        old.insert(spark.createDataFrame([(1, "a")], _schema()))
        stale_max = commit.max_allocated_seq(path)

        # the straggler read the fence dir and the slot listing, then got
        # descheduled ...
        monkeypatch.setattr(old._fence, "check", lambda: None)

        # ... the takeover happens (fence bump burns the next slot) ...
        new = FreqTable(spark, path, backend=backend_cls())
        new.acquire_writer_fence()

        # ... and the straggler wakes up and finishes its commit against
        # its stale view of the slot listing
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(freq_mod.commit, "max_allocated_seq",
                       lambda p: stale_max)
            with pytest.raises(WriterFenced, match="held by fence epoch"):
                old.insert(spark.createDataFrame([(2, "stale")], _schema()))

        # nothing of the straggler's landed; the new owner proceeds
        new.insert(spark.createDataFrame([(3, "b")], _schema()))
        assert sorted(r.k for r in new.scan().collect()) == [1, 3], (
            backend_cls.name)


def test_straggler_manifest_commit_loses_by_cas_alone(spark, tmp_path,
                                                      monkeypatch):
    """Same property on the AggState manifest chain under the CAS
    backend: the takeover bump republishes the manifest at the next
    version with the new epoch IN the pointer, so a straggler whose
    refresh computed that version loses the pointer CAS and reads the
    winner's stored epoch — WriterFenced (terminal), not a retriable
    CommitConflict — with no flock anywhere."""
    _noop_flock(monkeypatch)
    path = str(tmp_path / "agg-straggler")
    sch = "k INT, cnt BIGINT"
    old = AggState(spark, path, num_buckets=2,
                   backend=CasPointerCommitBackend())
    old.acquire_writer_fence()
    old.write_buckets(spark.createDataFrame([(1, 1)], sch), ["k"], [0, 1])
    monkeypatch.setattr(old._fence, "check", lambda: None)

    new = AggState(spark, path, num_buckets=2,
                   backend=CasPointerCommitBackend())
    new.acquire_writer_fence()  # bump commits version+1 with epoch 1

    with pytest.raises(WriterFenced):
        old.write_buckets(spark.createDataFrame([(1, 9)], sch), ["k"], [0, 1])
    # the straggler's write is nowhere; the new owner's state is intact
    assert [(r.k, r.cnt) for r in new.read().collect()] == [(1, 1)]
    new.write_buckets(spark.createDataFrame([(1, 5)], sch), ["k"], [0, 1])
    assert [(r.k, r.cnt) for r in new.read().collect()] == [(1, 5)]


def test_version_scoped_sweep_never_touches_newer_writer_artifacts(
        spark, tmp_path):
    """The round-13 GC redesign: write_buckets never deletes an artifact
    whose embedded version is ABOVE the version it just committed.  Plant
    dirs simulating a NEWER writer's in-flight and committed work (stage
    and bucket versions far above the chain) plus genuine stale garbage at
    or below it; after a commit at nxt, the garbage is gone and the
    "newer" artifacts are untouched — the monotone rule that makes the
    sweep safe without flock on object stores."""
    path = str(tmp_path / "agg_sweep")
    sch = "k INT, cnt BIGINT"
    st = AggState(spark, path, num_buckets=2,
                  backend=CasPointerCommitBackend())
    st.write_buckets(spark.createDataFrame([(1, 1), (2, 2)], sch), ["k"],
                     [0, 1])
    # "newer writer" artifacts: version 99 > anything this chain commits
    newer = [os.path.join(path, "stage-99-zz"),
             os.path.join(path, "b-0", "v-99-zz")]
    # stale garbage: a crashed refresh at the NEXT version (legacy name
    # and tagged name) and an old stage
    nxt = st._load_manifest()["version"] + 1
    stale = [os.path.join(path, f"stage-{nxt}-old"),
             os.path.join(path, "b-0", f"v-{nxt}"),
             os.path.join(path, "b-1", f"v-{nxt}-old")]
    for d in newer + stale:
        os.makedirs(d)
        with open(os.path.join(d, "junk"), "w") as fh:
            fh.write("x")

    st.write_buckets(spark.createDataFrame([(1, 5), (2, 2)], sch), ["k"],
                     [0, 1])
    assert st._load_manifest()["version"] == nxt
    for d in newer:
        assert os.path.isdir(d), f"newer-writer artifact {d} was deleted"
    for d in stale:
        assert not os.path.exists(d), f"stale garbage {d} survived"
    assert sorted((r.k, r.cnt) for r in st.read().collect()) == [
        (1, 5), (2, 2)]


def test_straggler_gc_cannot_delete_new_owners_committed_buckets(
        spark, tmp_path, monkeypatch):
    """Round-13 review scenario, closed by the writer-unique naming: a
    straggler that re-enters write_buckets AFTER a takeover (flock gone,
    its own epoch check suppressed to model a mid-GC deschedule) must not
    destroy the new owner's COMMITTED bucket data.  Under the old design
    its reclaim loop rmtree'd every v-N above its stale committed version
    — deleting the new owner's live dirs; now nothing above the straggler's
    own target version is ever deleted, so the owner's state survives and
    the straggler dies on its own commit CAS."""
    _noop_flock(monkeypatch)
    path = str(tmp_path / "agg-gc-straggler")
    sch = "k INT, cnt BIGINT"
    old = AggState(spark, path, num_buckets=2,
                   backend=CasPointerCommitBackend())
    old.acquire_writer_fence()
    old.write_buckets(spark.createDataFrame([(1, 1)], sch), ["k"], [0, 1])
    # model the deschedule: the straggler never observes the takeover
    monkeypatch.setattr(old._fence, "check", lambda: None)

    new = AggState(spark, path, num_buckets=2,
                   backend=CasPointerCommitBackend())
    new.acquire_writer_fence()
    new.write_buckets(spark.createDataFrame([(1, 7)], sch), ["k"], [0, 1])
    owner_m = new._load_manifest()
    owner_dirs = [
        os.path.join(path, f"b-{k}", AggState._vdir(v))
        for k, v in owner_m["buckets"].items()
    ]
    assert owner_dirs and all(os.path.isdir(d) for d in owner_dirs)

    with pytest.raises(WriterFenced):
        old.write_buckets(spark.createDataFrame([(1, 9)], sch), ["k"],
                          [0, 1])
    for d in owner_dirs:
        assert os.path.isdir(d), (
            f"straggler GC deleted the new owner's committed {d}")
    assert [(r.k, r.cnt) for r in new.read().collect()] == [(1, 7)]


def test_cas_orphan_grace_protects_young_inflight_segments(spark, tmp_path):
    """The CAS backend's unmarked-segment GC honours the orphan grace
    window (round-13 review): an unmarked dir younger than the window is
    treated as another writer's possible in-flight commit and left alone;
    one older than the window is crashed garbage and reclaimed."""
    import time as _time

    t = FreqTable(spark, str(tmp_path / "grace"),
                  backend=CasPointerCommitBackend())
    t.create(_schema())
    t.insert(spark.createDataFrame([(1, "a")], _schema()))
    now_ms = int(_time.time() * 1000)
    young = os.path.join(t.path, f"seg-{now_ms}-young000")
    # the OLD orphan deliberately carries a YOUNG name-embedded ts: age
    # must come from mtime (names carry logical time, which compaction
    # and backdated inserts make arbitrarily old for in-flight writes)
    old = os.path.join(t.path, f"seg-{now_ms}-old00000")
    for d in (young, old):
        os.makedirs(d)
        with open(os.path.join(d, "part-0.parquet"), "wb") as fh:
            fh.write(b"x")
    os.utime(old, (1000, 1000))
    t.backend.clean_stale_segments(t.path)
    assert os.path.isdir(young), "in-flight-age segment was reclaimed"
    assert not os.path.isdir(old), "aged orphan survived GC"
    # with the window zeroed (test override), the young one goes too
    t.backend.orphan_grace_ms = 0
    t.backend.clean_stale_segments(t.path)
    assert not os.path.isdir(young)
