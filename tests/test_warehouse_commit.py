"""Crash-safety of Warehouse.overwrite: generation-dir + pointer-file
commit (the single-transaction stand-in for the reference's one-script
SCD2 merge, reference: controller/dv_loader.rs:59-64).

Each test simulates one crash window and asserts the table stays
readable with a consistent generation, and that init-time GC removes
the leftovers."""

import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

import pg_auto_dw_spark.warehouse as whmod
from pg_auto_dw_spark.warehouse import Warehouse

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.StringType())]
)


def _df(spark, tag, n=5):
    return spark.createDataFrame([(i, f"{tag}{i}") for i in range(n)], SCHEMA)


def _vals(wh, name="m.t"):
    return {r["v"] for r in wh.read(name).collect()}


def test_overwrite_roundtrip_single_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    wh.overwrite("m.t", _df(spark, "b"))
    assert _vals(wh) == {f"b{i}" for i in range(5)}
    gens = [e for e in os.listdir(warehouse_dir) if "__gen-" in e]
    assert len(gens) == 1  # superseded generations cleaned inline


def test_crash_before_pointer_swap_keeps_old_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    # a fully-written but never-committed generation (crash pre-commit)
    stray = wh._base("m.t") + "__gen-deadbeef"
    shutil.copytree(wh.path("m.t"), stray)
    wh2 = Warehouse(spark, warehouse_dir)
    assert _vals(wh2) == {f"a{i}" for i in range(5)}
    assert not os.path.isdir(stray)  # init GC removed the orphan


def test_crash_during_cleanup_recovers_on_init(spark, warehouse_dir, monkeypatch):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    # commit succeeds, post-commit cleanup of the old generation "crashes"
    monkeypatch.setattr(whmod.shutil, "rmtree", lambda *a, **k: None)
    wh.overwrite("m.t", _df(spark, "b"))
    monkeypatch.undo()
    assert _vals(wh) == {f"b{i}" for i in range(5)}
    assert len([e for e in os.listdir(warehouse_dir) if "__gen-" in e]) == 2
    wh2 = Warehouse(spark, warehouse_dir)
    assert _vals(wh2) == {f"b{i}" for i in range(5)}
    assert len([e for e in os.listdir(warehouse_dir) if "__gen-" in e]) == 1


def test_legacy_staging_and_backup_dirs_gcd(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    for leftover in ("m__t.staging-0ld", "m__t.old-0ld"):
        os.makedirs(os.path.join(warehouse_dir, leftover))
    with open(os.path.join(warehouse_dir, "m__t.live.tmp-x"), "w") as f:
        f.write("junk")
    wh2 = Warehouse(spark, warehouse_dir)
    entries = set(os.listdir(warehouse_dir))
    assert "m__t.staging-0ld" not in entries
    assert "m__t.old-0ld" not in entries
    assert "m__t.live.tmp-x" not in entries
    assert _vals(wh2) == {f"a{i}" for i in range(5)}


# ---------------------------------------------------------------------------
# Concurrent writers (reference parity: Postgres serializes the whole
# load script in one transaction, dv_loader.rs:59-64; our stand-in is
# the per-table flock held across write+commit).
#
# Workers exercise the commit protocol directly -- generation dir +
# marker file + _commit_generation -- because the protocol is pure
# filesystem; Spark only ever produces the generation's contents.
# ---------------------------------------------------------------------------

import multiprocessing as mp
import time
import uuid


def _ptr(root, name="m.t"):
    p = os.path.join(root, name.replace(".", "__") + ".live")
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        return f.read().strip()


def _stress_writer(root, writer_id, n_commits, log):
    wh = Warehouse(None, root)  # commit path never touches spark
    for seq in range(n_commits):
        with wh.lock("m.t"):
            gen = wh._base("m.t") + "__gen-" + uuid.uuid4().hex[:8]
            os.makedirs(gen)
            # two-step marker write simulates a slow Spark job: a GC
            # that reaped mid-write would leave a truncated marker
            with open(os.path.join(gen, "marker"), "w") as f:
                f.write(f"{writer_id}:{seq}:")
                f.flush()
                time.sleep(0.005)
                f.write("done")
            wh._commit_generation("m.t", gen)
        log.put((writer_id, seq, os.path.basename(gen)))


def _stress_reader(root, stop, failures):
    while not stop.is_set():
        Warehouse(None, root)  # init-time GC under contention
        for _ in range(3):
            ptr = _ptr(root)
            if ptr is None:
                break  # nothing committed yet
            try:
                with open(os.path.join(root, ptr, "marker")) as f:
                    if not f.read().endswith("done"):
                        failures.put(f"torn marker in live generation {ptr}")
                break
            except FileNotFoundError:
                if _ptr(root) == ptr:
                    failures.put(f"committed generation {ptr} lost")
                    break
                # superseded between pointer read and dir read -- retry


def test_two_process_writers_never_lose_committed_generation(tmp_path):
    """Two concurrent writer processes + a GC-hammering reader process:
    at every instant the pointer names an existing, fully-written
    generation, and no committed generation is ever orphaned."""
    root = str(tmp_path / "wh_stress")
    os.makedirs(root)
    ctx = mp.get_context("spawn")
    log, failures = ctx.Queue(), ctx.Queue()
    stop = ctx.Event()
    n_commits = 12
    writers = [
        ctx.Process(target=_stress_writer, args=(root, w, n_commits, log), daemon=True)
        for w in range(2)
    ]
    reader = ctx.Process(target=_stress_reader, args=(root, stop, failures), daemon=True)
    commits, fails = [], []
    try:
        reader.start()
        for p in writers:
            p.start()
        for p in writers:
            p.join(timeout=120)
        stop.set()
        reader.join(timeout=30)
        while not log.empty():
            commits.append(log.get())
        while not failures.empty():
            fails.append(failures.get())
        assert [p.exitcode for p in writers] == [0, 0]
        assert reader.exitcode == 0
    finally:
        stop.set()
        for p in writers + [reader]:
            if p.is_alive():
                p.terminate()
    assert fails == []
    assert len(commits) == 2 * n_commits  # every commit succeeded
    # the surviving pointer names one of the committed generations,
    # fully written, and it is some writer's final commit (the lock
    # serializes, so the last committer system-wide wins)
    final = _ptr(root)
    by_gen = {gen: (w, seq) for w, seq, gen in commits}
    assert final in by_gen
    with open(os.path.join(root, final, "marker")) as f:
        assert f.read().endswith("done")
    w, seq = by_gen[final]
    assert seq == n_commits - 1


def test_gc_skips_inflight_generation_of_active_writer(tmp_path):
    """A fresh Warehouse's GC must not reap an uncommitted generation
    while its writer holds the table lock (the VERDICT r3 hazard)."""
    root = str(tmp_path / "wh_inflight")
    os.makedirs(root)
    wh = Warehouse(None, root)
    with wh.lock("m.t"):
        gen = wh._base("m.t") + "__gen-" + uuid.uuid4().hex[:8]
        os.makedirs(gen)
        with open(os.path.join(gen, "marker"), "w") as f:
            f.write("w:0:")  # mid-write: not yet "done"
        Warehouse(None, root)  # concurrent init-time GC
        assert os.path.isdir(gen)  # survived: writer holds the lock
        with open(os.path.join(gen, "marker"), "a") as f:
            f.write("done")
        wh._commit_generation("m.t", gen)
    # once committed and unlocked, GC keeps it because it is live
    Warehouse(None, root)
    assert os.path.isdir(gen)
    assert _ptr(root) == os.path.basename(gen)


def test_two_threads_on_one_warehouse_serialize(tmp_path):
    """Reentrancy is per-thread: a second thread on the SAME Warehouse
    instance must block on the table lock, not piggyback on the first
    thread's hold."""
    import threading

    root = str(tmp_path / "wh_threads")
    os.makedirs(root)
    wh = Warehouse(None, root)
    order = []
    a_holds = threading.Event()
    release_a = threading.Event()

    def thread_a():
        with wh.lock("m.t"):
            order.append("a-acquired")
            a_holds.set()
            release_a.wait(timeout=30)
            order.append("a-released")

    def thread_b():
        a_holds.wait(timeout=30)
        with wh.lock("m.t"):
            order.append("b-acquired")

    ta = threading.Thread(target=thread_a)
    tb = threading.Thread(target=thread_b)
    ta.start()
    tb.start()
    a_holds.wait(timeout=30)
    time.sleep(0.2)  # give B a chance to (incorrectly) slip in
    assert order == ["a-acquired"]  # B is blocked while A holds
    release_a.set()
    ta.join(timeout=30)
    tb.join(timeout=30)
    assert order == ["a-acquired", "a-released", "b-acquired"]


def test_append_lands_in_live_generation(spark, warehouse_dir):
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.t", SCHEMA)
    wh.overwrite("m.t", _df(spark, "a"))
    wh.append("m.t", _df(spark, "x", n=2))
    assert _vals(wh) == {f"a{i}" for i in range(5)} | {"x0", "x1"}
    # and a reopened warehouse sees the same rows
    assert _vals(Warehouse(spark, warehouse_dir)) == _vals(wh)


def test_blocking_lock_failure_raises_not_unserialized(spark, warehouse_dir, monkeypatch):
    """A failed BLOCKING flock acquisition must raise -- never silently
    yield and let the caller write unserialized (ADVICE r4: callers
    ignore the yielded value)."""
    import errno
    import fcntl as fcntl_mod

    import pytest

    wh = Warehouse(spark, warehouse_dir)

    def broken_flock(fd, op):
        raise OSError(errno.ENOLCK, "No locks available")

    monkeypatch.setattr(whmod.fcntl, "flock", broken_flock)
    with pytest.raises(OSError):
        with wh.lock("m.t"):
            raise AssertionError("must not enter the critical section")

    # a busy NON-blocking probe still yields False (GC's skip path)...
    def busy_flock(fd, op):
        if op & fcntl_mod.LOCK_NB:
            raise BlockingIOError(errno.EWOULDBLOCK, "busy")
        return None

    monkeypatch.setattr(whmod.fcntl, "flock", busy_flock)
    with wh.lock("m.t", blocking=False) as acquired:
        assert acquired is False
    # ...but a non-EWOULDBLOCK failure of a non-blocking probe raises too
    monkeypatch.setattr(whmod.fcntl, "flock", broken_flock)
    with pytest.raises(OSError):
        with wh.lock("m.t", blocking=False):
            pass


def test_overwrite_partitions_crash_keeps_old_state(spark, warehouse_dir, monkeypatch):
    """overwrite_partitions is copy-on-write: a crash before the pointer
    commit leaves the PREVIOUS table state fully live -- including
    current/history rows of keys absent from the batch (ADVICE r4: the
    old in-place dynamic overwrite could lose them permanently)."""
    import pytest

    from pyspark.sql import functions as F

    pschema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("b", T.LongType()),
        ]
    )
    wh = Warehouse(spark, warehouse_dir)
    wh.create_table("m.p", pschema, partition_by=["b"])
    full = spark.createDataFrame([(i, f"v{i}", i % 2) for i in range(10)], pschema)
    wh.append("m.p", full)
    before = {(r["k"], r["v"], r["b"]) for r in wh.read("m.p").collect()}

    # batch touches partition b=0 only, and carries only keys 0 and 2:
    # under in-place dynamic overwrite a crash mid-write could drop
    # keys 4, 6, 8 forever
    batch = spark.createDataFrame([(0, "NEW0", 0), (2, "NEW2", 0)], pschema)

    def crash(self, name, gen_dir, action="overwrite"):
        raise RuntimeError("simulated crash before pointer commit")

    monkeypatch.setattr(Warehouse, "_commit_generation", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        wh.overwrite_partitions("m.p", batch)
    monkeypatch.undo()

    # the table reads back EXACTLY the pre-merge state
    assert {(r["k"], r["v"], r["b"]) for r in wh.read("m.p").collect()} == before
    # a fresh Warehouse GCs the orphaned generation and the re-run lands
    wh2 = Warehouse(spark, warehouse_dir)
    orphans = [e for e in os.listdir(warehouse_dir) if "__gen-" in e]
    live = os.path.basename(wh2.path("m.p"))
    assert all(e == live for e in orphans)
    wh2.overwrite_partitions("m.p", batch)
    after = {(r["k"], r["v"], r["b"]) for r in wh2.read("m.p").collect()}
    # partition-granular semantics: touched partition b=0 is replaced by
    # the batch; UNTOUCHED partition b=1 survives byte-identical (it is
    # merge_batch's job to carry non-batch rows of touched partitions)
    assert after == {(0, "NEW0", 0), (2, "NEW2", 0)} | {
        t for t in before if t[2] == 1
    }


def test_compact_reduces_files_preserves_rows(spark, warehouse_dir, sf_dir):
    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, warehouse_dir)
    cust = load_table(spark, sf_dir, "customer")
    # accrete many small files via repeated appends
    for i in range(6):
        wh.append("cust_c", cust.repartition(8))
    before_rows = wh.read("cust_c").count()
    before_hash = (
        wh.read("cust_c").groupBy().agg(F.sum(F.hash("c_custkey", "c_name")).alias("h")).collect()[0].h
    )
    stats = wh.compact("cust_c", target_file_mb=256)
    assert stats["files_before"] >= 48
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] <= 2
    after = wh.read("cust_c")
    assert after.count() == before_rows
    got = after.groupBy().agg(F.sum(F.hash("c_custkey", "c_name")).alias("h")).collect()[0].h
    assert got == before_hash


def test_compact_partitioned_keeps_spec_and_data(spark, warehouse_dir, sf_dir):
    from pyspark.sql import types as T

    from pg_auto_dw_spark.sources import load_table
    from pg_auto_dw_spark.warehouse import Warehouse

    wh = Warehouse(spark, warehouse_dir)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    wh.create_table("ev_p", T.StructType(ev.schema.fields), partition_by=["day"])
    for _ in range(4):
        wh.append("ev_p", ev.repartition(6))
    before = wh.read("ev_p").count()
    stats = wh.compact("ev_p", target_file_mb=256)
    assert stats["files_after"] < stats["files_before"]
    after = wh.read("ev_p")
    assert after.count() == before
    # partition layout preserved: day= dirs still present
    import os as _os

    live = wh.path("ev_p")
    assert any(d.startswith("day=") for d in _os.listdir(live))
    # at 256MB target each tiny partition compacts to one file
    from collections import Counter

    per_dir = Counter(
        _os.path.dirname(p) for p in wh.data_files("ev_p")
    )
    assert max(per_dir.values()) == 1
