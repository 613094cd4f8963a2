"""TableSink schema-CAS under concurrent evolution (Q4's ETag analogue)."""

from __future__ import annotations

import threading

from pyspark.sql import types as T

from swarm_spark.model import TableDest
from swarm_spark.sinks import TableSink


def s(*names):
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


class TestConcurrentEvolve:
    def test_parallel_ensure_table_unions_all_fields(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "t")
        errs = []

        def evolve(field):
            try:
                sink.ensure_table(dest, s("base", field))
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=evolve, args=(f"c{i}",)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        final = sink._read_schema(dest)["data"].dataType
        names = {f.name for f in final.fields}
        # every writer's column survived the race: lock serializes the
        # read-merge-write, so no evolution is lost
        assert names == {"base"} | {f"c{i}" for i in range(8)}


class TestTableLock:
    """Schema-lock staleness/heartbeat protocol (ADVICE r5: a SIGKILLed
    compact used to wedge the table forever; release had a
    check-then-remove gap)."""

    def test_stale_lock_is_broken_not_fatal(self, spark, tmp_path):
        import os
        import time as _time

        from swarm_spark.sinks.table import LOCK_FILE

        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "t")
        sink.ensure_table(dest, s("a"))
        lock = f"{sink._dir(dest)}/{LOCK_FILE}"
        with open(lock, "w") as f:
            f.write("dead-compact")
        old = _time.time() - 3600
        os.utime(lock, (old, old))
        # would previously time out after 30 s and raise ModelError
        sink.ensure_table(dest, s("a", "b"))
        names = {f.name for f in sink._read_schema(dest)["data"].dataType.fields}
        assert names == {"a", "b"}
        assert not os.path.exists(lock)

    def test_heartbeat_keeps_long_hold_fresh(self, tmp_path, monkeypatch):
        import time as _time

        from swarm_spark.sinks import table as tbl

        monkeypatch.setattr(tbl, "LOCK_STALE_S", 0.4)
        monkeypatch.setattr(tbl, "_HEARTBEAT_S", 0.1)
        lock = tbl._TableLock(str(tmp_path / "t.lock")).acquire(timeout_s=1.0)
        try:
            _time.sleep(0.9)  # > LOCK_STALE_S without heartbeat
            # a second waiter must NOT break the heartbeating holder
            waiter = tbl._TableLock(str(tmp_path / "t.lock"))
            try:
                waiter.acquire(timeout_s=0.3)
                raise AssertionError("waiter stole a live heartbeating lock")
            except Exception as e:  # noqa: BLE001
                assert "timeout" in str(e)
        finally:
            lock.release()
        # after release the path is free immediately
        tbl._TableLock(str(tmp_path / "t.lock")).acquire(timeout_s=0.5).release()

    def test_release_never_deletes_replacement_lock(self, tmp_path):
        import os

        from swarm_spark.sinks import table as tbl

        path = str(tmp_path / "t.lock")
        lock = tbl._TableLock(path).acquire(timeout_s=1.0)
        # simulate: broken as stale, another holder created a new lock
        os.remove(path)
        with open(path, "w") as f:
            f.write("new-holder-token")
        lock.release()
        assert os.path.exists(path), "release deleted a lock it no longer owns"
        with open(path) as f:
            assert f.read() == "new-holder-token"
