"""Streaming tier tests: state machine (injected clock, mirrors
pkg/usecase/state_test.go), envelope parsing (message_test.go),
enqueue batching (enqueue_test.go), serve dedup semantics
(server_test.go), and Structured Streaming ingest."""

from __future__ import annotations

import base64
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swarm_spark.model import ModelError, ObjectMeta, Source, TableDest
from swarm_spark.pipeline import (
    IngestPipeline,
    MemoryPublisher,
    enqueue,
    list_local_objects,
)
from swarm_spark.rules import EventRule, EventRuleSet, SchemaRuleRegistry, name_suffix, rule_output
from swarm_spark.sinks import TableSink
from swarm_spark.streaming import (
    Ack,
    MsgState,
    NotificationProcessor,
    StateStore,
    parse_pubsub_push,
    storage_event_to_object,
    stream_ingest,
)


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


class TestStateStore:
    def test_acquire_new(self, tmp_path):
        st = StateStore(str(tmp_path), clock=FakeClock())
        state, acquired = st.get_or_create("m", "id1")
        assert acquired and state.state == "running"

    def test_running_not_reacquirable_until_expired(self, tmp_path):
        clock = FakeClock()
        st = StateStore(str(tmp_path), timeout_s=100, clock=clock)
        st.get_or_create("m", "id1")
        _, acquired = st.get_or_create("m", "id1")
        assert not acquired
        clock.t += 101  # past timeout → expired RUNNING is re-acquirable
        _, acquired = st.get_or_create("m", "id1")
        assert acquired

    def test_completed_never_reacquired(self, tmp_path):
        clock = FakeClock()
        st = StateStore(str(tmp_path), clock=clock)
        st.get_or_create("m", "id1")
        st.update("m", "id1", MsgState.COMPLETED)
        clock.t += 10**6
        state, acquired = st.get_or_create("m", "id1")
        assert not acquired and state.state == "completed"

    def test_failed_reacquirable(self, tmp_path):
        st = StateStore(str(tmp_path), clock=FakeClock())
        st.get_or_create("m", "id1")
        st.update("m", "id1", MsgState.FAILED)
        _, acquired = st.get_or_create("m", "id1")
        assert acquired

    def test_ttl_sweep(self, tmp_path):
        clock = FakeClock()
        st = StateStore(str(tmp_path), ttl_s=1000, clock=clock)
        st.get_or_create("m", "old")
        clock.t += 2000
        st.get_or_create("m", "new")
        assert st.sweep_expired_ttl() == 1

    def test_wait_completed(self, tmp_path):
        clock = FakeClock()
        st = StateStore(str(tmp_path), clock=clock)
        st.get_or_create("m", "id1")
        st.update("m", "id1", MsgState.COMPLETED)
        assert st.wait("m", "id1", poll_s=0, deadline_s=1, sleep=lambda s: None)


class TestMessages:
    def test_storage_event_field_quirks(self):
        # FIXTURES.md F3: size numeric-as-string, md5 base64→hex,
        # RFC3339 ms → unix sec
        ev = {
            "kind": "storage#object",
            "bucket": "b",
            "name": "logs/x.json",
            "size": "2048",
            "md5Hash": base64.b64encode(bytes.fromhex("00ff10ab")).decode(),
            "timeCreated": "2024-03-01T12:00:00.500Z",
        }
        o = storage_event_to_object(ev)
        assert o.size == 2048
        assert o.digests[0].alg == "md5" and o.digests[0].value == "00ff10ab"
        assert o.created_at == 1709294400
        assert o.data["kind"] == "storage#object"

    def test_pubsub_cs_and_swarm(self):
        ev = {"bucket": "b", "name": "n", "size": "1"}
        body = {
            "message": {
                "data": base64.b64encode(json.dumps(ev).encode()).decode(),
                "message_id": "m-1",
            },
            "subscription": "s",
        }
        mid, objs = parse_pubsub_push(body)
        assert mid == "m-1" and len(objs) == 1 and objs[0].bucket == "b"

        swarm = {"objects": [{"data": ev}, {"data": dict(ev, name="n2")}]}
        body["message"]["data"] = base64.b64encode(json.dumps(swarm).encode()).decode()
        mid, objs = parse_pubsub_push(body)
        assert [o.name for o in objs] == ["n", "n2"]

    def test_bad_envelope(self):
        with pytest.raises(ModelError):
            parse_pubsub_push({"message": {"data": "!!!", "message_id": "x"}})
        with pytest.raises(ModelError):
            storage_event_to_object({"name": "only"})


class TestEnqueue:
    def test_count_cap(self):
        pub = MemoryPublisher()
        objs = [ObjectMeta(bucket="b", name=f"o{i}", size=1) for i in range(300)]
        res = enqueue(objs, pub, count_limit=128)
        assert res.batches == 3 and res.objects == 300
        sizes = [len(parse_pubsub_push(b)[1]) for b in pub.bodies]
        assert sizes == [128, 128, 44]

    def test_size_cap(self):
        pub = MemoryPublisher()
        objs = [ObjectMeta(bucket="b", name=f"o{i}", size=3 * 1024 * 1024) for i in range(4)]
        res = enqueue(objs, pub)  # 3 MiB each, 4 MiB cap → one per batch
        assert res.batches == 4

    def test_list_local_objects(self, tmp_path):
        (tmp_path / "a.json").write_text("{}")
        (tmp_path / "b.json").write_text('{"x":1}')
        objs = list_local_objects(str(tmp_path / "*.json"))
        assert [o.name for o in objs] == ["a.json", "b.json"]
        assert objs[1].size == len('{"x":1}')


def _mini_pipeline(spark, tmp_path):
    rules = SchemaRuleRegistry()

    @rules.rule("ev")
    def ev(df):
        return rule_output(
            df,
            dataset="ds",
            table="t",
            timestamp=F.col("ts").cast("double"),
            data=F.struct("k", "v"),
        )

    events = EventRuleSet([EventRule("all", name_suffix(".ndjson"), (Source(schema="ev"),))])
    sink = TableSink(spark, str(tmp_path / "wh"))
    return IngestPipeline(spark, events, rules, sink), sink


class TestServe:
    def test_duplicate_message_processed_once(self, spark, tmp_path):
        pipe, sink = _mini_pipeline(spark, tmp_path)
        states = StateStore(str(tmp_path / "states"))
        proc = NotificationProcessor(pipe, states)

        p = tmp_path / "x.ndjson"
        p.write_text('{"k":"a","v":1,"ts":1700000000}\n')
        ev = {"bucket": "b", "name": "x.ndjson", "size": "1", "path": str(p)}
        body = {
            "message": {
                "data": base64.b64encode(json.dumps(ev).encode()).decode(),
                "message_id": "dup-1",
            }
        }
        r1 = proc.handle_pubsub(body)
        assert r1.ack == Ack.OK and r1.stats.total_rows == 1
        r2 = proc.handle_pubsub(body)  # redelivery of the same message
        assert r2.ack == Ack.OK and r2.reason == "already completed"
        assert sink.read_table(TableDest("ds", "t")).count() == 1

    def test_malformed_dropped(self, spark, tmp_path):
        pipe, _ = _mini_pipeline(spark, tmp_path)
        proc = NotificationProcessor(pipe, StateStore(str(tmp_path / "s2")))
        assert proc.handle_pubsub({"message": {}}).ack == Ack.DROP

    def test_failure_retries_then_succeeds(self, spark, tmp_path):
        pipe, sink = _mini_pipeline(spark, tmp_path)
        states = StateStore(str(tmp_path / "s3"))
        proc = NotificationProcessor(pipe, states)
        missing = tmp_path / "gone.ndjson"
        ev = {"bucket": "b", "name": "gone.ndjson", "path": str(missing)}
        body = {
            "message": {
                "data": base64.b64encode(json.dumps(ev).encode()).decode(),
                "message_id": "retry-1",
            }
        }
        r1 = proc.handle_pubsub(body)  # file missing → transient failure
        assert r1.ack == Ack.RETRY
        missing.write_text('{"k":"b","v":2,"ts":1700000001}\n')
        r2 = proc.handle_pubsub(body)  # redelivery after FAILED → re-acquired
        assert r2.ack == Ack.OK and r2.stats.total_rows == 1


class TestStructuredStreaming:
    def test_stream_ingest_drains_directory(self, spark, tmp_path):
        pipe, sink = _mini_pipeline(spark, tmp_path)
        src = tmp_path / "incoming"
        src.mkdir()
        for i in range(3):
            (src / f"f{i}.ndjson").write_text(
                "\n".join(json.dumps({"k": f"k{i}", "v": j, "ts": 1700000000 + j}) for j in range(5))
            )
        schema = T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("v", T.LongType()),
                T.StructField("ts", T.LongType()),
            ]
        )
        q = stream_ingest(
            spark,
            str(src),
            schema,
            pipe,
            "ev",
            checkpoint_dir=str(tmp_path / "ckpt"),
            available_now=True,
        )
        q.awaitTermination(120)
        df = sink.read_table(TableDest("ds", "t"))
        assert df.count() == 15
        # restart with no new files: checkpoint prevents re-ingestion
        q2 = stream_ingest(
            spark, str(src), schema, pipe, "ev",
            checkpoint_dir=str(tmp_path / "ckpt"), available_now=True,
        )
        q2.awaitTermination(120)
        assert sink.read_table(TableDest("ds", "t")).count() == 15


class TestPostingsLedgerReplay:
    def test_restart_is_idempotent_and_complete(self, spark, tmp_path):
        """The BM25 postings ledger's crash story, exercised: a stream
        lands two micro-batches and stops (the 'crash'), more data
        arrives, a NEW query against the SAME checkpoint replays only
        the unprocessed files, and a third run with nothing new appends
        nothing. The folded ledgers must then probe identically to the
        one-shot batch build — append-only + checkpoint = exactly-once
        index maintenance with no read-modify-write anywhere."""
        from swarm_spark.ops.retrieval import (
            bm25_postings,
            bm25_stats,
            bm25_topk,
            bm25_totals,
        )

        rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} shared") for i in range(40)]
        src = tmp_path / "in"
        src.mkdir()

        def write(i):
            lines = [
                json.dumps({"doc_id": d, "text": t})
                for d, t in rows[i * 10 : (i + 1) * 10]
            ]
            (src / f"f{i}.ndjson").write_text("\n".join(lines))

        led = {n: str(tmp_path / n) for n in ("post", "stats", "tot")}
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        )

        def land(batch_df, _epoch):
            p = bm25_postings(batch_df).persist()
            p.write.mode("append").parquet(led["post"])
            bm25_stats(p).write.mode("append").parquet(led["stats"])
            p.unpersist()
            bm25_totals(batch_df).write.mode("append").parquet(led["tot"])

        def run():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .json(str(src))
                .writeStream.foreachBatch(land)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)

        write(0), write(1)
        run()  # two micro-batches land, then the query stops ("crash")
        write(2), write(3)
        run()  # restart: ONLY the two new files replay
        run()  # nothing new: appends nothing
        # one totals row per processed micro-batch — 4, not 6/8
        assert spark.read.parquet(led["tot"]).count() == 4

        post = (
            spark.read.schema("id long, dl long, tok string, tf long")
            .parquet(led["post"])
            .groupBy("id", "dl", "tok")
            .agg(F.sum("tf").cast("long").alias("tf"))
        )
        stats = (
            spark.read.schema("tok string, df long")
            .parquet(led["stats"])
            .groupBy("tok")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        totals = spark.read.schema("n_docs long, tot_tokens long").parquet(led["tot"])
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        queries = docs.where(F.col("doc_id") % 10 == 0).select(
            F.col("doc_id").alias("query_id"), "text"
        )
        via_ledger = sorted(
            map(
                tuple,
                bm25_topk(
                    None, queries, k=3, postings=post, stats=stats, totals=totals
                ).collect(),
            )
        )
        direct = sorted(map(tuple, bm25_topk(docs, queries, k=3).collect()))
        assert via_ledger == direct


def _race_worker(args):
    """Cross-process acquire racer (module-level: must pickle)."""
    path, msg_id = args
    from swarm_spark.streaming.state import StateStore

    st = StateStore(path)
    state, acquired = st.get_or_create("race", msg_id)
    return acquired


class TestSharedStateStore:
    """Multi-driver semantics of the file-CAS ledger (X1 at
    cross-process scope): atomic acquire across real processes and
    fenced updates so a timed-out holder can't clobber a takeover."""

    def test_cross_process_acquire_race_single_winner(self, tmp_path):
        import multiprocessing as mp

        with mp.get_context("spawn").Pool(8) as pool:
            results = pool.map(_race_worker, [(str(tmp_path), "msg-1")] * 8)
        assert sum(results) == 1  # exactly one process acquired

    def test_fenced_update_rejects_stale_holder(self, tmp_path):
        clock = FakeClock()
        st = StateStore(str(tmp_path), timeout_s=60, clock=clock)
        a, acquired = st.get_or_create("m", "id9")
        assert acquired
        clock.t += 61  # holder A exceeds the state timeout
        b, acquired_b = st.get_or_create("m", "id9")
        assert acquired_b and b.request_id != a.request_id
        # A finishes late: its fenced update must be rejected...
        assert st.update("m", "id9", MsgState.COMPLETED, request_id=a.request_id) is False
        cur = st._read("m", "id9")
        assert cur.state == "running" and cur.request_id == b.request_id
        # ...and B's completes normally
        assert st.update("m", "id9", MsgState.COMPLETED, request_id=b.request_id) is True
        assert st._read("m", "id9").state == "completed"

    def test_unfenced_update_keeps_single_driver_behavior(self, tmp_path):
        st = StateStore(str(tmp_path), clock=FakeClock())
        st.get_or_create("m", "id3")
        assert st.update("m", "id3", MsgState.FAILED) is True
        assert st._read("m", "id3").state == "failed"

    def test_stale_lock_break_recovers_orphaned_message(self, tmp_path):
        """A SIGKILLed holder's lock must not wedge the message: a
        stale lock is broken (via atomic rename, not check-then-remove)
        and the message becomes acquirable again."""
        import os
        import time as _time

        st = StateStore(str(tmp_path), clock=FakeClock())
        lock = st._file("m", "id-orphan") + ".lock"
        with open(lock, "w") as f:
            f.write("dead-holder")
        old = _time.time() - 120  # > STALE_LOCK_S
        os.utime(lock, (old, old))
        _, acquired = st.get_or_create("m", "id-orphan")
        assert acquired
        assert not os.path.exists(lock + ".stale"), "tombstones must not linger"

    def test_break_stale_never_deletes_fresh_lock(self, tmp_path):
        """The breaker must verify staleness on the renamed tombstone:
        a lock that is FRESH stays in place (handed back), so a live
        holder is never evicted by a racing breaker."""
        import os

        st = StateStore(str(tmp_path), clock=FakeClock())
        lock = st._file("m", "id-live") + ".lock"
        with open(lock, "w") as f:
            f.write("live-holder")
        st._try_break_stale(lock)  # fresh mtime -> must be a no-op
        assert os.path.exists(lock)
        with open(lock) as f:
            assert f.read() == "live-holder"

    def test_release_is_identity_checked(self, tmp_path):
        """Releasing a lock whose file was broken and re-acquired by
        another holder must not delete the new holder's lock."""
        import os

        st = StateStore(str(tmp_path), clock=FakeClock())
        lock = st._file("m", "id-swap") + ".lock"
        got = st._acquire_lock(lock)
        assert got is not None
        fd, token = got
        # simulate: our lock was broken as stale and someone else now
        # holds a fresh lock at the same path
        os.remove(lock)
        with open(lock, "w") as f:
            f.write("new-holder-token")
        st._release_lock(lock, fd, token)
        assert os.path.exists(lock), "release deleted a lock it no longer owns"
        with open(lock) as f:
            assert f.read() == "new-holder-token"
