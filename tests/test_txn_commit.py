"""Atomic multi-table batch commit (TableTransaction) — crash-injection
coverage for the all-or-nothing G1 upgrade: a batch that fails after
staging some destinations leaves ZERO visible rows; a committed batch
is fully visible even if promotion crashed mid-move."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from swarm_spark.model import ModelError, TableDest
from swarm_spark.sinks import TableSink
from swarm_spark.sinks.table import STAGED_PREFIX, TableTransaction

DATA = T.StructType([T.StructField("v", T.LongType(), True)])


def _envelope_frame(spark, n, tag):
    return spark.range(n).select(
        F.concat(F.lit(f"{tag}-"), F.col("id").cast("string")).alias("id"),
        F.lit("ing1").alias("ingest_id"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp"),
        F.lit("2024-01-01 00:00:01").cast("timestamp").alias("ingested_at"),
        F.struct(F.col("id").alias("v")).alias("data"),
    )


DESTS = [TableDest("ds", f"t{i}") for i in range(3)]


def _prepare(spark, tmp_path):
    sink = TableSink(spark, str(tmp_path / "wh"))
    for d in DESTS:
        sink.ensure_table(d, DATA)
    return sink


class TestTransactionCommit:
    def test_commit_makes_all_tables_visible(self, spark, tmp_path):
        sink = _prepare(spark, tmp_path)
        txn = sink.transaction()
        for i, d in enumerate(DESTS):
            assert txn.stage(d, _envelope_frame(spark, 10 + i, d.table)) == 10 + i
        txn.commit()
        for i, d in enumerate(DESTS):
            assert sink.read_table(d).count() == 10 + i

    def test_crash_after_first_table_leaves_zero_visible_rows(self, spark, tmp_path):
        sink = _prepare(spark, tmp_path)
        txn = sink.transaction()
        txn.stage(DESTS[0], _envelope_frame(spark, 10, "t0"))
        # CRASH: the writer dies before staging t1/t2 — no commit, no
        # abort. Every destination must read back empty.
        del txn
        for d in DESTS:
            assert sink.read_table(d).count() == 0
        # a fresh sink instance (new process) sees the same nothing
        sink2 = TableSink(spark, sink.warehouse)
        for d in DESTS:
            assert sink2.read_table(d).count() == 0

    def test_abort_discards_staged_slices(self, spark, tmp_path):
        sink = _prepare(spark, tmp_path)
        txn = sink.transaction()
        txn.stage(DESTS[0], _envelope_frame(spark, 5, "t0"))
        txn.stage(DESTS[1], _envelope_frame(spark, 5, "t1"))
        txn.abort()
        for d in DESTS:
            assert sink.read_table(d).count() == 0
        assert not [
            n
            for n in os.listdir(os.path.join(sink.warehouse, "ds", "t0"))
            if n.startswith(STAGED_PREFIX)
        ]

    def test_crash_during_promotion_recovers_on_read(self, spark, tmp_path):
        """Manifest published, process dies before any file move: the
        manifest IS the commit, so readers must still see every row
        (promote-on-read finishes the moves)."""
        sink = _prepare(spark, tmp_path)
        txn = sink.transaction()
        for d in DESTS:
            txn.stage(d, _envelope_frame(spark, 7, d.table))
        # publish the manifest exactly as commit() does, then "crash"
        # before promotion by never calling it
        import json

        cdir = os.path.join(sink.warehouse, "_swarm_commits")
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(cdir, f"{txn.txn_id}.json"), "w") as f:
            json.dump({"txn": txn.txn_id, "tables": []}, f)
        for d in DESTS:
            assert sink.read_table(d).count() == 7

    def test_commit_is_idempotent_and_seals_the_txn(self, spark, tmp_path):
        sink = _prepare(spark, tmp_path)
        txn = sink.transaction()
        txn.stage(DESTS[0], _envelope_frame(spark, 3, "t0"))
        txn.commit()
        txn.commit()  # no-op
        assert sink.read_table(DESTS[0]).count() == 3
        with pytest.raises(ModelError):
            txn.stage(DESTS[1], _envelope_frame(spark, 3, "t1"))
        with pytest.raises(ModelError):
            txn.abort()

    def test_partitioned_slices_promote_into_partition_layout(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "tp", "day")
        sink.ensure_table(dest, DATA)
        txn = sink.transaction()
        txn.stage(dest, _envelope_frame(spark, 8, "tp"))
        txn.commit()
        assert sink.read_table(dest).count() == 8
        part_dirs = [
            n
            for n in os.listdir(os.path.join(sink.warehouse, "ds", "tp"))
            if "=" in n
        ]
        assert part_dirs  # __swarm_part=... subdirs survived promotion


class TestCompaction:
    def test_compact_reduces_files_preserves_rows(self, spark, tmp_path):
        sink = _prepare(spark, tmp_path)
        d = DESTS[0]
        for i in range(6):  # 6 batches x multiple part files each
            sink.append(d, _envelope_frame(spark, 5, f"b{i}").repartition(4))
        before_rows = sorted(r["id"] for r in sink.read_table(d).collect())
        files_before = len(sink._data_files(d))
        assert files_before >= 10
        stats = sink.compact(d)
        assert stats["files_before"] == files_before
        assert stats["files_after"] < files_before
        assert len(sink._data_files(d)) == stats["files_after"]
        after_rows = sorted(r["id"] for r in sink.read_table(d).collect())
        assert after_rows == before_rows

    def test_compact_partitioned_table_keeps_layout(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "tp", "day")
        sink.ensure_table(dest, DATA)
        for i in range(4):
            sink.append(dest, _envelope_frame(spark, 6, f"p{i}").repartition(3))
        before = sorted(r["id"] for r in sink.read_table(dest).collect())
        stats = sink.compact(dest)
        assert stats["files_after"] < stats["files_before"]
        assert sorted(r["id"] for r in sink.read_table(dest).collect()) == before
        part_dirs = [
            n
            for n in os.listdir(os.path.join(sink.warehouse, "ds", "tp"))
            if "=" in n
        ]
        assert part_dirs  # __swarm_part=... layout survived the rewrite

    def test_compact_crash_before_promotion_recovers_without_dups(
        self, spark, tmp_path, monkeypatch
    ):
        """Manifest published (with replaces), process dies before any
        delete/move: promote-on-read must yield each row exactly ONCE."""
        import swarm_spark.sinks.table as table_mod

        sink = _prepare(spark, tmp_path)
        d = DESTS[0]
        for i in range(4):
            sink.append(d, _envelope_frame(spark, 5, f"c{i}").repartition(3))
        before = sorted(r["id"] for r in sink.read_table(d).collect())

        monkeypatch.setattr(table_mod, "_promote", lambda *a, **k: None)
        sink.compact(d)  # stages + publishes manifest, promotion "crashes"
        monkeypatch.undo()

        got = sorted(r["id"] for r in sink.read_table(d).collect())
        assert got == before  # no duplicates, no loss
        # and recovery actually swapped the files (old gone, compacted in)
        assert len(sink._data_files(d)) < 12


class TestAtomicIngestMode:
    def test_schema_conflict_on_last_destination_rolls_back_all(
        self, spark, tmp_path, monkeypatch
    ):
        """G1 atomic mode end-to-end: destination 3 of 3 fails during
        staging -> IngestPartialFailure, and destinations 1-2 that had
        already staged show zero visible rows."""
        from swarm_spark.pipeline.ingest import IngestPartialFailure, IngestPipeline
        from swarm_spark.rules import EventRuleSet, SchemaRuleRegistry

        sink = _prepare(spark, tmp_path)
        pipe = IngestPipeline(
            spark,
            EventRuleSet([]),
            SchemaRuleRegistry(),
            sink,
            atomic=True,
        )
        orig_stage = TableTransaction.stage
        calls = []

        def failing_stage(self, dest, df):
            calls.append(dest.table)
            if len(calls) == 3:
                raise RuntimeError("disk full")
            return orig_stage(self, dest, df)

        monkeypatch.setattr(TableTransaction, "stage", failing_stage)
        enveloped = (
            _envelope_frame(spark, 6, "x")
            .withColumn(
                "dataset",
                F.lit("ds"),
            )
            .withColumn(
                "table",
                F.concat(F.lit("t"), (F.col("id").substr(3, 1).cast("long") % 3).cast("string")),
            )
            .withColumn("partition", F.lit(""))
        )
        from swarm_spark.pipeline.ingest import IngestStats

        stats = IngestStats(ingest_id="i1")
        with pytest.raises(IngestPartialFailure):
            pipe._write_routed(enveloped, stats)
        assert len(calls) == 3
        for d in DESTS:
            assert sink.read_table(d).count() == 0
        assert stats.rows_by_dest == {}

    def test_atomic_spans_all_source_groups(self, spark, tmp_path, monkeypatch):
        """load_objects with atomic=True must be all-or-nothing across
        SOURCE GROUPS, not per group: a failure while staging the second
        group's destination aborts the first group's already-staged
        rows too."""
        import json

        from swarm_spark.model import ObjectMeta, Source
        from swarm_spark.pipeline.ingest import (
            IngestPartialFailure,
            IngestPipeline,
        )
        from swarm_spark.rules import (
            EventRule,
            EventRuleSet,
            SchemaRuleRegistry,
            name_suffix,
            rule_output,
        )

        sink = _prepare(spark, tmp_path)
        rules = SchemaRuleRegistry()

        @rules.rule("ra")
        def ra(df):
            return rule_output(
                df,
                dataset="ds",
                table=F.lit("t0"),
                timestamp=F.lit(1.0),
                data=F.struct("payload"),
            )

        @rules.rule("rb")
        def rb(df):
            return rule_output(
                df,
                dataset="ds",
                table=F.lit("t1"),
                timestamp=F.lit(1.0),
                data=F.struct("payload"),
            )

        events = EventRuleSet(
            [
                EventRule("a", name_suffix(".a.ndjson"), (Source(schema="ra"),)),
                EventRule("b", name_suffix(".b.ndjson"), (Source(schema="rb"),)),
            ]
        )
        pipe = IngestPipeline(spark, events, rules, sink, atomic=True)
        pa = tmp_path / "x.a.ndjson"
        pa.write_text(json.dumps({"payload": "one"}) + "\n")
        pb = tmp_path / "x.b.ndjson"
        pb.write_text(json.dumps({"payload": "two"}) + "\n")

        orig_stage = TableTransaction.stage
        calls = []

        def failing_stage(self, dest, df):
            calls.append(dest.table)
            if len(calls) == 2:  # the second GROUP's destination
                raise RuntimeError("disk full")
            return orig_stage(self, dest, df)

        monkeypatch.setattr(TableTransaction, "stage", failing_stage)
        objs = [
            ObjectMeta(bucket="x", name="x.a.ndjson", path=str(pa)),
            ObjectMeta(bucket="x", name="x.b.ndjson", path=str(pb)),
        ]
        with pytest.raises(IngestPartialFailure) as ei:
            pipe.load_objects(objs)
        assert len(calls) == 2
        for d in DESTS:  # group 1's staged slice rolled back with group 2's
            assert sink.read_table(d).count() == 0
        # the aborted batch must not REPORT rows either: group 1's
        # staged counts were pending, not folded into stats (ADVICE r5)
        assert ei.value.stats.rows_by_dest == {}

        # happy path: same two groups, one shared txn, one commit
        monkeypatch.setattr(TableTransaction, "stage", orig_stage)
        stats = pipe.load_objects(objs)
        assert sink.read_table(DESTS[0]).count() == 1
        assert sink.read_table(DESTS[1]).count() == 1
        assert stats.total_rows == 2

    def test_atomic_mode_happy_path_commits_everything(self, spark, tmp_path):
        from swarm_spark.pipeline.ingest import IngestPipeline, IngestStats
        from swarm_spark.rules import EventRuleSet, SchemaRuleRegistry

        sink = _prepare(spark, tmp_path)
        pipe = IngestPipeline(
            spark, EventRuleSet([]), SchemaRuleRegistry(), sink, atomic=True
        )
        enveloped = (
            _envelope_frame(spark, 6, "x")
            .withColumn("dataset", F.lit("ds"))
            .withColumn(
                "table",
                F.concat(F.lit("t"), (F.col("id").substr(3, 1).cast("long") % 3).cast("string")),
            )
            .withColumn("partition", F.lit(""))
        )
        stats = IngestStats(ingest_id="i2")
        pipe._write_routed(enveloped, stats)
        assert sum(sink.read_table(d).count() for d in DESTS) == 6
        assert stats.total_rows == 6


class TestCompactDuringTransaction:
    """Compaction racing a staged transaction (VERDICT r5 #7): staged
    slices are invisible to compact's file listing, `replaces`
    manifests only ever name files that were visible when compact
    planned, and recovery completes both protocols without
    double-applying either."""

    def _seed(self, spark, sink, dest, batches=3, rows=4):
        for b in range(batches):
            sink.append(dest, _envelope_frame(spark, rows, f"seed{b}"))
        return batches * rows

    def test_compact_ignores_staged_slices_and_both_apply_once(
        self, spark, tmp_path
    ):
        sink = _prepare(spark, tmp_path)
        dest = DESTS[0]
        n_seed = self._seed(spark, sink, dest)

        txn = sink.transaction()
        txn.stage(dest, _envelope_frame(spark, 7, "staged"))
        # compact runs while the txn slice sits hidden: it must neither
        # fold the staged rows into the rewrite nor list them in
        # `replaces`
        res = sink.compact(dest, target_file_bytes=1 << 30)
        assert res["files_after"] < res["files_before"]
        assert sink.read_table(dest).count() == n_seed  # staged invisible

        txn.commit()
        df = sink.read_table(dest)
        assert df.count() == n_seed + 7
        ids = [r["id"] for r in df.select("id").collect()]
        assert len(ids) == len(set(ids)), "a row was applied twice"

    def test_unpromoted_compact_manifest_then_txn_commit(self, spark, tmp_path):
        """Compact reaches its durability point (manifest published)
        but dies before promotion; a transaction then commits; recovery
        must apply the compact exactly once and never touch the txn's
        files (replaces predates them)."""
        import json as _json

        from swarm_spark.sinks.table import COMMITS_DIR, _promote

        sink = _prepare(spark, tmp_path)
        dest = DESTS[0]
        n_seed = self._seed(spark, sink, dest)
        d = sink._dir(dest)

        # simulate compact-up-to-manifest: stage a compacted rewrite by
        # hand using the real protocol pieces, then "crash" (no promote)
        old = sink._data_files(dest)
        df = sink.read_table(dest)
        txn_id = "compact-crash-test"
        staged_dir = os.path.join(d, f"{STAGED_PREFIX}{txn_id}")
        env = sink.spark.read.schema(
            sink._read_schema(dest)
        ).parquet(*[os.path.join(d, f) for f in old])
        env.coalesce(1).write.mode("overwrite").parquet(staged_dir)
        cdir = os.path.join(sink.warehouse, COMMITS_DIR)
        os.makedirs(cdir, exist_ok=True)
        manifest = {
            "txn": txn_id,
            "kind": "compact",
            "tables": [{"dataset": dest.dataset, "table": dest.table,
                        "partition": dest.partition}],
            "replaces": old,
        }
        with open(os.path.join(cdir, f"{txn_id}.json"), "w") as f:
            _json.dump(manifest, f)

        # a transaction commits AFTER the orphaned compact manifest
        txn = sink.transaction()
        txn.stage(dest, _envelope_frame(spark, 5, "later"))
        txn.commit()

        # read triggers recovery of the compact manifest too
        total = sink.read_table(dest).count()
        assert total == n_seed + 5
        # repeated recovery is a no-op (idempotent, no double-apply)
        sink._recover(dest)
        df2 = sink.read_table(dest)
        assert df2.count() == n_seed + 5
        ids = [r["id"] for r in df2.select("id").collect()]
        assert len(ids) == len(set(ids))
        # the orphaned staged dir is gone after recovery
        assert not [
            n for n in os.listdir(d) if n.startswith(STAGED_PREFIX)
        ]


class TestRetention:
    def _partitioned(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "whr"))
        dest = TableDest("ds", "tr", "day")
        sink.ensure_table(dest, DATA)
        for day in ("2024-01-01", "2024-01-05", "2024-02-10"):
            df = spark.range(4).select(
                F.concat(F.lit(f"{day}-"), F.col("id").cast("string")).alias("id"),
                F.lit("ing1").alias("ingest_id"),
                F.lit(f"{day} 12:00:00").cast("timestamp").alias("timestamp"),
                F.lit(f"{day} 12:00:01").cast("timestamp").alias("ingested_at"),
                F.struct(F.col("id").alias("v")).alias("data"),
            )
            sink.append(dest, df)
        return sink, dest

    def test_expire_drops_old_partitions_only(self, spark, tmp_path):
        sink, dest = self._partitioned(spark, tmp_path)
        assert sink.read_table(dest).count() == 12
        stats = sink.expire_partitions(dest, before="2024-01-05")
        assert stats["partitions_removed"] == ["2024-01-01"]
        assert stats["files_removed"] >= 1
        rows = {r["id"] for r in sink.read_table(dest).collect()}
        assert len(rows) == 8
        assert not any(i.startswith("2024-01-01") for i in rows)
        # idempotent: nothing left below the cutoff
        again = sink.expire_partitions(dest, before="2024-01-05")
        assert again["partitions_removed"] == []

    def test_expire_validates_inputs(self, spark, tmp_path):
        sink, dest = self._partitioned(spark, tmp_path)
        with pytest.raises(ModelError):
            sink.expire_partitions(TableDest("ds", "tr"), before="2024-01-05")
        with pytest.raises(ModelError):
            sink.expire_partitions(dest, before="2024-1-5")  # wrong format
        with pytest.raises(ModelError):
            sink.expire_partitions(TableDest("ds", "nope", "day"), before="2024-01-05")

    def test_expire_recovers_staged_state_first(self, spark, tmp_path):
        """A committed-but-unpromoted txn slice for an expired day must
        not resurrect after expire: recovery runs under the same lock
        before the cutoff scan."""
        sink, dest = self._partitioned(spark, tmp_path)
        txn = sink.transaction()
        df = spark.range(2).select(
            F.concat(F.lit("old-"), F.col("id").cast("string")).alias("id"),
            F.lit("ing2").alias("ingest_id"),
            F.lit("2024-01-01 01:00:00").cast("timestamp").alias("timestamp"),
            F.lit("2024-01-01 01:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.col("id").alias("v")).alias("data"),
        )
        txn.stage(dest, df)
        # publish the manifest but crash before promotion
        os.makedirs(os.path.dirname(sink._commit_path(txn.txn_id)), exist_ok=True)
        import json as _json

        with open(sink._commit_path(txn.txn_id), "w", encoding="utf-8") as f:
            _json.dump({"txn": txn.txn_id, "tables": []}, f)
        stats = sink.expire_partitions(dest, before="2024-02-01")
        assert set(stats["partitions_removed"]) == {"2024-01-01", "2024-01-05"}
        rows = {r["id"] for r in sink.read_table(dest).collect()}
        assert rows == {f"2024-02-10-{i}" for i in range(4)}


DATA_STR = T.StructType([T.StructField("v", T.StringType(), True)])


class TestMergeById:
    def _partitioned(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "whm"))
        dest = TableDest("ds", "tm", "day")
        sink.ensure_table(dest, DATA_STR)
        for day in ("2024-01-01", "2024-02-10"):
            df = spark.range(4).select(
                F.concat(F.lit(f"{day}-"), F.col("id").cast("string")).alias("id"),
                F.lit("ing1").alias("ingest_id"),
                F.lit(f"{day} 12:00:00").cast("timestamp").alias("timestamp"),
                F.lit(f"{day} 12:00:01").cast("timestamp").alias("ingested_at"),
                F.struct(F.concat(F.lit("v1-"), F.col("id").cast("string")).alias("v")).alias("data"),
            )
            sink.append(dest, df)
        return sink, dest

    def test_replaces_colliding_ids_appends_new(self, spark, tmp_path):
        sink, dest = self._partitioned(spark, tmp_path)
        # batch: 2 corrected rows for Jan 1 (existing ids) + 1 new id
        batch = spark.createDataFrame(
            [("2024-01-01-0",), ("2024-01-01-1",), ("2024-01-01-9",)], "id string"
        ).select(
            "id",
            F.lit("ing2").alias("ingest_id"),
            F.lit("2024-01-01 13:00:00").cast("timestamp").alias("timestamp"),
            F.lit("2024-01-01 13:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.concat(F.lit("v2-"), F.col("id")).alias("v")).alias("data"),
        )
        stats = sink.merge_by_id(dest, batch)
        assert stats == {
            "rows_in": 3,
            "rows_replaced": 2,
            "partitions": ["2024-01-01"],
        }
        rows = {r["id"]: r["data"]["v"] for r in sink.read_table(dest).collect()}
        assert len(rows) == 9  # 8 original + 1 new, 2 replaced in place
        assert rows["2024-01-01-0"] == "v2-2024-01-01-0"  # replaced
        assert rows["2024-01-01-2"] == "v1-2"             # untouched survivor
        assert rows["2024-02-10-3"] == "v1-3"             # other partition intact
        assert rows["2024-01-01-9"] == "v2-2024-01-01-9"  # appended

    def test_merge_into_untouched_partition_is_append(self, spark, tmp_path):
        sink, dest = self._partitioned(spark, tmp_path)
        batch = spark.createDataFrame([("x-1",)], "id string").select(
            "id",
            F.lit("ing2").alias("ingest_id"),
            F.lit("2024-03-05 00:00:00").cast("timestamp").alias("timestamp"),
            F.lit("2024-03-05 00:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.lit("v2").alias("v")).alias("data"),
        )
        stats = sink.merge_by_id(dest, batch)
        assert stats["rows_replaced"] == 0 and stats["partitions"] == ["2024-03-05"]
        assert sink.read_table(dest).count() == 9

    def test_empty_batch_is_noop(self, spark, tmp_path):
        sink, dest = self._partitioned(spark, tmp_path)
        empty = sink.read_table(dest).limit(0)
        assert sink.merge_by_id(dest, empty) == {
            "rows_in": 0, "rows_replaced": 0, "partitions": [],
        }
        assert sink.read_table(dest).count() == 8

    def test_crash_before_promote_recovers_on_read(self, spark, tmp_path, monkeypatch):
        """Manifest published but promotion crashed: the next read must
        complete the merge (promote-on-read), not double-apply it."""
        import swarm_spark.sinks.table as tmod

        sink, dest = self._partitioned(spark, tmp_path)
        batch = spark.createDataFrame([("2024-01-01-0",)], "id string").select(
            "id",
            F.lit("ing2").alias("ingest_id"),
            F.lit("2024-01-01 13:00:00").cast("timestamp").alias("timestamp"),
            F.lit("2024-01-01 13:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.lit("v2").alias("v")).alias("data"),
        )
        real_promote = tmod._promote
        monkeypatch.setattr(tmod, "_promote", lambda *a, **k: None)
        sink.merge_by_id(dest, batch)
        monkeypatch.setattr(tmod, "_promote", real_promote)
        rows = {r["id"]: r["data"]["v"] for r in sink.read_table(dest).collect()}
        assert len(rows) == 8
        assert rows["2024-01-01-0"] == "v2"


class TestPartitionScopedCompaction:
    def test_compact_only_named_partitions(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "whpc"))
        dest = TableDest("ds", "tc", "day")
        sink.ensure_table(dest, DATA)
        for day in ("2024-01-01", "2024-02-10"):
            for b in range(3):  # several slices per partition
                df = spark.range(4).select(
                    F.concat(F.lit(f"{day}-{b}-"), F.col("id").cast("string")).alias("id"),
                    F.lit("ing1").alias("ingest_id"),
                    F.lit(f"{day} 12:00:00").cast("timestamp").alias("timestamp"),
                    F.lit(f"{day} 12:00:01").cast("timestamp").alias("ingested_at"),
                    F.struct(F.col("id").alias("v")).alias("data"),
                ).repartition(2)
                sink.append(dest, df)
        before = sink._data_files(dest)
        jan = [f for f in before if "2024-01-01" in f]
        feb = [f for f in before if "2024-02-10" in f]
        assert len(jan) >= 3 and len(feb) >= 3
        rows_before = sorted(r["id"] for r in sink.read_table(dest).collect())

        stats = sink.compact(dest, partitions=["2024-01-01"])
        after = sink._data_files(dest)
        jan_after = [f for f in after if "2024-01-01" in f]
        feb_after = [f for f in after if "2024-02-10" in f]
        assert len(jan_after) < len(jan)          # compacted
        assert sorted(feb_after) == sorted(feb)   # untouched, byte-for-byte names
        assert stats["files_before"] == len(jan)
        assert sorted(r["id"] for r in sink.read_table(dest).collect()) == rows_before

    def test_unknown_partition_is_noop(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "whpc2"))
        dest = TableDest("ds", "tc", "day")
        sink.ensure_table(dest, DATA)
        df = spark.range(2).select(
            F.concat(F.lit("a-"), F.col("id").cast("string")).alias("id"),
            F.lit("i").alias("ingest_id"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("timestamp"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ingested_at"),
            F.struct(F.col("id").alias("v")).alias("data"),
        )
        sink.append(dest, df)
        stats = sink.compact(dest, partitions=["1999-01-01"])
        assert stats["files_before"] == stats["files_after"]


class TestSnapshots:
    """Named snapshots pin an exact file set; maintenance retires
    (never deletes) replaced files; vacuum reclaims only what no
    snapshot references — the Delta remove-then-VACUUM lifecycle."""

    def _sink(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "snap")
        sink.ensure_table(dest, DATA)
        return sink, dest

    def test_snapshot_is_immune_to_later_appends(self, spark, tmp_path):
        sink, dest = self._sink(spark, tmp_path)
        sink.append(dest, _envelope_frame(spark, 5, "a"))
        n_files = len(sink._data_files(dest))
        assert sink.snapshot(dest, "run1") == {"name": "run1", "files": n_files}
        sink.append(dest, _envelope_frame(spark, 7, "b"))
        assert sink.read_table(dest).count() == 12
        assert sink.read_snapshot(dest, "run1").count() == 5
        assert sink.list_snapshots(dest) == [{"name": "run1", "files": n_files}]

    def test_duplicate_snapshot_name_always_raises(self, spark, tmp_path):
        """ADVICE r6: two creators of the same name must never silently
        overwrite — the manifest publishes via exclusive hard-link, so
        even a creator that slipped past the exists check (simulated by
        pre-creating the manifest after the check would have passed)
        raises instead of clobbering."""
        import os

        sink, dest = self._sink(spark, tmp_path)
        sink.append(dest, _envelope_frame(spark, 3, "a"))
        sink.snapshot(dest, "dup")
        before = os.path.getsize(sink._snap_path(dest, "dup"))
        with pytest.raises(ModelError, match="already exists"):
            sink.snapshot(dest, "dup")
        # the losing creator left no tmp litter and the manifest is intact
        sdir = os.path.dirname(sink._snap_path(dest, "dup"))
        assert [f for f in os.listdir(sdir) if ".tmp" in f] == []
        assert os.path.getsize(sink._snap_path(dest, "dup")) == before
        assert sink.read_snapshot(dest, "dup").count() == 3

    def test_snapshot_survives_compaction_until_vacuum(self, spark, tmp_path):
        sink, dest = self._sink(spark, tmp_path)
        for i in range(4):
            sink.append(dest, _envelope_frame(spark, 3, f"s{i}"))
        n_pinned = len(sink._data_files(dest))
        sink.snapshot(dest, "pinned")
        ids_before = {r["id"] for r in sink.read_snapshot(dest, "pinned").collect()}
        stats = sink.compact(dest)
        assert stats["files_after"] < stats["files_before"]
        # live read unchanged, snapshot still byte-exact via the
        # retired mirror
        assert sink.read_table(dest).count() == 12
        ids_after = {r["id"] for r in sink.read_snapshot(dest, "pinned").collect()}
        assert ids_after == ids_before
        # vacuum keeps every snapshot-referenced retired file
        v = sink.vacuum(dest)
        assert v["files_removed"] == 0 and v["files_kept"] == n_pinned
        assert sink.read_snapshot(dest, "pinned").count() == 12
        # dropping the snapshot releases the references
        sink.drop_snapshot(dest, "pinned")
        v = sink.vacuum(dest)
        assert v["files_kept"] == 0 and v["files_removed"] == n_pinned
        with pytest.raises(ModelError):
            sink.read_snapshot(dest, "pinned")

    def test_vacuumed_snapshot_fails_loudly_not_short(self, spark, tmp_path):
        sink, dest = self._sink(spark, tmp_path)
        sink.append(dest, _envelope_frame(spark, 4, "a"))
        sink.append(dest, _envelope_frame(spark, 4, "b"))
        sink.snapshot(dest, "pin")
        sink.compact(dest)
        # vacuum while the snapshot exists: nothing reclaimed
        assert sink.vacuum(dest)["files_removed"] == 0
        sink.drop_snapshot(dest, "pin")
        sink.vacuum(dest)
        # the manifest is gone with the snapshot; a fresh one can't
        # resurrect the vacuumed files
        with pytest.raises(ModelError):
            sink.read_snapshot(dest, "pin")

    def test_snapshot_pins_expired_partition(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "parts", "day")
        sink.ensure_table(dest, DATA)
        old = _envelope_frame(spark, 3, "old").withColumn(
            "timestamp", F.lit("2024-01-01 00:00:00").cast("timestamp")
        )
        new = _envelope_frame(spark, 4, "new").withColumn(
            "timestamp", F.lit("2024-03-01 00:00:00").cast("timestamp")
        )
        sink.append(dest, old)
        sink.append(dest, new)
        sink.snapshot(dest, "before-retention")
        got = sink.expire_partitions(dest, before="2024-02-01")
        assert got["partitions_removed"] == ["2024-01-01"]
        assert sink.read_table(dest).count() == 4
        # the pinned read still sees the expired partition's rows
        assert sink.read_snapshot(dest, "before-retention").count() == 7
        sink.drop_snapshot(dest, "before-retention")
        assert sink.vacuum(dest)["files_removed"] >= 1

    def test_snapshot_schema_is_as_of(self, spark, tmp_path):
        """Later schema evolution does not widen a pinned read."""
        sink, dest = self._sink(spark, tmp_path)
        sink.append(dest, _envelope_frame(spark, 2, "a"))
        sink.snapshot(dest, "v1")
        wider = T.StructType(
            [T.StructField("v", T.LongType(), True),
             T.StructField("extra", T.StringType(), True)]
        )
        sink.ensure_table(dest, wider)
        assert "extra" in sink.read_table(dest).schema["data"].dataType.names
        snap_fields = sink.read_snapshot(dest, "v1").schema["data"].dataType.names
        assert "extra" not in snap_fields

    def test_duplicate_and_bad_names_rejected(self, spark, tmp_path):
        sink, dest = self._sink(spark, tmp_path)
        sink.append(dest, _envelope_frame(spark, 1, "a"))
        sink.snapshot(dest, "x")
        with pytest.raises(ModelError):
            sink.snapshot(dest, "x")
        for bad in ("", "_hidden", ".dot", "a/b"):
            with pytest.raises(ModelError):
                sink.snapshot(dest, bad)
        with pytest.raises(ModelError):
            sink.drop_snapshot(dest, "nope")


class TestPartitionScopedRead:
    def test_only_selected_partitions_listed(self, spark, tmp_path):
        sink = TableSink(spark, str(tmp_path / "wh"))
        dest = TableDest("ds", "pr", "day")
        sink.ensure_table(dest, DATA)
        for day, n in (("2024-01-01", 3), ("2024-01-02", 4), ("2024-01-03", 5)):
            sink.append(
                dest,
                _envelope_frame(spark, n, day).withColumn(
                    "timestamp", F.lit(f"{day} 00:00:00").cast("timestamp")
                ),
            )
        assert sink.read_table(dest).count() == 12
        one = sink.read_table(dest, partitions=["2024-01-02"])
        assert one.count() == 4
        two = sink.read_table(dest, partitions=["2024-01-01", "2024-01-03"])
        assert two.count() == 8
        # pruning happens at the listing: fewer files reach the scan
        from swarm_spark.metrics import scan_summary

        one.collect()
        full = sink.read_table(dest)
        full.collect()
        assert scan_summary(one)["files_read"] < scan_summary(full)["files_read"]
        # missing partition -> empty, same schema
        assert sink.read_table(dest, partitions=["1999-01-01"]).count() == 0
        with pytest.raises(ModelError):
            TableSink(spark, str(tmp_path / "wh")).read_table(
                TableDest("ds", "pr"), partitions=["x"]
            )


class TestSnapshotMergeInterplay:
    def test_snapshot_survives_id_upsert(self, spark, tmp_path):
        """merge_by_id rewrites touched partitions through the retired
        mirror like compact — a snapshot taken before the upsert must
        still read the ORIGINAL values; vacuum honors its references
        until the snapshot drops."""
        sink = TableSink(spark, str(tmp_path / "whsm"))
        dest = TableDest("ds", "tsm", "day")
        sink.ensure_table(dest, DATA_STR)
        day = "2024-01-01"
        base = spark.range(4).select(
            F.concat(F.lit(f"{day}-"), F.col("id").cast("string")).alias("id"),
            F.lit("ing1").alias("ingest_id"),
            F.lit(f"{day} 12:00:00").cast("timestamp").alias("timestamp"),
            F.lit(f"{day} 12:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.concat(F.lit("v1-"), F.col("id").cast("string")).alias("v")).alias("data"),
        )
        sink.append(dest, base)
        sink.snapshot(dest, "pre-merge")
        batch = spark.createDataFrame([(f"{day}-0",)], "id string").select(
            "id",
            F.lit("ing2").alias("ingest_id"),
            F.lit(f"{day} 13:00:00").cast("timestamp").alias("timestamp"),
            F.lit(f"{day} 13:00:01").cast("timestamp").alias("ingested_at"),
            F.struct(F.concat(F.lit("v2-"), F.col("id")).alias("v")).alias("data"),
        )
        stats = sink.merge_by_id(dest, batch)
        assert stats["rows_replaced"] == 1
        live = {r["id"]: r["data"]["v"] for r in sink.read_table(dest).collect()}
        assert live[f"{day}-0"] == f"v2-{day}-0"
        snap = {
            r["id"]: r["data"]["v"]
            for r in sink.read_snapshot(dest, "pre-merge").collect()
        }
        assert snap[f"{day}-0"] == "v1-0"  # pinned pre-merge value
        assert len(snap) == 4
        # references hold through vacuum until the snapshot drops
        assert sink.vacuum(dest)["files_removed"] == 0
        sink.drop_snapshot(dest, "pre-merge")
        assert sink.vacuum(dest)["files_removed"] >= 1
