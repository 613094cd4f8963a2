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
