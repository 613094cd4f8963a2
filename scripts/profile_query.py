"""Profile one (or more) registry queries: wall time split into plan
construction / execution, plus per-job and per-stage breakdown parsed
from the Spark event log — the local-mode stand-in for the UI's Stages
tab (guide §1/§7; spark.ui is disabled in this sandbox).

Usage:
  python scripts/profile_query.py <query> [<query> ...] [--runs N] [--noop]

  --noop   time a noop-sink write instead of bench.py's collect()
  --runs   samples per query after one untimed warm-up (default 1)

Prints, per query: wall seconds per sample, then the event-log digest —
every job (description, duration) and its stages (duration, task count,
shuffle read/write bytes) sorted by duration.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 1
    for i, a in enumerate(sys.argv):
        if a == "--runs":
            runs = int(sys.argv[i + 1])
            args.remove(sys.argv[i + 1])
    use_noop = "--noop" in sys.argv

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import tempfile

    evdir = tempfile.mkdtemp(prefix="swarm_profile_ev_")

    from swarm_spark.session import get_spark

    spark = get_spark(
        app_name="swarm-profile",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )

    from swarm_spark.queries import all_queries

    core = all_queries()

    # bench.py's warm-ups: JVM, python workers, json machinery
    spark.range(1000).count()

    def _noop(it):
        import numpy  # noqa: F401, PLC0415
        import pandas  # noqa: F401, PLC0415

        yield from it

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        _noop, "id long"
    ).count()

    from pyspark.sql import functions as F

    warm_dir = tempfile.mkdtemp(prefix="swarm_profile_warm_")
    spark.range(256).select(
        F.to_json(F.struct(F.col("id"), F.lit("warm").alias("s"))).alias("value")
    ).repartition(4).write.mode("overwrite").text(warm_dir)
    spark.read.json(warm_dir).count()

    results = {}
    for name in args:
        if name not in core:
            print(f"!! unknown query {name}")
            continue
        fn = core[name][0]
        # untimed warm-up (bench methodology)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        fn(spark, sf_dir).collect()
        walls = []
        for r in range(runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"profile[{r}]: {name}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            if use_noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            t2 = time.perf_counter()
            walls.append((round(t1 - t0, 3), round(t2 - t1, 3)))
        results[name] = walls
        print(f"{name}: build+exec per run {walls}", flush=True)
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # -------- event log digest (v2 logs are directories of
    # optionally-zstd-compressed event files)
    ev_files = []
    for root, _dirs, files in os.walk(evdir):
        for f in files:
            if f.startswith(("events", "local-")) or f.endswith(".zstd"):
                ev_files.append(os.path.join(root, f))
    jobs = {}  # id -> dict
    stages = {}  # id -> dict

    def _open(path):
        if path.endswith(".zstd"):
            import io
            import subprocess

            out = subprocess.run(
                ["zstdcat", path], capture_output=True, check=True
            ).stdout
            return io.StringIO(out.decode())
        return open(path)

    for path in ev_files:
        with _open(path) as fh:
            for line in fh:
                try:
                    e = json.loads(line)
                except json.JSONDecodeError:
                    continue
                ev = e.get("Event")
                if ev == "SparkListenerJobStart":
                    jid = e["Job ID"]
                    jobs[jid] = {
                        "desc": e.get("Properties", {}).get(
                            "spark.job.description", ""
                        ),
                        "t0": e.get("Submission Time", 0),
                        "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])],
                    }
                elif ev == "SparkListenerJobEnd":
                    jid = e["Job ID"]
                    if jid in jobs:
                        jobs[jid]["t1"] = e.get("Completion Time", 0)
                elif ev == "SparkListenerStageCompleted":
                    si = e["Stage Info"]
                    sid = si["Stage ID"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    # UPDATE, don't replace: TaskEnd events for this
                    # stage have already accumulated metrics here
                    st = stages.setdefault(sid, {})
                    st["name"] = si.get("Stage Name", "")[:80]
                    st["dur_ms"] = (comp - sub) if (sub and comp) else None
                    st["tasks"] = si.get("Number of Tasks")
                elif ev == "SparkListenerTaskEnd":
                    # Spark 4.x event logs carry task metrics as
                    # internal.metrics.* accumulable updates, not a
                    # "Task Metrics" object
                    sid = e["Stage ID"]
                    st = stages.setdefault(sid, {})
                    acc = {
                        a.get("Name"): a.get("Update")
                        for a in (e.get("Task Info") or {}).get(
                            "Accumulables", []
                        )
                        if str(a.get("Name", "")).startswith(
                            "internal.metrics."
                        )
                    }

                    def _i(name):
                        try:
                            return int(acc.get(f"internal.metrics.{name}", 0))
                        except (TypeError, ValueError):
                            return 0

                    st["sh_read"] = (
                        st.get("sh_read", 0)
                        + _i("shuffle.read.localBytesRead")
                        + _i("shuffle.read.remoteBytesRead")
                    )
                    st["sh_write"] = st.get("sh_write", 0) + _i(
                        "shuffle.write.bytesWritten"
                    )
                    st["task_ms"] = st.get("task_ms", 0) + _i(
                        "executorRunTime"
                    )
                    st["gc_ms"] = st.get("gc_ms", 0) + _i("jvmGCTime")
                    st["spill"] = st.get("spill", 0) + _i(
                        "diskBytesSpilled"
                    )

    print("\n===== event-log digest (profile jobs only) =====")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "profile" not in j.get("desc", ""):
            continue
        dur = (j.get("t1", 0) - j.get("t0", 0)) / 1000.0
        print(f"\njob {jid} [{j['desc']}] {dur:.3f}s")
        jst = [(sid, stages[sid]) for sid in j["stages"] if sid in stages]
        jst = [x for x in jst if x[1].get("dur_ms")]
        jst.sort(key=lambda x: -(x[1].get("dur_ms") or 0))
        for sid, st in jst[:12]:
            print(
                f"  stage {sid} {st.get('dur_ms', 0) / 1000.0:>7.3f}s"
                f" tasks={st.get('tasks'):>3}"
                f" taskms={st.get('task_ms', 0):>7}"
                f" gcms={st.get('gc_ms', 0):>6}"
                f" spill={st.get('spill', 0):>9}"
                f" shR={st.get('sh_read', 0):>9}"
                f" shW={st.get('sh_write', 0):>9}"
                f"  {st.get('name', '')}"
            )
    njobs = {}
    for jid, j in jobs.items():
        if "profile" in j.get("desc", ""):
            key = j["desc"].split(": ", 1)[-1]
            njobs.setdefault(key, []).append(
                (j.get("t1", 0) - j.get("t0", 0)) / 1000.0
            )
    print("\n===== per-query job counts =====")
    for k, v in njobs.items():
        print(
            f"{k}: {len(v)} jobs, sum {sum(v):.3f}s,"
            f" jobs>0.2s: {[round(x, 2) for x in sorted(v, reverse=True) if x > 0.2]}"
        )


if __name__ == "__main__":
    main()
