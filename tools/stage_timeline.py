"""Stage-level timeline for one bench-style pass of a query (guide §1/§7:
which stage owns the wall).  Runs warm-up passes, then ONE timed pass with
the Spark event log on, and prints each job/stage of the timed pass with
submit/complete offsets so serialization (gaps, chains) is visible.

Usage: SPARK_GRAFT_CPUS=32 python tools/stage_timeline.py dp_neardup_scale
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LOG_DIR = "/tmp/yupana_eventlog"


def main() -> None:
    os.makedirs(LOG_DIR, exist_ok=True)
    os.environ["SPARK_GRAFT_EVENTLOG"] = "1"
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (SparkSession.builder.appName("stage-timeline")
             .master(f"local[{cpus}]")
             .config("spark.eventLog.enabled", "true")
             .config("spark.eventLog.dir", LOG_DIR)
             .config("spark.eventLog.compress", "false")
             .config("spark.eventLog.rolling.enabled", "false")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    from yupana_spark.session import ensure_engine_confs

    ensure_engine_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as ent

    name = sys.argv[1]
    qs = ent.queries()

    def _noop(df):
        df.write.format("noop").mode("overwrite").save()

    for _ in range(2):
        _noop(qs[name](spark, SF_DIR))
    spark.sparkContext.setJobDescription(f"TIMED:{name}")
    t0 = time.time()
    _noop(qs[name](spark, SF_DIR))
    wall = time.time() - t0
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # Spark 4 rolling layout: eventlog_v2_<app>/events_*; plain file when
    # rolling/compression are disabled (this tool disables both)
    import glob

    paths = (glob.glob(os.path.join(LOG_DIR, f"eventlog_v2_{app_id}",
                                    "events_*"))
             or [os.path.join(LOG_DIR, app_id)])
    jobs, stages, t_first, task_agg = {}, {}, None, {}
    for path in sorted(paths):
        lines = open(path).read().splitlines()
        for line in lines:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = ev.get("Properties", {}).get(
                    "spark.job.description", "")
                jobs[ev["Job ID"]] = {
                    "desc": desc, "t0": ev["Submission Time"],
                    "stages": [s["Stage ID"]
                               for s in ev["Stage Infos"]]}
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                sid = ev["Stage ID"]
                agg = task_agg.setdefault(sid, {"run": 0, "deser": 0,
                                                "gc": 0, "max_run": 0})
                run = m.get("Executor Run Time", 0)
                agg["run"] += run
                agg["max_run"] = max(agg["max_run"], run)
                agg["deser"] += m.get("Executor Deserialize Time", 0)
                agg["gc"] += m.get("JVM GC Time", 0)
                agg["w_rec"] = agg.get("w_rec", 0) + (
                    m.get("Shuffle Write Metrics") or {}).get(
                        "Shuffle Records Written", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                agg["r_rec"] = agg.get("r_rec", 0) + sr.get(
                    "Total Records Read", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc_ = ri.get("Scope")
                    if sc_:
                        nm = json.loads(sc_).get("name", "")
                        if nm and nm not in scopes:
                            scopes.append(nm)
                stages[si["Stage ID"]] = {
                    "name": " | ".join(reversed(scopes))[:110]
                    or si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "t0": si.get("Submission Time"),
                    "t1": si.get("Completion Time")}
    timed = {jid: j for jid, j in jobs.items()
             if j["desc"].startswith("TIMED:")}
    if not timed:
        print("no TIMED jobs found")
        return
    t_first = min(j["t0"] for j in timed.values())
    print(f"wall {wall:.3f}s; {len(timed)} jobs in timed pass")
    for jid in sorted(timed):
        j = timed[jid]
        print(f"job {jid}: +{(j['t0']-t_first)/1e3:7.3f} -> "
              f"+{(j.get('t1', j['t0'])-t_first)/1e3:7.3f}s")
        for sid in sorted(j["stages"]):
            s = stages.get(sid)
            if not s or s["t0"] is None:
                continue
            ta = task_agg.get(sid, {})
            met = (f" run_sum {ta['run'] / 1e3:.3f}s max_task "
                   f"{ta['max_run'] / 1e3:.3f}s deser "
                   f"{ta['deser'] / 1e3:.3f}s gc {ta['gc'] / 1e3:.3f}s "
                   f"rows_in {ta.get('r_rec', 0)} "
                   f"rows_out {ta.get('w_rec', 0)}"
                   if ta else "")
            print(f"  stage {sid:4d} +{(s['t0']-t_first)/1e3:7.3f} -> "
                  f"+{(s['t1']-t_first)/1e3:7.3f}s "
                  f"({s['tasks']:3d} tasks){met} {s['name']}")


if __name__ == "__main__":
    main()
