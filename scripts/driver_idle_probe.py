#!/usr/bin/env python
"""Attribute the flagship's serial (driver-side) time via the Spark event log.

The two-point Amdahl fit over the recorded N/4N pair implies ~40 s of
effectively-serial time per 500k-row run; ~13 s of it was measured as
driver-idle in round 4. Serial seconds subtract from BOTH legs of the
scaling pair, so each one removed lowers the host-window quality the raw
≥0.8 gate needs. This probe runs ONE warm flagship at a single parallelism
level with the event log on, then reports:

 - every gap ≥ gap_min ms between consecutive Spark jobs inside the timed
   region (driver was thinking: Catalyst analysis, Py4J round trips,
   driver-side union-find, broadcast creation),
 - per-job wall time with the job's callsite description,
 - totals: timed wall, in-job time, inter-job driver idle.

Usage: python scripts/driver_idle_probe.py [rows] [cores] [gap_min_ms]
Prints one JSON line; human-readable table to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    gap_min = int(sys.argv[3]) if len(sys.argv) > 3 else 150

    from kgpipe_spark.corpus import seed_kg, synth_corpus
    from kgpipe_spark.pipelines import run_flagship
    from kgpipe_spark.session import get_spark

    evdir = f"/tmp/kgpipe_eventlog_{os.getpid()}"
    os.makedirs(evdir, exist_ok=True)
    extra = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": evdir,
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    }
    # A/B hook: KGPIPE_PROBE_EXTRA_CONF='{"spark.sql.adaptive.enabled":"false"}'
    extra.update(json.loads(os.environ.get("KGPIPE_PROBE_EXTRA_CONF", "{}")))
    spark = get_spark(
        app_name="kgpipe-driver-idle-probe",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
        extra_conf=extra,
    )

    corpus_path = os.path.join(os.environ.get("TMPDIR", "/tmp"), f"kgpipe_corpus_{rows}")
    if not os.path.exists(os.path.join(corpus_path, "_SUCCESS")):
        synth_corpus(spark, rows).write.mode("overwrite").parquet(corpus_path)
    corpus = spark.read.parquet(corpus_path)
    seed = seed_kg(spark)

    # same warm protocol as the scaling runs (steady state, small corpus)
    warm_path = os.path.join(os.environ.get("TMPDIR", "/tmp"), f"kgpipe_corpus_{max(rows // 8, 20_000)}")
    if not os.path.exists(os.path.join(warm_path, "_SUCCESS")):
        synth_corpus(spark, max(rows // 8, 20_000)).write.mode("overwrite").parquet(warm_path)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_flagship(spark, spark.read.parquet(warm_path), seed).count()
    spark.catalog.clearCache()

    t0 = time.time() * 1000
    n = run_flagship(spark, corpus, seed).count()
    t1 = time.time() * 1000
    app_id = spark.sparkContext.applicationId
    spark.stop()  # flush the event log

    # ---- parse the event log ----
    ev_root = [os.path.join(evdir, f) for f in os.listdir(evdir) if app_id in f][0]
    if os.path.isdir(ev_root):  # Spark 4 rolling event log directory
        ev_files = sorted(
            os.path.join(ev_root, f) for f in os.listdir(ev_root) if f.startswith("events")
        )
    else:
        ev_files = [ev_root]
    jobs: dict[int, dict] = {}
    for ev_file in ev_files:
        _parse_events(ev_file, jobs)
    timed = sorted(
        (j for j in jobs.values() if "end" in j and j["start"] >= t0 and j["end"] <= t1 + 1000),
        key=lambda j: j["start"],
    )
    gaps = []
    prev_end = t0
    prev_site = "(timed-region start)"
    for j in timed:
        gap = j["start"] - prev_end
        if gap >= gap_min:
            gaps.append(
                {
                    "idle_ms": int(gap),
                    "after": prev_site,
                    "before_job": j["callsite"],
                }
            )
        prev_end = max(prev_end, j["end"])
        prev_site = j["callsite"]
    tail = t1 - prev_end
    if tail >= gap_min:
        gaps.append({"idle_ms": int(tail), "after": prev_site, "before_job": "(timed-region end)"})

    wall = t1 - t0
    # overlapping jobs would make a sum of per-job durations an overestimate
    # of busy wall; idle sums the strictly-empty stretches, which is the
    # number that matters
    idle = int(wall - _union_ms(timed, t0, t1))

    for g in sorted(gaps, key=lambda g: -g["idle_ms"])[:20]:
        print(f"  {g['idle_ms']:>6} ms idle  after [{g['after']}]  before [{g['before_job']}]", file=sys.stderr)
    report = {
        "rows": rows,
        "cores": cores,
        "triples": n,
        "timed_wall_ms": int(wall),
        "n_jobs": len(timed),
        "driver_idle_ms": idle,
        "idle_pct": round(100 * idle / wall, 1),
        "gaps_over_min": gaps,
        "loadavg": round(os.getloadavg()[0], 2),
    }
    print(json.dumps(report))
    return 0


def _parse_events(path: str, jobs: dict[int, dict]) -> None:
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerJobStart":
                site = ev.get("Properties", {}).get("callSite.short", "")
                if not site:
                    stages = ev.get("Stage Infos", [])
                    site = stages[-1]["Stage Name"] if stages else ""
                jobs[ev["Job ID"]] = {
                    "start": ev["Submission Time"],
                    "callsite": site,
                }
            elif ev.get("Event") == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]


def _union_ms(jobs: list[dict], t0: float, t1: float) -> float:
    """Total wall time covered by ≥1 running job inside [t0, t1]."""
    spans = sorted((max(j["start"], t0), min(j["end"], t1)) for j in jobs)
    covered = 0.0
    cur_s, cur_e = None, None
    for s, e in spans:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return covered


if __name__ == "__main__":
    sys.exit(main())
