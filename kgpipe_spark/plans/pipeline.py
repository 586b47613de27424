"""Pipeline driver: stage composition + content-addressed checkpoint/resume
(SURVEY.md §3, §4.2.6).

Mirrors the reference's execution model without its file-format planner:
 - ``KgPipe.build``'s sha256 hash chain over (prev_hash, task name, config)
   (`/root/reference/src/kgpipe/common/model/pipeline.py:141-185`) →
   ``Stage.key`` chained into a manifest key.
 - "skip task if outputs exist" (`task.py:114-117`, `pipeline.py:305-318`) →
   skip stage if a parquet snapshot for (chain_hash) exists.
 - ``exec-plan.json`` / ``exec-report.json`` (`helpers.py:100-130`) →
   ``manifest.json`` rows with stage, key, row counts, duration, partitions,
   and a per-partition skew summary; the full per-partition row histogram of
   each materialized snapshot goes to a ``lineage-{key}.json`` sidecar
   (the north rule's per-partition lineage + metrics).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# lineage sidecars list one (partition_id, rows) entry per non-empty
# partition; cap the JSON at this many entries (a 200k-partition stage on a
# 1000-executor cluster would otherwise write multi-MB sidecars) — the skew
# summary in the manifest is always computed over ALL partitions first.
_LINEAGE_MAX_PARTITIONS = 65_536


def fingerprint_parquet_dir(path: str) -> str:
    """Content fingerprint of an input directory: sha256 over the sorted
    (relative path, size, mtime_ns) listing of every data file (dotfiles and
    ``_SUCCESS``-style markers excluded). Changed data at the SAME path
    changes the fingerprint, so a resume never replays stale snapshots.
    Non-directories (e.g. a table identifier) hash the string itself."""
    if not os.path.isdir(path):
        return hashlib.sha256(path.encode()).hexdigest()[:16]
    entries = []
    for root, _dirs, files in os.walk(path):
        for fname in files:
            if fname.startswith(("_", ".")):
                continue
            fp = os.path.join(root, fname)
            st = os.stat(fp)
            entries.append((os.path.relpath(fp, path), st.st_size, st.st_mtime_ns))
    payload = json.dumps(sorted(entries))
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def code_token(*fns: Callable) -> str:
    """sha256 over the source text of the given callables — fold into
    ``Stage.config`` so editing stage code invalidates its snapshot and
    everything downstream of it in the hash chain."""
    parts = []
    for fn in fns:
        try:
            parts.append(inspect.getsource(fn))
        except (OSError, TypeError):
            parts.append(getattr(fn, "__qualname__", repr(fn)))
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()[:16]


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    config: dict = field(default_factory=dict)

    def key(self, prev_hash: str) -> str:
        # the stage's own source participates in the key (in addition to any
        # explicit config["code"] token for helpers the lambda closes over)
        payload = json.dumps(
            {
                "prev": prev_hash,
                "name": self.name,
                "config": self.config,
                "code": code_token(self.fn),
            },
            sort_keys=True,
        )
        return hashlib.sha256(payload.encode()).hexdigest()[:16]


class Pipeline:
    """Linear stage list over one flowing DataFrame, checkpointed per stage."""

    def __init__(self, spark: SparkSession, stages: list[Stage], checkpoint_dir: str | None = None):
        self.spark = spark
        self.stages = stages
        self.checkpoint_dir = checkpoint_dir
        self.report: list[dict] = []

    def _snapshot_path(self, key: str) -> str:
        assert self.checkpoint_dir
        return os.path.join(self.checkpoint_dir, f"stage-{key}.parquet")

    def _partition_lineage(self, df: DataFrame, key: str) -> tuple[int, dict]:
        """One aggregation job per stage (replaces the plain count): per-
        partition row counts of the materialized snapshot. Collect size is
        bounded by the partition count, not the data. Returns (total_rows,
        skew summary) and writes the full histogram to a lineage sidecar."""
        pp = sorted(
            (r["pid"], r["rows"])
            for r in df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        )
        counts = [rows for _, rows in pp]
        total = sum(counts)
        mean = total / len(counts) if counts else 0.0
        summary = {
            "non_empty": len(counts),
            "min_rows": min(counts) if counts else 0,
            "max_rows": max(counts) if counts else 0,
            "mean_rows": round(mean, 1),
            "skew_ratio": round(max(counts) / mean, 2) if counts and mean else 1.0,
        }
        if self.checkpoint_dir:
            sidecar = {
                "stage_key": key,
                "rows": total,
                "summary": summary,
                "truncated": len(pp) > _LINEAGE_MAX_PARTITIONS,
                "partition_rows": pp[:_LINEAGE_MAX_PARTITIONS],
            }
            with open(os.path.join(self.checkpoint_dir, f"lineage-{key}.json"), "w") as f:
                json.dump(sidecar, f)
        return total, summary

    def _load_lineage(self, df: DataFrame, key: str) -> tuple[int, dict]:
        if self.checkpoint_dir:
            sidecar = os.path.join(self.checkpoint_dir, f"lineage-{key}.json")
            if os.path.exists(sidecar):
                with open(sidecar) as f:
                    rec = json.load(f)
                return rec["rows"], rec["summary"]
        return df.count(), {}

    def run(self, df: DataFrame, input_fingerprint: str = "source") -> DataFrame:
        prev_hash = hashlib.sha256(input_fingerprint.encode()).hexdigest()[:16]
        self.report = []
        for stage in self.stages:
            key = stage.key(prev_hash)
            t0 = time.time()
            snap = self._snapshot_path(key) if self.checkpoint_dir else None
            if snap and os.path.exists(snap):
                df = self.spark.read.parquet(snap)
                status = "skipped"
            else:
                df = stage.fn(df)
                if snap:
                    df.write.mode("overwrite").parquet(snap)
                    df = self.spark.read.parquet(snap)
                status = "done"
            if status == "skipped":
                # resume stays cheap: the lineage sidecar was written when the
                # stage ran, so reload it instead of re-scanning the snapshot;
                # a missing sidecar (pre-lineage checkpoint dir) falls back to
                # a metadata-only parquet count, never a full aggregation
                n_rows, partition_summary = self._load_lineage(df, key)
            else:
                n_rows, partition_summary = self._partition_lineage(df, key)
            self.report.append(
                {
                    "stage": stage.name,
                    "key": key,
                    "status": status,
                    "rows": n_rows,
                    "partitions": df.rdd.getNumPartitions(),
                    "partition_rows": partition_summary,
                    "duration_sec": round(time.time() - t0, 3),
                    "config": stage.config,
                }
            )
            prev_hash = key
        if self.checkpoint_dir:
            with open(os.path.join(self.checkpoint_dir, "manifest.json"), "w") as f:
                json.dump(self.report, f, indent=2)
        return df
