"""Pipeline driver: stage composition + content-addressed checkpoint/resume
(SURVEY.md §3, §4.2.6).

Mirrors the reference's execution model without its file-format planner:
 - ``KgPipe.build``'s sha256 hash chain over (prev_hash, task name, config)
   (`/root/reference/src/kgpipe/common/model/pipeline.py:141-185`) →
   ``Stage.key`` chained into a manifest key.
 - "skip task if outputs exist" (`task.py:114-117`, `pipeline.py:305-318`) →
   skip stage if a parquet snapshot for (chain_hash) exists.
 - ``exec-plan.json`` / ``exec-report.json`` (`helpers.py:100-130`) →
   ``manifest.json`` rows with stage, key, row counts, duration, partitions
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
                n_rows = df.count()
            else:
                df = stage.fn(df)
                if snap:
                    df.write.mode("overwrite").parquet(snap)
                    df = self.spark.read.parquet(snap)
                status = "done"
                n_rows = df.count()
            self.report.append(
                {
                    "stage": stage.name,
                    "key": key,
                    "status": status,
                    "rows": n_rows,
                    "partitions": df.rdd.getNumPartitions(),
                    "duration_sec": round(time.time() - t0, 3),
                    "config": stage.config,
                }
            )
            prev_hash = key
        if self.checkpoint_dir:
            with open(os.path.join(self.checkpoint_dir, "manifest.json"), "w") as f:
                json.dump(self.report, f, indent=2)
        return df
