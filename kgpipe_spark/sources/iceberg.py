"""Iceberg-style table sink/scan seam (SURVEY.md §7.0 "Iceberg-or-parquet").

The north rule targets an Iceberg-style table of KG triples. On a real
cluster this module routes through Spark's Iceberg catalog integration
(`df.writeTo("cat.db.tbl").append()` — snapshot isolation, hidden
partitioning, schema evolution); this sandbox ships no Iceberg runtime, so
the same API degrades to a parquet directory plus a JSON sidecar carrying
the table properties — the layout every call site already understands.

The property mapping mirrors the reference's ``DataSet`` contract
(`/root/reference/src/kgpipe/common/model/data.py:78-101`): a dataset is
(id, name, path, format, description, metadata); those travel as Iceberg
table properties (``kgpipe.id``, ``kgpipe.name``, ...) so a catalog listing
reproduces the reference's dataset registry.

Catalog detection: any ``spark.sql.catalog.<name>`` conf whose value is an
Iceberg SparkCatalog enables the native path for tables addressed as
``<name>.<db>.<table>``; bare paths always take the parquet fallback.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

_PROPS_SIDECAR = "_table_properties.json"
_TABLE_RE = re.compile(r"^\w+\.\w+(\.\w+)+$")


def dataset_properties(
    dataset_id: str = "",
    name: str = "",
    fmt: str = "parquet",
    description: Optional[str] = None,
    metadata: Optional[Dict[str, Any]] = None,
) -> Dict[str, str]:
    """DataSet fields → flat string table properties (Iceberg requires
    string→string), ``kgpipe.``-prefixed to avoid colliding with engine
    properties like ``write.format.default``."""
    props = {
        "kgpipe.id": dataset_id,
        "kgpipe.name": name,
        "kgpipe.format": fmt,
    }
    if description:
        props["kgpipe.description"] = description
    for k, v in (metadata or {}).items():
        props[f"kgpipe.meta.{k}"] = json.dumps(v) if not isinstance(v, str) else v
    return props


def _iceberg_catalog_names(spark: SparkSession) -> set:
    out = set()
    for k, v in spark.sparkContext.getConf().getAll():
        m = re.fullmatch(r"spark\.sql\.catalog\.(\w+)", k)
        if m and "iceberg" in v.lower():
            out.add(m.group(1))
    return out


def is_catalog_table(spark: SparkSession, table: str) -> bool:
    """True iff ``table`` addresses a configured Iceberg catalog
    (``cat.db.tbl`` with ``spark.sql.catalog.cat`` set); path-like targets
    (anything with a '/' or no configured catalog) are parquet dirs."""
    if "/" in table or not _TABLE_RE.match(table):
        return False
    return table.split(".", 1)[0] in _iceberg_catalog_names(spark)


def write_table(
    df: DataFrame,
    table: str,
    mode: str = "append",
    properties: Optional[Dict[str, str]] = None,
    partition_by: Optional[list] = None,
) -> None:
    """Write ``df`` to an Iceberg table (catalog configured) or a parquet
    dir (fallback). ``mode`` is "append" or "overwrite" — on the Iceberg
    path these are snapshot-atomic (`writeTo().append()` /
    `createOrReplace()`); on the parquet path they map to the classic
    DataFrameWriter modes."""
    if is_catalog_table(df.sparkSession, table):
        w = df.writeTo(table).using("iceberg")
        for k, v in (properties or {}).items():
            w = w.tableProperty(k, v)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        elif not df.sparkSession.catalog.tableExists(table):
            # DataFrameWriterV2.append() never creates (and partitionedBy
            # only applies to create ops): first write must be create()
            w.create()
        else:
            w.append()
        return
    existing: Dict[str, str] = {}
    sidecar = os.path.join(table, _PROPS_SIDECAR)
    if mode == "append" and os.path.exists(sidecar):
        with open(sidecar) as f:
            existing = json.load(f)
    # a table's partition spec is fixed at creation (Iceberg semantics):
    # appends reuse the recorded spec so partitioned and flat files never mix
    # in one directory (which breaks parquet partition discovery)
    recorded = existing.get("kgpipe.partition_by", "")
    recorded_spec = recorded.split(",") if recorded else []
    if partition_by is None:
        partition_by = recorded_spec
    elif existing and list(partition_by) != recorded_spec:
        # the sidecar exists, so the table was already created with a spec
        # (possibly flat); a differing explicit spec would mix layouts
        raise ValueError(
            f"partition spec is fixed at creation: table {table!r} was "
            f"created with partition_by={recorded_spec!r}, append "
            f"requested {list(partition_by)!r}"
        )
    writer = df.write.mode("overwrite" if mode == "overwrite" else "append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(table)
    # always record the spec (empty string = flat) so later appends validate
    existing["kgpipe.partition_by"] = ",".join(partition_by)
    existing.update(properties or {})
    with open(sidecar, "w") as f:
        json.dump(existing, f, indent=2, sort_keys=True)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Scan an Iceberg table (catalog path — time travel via
    ``spark.read.option('snapshot-id', ...)`` composes on top) or the
    parquet-dir fallback."""
    if is_catalog_table(spark, table):
        return spark.read.format("iceberg").load(table)
    return spark.read.parquet(table)


def read_table_properties(spark: SparkSession, table: str) -> Dict[str, str]:
    """Table properties: from the catalog (``SHOW TBLPROPERTIES``) on the
    Iceberg path, from the JSON sidecar on the parquet path."""
    if is_catalog_table(spark, table):
        rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
        return {r["key"]: r["value"] for r in rows}
    sidecar = os.path.join(table, _PROPS_SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return {}
