"""Iceberg-style table catalog: parquet data + JSON snapshot manifests.

The sandbox has no Iceberg runtime jar (SURVEY.md §7.0), so the Iceberg
*contract* is implemented as a layout: every table is a directory of
immutable parquet files plus a chain of snapshot manifests listing the
live files.  Commits are atomic (write manifest to a temp name, then
``os.replace`` the current-pointer), readers only ever see a committed
snapshot, and appends create a child snapshot — which is exactly what
the resumable builder needs (atomic per-partition commits + time-travel
for lineage).  Swapping in a real Iceberg catalog is a config change:
nothing outside this module touches the filesystem layout.

Layout:
    <root>/<table>/data/<snapshot-uuid>-<n>.parquet ...
    <root>/<table>/snapshots/v<N>.json   {files, schema, parent, ...}
    <root>/<table>/_current              "v<N>" (atomically replaced)
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class Catalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---- paths ----
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _current_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_current")

    # ---- snapshot bookkeeping ----
    def current_snapshot(self, table: str) -> dict | None:
        cur = self._current_path(table)
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            v = f.read().strip()
        with open(os.path.join(self._tdir(table), "snapshots", v + ".json")) as f:
            return json.load(f)

    def table_exists(self, table: str) -> bool:
        return self.current_snapshot(table) is not None

    def _commit_snapshot(self, table: str, files: list, schema_json: str,
                         parent: dict | None, operation: str) -> dict:
        sdir = os.path.join(self._tdir(table), "snapshots")
        os.makedirs(sdir, exist_ok=True)
        version = (parent["version"] + 1) if parent else 0
        snap = {
            "version": version,
            "snapshot_id": uuid.uuid4().hex,
            "parent_id": parent["snapshot_id"] if parent else None,
            "operation": operation,
            "files": sorted(files),
            "schema": schema_json,
            "committed_at": time.time(),
        }
        tmp = os.path.join(sdir, f".v{version}.json.tmp-{snap['snapshot_id']}")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, os.path.join(sdir, f"v{version}.json"))
        # atomic pointer swap — readers see old or new, never torn state
        ptmp = self._current_path(table) + f".tmp-{snap['snapshot_id']}"
        with open(ptmp, "w") as f:
            f.write(f"v{version}")
        os.replace(ptmp, self._current_path(table))
        return snap

    # ---- write paths ----
    def _materialize(self, df: DataFrame, table: str) -> list:
        """Write df to new immutable parquet files; returns relative paths."""
        staging = os.path.join(self._tdir(table), "data",
                               f"stage-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        final = []
        ddir = os.path.join(self._tdir(table), "data")
        for name in sorted(os.listdir(staging)):
            if not name.endswith(".parquet"):
                continue
            tgt = f"{uuid.uuid4().hex}-{name}"
            os.replace(os.path.join(staging, name), os.path.join(ddir, tgt))
            final.append(os.path.join("data", tgt))
        shutil.rmtree(staging, ignore_errors=True)
        return final

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> dict:
        """Commit df as a new snapshot. mode: overwrite | append."""
        parent = self.current_snapshot(table)
        files = self._materialize(df, table)
        base = [] if (mode == "overwrite" or parent is None) else parent["files"]
        return self._commit_snapshot(table, base + files, df.schema.json(),
                                     parent, mode)

    def append(self, df: DataFrame, table: str) -> dict:
        return self.write(df, table, mode="append")

    def append_rows(self, spark: SparkSession, table: str, rows: list,
                    schema: StructType) -> dict:
        return self.append(spark.createDataFrame(rows, schema), table)

    # ---- read path ----
    def read(self, spark: SparkSession, table: str,
             snapshot: dict | None = None) -> DataFrame:
        snap = snapshot or self.current_snapshot(table)
        if snap is None:
            raise FileNotFoundError(f"table {table} has no committed snapshot")
        schema = StructType.fromJson(json.loads(snap["schema"]))
        if not snap["files"]:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self._tdir(table), f) for f in snap["files"]]
        return spark.read.schema(schema).parquet(*paths)

    def history(self, table: str) -> list:
        sdir = os.path.join(self._tdir(table), "snapshots")
        if not os.path.isdir(sdir):
            return []
        out = []
        for name in sorted(os.listdir(sdir)):
            if name.endswith(".json"):
                with open(os.path.join(sdir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda s: s["version"])

    def drop(self, table: str) -> None:
        shutil.rmtree(self._tdir(table), ignore_errors=True)
