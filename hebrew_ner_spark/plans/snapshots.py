"""Snapshot-versioned graph materialization (Iceberg-metadata stand-in).

The north rule materializes the node/edge graph into Iceberg; the sandbox
has no Iceberg runtime (sources/catalog.py:3-6), so this module reproduces
the *contract* that matters on parquet:

* every commit is a new immutable **version**: data files are written under
  ``data/<table>/v<N>/`` and never rewritten;
* a JSON **manifest** per version records, per table, the data path, row
  count and the version that produced it — tables not rewritten by a commit
  carry their parent's pointers forward (metadata-only evolution, the
  Iceberg manifest-reuse behaviour);
* the **version hint** is flipped last via atomic ``os.replace`` — a crash
  anywhere before that leaves the previous snapshot current and the
  half-written version invisible (Iceberg's root-pointer swap);
* **time travel** = read any version's manifest instead of the hint.

Readers get plain ``spark.read.parquet`` on the manifest's path, so every
downstream plan keeps pushdown/pruning; writers pay one parquet write per
changed table. No driver-side data movement — the manifest holds only
pointers and counts (counts come from the write-side aggregate, one tiny
action per changed table).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_HINT = "version-hint.json"


def _meta_dir(root: str) -> str:
    return os.path.join(root, "metadata")


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(_meta_dir(root), f"v{version}.json")


def current_version(root: str) -> int | None:
    """The committed version the hint points at, or None on a fresh root."""
    p = os.path.join(_meta_dir(root), _HINT)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["current"])


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def snapshot_log(root: str) -> list[dict]:
    """All committed manifests, oldest first (the snapshot history table)."""
    cur = current_version(root)
    if cur is None:
        return []
    return [read_manifest(root, v) for v in range(1, cur + 1)]


def commit_snapshot(root: str, tables: dict[str, DataFrame]) -> int:
    """Write ``tables`` as the next version; carry unchanged tables forward.

    Returns the new version number. Crash-safe: data and manifest are
    written before the hint flips (os.replace is atomic on POSIX), so an
    interrupted commit is invisible to readers. The rerun recomputes the
    SAME version number (the hint never moved) and overwrites the
    orphaned half-written data directory — published versions are still
    immutable because writes only ever target version > current.
    """
    parent = current_version(root)
    version = 1 if parent is None else parent + 1
    entries: dict[str, dict] = {}
    if parent is not None:
        entries.update(read_manifest(root, parent)["tables"])

    for name, df in tables.items():
        path = os.path.join(root, "data", name, f"v{version}")
        df.write.mode("overwrite").parquet(path)
        n_rows = df.sparkSession.read.parquet(path).count()
        entries[name] = {"path": path, "n_rows": n_rows, "written_at": version}

    os.makedirs(_meta_dir(root), exist_ok=True)
    manifest = {"version": version, "parent": parent, "tables": entries}
    with open(_manifest_path(root, version), "w") as f:
        json.dump(manifest, f, indent=1)
    tmp = os.path.join(_meta_dir(root), f".{_HINT}.tmp")
    with open(tmp, "w") as f:
        json.dump({"current": version}, f)
    os.replace(tmp, os.path.join(_meta_dir(root), _HINT))
    return version


def read_snapshot(
    spark: SparkSession, root: str, table: str, version: int | None = None
) -> DataFrame:
    """Read ``table`` as of ``version`` (default: current) — time travel."""
    v = current_version(root) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot under {root}")
    manifest = read_manifest(root, v)
    if table not in manifest["tables"]:
        raise KeyError(f"table {table!r} not in snapshot v{v}")
    return spark.read.parquet(manifest["tables"][table]["path"])
