"""Iceberg-shaped table layer: partitioned Parquet + snapshot manifests.

The sandbox has no Iceberg runtime jar, so this module supplies the
three Iceberg behaviors the engine's 100 TB story actually relies on,
over plain Parquet with an explicit metadata sidecar (SURVEY.md §4 —
the reference gains scan locality from Z-order keys, utils/mod.rs:8-37;
an Iceberg deployment gains it from partition specs + file pruning):

* **partition spec** — a table is written `partitionBy(*spec)` so a
  predicate on the spec columns prunes whole directories at planning
  time (`PartitionFilters` in the scan node, verified by
  ``scan_partition_metrics`` and the PLANS.md check);
* **snapshot isolation / time travel** — every ``write_table`` append
  or overwrite creates ``snap-N.json`` listing the exact data files of
  that version; ``read_table(..., snapshot=N)`` plans ONLY those files,
  so a reader is never torn by a concurrent append and old versions
  stay readable (Iceberg's core contract). The manifest write is the
  commit point: files land first, metadata last, and a crashed writer
  leaves unreferenced files invisible to every reader (they are never
  listed by any snapshot) — readers go through manifests, not
  directory listings;
* **Z-order file locality** — within each partition directory, rows
  are range-sorted by the Morton key of the caller's (x, y)-like
  columns before writing (``sortWithinPartitions``), so Parquet
  row-group min/max stats on the key tighten per-file ranges and a
  cell-range scan skips row groups even inside a partition.

Swapping this for real Iceberg is a write/read call-site change: the
partition spec and snapshot semantics are deliberately identical.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.cells import morton_cell_col

_META_DIR = "_gp_metadata"


class CommitConflictError(RuntimeError):
    """Two writers raced to commit the same snapshot id; the loser's
    data files are left unreferenced (invisible to readers) and the
    caller should retry the whole write against the new table state."""


def _strip_uri_scheme(p: str) -> str:
    # Spark's inputFiles() returns URIs ("file:/x/y") with
    # percent-encoded special characters (a table at ".../my table"
    # yields "file:/.../my%20table/part-..."); local tooling passes
    # plain paths. Parse real URIs with urllib so encoded characters
    # round-trip (ADVICE r5: the bare prefix-strip produced relpaths
    # like "../my%20table/part-..." that silently resolved to
    # nonexistent files), and reject a non-empty netloc explicitly —
    # "file://host/path" names a remote host, not a local path.
    if p.startswith("file:"):
        parsed = urllib.parse.urlparse(p)
        if parsed.netloc not in ("", "localhost"):
            raise ValueError(
                f"write_table: non-local file URI {p!r} (netloc "
                f"{parsed.netloc!r}) cannot be resolved to a local path"
            )
        p = urllib.parse.unquote(parsed.path)
    return os.path.abspath(p)


def _meta_path(path: str) -> str:
    return os.path.join(path, _META_DIR)


def _list_snapshots(path: str) -> list[int]:
    md = _meta_path(path)
    if not os.path.isdir(md):
        return []
    out = []
    for name in os.listdir(md):
        if name.startswith("snap-") and name.endswith(".json"):
            out.append(int(name[5:-5]))
    return sorted(out)


def _load_snapshot(path: str, snap_id: int) -> dict:
    with open(os.path.join(_meta_path(path), f"snap-{snap_id}.json")) as f:
        return json.load(f)


def write_table(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    zorder: tuple[str, str, float, float, float] | None = None,
    mode: str = "append",
    zorder_bits: int = 16,
) -> int:
    """Write ``df`` as a new snapshot of the table at ``path``.

    ``partition_by``: partition-spec columns (directory layout; must be
    low-cardinality — tile ids, dataset names, dates).
    ``zorder``: optional (x_col, y_col, x0, y0, cell_size); rows are
    sorted within each output partition by their Morton cell key so
    Parquet row-group stats cluster spatially.
    ``mode``: "append" adds the new files to the table; "overwrite"
    starts a fresh file set (old snapshots remain readable — files are
    never deleted here; a real deployment would garbage-collect
    unreferenced files past a retention window).
    Returns the new snapshot id.
    """
    spark = df.sparkSession
    if zorder is not None:
        xcol, ycol, zx0, zy0, zcell = zorder
        df = (
            df.withColumn(
                "_zkey",
                morton_cell_col(
                    F.col(xcol), F.col(ycol), zx0, zy0, zcell, bits=zorder_bits
                ),
            )
            .sortWithinPartitions(*partition_by, "_zkey")
            .drop("_zkey")
        )
    snaps = _list_snapshots(path)
    snap_id = (snaps[-1] + 1) if snaps else 0
    data_root = f"data-{snap_id}"
    data_dir = os.path.join(path, data_root)
    # files first, manifest last: the manifest write IS the commit
    df.write.mode("errorifexists").partitionBy(*partition_by).parquet(data_dir)
    # manifest entries are (data-root, path-relative-to-root) — no URI
    # scheme or table-path assumptions baked into the metadata. Paths
    # are made relative against the known data_dir prefix (not by
    # searching for a "/data-N/" substring, which would mis-split when
    # the TABLE path itself contains a matching segment).
    abs_data_dir = os.path.abspath(data_dir)
    new_files = [
        [data_root, os.path.relpath(_strip_uri_scheme(f), abs_data_dir)]
        for f in spark.read.option("basePath", data_dir).parquet(data_dir).inputFiles()
    ]
    if mode == "append" and snaps:
        prev = _load_snapshot(path, snaps[-1])
        files = prev["files"] + new_files
    elif mode in ("append", "overwrite"):
        files = new_files
    else:
        raise ValueError(f"write_table: unknown mode {mode!r}")
    manifest = {
        "snapshot_id": snap_id,
        "parent_id": snaps[-1] if snaps else None,
        "mode": mode,
        "partition_spec": list(partition_by),
        "zorder": list(zorder) if zorder else None,
        "committed_at_ms": int(time.time() * 1000),
        "files": files,
    }
    md = _meta_path(path)
    os.makedirs(md, exist_ok=True)
    tmp = os.path.join(md, f".snap-{snap_id}.json.tmp.{os.getpid()}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    # Exclusive-create commit: os.link fails with EEXIST if another
    # writer already committed this snapshot id, so concurrent writers
    # cannot silently overwrite each other's manifest (the loser's data
    # files stay unreferenced and invisible — same recovery story as a
    # crashed writer). Real Iceberg resolves this with an atomic
    # compare-and-swap on the catalog pointer; the retry contract is
    # identical.
    final = os.path.join(md, f"snap-{snap_id}.json")
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflictError(
            f"write_table: snapshot {snap_id} at {path} was committed by a "
            "concurrent writer; re-read the table state and retry"
        ) from None
    finally:
        os.unlink(tmp)
    return snap_id


def read_table(
    spark: SparkSession, path: str, snapshot: int | None = None
) -> DataFrame:
    """Read a snapshot (default: latest) of the table at ``path``.

    Plans exactly the manifest's file list with ``basePath`` set to
    the snapshot's data root, so partition columns come back typed
    AND a filter on them still prunes at planning time (Spark's
    partition-aware file index works per listed file). Files appended
    by later snapshots are invisible — snapshot isolation."""
    snaps = _list_snapshots(path)
    if not snaps:
        raise FileNotFoundError(f"read_table: no snapshots at {path}")
    snap_id = snaps[-1] if snapshot is None else snapshot
    if snap_id not in snaps:
        raise ValueError(f"read_table: snapshot {snap_id} not in {snaps}")
    man = _load_snapshot(path, snap_id)
    if not man["files"]:
        raise ValueError(f"read_table: snapshot {snap_id} is empty")
    # one basePath per data-N root keeps partition columns typed while
    # mixing files from several snapshots' directories
    by_root: dict[str, list[str]] = {}
    for root, rel in man["files"]:
        by_root.setdefault(os.path.join(path, root), []).append(
            os.path.join(path, root, rel)
        )
    dfs = [
        spark.read.option("basePath", root).parquet(*files)
        for root, files in by_root.items()
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def table_history(path: str) -> list[dict]:
    """Snapshot log, oldest first (id, parent, mode, time, n_files)."""
    out = []
    for sid in _list_snapshots(path):
        m = _load_snapshot(path, sid)
        out.append(
            {
                "snapshot_id": m["snapshot_id"],
                "parent_id": m["parent_id"],
                "mode": m["mode"],
                "committed_at_ms": m["committed_at_ms"],
                "n_files": len(m["files"]),
            }
        )
    return out


def scan_partition_metrics(df: DataFrame) -> dict:
    """Evidence that a filtered read prunes: returns {"n_files": the
    number of distinct files the scan ACTUALLY touches (counted via
    input_file_name at execution — DataFrame.inputFiles ignores
    filters), "plan": the formatted physical plan (callers assert
    PartitionFilters appears — the planning-time half of the proof;
    this is the PLANS.md pruning check)."""
    jvm = df.sparkSession._jvm
    plan = jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    n = df.select(F.input_file_name().alias("_f")).distinct().count()
    return {"n_files": n, "plan": plan}
