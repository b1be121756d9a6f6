"""Lake layout catalog + parquet sink.

The reference stores layers as ``<layer>/<dataset>/ingest_date=YYYY-MM-DD/<file>``
(bronze_to_silver.py:18-31) over either local disk or ADLS Gen2 via a
custom byte-copy layer (storage_io.py). On Spark none of the custom I/O
survives: any Hadoop-compatible URI (``file://``, ``hdfs://``, ``s3a://``,
``abfss://``) plugs into the same reader/writer, so the engine keeps only
the *path builder* and the write-mode policy.

Scale notes:
- writes are ``partitionBy("ingest_date")`` so reads prune partitions;
- ``partitionOverwriteMode=dynamic`` makes a re-run of one ingest_date
  overwrite only that date's partition (idempotent re-runs, the
  reference's overwrite semantics at storage_io.py:121, without
  clobbering history).
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import random
import threading
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StructField, StructType


def default_ingest_date() -> str:
    """Env-driven ingest date, defaulting to today (reference
    bronze_to_silver.py:13-15)."""
    return (os.getenv("INGEST_DATE") or _dt.date.today().isoformat()).strip()


@dataclass(frozen=True)
class LakeCatalog:
    """Builds canonical lake paths under any Hadoop-compatible base URI."""

    base: str  # e.g. "file:///tmp/lake", "s3a://bucket/lake", "abfss://..."

    def dataset_root(self, layer: str, dataset: str) -> str:
        return f"{self.base.rstrip('/')}/{layer}/{dataset}"

    def partition(self, layer: str, dataset: str, ingest_date: str) -> str:
        return f"{self.dataset_root(layer, dataset)}/ingest_date={ingest_date}"


def abfss_base(container: str, account: str, path: str = "") -> str:
    """Canonical ADLS Gen2 URI for a :class:`LakeCatalog` base:
    ``abfss://<container>@<account>.dfs.core.windows.net/<path>``."""
    suffix = f"/{path.strip('/')}" if path.strip("/") else ""
    return f"abfss://{container}@{account}.dfs.core.windows.net{suffix}"


def abfss_conf(
    account: str,
    tenant_id: str | None = None,
    client_id: str | None = None,
) -> dict[str, str]:
    """Hadoop confs for managed-identity auth against an ADLS Gen2
    account — the Spark-native replacement for the reference's custom
    azure-identity client (storage_io.py:46-58). Apply with::

        for k, v in abfss_conf("myaccount").items():
            spark.conf.set(k, v)

    then any ``abfss://`` URI from :func:`abfss_base` reads/writes
    through the standard hadoop-azure connector. ``client_id`` selects
    a user-assigned managed identity; omit both optionals for the
    system-assigned one.
    """
    host = f"{account}.dfs.core.windows.net"
    conf = {
        f"fs.azure.account.auth.type.{host}": "OAuth",
        f"fs.azure.account.oauth.provider.type.{host}": (
            "org.apache.hadoop.fs.azurebfs.oauth2.MsiTokenProvider"
        ),
    }
    if tenant_id:
        conf[f"fs.azure.account.oauth2.msi.tenant.{host}"] = tenant_id
    if client_id:
        conf[f"fs.azure.account.oauth2.client.id.{host}"] = client_id
    return conf


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            *partition_by
        )
    writer.parquet(path)


def summarize(df: DataFrame, output_path: str) -> dict:
    """Row/column-count run summary (reference bronze_to_silver.py:206-222).

    ``df.count()`` is an EXTRA action: called on an unpersisted frame it
    re-executes the whole lineage, doubling the read at 100 TB. Callers
    sinking + summarizing the same frame must persist it first — the
    pipeline's clean-once contract does exactly that
    (plans/pipeline.py, asserted in tests/test_pipeline_golden.py)."""
    return {
        "rows": df.count(),
        "columns": len(df.columns),
        "output_path": output_path,
    }


def expire_partitions(
    spark,
    dataset_root: str,
    keep_latest: int,
    partition_col: str = "ingest_date",
) -> list[str]:
    """Retention: drop all but the newest ``keep_latest`` values of a
    Hive-style partition directory (lexicographic order — ISO dates
    sort correctly). Returns the deleted partition values.

    ``keep_latest`` must be ≥ 1: a retention call can trim history, but
    "keep zero" (or a negative from bad arithmetic upstream) would
    silently wipe the whole dataset — that's a delete, not retention,
    so it raises instead.

    The cleanup half of idempotent re-runs: dynamic overwrite keeps
    history growing forever otherwise. Listing + delete go through the
    Hadoop FS API, so the same call works on any supported URI."""
    if keep_latest < 1:
        raise ValueError(
            f"keep_latest must be >= 1, got {keep_latest}; refusing to "
            "drop every partition (use fs delete explicitly for that)"
        )
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(dataset_root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return []
    prefix = f"{partition_col}="
    parts = sorted(
        st.getPath().getName()[len(prefix):]
        for st in fs.listStatus(jroot)
        if st.isDirectory() and st.getPath().getName().startswith(prefix)
    )
    drop = parts[:-keep_latest]
    for value in drop:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{dataset_root}/{prefix}{value}"), True)
    return drop


def compact_partition(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into
    ``ceil(bytes / target_file_bytes)`` files, optionally range-
    clustered + sorted on ``sort_by`` so parquet min/max statistics
    prune reads on those columns afterward.

    The operational half of a 100 TB lake: streaming ingest and
    per-ingest-date overwrites accumulate files far below the ideal
    scan unit, and scan parallelism degrades into per-file task
    overhead. Returns the file count written.

    Swap protocol (crash-safe on a real filesystem): write to a
    sibling ``.compact-tmp`` dir, rename the original aside to
    ``.compact-old``, rename tmp into place, delete the old dir. At
    every intermediate state the full data exists under either the
    original or an adjacent recoverable name — no window where a crash
    leaves only the tmp dir. A stale ``.compact-old`` from a previous
    crash is detected and refused (operator must recover it first).

    Object-store caveat: HDFS/local ``rename`` is an atomic metadata
    op, but S3/ADLS "rename" is copy+delete — concurrent readers can
    observe a partial directory mid-swap there. On object stores
    prefer a table format with atomic commit (Delta/Iceberg) or
    compact into a NEW dated directory and flip a pointer.
    """
    import math  # noqa: PLC0415

    df = spark.read.parquet(path)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    size = fs.getContentSummary(jpath).getLength()
    n = max(1, math.ceil(size / target_file_bytes))
    if sort_by:
        from pyspark.sql import functions as F  # noqa: PLC0415

        cols = [F.col(c) for c in sort_by]
        out = df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)
    else:
        out = df.repartition(n)
    tmp = path.rstrip("/") + ".compact-tmp"
    old = path.rstrip("/") + ".compact-old"
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(jold):
        raise RuntimeError(
            f"stale {old} exists — a previous compaction crashed mid-swap; "
            "recover (rename it back or delete it) before compacting again"
        )
    out.write.mode("overwrite").parquet(tmp)
    if not fs.rename(jpath, jold):  # original aside (atomic on real FS)
        fs.delete(jtmp, True)
        raise RuntimeError(f"could not move {path} aside to {old}")
    if not fs.rename(jtmp, jpath):  # tmp into place
        fs.rename(jold, jpath)  # roll back: original restored
        fs.delete(jtmp, True)
        raise RuntimeError(f"could not move {tmp} into place at {path}")
    fs.delete(jold, True)
    return n


def upsert_partitions(
    spark,
    dataset_root: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str = "ingest_date",
    order_col: str | None = None,
) -> list[str]:
    """Keyed merge (upsert) into a Hive-partitioned parquet dataset
    WITHOUT a table format: rewrite only the partitions the updates
    touch. Returns the affected partition values.

    Per affected partition value: read the existing rows (partition
    pruning keeps the scan to just those directories), union with the
    updates, keep one row per key, then dynamic-overwrite exactly
    those partitions. Winner per key: with ``order_col``, the greatest
    value wins regardless of side (true last-writer-wins — a STALE
    update cannot clobber a newer stored row), updates breaking ties;
    without it, updates simply beat existing.

    Scale shape: the shuffle is one window over (partition, key) on
    affected partitions ONLY — cost scales with the touched slice, not
    the dataset. The overwrite itself has the same read-visibility
    caveats as any non-transactional parquet rewrite (readers
    mid-rewrite can see a partial partition; use a table format where
    that matters).
    """
    from pyspark.sql import Window, functions as F  # noqa: PLC0415

    values = [
        r[0]
        for r in updates.select(F.col(partition_col).cast("string")).distinct().collect()
    ]
    if any(v is None for v in values):
        # NULL never matches the isin() partition filter, so the merge
        # would skip existing NULL-partition rows and the dynamic
        # overwrite would clobber them — refuse up front instead
        raise ValueError(
            f"upsert_partitions: updates contain NULL {partition_col} values; "
            "partition values must be concrete"
        )
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(dataset_root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    merged = updates.withColumn("_is_update", F.lit(1))
    if fs.exists(jroot):
        existing = spark.read.parquet(dataset_root)
        lost = set(existing.columns) - set(updates.columns)
        if lost:
            # projecting existing rows down to the updates schema would
            # silently erase these columns for EVERY row of a rewritten
            # partition, touched keys or not
            raise ValueError(
                f"upsert_partitions: updates are missing stored columns "
                f"{sorted(lost)}; supply every dataset column (read-modify "
                "the batch or backfill the schema first)"
            )
        existing = existing.filter(
            F.col(partition_col).cast("string").isin(values)
        ).withColumn("_is_update", F.lit(0))
        merged = merged.unionByName(existing.select(*updates.columns, "_is_update"))
    # no existing-dataset shortcut: a fresh batch can itself carry
    # duplicate keys and must be keyed the same way
    ordering = [F.col("_is_update").desc()]
    if order_col is not None:
        ordering.insert(0, F.col(order_col).desc_nulls_last())
    w = Window.partitionBy(partition_col, *key_cols).orderBy(*ordering)
    winner = (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_is_update")
    )
    # materialize BEFORE the overwrite: Spark cannot overwrite a path
    # that the same job is still reading from. Memory bound = the
    # affected partitions only (spills to disk past that).
    winner = winner.localCheckpoint(eager=True)
    write_parquet(winner, dataset_root, partition_by=[partition_col])
    return sorted(values)


# ------------------------------------------------ snapshot versioning
# A poor-man's table format: every write lands in a fresh v=N directory
# and a one-line _LATEST pointer file flips to it afterwards. Readers
# resolve the pointer first, then read an immutable directory — so a
# reader NEVER observes a half-written dataset, closing the
# concurrent-reader caveat that raw overwrite/compact/upsert carry on
# object stores. What this does NOT give you (use Delta/Iceberg for
# real): multi-writer conflict detection, row-level transaction log,
# schema enforcement.


def _snapshot_dir(dataset_root: str, version: int) -> str:
    return f"{dataset_root.rstrip('/')}/v={version}"


def snapshot_versions(spark, dataset_root: str) -> list[int]:
    """All snapshot versions present under the dataset root, ascending."""
    jvm = spark._jvm
    jroot = jvm.org.apache.hadoop.fs.Path(dataset_root)
    fs = jroot.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jroot):
        return []
    out = []
    for st in _list_status(jvm, fs, jroot):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            try:
                out.append(int(name[2:]))
            except ValueError:
                continue
    return sorted(out)


def _fs(spark, path: str):
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, jp.getFileSystem(spark._jsc.hadoopConfiguration())


def _committed_version(spark, dataset_root: str) -> int | None:
    """The newest COMMITTED version: pointers are write-once files
    named ``_LATEST.v<N>`` and readers take the max N. No pointer is
    ever deleted-then-recreated, so there is no instant with zero
    pointers once the first commit lands (a crash mid-write leaves the
    previous pointer governing; the orphaned data dir is invisible)."""
    root = dataset_root.rstrip("/")
    jvm, fs = _fs(spark, root)
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    if not fs.exists(jroot):
        return None
    best = None
    for st in _list_status(jvm, fs, jroot):
        name = st.getPath().getName()
        if name.startswith("_LATEST.v"):
            try:
                v = int(name[len("_LATEST.v"):])
            except ValueError:
                continue
            best = v if best is None or v > best else best
    return best


# Shared manifest-meta key: the number of tombstone rows currently
# pinned by an index's tombstone component. Every tombstone-appending
# commit (delete/upsert) adds its row count; the physical apply resets
# it to 0. Serving paths use it to bound the liveness-watermark fold
# (broadcast below a row threshold, shuffle join above), and streaming
# sinks use it as a compaction-pressure trigger — both driver-side
# meta reads, no job.
TOMBSTONE_ROWS_KEY = "n_tombstones"


class ConcurrentCommitError(RuntimeError):
    """A pinned-version commit lost the race: another writer committed
    the version this commit was based on. Retry from fresh state (the
    loser's data dir, if any landed, is unpinned debris for the orphan
    sweep)."""


class SchemaEvolutionError(ValueError):
    """An append's frame is INCOMPATIBLY shaped against the
    component's manifest-carried schema (a common column changed
    type, or a column name retired by a rename/drop is being
    re-introduced). Additive changes — new columns, a writer still
    emitting the pre-evolution column set or a pre-rename name, or a
    LOSSLESS type widening on an atomic column — are legal and
    reconciled at read time; everything else must be an explicit new
    component or a rewrite (``replaces=``), never a silent
    reader-side coercion."""


# the lossless integer-widening chain (Spark type-JSON names)
_INT_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
# ≤32-bit ints embed exactly in double's 53-bit mantissa; long does NOT
_DOUBLE_EMBEDDABLE = {"byte", "short", "integer", "float"}


def _decimal_ps(t: str) -> tuple[int, int] | None:
    if not (isinstance(t, str) and t.startswith("decimal(") and t.endswith(")")):
        return None
    try:
        p, s = t[len("decimal(") : -1].split(",")
        return int(p), int(s)
    except ValueError:
        return None


def _widened_atomic(a, b):
    """The WIDER of two atomic Spark type-JSON names when one of them
    widens LOSSLESSLY to the other, else None. The lattice mirrors
    what Spark's parquet readers reconcile natively at scan time
    (SPARK-40876 widening promotions): the integer chain
    byte<short<int<long, float→double, narrow-int→double (exact in a
    53-bit mantissa; long→double is lossy and stays rejected), and
    decimal scale-up where neither the fractional nor the integral
    digit budget shrinks. Anything else — string↔numeric, long→double,
    nested/complex types — is not a widening."""
    if not isinstance(a, str) or not isinstance(b, str):
        return None
    if a == b:
        return a
    if a in _INT_RANK and b in _INT_RANK:
        return a if _INT_RANK[a] > _INT_RANK[b] else b
    if {a, b} == {"float", "double"}:
        return "double"
    if (a == "double" and b in _DOUBLE_EMBEDDABLE) or (
        b == "double" and a in _DOUBLE_EMBEDDABLE
    ):
        return "double"
    pa, pb = _decimal_ps(a), _decimal_ps(b)
    if pa and pb:
        if pb[1] >= pa[1] and pb[0] - pb[1] >= pa[0] - pa[1]:
            return b
        if pa[1] >= pb[1] and pa[0] - pa[1] >= pb[0] - pb[1]:
            return a
    return None


def _field_meta(f: dict) -> dict:
    return f.get("metadata") or {}


def _with_field_ids(schema_json: dict) -> dict:
    """Stamp a stable ``field_id`` into each field's metadata (existing
    ids kept; missing ones assigned past the current max, in field
    order). Field ids are the COLUMN IDENTITY that survives renames:
    the name is presentation, the id is the thing zone stats, reads,
    and evolution reason about — the Iceberg/Delta column-mapping
    design, carried in the Spark StructField metadata dict so the
    stored document stays a plain StructType jsonValue."""
    nid = (
        max((_field_meta(f).get("field_id", 0) for f in schema_json["fields"]), default=0)
        + 1
    )
    fields = []
    for f in schema_json["fields"]:
        md = dict(_field_meta(f))
        if "field_id" not in md:
            md["field_id"] = nid
            nid += 1
        fields.append({**f, "metadata": md})
    return {"type": "struct", "fields": fields}


def _strip_prior_names(schema_json: dict) -> dict:
    """Retire the rename shim from a recorded schema: drop every
    field's ``prior_names`` metadata. Correct ONLY after a FULL fold of
    the component (every pinned segment physically carries the current
    names — the coalesce shadow scan has nothing left to reconcile), at
    which point reads regain exact predicate pushdown on the renamed
    columns. NOTE: this also ends the lagging-writer grace for those
    renames — an old-name append afterwards evolves as a NEW column
    instead of mapping back to the field."""
    fields = []
    changed = False
    for f in schema_json.get("fields", []):
        md = _field_meta(f)
        if md.get("prior_names"):
            md = {k: v for k, v in md.items() if k != "prior_names"}
            f = {**f, "metadata": md}
            changed = True
        fields.append(f)
    if not changed:
        return schema_json
    return {"type": "struct", "fields": fields}


def _has_prior_names(schema_json: dict | None) -> bool:
    return bool(schema_json) and any(
        _field_meta(f).get("prior_names")
        for f in schema_json.get("fields", [])
    )


def _nullable_schema_json(schema_json: dict) -> dict:
    """A StructType jsonValue with every top-level field nullable —
    the stored form: once schemas can evolve, ANY column may be
    missing from some segment (written before the column existed) and
    reads null-backfill it, so non-null guarantees cannot survive the
    union."""
    return {
        "type": "struct",
        "fields": [{**f, "nullable": True} for f in schema_json["fields"]],
    }


def _evolved_schema_json(
    prior: dict | None, new_schema, component: str
) -> dict:
    """The component's next manifest-carried schema given an incoming
    frame: prior columns keep their order, genuinely new columns
    append (add-column-with-null-backfill), an incoming frame missing
    prior columns is fine (its segment reads back null-filled), a
    LOSSLESS atomic widening on a common column evolves the recorded
    type to the WIDER of the two — in either direction, so a
    lagging writer still emitting the pre-widening type keeps
    committing (its narrow segments reconcile at scan time under the
    wide read schema, natively in Spark's parquet readers) — and any
    other TYPE change raises :class:`SchemaEvolutionError`, because
    parquet cannot serve one column as two unrelated types across
    segments. Type equality is structural on the Spark type JSON with
    nullability normalized out (nested nullability is a constraint,
    not a layout); widening applies to top-level atomic types only
    (nested layout changes stay strict)."""

    def _type_key(t):
        # strip nullability flags recursively so e.g. array<int> with
        # containsNull true/false compares equal
        if isinstance(t, dict):
            return {
                k: _type_key(v)
                for k, v in t.items()
                if k not in ("nullable", "containsNull", "valueContainsNull")
            }
        if isinstance(t, list):
            return [_type_key(v) for v in t]
        return t

    newj = new_schema.jsonValue()
    if prior is None:
        return _with_field_ids(_nullable_schema_json(newj))
    prior = _with_field_ids(prior)  # stamp ids onto pre-field-id vintages
    live_by_name: dict[str, dict] = {}
    alias_to_live: dict[str, str] = {}
    retired: set[str] = set()
    for f in prior["fields"]:
        md = _field_meta(f)
        if md.get("dropped"):
            retired.add(f["name"])
            retired.update(md.get("prior_names", []))
            continue
        live_by_name[f["name"]] = f
        for p in md.get("prior_names", []):
            alias_to_live[p] = f["name"]
    out = list(prior["fields"])
    next_id = (
        max(_field_meta(f).get("field_id", 0) for f in prior["fields"])
        + 1
        if prior["fields"]
        else 1
    )
    widened: dict[str, dict] = {}
    claimed: set[str] = set()  # live names already matched this frame
    for f in newj["fields"]:
        # a lagging writer still emitting a PRE-RENAME name resolves to
        # the renamed field (same field id) — its segment's physical
        # column reconciles at read time through the coalesce shim
        name = f["name"] if f["name"] in live_by_name else alias_to_live.get(f["name"])
        pf = live_by_name.get(name) if name is not None else None
        if pf is None:
            if f["name"] in retired or f["name"] in alias_to_live:
                raise SchemaEvolutionError(
                    f"component {component!r}: column name {f['name']!r} is "
                    "RETIRED (a dropped column or a pre-rename name) — old "
                    "segments still carry physical data under it, so "
                    "re-introducing it would silently resurrect those "
                    "values; pick a fresh name"
                )
            out.append(
                {**f, "nullable": True, "metadata": {"field_id": next_id}}
            )
            next_id += 1
            continue
        if pf["name"] in claimed:
            raise SchemaEvolutionError(
                f"component {component!r}: the incoming frame carries "
                f"{f['name']!r} AND another name of the same field "
                f"({pf['name']!r}) — one field, one column per frame"
            )
        claimed.add(pf["name"])
        if _type_key(pf["type"]) != _type_key(f["type"]):
            wide = _widened_atomic(pf["type"], f["type"])
            if wide is None:
                raise SchemaEvolutionError(
                    f"component {component!r}: column {pf['name']!r} is "
                    f"{pf['type']!r} in the manifest schema but the incoming "
                    f"frame carries {f['type']!r} — only lossless widenings "
                    "evolve in place; other type changes need a new "
                    "component or an explicit rewrite (replaces=)"
                )
            if wide != pf["type"]:
                widened[pf["name"]] = {**pf, "type": wide, "nullable": True}
    if widened:
        out = [widened.get(f["name"], f) for f in out]
    return {"type": "struct", "fields": out}


def _is_vanished_fs_error(exc: BaseException) -> bool:
    """True when a Hadoop filesystem call failed because its target
    path stopped existing mid-call — the signature of a CONCURRENT
    writer's rename/delete, not of a broken disk. Matched on the Java
    exception text because py4j surfaces everything as one opaque
    ``Py4JJavaError``; the three forms cover the
    java.io.FileNotFoundException class name (matched qualified, so an
    unrelated message merely MENTIONING a missing file doesn't
    classify), RawLocalFileSystem's "File X does not exist" stat
    message, and the POSIX "No such file or directory" local streams
    raise (e.g. RawLocalFileSystem.setPermission's chmod). Callers
    that retry on this classification should verify the parent path
    still exists before burning their retry budget — a genuinely
    missing root also matches these shapes (see :func:`_list_status`)."""
    s = str(exc)
    return (
        "java.io.FileNotFoundException" in s
        or "does not exist" in s
        or "No such file or directory" in s
    )


def _list_status(jvm, fs, jroot) -> list:
    """``fs.listStatus`` that survives concurrent renames/deletes.

    Hadoop's local filesystem lists a directory in two steps —
    enumerate names, then stat each — so a child a rival commits away
    mid-listing (a ``_LATEST.tmp.*`` pointer being renamed into place,
    a released ``_CLAIM.v*`` being deleted) makes the whole call throw
    a raw FileNotFoundException. Every multi-writer protocol path must
    list through this retry wrapper: the vanished child is by
    definition not needed (it was transient marker state), and an
    immediate re-list converges because renames/deletes complete in
    microseconds. Persistent failure after the bounded retries means
    real contention churn — surfaced as the typed
    :class:`ConcurrentCommitError` the commit protocol documents, so
    retry loops treat it like any other lost race."""
    last: BaseException | None = None
    for attempt in range(8):
        try:
            return list(fs.listStatus(jroot))
        except Exception as e:  # noqa: BLE001 - classify, then retry/raise
            if not _is_vanished_fs_error(e):
                raise
            # the vanished-child classification also matches a
            # GENUINELY missing directory (misconfigured root, path
            # deleted for good): if the root itself is gone after one
            # retry, surface the real failure instead of burning the
            # budget and masking it as a concurrency conflict
            if attempt >= 1 and not fs.exists(jroot):
                raise
            last = e
            time.sleep(0.01)
    raise ConcurrentCommitError(
        f"{jroot}: directory listing kept racing concurrent commits"
    ) from last


_PIN_CLAIM_LOCK = threading.Lock()


def _claim_pinned_version(
    jvm, fs, root: str, version: int, stale_sec: float
) -> object:
    """Exclusively claim ``v=<version>`` for this writer by creating the
    write-once ``_CLAIM.v<N>`` marker. Returns the marker Path (the
    caller deletes it once the pointer is committed, or on failure).

    This claim is what makes pinned-mode commits safe against the
    check-then-write race in Spark's ``errorifexists``: that existence
    check happens once at job START, so two writers pinned to the same
    version would BOTH pass it and both land part files in the same
    ``v=N`` dir (part names are per-job unique, so neither job fails) —
    the committed dir then holds the union of two writers' rows and the
    rename-loser's retry appends its rows a second time (caught by
    tests/test_incr_index.py::test_threaded_committers_race_lands_every_
    batch). With the claim, exactly one writer proceeds to the data
    write; the loser gets ConcurrentCommitError before any data lands.

    The exclusive create is atomic on HDFS/ABFS; on the local FS the
    check-then-create window is microseconds and ``_PIN_CLAIM_LOCK``
    closes it entirely for same-process writers (the only local-FS
    multi-writer topology the tests exercise).

    A claim whose writer crashed before committing would livelock every
    later writer pinned to that version, so a claim older than
    ``stale_sec`` with no committed pointer is broken — but the break
    itself must be single-winner across PROCESSES (the in-process lock
    cannot help there): a naive delete-then-create lets two breakers
    that both observed the old claim's mtime interleave so that B's
    delete removes A's just-created fresh claim and both proceed into
    the same ``v=N`` dir — reinstating exactly the merged-part-files
    race the claim exists to close. So :func:`_break_stale_claim`
    renames the stale claim to a unique tombstone (rename of a missing
    source fails on Hadoop filesystems, so exactly one breaker wins;
    losers get ConcurrentCommitError), and the fresh claim's content is
    a per-writer unique token that is read back before returning — a
    racer that somehow overwrote our claim is detected before any data
    lands."""
    claim = jvm.org.apache.hadoop.fs.Path(f"{root}/_CLAIM.v{version}")
    token = f"{version}:{_next_segment_id()}"
    with _PIN_CLAIM_LOCK:
        for attempt in range(3):
            try:
                out = fs.create(claim, False)
            except Exception:  # noqa: BLE001 - claim exists: racer or stale
                # The staleness probe itself races the holder's
                # release: the winner commits, then deletes its claim
                # OUTSIDE our lock, so the claim that just failed our
                # create can vanish before exists()/getFileStatus()
                # — a raw FileNotFoundException here crashed clients
                # following the documented retry protocol (r8
                # VERDICT #1). A vanished claim means the slot is free
                # again: retry the create instead of leaking the raw
                # error (bounded by the attempt loop; a still-held
                # claim keeps raising the typed conflict).
                stale = False
                try:
                    if not fs.exists(claim):
                        continue
                    if attempt == 0:
                        age_ms = time.time() * 1000.0 - float(
                            fs.getFileStatus(claim).getModificationTime()
                        )
                        stale = age_ms > stale_sec * 1000.0
                except Exception as probe_err:  # noqa: BLE001
                    if _is_vanished_fs_error(probe_err):
                        continue  # claim released mid-probe: retry create
                    raise
                if stale:
                    _break_stale_claim(
                        jvm, fs, root, version, claim, stale_sec
                    )
                    continue
                raise ConcurrentCommitError(
                    f"{root}: version {version} is claimed by a concurrent "
                    "writer; retry from fresh state"
                ) from None
            try:
                out.write(token.encode("ascii"))
                out.close()
                readback = _read_small_file(jvm, fs, claim)
            except Exception as e:  # noqa: BLE001 - classify, then raise
                if _is_vanished_fs_error(e):
                    # a misbehaving breaker renamed our claim away
                    # between create and verification — same stand-down
                    # as the content-mismatch branch, typed
                    raise ConcurrentCommitError(
                        f"{root}: claim for version {version} vanished "
                        "before verification; retry from fresh state"
                    ) from e
                raise
            if readback != token:
                # somebody replaced our claim between create and now
                # (possible only through a misbehaving break) — stand
                # down before any data lands
                raise ConcurrentCommitError(
                    f"{root}: claim for version {version} was overwritten "
                    "by a concurrent writer; retry from fresh state"
                )
            return claim
    raise ConcurrentCommitError(
        f"{root}: could not claim version {version}"
    )


def _read_small_file(jvm, fs, jpath) -> str:
    stream = fs.open(jpath)
    sink = jvm.java.io.ByteArrayOutputStream()
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, sink, 4096, True)
    return bytes(sink.toByteArray()).decode("utf-8")


def _break_stale_claim(
    jvm, fs, root: str, version: int, claim, stale_sec: float
) -> None:
    """Single-winner break of a stale ``_CLAIM.v<N>``: atomic rename to
    a unique tombstone decides the breaker (losers raise the typed
    conflict and retry from fresh state), and the crasher's data debris
    is MOVED ASIDE before deletion rather than deleted in place — a
    merely-stalled holder that resumes keeps writing into the renamed
    dir (or fails loudly on the vanished path), never into the dir the
    break winner is about to populate, and ``_LATEST.v<N>`` can no
    longer end up pointing at two writers' merged part files. The
    committed pointer is re-checked before touching anything: if the
    'stale' holder actually resumed and committed, breaking would
    orphan live data, so the breaker stands down.

    The rename alone cannot decide the race: a slow breaker whose
    staleness verdict came from the OLD claim's mtime could rename away
    the winner's freshly re-created claim and 'win' a second time. So
    staleness is re-verified ON THE TOMBSTONE (rename preserves mtime):
    a young tombstone means we just renamed away a rival's live claim —
    put it back and stand down."""
    pointer = jvm.org.apache.hadoop.fs.Path(f"{root}/_LATEST.v{version}")
    if fs.exists(pointer):
        raise ConcurrentCommitError(
            f"{root}: version {version} was committed while its claim "
            "looked stale; state was derived from a stale snapshot"
        )
    tomb = jvm.org.apache.hadoop.fs.Path(
        f"{root}/_CLAIMTOMB.v{version}.{_next_segment_id()}"
    )
    if not fs.rename(claim, tomb):
        # another breaker won the atomic rename — exactly one proceeds
        raise ConcurrentCommitError(
            f"{root}: lost the stale-claim break race for version "
            f"{version}; retry from fresh state"
        )
    tomb_age_ms = time.time() * 1000.0 - float(
        fs.getFileStatus(tomb).getModificationTime()
    )
    if tomb_age_ms <= stale_sec * 1000.0:
        # we renamed away a LIVE claim (a rival breaker won and
        # re-claimed between our staleness read and our rename):
        # restore it and stand down
        fs.rename(tomb, claim)
        raise ConcurrentCommitError(
            f"{root}: stale-claim break for version {version} raced a "
            "live re-claim; retry from fresh state"
        )
    fs.delete(tomb, False)
    vdir = jvm.org.apache.hadoop.fs.Path(_snapshot_dir(root, version))
    if fs.exists(vdir):
        # re-check after winning the break: the holder may have flipped
        # the pointer between our first check and the rename
        if fs.exists(pointer):
            raise ConcurrentCommitError(
                f"{root}: version {version} was committed mid-break"
            )
        debris = jvm.org.apache.hadoop.fs.Path(
            f"{_snapshot_dir(root, version)}.debris.{_next_segment_id()}"
        )
        if not fs.rename(vdir, debris):
            raise ConcurrentCommitError(
                f"{root}: could not move aside debris of version {version}"
            )
        # the unique debris name is ours exclusively post-rename; a
        # stalled holder's open handles now write into unlinked files,
        # not into the v=N dir the fresh claimer will create
        fs.delete(debris, True)


def write_snapshot(
    spark,
    df: DataFrame,
    dataset_root: str,
    partition_by: list[str] | None = None,
    version: int | None = None,
    claim_stale_sec: float = 3600.0,
) -> int:
    """Write ``df`` as the next immutable snapshot of the dataset and
    commit it by creating the write-once pointer ``_LATEST.v<N>``.
    Returns the new version.

    Commit protocol: data lands fully in ``v=N/``, then the pointer
    file appears via a same-FS rename to a name that never existed
    before — readers resolve max(_LATEST.v*) and so see either the
    previous version or the new one, never a partial directory and
    never a missing pointer (the delete-then-recreate window a single
    mutable pointer file would have). A crash before the rename leaves
    an orphaned v=N dir that no reader resolves; the next write claims
    a later version and the orphan is swept by :func:`expire_snapshots`
    once it is provably stale (see the ``_INTENT.v<N>`` marker below).

    ``version=None`` (single-writer mode) allocates the next free
    number. An explicit ``version`` is the OPTIMISTIC-CONCURRENCY
    mode: the caller pins the exact version its state was derived
    from + 1, and the commit succeeds only if nobody else took it.
    The gate is the exclusive ``_CLAIM.v<N>`` marker taken BEFORE any
    data lands (see :func:`_claim_pinned_version` for why the
    ``errorifexists`` data write alone cannot be the gate — its
    existence check races over the whole job and two same-version
    writers merge part files into one dir), with the data-dir check
    and the pointer rename as backstops. A lost race raises
    :class:`ConcurrentCommitError` at whichever gate trips; retry
    from fresh state. This is what makes the manifest protocols below
    safe for concurrent committers: without the pin, a writer holding
    stale pins would commit a manifest that silently DROPS a faster
    writer's rows (classic lost update)."""

    def _payload(path: str) -> None:
        writer = df.write.mode("errorifexists")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)

    return _commit_version(
        spark, dataset_root, version, claim_stale_sec, _payload
    )


def _commit_version(
    spark,
    dataset_root: str,
    version: int | None,
    claim_stale_sec: float,
    write_payload,
) -> int:
    """The snapshot commit machinery write_snapshot documents, with the
    payload pluggable: allocate/validate the version, take the claim,
    declare intent, run ``write_payload(v=N path)`` (must refuse an
    existing path), flip the pointer, clean up. Shared by the
    DataFrame payload (write_snapshot) and the metadata-plane blob
    payload (write_snapshot_blob)."""
    committed = _committed_version(spark, dataset_root)
    if version is None:
        data_versions = snapshot_versions(spark, dataset_root)
        version = max(data_versions[-1] if data_versions else 0, committed or 0) + 1
    elif committed is not None and committed >= version:
        raise ConcurrentCommitError(
            f"{dataset_root}: version {version} already committed "
            f"(latest {committed}); state was derived from a stale snapshot"
        )
    path = _snapshot_dir(dataset_root, version)
    root = dataset_root.rstrip("/")
    jvm, fs = _fs(spark, root)
    claim = _claim_pinned_version(jvm, fs, root, version, claim_stale_sec)
    try:
        # declare intent BEFORE any data lands: a concurrent
        # expire_snapshots sees the marker (or the young dir) and leaves
        # the in-flight version alone until the grace period passes
        intent = jvm.org.apache.hadoop.fs.Path(f"{root}/_INTENT.v{version}")
        try:
            out = fs.create(intent, True)
            out.write(str(version).encode("ascii"))
            out.close()
        except Exception as e:  # noqa: BLE001 - classify, then raise
            # ABA interference, defense in depth: winners now delete
            # their intent marker BEFORE releasing their claim (see the
            # post-commit cleanup below), which closes the historical
            # window where a loser re-claimed the version while the
            # winner's intent delete was still pending and raced this
            # create (on the local checksum FS: the winner removing the
            # fresh ``.crc`` between create and chmod — "No such file
            # or directory" from RawLocalFileSystem.setPermission).
            # The guard stays for the case the ordering can't cover: a
            # CRASHED winner that deleted its intent but died holding
            # its claim, which a later writer breaks as stale and then
            # races the crashed process's half-finished cleanup.
            # Logically this writer already lost: surface the typed
            # conflict, not a raw Py4JJavaError (r8 VERDICT #1).
            if _is_vanished_fs_error(e) or (
                (_c := _committed_version(spark, dataset_root)) is not None
                and _c >= version
            ):
                raise ConcurrentCommitError(
                    f"{dataset_root}: lost the commit race for v={version} "
                    "(intent marker raced a finishing winner)"
                ) from e
            raise
        try:
            write_payload(path)
        except Exception as e:
            # a v=N dir under OUR claim can only be crashed-claimer or
            # single-writer-mode debris — still the typed conflict, so
            # callers retry from fresh state uniformly
            if fs.exists(jvm.org.apache.hadoop.fs.Path(path)):
                raise ConcurrentCommitError(
                    f"{dataset_root}: lost the commit race for v={version} "
                    "(data dir already exists)"
                ) from e
            raise
        # the tmp name is per-writer unique: a shared name lets writer A
        # rename away a tmp B just wrote, failing B's commit spuriously
        tmp = jvm.org.apache.hadoop.fs.Path(
            f"{root}/_LATEST.tmp.{_next_segment_id()}"
        )
        final = jvm.org.apache.hadoop.fs.Path(f"{root}/_LATEST.v{version}")
        out = fs.create(tmp, True)
        out.write(str(version).encode("ascii"))
        out.close()
        if not fs.rename(tmp, final):
            # rename-to-existing fails on Hadoop filesystems: the pointer
            # is the put-if-absent commit, so a failed rename of a PINNED
            # version means a concurrent writer won the race
            raise ConcurrentCommitError(
                f"could not commit pointer {root}/_LATEST.v{version}"
                " (concurrent writer won)"
            )
    except BaseException:
        # un-burn the version: the claimer is alive and failing loudly,
        # so release the claim rather than livelock later pinned writers
        fs.delete(claim, False)
        raise
    # cleanup AFTER the new pointer is visible — readers take the max,
    # so stale pointers/markers are harmless if this dies mid-sweep.
    # Intent BEFORE claim: deleting the claim first re-opens the
    # version to a loser pinned at it (ABA re-claim), whose fresh
    # _INTENT.v<N> this sweep would then delete out from under it —
    # the chmod-on-.crc race the r8 suite flaked on. With the claim
    # still held nobody can be writing these markers concurrently.
    fs.delete(intent, False)
    fs.delete(claim, False)
    for st in _list_status(jvm, fs, jvm.org.apache.hadoop.fs.Path(root)):
        name = st.getPath().getName()
        if name.startswith("_LATEST.v") and name != f"_LATEST.v{version}":
            try:
                v = int(name[len("_LATEST.v"):])
            except ValueError:
                continue
            # only SUPERSEDED pointers: deleting by mere inequality could
            # drop a NEWER pointer a faster concurrent writer just
            # committed — an instant lost update
            if v < version:
                fs.delete(st.getPath(), False)
    return version


_BLOB_NAME = "manifest.json"


def write_snapshot_blob(
    spark,
    text: str,
    dataset_root: str,
    version: int | None = None,
    claim_stale_sec: float = 3600.0,
) -> int:
    """Commit a small TEXT payload as the next snapshot version —
    write_snapshot's exact protocol (claim, intent, v=N payload,
    pointer rename) but the payload is one ``v=N/manifest.json`` file
    written through the filesystem API. Metadata commits (segment pin
    maps) must not be Spark jobs: a manifest is a few hundred bytes,
    and paying job scheduling + a parquet task per commit AND per read
    puts the driver's job queue in the metadata hot path (production
    table formats write manifests as plain JSON/Avro files for the
    same reason). The payload write is an exclusive create, so it
    refuses a pre-existing path exactly like the parquet
    ``errorifexists`` payload."""

    def _payload(path: str) -> None:
        jvm, fs = _fs(spark, path)
        out = fs.create(
            jvm.org.apache.hadoop.fs.Path(f"{path}/{_BLOB_NAME}"), False
        )
        out.write(text.encode("utf-8"))
        out.close()

    return _commit_version(
        spark, dataset_root, version, claim_stale_sec, _payload
    )


def read_snapshot_blob(
    spark, dataset_root: str, version: int | None = None
) -> str:
    """Read a blob snapshot's text payload (newest committed version by
    default, or a pinned historical one) — a filesystem read, no job.

    The resolve-then-open pair races retention: a rival committer's
    ``expire_snapshots`` can drop the version this reader just
    resolved before the open lands (frequent committers run retention
    with a short reader grace). A vanished COMMITTED blob is therefore
    re-resolved and retried — convergent, because each retry reads a
    strictly newer pointer — and surfaces as the typed
    :class:`ConcurrentCommitError` only if the churn outruns every
    retry. A PINNED historical version that is gone is not a race but
    an expired snapshot: typed ``FileNotFoundError``."""
    pinned = version is not None
    jvm, fs = _fs(spark, dataset_root)
    last: BaseException | None = None
    for _ in range(5):
        v = version if pinned else _committed_version(spark, dataset_root)
        if v is None:
            raise FileNotFoundError(f"no committed snapshot under {dataset_root}")
        path = f"{_snapshot_dir(dataset_root, v)}/{_BLOB_NAME}"
        try:
            return _read_small_file(jvm, fs, jvm.org.apache.hadoop.fs.Path(path))
        except Exception as e:  # noqa: BLE001 - classify, then retry/raise
            if not _is_vanished_fs_error(e):
                raise
            if pinned:
                raise FileNotFoundError(
                    f"{path}: snapshot blob expired or never committed"
                ) from e
            last = e
            time.sleep(0.01)
    raise ConcurrentCommitError(
        f"{dataset_root}: committed blob reads kept racing retention"
    ) from last


def read_snapshot(spark, dataset_root: str, version: int | None = None) -> DataFrame:
    """Read a snapshot: the newest COMMITTED version by default, or any
    pinned historical ``version`` (time travel) — snapshots are
    immutable until expired."""
    if version is None:
        version = _committed_version(spark, dataset_root)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {dataset_root}")
    return spark.read.parquet(_snapshot_dir(dataset_root, version))


def expire_snapshots(
    spark,
    dataset_root: str,
    keep_latest: int,
    orphan_grace_sec: float = 24 * 3600,
    keep_versions: Sequence[int] = (),
    min_age_sec: float = 0.0,
) -> list[int]:
    """Drop old snapshot directories, keeping the newest
    ``keep_latest`` COMMITTED versions. The committed (pointed-to)
    version is never dropped regardless of ``keep_latest``, nor is
    any version listed in ``keep_versions`` (externally pinned — e.g.
    by a multi-component manifest, see :func:`expire_components`).
    Same wipe-guard contract as :func:`expire_partitions`.

    Uncommitted dirs NEWER than the committed version are either a
    crashed writer's debris or a LIVE writer that has not yet flipped
    its pointer — indistinguishable by name alone. They are swept only
    when provably stale: the newest modification time among the
    version's ``_INTENT.v<N>`` marker (written before any data —
    see :func:`write_snapshot`) and the data directory itself must be
    older than ``orphan_grace_sec``. This makes expiry safe to run
    from a cron alongside the (single) writer: an in-flight write is
    always younger than any sane grace period. The staleness probe
    takes the newest mtime anywhere under the version dir (files keep
    landing throughout a write, partitioned or not), so
    ``orphan_grace_sec`` only needs to exceed the longest PAUSE between
    file materializations — not the total write duration.

    ``min_age_sec`` is READER grace: a committed-but-superseded version
    younger than it is retained even beyond ``keep_latest``. A live
    reader resolves a version and then scans it lazily — a concurrent
    committer's retention deleting that version mid-scan turns snapshot
    isolation into FileNotFoundException (exactly what multi-writer
    append protocols hit when commits outpace ``keep_latest``). The
    default 0 keeps count-only semantics for single-writer datasets;
    :func:`expire_segments` passes its grace period through, the
    time-lagged retention every production table format uses."""
    if keep_latest < 1:
        raise ValueError(f"keep_latest must be >= 1, got {keep_latest}")
    pinned = set(keep_versions)
    committed = _committed_version(spark, dataset_root)
    versions = snapshot_versions(spark, dataset_root)
    committed_versions = [
        v for v in versions if committed is not None and v <= committed
    ]
    jvm, fs = _fs(spark, dataset_root)
    root = dataset_root.rstrip("/")
    now_ms = time.time() * 1000.0

    def _young(v: int) -> bool:
        if min_age_sec <= 0:
            return False
        jp = jvm.org.apache.hadoop.fs.Path(_snapshot_dir(root, v))
        if not fs.exists(jp):
            return False
        age_ms = now_ms - float(fs.getFileStatus(jp).getModificationTime())
        return age_ms < min_age_sec * 1000.0

    drop = [
        v
        for v in committed_versions[:-keep_latest]
        if v != committed and v not in pinned and not _young(v)
    ]

    def _mtime_ms(path: str) -> float | None:
        jp = jvm.org.apache.hadoop.fs.Path(path)
        if not fs.exists(jp):
            return None
        return float(fs.getFileStatus(jp).getModificationTime())

    def _newest_mtime_ms(path: str) -> float | None:
        """Newest mtime anywhere UNDER a version dir, not just the dir
        itself: a partitioned write lands files in partition subdirs
        without refreshing the root dir's mtime, so a root-only check
        could sweep a single in-flight write that out-lasts the grace
        period. Recursing over an uncommitted version dir is bounded —
        it holds at most one write's output."""
        jp = jvm.org.apache.hadoop.fs.Path(path)
        try:
            best = float(fs.getFileStatus(jp).getModificationTime())
            it = fs.listFiles(jp, True)
            while it.hasNext():
                best = max(best, float(it.next().getModificationTime()))
            return best
        except Exception:  # noqa: BLE001 - a CONCURRENT sweeper deleted
            # the path mid-iteration (retention may run from several
            # committers at once); vanished ⇒ nothing left to probe
            return None

    stale_orphans = []
    for v in versions:
        if committed is not None and v > committed and v not in pinned:
            marks = [
                m
                for m in (
                    _mtime_ms(f"{root}/_INTENT.v{v}"),
                    _newest_mtime_ms(_snapshot_dir(root, v)),
                )
                if m is not None
            ]
            if marks and now_ms - max(marks) > orphan_grace_sec * 1000.0:
                stale_orphans.append(v)
    drop += stale_orphans
    for v in sorted(drop):
        fs.delete(jvm.org.apache.hadoop.fs.Path(_snapshot_dir(dataset_root, v)), True)
        if v in stale_orphans:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/_INTENT.v{v}"), False)
    # intent markers at-or-below the committed pointer are debris from a
    # writer that committed but died before its own marker cleanup —
    # safe to sweep unconditionally (the commit has already happened)
    if committed is not None:
        jroot = jvm.org.apache.hadoop.fs.Path(root)
        for st in _list_status(jvm, fs, jroot):
            name = st.getPath().getName()
            marker = next(
                (
                    p
                    for p in ("_INTENT.v", "_CLAIM.v")
                    if name.startswith(p)
                ),
                None,
            )
            if marker is not None:
                try:
                    v = int(name[len(marker):])
                except ValueError:
                    continue
                if v <= committed:
                    fs.delete(st.getPath(), False)
            elif name.startswith("_LATEST.tmp."):
                # unrenamed tmp pointer: debris from a crashed commit;
                # age-gate it like any other possibly-in-flight marker
                age_ms = now_ms - float(st.getModificationTime())
                if age_ms > orphan_grace_sec * 1000.0:
                    fs.delete(st.getPath(), False)
    return sorted(drop)


# ------------------------- multi-component manifest commit protocol
# A dataset made of SEVERAL snapshot components (e.g. an LSH index's
# bands + shingles + bucket stats) needs one atomic commit point:
# component pointers alone can be torn by a crash between writes.
# Protocol: write each component as its next snapshot version, then
# commit a JSON MANIFEST blob recording the version map — the
# manifest's own pointer rename (write_snapshot_blob) is the atomic commit;
# readers resolve every component through the last committed manifest
# and never see a partial multi-component write. Shared by the batch
# incremental LSH index (plans/queries_llm) and the streaming dedup
# index (streaming/documents).


def write_manifest(spark, root: str, versions: dict[str, int]) -> int:
    """Commit a component-version manifest for ``root`` (see protocol
    note above) as a JSON blob snapshot — a filesystem write, not a
    Spark job (see write_snapshot_blob). Returns the manifest's own
    snapshot version."""
    if not versions:
        raise ValueError("write_manifest: empty component map")
    payload = json.dumps(
        {name: int(v) for name, v in versions.items()}, sort_keys=True
    )
    return write_snapshot_blob(spark, payload, f"{root}/manifest")


def manifest_versions(spark, root: str) -> dict[str, int]:
    """The last COMMITTED manifest's component→version map.
    Raises FileNotFoundError when no manifest was ever committed."""
    parsed = json.loads(read_snapshot_blob(spark, f"{root}/manifest"))
    return {name: int(v) for name, v in parsed.items()}


def commit_components(
    spark, root: str, frames: dict[str, DataFrame]
) -> dict[str, int]:
    """Write every component frame as its next snapshot version under
    ``root/<name>`` and commit the manifest. The component writes are
    invisible until the manifest commit lands; a crash in between
    leaves only orphan versions (swept by :func:`expire_snapshots`)."""
    versions = {
        name: write_snapshot(spark, df, f"{root}/{name}")
        for name, df in frames.items()
    }
    write_manifest(spark, root, versions)
    return versions


def read_components(
    spark, root: str, components: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Every component at the versions pinned by the last committed
    manifest — the only safe multi-component read path."""
    pins = manifest_versions(spark, root)
    names = list(components) if components is not None else list(pins)
    return {
        name: read_snapshot(spark, f"{root}/{name}", version=pins[name])
        for name in names
    }


def expire_components(
    spark,
    root: str,
    keep_latest: int,
    orphan_grace_sec: float = 24 * 3600,
) -> dict[str, list[int]]:
    """Retention for a manifest-committed multi-component dataset —
    the ONLY safe way to expire one. Component-local
    :func:`expire_snapshots` alone is NOT safe here: after a torn
    multi-component write, a component's own pointer runs AHEAD of
    the manifest pin (each write_snapshot commits its dataset), so
    a small ``keep_latest`` could sweep the version the committed
    manifest still points at (found by the protocol crash-fuzz
    property test). This wrapper reads the current manifest and
    passes each component its pinned version via ``keep_versions``;
    the manifest dataset itself expires normally (its committed
    pointer is its own pin). Older manifests' pins may age out —
    time travel is bounded by retention, the CURRENT pin never is."""
    pins = manifest_versions(spark, root)
    out = {
        name: expire_snapshots(
            spark,
            f"{root}/{name}",
            keep_latest,
            orphan_grace_sec,
            keep_versions=(version,),
        )
        for name, version in pins.items()
    }
    out["manifest"] = expire_snapshots(
        spark, f"{root}/manifest", keep_latest, orphan_grace_sec
    )
    return out


# -------------------- append-only segmented components (LSM commits)
# The O(batch) commit protocol for datasets that GROW: a component's
# content is the UNION of the immutable parquet SEGMENT dirs its
# manifest pins, so a commit writes only the NEW rows as fresh
# segments (plus any tiny derived tables, re-pinned whole) and flips
# the manifest — never a copy of the accumulated dataset. This is what
# makes a long-running ingest loop O(total input) in write work
# instead of O(n²) (the full-copy snapshot commit's cost curve).
#
# Commit point: one manifest SNAPSHOT under ``root/manifest`` whose
# rows are (component, seg) pairs — write_snapshot's write-once
# pointer rename is the atomic flip, exactly as in the
# whole-dataset protocol above. A crash mid-commit leaves orphan
# segment dirs no manifest pins (swept by expire_segments after a
# grace period); readers pinned to the previous manifest never see
# them. Compaction (compact_segments) folds a component's pinned
# segments into one — snapshot-isolated like any other commit — so
# segment-count growth and small files are bounded operationally.


def _segment_dir(component_root: str, seg: int) -> str:
    return f"{component_root.rstrip('/')}/seg={seg}"


def segment_numbers(spark, component_root: str) -> list[int]:
    """All segment dirs present under a component root, ascending
    (committed or not — pin status lives in the manifest)."""
    jvm, fs = _fs(spark, component_root)
    jroot = jvm.org.apache.hadoop.fs.Path(component_root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in _list_status(jvm, fs, jroot):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("seg="):
            try:
                out.append(int(name[4:]))
            except ValueError:
                continue
    return sorted(out)


_SEG_ALLOC_LOCK = threading.Lock()
_SEG_LAST = 0


def _next_segment_id() -> int:
    """Collision-proof segment id: nanosecond wall clock plus random
    low jitter, kept strictly increasing within this process.

    Uniqueness must NEVER come from listing the component dir and
    taking max+1: under multi-writer concurrency both writers list the
    same state, pick the same number, and BOTH parquet jobs "succeed"
    into the same ``seg=N`` dir (part files don't collide — Spark
    names them per-job), so the winner's committed manifest silently
    pins the loser's rows too and the loser's retry then lands them a
    second time — duplicate rows in the committed index (surfaced by
    tests/test_incr_index.py::test_threaded_committers_race_lands_
    every_batch). Time-based ids are unique across writers by
    construction, and :func:`write_segment` additionally claims the id
    with an exclusive-create intent marker as a backstop, so no two
    writers can ever share a segment dir. Sequential appends by one
    writer stay numerically ordered (the sorted pin list preserves
    append order), which concurrent appenders never relied on."""
    global _SEG_LAST
    with _SEG_ALLOC_LOCK:
        cand = time.time_ns() + random.getrandbits(10)
        cand = max(cand, _SEG_LAST + 1)
        _SEG_LAST = cand
        return cand


# Segment file sizing (guide §6, r16 — generalizes the text index's
# r15 token-derived sizing to EVERY segment write): aim for files near
# this target instead of shuffle-partition-many tiny ones. The file
# count derives from the optimizer's size-only plan estimate, which is
# conservative in exactly the safe direction — filters/aggregates do
# not shrink it (measured at sf0.1: rollup partials est 2.3 MB vs
# 1.8 KB actual, ANN codes 16x over, band/shingle frames 1.1-1.4x
# over) — so a frame is never coalesced below its real byte count's
# worth of files, and since ``coalesce`` can only LOWER a partition
# count, a 100 TB batch keeps its write parallelism and lands
# thousands of near-target files while a micro-batch lands one.
SEGMENT_FILE_TARGET_BYTES = 128 << 20


def sized_for_segment_write(df: DataFrame, est_bytes: int | None = None) -> DataFrame:
    """``df`` coalesced to ``ceil(estimated bytes / target)`` output
    files for a segment write. ``est_bytes`` lets a caller substitute
    a better, measured estimate (e.g. the text index's token-derived
    byte count); default is the optimized logical plan's size-only
    statistic. Sizing only affects file granularity, never content."""
    if est_bytes is None:
        est_bytes = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    n = max(1, -(-est_bytes // SEGMENT_FILE_TARGET_BYTES))
    if n >= 1 << 20:
        # size-only estimates of join/union-heavy plans can be
        # astronomical (products of child sizes, up to 8 EiB — past
        # java int range); a coalesce to more files than the frame has
        # partitions is a no-op anyway, so skip it outright
        return df
    return df.coalesce(int(n))


def write_segment(spark, df: DataFrame, component_root: str) -> int:
    """Write ``df`` as a fresh immutable segment of a component —
    data only, NO commit: a segment is invisible until a manifest pins
    it (commit_segment_manifest). Returns the segment id. The
    ``_INTENT.s<N>`` marker (claimed exclusively, written before any
    data) both reserves the id against a concurrent writer and gives
    expire_segments the same provably-stale test write_snapshot's
    orphan sweep uses.

    Every segment lands size-coalesced (:func:`sized_for_segment_write`
    — the r15 text-index small-files fix, promoted to the shared write
    path): a micro-commit writes ONE file instead of one per shuffle
    partition, so readers stop paying a scan task per ~10 KiB file,
    while big batches keep their partitioning (coalesce never raises a
    partition count). Callers that pre-shape the frame (repartition
    for upstream-parallelism protection, explicit coalesce caps) are
    respected: the write only merges further, never splits."""
    root = component_root.rstrip("/")
    df = sized_for_segment_write(df)
    jvm, fs = _fs(spark, root)
    for _ in range(8):
        seg = _next_segment_id()
        intent = jvm.org.apache.hadoop.fs.Path(f"{root}/_INTENT.s{seg}")
        try:
            # overwrite=False: atomic claim on HDFS/ABFS; on local FS
            # the window is microseconds and the id is already unique
            out = fs.create(intent, False)
        except Exception:  # noqa: BLE001 - claimed by a racer: new id
            continue
        out.write(str(seg).encode("ascii"))
        out.close()
        df.write.mode("errorifexists").parquet(_segment_dir(root, seg))
        return seg
    raise RuntimeError(
        f"write_segment: could not claim a segment id under {root}"
    )


def stage_segments(
    spark, df: DataFrame, component_root: str, slice_col: str
) -> list[int]:
    """Materialize MANY fresh segments from ONE Spark write job: the
    frame lands ``partitionBy(slice_col)`` into a staging dir, then
    each non-empty slice dir is claimed a fresh segment id (the same
    ``_INTENT.s<N>`` protocol as :func:`write_segment`) and RENAMED
    into place — pure filesystem metadata operations, no second pass
    over the data. Returns the new segment ids in ascending slice
    order (ids are strictly increasing in-process, so the sorted pin
    list preserves slice order). Like write_segment, the segments are
    invisible until a manifest pins them; a crash mid-stage leaves a
    ``_STAGE.<id>`` dir that :func:`expire_segments` age-gates away.

    This is the 100 TB shape for any fold-to-N rewrite (z-order
    waves, partition re-bucketing): the alternative — one filter-pass
    write job per output slice — is O(n_slices) passes over the input.
    ``slice_col`` is consumed (partition columns don't land in the
    data files), so the written schema is the frame's minus it."""
    root = component_root.rstrip("/")
    jvm, fs = _fs(spark, root)
    sid = _next_segment_id()
    stage = f"{root}/_STAGE.{sid}"
    df.write.mode("errorifexists").partitionBy(slice_col).parquet(stage)
    jstage = jvm.org.apache.hadoop.fs.Path(stage)
    prefix = f"{slice_col}="
    slices: list[tuple[int, object]] = []
    for st in _list_status(jvm, fs, jstage):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith(prefix):
            continue
        val = name[len(prefix):]
        try:
            slices.append((int(val), st.getPath()))
        except ValueError as e:
            raise ValueError(
                f"stage_segments: slice column {slice_col!r} must hold "
                f"non-null integers; staged partition {name!r}"
            ) from e
    segs: list[int] = []
    try:
        for _val, jsrc in sorted(slices, key=lambda t: t[0]):
            for _ in range(8):
                seg = _next_segment_id()
                intent = jvm.org.apache.hadoop.fs.Path(f"{root}/_INTENT.s{seg}")
                try:
                    out = fs.create(intent, False)
                except Exception:  # noqa: BLE001 - claimed by a racer: new id
                    continue
                out.write(str(seg).encode("ascii"))
                out.close()
                if not fs.rename(
                    jsrc, jvm.org.apache.hadoop.fs.Path(_segment_dir(root, seg))
                ):
                    raise RuntimeError(
                        f"stage_segments: rename of staged slice {jsrc} failed"
                    )
                segs.append(seg)
                break
            else:
                raise RuntimeError(
                    f"stage_segments: could not claim a segment id under {root}"
                )
    finally:
        # on success only _SUCCESS and empty scaffolding remain; on
        # failure the unrenamed slices go with it (renamed ones are
        # unpinned debris for the orphan sweep, same as write_segment)
        fs.delete(jstage, True)
    return segs


def read_segments(
    spark, component_root: str, segments: Sequence[int], schema=None,
    where=None,
) -> DataFrame:
    """A component at a pinned segment list: the UNION of the segment
    dirs, as one multi-path parquet scan (partition pruning, pushdown,
    and split planning all apply across segments). ``schema`` (a
    StructType, normally the component's manifest-carried current
    schema) pins the read schema: segments written BEFORE a column
    existed serve it as NULL (the parquet reader backfills missing
    columns) — the reconciliation half of schema evolution. ``None``
    keeps the footer-derived schema (single-schema components, the
    common case).

    RENAMED columns (field metadata ``prior_names``, see
    :func:`rename_columns`) reconcile in the SAME single scan: the
    read schema grows one nullable shadow field per retired name (a
    segment written pre-rename serves its data there; every other
    segment serves NULL — Spark's name-based parquet matching), and a
    ``coalesce(current, *priors)`` projection folds the vintages back
    into the current name. Still one multi-path scan, no per-vintage
    grouping; components that never renamed take the plain pinned-read
    path untouched. Honest cost while renamed vintages remain pinned:
    a predicate a CALLER applies on the returned frame filters
    post-scan (coalesce is not pushable into parquet row-group stats)
    — segment-level zonemap pruning still applies (the rename verb
    rewrites zone keys), column pruning and whole-stage codegen are
    unaffected, and a FULL fold (compaction, or
    ``maintain(normalize_renames=True)`` on cadence) normalizes the
    physical names AND retires the shim from the recorded schema
    (:func:`_strip_prior_names`), restoring exact pushdown.

    ``where`` closes that gap WITHOUT ending the lagging-writer grace
    (r13 VERDICT #9): a callable over the RAW pre-projection frame
    (current + shadow vintage columns) whose Column filters BEFORE
    the coalesce, so Catalyst pushes it into the parquet scan. Build
    it with :func:`vintage_predicate` — the per-vintage disjunction
    ``pred(current) OR pred(prior)`` is EXACT because each segment
    serves exactly one vintage (the others read NULL, and NULL
    predicates are falsy)."""
    if not segments:
        raise ValueError(f"read_segments: empty segment list for {component_root}")
    root = component_root.rstrip("/")
    dirs = [_segment_dir(root, s) for s in segments]
    if schema is None:
        df = spark.read.parquet(*dirs)
        return df.filter(where(df)) if where is not None else df
    scan_schema, renames = _rename_shadow_plan(schema)
    df = spark.read.schema(scan_schema).parquet(*dirs)
    if where is not None:
        df = df.filter(where(df))
    if not renames:
        return df
    from pyspark.sql import functions as F  # noqa: PLC0415

    return df.select(
        *[_renamed_col(F, f.name, renames) for f in schema.fields]
    )


def vintage_predicate(schema, name: str, make):
    """A rename-aware PUSHABLE predicate for :func:`read_segments`'
    ``where`` hook: ``make`` builds the predicate from one Column
    (e.g. ``lambda c: c > 5``); the result ORs it across the logical
    column's current and prior physical names, each disjunct ANDed
    with that physical column's ``isNotNull()``, which is exactly
    equivalent to the same predicate on the post-read coalesce for
    any NULL-REJECTING ``make`` — every segment serves one vintage,
    and the guard keeps a null-test predicate from matching the
    absent-vintage NULLs the other names read as — but lands in the
    parquet scan's ``PushedFilters`` on EVERY vintage, so fleets that
    keep the lagging-writer grace (normalization OFF) no longer trade
    it for pushdown.

    CONTRACT (r14 ADVICE #2): ``make`` must be NULL-rejecting —
    i.e. ``make(NULL)`` must not evaluate TRUE (``isNull()``,
    ``eqNullSafe(None)``, ``~isin(...)``-on-NULL are not). A
    null-accepting predicate cannot be expressed as a pushable
    per-vintage disjunction at all (the guard makes it under-return
    instead of leaking cross-vintage rows); filter the coalesced
    frame post-read for those. Column-pruning note: the scan reads
    current + prior columns for the filter either way (they are the
    same logical column)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    priors = []
    for f in schema.fields:
        if f.name == name:
            priors = list((f.metadata or {}).get("prior_names", []))
            break

    def _where(df: DataFrame):
        pred = make(F.col(name)) & F.col(name).isNotNull()
        for p in priors:
            if p in df.columns:
                pred = pred | (make(F.col(p)) & F.col(p).isNotNull())
        return pred

    return _where


def _rename_shadow_plan(schema):
    """``(scan_schema, renames)`` for a manifest-carried StructType:
    one nullable SHADOW field per retired pre-rename name (at the
    field's CURRENT — possibly widened — type: narrow pre-rename
    parquet reconciles under it natively, like any widening), plus the
    ``{current: [prior, …]}`` map the projection coalesces through.
    Components that never renamed return (schema, {}) — the untouched
    fast path. Shared by :func:`read_segments` and the batched
    coverage builders, so zone stats and bloom hashes see a renamed
    vintage's values exactly as readers do."""
    renames = {
        f.name: list((f.metadata or {}).get("prior_names", []))
        for f in schema.fields
        if (f.metadata or {}).get("prior_names")
    }
    if not renames:
        return schema, {}
    from pyspark.sql.types import StructField  # noqa: PLC0415

    live = {f.name for f in schema.fields}
    by_name = {f.name: f for f in schema.fields}
    shadow: list[StructField] = []
    seen: set[str] = set()
    for new, priors in renames.items():
        for p in priors:
            if p in live or p in seen:
                continue
            shadow.append(StructField(p, by_name[new].dataType, True))
            seen.add(p)
    return StructType(list(schema.fields) + shadow), renames


def _renamed_col(F, name: str, renames: dict[str, list[str]]):
    """The read-time value of one logical column over mixed rename
    vintages: coalesce(current, *prior_names) when renamed, the plain
    column otherwise."""
    if name in renames:
        return F.coalesce(
            F.col(name), *[F.col(p) for p in renames[name]]
        ).alias(name)
    return F.col(name)


def _zone_value(v):
    """Normalize a min/max bound to a JSON-storable value whose
    ordering survives the round trip: numbers/strings/bools pass
    through; datetimes become ``YYYY-MM-DD HH:MM:SS[.ffffff]`` and
    dates ``YYYY-MM-DD`` (lexicographic order == chronological order
    for these fixed forms, so pruning compares strings directly);
    Decimals become floats. Callers pass predicate bounds through the
    same normalization, so both sides of the compare agree."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        # timezone-aware values would format with a +HH:MM suffix,
        # breaking the lexicographic==chronological invariant across
        # mixed offsets — normalize to UTC and strip the tzinfo so
        # every stored bound lives on one fixed-form axis
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    import decimal  # noqa: PLC0415

    if isinstance(v, decimal.Decimal):
        return float(v)
    return str(v)


def _segment_zone_stats(
    spark, component_root: str, seg: int, cols: Sequence[str]
) -> dict[str, list]:
    """Per-column ``[min, max, n_nulls]`` of one just-written segment —
    ONE small agg job over a column-pruned scan of the segment dir
    (the moral equivalent of collecting parquet footer stats at commit
    time; O(batch) like the write itself)."""
    df = spark.read.parquet(_segment_dir(component_root, seg))
    from pyspark.sql import functions as F  # noqa: PLC0415

    aggs = []
    for i, c in enumerate(cols):
        aggs += [
            F.min(c).alias(f"__z{i}n"),
            F.max(c).alias(f"__z{i}x"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__z{i}u"),
        ]
    row = df.agg(*aggs).collect()[0]
    return {
        c: [
            _zone_value(row[f"__z{i}n"]),
            _zone_value(row[f"__z{i}x"]),
            int(row[f"__z{i}u"] or 0),
        ]
        for i, c in enumerate(cols)
    }


def _segment_zone_stats_many(
    spark,
    component_root: str,
    segs: Sequence[int],
    cols: Sequence[str],
    schema=None,
) -> dict[int, dict[str, list]]:
    """Per-column ``[min, max, n_nulls]`` for MANY segments in ONE
    Spark job: a multi-dir scan keyed by the segment id parsed from
    ``_metadata.file_path``, grouped per segment. Batches what
    :func:`_segment_zone_stats` does per segment — O(1) jobs instead
    of O(segments) — for fold-to-N rewrites and repair's coverage
    backfill. ``schema`` pins the read like any manifest read (the
    segments may span schema vintages)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    segs = list(segs)
    if not segs:
        return {}
    root = component_root.rstrip("/")
    renames: dict[str, list[str]] = {}
    if schema is None:
        reader = spark.read
    else:
        scan_schema, renames = _rename_shadow_plan(schema)
        reader = spark.read.schema(scan_schema)
    df = reader.parquet(*[_segment_dir(root, s) for s in segs])
    # anchored to the file's immediate parent dir: an unanchored
    # ``seg=\d+/`` would match a dataset ROOT that itself contains a
    # seg=N path element, mis-keying every row onto one phantom segment
    # and leaving the real segments on empty-segment default stats —
    # which pruning would then treat as prunable (silent data drop)
    seg_key = (
        F.regexp_extract(F.col("_metadata.file_path"), r"/seg=(\d+)/[^/]*$", 1)
        .cast("bigint")
        .alias("__seg")
    )
    aggs = []
    for i, c in enumerate(cols):
        v = _renamed_col(F, c, renames)
        aggs += [
            F.min(v).alias(f"__z{i}n"),
            F.max(v).alias(f"__z{i}x"),
            F.sum(v.isNull().cast("long")).alias(f"__z{i}u"),
        ]
    out: dict[int, dict[str, list]] = {
        # a segment yielding no group row is EMPTY (zero rows): stats
        # match what the per-segment agg would return
        s: {c: [None, None, 0] for c in cols}
        for s in segs
    }
    for row in df.groupBy(seg_key).agg(*aggs).collect():
        out[int(row["__seg"])] = {
            c: [
                _zone_value(row[f"__z{i}n"]),
                _zone_value(row[f"__z{i}x"]),
                int(row[f"__z{i}u"] or 0),
            ]
            for i, c in enumerate(cols)
        }
    return out


# Bloom sidecars: equality-predicate segment skipping where zonemap
# min/max is useless (high-cardinality id columns). ~10 bits/value +
# 7 probes ≈ 1% false-positive rate (never false-negative); values
# hash through the portable md5-prefix construction on the STRING cast
# of the column, and the k probe positions come from Kirsch-
# Mitzenmacher double hashing of that one 60-bit value.
_BLOOM_BITS_PER_ROW = 10
_BLOOM_K = 7
_BLOOM_MAX_ROWS = 200_000  # larger segments skip the filter (kept on read)


def _bloom_path(component_root: str, seg: int, col: str) -> str:
    return f"{component_root.rstrip('/')}/_BLOOM.s{seg}.{col}.json"


def _bloom_h12(h: int) -> tuple[int, int]:
    return h & ((1 << 30) - 1), (h >> 30) | 1


def _bloom_hash(value: str) -> tuple[int, int]:
    """The Python twin of functions.text.hash60 (md5-prefix 60-bit) —
    sidecar probes run driver-side with no Spark job."""
    import hashlib  # noqa: PLC0415

    h = int(hashlib.md5(value.encode("utf-8")).hexdigest()[:15], 16)
    return _bloom_h12(h)


def _write_segment_bloom(
    spark, component_root: str, seg: int, col: str, overwrite: bool = False
) -> bool:
    """Build and write one segment's bloom sidecar for ``col`` from
    the just-written files: ONE small job collects the distinct
    (h1, h2) hash pairs (bounded by _BLOOM_MAX_ROWS — larger segments
    return False and stay conservatively unpruned), the bit array is
    set driver-side and lands as a JSON sidecar BEFORE the manifest
    flip, so a pinned segment always has its advertised sidecar."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    df = (
        spark.read.parquet(_segment_dir(component_root, seg))
        .select(F.col(col).cast("string").alias("v"))
        .filter(F.col("v").isNotNull())
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10)
            .cast("bigint")
            .alias("h")
        )
    )
    hashes = [r["h"] for r in df.limit(_BLOOM_MAX_ROWS + 1).collect()]
    if len(hashes) > _BLOOM_MAX_ROWS:
        return False
    n = len(hashes)
    m = max(64, n * _BLOOM_BITS_PER_ROW)
    bits = bytearray((m + 7) // 8)
    for h in hashes:
        h1, h2 = _bloom_h12(int(h))
        for i in range(_BLOOM_K):
            p = (h1 + i * h2) % m
            bits[p >> 3] |= 1 << (p & 7)
    import base64  # noqa: PLC0415

    payload = json.dumps(
        {"m": m, "k": _BLOOM_K, "n": n, "b64": base64.b64encode(bytes(bits)).decode()}
    )
    jvm, fs = _fs(spark, component_root)
    # exclusive create on the commit path (fresh segment ids, content
    # deterministic); repair passes overwrite=True to replace whatever
    # half-state a lost advertisement left behind
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(_bloom_path(component_root, seg, col)),
        overwrite,
    )
    out.write(payload.encode("utf-8"))
    out.close()
    return True


# driver-side bound for one batched bloom collect: segments are
# processed in chunks whose worst-case distinct-hash payload stays
# under this many rows (at _BLOOM_MAX_ROWS per segment → 10 segs/chunk)
_BLOOM_BATCH_ROWS = 2_000_000


def _write_segment_blooms_many(
    spark,
    component_root: str,
    segs: Sequence[int],
    col: str,
    overwrite: bool = False,
    dry_run: bool = False,
    schema=None,
) -> dict[int, bool]:
    """Bloom sidecars for ``col`` over MANY segments in O(1) Spark
    jobs per driver-memory-bounded chunk, instead of one job per
    segment (:func:`_write_segment_bloom`): per chunk, one job counts
    distinct hashes per segment (the over-budget test — those return
    False and stay conservatively unpruned, same contract as the
    per-segment path), one job collects the (segment, hash) pairs for
    the under-budget segments, and the bit arrays are set driver-side.
    Returns {seg: built}. ``dry_run`` stops after the count probe —
    the returned map says what an apply WOULD build vs drop, with no
    sidecar written (repair's plan/apply parity). ``schema`` (the
    component's manifest StructType) makes mixed-vintage segments safe:
    a segment that predates the column serves NULLs (empty bloom —
    correct), and a pre-rename segment's values are found under their
    prior physical name via the same coalesce plan readers use."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    segs = list(segs)
    if not segs:
        return {}
    root = component_root.rstrip("/")
    jvm, fs = _fs(spark, root)
    renames: dict[str, list[str]] = {}
    scan_schema = None
    if schema is not None:
        scan_schema, renames = _rename_shadow_plan(schema)

    def _pairs(over: Sequence[int]):
        # anchored like _segment_zone_stats_many: the segment id is the
        # file's immediate parent, never an ancestor path element
        seg_key = (
            F.regexp_extract(
                F.col("_metadata.file_path"), r"/seg=(\d+)/[^/]*$", 1
            )
            .cast("bigint")
            .alias("__seg")
        )
        reader = (
            spark.read if scan_schema is None else spark.read.schema(scan_schema)
        )
        return (
            reader.parquet(*[_segment_dir(root, s) for s in over])
            .select(seg_key, _renamed_col(F, col, renames).cast("string").alias("v"))
            .filter(F.col("v").isNotNull())
            .select(
                "__seg",
                F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10)
                .cast("bigint")
                .alias("h"),
            )
            .distinct()
        )

    # phase 1: ONE job counts distinct hashes per segment (over-budget
    # test); phase 2 collects packed by the ACTUAL counts, so many
    # small segments fit in one collect job and the driver-side payload
    # stays bounded by _BLOOM_BATCH_ROWS even at worst-case segments
    counts = {
        int(r["__seg"]): int(r["n"])
        for r in _pairs(segs).groupBy("__seg").agg(F.count("*").alias("n")).collect()
    }
    under = [s for s in segs if counts.get(s, 0) <= _BLOOM_MAX_ROWS]
    under_set = set(under)
    result: dict[int, bool] = {s: s in under_set for s in segs}
    if not under or dry_run:
        return result
    chunks: list[list[int]] = [[]]
    load = 0
    for s in under:
        n = max(counts.get(s, 0), 1)
        if chunks[-1] and load + n > _BLOOM_BATCH_ROWS:
            chunks.append([])
            load = 0
        chunks[-1].append(s)
        load += n
    import base64  # noqa: PLC0415

    for chunk in chunks:
        hashes: dict[int, list[int]] = {s: [] for s in chunk}
        for r in _pairs(chunk).collect():
            hashes[int(r["__seg"])].append(int(r["h"]))
        for s in chunk:
            hs = hashes[s]
            n = len(hs)
            m = max(64, n * _BLOOM_BITS_PER_ROW)
            bits = bytearray((m + 7) // 8)
            for h in hs:
                h1, h2 = _bloom_h12(int(h))
                for i in range(_BLOOM_K):
                    p = (h1 + i * h2) % m
                    bits[p >> 3] |= 1 << (p & 7)
            payload = json.dumps(
                {
                    "m": m,
                    "k": _BLOOM_K,
                    "n": n,
                    "b64": base64.b64encode(bytes(bits)).decode(),
                }
            )
            out = fs.create(
                jvm.org.apache.hadoop.fs.Path(_bloom_path(root, s, col)),
                overwrite,
            )
            out.write(payload.encode("utf-8"))
            out.close()
    return result


def _read_segment_bloom(spark, component_root: str, seg: int, col: str) -> dict:
    jvm, fs = _fs(spark, component_root)
    path = _bloom_path(component_root, seg, col)
    return json.loads(
        _read_small_file(jvm, fs, jvm.org.apache.hadoop.fs.Path(path))
    )


def _bloom_may_contain(bloom: dict, value: str) -> bool:
    import base64  # noqa: PLC0415

    m, k = bloom["m"], bloom["k"]
    bits = base64.b64decode(bloom["b64"])
    h1, h2 = _bloom_hash(value)
    return all(
        bits[((h1 + i * h2) % m) >> 3] & (1 << (((h1 + i * h2) % m) & 7))
        for i in range(k)
    )


def bloom_pruned_pins(
    spark, root: str, component: str, col: str, values: Sequence
) -> tuple[list[int], list[int]]:
    """Point-lookup segment skipping: ``(kept, pinned)`` for the
    predicate ``col IN values`` — a segment is dropped only when its
    bloom sidecar rejects EVERY probe value. Driver-side filesystem
    reads only (the sidecars of pinned segments), no job; segments
    without an advertised sidecar (pre-bloom commits, over-budget
    segments) are kept. Never false-negative by bloom construction.
    Values are probed through the same STRING cast the writer hashed
    (intended for id-like string/integer columns)."""
    pins, _zones, blooms, _meta, _schemas, _version, _counts = _manifest_state(spark, root)
    return bloom_pruned_pins_from_state(
        spark, root, component, col, values, pins, blooms
    )


def bloom_pruned_pins_from_state(
    spark,
    root: str,
    component: str,
    col: str,
    values: Sequence,
    pins: dict,
    blooms: dict,
) -> tuple[list[int], list[int]]:
    """:func:`bloom_pruned_pins` over an ALREADY-READ manifest state —
    for callers that consult several pieces of one manifest (pins +
    blooms + tombstones) and must both save the repeat filesystem
    reads and see ONE consistent snapshot across them."""
    if component not in pins:
        raise KeyError(f"bloom_pruned_pins: no pinned component {component!r}")
    probe = [str(v) for v in values if v is not None]
    covered = blooms.get(component, {})
    kept = []
    for seg in pins[component]:
        if col not in covered.get(seg, []):
            kept.append(seg)
            continue
        bloom = _read_segment_bloom(spark, f"{root}/{component}", seg, col)
        if any(_bloom_may_contain(bloom, v) for v in probe):
            kept.append(seg)
    return kept, pins[component]


def read_segments_bloom_pruned(
    spark, root: str, component: str, col: str, values: Sequence
) -> DataFrame:
    """A component's manifest-pinned scan restricted to segments whose
    bloom may hold one of ``values`` — the caller still applies the
    row-level IN predicate (bloom skipping only shrinks the file
    set). Schema-reconciled like the zone-pruned read. Schema and
    pruned pins resolve from ONE manifest snapshot: two separate reads
    could straddle an add-column commit and serve pins newer than the
    schema, silently dropping the fresh column."""
    pins, _zones, blooms, _meta, schemas, _version, _counts = _manifest_state(spark, root)
    schema = _schema_from_json(schemas.get(component))
    kept, pinned = bloom_pruned_pins_from_state(
        spark, root, component, col, values, pins, blooms
    )
    comp_root = f"{root.rstrip('/')}/{component}"
    if not kept:
        from pyspark.sql import functions as F  # noqa: PLC0415

        return read_segments(spark, comp_root, pinned[:1], schema=schema).filter(
            F.lit(False)
        )
    return read_segments(spark, comp_root, kept, schema=schema)


def commit_segment_manifest(
    spark,
    root: str,
    pins: dict[str, Sequence[int]],
    expected_base: int | None = None,
    zones: dict[str, dict[int, dict[str, list]]] | None = None,
    meta: dict | None = None,
    blooms: dict[str, dict[int, list[str]]] | None = None,
    schemas: dict[str, dict] | None = None,
    counts: dict[str, dict[int, int]] | None = None,
) -> int:
    """Atomically commit a full component→segment-list pin map as the
    next manifest snapshot (rows of (component, seg)). Returns the
    manifest's own snapshot version.

    ``counts`` (component → segment → exact physical row count, read
    driver-side from the parquet footers at cover time — zero jobs)
    rides under the reserved ``"_counts"`` key: the manifest-served
    COUNT(*) plane (:func:`count_segmented`,
    :func:`describe_segmented`) and the denominator of the rows-ratio
    auto-apply policy. Counts are PHYSICAL rows of the pinned files
    (superseded upsert revisions included), exactly what
    ``read_segments`` of those pins returns.

    ``schemas`` (component → StructType jsonValue) rides under the
    reserved ``"_schemas"`` key: the component's CURRENT logical
    schema, maintained by the append_segments protocol (evolved on
    add-column, rejected typed on type change) and used by readers to
    reconcile segments written under older schema versions (NULL
    backfill). Absent for components whose writers never evolve
    (the index families' fixed layouts).

    ``expected_base`` enables optimistic concurrency: pass the
    manifest version the pins were DERIVED from (0 for the first
    commit) and the commit claims exactly version base+1 — if another
    writer committed meanwhile, :class:`ConcurrentCommitError` is
    raised instead of silently dropping that writer's pinned segments
    (the lost-update hazard any multi-writer append protocol has).
    ``None`` keeps the single-writer next-free-number behavior.

    The manifest is a JSON blob snapshot (write_snapshot_blob), not a
    parquet dataset: commits and pin reads are filesystem operations,
    never Spark jobs — the metadata plane must not queue behind the
    data plane (a streaming sink commits every micro-batch).

    ``zones`` (optional) rides in the same blob under the reserved
    ``"_zones"`` key: ``component → segment → column → [min, max,
    n_nulls]`` zonemap stats for segment-level data skipping
    (:func:`zone_pruned_pins`). ``meta`` (optional, JSON-serializable)
    rides under ``"_meta"``: small application state whose update must
    be ATOMIC with the pin flip — e.g. a streaming sink's last
    committed micro-batch id, which is what makes replayed batches
    exactly-once (the dedup decision and the data commit are one
    filesystem rename). Underscore-prefixed top-level keys are
    metadata, skipped by every pin parser, so manifests with and
    without them interoperate."""
    if not pins or any(not segs for segs in pins.values()):
        raise ValueError(f"commit_segment_manifest: empty pin map/list in {pins!r}")
    if any(name.startswith("_") for name in pins):
        raise ValueError(
            "commit_segment_manifest: component names must not start with '_' "
            f"(reserved for manifest metadata): {sorted(pins)!r}"
        )
    doc: dict = {
        name: sorted(int(s) for s in segs) for name, segs in pins.items()
    }
    if zones:
        doc["_zones"] = {
            comp: {str(int(s)): stats for s, stats in zm.items()}
            for comp, zm in zones.items()
            if zm
        }
    if meta:
        doc["_meta"] = meta
    if blooms:
        doc["_blooms"] = {
            comp: {str(int(s)): sorted(cols) for s, cols in bm.items() if cols}
            for comp, bm in blooms.items()
            if bm
        }
    if schemas:
        doc["_schemas"] = {comp: sj for comp, sj in schemas.items() if sj}
    if counts:
        doc["_counts"] = {
            comp: {str(int(s)): int(n) for s, n in cm.items()}
            for comp, cm in counts.items()
            if cm
        }
    payload = json.dumps(doc, sort_keys=True)
    return write_snapshot_blob(
        spark,
        payload,
        f"{root.rstrip('/')}/manifest",
        version=None if expected_base is None else expected_base + 1,
    )


def committed_manifest_version(spark, root: str) -> int | None:
    """The dataset's current committed manifest version, from the
    write-once ``_LATEST.v<N>`` pointer listing alone — ONE directory
    listing, no blob read, no job. The cheap freshness probe for
    version-keyed plan caches (a search service revalidating a
    memoized probe plan pays this instead of a full manifest parse +
    bloom load per request); ``None`` when nothing was ever
    committed."""
    return _committed_version(spark, f"{root.rstrip('/')}/manifest")


def segment_pins(spark, root: str) -> dict[str, list[int]]:
    """The last COMMITTED manifest's component→segment-list map.
    Raises FileNotFoundError when no manifest was ever committed."""
    return segment_pins_versioned(spark, root)[0]


def segment_pins_versioned(spark, root: str) -> tuple[dict[str, list[int]], int]:
    """(pins, manifest_version) — the version is the optimistic-
    concurrency base to pass back into :func:`commit_segment_manifest`.
    Version is resolved FIRST and the rows read from that pinned
    snapshot, so the pair is consistent even if a concurrent commit
    lands between the two reads."""
    pins, _zones, _blooms, _meta, _schemas, version, _counts = _manifest_state(spark, root)
    return pins, version


def _manifest_state(
    spark, root: str
) -> tuple[
    dict[str, list[int]],
    dict[str, dict[int, dict[str, list]]],
    dict[str, dict[int, list[str]]],
    dict,
    dict[str, dict],
    int,
    dict[str, dict[int, int]],
]:
    """(pins, zones, blooms, meta, schemas, manifest_version, counts)
    from the last committed manifest blob — one filesystem read,
    consistent across the tuple (version resolved first, blob read at
    that version). ``counts`` sits AFTER the version so every
    positional ``state[N]`` reader written against the 6-tuple stays
    valid.
    The resolve-then-read pair can race a rival committer's retention
    (see read_snapshot_blob): a vanished committed blob is re-resolved
    — each retry sees a strictly newer pointer, so the loop converges
    or surfaces the typed conflict."""
    mroot = f"{root.rstrip('/')}/manifest"
    last: BaseException | None = None
    for _ in range(5):
        version = _committed_version(spark, mroot)
        if version is None:
            raise FileNotFoundError(f"no committed snapshot under {mroot}")
        try:
            parsed = json.loads(read_snapshot_blob(spark, mroot, version=version))
            break
        except FileNotFoundError as e:
            last = e
            time.sleep(0.01)
    else:
        raise ConcurrentCommitError(
            f"{mroot}: committed manifest reads kept racing retention"
        ) from last
    # set-dedup is defense in depth: a duplicated segment entry would
    # make read_segments scan that segment twice — duplicate rows
    pins = {
        name: sorted({int(s) for s in segs})
        for name, segs in parsed.items()
        if not name.startswith("_")
    }
    zones = {
        comp: {int(s): stats for s, stats in zm.items()}
        for comp, zm in parsed.get("_zones", {}).items()
    }
    blooms = {
        comp: {int(s): list(cols) for s, cols in bm.items()}
        for comp, bm in parsed.get("_blooms", {}).items()
    }
    counts = {
        comp: {int(s): int(n) for s, n in cm.items()}
        for comp, cm in parsed.get("_counts", {}).items()
    }
    return (
        pins,
        zones,
        blooms,
        parsed.get("_meta", {}),
        parsed.get("_schemas", {}),
        version,
        counts,
    )


class ManifestSnapshot(NamedTuple):
    """One consistent read of a segmented dataset's committed manifest
    — the PUBLIC form of the state tuple, for maintenance verbs
    (operators/zcluster, index compaction planners) that plan rewrites
    against a pinned version and commit with ``expected_base=
    snapshot.version``. All fields are plain JSON-shaped values."""

    pins: dict[str, list[int]]
    zones: dict[str, dict[int, dict[str, list]]]
    blooms: dict[str, dict[int, list[str]]]
    meta: dict
    schemas: dict[str, dict]
    version: int
    counts: dict[str, dict[int, int]] = {}


def manifest_snapshot(spark, root: str) -> ManifestSnapshot:
    """The last committed manifest as a :class:`ManifestSnapshot` —
    one filesystem read, consistent across every field (see
    :func:`segment_pins_versioned`)."""
    return ManifestSnapshot(*_manifest_state(spark, root))


def schema_from_json(schema_json: dict | None):
    """Public: the StructType for a manifest-carried schema JSON (or
    None) — what external readers pass to :func:`read_segments` to pin
    a mixed-vintage scan to the component's current logical schema."""
    return _schema_from_json(schema_json)


def segment_sizes(
    spark, root: str, component: str, segments: Sequence[int]
) -> dict[int, int]:
    """On-disk bytes per segment — the driver-side input of size-
    tiered maintenance planning (compaction tiers, recluster waves).
    ONE recursive listing of the component dir, bucketed by the seg=
    path element — not a content-summary round-trip per segment (an
    object-store LIST pages ~1000 entries per call, so a 10^4-segment
    component probes in ~file-count/1000 calls either way, but never
    in 10^4 sequential RPCs)."""
    want = {int(s) for s in segments}
    if not want:
        return {}
    comp_root = f"{root.rstrip('/')}/{component}"
    jvm, fs = _fs(spark, comp_root)
    out = {s: 0 for s in want}
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(comp_root), True)
    marker = "/seg="
    while it.hasNext():
        st = it.next()
        path = st.getPath().toString()
        # rfind + no-slash-after: the segment id must be the file's
        # IMMEDIATE parent dir — a dataset root that itself contains a
        # seg=N path element must not absorb every byte under it
        i = path.rfind(marker)
        if i < 0:
            continue
        tail = path[i + len(marker):]
        j = tail.find("/")
        if j < 0 or "/" in tail[j + 1:]:
            continue  # bare seg=… file, or seg=N was an ancestor dir
        try:
            seg = int(tail[:j])
        except ValueError:
            continue
        if seg in want:
            out[seg] += int(st.getLen())
    return out


def segment_manifest_versions(spark, root: str) -> list[int]:
    """Committed manifest versions still retained, ascending — the
    time-travel axis of a segmented dataset (expire_segments honors
    every retained manifest's pins, so each listed version is
    readable)."""
    mroot = f"{root.rstrip('/')}/manifest"
    committed = _committed_version(spark, mroot)
    if committed is None:
        return []
    return [v for v in snapshot_versions(spark, mroot) if v <= committed]


def segment_pins_at(spark, root: str, version: int) -> dict[str, list[int]]:
    """The pin map of a RETAINED historical manifest version — read a
    segmented dataset as of any commit still inside the retention
    window (the manifest blob is immutable; pinned segments are never
    rewritten, so the historical read is byte-stable)."""
    parsed = json.loads(
        read_snapshot_blob(spark, f"{root.rstrip('/')}/manifest", version=version)
    )
    return {
        name: sorted({int(s) for s in segs})
        for name, segs in parsed.items()
        if not name.startswith("_")
    }


def read_segmented_components_at(
    spark, root: str, version: int, components: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Time travel: every component at the segment lists pinned by
    manifest ``version`` (mirrors read_segmented_components for the
    committed head). The read uses the schemas AS OF that manifest —
    a column added later does not appear in a historical read."""
    parsed = json.loads(
        read_snapshot_blob(spark, f"{root.rstrip('/')}/manifest", version=version)
    )
    pins = {
        name: sorted({int(s) for s in segs})
        for name, segs in parsed.items()
        if not name.startswith("_")
    }
    schemas = parsed.get("_schemas", {})
    names = list(components) if components is not None else list(pins)
    return {
        name: read_segments(
            spark,
            f"{root}/{name}",
            pins[name],
            schema=_schema_from_json(schemas.get(name)),
        )
        for name in names
    }


def restore_segmented(
    spark, root: str, version: int, dry_run: bool = False
) -> dict:
    """Delta-style ``RESTORE TABLE ... TO VERSION AS OF``: re-commit a
    RETAINED historical manifest version's state as the NEW head —
    history stays linear (the restore is one more commit, claiming
    head+1 under optimistic concurrency), nothing is rewritten, and
    the bad commits remain time-travelable for forensics.

    What rolls back (the DATA PLANE, verbatim from the historical
    blob): component pins, zonemaps, blooms, schemas, the counts
    plane, per-component tombstone-pressure counters, and the
    ``_cdc_rewrites`` marker (all describe the restored pin set).
    Components born AFTER ``version`` drop from the head (their files
    stay on disk for time travel until retention collects them).

    What carries FORWARD (the APPLICATION plane): every other current
    meta key — consumer CDF watermarks, streaming batch ids, adopted
    legacy marks. Consumer positions must stay monotone: a consumer's
    next ``consume_changes`` window sees the restore commit's
    re-exposed segments as genuine changes (they ARE — the table's
    content changed back), not a replay of its already-consumed
    history.

    Zero Spark jobs: two blob reads, one driver-side existence listing
    per restored component (a restore must never commit pins whose
    files retention already collected — raises before the flip), one
    blob write. ``dry_run=True`` plans and validates without
    committing. Returns ``{"version", "restored_from",
    "components_restored", "components_dropped", "applied"}``."""
    cur = _manifest_state(spark, root)
    cur_pins, cur_meta, base = cur[0], cur[3], cur[5]
    if version > base:
        raise ValueError(
            f"restore_segmented: version {version} is ahead of the "
            f"committed head {base}"
        )
    parsed = json.loads(
        read_snapshot_blob(
            spark, f"{root.rstrip('/')}/manifest", version=version
        )
    )
    pins = {
        name: sorted({int(s) for s in segs})
        for name, segs in parsed.items()
        if not name.startswith("_")
    }
    # a restored pin must exist on disk: retention honors every
    # RETAINED manifest's pins, but an expired-then-restored version
    # would commit dangling segments — fail closed, before the flip
    for comp, segs in pins.items():
        have = set(segment_numbers(spark, f"{root.rstrip('/')}/{comp}"))
        gone = [s for s in segs if s not in have]
        if gone:
            raise FileNotFoundError(
                f"restore_segmented: version {version} pins segment(s) "
                f"{gone} of {comp!r} that no longer exist on disk — the "
                "version has been expired past restorability"
            )
    hist_meta = parsed.get("_meta", {})
    new_meta = {
        k: v
        for k, v in cur_meta.items()
        if not k.startswith(f"{TOMBSTONE_ROWS_KEY}:")
        and k != "_cdc_rewrites"
    }
    for k, v in hist_meta.items():
        if k.startswith(f"{TOMBSTONE_ROWS_KEY}:"):
            new_meta[k] = v
    if "_cdc_rewrites" in hist_meta:
        new_meta["_cdc_rewrites"] = hist_meta["_cdc_rewrites"]
    rep = {
        "restored_from": version,
        "components_restored": sorted(pins),
        "components_dropped": sorted(set(cur_pins) - set(pins)),
        "applied": not dry_run,
    }
    if dry_run:
        return {**rep, "version": base}
    kw: dict = {"meta": new_meta}
    zones = {
        comp: {int(s): stats for s, stats in zm.items()}
        for comp, zm in parsed.get("_zones", {}).items()
    }
    blooms = {
        comp: {int(s): list(cols) for s, cols in bm.items()}
        for comp, bm in parsed.get("_blooms", {}).items()
    }
    counts = {
        comp: {int(s): int(n) for s, n in cm.items()}
        for comp, cm in parsed.get("_counts", {}).items()
    }
    if zones:
        kw["zones"] = zones
    if blooms:
        kw["blooms"] = blooms
    if parsed.get("_schemas"):
        kw["schemas"] = parsed["_schemas"]
    if counts:
        kw["counts"] = counts
    ver = commit_segment_manifest(
        spark, root, pins, expected_base=base, **kw
    )
    return {**rep, "version": ver}


def _mark_rewrites(
    meta: dict,
    new_pins: dict[str, Sequence[int]],
    additions: dict[str, Sequence[int]],
) -> dict:
    """Record rewrite OUTPUTS (compaction folds, recluster slices) in
    manifest meta under ``_cdc_rewrites`` so the change feed
    (:func:`read_segment_changes`) can tell content-neutral layout
    maintenance apart from genuine appends. Carried entries subset to
    still-pinned segments, so the marker never outgrows the pin set."""
    prior = (meta or {}).get("_cdc_rewrites", {})
    out: dict[str, list[int]] = {}
    for comp, pins_ in new_pins.items():
        pinned = set(pins_)
        keep = {int(s) for s in prior.get(comp, []) if int(s) in pinned}
        keep |= {int(s) for s in additions.get(comp, []) if int(s) in pinned}
        if keep:
            out[comp] = sorted(keep)
    if not out and "_cdc_rewrites" not in (meta or {}):
        return meta or {}
    return {**(meta or {}), "_cdc_rewrites": out}


def read_segment_changes(
    spark,
    root: str,
    component: str,
    from_version: int,
    to_version: int | None = None,
    include_changes: bool = False,
) -> DataFrame:
    """INCREMENTAL read — the change-data-feed class (Delta CDF /
    Iceberg incremental-append): every row APPENDED to ``component``
    after manifest ``from_version`` (exclusive) up to ``to_version``
    (inclusive; default the committed head), as one schema-pinned
    union scan. Walks the RETAINED manifest versions in order and
    takes each version's first-seen new segments, EXCLUDING rewrite
    outputs (compaction / recluster mark their output segments in
    manifest meta via ``_mark_rewrites``) — so content-neutral layout
    maintenance between the two versions never re-emits old rows into
    the feed, and a segment that was appended AND compacted away
    inside the window is still picked up from the intermediate
    manifest that pinned it (its files survive while that manifest is
    retained).

    Contract with retention (the same one Delta CDF has with VACUUM):
    the feed is exact while every manifest in (from, to] is retained —
    tune ``expire_segments(keep_manifests=, reader_grace_sec=)`` to
    the consumer's cadence. A ``from_version`` already expired raises
    FileNotFoundError instead of silently under-reporting. Logical
    deletes are their own feed: consume the paired
    ``tombstone_component(component)`` the same way — or pass
    ``include_changes=True`` for the merged, RETRACTION-AWARE feed
    (the Delta-CDF ``_change_type`` shape): one frame of the
    component's schema plus three change columns —

    - ``_change_type``: 'insert' rows from the data feed; 'delete'
      rows from the paired tombstone feed (id column(s) populated,
      every other column NULL);
    - ``_commit_version``: the manifest version that committed the
      change (the window's total order);
    - ``_change_seq``: the LIVENESS watermark — an insert's revision
      sequence (its ``_useq``; 0 for plain unstamped appends) or a
      delete's ``dead_below`` (a legacy id-only tombstone reads as the
      kill-all sentinel). A consumer reconstructs the source's merged
      view exactly: keep an insert iff its ``_change_seq`` >= the MAX
      delete ``_change_seq`` for its id — the same
      kill-strictly-below rule :func:`read_segmented_merged` applies,
      so an upsert's own rows survive their same-sequence tombstone
      and plain appends die under ANY delete regardless of commit
      order.

    Each feed is ONE pinned multi-dir scan however many manifest
    versions the window spans: the ``seg=N`` segment directories are
    hive-partition-discovered (``basePath``), so every row carries its
    segment id, and a window-sized seg→version MAP LITERAL derives
    ``_commit_version`` — plan size independent of window width
    (r13 VERDICT #4; a component with a data column literally named
    ``seg`` falls back to the per-version union)."""
    comp_root = f"{root.rstrip('/')}/{component}"
    if not include_changes:
        feed, schema_json = _changed_segments(
            spark, root, component, from_version, to_version
        )
        if not feed:
            return _empty_feed_frame(spark, root, component, schema_json)
        return read_segments(
            spark, comp_root, feed, schema=_schema_from_json(schema_json)
        )
    from pyspark.sql import functions as F  # noqa: PLC0415

    tomb = _tombstone_component(component)
    multi = _changed_segments_multi(
        spark, root, [component, tomb], from_version, to_version
    )
    pairs, schema_json = multi[component]
    tpairs, tschema_json = multi[tomb]
    base = _empty_feed_frame(spark, root, component, schema_json)
    data_cols = base.columns
    clash = {"_change_type", "_commit_version", "_change_seq"} & set(data_cols)
    if clash:
        raise ValueError(
            f"read_segment_changes(include_changes=True): component "
            f"{component!r} has data column(s) {sorted(clash)} colliding "
            "with the reserved change-feed columns — rename them "
            "(rename_columns) or consume the plain feeds"
        )
    insert_seq = (
        F.coalesce(F.col(UPSERT_SEQ_COL), F.lit(0))
        if UPSERT_SEQ_COL in data_cols
        else F.lit(0)
    )
    typed = base.select(
        F.lit("insert").alias("_change_type"),
        F.lit(0).cast("bigint").alias("_commit_version"),
        F.lit(0).cast("bigint").alias("_change_seq"),
        *data_cols,
    ).filter(F.lit(False))
    if pairs:
        sl, ver, _meta_cols = _feed_scan_with_version(
            spark, comp_root, pairs, _schema_from_json(schema_json)
        )
        typed = typed.unionByName(
            sl.select(
                F.lit("insert").alias("_change_type"),
                ver.alias("_commit_version"),
                insert_seq.cast("bigint").alias("_change_seq"),
                *data_cols,
            )
        )
    dtypes = dict(base.dtypes)
    dead_all = F.lit(_DEAD_ALL_SEQ).cast("bigint")
    if tpairs:
        tl, tver, tmeta_cols = _feed_scan_with_version(
            spark,
            f"{root.rstrip('/')}/{tomb}",
            tpairs,
            _schema_from_json(tschema_json),
        )
        # subtract exactly the columns the feed scan ADDED (tag or
        # fallback version column) — a tombstone key column literally
        # named 'seg' rides the fallback path and must be served, not
        # nulled (r14 ADVICE #1)
        id_cols = {
            c
            for c in tl.columns
            if c != DEAD_BELOW_COL and c not in tmeta_cols
        }
        delete_seq = (
            F.coalesce(F.col(DEAD_BELOW_COL), dead_all)
            if DEAD_BELOW_COL in tl.columns
            else dead_all
        )
        typed = typed.unionByName(
            tl.select(
                F.lit("delete").alias("_change_type"),
                tver.alias("_commit_version"),
                delete_seq.alias("_change_seq"),
                *[
                    (
                        F.col(c) if c in id_cols else F.lit(None)
                    ).cast(dtypes[c]).alias(c)
                    for c in data_cols
                ],
            )
        )
    return typed


#: hive partition-dir name of a segment (``seg=N``) — the column the
#: tagged feed scan discovers via basePath
_SEG_TAG_COL = "seg"


def _feed_scan_with_version(spark, component_root: str, pairs, schema):
    """(frame, version Column, meta_cols) for a change-feed window:
    ONE multi-dir scan over the window's ``(version, segment)`` pairs
    with the segment id discovered as a hive partition column
    (``seg=N`` dirs + ``basePath``), and ``_commit_version`` derived
    through a window-sized seg→version map literal — so the PLAN stays
    one scan per feed regardless of how many manifest versions the
    window spans. Components with a data column literally named
    ``seg`` (shadowing the partition dir) fall back to a per-version
    union. ``meta_cols`` is the exact set of columns THIS function
    added to the frame (the ``seg`` tag or the fallback's version
    column) — callers deriving "the component's own columns" must
    subtract THESE, never the literal name ``'seg'``: on the fallback
    path a real data column named ``seg`` is a key column the feed
    must serve, not a tag to drop (r14 ADVICE #1). Rename vintages
    reconcile exactly as :func:`read_segments` does (same shadow plan
    + coalesce projection)."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    root = component_root.rstrip("/")
    data_names = (
        {f.name for f in schema.fields} if schema is not None else set()
    )
    if schema is not None and _SEG_TAG_COL not in data_names:
        scan_schema, renames = _rename_shadow_plan(schema)
        tagged = StructType(
            [*scan_schema.fields, StructField(_SEG_TAG_COL, LongType(), False)]
        )
        df = (
            spark.read.option("basePath", root)
            .schema(tagged)
            .parquet(*[_segment_dir(root, s) for _v, s in pairs])
        )
        if renames:
            df = df.select(
                *[_renamed_col(F, f.name, renames) for f in schema.fields],
                F.col(_SEG_TAG_COL),
            )
        vm = F.create_map(
            *[
                F.lit(x).cast("bigint")
                for v, s in pairs
                for x in (s, v)
            ]
        )
        return df, vm[F.col(_SEG_TAG_COL)].cast("bigint"), {_SEG_TAG_COL}
    # no recorded schema, or a data column shadows the partition dir
    # name: per-version union fallback (correct, window-width plan)
    grouped: dict[int, list[int]] = {}
    for v, s in pairs:
        grouped.setdefault(v, []).append(s)
    out = None
    ver_col = "_feed_version"
    while schema is not None and ver_col in data_names:
        ver_col += "_"
    for v, segs in sorted(grouped.items()):
        sl = read_segments(spark, root, segs, schema=schema).withColumn(
            ver_col, F.lit(v).cast("bigint")
        )
        out = sl if out is None else out.unionByName(sl)
    return out, F.col(ver_col), {ver_col}


def _empty_feed_frame(
    spark, root: str, component: str, schema_json: dict | None
) -> DataFrame:
    """A zero-row frame in the component's feed schema (manifest-
    recorded if present, else the head pins' footer schema)."""
    schema = _schema_from_json(schema_json)
    if schema is not None:
        return spark.createDataFrame([], schema)
    from pyspark.sql import functions as F  # noqa: PLC0415

    head_pins = segment_pins(spark, root)
    if component not in head_pins:
        raise KeyError(
            f"read_segment_changes: unknown component {component!r}"
        )
    return read_segments(
        spark, f"{root.rstrip('/')}/{component}", head_pins[component][:1]
    ).filter(F.lit(False))


def plan_segment_changes(
    spark,
    root: str,
    component: str,
    from_version: int,
    to_version: int | None = None,
) -> list[int]:
    """PUBLIC window planning for the change feed: the appended
    segment ids in (from, to] — the same walk
    :func:`read_segment_changes` scans, WITHOUT planning any scan.
    Driver-side filesystem reads only (ZERO Spark jobs — pinned in the
    suite); a cadence scheduler uses it to detect an empty window or
    size a batch before committing to a read."""
    return _changed_segments(spark, root, component, from_version, to_version)[0]


def _changed_segments(
    spark, root: str, component: str, from_version: int, to_version: int | None
) -> tuple[list[int], dict | None]:
    """(appended segment ids in (from, to], latest schema json seen) —
    the retained-version walk behind :func:`read_segment_changes`,
    driver-side filesystem reads only (no Spark job), so a consumer
    can detect an EMPTY window before planning any scan."""
    pairs, schema_json = _changed_segments_versioned(
        spark, root, component, from_version, to_version
    )
    return [s for _v, s in pairs], schema_json


def _changed_segments_versioned(
    spark, root: str, component: str, from_version: int, to_version: int | None
) -> tuple[list[tuple[int, int]], dict | None]:
    """((manifest_version, segment) pairs in commit order, window-safe
    schema json) — single-component view of the multi walk."""
    return _changed_segments_multi(
        spark, root, [component], from_version, to_version
    )[component]


def _union_prior_names(
    schema_json: dict, names_by_id: dict[int, set[str]]
) -> dict:
    """Enrich a schema with every name each field (by ``field_id``)
    carried anywhere in a feed window, as ``prior_names`` — the
    window-safe read schema: a later full fold may have STRIPPED the
    rename shim from the head schema, but segments committed earlier in
    the window still hold their vintage's physical names and must
    reconcile through the coalesce shadow scan."""
    fields = []
    changed = False
    for f in schema_json.get("fields", []):
        md = _field_meta(f)
        fid = md.get("field_id")
        extra = (
            (names_by_id.get(fid, set()) - {f["name"]})
            if fid is not None
            else set()
        )
        have = set(md.get("prior_names", []))
        if extra - have:
            fields.append(
                {**f, "metadata": {**md, "prior_names": sorted(have | extra)}}
            )
            changed = True
        else:
            fields.append(f)
    if not changed:
        return schema_json
    return {"type": "struct", "fields": fields}


def _changed_segments_multi(
    spark,
    root: str,
    components: Sequence[str],
    from_version: int,
    to_version: int | None,
) -> dict[str, tuple[list[tuple[int, int]], dict | None]]:
    """{component: ((version, segment) pairs in commit order,
    window-safe schema json)} for MANY components in ONE retained-
    version walk — each manifest blob is read and parsed once however
    many feeds ride it (the merge consumer walks data + tombstones).
    Driver-side filesystem reads only (no Spark job), so a consumer
    can detect an EMPTY window before planning any scan.

    The returned schema is the latest recorded one enriched with every
    name each field carried ACROSS the window (prior_names union by
    field_id): a rename followed by a normalizing full fold inside the
    window strips the shim from the head schema, but the feed still
    scans pre-rename segments from intermediate manifests — without
    the union those reads would silently null-backfill the renamed
    column."""
    mroot = f"{root.rstrip('/')}/manifest"
    head = _committed_version(spark, mroot)
    if head is None:
        raise FileNotFoundError(f"no committed manifest under {mroot}")
    to_version = head if to_version is None else to_version
    # from_version=0 is the bootstrap ("everything since the beginning"
    # — the same sentinel commit_segment_manifest documents for the
    # first commit); there is no manifest 0 to diff against
    bootstrap = from_version <= 0
    if bootstrap:
        seen: dict[str, set[int]] = {c: set() for c in components}
    else:
        at = segment_pins_at(spark, root, from_version)
        seen = {c: set(at.get(c, [])) for c in components}
    walk = [
        v
        for v in snapshot_versions(spark, mroot)
        if from_version < v <= to_version
    ]
    if bootstrap and not walk and to_version >= 1:
        # every manifest in (0, to] has expired: the documented
        # fail-loud contract (an expired from_version raises) must not
        # be bypassed by the 0 sentinel
        raise FileNotFoundError(
            f"read_segment_changes: no retained manifest <= v{to_version} "
            f"under {mroot} — the bootstrap window has expired"
        )
    feeds: dict[str, list[tuple[int, int]]] = {c: [] for c in components}
    schema_json: dict[str, dict | None] = {c: None for c in components}
    names_by_id: dict[str, dict[int, set[str]]] = {c: {} for c in components}
    for i, v in enumerate(walk):
        parsed = json.loads(read_snapshot_blob(spark, mroot, version=v))
        for c in components:
            pins_v = {int(s) for s in parsed.get(c, [])}
            if bootstrap and i == 0:
                # the earliest RETAINED version seeds the bootstrap with
                # its FULL pin set — rewrite outputs INCLUDED: once
                # retention expired the pre-compaction manifests, the
                # folds are the only copy of those rows, and excluding
                # them would hand a fresh mirror a silently incomplete
                # bootstrap. (At v1 this equals the incremental rule: an
                # init commit has no rewrite markers.)
                feeds[c] += [(v, s) for s in sorted(pins_v)]
            else:
                rewrites_v = {
                    int(s)
                    for s in parsed.get("_meta", {})
                    .get("_cdc_rewrites", {})
                    .get(c, [])
                }
                feeds[c] += [
                    (v, s) for s in sorted((pins_v - seen[c]) - rewrites_v)
                ]
            seen[c] |= pins_v
            sj = parsed.get("_schemas", {}).get(c)
            if sj is not None:
                schema_json[c] = sj
                for f in sj.get("fields", []):
                    md = _field_meta(f)
                    fid = md.get("field_id")
                    if fid is None:
                        continue
                    bucket = names_by_id[c].setdefault(fid, set())
                    bucket.add(f["name"])
                    bucket.update(md.get("prior_names", []))
    out: dict[str, tuple[list[tuple[int, int]], dict | None]] = {}
    for c in components:
        sj = schema_json[c]
        if sj is not None and names_by_id[c]:
            sj = _union_prior_names(sj, names_by_id[c])
        out[c] = (feeds[c], sj)
    return out


def consume_changes(
    spark,
    source_root: str,
    component: str,
    sink_root: str,
    sink_component: str | None = None,
    transform: Callable | None = None,
    max_attempts: int = 3,
    merge: bool = False,
    sink_zone_cols: Sequence[str] = (),
    sink_bloom_cols: Sequence[str] = (),
) -> dict:
    """EXACTLY-ONCE incremental consumption of a component's change
    feed into another segmented dataset — the downstream-maintenance
    loop (mirror replicas, training-data refreshes, derived tables)
    run as a cadence verb. The consumer's watermark (last source
    manifest version consumed) lives in the SINK's manifest meta and
    advances ATOMICALLY with the data commit, so a replayed or crashed
    run re-reads the same window instead of double-applying (the same
    transactional-sink discipline the streaming committers use); a
    rival consumer of the same sink loses the ``expected_base`` race
    and retries from the advanced watermark — never applies twice.

    Each call: read the sink's watermark for (source, component) →
    ``read_segment_changes`` since it → optionally ``transform(df)`` →
    one O(batch) append pinned to the sink version the watermark was
    read at. An empty window still advances the watermark (meta-only
    commit) so the next call's version walk stays short. A lost sink
    race retries from the fresh watermark up to ``max_attempts`` (the
    rival may have consumed the window already — the retry then
    no-ops). Returns ``{"from", "to", "applied", "attempts",
    "raced"}`` — ``raced`` counts lost sink races (a cadence
    scheduler logs rival-consumer churn without exception parsing).

    Default semantics are APPEND-feed: upserted revisions arrive as
    appends of the new revision (downstream dedupes on its own
    key/watermark, the same way every index family's liveness rule
    does) and physical deletes arrive on the paired tombstone
    component's feed — this verb never retracts rows from the sink.

    ``merge=True`` makes the mirror RETRACTION-AWARE: the same window
    additionally consumes the paired tombstone component's feed into
    the sink's paired tombstone component — ONE commit pins both — so
    ``read_segmented_merged(sink…)`` equals the source's merged view
    exactly (the mirrored rows carry the source's ``_useq`` /
    ``dead_below`` revision axis verbatim; upserts replace, deletes
    retract, resurrections serve). A merge-mode sink component must be
    maintained exclusively by this consumer — local writes would mix
    sequence axes. ``transform`` still applies to the DATA feed only
    (tombstones mirror untouched: ids must stay joinable).

    ``sink_zone_cols``/``sink_bloom_cols`` collect pruning coverage on
    each window's sink segment (append_segments semantics) — a mirror
    serving point lookups or range reads wants its own zonemaps/blooms,
    not just the source's."""
    sink_component = sink_component or component
    src_head = _committed_version(spark, f"{source_root.rstrip('/')}/manifest")
    if src_head is None:
        raise FileNotFoundError(f"no committed manifest under {source_root}")
    # keyed by (source, source component, sink component) — two sources
    # sharing a component name into one sink, or one source consumed
    # into two sink components, must each hold their OWN watermark (a
    # shared key would let the second consumer see the first's advanced
    # mark and silently no-op its windows)
    wm_key = (
        f"cdf_watermark:{source_root.rstrip('/')}:{component}:{sink_component}"
    )
    last_err: BaseException | None = None
    for attempt in range(max_attempts):
        try:
            rep = _consume_changes_once(
                spark,
                source_root,
                component,
                sink_root,
                sink_component,
                transform,
                src_head,
                wm_key,
                merge,
                sink_zone_cols,
                sink_bloom_cols,
            )
            return {**rep, "attempts": attempt + 1, "raced": attempt}
        except ConcurrentCommitError as e:
            last_err = e  # rival sink commit: replan from fresh watermark
    raise last_err


def _consume_changes_once(
    spark,
    source_root: str,
    component: str,
    sink_root: str,
    sink_component: str,
    transform: Callable | None,
    src_head: int,
    wm_key: str,
    merge: bool = False,
    sink_zone_cols: Sequence[str] = (),
    sink_bloom_cols: Sequence[str] = (),
) -> dict:
    try:
        (
            sink_pins, sink_zones, sink_blooms,
            sink_meta, sink_schemas, sink_base, sink_counts,
        ) = _manifest_state(spark, sink_root)
        sink_init = False
    except FileNotFoundError:
        sink_pins, sink_zones, sink_blooms, sink_counts = {}, {}, {}, {}
        sink_meta, sink_schemas, sink_base, sink_init = {}, {}, 0, True
    # migration: sinks written before the key carried source_root /
    # sink_component stored a bare per-component mark — adopt it rather
    # than re-bootstrapping (and duplicating) an already-synced mirror.
    # Adoption is RESTRICTED to the same-named sink component (the
    # only consumer shape the pre-keying era could have written), and
    # the legacy key is RETIRED in the same commit that records the
    # qualified one — so a later consumer with a different SINK
    # COMPONENT can never silently inherit this consumer's advanced
    # mark and skip its own bootstrap window. Residual ambiguity (r14
    # ADVICE #5): the legacy key carries no SOURCE identity, so a
    # first-time consumer from a DIFFERENT source_root but the same
    # component names still adopts a mark written for another source.
    # The adoption is surfaced loudly in the report
    # (``adopted_legacy_key``) so fleet operators can find pre-r13
    # sinks that inherited a shared history; multi-source fleets
    # should clear bare ``cdf_watermark:<component>`` keys before
    # pointing a NEW source at a pre-r13 sink — ``maintain``'s
    # retire_legacy_watermarks sweep does exactly that on cadence.
    legacy_key = f"cdf_watermark:{component}"
    adopted = False
    if wm_key in sink_meta:
        wm = int(sink_meta[wm_key])
    elif legacy_key in sink_meta and sink_component == component:
        wm = int(sink_meta[legacy_key])
        adopted = True
    else:
        wm = 0
    flag = {"adopted_legacy_key": True} if adopted else {}
    if src_head <= wm:
        return {"from": wm, "to": wm, "applied": False, **flag}
    # driver-side walk first: a maintenance-only window (rewrites, no
    # appends) must advance the watermark WITHOUT accreting an empty
    # segment per cadence — and without planning any scan. Merge mode
    # rides the SAME walk for both feeds (each blob parsed once).
    tomb_segs: list[int] = []
    tomb_schema_json: dict | None = None
    if merge:
        tomb = _tombstone_component(component)
        multi = _changed_segments_multi(
            spark, source_root, [component, tomb], wm, src_head
        )
        pairs, schema_json = multi[component]
        feed_segs = [s for _v, s in pairs]
        tomb_segs = [s for _v, s in multi[tomb][0]]
        tomb_schema_json = multi[tomb][1]
    else:
        feed_segs, schema_json = _changed_segments(
            spark, source_root, component, wm, src_head
        )
    new_meta = {**sink_meta, wm_key: src_head}
    if adopted:
        new_meta.pop(legacy_key, None)  # retire: no later inheritance
    if not feed_segs and not tomb_segs:
        if sink_init:
            return {"from": wm, "to": src_head, "applied": False, **flag}
        # commit against the SAME sink state the watermark was read at
        # (expected_base): a rival consumer advancing it concurrently
        # must conflict, never be silently regressed by our stale meta
        kw: dict = {"meta": new_meta}
        if sink_zones:
            kw["zones"] = sink_zones
        if sink_blooms:
            kw["blooms"] = sink_blooms
        if sink_schemas:
            kw["schemas"] = sink_schemas
        if sink_counts:
            kw["counts"] = sink_counts
        commit_segment_manifest(
            spark, sink_root, sink_pins, expected_base=sink_base, **kw
        )
        return {"from": wm, "to": src_head, "applied": False, **flag}
    appends: dict[str, DataFrame] = {}
    if feed_segs:
        feed = read_segments(
            spark,
            f"{source_root.rstrip('/')}/{component}",
            feed_segs,
            schema=_schema_from_json(schema_json),
        )
        if transform is not None:
            feed = transform(feed)
        appends[sink_component] = feed
    if tomb_segs:
        # tombstones mirror VERBATIM (dead_below sequence axis intact):
        # the sink's merged read then applies the source's own
        # liveness rule, so mirror == source merged view
        appends[_tombstone_component(sink_component)] = read_segments(
            spark,
            f"{source_root.rstrip('/')}/{_tombstone_component(component)}",
            tomb_segs,
            schema=_schema_from_json(tomb_schema_json),
        )
    cov: dict = {}
    if sink_zone_cols and sink_component in appends:
        cov["zone_cols"] = {sink_component: list(sink_zone_cols)}
    if sink_bloom_cols and sink_component in appends:
        cov["bloom_cols"] = {sink_component: list(sink_bloom_cols)}
    append_segments(
        spark,
        sink_root,
        appends,
        init=sink_init,
        meta=new_meta,
        expected_base=None if sink_init else sink_base,
        **cov,
    )
    return {"from": wm, "to": src_head, "applied": True, **flag}


def _tombstone_component(component: str) -> str:
    return f"{component}__tombstones"


def tombstone_component(component: str) -> str:
    """Public: the paired tombstone component's name for a logically
    deletable component — callers that inspect pins (audits, tests)
    resolve the naming convention through this, not a string format."""
    return _tombstone_component(component)


def _id_cols(id_col) -> list[str]:
    """Normalize the key spec every row-level verb takes: a single
    column name or a sequence of them (composite keys — the MERGE
    class a multi-column dimension needs)."""
    if isinstance(id_col, str):
        return [id_col]
    cols = list(id_col)
    if not cols or not all(isinstance(c, str) for c in cols):
        raise ValueError(f"id_col must be a column name or a non-empty "
                         f"sequence of names, got {id_col!r}")
    return cols


def component_tombstone_rows_key(component: str) -> str:
    """Manifest-meta key of the PER-COMPONENT tombstone row counter
    (the lake-core port of the index families' :data:`TOMBSTONE_ROWS_KEY`
    pressure counter): every delete/upsert/merge commit adds the
    tombstone rows it appends; the physical apply resets it to 0.
    ``maintain(apply_tombstones={comp: {"auto": ...}})`` reads it
    driver-side (no job) to fire the physical apply only under
    pressure, bounding the merged-read watermark fold without operator
    policy."""
    return f"{TOMBSTONE_ROWS_KEY}:{component}"


def delete_rows(
    spark, root: str, component: str, id_col, ids: Sequence
) -> dict[str, list[int]]:
    """LOGICAL delete on an append-only component: append one
    O(delete-set) tombstone segment (rows of ``id_col``) to the
    paired ``<component>__tombstones`` component and flip the
    manifest — committed data segments are never touched, so a delete
    costs the same as an ingest and is atomic/concurrent under the
    same optimistic protocol (a racing ingest or delete conflicts
    loudly and retries). Readers subtract tombstones via
    :func:`read_segmented_live`; :func:`apply_tombstones` makes the
    delete physical (the GDPR completion step). ``id_col`` may be a
    sequence of names (composite keys) with ``ids`` a sequence of
    tuples."""
    if not ids:
        return segment_pins(spark, root)
    idc = _id_cols(id_col)
    rows = [(v,) if len(idc) == 1 and not isinstance(v, tuple) else tuple(v)
            for v in ids]
    df = spark.createDataFrame(rows, idc).distinct()
    return delete_rows_from(spark, root, component, id_col, df)


def delete_rows_from(
    spark,
    root: str,
    component: str,
    id_col,
    ids_df: DataFrame,
    segment_partitions: int | None = 1,
) -> dict[str, list[int]]:
    """DataFrame-scale :func:`delete_rows`: the delete set is a frame
    of ids ("delete every row from source X") written straight into
    the tombstone component — nothing ever materializes on the driver,
    which is the only shape that survives a multi-million-row
    take-down. ``segment_partitions`` caps the tombstone segment's
    file count (None preserves the frame's partitioning). ``id_col``
    may be a sequence of names — composite keys tombstone as key
    tuples, and the merged/live readers fold liveness per tuple.

    Every tombstone row is stamped ``dead_below`` = the manifest
    sequence this delete commits at (the revision axis the index
    families use — text_index.py's useq/dead_below watermark): under
    :func:`read_segmented_merged` the delete kills exactly the
    revisions committed BEFORE it, so a LATER :func:`upsert_rows` of
    the same id resurrects. :func:`read_segmented_live` (the legacy
    bare-id view) ignores the stamp and hides every revision of a
    tombstoned id. A rival commit landing mid-delete conflicts loudly
    (the established delete contract) — the caller retries.

    The commit also advances the component's tombstone-row pressure
    counter (:func:`component_tombstone_rows_key`) atomically with the
    append — one extra O(delete-set) count job over the (persisted)
    id frame, which is what lets ``maintain``'s auto policy bound the
    merged-read fold without any operator bookkeeping."""
    idc = _id_cols(id_col)
    df0 = ids_df.select(*idc).distinct()
    if segment_partitions:
        df0 = df0.coalesce(segment_partitions)
    from pyspark.sql import functions as F  # noqa: PLC0415

    df0.persist()
    try:
        n_tomb = df0.count()
        state = _manifest_state(spark, root)
        meta, base = state[3], state[5]
        df = df0.withColumn(DEAD_BELOW_COL, F.lit(base + 1).cast("bigint"))
        ckey = component_tombstone_rows_key(component)
        return append_segments(
            spark,
            root,
            appends={_tombstone_component(component): df},
            expected_base=base,
            meta={**meta, ckey: int(meta.get(ckey, 0)) + n_tomb},
        )
    finally:
        df0.unpersist()


#: Revision axis of a versioned component (the lake-core port of the
#: index families' useq/dead_below watermark — operators/text_index.py):
#: data rows carry ``_useq`` = the manifest sequence that committed
#: them (absent/NULL reads as 0 — rows written BEFORE the component
#: carried the axis predate every tombstone; once the recorded schema
#: carries ``_useq``, :func:`append_segments` stamps plain appends at
#: their commit sequence too, so commit order is respected — an
#: append AFTER a delete of the same id serves); tombstone rows carry
#: ``dead_below`` = the sequence of the delete/upsert that wrote
#: them. A row is LIVE under :func:`read_segmented_merged` iff its
#: ``_useq`` >= its id's highest ``dead_below``.
UPSERT_SEQ_COL = "_useq"
DEAD_BELOW_COL = "dead_below"

#: A tombstone row with NO ``dead_below`` (written before the revision
#: axis existed) kills every revision — the legacy bare-id intent.
_DEAD_ALL_SEQ = 1 << 62


def _probe_batch_ids(
    spark, root: str, component: str, ids: DataFrame, idc: list[str],
    pins: dict, schemas: dict, check: bool,
) -> int:
    """The batch's distinct-id count (the pressure-counter delta) AND
    the legacy kill-all guard in ONE Spark job: when checking is on
    and the pinned tombstone component can hold stampless rows, the
    probe left-joins the deduplicated legacy id set and tallies
    coverage in the same agg; covered batches raise loudly — a
    stampless legacy tombstone (written before the revision axis
    existed) kills EVERY revision of its id, so the new rows would be
    silently invisible to every merged read."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    lg = None
    mark = _uniq_name("_legacy", set(idc))
    tomb = _tombstone_component(component)
    if check and tomb in pins:
        tdf = read_segments(
            spark,
            f"{root.rstrip('/')}/{tomb}",
            pins[tomb],
            schema=_schema_from_json(schemas.get(tomb)),
        )
        if set(idc) <= set(tdf.columns):
            legacy = (
                tdf.filter(F.col(DEAD_BELOW_COL).isNull())
                if DEAD_BELOW_COL in tdf.columns
                else tdf
            )
            lg = (
                legacy.select(*idc)
                .dropDuplicates(idc)
                .withColumn(mark, F.lit(1))
            )
    if lg is None:
        return ids.count()
    row = (
        ids.join(lg, on=idc, how="left")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col(mark)).alias("c"))
        .collect()[0]
    )
    if int(row["c"] or 0):
        raise RuntimeError(
            f"upsert/merge into {component!r}: some batch ids are covered "
            "by LEGACY kill-all tombstones (no dead_below stamp) — the new "
            "revisions would be silently invisible to every merged read. "
            "Run apply_tombstones(..., merged=True) first to retire them, "
            "or pass check_legacy_tombstones=False to accept the loss."
        )
    return int(row["n"])


def upsert_rows(
    spark,
    root: str,
    component: str,
    id_col,
    rows: DataFrame,
    max_attempts: int = 3,
    zone_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    segment_partitions: int | None = 1,
    check_legacy_tombstones: bool = True,
) -> dict[str, list[int]]:
    """Single-commit row-level UPSERT on a plain segmented component —
    the MERGE INTO class every mirror and dimension table needs
    (r12 VERDICT #1): ONE ``expected_base`` manifest flip pins both a
    tombstone-at-this-sequence for the upserted ids AND the new
    revisions, so readers see pre- or post-upsert state, never half,
    and delete+append never exists as two non-atomic commits. The
    design is the index families' sequence-watermark liveness axis
    (operators/text_index.py useq/dead_below) ported to the lake core:

    - new rows land stamped ``_useq = seq`` (the committing manifest
      sequence);
    - one ``(id, dead_below=seq)`` tombstone row per upserted id:
      prior revisions (``_useq < seq``, including unstamped plain
      appends, which read as 0) die, the new rows (``_useq = seq``)
      live, and a later upsert of a DELETED id resurrects it because
      its sequence outranks the delete's.

    ``rows`` may carry many rows per id ("replace all rows of these
    ids"). O(batch) — committed segments are never touched; the dead
    revisions leave disk when :func:`apply_tombstones` (with
    ``merged=True``) or compaction rewrites them on the maintenance
    cadence. Serve the merged view with :func:`read_segmented_merged`.
    ``zone_cols``/``bloom_cols`` collect pruning coverage on the new
    revision segment exactly as append_segments does (a dimension
    table served by point lookups wants its id bloomed on every
    commit). Retries from fresh state on a rival commit (the payload
    restamps at the fresh sequence). Returns the committed pin map.

    ``id_col`` may be a sequence of names (composite keys).
    ``segment_partitions`` caps the tombstone segment's file count
    like :func:`delete_rows_from` (None preserves the id frame's
    partitioning — the multi-million-id batch shape). The commit
    advances the component's tombstone pressure counter
    (:func:`component_tombstone_rows_key`) atomically, and — unless
    ``check_legacy_tombstones=False`` — probes for stampless kill-all
    tombstones covering the batch, which would make the new revisions
    silently invisible (:func:`_probe_batch_ids`). This verb
    never reads the target's data rows: blind whole-key replace, the
    O(batch) fast path. For conditional / skip-if-unchanged MERGE
    semantics use :func:`merge_rows`."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    idc = _id_cols(id_col)
    ids = rows.select(*idc).distinct()
    if segment_partitions:
        ids = ids.coalesce(segment_partitions)
    ids.persist()
    try:
        state = _manifest_state(spark, root)
        # ONE probe job: the batch's id count (pressure counter delta)
        # and the legacy kill-all coverage check ride the same pass.
        # The guard is evaluated against this first read — legacy
        # (stampless) tombstones can only appear via manual pre-axis
        # writes, never from a racing modern verb, so a retry needn't
        # re-probe.
        n_tomb = _probe_batch_ids(
            spark, root, component, ids, idc,
            state[0], state[4], check_legacy_tombstones,
        )
        ckey = component_tombstone_rows_key(component)
        last_err: BaseException | None = None
        for _attempt in range(max_attempts):
            pins, meta, schemas, base = state[0], state[3], state[4], state[5]
            seq = base + 1
            stamped = rows.withColumn(
                UPSERT_SEQ_COL, F.lit(seq).cast("bigint")
            )
            tomb = ids.withColumn(
                DEAD_BELOW_COL, F.lit(seq).cast("bigint")
            )
            kw: dict = {
                "meta": {**meta, ckey: int(meta.get(ckey, 0)) + n_tomb}
            }
            if zone_cols:
                kw["zone_cols"] = {component: list(zone_cols)}
            if bloom_cols:
                kw["bloom_cols"] = {component: list(bloom_cols)}
            try:
                return append_segments(
                    spark,
                    root,
                    appends={
                        component: stamped,
                        _tombstone_component(component): tomb,
                    },
                    expected_base=base,
                    **kw,
                )
            except ConcurrentCommitError as e:
                last_err = e  # rival commit: replan; restamp at fresh seq
                state = _manifest_state(spark, root)
        raise last_err
    finally:
        ids.unpersist()


def _uniq_name(base: str, taken) -> str:
    """An internal column name guaranteed not to collide with user
    columns (the _merged_view while-loop alias rule, shared)."""
    name = base
    while name in taken:
        name += "_"
    return name


def merge_rows(
    spark,
    root: str,
    component: str,
    id_col,
    rows: DataFrame,
    when_matched=None,
    skip_unchanged: bool = True,
    insert_unmatched: bool = True,
    update_set=None,
    insert_values=None,
    when_matched_delete=None,
    when_not_matched_insert=None,
    source_scratch_cols: Sequence[str] = (),
    when_not_matched_by_source_delete=None,
    when_not_matched_by_source_set=None,
    when_not_matched_by_source_condition=None,
    extra_meta: dict | None = None,
    max_attempts: int = 3,
    zone_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    segment_partitions: int | None = 1,
    check_legacy_tombstones: bool = True,
    bloom_probe_cap: int = 10_000,
) -> dict:
    """The FULL conditional MERGE class on a segmented component —
    ``MERGE INTO target USING rows ON keys WHEN MATCHED [AND pred]
    THEN UPDATE WHEN NOT MATCHED THEN INSERT`` — as ONE
    ``expected_base`` manifest flip (r13 VERDICT #1, generalizing
    :func:`upsert_rows`):

    - ``id_col``: one name or a sequence (composite keys). A matched
      key is whole-key REPLACED by the batch's rows for it (many rows
      per key allowed on both sides, like upsert_rows).
    - ``when_matched``: optional boolean predicate (SQL string or
      Column) over ``source.<col>`` / ``target.<col>`` — a matched key
      updates only if SOME (source row, live target row) pair
      satisfies it (``WHEN MATCHED AND <pred>``). None → every matched
      key is an update candidate.
    - ``skip_unchanged=True`` (default): a matched key whose batch
      rows are content-identical to its live rows (multiset compare
      over the aligned column set, xxhash64 row fingerprints — a
      2^-64-per-key collision bound) is SKIPPED: no revision, no
      tombstone row. This is what keeps no-op cadence batches from
      churning the tombstone component, whose accumulated rows are
      exactly the merged-read fold cost bench_merged_read measured.
    - ``insert_unmatched=True``: unmatched keys insert (NULL-keyed
      batch rows never match — SQL join semantics — so they insert).
    - ``update_set``: PARTIAL-COLUMN update (``... THEN UPDATE SET c =
      expr``): ``{column: expression}`` over ``source.*``/``target.*``
      — an updated key's replacement rows are its LIVE TARGET rows
      with only the named columns rewritten (every other column keeps
      the target's value), so a narrow patch frame (keys + one metric)
      updates a wide dimension without nulling the rest. Requires the
      batch unique per key (a multi-row patch is ambiguous — raises);
      ``skip_unchanged`` then compares the PATCHED rows against the
      target, so a patch that writes the value already there is a
      no-op. None (default) → whole-key replace by the batch's rows.
    - ``insert_values``: the explicit ``WHEN NOT MATCHED THEN INSERT
      (cols) VALUES (...)`` clause — ``{column: expression}`` over
      ``source.*`` — insert rows are built by PROJECTING the batch
      onto the target's recorded columns: key columns carry
      ``source.<key>``, named columns evaluate their expression,
      every other target column inserts NULL. Inserts can therefore
      NEVER evolve the component schema (the Delta-grammar answer to
      the narrow-patch footgun below). Requires
      ``insert_unmatched=True``; key columns are not rewritable.
    - **Narrow-patch guard**: ``update_set`` with the default
      ``insert_unmatched=True`` and no ``insert_values`` RAISES when
      the batch carries columns outside the target's recorded schema
      — otherwise a stray unmatched key in a keys+scratch patch frame
      would silently insert a null-padded row AND schema-evolve the
      scratch column into the dimension (r14 VERDICT #1). Pass
      ``insert_unmatched=False`` (patch-only), ``insert_values``
      (explicit projection), or a batch whose columns are all target
      columns.
    - ``when_matched_delete``: ``WHEN MATCHED AND <pred> THEN
      DELETE`` — a matched key with SOME (source, target) pair
      satisfying this predicate is TOMBSTONED at this commit's
      sequence (no replacement rows; a later upsert resurrects).
      Evaluated BEFORE the update clause: a key matching both deletes.
      Completes the MERGE grammar alongside update/insert.
    - ``when_not_matched_insert``: the conditional-insert clause
      (``WHEN NOT MATCHED AND <cond> THEN INSERT``) — a predicate over
      ``source.*``; an unmatched key inserts only if SOME of its batch
      rows satisfies it. Composes with ``insert_values``. None → every
      unmatched key inserts (under ``insert_unmatched``).
    - ``source_scratch_cols``: batch columns that exist ONLY for the
      clause predicates (a CDC feed's op marker, a delete flag) —
      visible to ``when_matched`` / ``when_matched_delete`` /
      ``when_not_matched_insert`` / ``update_set`` expressions, but
      DROPPED from every written row and excluded from the
      skip-unchanged fingerprint, so markers can never evolve into the
      target schema. This is the single-commit CDC-apply shape:
      ``merge_rows(..., when_matched_delete="source._op = 'D'",
      when_not_matched_insert="source._op != 'D'",
      source_scratch_cols=["_op"])``.
    - ``when_not_matched_by_source_delete`` / ``_set`` /
      ``_condition``: the third Delta clause class — act on TARGET
      keys with NO match in the batch (``WHEN NOT MATCHED BY SOURCE
      [AND cond] THEN DELETE | UPDATE SET ...``). ``_delete`` is
      ``True`` (every unmatched target key) or a predicate over
      ``target.*`` (a key deletes iff SOME live row satisfies it);
      ``_set`` is ``{column: expression}`` over ``target.*`` applied
      ROW-WISE to live rows satisfying ``_condition`` (None → all
      rows) — a key rewrites iff it has such a row, carrying its other
      rows unchanged; ``skip_unchanged`` still applies (a SET that
      writes the value already there commits nothing for that key).
      The delete clause wins a key matching both. COST: these clauses
      make every target key a candidate, so the touched-segment
      pruning is disabled and the merge reads the FULL merged view —
      the same documented full-target-scan cost Delta's
      whenNotMatchedBySource clauses pay. Use for dimension
      retirement / staleness-marking cadences, not point lookups.
    - ``extra_meta``: merged into the sink's manifest meta atomically
      with the commit (the transactional-sink hook — a streaming
      committer records its batch id here, replay-safe).
    - ``bloom_probe_cap``: bounded-batch bloom pruning (r14 VERDICT
      #4). Zonemap ranges prune nothing on a scattered point-key
      batch; when a key column carries bloom sidecars and the batch's
      distinct keys fit the cap (detected by an approx sketch riding
      the probe job, then fetched by one tiny ``distinct().limit``
      job), each segment's bloom is tested DRIVER-SIDE and the target
      read intersects down to the bloom-hit segments. ``0`` disables.
      The report's ``"probe"`` entry records ``segments_pinned`` /
      ``segments_read``.

    Unlike :func:`upsert_rows` (the blind O(batch) fast path), this
    verb READS the target's merged view restricted to the batch's keys
    — one pruned scan + one O(batch-matched) fingerprint shuffle, the
    same cost class as Delta/Iceberg MERGE's touched-file scan. The
    commit is upsert-shaped: changed/new rows land stamped
    ``_useq = seq``; ONE ``(keys, dead_below=seq)`` tombstone row per
    UPDATED key (inserts never tombstone); pressure counter advanced;
    a fully-no-op batch commits NOTHING (version unchanged). Retries
    from fresh state on a rival commit. Returns ``{"pins", "version",
    "updated", "inserted", "deleted", "skipped", "applied",
    "attempts", "probe"}`` plus ``nmbs_updated`` / ``nmbs_deleted``
    when the NOT MATCHED BY SOURCE clauses are given.

    Oracle twin: ``lake_merge_conditional`` (plans/queries_core);
    reference parity: the reference's LEA dimension join
    (silver_to_gold.py:73-77) is the single-key special case."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    idc = _id_cols(id_col)
    missing = [c for c in idc if c not in rows.columns]
    if missing:
        raise ValueError(f"merge_rows: batch lacks key column(s) {missing}")
    if insert_values is not None and not insert_unmatched:
        raise ValueError(
            "merge_rows: insert_values is the WHEN NOT MATCHED INSERT "
            "clause — it requires insert_unmatched=True"
        )
    pred = (
        F.expr(when_matched)
        if isinstance(when_matched, str)
        else when_matched
    )
    dpred = (
        F.expr(when_matched_delete)
        if isinstance(when_matched_delete, str)
        else when_matched_delete
    )
    nmbs_del = when_not_matched_by_source_delete
    if isinstance(nmbs_del, str):
        nmbs_del = F.expr(nmbs_del)
    nmbs_set = when_not_matched_by_source_set
    nmbs_cond = when_not_matched_by_source_condition
    if isinstance(nmbs_cond, str):
        nmbs_cond = F.expr(nmbs_cond)
    nmbs_active = nmbs_del is not None or bool(nmbs_set)
    ipred = (
        F.expr(when_not_matched_insert)
        if isinstance(when_not_matched_insert, str)
        else when_not_matched_insert
    )
    scratch_decl = list(source_scratch_cols)
    bad_scr = sorted(set(scratch_decl) & set(idc))
    if bad_scr:
        raise ValueError(
            f"merge_rows: source_scratch_cols cannot include key "
            f"column(s) {bad_scr}"
        )
    missing_scr = sorted(c for c in scratch_decl if c not in rows.columns)
    if missing_scr:
        raise ValueError(
            f"merge_rows: source_scratch_cols {missing_scr} not in the "
            "batch"
        )
    last_err: BaseException | None = None
    for attempt in range(max_attempts):
        state = _manifest_state(spark, root)
        pins, meta, schemas, base = state[0], state[3], state[4], state[5]
        if component not in pins:
            raise KeyError(
                f"merge_rows: no component {component!r} under {root} — "
                "bootstrap it with append_segments/upsert_rows first"
            )
        # ONE probe job over the batch carries BOTH pre-passes:
        # touched-segment pruning (the Delta/Iceberg MERGE file-skip
        # shape — each covered key column's (min, max) bounds the
        # target read, per-column kept sets INTERSECT for composite
        # keys since an equi-join match needs every column in range; at
        # 100 TB the merge then scans only the segments the batch can
        # touch, not the table) and the legacy kill-all coverage tally
        # (a stampless tombstone covering a batch id raises — the
        # revision would be silently invisible). Conservative pruning:
        # stat-less segments stay; uncovered columns and all-NULL batch
        # columns don't prune.
        read_pins = pins
        zones_all = state[1]
        blooms_all = state[2]
        # NOT MATCHED BY SOURCE makes EVERY target key a candidate:
        # touched-segment pruning must not drop segments the batch
        # can't match (their unmatched keys are exactly the clause's
        # subjects) — the merge pays the full-target read Delta's
        # whenNotMatchedBySource documents
        covered = (
            []
            if nmbs_active
            else [
                c
                for c in idc
                if any(
                    c in zs for zs in zones_all.get(component, {}).values()
                )
            ]
        )
        bloom_cov = (
            [
                c
                for c in idc
                if any(
                    c in blooms_all.get(component, {}).get(s, [])
                    for s in pins[component]
                )
            ]
            if bloom_probe_cap and not nmbs_active
            else []
        )
        lgmark = _uniq_name("_legacy", set(rows.columns) | set(idc))
        lg = None
        if check_legacy_tombstones and _tombstone_component(component) in pins:
            tdf = read_segments(
                spark,
                f"{root.rstrip('/')}/{_tombstone_component(component)}",
                pins[_tombstone_component(component)],
                schema=_schema_from_json(
                    schemas.get(_tombstone_component(component))
                ),
            )
            if set(idc) <= set(tdf.columns):
                legacy = (
                    tdf.filter(F.col(DEAD_BELOW_COL).isNull())
                    if DEAD_BELOW_COL in tdf.columns
                    else tdf
                )
                lg = (
                    legacy.select(*idc)
                    .dropDuplicates(idc)
                    .withColumn(lgmark, F.lit(1))
                )
        if covered or bloom_cov or lg is not None:
            probe = rows if lg is None else rows.join(lg, on=idc, how="left")
            aggs = [
                x
                for c in covered
                for x in (F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}"))
            ]
            # bounded-batch detector for bloom probing: a fixed-size
            # sketch riding the SAME probe job (never a collect_set —
            # an unbounded distinct-key set must not materialize in one
            # agg buffer at 100 TB)
            aggs += [
                F.approx_count_distinct(F.col(c)).alias(f"kn_{c}")
                for c in bloom_cov
            ]
            if lg is not None:
                aggs.append(F.sum(F.col(lgmark)).alias(lgmark))
            b = probe.agg(*aggs).collect()[0]
            if lg is not None and int(b[lgmark] or 0):
                raise RuntimeError(
                    f"upsert/merge into {component!r}: some batch ids are "
                    "covered by LEGACY kill-all tombstones (no dead_below "
                    "stamp) — the new revisions would be silently invisible "
                    "to every merged read. Run apply_tombstones(..., "
                    "merged=True) first to retire them, or pass "
                    "check_legacy_tombstones=False to accept the loss."
                )
            kept_set: set[int] | None = None
            for c in covered:
                if b[f"lo_{c}"] is None:
                    continue  # all-NULL batch column: no bound from it
                kept_c, _pinned = zone_pruned_pins_from_state(
                    component, c, b[f"lo_{c}"], b[f"hi_{c}"], pins, zones_all
                )
                kept_set = (
                    set(kept_c)
                    if kept_set is None
                    else kept_set & set(kept_c)
                )
            for c in bloom_cov:
                # zonemap ranges prune nothing on a SCATTERED point-key
                # batch (uniform ids span every segment's range); for a
                # bounded batch, test the actual keys against each
                # segment's bloom sidecar driver-side instead (r14
                # VERDICT #4). The sketch gates a second tiny job that
                # fetches at most cap+1 distinct keys; oversized batches
                # skip (pruning stays conservative).
                if int(b[f"kn_{c}"] or 0) > bloom_probe_cap:
                    continue
                ks = [
                    r[0]
                    for r in rows.select(F.col(c).cast("string"))
                    .where(F.col(c).isNotNull())
                    .distinct()
                    .limit(bloom_probe_cap + 1)
                    .collect()
                ]
                if len(ks) > bloom_probe_cap:
                    continue  # sketch under-estimated: stay conservative
                kept_c, _pinned = bloom_pruned_pins_from_state(
                    spark, root, component, c, ks, pins, blooms_all
                )
                kept_set = (
                    set(kept_c)
                    if kept_set is None
                    else kept_set & set(kept_c)
                )
            if kept_set is not None:
                kept = [s for s in pins[component] if s in kept_set]
                if kept:
                    read_pins = {**pins, component: kept}
                elif (sch := _schema_from_json(schemas.get(component))) is not None:
                    read_pins = None  # no segment can match: empty target
                    empty_target = spark.createDataFrame([], sch)
        probe_rep = {
            "segments_pinned": len(pins[component]),
            "segments_read": (
                0 if read_pins is None else len(read_pins[component])
            ),
        }
        target = (
            empty_target
            if read_pins is None
            else _merged_from_state(
                spark, root, component, idc, read_pins, schemas
            )
        )
        # aligned compare set: every target data column (manifest
        # order, _useq excluded) plus batch-only additions; each side
        # serves a missing column as NULL at the agreed type, so an
        # evolution-lagging writer compares exactly as its rows would
        # read back
        tgt_schema = _schema_from_json(schemas.get(component)) or target.schema
        types = {f.name: f.dataType for f in tgt_schema.fields}
        for f in rows.schema.fields:
            types.setdefault(f.name, f.dataType)
        # scratch markers are predicate-only: never fingerprinted (a
        # marker flip must not defeat skip-if-unchanged), never written
        cmp_cols = [
            c for c in types
            if c != UPSERT_SEQ_COL and c not in scratch_decl
        ]
        recorded = [f.name for f in tgt_schema.fields if f.name != UPSERT_SEQ_COL]
        if insert_values is not None:
            bad = sorted(set(insert_values) & set(idc))
            if bad:
                raise ValueError(
                    f"merge_rows: insert_values cannot rewrite key "
                    f"column(s) {bad} (keys carry source.<key>)"
                )
            unknown = sorted(
                c for c in insert_values
                if c not in recorded or c == UPSERT_SEQ_COL
            )
            if unknown:
                raise ValueError(
                    f"merge_rows: insert_values targets column(s) {unknown} "
                    "not in the target's recorded schema — inserts never "
                    "evolve the schema; append/upsert the new column first"
                )

            def _ins_expr(c: str):
                if c in idc:
                    return F.col(f"source.{c}")
                e = insert_values.get(c)
                if e is None:
                    return F.lit(None)
                return F.expr(e) if isinstance(e, str) else e

            ins_src = rows.alias("source").select(
                *[_ins_expr(c).cast(types[c]).alias(c) for c in recorded]
            )
        else:
            if update_set and insert_unmatched:
                scratch = sorted(
                    set(rows.columns)
                    - set(recorded)
                    - {UPSERT_SEQ_COL}
                    - set(scratch_decl)
                )
                if scratch:
                    raise ValueError(
                        "merge_rows: update_set with insert_unmatched=True "
                        f"and a batch carrying non-target column(s) {scratch} "
                        "— an unmatched key would silently insert a "
                        "null-padded row and evolve the schema with the "
                        "patch's scratch columns. Pass "
                        "insert_unmatched=False, or insert_values={...} to "
                        "project inserts onto the target schema explicitly."
                    )
            ins_src = rows.drop(*scratch_decl) if scratch_decl else rows

        def _fp(df: DataFrame):
            have = set(df.columns)
            return F.xxhash64(
                *[
                    (F.col(c) if c in have else F.lit(None)).cast(types[c])
                    for c in cmp_cols
                ]
            )

        taken = set(idc)
        sfp = _uniq_name("_src_fp", taken)
        tfp = _uniq_name("_tgt_fp", taken)
        updc = _uniq_name("_upd", taken)
        insc = _uniq_name("_ins", taken)
        pfl = _uniq_name("_pred", taken)
        nsc = _uniq_name("_src_n", taken)
        # (source row, live target row) pairs — shared by the
        # when_matched predicate and the partial-column patch
        cond = None
        for c in idc:
            eq = F.col(f"source.{c}") == F.col(f"target.{c}")
            cond = eq if cond is None else (cond & eq)
        pairs = (
            rows.alias("source").join(target.alias("target"), on=cond, how="inner")
            if (pred is not None or dpred is not None or update_set)
            else None
        )
        if update_set:
            bad = sorted(set(update_set) & set(idc))
            if bad:
                raise ValueError(
                    f"merge_rows: update_set cannot rewrite key column(s) {bad}"
                )
            unknown = sorted(
                c for c in update_set if c not in types or c == UPSERT_SEQ_COL
            )
            if unknown:
                raise ValueError(
                    f"merge_rows: update_set targets unknown column(s) {unknown}"
                )
            tcols = [c for c in target.columns if c != UPSERT_SEQ_COL]
            patched = pairs.select(
                *[
                    (
                        (
                            F.expr(e) if isinstance(e, str) else e
                        ).cast(types[c]).alias(c)
                        if (e := update_set.get(c)) is not None
                        else F.col(f"target.{c}").alias(c)
                    )
                    for c in tcols
                ]
            )
            upd_src = patched  # replacement rows for matched keys
        else:
            # whole-key replace by the batch's rows (scratch dropped)
            upd_src = rows.drop(*scratch_decl) if scratch_decl else rows
        src_fp = upd_src.groupBy(*idc).agg(
            F.sort_array(F.collect_list(_fp(upd_src))).alias(sfp)
        )
        tgt_m = target.join(rows.select(*idc).distinct(), on=idc, how="left_semi")
        tgt_fp = tgt_m.groupBy(*idc).agg(
            F.sort_array(F.collect_list(_fp(target))).alias(tfp)
        )
        decision = (
            rows.groupBy(*idc)
            .agg(F.count(F.lit(1)).alias(nsc))
            .join(src_fp, on=idc, how="left")
            .join(tgt_fp, on=idc, how="left")
        )
        matched = F.col(tfp).isNotNull()
        dfl = _uniq_name("_delp", taken)
        dele = F.lit(False)
        if dpred is not None:
            del_keys = (
                pairs.filter(dpred)
                .select(*[F.col(f"source.{c}").alias(c) for c in idc])
                .distinct()
                .withColumn(dfl, F.lit(True))
            )
            decision = decision.join(del_keys, on=idc, how="left")
            dele = matched & F.coalesce(F.col(dfl), F.lit(False))
        upd = matched
        if pred is not None:
            pred_keys = (
                pairs.filter(pred)
                .select(*[F.col(f"source.{c}").alias(c) for c in idc])
                .distinct()
                .withColumn(pfl, F.lit(True))
            )
            decision = decision.join(pred_keys, on=idc, how="left")
            upd = upd & F.coalesce(F.col(pfl), F.lit(False))
        if skip_unchanged:
            upd = upd & (F.col(sfp) != F.col(tfp))
        upd = upd & ~dele  # the delete clause wins a double match
        ins = (~matched) & F.lit(bool(insert_unmatched))
        if ipred is not None:
            # WHEN NOT MATCHED AND <cond> THEN INSERT: an unmatched key
            # inserts iff SOME of its source rows satisfies the clause
            ifl = _uniq_name("_insp", taken)
            ins_keys = (
                rows.alias("source")
                .filter(ipred)
                .select(*[F.col(f"source.{c}").alias(c) for c in idc])
                .distinct()
                .withColumn(ifl, F.lit(True))
            )
            decision = decision.join(ins_keys, on=idc, how="left")
            ins = ins & F.coalesce(F.col(ifl), F.lit(False))
        delc = _uniq_name("_dele", taken)
        decision = decision.select(
            *idc, F.col(nsc), upd.alias(updc), ins.alias(insc),
            dele.alias(delc),
        ).persist()
        # --- WHEN NOT MATCHED BY SOURCE: target keys absent from the
        # batch. Key-based mutation cannot address NULL-keyed rows (the
        # liveness fold joins null-unsafe, same as upsert/delete), so
        # they are excluded, never silently mis-deleted.
        nmu = _uniq_name("_nmu", taken)
        nmd = _uniq_name("_nmd", taken)
        nmbs_dec = None
        nmbs_upd_src = None
        if nmbs_active:
            if nmbs_set:
                bad = sorted(set(nmbs_set) & set(idc))
                if bad:
                    raise ValueError(
                        "merge_rows: when_not_matched_by_source_set cannot "
                        f"rewrite key column(s) {bad}"
                    )
                unknown = sorted(
                    c for c in nmbs_set
                    if c not in recorded or c == UPSERT_SEQ_COL
                )
                if unknown:
                    raise ValueError(
                        "merge_rows: when_not_matched_by_source_set targets "
                        f"column(s) {unknown} not in the target's recorded "
                        "schema"
                    )
            keyed = None
            for c in idc:
                nn = F.col(c).isNotNull()
                keyed = nn if keyed is None else (keyed & nn)
            tgt_un = (
                target.filter(keyed)
                .join(rows.select(*idc).distinct(), on=idc, how="left_anti")
                .alias("target")
            )
            del_keys_n = None
            if nmbs_del is not None:
                un_del = (
                    tgt_un if nmbs_del is True else tgt_un.filter(nmbs_del)
                )
                del_keys_n = un_del.select(*idc).distinct()
            frames_n = []
            if del_keys_n is not None:
                frames_n.append(
                    del_keys_n.withColumn(nmd, F.lit(True)).withColumn(
                        nmu, F.lit(False)
                    )
                )
            if nmbs_set:
                upd_base = tgt_un
                if del_keys_n is not None:  # the delete clause wins
                    upd_base = upd_base.join(
                        del_keys_n, on=idc, how="left_anti"
                    ).alias("target")
                rowp = nmbs_cond if nmbs_cond is not None else F.lit(True)
                tcols_n = [c for c in target.columns if c != UPSERT_SEQ_COL]

                def _nm_expr(c: str):
                    e = nmbs_set.get(c)
                    if e is None:
                        return F.col(f"target.{c}")
                    ee = F.expr(e) if isinstance(e, str) else e
                    # row-wise: rows not satisfying the condition keep
                    # their target values but still ride the rewrite
                    return F.when(rowp, ee.cast(types[c])).otherwise(
                        F.col(f"target.{c}")
                    )

                patched_n = upd_base.select(
                    *[_nm_expr(c).alias(c) for c in tcols_n]
                )
                aff = upd_base.filter(rowp).select(*idc).distinct()
                if skip_unchanged:
                    live_n = upd_base.select(
                        *[F.col(f"target.{c}").alias(c) for c in tcols_n]
                    )
                    p_fp = patched_n.groupBy(*idc).agg(
                        F.sort_array(F.collect_list(_fp(patched_n))).alias(sfp)
                    )
                    l_fp = live_n.groupBy(*idc).agg(
                        F.sort_array(F.collect_list(_fp(live_n))).alias(tfp)
                    )
                    changed_n = (
                        p_fp.join(l_fp, on=idc, how="inner")
                        .filter(F.col(sfp) != F.col(tfp))
                        .select(*idc)
                    )
                    aff = aff.join(changed_n, on=idc, how="left_semi")
                nmbs_upd_src = patched_n.join(aff, on=idc, how="left_semi")
                frames_n.append(
                    aff.withColumn(nmd, F.lit(False)).withColumn(
                        nmu, F.lit(True)
                    )
                )
            if frames_n:
                nmbs_dec = frames_n[0]
                for fr in frames_n[1:]:
                    nmbs_dec = nmbs_dec.unionByName(fr)
                nmbs_dec = nmbs_dec.persist()
        try:
            tallies = decision.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col(updc).cast("int")).alias("u"),
                F.sum(F.col(insc).cast("int")).alias("i"),
                F.sum(F.col(delc).cast("int")).alias("d"),
                F.max(F.col(nsc)).alias("m"),
            ).collect()[0]
            n_keys, n_upd, n_ins, n_del = (
                int(tallies["n"]),
                int(tallies["u"] or 0),
                int(tallies["i"] or 0),
                int(tallies["d"] or 0),
            )
            if update_set and int(tallies["m"] or 0) > 1:
                raise ValueError(
                    "merge_rows: update_set requires the batch unique per "
                    "key (a multi-row patch is ambiguous)"
                )
            n_nmu = n_nmd = 0
            if nmbs_dec is not None:
                tn = nmbs_dec.agg(
                    F.sum(F.col(nmu).cast("int")).alias("u"),
                    F.sum(F.col(nmd).cast("int")).alias("d"),
                ).collect()[0]
                n_nmu, n_nmd = int(tn["u"] or 0), int(tn["d"] or 0)
            rep = {
                "updated": n_upd,
                "inserted": n_ins,
                "deleted": n_del,
                "skipped": n_keys - n_upd - n_ins - n_del,
                "attempts": attempt + 1,
                "probe": probe_rep,
            }
            if nmbs_active:
                rep["nmbs_updated"] = n_nmu
                rep["nmbs_deleted"] = n_nmd
            if n_upd == 0 and n_ins == 0 and n_del == 0 and (
                n_nmu == 0 and n_nmd == 0
            ):
                # a fully-no-op batch commits NOTHING: no revision, no
                # tombstone row, no version flip (the pinned contract)
                if extra_meta:
                    # ... unless the caller needs its meta recorded
                    # atomically anyway (a streaming committer's batch
                    # id): meta-only flip, zero segments, full
                    # zones/blooms/schemas carry
                    mkw: dict = {"meta": {**meta, **extra_meta}}
                    if state[1]:
                        mkw["zones"] = state[1]
                    if state[2]:
                        mkw["blooms"] = state[2]
                    if schemas:
                        mkw["schemas"] = schemas
                    if state[6]:
                        mkw["counts"] = state[6]
                    try:
                        # the meta-only flip claims base+1: report THAT
                        # version (a streaming committer reconciling where
                        # its batch id landed must not read one behind —
                        # r14 ADVICE #4)
                        ver = commit_segment_manifest(
                            spark, root, pins, expected_base=base, **mkw
                        )
                    except ConcurrentCommitError as e:
                        last_err = e
                        continue
                    return {
                        **rep, "applied": False, "meta_only": True,
                        "pins": pins, "version": ver,
                    }
                return {**rep, "applied": False, "pins": pins, "version": base}
            seq = base + 1
            parts = []
            if n_upd:
                parts.append(
                    upd_src.join(
                        decision.filter(F.col(updc)).select(*idc),
                        on=idc,
                        how="left_semi",
                    )
                )
            if n_ins:
                parts.append(
                    ins_src.join(
                        decision.filter(F.col(insc)).select(*idc),
                        on=idc,
                        how="left_semi",
                    )
                )
            if n_nmu:
                # nmbs_upd_src is already restricted to its changed keys
                parts.append(nmbs_upd_src)
            appends: dict[str, DataFrame] = {}
            if parts:
                write_rows = parts[0]
                for p in parts[1:]:
                    write_rows = write_rows.unionByName(
                        p, allowMissingColumns=True
                    )
                appends[component] = write_rows.withColumn(
                    UPSERT_SEQ_COL, F.lit(seq).cast("bigint")
                )
            ckey = component_tombstone_rows_key(component)
            new_meta = {**meta, **(extra_meta or {})}
            if n_upd or n_del or n_nmu or n_nmd:
                tomb = decision.filter(
                    F.col(updc) | F.col(delc)
                ).select(*idc)
                if n_nmu or n_nmd:
                    tomb = tomb.unionByName(nmbs_dec.select(*idc))
                if segment_partitions:
                    tomb = tomb.coalesce(segment_partitions)
                appends[_tombstone_component(component)] = tomb.withColumn(
                    DEAD_BELOW_COL, F.lit(seq).cast("bigint")
                )
                new_meta[ckey] = (
                    int(meta.get(ckey, 0)) + n_upd + n_del + n_nmu + n_nmd
                )
            kw: dict = {"meta": new_meta}
            if zone_cols:
                kw["zone_cols"] = {component: list(zone_cols)}
            if bloom_cols:
                kw["bloom_cols"] = {component: list(bloom_cols)}
            try:
                new_pins = append_segments(
                    spark, root, appends, expected_base=base, **kw
                )
                return {
                    **rep, "applied": True, "pins": new_pins, "version": seq,
                }
            except ConcurrentCommitError as e:
                last_err = e  # rival commit: replan against fresh state
        finally:
            decision.unpersist()
            if nmbs_dec is not None:
                nmbs_dec.unpersist()
    raise last_err


def read_segmented_merged(
    spark, root: str, component: str, id_col
) -> DataFrame:
    """The component's MERGED view — every id's surviving revisions
    under the sequence-watermark liveness rule: a row is live iff its
    ``_useq`` (0 for plain unstamped appends) is >= the highest
    ``dead_below`` committed for its id. :func:`upsert_rows` revisions
    replace, :func:`delete_rows` kills, a post-delete upsert
    resurrects — the merged table a mirror or dimension consumer
    expects. With no tombstone component pinned this is exactly the
    plain pinned read. The watermark fold is O(tombstones) — one
    groupBy over the (tiny) tombstone component; Spark/AQE broadcasts
    it under the auto threshold, and past it the join degrades to a
    shuffle rather than an unbounded broadcast. The ``_useq`` column
    rides along (callers that don't want it drop it); legacy
    tombstones with no ``dead_below`` kill every revision (their
    original bare-id intent)."""
    state = _manifest_state(spark, root)
    return _merged_from_state(
        spark, root, component, id_col, state[0], state[4]
    )


def _merged_from_state(
    spark,
    root: str,
    component: str,
    id_col,
    pins: dict[str, list[int]],
    schemas: dict[str, dict],
) -> DataFrame:
    """Pinned data + tombstone reads → merged view, shared by the head
    and time-travel merged readers so a manifest-format change cannot
    make history diverge from head reads."""
    data = read_segments(
        spark,
        f"{root.rstrip('/')}/{component}",
        pins[component],
        schema=_schema_from_json(schemas.get(component)),
    )
    tomb = _tombstone_component(component)
    if tomb not in pins:
        return data
    tdf = read_segments(
        spark,
        f"{root.rstrip('/')}/{tomb}",
        pins[tomb],
        schema=_schema_from_json(schemas.get(tomb)),
    )
    return _merged_view(data, tdf, id_col)


def _merged_view(data: DataFrame, tdf: DataFrame, id_col) -> DataFrame:
    """The sequence-watermark liveness join shared by the head and
    time-travel merged reads: keep a data row iff its ``_useq`` (0
    when unstamped) >= its id's highest ``dead_below`` (kill-all for
    stampless legacy tombstones). ``id_col`` may be a sequence of
    names — the fold groups and joins on the composite key tuple."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    idc = _id_cols(id_col)
    dead_all = F.lit(_DEAD_ALL_SEQ).cast("bigint")
    db = (
        F.coalesce(F.col(DEAD_BELOW_COL), dead_all)
        if DEAD_BELOW_COL in tdf.columns
        else dead_all
    )
    # collision-proof internal alias: a user column named "_dead"
    # must not make the merged view unreadable (ambiguous reference)
    mark = "_dead"
    while mark in data.columns:
        mark += "_"
    marks = tdf.groupBy(*idc).agg(F.max(db).alias(mark))
    useq = (
        F.coalesce(F.col(UPSERT_SEQ_COL), F.lit(0))
        if UPSERT_SEQ_COL in data.columns
        else F.lit(0)
    )
    return (
        data.join(marks, on=idc, how="left")
        .filter(F.col(mark).isNull() | (useq >= F.col(mark)))
        .drop(mark)
    )


def read_segmented_merged_at(
    spark, root: str, version: int, component: str, id_col
) -> DataFrame:
    """TIME TRAVEL on the merged view: the component's surviving
    revisions as of RETAINED manifest ``version`` — the pins, schemas,
    AND tombstone watermarks are all read from that manifest, so the
    result is byte-stable history: a row deleted at v+1 still serves
    here, an upsert committed later is invisible, and (because
    ``dead_below``/``_useq`` stamps are immutable data) the liveness
    rule evaluates exactly as it did at the historical head. This is
    the audit axis a row-level-merge table needs: "what did this
    dimension look like before Tuesday's correction?" as one pinned
    read. Read-committed: a version past the committed head (a
    crashed writer's orphan blob awaiting the sweep) is rejected, not
    served as history."""
    head = _committed_version(spark, f"{root.rstrip('/')}/manifest")
    if head is None or version > head:
        raise FileNotFoundError(
            f"read_segmented_merged_at: v{version} is not a committed "
            f"manifest under {root} (head: {head})"
        )
    parsed = json.loads(
        read_snapshot_blob(
            spark, f"{root.rstrip('/')}/manifest", version=version
        )
    )
    pins = {
        name: sorted({int(s) for s in segs})
        for name, segs in parsed.items()
        if not name.startswith("_")
    }
    if component not in pins:
        raise KeyError(
            f"read_segmented_merged_at: no component {component!r} at "
            f"manifest v{version}"
        )
    return _merged_from_state(
        spark, root, component, id_col, pins, parsed.get("_schemas", {})
    )


def read_segmented_live(
    spark, root: str, component: str, id_col
) -> DataFrame:
    """The component minus its tombstoned ids: the manifest-pinned
    scan anti-joined against the (tiny) tombstone component. With no
    tombstone component pinned, this is exactly
    read_segmented_components. Schema-reconciled like every manifest
    read (evolved columns null-backfill across segment vintages).
    ``id_col`` may be a sequence of names (composite keys)."""
    idc = _id_cols(id_col)
    state = _manifest_state(spark, root)
    pins, schemas = state[0], state[4]
    data = read_segments(
        spark,
        f"{root}/{component}",
        pins[component],
        schema=_schema_from_json(schemas.get(component)),
    )
    tomb = _tombstone_component(component)
    if tomb not in pins:
        return data
    dead = read_segments(spark, f"{root}/{tomb}", pins[tomb]).select(*idc)
    return data.join(dead, on=idc, how="left_anti")


def apply_tombstones(
    spark, root: str, component: str, id_col, merged: bool = False
) -> dict[str, list[int]]:
    """PHYSICAL delete: rewrite the component as one live-rows-only
    segment and reset its tombstone component to one empty segment,
    both pinned by a single manifest commit (readers see pre- or
    post-apply state, never half). The rewrite is the same O(dataset)
    cost class as compaction — run on the same maintenance cadence;
    the deleted bytes leave disk once the old segments age out of
    retention (expire_segments).

    ``merged=True`` applies the sequence-watermark liveness rule
    (:func:`read_segmented_merged`) instead of the bare-id anti-join —
    REQUIRED for components mutated through :func:`upsert_rows`, where
    the bare-id rule would physically drop live resurrected/upserted
    revisions."""
    return _apply_tombstones(spark, root, component, id_col, merged)[0]


def _apply_tombstones(
    spark, root: str, component: str, id_col, merged: bool = False
) -> tuple[dict[str, list[int]], bool]:
    """(pins, applied) — the race-free form maintain's report uses (a
    rival ingest between two manifest reads must not make a no-op look
    like an apply)."""
    pins, zones, blooms, prior_meta, schemas, base, counts = _manifest_state(spark, root)
    tomb = _tombstone_component(component)
    if tomb not in pins:
        return pins, False
    if (
        read_segments(spark, f"{root}/{tomb}", pins[tomb]).limit(1).count()
        == 0
    ):
        # a prior apply reset the component to one EMPTY segment: a
        # cadence re-running this verb must no-op (one tiny probe job),
        # not re-fold the whole dataset every pass
        return pins, False
    live = (
        read_segmented_merged(spark, root, component, id_col)
        if merged
        else read_segmented_live(spark, root, component, id_col)
    )
    new_pins = dict(pins)
    seg = write_segment(spark, live, f"{root}/{component}")
    new_pins[component] = [seg]
    empty = read_segments(
        spark, f"{root}/{tomb}", pins[tomb]
    ).limit(0)
    new_pins[tomb] = [write_segment(spark, empty.coalesce(1), f"{root}/{tomb}")]
    new_zones = _carry_zones(zones, new_pins)
    zone_columns = sorted(
        {c for stats in zones.get(component, {}).values() for c in stats}
    )
    if zone_columns:
        new_zones.setdefault(component, {})[seg] = _segment_zone_stats(
            spark, f"{root}/{component}", seg, zone_columns
        )
    new_blooms = _carry_blooms(blooms, new_pins)
    bloom_columns = sorted(
        {c for cols in blooms.get(component, {}).values() for c in cols}
    )
    rebuilt = [
        c
        for c in bloom_columns
        if _write_segment_bloom(spark, f"{root}/{component}", seg, c)
    ]
    if rebuilt:
        new_blooms.setdefault(component, {})[seg] = rebuilt
    kw = {}
    if new_zones:
        kw["zones"] = new_zones
    if new_blooms:
        kw["blooms"] = new_blooms
    # a tombstone APPLY is a rewrite: its outputs carry only
    # pre-existing rows, so the change feed must not re-emit them
    # (the deletes themselves were announced by the tombstone
    # component's own append feed). The apply also RESETS the
    # component's tombstone pressure counter — the merged-read fold is
    # back at its floor, so maintain's auto policy re-arms from zero.
    marked = _mark_rewrites(
        {**prior_meta, component_tombstone_rows_key(component): 0},
        new_pins,
        {component: [seg], tomb: new_pins[tomb]},
    )
    if marked:
        kw["meta"] = marked
    if schemas:
        kw["schemas"] = schemas
    kw["counts"] = _counts_for_commit(spark, root, counts, new_pins)
    commit_segment_manifest(spark, root, new_pins, expected_base=base, **kw)
    return new_pins, True


def apply_segment_tombstones(
    spark,
    root: str,
    tombstones: str,
    id_col: str,
    victims: Sequence[str] = (),
    reducers: dict | None = None,
    meta_fn=None,
    transforms: dict | None = None,
) -> dict[str, list[int]]:
    """PHYSICAL apply of a shared tombstone component across a
    multi-component index (the GDPR completion step the per-component
    :func:`apply_tombstones` can't express): rewrite every ``victims``
    component as one live-rows-only segment (anti-join on ``id_col``
    against the tombstone set), rewrite each ``reducers`` component
    through its reducer (e.g. an additive-stats sum that folds the
    delete-time negative rows in), and reset the tombstone component
    to one empty segment — ALL pinned by a single expected_base
    manifest commit, so readers see pre- or post-apply state, never
    half, and a racing ingest conflicts loudly instead of being
    dropped. Zonemap/bloom coverage is recomputed for every rewritten
    segment from the manifest's own column advertisements; manifest
    meta carries through unchanged unless ``meta_fn(meta) -> dict``
    rewrites it. ``transforms`` generalizes the anti-join for indexes
    whose deadness rule is richer than id membership (e.g. sequence-
    watermarked revisions): ``transforms[name](component_df,
    tombstones_df) -> live_df`` rewrites that component instead of the
    victims anti-join. No-op (current pins returned) when the
    tombstone component was never pinned. O(index) rewrite — same
    maintenance cost class as compaction, amortized the same way."""
    reducers = reducers or {}
    transforms = transforms or {}
    pins, zones, blooms, prior_meta, schemas, base, counts = _manifest_state(spark, root)
    if tombstones not in pins:
        return pins
    tomb_df = read_segments(spark, f"{root}/{tombstones}", pins[tombstones])
    dead = tomb_df.select(id_col).distinct()
    new_pins = dict(pins)
    rewritten: list[tuple[str, int]] = []
    for name in victims:
        live = read_segments(
            spark,
            f"{root}/{name}",
            pins[name],
            schema=_schema_from_json(schemas.get(name)),
        ).join(dead, on=id_col, how="left_anti")
        seg = write_segment(spark, live, f"{root}/{name}")
        new_pins[name] = [seg]
        rewritten.append((name, seg))
    for name, fn in transforms.items():
        live = fn(
            read_segments(
                spark,
                f"{root}/{name}",
                pins[name],
                schema=_schema_from_json(schemas.get(name)),
            ),
            tomb_df,
        )
        seg = write_segment(spark, live, f"{root}/{name}")
        new_pins[name] = [seg]
        rewritten.append((name, seg))
    for name, reduce in reducers.items():
        df = reduce(
            read_segments(
                spark,
                f"{root}/{name}",
                pins[name],
                schema=_schema_from_json(schemas.get(name)),
            )
        )
        seg = write_segment(spark, df, f"{root}/{name}")
        new_pins[name] = [seg]
        rewritten.append((name, seg))
    empty = (
        read_segments(spark, f"{root}/{tombstones}", pins[tombstones])
        .limit(0)
        .coalesce(1)
    )
    new_pins[tombstones] = [write_segment(spark, empty, f"{root}/{tombstones}")]
    new_zones = _carry_zones(zones, new_pins)
    new_blooms = _carry_blooms(blooms, new_pins)
    for name, seg in rewritten:
        zone_columns = sorted(
            {c for stats in zones.get(name, {}).values() for c in stats}
        )
        if zone_columns:
            new_zones.setdefault(name, {})[seg] = _segment_zone_stats(
                spark, f"{root}/{name}", seg, zone_columns
            )
        bloom_columns = sorted(
            {c for cols in blooms.get(name, {}).values() for c in cols}
        )
        built = [
            c
            for c in bloom_columns
            if _write_segment_bloom(spark, f"{root}/{name}", seg, c)
        ]
        if built:
            new_blooms.setdefault(name, {})[seg] = built
    kw: dict = {}
    if new_zones:
        kw["zones"] = new_zones
    if new_blooms:
        kw["blooms"] = new_blooms
    if schemas:
        kw["schemas"] = schemas
    meta = dict(prior_meta)
    if meta_fn is not None:
        meta = meta_fn(meta)
    additions: dict[str, list[int]] = {tombstones: list(new_pins[tombstones])}
    for name, seg in rewritten:
        additions.setdefault(name, []).append(seg)
    meta = _mark_rewrites(meta, new_pins, additions)  # see apply_tombstones
    if meta:
        kw["meta"] = meta
    kw["counts"] = _counts_for_commit(spark, root, counts, new_pins)
    commit_segment_manifest(spark, root, new_pins, expected_base=base, **kw)
    return new_pins



def _schema_from_json(schema_json: dict | None):
    """StructType of a manifest-carried schema (None passes through —
    readers fall back to the footer-derived schema). DROPPED columns
    (fields kept in the stored document for name/id reservation, see
    :func:`drop_columns`) are excluded — they no longer exist
    logically; field metadata (``field_id``, ``prior_names``) rides
    through so :func:`read_segments` can reconcile renamed vintages."""
    if not schema_json:
        return None
    from pyspark.sql.types import StructType  # noqa: PLC0415

    live = {
        "type": "struct",
        "fields": [
            f
            for f in schema_json["fields"]
            if not (f.get("metadata") or {}).get("dropped")
        ],
    }
    return StructType.fromJson(live)


def segment_schemas(spark, root: str) -> dict[str, dict]:
    """The committed manifest's per-component current schemas
    (component -> StructType jsonValue); empty when no writer ever
    recorded them. A filesystem read, no Spark job."""
    return _manifest_state(spark, root)[4]


def rename_columns(
    spark, root: str, component: str, mapping: dict[str, str],
    max_attempts: int = 3,
) -> int:
    """ALTER TABLE … RENAME COLUMN as a METADATA-ONLY commit — no
    segment is rewritten, which is the point: at 100 TB a rename must
    not cost an O(table) rewrite. The recorded field keeps its stable
    ``field_id`` and gains the old name in ``prior_names``; pinned
    reads reconcile every pre-rename segment through the coalesce shim
    in :func:`read_segments`, and a LAGGING writer still appending the
    old name keeps committing (evolution maps retired names back to
    the field). Zonemap keys follow the rename in the same flip; bloom
    sidecars are COPIED to the new name BEFORE the flip and the old
    files LEFT IN PLACE for reader grace (a reader holding the
    pre-rename manifest still probes the old advertisement), so an
    advertised sidecar resolves whatever commits or crashes —
    expire_segments sweeps sidecars no retained manifest advertises.
    The new name must be fresh — not a live,
    pre-rename, or dropped name of the component (old segments still
    hold physical data under those; reuse would resurrect it).
    Retries from fresh state on a commit race. Returns the committed
    manifest version."""
    if not mapping:
        raise ValueError("rename_columns: empty mapping")
    last_err: BaseException | None = None
    for _attempt in range(max_attempts):
        pins, zones, blooms, meta, schemas, base, counts = _manifest_state(spark, root)
        if component not in pins:
            raise KeyError(f"rename_columns: no pinned component {component!r}")
        sj = schemas.get(component)
        if not sj:
            raise SchemaEvolutionError(
                f"rename_columns: component {component!r} has no recorded "
                "schema — only schema-tracked components support renames"
            )
        fields = [dict(f) for f in _with_field_ids(sj)["fields"]]
        for old, new in mapping.items():
            reserved: set[str] = set()
            live: set[str] = set()
            for f in fields:
                md = _field_meta(f)
                reserved.add(f["name"])
                reserved.update(md.get("prior_names", []))
                if not md.get("dropped"):
                    live.add(f["name"])
            if old not in live:
                raise SchemaEvolutionError(
                    f"rename_columns: {old!r} is not a live column of "
                    f"{component!r}"
                )
            if new in reserved:
                raise SchemaEvolutionError(
                    f"rename_columns: {new!r} is reserved in {component!r} "
                    "(a live, pre-rename, or dropped name — old segments "
                    "may still carry physical data under it)"
                )
            for i, f in enumerate(fields):
                if f["name"] == old and not _field_meta(f).get("dropped"):
                    md = dict(_field_meta(f))
                    md["prior_names"] = [*md.get("prior_names", []), old]
                    fields[i] = {**f, "name": new, "metadata": md}
                    break
        new_schemas = {
            **schemas,
            component: {"type": "struct", "fields": fields},
        }
        new_zones = {
            c: {s: dict(st) for s, st in zm.items()} for c, zm in zones.items()
        }
        for st in new_zones.get(component, {}).values():
            for old, new in mapping.items():
                if old in st:
                    st[new] = st.pop(old)
        new_blooms = {
            c: {s: list(cols) for s, cols in bm.items()}
            for c, bm in blooms.items()
        }
        comp_root = f"{root.rstrip('/')}/{component}"
        jvm, fs = _fs(spark, comp_root)
        for s, cols in new_blooms.get(component, {}).items():
            for old, new in mapping.items():
                if old in cols:
                    src = _bloom_path(comp_root, s, old)
                    payload = _read_small_file(
                        jvm, fs, jvm.org.apache.hadoop.fs.Path(src)
                    )
                    out = fs.create(
                        jvm.org.apache.hadoop.fs.Path(
                            _bloom_path(comp_root, s, new)
                        ),
                        True,
                    )
                    out.write(payload.encode("utf-8"))
                    out.close()
                    cols[cols.index(old)] = new
        kw: dict = {"schemas": new_schemas}
        if new_zones:
            kw["zones"] = new_zones
        if new_blooms:
            kw["blooms"] = new_blooms
        if meta:
            kw["meta"] = meta
        kw["counts"] = _counts_for_commit(spark, root, counts, pins)
        try:
            return commit_segment_manifest(
                spark, root, pins, expected_base=base, **kw
            )
        except ConcurrentCommitError as e:
            last_err = e  # copied sidecars are junk; retry re-copies
            continue
        # old-name sidecars stay on disk past the flip (reader grace): a
        # concurrent reader still holding the pre-rename manifest probes
        # the OLD advertisement and must resolve it. expire_segments
        # age-gates sidecars no retained manifest advertises.
    raise last_err


def drop_columns(
    spark, root: str, component: str, cols: Sequence[str],
    max_attempts: int = 3,
) -> int:
    """ALTER TABLE … DROP COLUMN as a METADATA-ONLY commit: the field
    stays in the stored schema document flagged ``dropped`` (its name
    and ``field_id`` remain RESERVED — old segments still carry the
    physical data, and a later add-column reusing the name would
    silently resurrect it), readers stop serving it immediately
    (:func:`_schema_from_json` filters dropped fields), its zonemap
    stats and bloom advertisements drop in the same flip, and the
    orphaned sidecar files stay for reader grace until expire_segments
    sweeps them (no retained manifest advertises them). No segment
    is rewritten; the physical bytes age out with normal compaction.
    Retries from fresh state on a commit race. Returns the committed
    manifest version."""
    cols = list(cols)
    if not cols:
        raise ValueError("drop_columns: empty column list")
    last_err: BaseException | None = None
    for _attempt in range(max_attempts):
        pins, zones, blooms, meta, schemas, base, counts = _manifest_state(spark, root)
        if component not in pins:
            raise KeyError(f"drop_columns: no pinned component {component!r}")
        sj = schemas.get(component)
        if not sj:
            raise SchemaEvolutionError(
                f"drop_columns: component {component!r} has no recorded "
                "schema — only schema-tracked components support drops"
            )
        fields = [dict(f) for f in _with_field_ids(sj)["fields"]]
        live = {
            f["name"] for f in fields if not _field_meta(f).get("dropped")
        }
        missing = [c for c in cols if c not in live]
        if missing:
            raise SchemaEvolutionError(
                f"drop_columns: {missing!r} are not live columns of "
                f"{component!r}"
            )
        if not live - set(cols):
            raise SchemaEvolutionError(
                f"drop_columns: cannot drop every column of {component!r}"
            )
        for i, f in enumerate(fields):
            if f["name"] in cols and not _field_meta(f).get("dropped"):
                fields[i] = {
                    **f,
                    "metadata": {**_field_meta(f), "dropped": True},
                }
        new_schemas = {
            **schemas,
            component: {"type": "struct", "fields": fields},
        }
        new_zones = {
            c: {s: dict(st) for s, st in zm.items()} for c, zm in zones.items()
        }
        for st in new_zones.get(component, {}).values():
            for c in cols:
                st.pop(c, None)
        new_blooms = {
            c: {s: list(bs) for s, bs in bm.items()} for c, bm in blooms.items()
        }
        for s, bs in list(new_blooms.get(component, {}).items()):
            for c in cols:
                if c in bs:
                    bs.remove(c)
            if not bs:
                del new_blooms[component][s]
        kw: dict = {"schemas": new_schemas}
        if new_zones:
            kw["zones"] = new_zones
        if new_blooms:
            kw["blooms"] = new_blooms
        if meta:
            kw["meta"] = meta
        kw["counts"] = _counts_for_commit(spark, root, counts, pins)
        try:
            return commit_segment_manifest(
                spark, root, pins, expected_base=base, **kw
            )
        except ConcurrentCommitError as e:
            last_err = e
            continue
        # the dropped column's sidecars stay on disk past the flip
        # (reader grace, same as rename_columns); expire_segments
        # age-gates sidecars no retained manifest advertises
    raise last_err


def segment_zones(
    spark, root: str
) -> dict[str, dict[int, dict[str, list]]]:
    """The committed manifest's zonemap stats (component → segment →
    column → [min, max, n_nulls]); empty when commits never collected
    them. A filesystem read, no Spark job."""
    return _manifest_state(spark, root)[1]


def segment_blooms(spark, root: str) -> dict[str, dict[int, list[str]]]:
    """The committed manifest's bloom-sidecar coverage map (component
    → segment → columns with a sidecar). A filesystem read, no job."""
    return _manifest_state(spark, root)[2]


def segment_counts(spark, root: str) -> dict[str, dict[int, int]]:
    """The committed manifest's per-segment physical row counts
    (component → segment → rows, footer-exact). Empty for manifests
    committed before the counts plane existed — any later commit
    backfills them (:func:`_counts_for_commit`). A filesystem read,
    no Spark job."""
    return _manifest_state(spark, root)[6]


def count_segmented(spark, root: str, component: str) -> int:
    """Manifest-served ``COUNT(*)``: the component's PHYSICAL pinned
    row count — exactly what ``read_segments(root/component, pins)``
    would count, with zero Spark jobs. Counts come from the manifest's
    counts plane; any pinned segment missing one (a pre-counts
    manifest that hasn't recommitted yet) is footer-read on the spot,
    still driver-side. NOTE: physical rows include superseded upsert
    revisions and count tombstone components separately — the LIVE
    row count of a mutated component is ``read_segmented_merged(...)
    .count()``; for append-only components the two are equal. At
    100 TB this is the operator's first question (``table_summary``,
    pressure ratios, rows-aware tiering) answered from the metadata
    plane."""
    state = _manifest_state(spark, root)
    pins, counts = state[0], state[6]
    if component not in pins:
        raise KeyError(f"count_segmented: no component {component!r} in {root}")
    known = counts.get(component, {})
    comp_root = f"{root.rstrip('/')}/{component}"
    return sum(
        int(known[s])
        if s in known
        else _segment_row_count(spark, comp_root, s)
        for s in pins[component]
    )


def describe_segmented(spark, root: str) -> dict:
    """The zero-job DESCRIBE surface: one manifest read + driver-side
    listings answer the operator's first questions about a segmented
    root — per component: pinned segment count, physical rows (counts
    plane, footer-backfilled), on-disk bytes, column names (recorded
    schema; None when the component's writers never evolve), zonemap /
    bloom coverage (segments covered), and the tombstone-pressure
    counter. Returns ``{"version": manifest version, "components":
    {name: {...}}}``. No Spark jobs — the 100 TB metadata plane must
    not queue behind the data plane."""
    state = _manifest_state(spark, root)
    pins, zones, blooms, meta, schemas, version, counts = state
    out: dict = {"version": version, "components": {}}
    for name, segs in sorted(pins.items()):
        comp_root = f"{root.rstrip('/')}/{name}"
        known = counts.get(name, {})
        rows_ = sum(
            int(known[s])
            if s in known
            else _segment_row_count(spark, comp_root, s)
            for s in segs
        )
        sj = schemas.get(name)
        out["components"][name] = {
            "segments": len(segs),
            "rows": rows_,
            "bytes": sum(segment_sizes(spark, root, name, segs).values()),
            "columns": (
                [f["name"] for f in sj.get("fields", [])] if sj else None
            ),
            "zone_covered_segments": sum(
                1 for s in segs if zones.get(name, {}).get(s)
            ),
            "bloom_covered_segments": sum(
                1 for s in segs if blooms.get(name, {}).get(s)
            ),
            "tombstone_pressure_rows": int(
                meta.get(component_tombstone_rows_key(name), 0)
            ),
        }
    return out


def tombstone_pressure(spark, root: str, max_rows: int) -> bool:
    """True when the index's pinned tombstone row count (the
    :data:`TOMBSTONE_ROWS_KEY` meta counter every delete/upsert commit
    maintains) has reached ``max_rows`` — the compaction trigger that
    bounds the liveness-watermark fold under churn-heavy streams whose
    SEGMENT count alone would never fire the threshold policy (many
    upserts, few segments). A driver-side manifest read, no job."""
    return int(segment_meta(spark, root).get(TOMBSTONE_ROWS_KEY, 0)) >= int(
        max_rows
    )


def segment_meta(spark, root: str) -> dict:
    """The committed manifest's application metadata (``_meta`` blob
    key) — e.g. a streaming sink's last committed batch id. Empty when
    never set. A filesystem read, no Spark job."""
    return _manifest_state(spark, root)[3]


def segment_meta_versioned(spark, root: str) -> tuple[dict, int]:
    """(meta, manifest version) from ONE atomic manifest read — what a
    read-modify-write committer of additive meta state needs: derive
    the new value from ``meta``, commit with
    ``append_segments(..., expected_base=version)``, and a rival
    commit in between raises instead of silently absorbing a lost
    update."""
    state = _manifest_state(spark, root)
    return state[3], state[5]


def segment_state(spark, root: str) -> tuple[dict[str, list[int]], dict, int]:
    """(pins, meta, manifest version) from ONE atomic manifest read —
    for committers whose payload derives from BOTH the pin map and the
    meta counters (e.g. an index delete that must see the same
    tombstone state its counter adjustments were computed from)."""
    state = _manifest_state(spark, root)
    return state[0], state[3], state[5]


def zone_pruned_pins(
    spark, root: str, component: str, col: str, lo=None, hi=None
) -> tuple[list[int], list[int]]:
    """Segment-level data skipping: ``(kept, pinned)`` segment lists of
    a component for the range predicate ``lo <= col <= hi`` (either
    bound may be None for a half-open range). Purely driver-side
    manifest metadata — planning a pruned read schedules NO job, the
    exact shape hypertable chunk exclusion / Iceberg min-max file
    skipping take at 100 TB where opening every file to discover it is
    irrelevant is the bottleneck.

    Semantics are conservative: a segment with no recorded stats for
    ``col`` is KEPT (unknown ≠ prunable — e.g. segments committed
    before zonemaps were enabled), a segment whose ``col`` is entirely
    NULL is dropped (a range predicate never matches NULL), and bounds
    are normalized exactly like the stored stats (:func:`_zone_value`)
    so timestamps compare chronologically. Row-level filtering still
    belongs to the caller's predicate — zonemaps only bound WHICH
    segments can contain matches."""
    pins, zones, _blooms, _meta, _schemas, _version, _counts = _manifest_state(spark, root)
    return zone_pruned_pins_from_state(component, col, lo, hi, pins, zones)


def zone_pruned_pins_from_state(
    component: str, col: str, lo, hi, pins: dict, zones: dict
) -> tuple[list[int], list[int]]:
    """:func:`zone_pruned_pins` over an ALREADY-READ manifest state —
    for callers that consult several pieces of one manifest (pins +
    zones + schema) and must see ONE consistent snapshot across them
    (the bloom twin is :func:`bloom_pruned_pins_from_state`)."""
    if component not in pins:
        raise KeyError(f"zone_pruned_pins: no pinned component {component!r}")
    zm = zones.get(component, {})
    lo, hi = _zone_value(lo), _zone_value(hi)
    kept = []
    for seg in pins[component]:
        stats = zm.get(seg, {}).get(col)
        if stats is None:
            kept.append(seg)
            continue
        mn, mx = stats[0], stats[1]
        # the all-NULL drop applies only under an ACTUAL predicate: a
        # boundless call (lo=hi=None) selects everything, including
        # segments whose zoned column happens to be entirely NULL
        if mn is None and (lo is not None or hi is not None):
            continue  # every value NULL: range predicate can't match
        if mn is not None and (
            (lo is not None and mx < lo) or (hi is not None and mn > hi)
        ):
            continue
        kept.append(seg)
    return kept, pins[component]


def read_segments_zone_pruned(
    spark, root: str, component: str, col: str, lo=None, hi=None
) -> DataFrame:
    """A component's manifest-pinned scan restricted to segments whose
    zonemap range intersects ``[lo, hi]``. The caller must still apply
    the row-level predicate — this only shrinks the file set (and when
    every segment prunes away, returns an empty frame with the
    component's schema). Schema-reconciled like every manifest read: a
    pruned scan over mixed segment vintages must not inherit whichever
    file's footer Spark samples first (an old footer would silently
    drop evolved columns). Schema and pruned pins resolve from ONE
    manifest snapshot — two reads could straddle an add-column commit
    and pair new pins with the pre-evolution schema."""
    pins, zones, _blooms, _meta, schemas, _version, _counts = _manifest_state(spark, root)
    kept, pinned = zone_pruned_pins_from_state(component, col, lo, hi, pins, zones)
    schema = _schema_from_json(schemas.get(component))
    comp_root = f"{root.rstrip('/')}/{component}"
    if not kept:
        from pyspark.sql import functions as F  # noqa: PLC0415

        return read_segments(spark, comp_root, pinned[:1], schema=schema).filter(
            F.lit(False)
        )
    return read_segments(spark, comp_root, kept, schema=schema)


def read_segmented_components(
    spark, root: str, components: Sequence[str] | None = None
) -> dict[str, DataFrame]:
    """Every component at the segment lists pinned by the last
    committed manifest — the only safe read path (mirrors
    read_components for the whole-dataset protocol). Components whose
    manifest carries a current schema are read WITH it: segments
    written under older schema versions serve missing columns as NULL
    (add-column evolution reconciles at read time)."""
    state = _manifest_state(spark, root)
    pins, schemas = state[0], state[4]
    names = list(components) if components is not None else list(pins)
    return {
        name: read_segments(
            spark,
            f"{root}/{name}",
            pins[name],
            schema=_schema_from_json(schemas.get(name)),
        )
        for name in names
    }


def read_segmented_where(
    spark, root: str, component: str, col: str, make
) -> DataFrame:
    """Pinned read of one component with a rename-aware PUSHED
    predicate on logical column ``col``: ``make`` builds the predicate
    from one Column (e.g. ``lambda c: c.between(5, 9)``), and it lands
    in the parquet scan's ``PushedFilters`` on EVERY rename vintage
    (:func:`vintage_predicate` — the exact per-vintage disjunction),
    so a fleet keeping the lagging-writer grace (rename normalization
    OFF) still gets row-group skipping on pre-rename segments. For
    components that never renamed this is exactly a filter on the
    pinned read."""
    from pyspark.sql import functions as F  # noqa: PLC0415

    state = _manifest_state(spark, root)
    pins, schemas = state[0], state[4]
    schema = _schema_from_json(schemas.get(component))
    if schema is None:
        df = read_segments(spark, f"{root}/{component}", pins[component])
        return df.filter(make(F.col(col)))
    return read_segments(
        spark,
        f"{root}/{component}",
        pins[component],
        schema=schema,
        where=vintage_predicate(schema, col, make),
    )


def append_segments(
    spark,
    root: str,
    appends: dict[str, DataFrame],
    replaces: dict[str, DataFrame] | None = None,
    init: bool = False,
    zone_cols: dict[str, Sequence[str]] | None = None,
    meta: dict | None = None,
    bloom_cols: dict[str, Sequence[str]] | None = None,
    expected_base: int | None = None,
) -> dict[str, list[int]]:
    """One O(batch) commit: write each ``appends`` frame as a NEW
    segment of its component (pinned in addition to the committed
    list), write each ``replaces`` frame as its component's single
    fresh segment (the re-derived-tiny-table shape — old segments
    unpin and age out), then flip the manifest. ``init=True`` performs
    the first commit (no prior manifest required; every component's
    list starts fresh). Returns the newly committed pin map.

    ``zone_cols`` (component → columns) turns on zonemap collection:
    each fresh segment of a listed component gets per-column
    [min, max, n_nulls] stats (one O(batch) agg over the just-written
    files) committed INTO the manifest blob, enabling driver-side
    segment skipping at read time (:func:`zone_pruned_pins`). Stats of
    still-pinned prior segments carry forward untouched; unpinned
    segments' stats drop with them.

    ``meta`` (JSON dict) REPLACES the manifest's application metadata
    atomically with this commit (None carries the prior value) — the
    transactional-sink hook: a streaming committer stores its batch id
    here so a replayed micro-batch is detected-and-skipped against the
    same atomic state its data landed with.

    ``bloom_cols`` (component → columns) turns on bloom sidecars for
    fresh segments: equality-predicate skipping where min/max ranges
    can't help (:func:`bloom_pruned_pins`). The sidecar file lands
    before the manifest flip and its presence is advertised in the
    blob, so readers never look for a sidecar that isn't there;
    over-budget segments simply stay unadvertised (kept on read).

    An ``appends`` value may also be a ``(DataFrame, slice_col)``
    tuple: the frame is STAGED as one write job and lands as MANY
    segments — one per distinct non-null integer ``slice_col`` value
    (:func:`stage_segments`) — all pinned by this single commit. This
    is the bulk-clustered-load shape (z-order bootstrap): N range
    slices, one pass over the data, one manifest flip."""
    replaces = replaces or {}
    zone_cols = zone_cols or {}
    bloom_cols = bloom_cols or {}
    if set(appends) & set(replaces):
        raise ValueError("append_segments: a component cannot be in both maps")
    if init:
        pins, zones, blooms, prior_meta, schemas, base, counts = {}, {}, {}, {}, {}, 0, {}
    else:
        pins, zones, blooms, prior_meta, schemas, base, counts = _manifest_state(spark, root)
    if expected_base is not None and expected_base != base:
        # fail BEFORE writing any segment file: the caller's payload
        # was derived from a manifest another writer has since replaced
        raise ConcurrentCommitError(
            f"append_segments: payload derived from manifest v{expected_base} "
            f"but v{base} is now committed — re-read and retry"
        )
    new_pins = dict(pins)
    # schema evolution happens BEFORE any segment lands: an
    # incompatible frame raises typed with zero debris; compatible
    # frames evolve the manifest-carried schema (add-column appends,
    # missing columns read back null-filled)
    new_schemas = dict(schemas)
    for name, df in appends.items():
        if isinstance(df, tuple):
            df, slice_col = df
            # the slice column is consumed by the staged write — it
            # never lands in the data files, so it must not evolve
            # into the recorded schema either
            logical = StructType(
                [f for f in df.schema.fields if f.name != slice_col]
            )
        else:
            logical = df.schema
        new_schemas[name] = _evolved_schema_json(
            schemas.get(name), logical, name
        )
    for name, df in replaces.items():
        # a replace IS the explicit rewrite: the same commit unpins
        # every prior segment of the component, so there is no older
        # vintage to reconcile against — the recorded schema RESETS to
        # the replacing frame's (type changes become legal here, and
        # columns the rewrite dropped stop being served as phantom
        # NULLs forever)
        new_schemas[name] = _with_field_ids(
            _nullable_schema_json(df.schema.jsonValue())
        )
    # revision-axis stamping: an append to a component whose recorded
    # schema already carries ``_useq`` (i.e. it has taken upserts) is
    # stamped with THIS commit's sequence when the frame lacks the
    # column — so a plain append lands ordered AFTER earlier deletes
    # of the same ids instead of silently reading as sequence 0 and
    # dying under them (r13 ADVICE). Frames that already carry the
    # column (upsert payloads, CDF mirror feeds replicating the
    # SOURCE's axis verbatim) pass through untouched.
    def _stamp(name: str, df: DataFrame) -> DataFrame:
        recorded = {
            f["name"] for f in (new_schemas.get(name) or {}).get("fields", [])
        }
        if UPSERT_SEQ_COL in recorded and UPSERT_SEQ_COL not in df.columns:
            from pyspark.sql import functions as F  # noqa: PLC0415

            return df.withColumn(
                UPSERT_SEQ_COL, F.lit(base + 1).cast("bigint")
            )
        return df

    new_segs: list[tuple[str, int]] = []
    for name, df in appends.items():
        if isinstance(df, tuple):
            staged = stage_segments(
                spark, _stamp(name, df[0]), f"{root}/{name}", df[1]
            )
            if not staged:  # empty frame → zero slice dirs: pin one
                staged = [  # empty segment so the manifest stays valid
                    write_segment(
                        spark,
                        _stamp(name, df[0].drop(df[1])),
                        f"{root}/{name}",
                    )
                ]
            new_pins[name] = [*pins.get(name, []), *staged]
            new_segs += [(name, s) for s in staged]
        else:
            seg = write_segment(spark, _stamp(name, df), f"{root}/{name}")
            new_pins[name] = [*pins.get(name, []), seg]
            new_segs.append((name, seg))
    for name, df in replaces.items():
        seg = write_segment(spark, df, f"{root}/{name}")
        new_pins[name] = [seg]
        new_segs.append((name, seg))
    new_zones = _carry_zones(zones, new_pins)
    new_blooms = _carry_blooms(blooms, new_pins)
    new_counts = _counts_for_commit(spark, root, counts, new_pins)
    _cover_new_segments(
        spark, root, new_segs, zone_cols, bloom_cols, new_zones, new_blooms,
        schemas=new_schemas,
    )
    # pinned commit: concurrent committers cannot silently drop each
    # other's segments — the loser gets ConcurrentCommitError and must
    # retry from fresh pins (its written segments stay unpinned debris).
    # The zones/meta kwargs are only passed when non-empty so plain
    # callers hit the canonical 4-arg signature (test doubles and
    # wrappers of commit_segment_manifest keep working unchanged).
    kw = {}
    if new_zones:
        kw["zones"] = new_zones
    if new_blooms:
        kw["blooms"] = new_blooms
    if new_counts:
        kw["counts"] = new_counts
    new_meta = meta if meta is not None else prior_meta
    if (
        meta is not None
        and "_cdc_rewrites" in prior_meta
        and "_cdc_rewrites" not in meta
    ):
        # the meta REPLACE contract is for APPLICATION state; the
        # change feed's rewrite markers are infrastructure and ride
        # through (subset to the new pins), else an expiry later could
        # leave a rewrite fold unmarked at its first retained sighting
        new_meta = _mark_rewrites(
            {**meta, "_cdc_rewrites": prior_meta["_cdc_rewrites"]},
            new_pins,
            {},
        )
    if new_meta:
        kw["meta"] = new_meta
    # ``expected_base`` (checked against the fresh read above, and
    # enforced again by the version claim here) lets a caller that
    # DERIVED its payload — e.g. an additive meta counter — from an
    # earlier manifest read pin the commit to that version: if anyone
    # committed since, the commit raises instead of silently rebasing
    # derived state onto a value it wasn't computed from
    # (read-modify-write lost update).
    commit_base = base if expected_base is None else expected_base
    commit_segment_manifest(
        spark,
        root,
        new_pins,
        expected_base=commit_base,
        schemas=new_schemas,
        **kw,
    )
    return new_pins


def _carry_zones(
    zones: dict[str, dict[int, dict[str, list]]],
    new_pins: dict[str, list[int]],
) -> dict[str, dict[int, dict[str, list]]]:
    """Zonemap stats restricted to segments the next manifest still
    pins — immutable segments keep their stats forever; replaced or
    compacted-away segments drop theirs with the pin."""
    out: dict[str, dict[int, dict[str, list]]] = {}
    for comp, zm in zones.items():
        pinned = set(new_pins.get(comp, []))
        keep = {seg: stats for seg, stats in zm.items() if seg in pinned}
        if keep:
            out[comp] = keep
    return out


def _carry_blooms(
    blooms: dict[str, dict[int, list[str]]],
    new_pins: dict[str, list[int]],
) -> dict[str, dict[int, list[str]]]:
    """Bloom coverage restricted to still-pinned segments — the bloom
    twin of :func:`_carry_zones` (sidecar files of unpinned segments
    die with them in expire_segments)."""
    out: dict[str, dict[int, list[str]]] = {}
    for comp, bm in blooms.items():
        pinned = set(new_pins.get(comp, []))
        keep = {seg: cols for seg, cols in bm.items() if seg in pinned}
        if keep:
            out[comp] = keep
    return out


def _segment_row_count(spark, component_root: str, seg: int) -> int:
    """EXACT physical row count of one segment, read DRIVER-SIDE from
    the parquet footers (``ParquetFileReader.getRecordCount`` summed
    over the segment dir's part files) — zero Spark jobs, any Hadoop
    filesystem. This is how the counts plane is populated at cover
    time and backfilled for pre-counts manifests: the footers already
    hold the exact answer the data plane would spend a scan on."""
    jvm, fs = _fs(spark, component_root)
    jdir = jvm.org.apache.hadoop.fs.Path(
        _segment_dir(component_root.rstrip("/"), seg)
    )
    hconf = spark._jsc.hadoopConfiguration()
    total = 0
    for st in _list_status(jvm, fs, jdir):
        if not st.getPath().getName().endswith(".parquet"):
            continue
        rdr = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(
            jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(
                st, hconf
            )
        )
        try:
            total += int(rdr.getRecordCount())
        finally:
            rdr.close()
    return total


def _carry_counts(
    counts: dict[str, dict[int, int]],
    new_pins: dict[str, list[int]],
) -> dict[str, dict[int, int]]:
    """Row counts restricted to still-pinned segments — the counts
    twin of :func:`_carry_zones` (segments are immutable, so a pinned
    segment's count never changes)."""
    out: dict[str, dict[int, int]] = {}
    for comp, cm in counts.items():
        pinned = set(new_pins.get(comp, []))
        keep = {seg: n for seg, n in cm.items() if seg in pinned}
        if keep:
            out[comp] = keep
    return out


def _counts_for_commit(
    spark,
    root: str,
    prior_counts: dict[str, dict[int, int]],
    new_pins: dict[str, list[int]],
) -> dict[str, dict[int, int]]:
    """The counts plane for the NEXT manifest: carry every still-pinned
    segment's known count forward and footer-read any pinned segment
    missing one (fresh segments, and — self-healing — every segment of
    a pre-counts manifest on its first post-upgrade commit). All
    driver-side: zero Spark jobs regardless of how many segments need
    backfill."""
    out: dict[str, dict[int, int]] = {}
    for comp, segs in new_pins.items():
        known = prior_counts.get(comp, {})
        cm: dict[int, int] = {}
        for s in segs:
            n = known.get(s)
            cm[s] = (
                int(n)
                if n is not None
                else _segment_row_count(spark, f"{root.rstrip('/')}/{comp}", s)
            )
        out[comp] = cm
    return out


def _cover_new_segments(
    spark,
    root: str,
    new_segs: Sequence[tuple[str, int]],
    zone_cols: dict[str, Sequence[str]],
    bloom_cols: dict[str, Sequence[str]],
    new_zones: dict,
    new_blooms: dict,
    schemas: dict[str, dict] | None = None,
) -> None:
    """Compute zonemap stats and bloom sidecars for just-written
    segments, batched per component/column: a component landing ONE
    segment keeps the per-segment O(batch) jobs; a component landing
    MANY (a staged fold-to-N rewrite) gets one stats job and one
    count+collect job pair per bloom column instead of O(segments)
    jobs. ``schemas`` (the commit's evolved schema jsons) makes the
    builders rename-aware: a LAGGING writer's fresh segment physically
    carries a pre-rename column name, and zone/bloom stats requested
    under the CURRENT name must find its values through the same
    coalesce plan readers use — not crash on an unresolved column.
    Mutates ``new_zones`` / ``new_blooms`` in place."""
    by_comp: dict[str, list[int]] = {}
    for name, seg in new_segs:
        by_comp.setdefault(name, []).append(seg)
    for name, segs in by_comp.items():
        comp_root = f"{root}/{name}"
        sch = _schema_from_json((schemas or {}).get(name))
        if sch is not None and not _rename_shadow_plan(sch)[1]:
            sch = None  # no renames: the plain footer-schema fast path
        zcols = list(zone_cols.get(name) or [])
        if zcols:
            if len(segs) == 1 and sch is None:
                new_zones.setdefault(name, {})[segs[0]] = _segment_zone_stats(
                    spark, comp_root, segs[0], zcols
                )
            else:
                for seg, stats in _segment_zone_stats_many(
                    spark, comp_root, segs, zcols, schema=sch
                ).items():
                    new_zones.setdefault(name, {})[seg] = stats
        built_by_seg: dict[int, list[str]] = {}
        for c in bloom_cols.get(name, []):
            if len(segs) == 1 and sch is None:
                ok = {segs[0]: _write_segment_bloom(spark, comp_root, segs[0], c)}
            else:
                ok = _write_segment_blooms_many(
                    spark, comp_root, segs, c, schema=sch
                )
            for seg, built in ok.items():
                if built:
                    built_by_seg.setdefault(seg, []).append(c)
        for seg, cols in built_by_seg.items():
            new_blooms.setdefault(name, {})[seg] = cols


def _segment_bytes(spark, component_root: str, seg: int) -> int:
    """On-disk bytes of one segment dir (Hadoop content summary) —
    the driver-side input of size-tiered compaction planning."""
    jvm, fs = _fs(spark, component_root)
    path = jvm.org.apache.hadoop.fs.Path(
        _segment_dir(component_root.rstrip("/"), seg)
    )
    return int(fs.getContentSummary(path).getLength())


def compact_segments(
    spark,
    root: str,
    components: Sequence[str] | None = None,
    reducers: dict | None = None,
    min_segments: int = 2,
    max_segment_bytes: int | None = None,
    expected_base: int | None = None,
    meta: dict | None = None,
) -> dict[str, list[int]]:
    """Fold each multi-segment component back to ONE segment (read the
    pinned union — through ``reducers[name]`` if given, e.g. a
    re-aggregation for additive stats tables — write it as a fresh
    segment, pin only that) and commit a single manifest for all of
    them. Components with fewer than ``min_segments`` pinned segments
    are left alone. Returns the committed pin map.

    This bounds read fan-in and small files under a long append-only
    ingest: run it on a cadence (every K commits / from a maintenance
    cron), amortizing the O(dataset) rewrite over the K O(batch)
    commits it covers.

    ``max_segment_bytes`` turns on SIZE-TIERED compaction — the LSM
    shape a 100 TB component actually needs: only segments smaller
    than the threshold fold (micro-batch debris), segments that
    already graduated past it keep their pins untouched, so each
    maintenance pass rewrites O(small tail) instead of O(component)
    and total rewrite work over a dataset's life is amortized
    logarithmic, not quadratic. Requires SUBSET-SOUND reducers: a
    plain union or an additive re-aggregation without liveness
    filters qualifies (folding a subset of additive segments plus the
    untouched rest sums to the same total); a reducer that DROPS
    net-zero/negative groups (the rollup merge, the delete-apply
    stats fold) does not — a negative row folded apart from its
    positive twin would be filtered away. The index modules' plain
    compaction reducers are all subset-sound; their delete-APPLY
    paths always run the full rewrite.

    Zonemap coverage survives compaction WITHOUT the caller restating
    the zoned columns: the compacted segment's stats are recomputed
    for every column the folded-away segments carried stats for (the
    column set is manifest metadata, so compaction is self-describing
    the way the reducers are not). Bloom coverage survives the same
    way (the folded segments' column sets are re-bloomed against the
    compacted output). Application metadata (``_meta``) carries
    through unchanged unless ``meta`` is given, which REPLACES it
    atomically with the compaction flip — the hook for state a fold
    retires (e.g. compact_rollup clearing its min/max-reset flag once
    a full fold has made the extremes plain again). ``meta`` is
    committed only when the pass actually folds something; a no-op
    pass leaves the manifest untouched.

    ``expected_base`` pins the WHOLE pass — including the fresh state
    read the fold plans from — to the manifest version the caller's
    reducers were derived from: a caller whose reducer choice depends
    on committed state (e.g. compact_rollup picking its fold by the
    min/max-reset meta flag) passes the version it read that state at,
    and a rival commit landing in between raises
    :class:`ConcurrentCommitError` BEFORE any fold job runs instead of
    reducing new state under a stale decision.

    Since r13 this is a thin wrapper over :func:`rewrite_components` —
    the multi-component fold-to-N core that also backs
    :func:`rewrite_segments` — so the manifest invariants (schema
    evolution + prior_names retirement on full folds, coverage
    rebuild, rewrite marking, the atomic all-components flip) have ONE
    owner. A rival commit landing mid-pass conflicts loudly (no
    internal retry — the established compaction contract: the caller
    retries from fresh pins)."""
    reducers = reducers or {}

    def specs_of(snap: ManifestSnapshot) -> dict[str, dict]:
        names = list(components) if components is not None else list(snap.pins)

        def tier_plan(name: str):
            def plan(s: ManifestSnapshot) -> list[int]:
                pins_ = s.pins[name]
                if max_segment_bytes is None:
                    return list(pins_)
                # ONE recursive listing, not a content-summary RPC per
                # segment (segment_sizes' documented contract) — a
                # 10^4-segment component must not probe sequentially
                sizes = segment_sizes(spark, root, name, pins_)
                return [
                    seg for seg in pins_ if sizes[seg] < max_segment_bytes
                ]

            return plan

        return {
            name: {
                "rewrite": reducers.get(name),
                "plan": tier_plan(name),
                "min_segments": min_segments,
                "coverage_scope": "component",
            }
            for name in names
        }

    return rewrite_components(
        spark,
        root,
        specs_of,
        meta=meta,
        expected_base=expected_base,
        max_attempts=1,
    )


def rewrite_components(
    spark,
    root: str,
    specs,
    meta: dict | None = None,
    meta_update: Callable | None = None,
    expected_base: int | None = None,
    max_attempts: int = 1,
) -> dict[str, list[int]]:
    """The multi-component fold-to-N rewrite core — ONE manifest flip
    rewrites any set of components through per-component functions,
    owning every manifest invariant once: the consistent snapshot,
    schema-pinned reads of each fold set, staged or per-frame segment
    writes, zone/bloom carry for untouched segments, batched coverage
    rebuild on the fresh ones, schema evolution (+ ``prior_names``
    retirement when a component's fold covered every pinned segment),
    rewrite marking for the change feed, and the ``expected_base``
    commit. :func:`compact_segments` (all components, one output each,
    no retry) and :func:`rewrite_segments` (one component, N outputs,
    retry-from-fresh) are thin wrappers.

    ``specs`` maps component → spec dict, or is a callable
    ``specs(snapshot) -> dict`` evaluated on the pass's own snapshot
    (so "every pinned component" plans see the same state the commit
    is pinned to). Spec keys:

    - ``"rewrite"``: ``df -> DataFrame | [DataFrame, ...] |
      (DataFrame, slice_col)`` — None means identity (the plain fold).
      The tuple shape stages N segments from ONE write job
      (:func:`stage_segments`).
    - ``"plan"``: ``snapshot -> [segment, ...]`` fold selection
      (default: every pinned segment). Must choose pinned segments.
    - ``"min_segments"``: fewer candidates → that component no-ops
      (default 2).
    - ``"zone_cols"`` / ``"bloom_cols"``: extra coverage columns for
      the new layout, unioned with the self-describing set.
    - ``"coverage_scope"``: ``"fold"`` (default — recompute the
      columns the folded-away segments carried) or ``"component"``
      (every column any pinned segment carries — compaction's rule).

    ``meta`` REPLACES application metadata atomically with the flip;
    ``meta_update(prior_meta, {component: [new_segs]}) -> dict``
    computes it per attempt (mutually exclusive with ``meta``); the
    change feed's ``_cdc_rewrites`` markers ride through either. A
    no-op pass (nothing reached min_segments) returns the current pins
    with no commit and no jobs. ``expected_base`` pins the WHOLE pass
    to that manifest version (typed conflict BEFORE any fold job) and
    disables retry; otherwise a lost flip replans from fresh state up
    to ``max_attempts`` times — written segments stay unpinned debris
    for the orphan sweep."""
    if meta is not None and meta_update is not None:
        raise ValueError("rewrite_components: meta and meta_update are exclusive")
    last_err: BaseException | None = None
    attempts = 1 if expected_base is not None else max_attempts
    for _attempt in range(attempts):
        snap = manifest_snapshot(spark, root)
        if expected_base is not None and expected_base != snap.version:
            raise ConcurrentCommitError(
                f"rewrite_components: pass derived from manifest "
                f"v{expected_base} but v{snap.version} is now committed — "
                "re-read and retry"
            )
        spec_map = specs(snap) if callable(specs) else specs
        new_pins = dict(snap.pins)
        new_schemas = dict(snap.schemas)
        outputs: dict[str, list[int]] = {}
        new_segs: list[tuple[str, int]] = []
        zone_req: dict[str, list[str]] = {}
        bloom_req: dict[str, list[str]] = {}
        for comp, spec in spec_map.items():
            if comp not in snap.pins:
                raise KeyError(
                    f"rewrite_components: no pinned component {comp!r}"
                )
            pinned = set(snap.pins[comp])
            plan = spec.get("plan")
            fold = list(plan(snap)) if plan is not None else list(snap.pins[comp])
            stray = [s for s in fold if s not in pinned]
            if stray:
                raise ValueError(
                    f"rewrite_components: plan chose unpinned segments "
                    f"{stray} of {comp!r} — plans must derive from the snapshot"
                )
            if len(fold) < int(spec.get("min_segments", 2)):
                continue
            comp_root = f"{root.rstrip('/')}/{comp}"
            # a schema-pinned read makes the rewrite the NORMALIZATION
            # step of schema evolution: segments written under older
            # schema versions fold into output carrying the current
            # schema (null-backfilled), so the mixed-schema tail ages out
            df = read_segments(
                spark,
                comp_root,
                fold,
                schema=_schema_from_json(snap.schemas.get(comp)),
            )
            rewrite = spec.get("rewrite")
            out = rewrite(df) if rewrite is not None else df
            # schema evolution FIRST, over EVERY output frame's schema —
            # an incompatible output raises typed with zero segment
            # debris (a later frame may legitimately add columns;
            # folding only frames[0] would silently lose them from the
            # recorded schema, making the data invisible to every
            # pinned read and physically dropped at the next
            # normalization)
            if isinstance(out, tuple):
                frame, slice_col = out
                out_schemas = [
                    StructType(
                        [f for f in frame.schema.fields if f.name != slice_col]
                    )
                ]
            elif isinstance(out, DataFrame):
                out_schemas = [out.schema]
            else:
                out = list(out)
                if not out:
                    raise ValueError(
                        "rewrite_components: rewrite returned no output frames"
                    )
                out_schemas = [f.schema for f in out]
            evolved = snap.schemas.get(comp)
            for sch in out_schemas:
                evolved = _evolved_schema_json(evolved, sch, comp)
            survivors = [s for s in snap.pins[comp] if s not in set(fold)]
            if evolved is not None and not survivors:
                # FULL fold: every pinned segment now physically
                # carries the current names — retire the rename shim
                # so reads regain exact pushdown (_strip_prior_names)
                evolved = _strip_prior_names(evolved)
            if isinstance(out, tuple):
                outs = stage_segments(spark, frame, comp_root, slice_col)
                if not outs:
                    # an all-empty fold set stages zero slice dirs; the
                    # component must still pin SOMETHING (a manifest
                    # rejects empty pin lists), so land one empty
                    # current-schema segment — the fold-to-one shape
                    outs = [
                        write_segment(spark, frame.drop(slice_col), comp_root)
                    ]
            elif isinstance(out, DataFrame):
                outs = [write_segment(spark, out, comp_root)]
            else:
                outs = [write_segment(spark, f, comp_root) for f in out]
            new_pins[comp] = sorted([*survivors, *outs])
            new_schemas[comp] = evolved
            outputs[comp] = outs
            new_segs += [(comp, s) for s in outs]
            # self-describing coverage: the folded segments' column
            # sets ("fold") or every pinned segment's ("component" —
            # compaction's rule), plus whatever the caller declares
            # for the new layout
            scope = (
                snap.pins[comp]
                if spec.get("coverage_scope") == "component"
                else fold
            )
            zone_req[comp] = sorted(
                {
                    c
                    for s in scope
                    for c in snap.zones.get(comp, {}).get(s, {})
                }
                | set(spec.get("zone_cols") or ())
            )
            bloom_req[comp] = sorted(
                {
                    c
                    for s in scope
                    for c in snap.blooms.get(comp, {}).get(s, [])
                }
                | set(spec.get("bloom_cols") or ())
            )
        if not outputs:
            return snap.pins
        new_zones = _carry_zones(snap.zones, new_pins)
        new_blooms = _carry_blooms(snap.blooms, new_pins)
        _cover_new_segments(
            spark,
            root.rstrip("/"),
            new_segs,
            zone_req,
            bloom_req,
            new_zones,
            new_blooms,
            schemas=new_schemas,
        )
        new_schemas = {c: sj for c, sj in new_schemas.items() if c in new_pins}
        if meta_update is not None:
            commit_meta = meta_update(snap.meta, outputs)
        elif meta is not None:
            commit_meta = meta
        else:
            commit_meta = snap.meta
        if (
            "_cdc_rewrites" in snap.meta
        ) and "_cdc_rewrites" not in (commit_meta or {}):
            commit_meta = {
                **(commit_meta or {}),
                "_cdc_rewrites": snap.meta["_cdc_rewrites"],
            }  # infrastructure carry past a meta source that dropped it
        # rewrite outputs carry no NEW rows: mark them so the change
        # feed (read_segment_changes) skips layout maintenance
        commit_meta = _mark_rewrites(commit_meta, new_pins, outputs)
        kw: dict = {}
        if new_zones:
            kw["zones"] = new_zones
        if new_blooms:
            kw["blooms"] = new_blooms
        if commit_meta:
            kw["meta"] = commit_meta
        if new_schemas:
            kw["schemas"] = new_schemas
        kw["counts"] = _counts_for_commit(spark, root, snap.counts, new_pins)
        try:
            commit_segment_manifest(
                spark, root, new_pins, expected_base=snap.version, **kw
            )
            return new_pins
        except ConcurrentCommitError as e:
            last_err = e  # replan from fresh pins; debris to the sweep
    raise last_err


def rewrite_segments(
    spark,
    root: str,
    component: str,
    rewrite: Callable,
    plan: Callable | None = None,
    min_segments: int = 2,
    zone_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
    meta_update: Callable | None = None,
    max_attempts: int = 3,
) -> dict[str, list[int]]:
    """The single-component fold-to-N rewrite hook — the layout-verb
    surface (OPTIMIZE-ZORDER waves, partition re-bucketing, leveled
    merges) over :func:`rewrite_components`, which owns every manifest
    invariant ONCE: the consistent snapshot, the schema-pinned read of
    the fold set, staged or per-frame segment writes, zone/bloom carry
    for untouched segments, coverage rebuild on the fresh ones
    (batched), schema evolution + subsetting, the ``expected_base``
    flip, and a bounded retry-from-fresh-pins loop on
    :class:`ConcurrentCommitError`.

    ``plan(snapshot)`` picks the fold set from a
    :class:`ManifestSnapshot` (default: every pinned segment of the
    component). Fewer than ``min_segments`` candidates → no-op (no
    jobs, no commit); the current pins return.

    ``rewrite(df)`` maps the fold set's schema-pinned union to the new
    layout and returns ONE of: a ``(DataFrame, slice_col)`` tuple —
    the scale path, N segments from ONE staged write job
    (:func:`stage_segments`); a list of DataFrames — one write job
    each (small N, heterogeneous outputs); or a single DataFrame (the
    compaction shape). Content is the rewrite's contract; the hook
    never transforms rows.

    Coverage on the fresh segments is self-describing like
    :func:`compact_segments`: every column the folded-away segments
    carried zone stats / bloom advertisements for is recomputed on the
    outputs (plus any ``zone_cols`` / ``bloom_cols`` the caller adds —
    a NEW layout may warrant new skipping columns).

    ``meta_update(prior_meta, new_segs)`` returns the manifest
    application metadata to commit atomically with the flip (layout
    markers, wave counters); default carries the prior value. On a
    lost commit race the WHOLE pass replans from fresh state — written
    segments stay unpinned debris for the orphan sweep — up to
    ``max_attempts`` times, then the typed conflict propagates."""
    mu = None
    if meta_update is not None:
        def mu(prior_meta, outputs):  # adapt to the single-component form
            return meta_update(prior_meta, list(outputs.get(component, [])))

    return rewrite_components(
        spark,
        root,
        {
            component: {
                "rewrite": rewrite,
                "plan": plan,
                "min_segments": min_segments,
                "zone_cols": zone_cols,
                "bloom_cols": bloom_cols,
                "coverage_scope": "fold",
            }
        },
        meta_update=mu,
        max_attempts=max_attempts,
    )


def validate_segmented(spark, root: str, deep: bool = False) -> dict:
    """Consistency check (fsck) of a segmented dataset against its
    committed manifest — the audit an operator runs before trusting a
    restored/replicated 100 TB root, and the fast triage when a reader
    errors. Driver-side filesystem work only (no Spark job) unless
    ``deep``:

    - every pinned segment dir must exist and contain at least one
      parquet part file (a vanished pinned segment is data loss — by
      protocol only UNPINNED segments are ever swept);
    - zonemap stats, bloom advertisements, and manifest schemas must
      reference only pinned segments / parse as valid Spark types
      (stale metadata misdirects pruning);
    - advertised bloom sidecar files must exist;
    - the tombstone-pressure counter must be a non-negative int.
    - ``deep`` additionally opens EVERY pinned part file's parquet
      footer and checks each file's columns are a SUBSET of the
      manifest schema with compatible types on the common columns
      (equal, or a lossless widening source — the schema-evolution
      read contract). O(files) driver-side reader inits: by protocol
      one writer wrote each segment, so per-segment drift needs
      external corruption — deep mode is the restore/audit gate, not
      a cadence check.

    Returns ``{"ok": bool, "errors": [...], "components": {name:
    n_segments}}``; it reports, never repairs."""
    errors: list[str] = []
    pins, zones, blooms, meta, schemas, version, counts = _manifest_state(spark, root)
    jvm, fs = _fs(spark, root)

    def _exists(path: str) -> bool:
        return fs.exists(jvm.org.apache.hadoop.fs.Path(path))

    for name, segs in pins.items():
        for seg in segs:
            d = _segment_dir(f"{root}/{name}", seg)
            if not _exists(d):
                errors.append(f"{name}/seg={seg}: pinned segment dir missing")
                continue
            parts = [
                st.getPath().getName()
                for st in _list_status(
                    jvm, fs, jvm.org.apache.hadoop.fs.Path(d)
                )
                if st.getPath().getName().endswith(".parquet")
            ]
            if not parts:
                errors.append(f"{name}/seg={seg}: no parquet part files")
    for comp, zm in zones.items():
        stale = set(zm) - set(pins.get(comp, []))
        if stale:
            errors.append(f"zonemap references unpinned {comp} segments: {sorted(stale)}")
    for comp, bm in blooms.items():
        stale = set(bm) - set(pins.get(comp, []))
        if stale:
            errors.append(f"blooms reference unpinned {comp} segments: {sorted(stale)}")
        for seg, cols in bm.items():
            for c in cols:
                if seg in pins.get(comp, []) and not _exists(
                    _bloom_path(f"{root}/{comp}", seg, c)
                ):
                    errors.append(
                        f"{comp}/seg={seg}: advertised bloom sidecar for "
                        f"{c!r} missing"
                    )
    parsed_schemas: dict[str, dict] = {}
    for comp, sj in schemas.items():
        if comp not in pins:
            errors.append(f"schema recorded for unpinned component {comp!r}")
            continue
        try:
            st = _schema_from_json(sj)
            parsed_schemas[comp] = {f.name: f.dataType for f in st.fields}
        except Exception as e:  # noqa: BLE001 - report, never raise
            errors.append(f"{comp}: manifest schema unparseable: {e}")
    tomb = meta.get(TOMBSTONE_ROWS_KEY)
    if tomb is not None and (not isinstance(tomb, int) or tomb < 0):
        errors.append(f"meta {TOMBSTONE_ROWS_KEY}={tomb!r}: not a non-negative int")
    for comp, cm in counts.items():
        stale = set(cm) - set(pins.get(comp, []))
        if stale:
            errors.append(
                f"counts reference unpinned {comp} segments: {sorted(stale)}"
            )
        bad = [s for s, n in cm.items() if not isinstance(n, int) or n < 0]
        if bad:
            errors.append(
                f"{comp}: non-int/negative segment counts: {sorted(bad)}"
            )
    if deep:
        # counts plane vs footers: a pinned segment with a recorded
        # count must footer-sum to exactly that count (segments are
        # immutable; drift means external corruption or a protocol bug)
        for comp, cm in counts.items():
            for seg, n in cm.items():
                if seg not in pins.get(comp, []):
                    continue
                if not _exists(_segment_dir(f"{root}/{comp}", seg)):
                    continue  # already reported above
                actual = _segment_row_count(spark, f"{root}/{comp}", seg)
                if actual != int(n):
                    errors.append(
                        f"{comp}/seg={seg}: manifest count {n} != footer "
                        f"count {actual}"
                    )
        for comp, fields in parsed_schemas.items():
            for seg in pins[comp]:
                d = _segment_dir(f"{root}/{comp}", seg)
                if not _exists(d):
                    continue
                for st_ in _list_status(
                    jvm, fs, jvm.org.apache.hadoop.fs.Path(d)
                ):
                    fn = st_.getPath().getName()
                    if not fn.endswith(".parquet"):
                        continue
                    try:
                        file_schema = spark.read.parquet(f"{d}/{fn}").schema
                    except Exception as e:  # noqa: BLE001
                        errors.append(f"{comp}/seg={seg}/{fn}: unreadable: {e}")
                        continue
                    for f in file_schema.fields:
                        want = fields.get(f.name)
                        if want is None:
                            errors.append(
                                f"{comp}/seg={seg}/{fn}: column {f.name!r} "
                                "not in manifest schema"
                            )
                        elif want.simpleString() != f.dataType.simpleString():
                            # a file written before a lossless widening
                            # is a legal vintage: the pinned read schema
                            # reconciles it at scan time
                            fj, wj = f.dataType.jsonValue(), want.jsonValue()
                            if _widened_atomic(fj, wj) == wj:
                                continue
                            errors.append(
                                f"{comp}/seg={seg}/{fn}: column {f.name!r} is "
                                f"{f.dataType.simpleString()}, manifest says "
                                f"{want.simpleString()}"
                            )
    return {
        "ok": not errors,
        "version": version,
        "errors": errors,
        "components": {name: len(segs) for name, segs in pins.items()},
    }


def repair_segmented(
    spark,
    root: str,
    sweep_orphans: bool = True,
    orphan_grace_sec: float = 24 * 3600,
    dry_run: bool = False,
    verify_counts: bool = False,
) -> dict:
    """Turn :func:`validate_segmented`'s findings into actions — the
    recovery an operator runs after restoring a replicated 100 TB root
    instead of hand-editing manifests. One pinned manifest flip:

    - QUARANTINE missing pins: a pinned segment whose dir vanished (or
      holds no parquet part files) is un-pinned — readers stop failing
      on it immediately; the typed report names every affected
      component/segment so the operator knows exactly what data needs
      re-ingesting. A component losing its LAST segment is dropped
      from the manifest entirely (with its schema/zones/blooms).
    - DROP stale metadata: zonemap stats, bloom advertisements, and
      schemas referencing unpinned segments/components.
    - REBUILD sidecar coverage: advertised bloom sidecar files that
      vanished are rebuilt from the pinned segment (or the
      advertisement drops if the segment outgrew the bloom budget);
      pinned segments MISSING zone stats / bloom advertisements for
      columns their component covers elsewhere get them recomputed —
      pruning coverage returns to uniform.
    - BACKFILL the counts plane: pinned segments missing a row count
      (pre-counts manifests) get one from their parquet footers —
      driver-side, zero jobs. ``verify_counts=True`` additionally
      footer-checks EVERY pinned entry and corrects mismatches
      (segments are immutable, so a mismatch is corruption — the
      restore/audit path, O(files) driver reads).
    - SWEEP orphans (optional): delegates to :func:`expire_segments`
      with the given grace, so unpinned debris past the intent age
      gate is removed under the same provably-stale test every sweep
      uses.

    ``dry_run=True`` reports the planned actions without committing or
    touching the filesystem. Returns the actions report plus the fsck
    verdict AFTER repair (``report["ok"]``); raises nothing on a
    healthy root (every action list is empty and no commit lands)."""
    jvm, fs = _fs(spark, root)

    def _exists(path: str) -> bool:
        return fs.exists(jvm.org.apache.hadoop.fs.Path(path))

    def _has_parts(path: str) -> bool:
        return any(
            st.getPath().getName().endswith(".parquet")
            for st in _list_status(jvm, fs, jvm.org.apache.hadoop.fs.Path(path))
        )

    last_err: BaseException | None = None
    for _attempt in range(3):
        pins, zones, blooms, meta, schemas, base, counts = _manifest_state(spark, root)
        actions: dict = {
            "unpinned": {},
            "dropped_components": [],
            "rebuilt_bloom_sidecars": {},
            "dropped_bloom_ads": {},
            "rebuilt_zone_stats": {},
            "rebuilt_bloom_ads": {},
            "skipped_bloom_over_budget": {},
            "swept_orphans": {},
        }
        new_pins: dict[str, list[int]] = {}
        for name, segs in pins.items():
            alive = []
            for seg in segs:
                d = _segment_dir(f"{root}/{name}", seg)
                if _exists(d) and _has_parts(d):
                    alive.append(seg)
                else:
                    actions["unpinned"].setdefault(name, []).append(seg)
            if alive:
                new_pins[name] = alive
            else:
                actions["dropped_components"].append(name)
        changed = bool(actions["unpinned"]) or bool(actions["dropped_components"])
        new_zones = _carry_zones(zones, new_pins)
        new_blooms = _carry_blooms(blooms, new_pins)
        new_schemas = {c: sj for c, sj in schemas.items() if c in new_pins}
        changed = changed or new_zones != zones or new_blooms != blooms
        changed = changed or set(new_schemas) != set(schemas)
        # sidecar repair: missing advertised files, then coverage gaps.
        # Both are BATCHED per (component, column) — one count+collect
        # job pair per column over its gap segments, never one job per
        # (segment, column): a restored root with 10^4 pinned segments
        # must not issue 10^4 sequential driver jobs per column.
        for comp, bm in list(new_blooms.items()):
            comp_root = f"{root}/{comp}"
            cols_everywhere = sorted({c for cols in bm.values() for c in cols})
            missing_files: dict[str, list[int]] = {}
            for seg, cols in sorted(bm.items()):
                for c in cols:
                    if not _exists(_bloom_path(comp_root, seg, c)):
                        missing_files.setdefault(c, []).append(seg)
            for c in sorted(missing_files):
                changed = True
                # dry_run probes the budget (count job only, nothing
                # written) so the PLAN says rebuild-vs-drop exactly as
                # an apply would act, instead of claiming rebuilds that
                # an apply would drop for exceeding _BLOOM_MAX_ROWS
                built = _write_segment_blooms_many(
                    spark, comp_root, missing_files[c], c,
                    overwrite=True, dry_run=dry_run,
                    schema=_schema_from_json(schemas.get(comp)),
                )
                for seg in missing_files[c]:
                    if built[seg]:
                        actions["rebuilt_bloom_sidecars"].setdefault(
                            comp, []
                        ).append([seg, c])
                    else:  # outgrew the bloom budget: advertisement drops
                        actions["dropped_bloom_ads"].setdefault(
                            comp, []
                        ).append([seg, c])
                        bm[seg] = [x for x in bm[seg] if x != c]
            gap_by_col: dict[str, list[int]] = {}
            for seg in new_pins.get(comp, []):
                for c in cols_everywhere:
                    if c in bm.get(seg, []):
                        continue
                    if [seg, c] in actions["dropped_bloom_ads"].get(comp, []):
                        continue  # just dropped for budget: don't re-add
                    gap_by_col.setdefault(c, []).append(seg)
            for c in sorted(gap_by_col):
                built = _write_segment_blooms_many(
                    spark, comp_root, gap_by_col[c], c,
                    overwrite=True, dry_run=dry_run,
                    schema=_schema_from_json(schemas.get(comp)),
                )
                for seg in gap_by_col[c]:
                    # record-and-commit ONLY when the rebuild actually
                    # lands (or, in dry_run, provably would): an
                    # over-budget segment (> _BLOOM_MAX_ROWS) must not
                    # flip `changed` or claim a rebuild, else repair
                    # re-runs the job and re-commits an identical
                    # manifest forever (never converges)
                    if built[seg]:
                        changed = True
                        actions["rebuilt_bloom_ads"].setdefault(
                            comp, []
                        ).append([seg, c])
                        if not dry_run:
                            bm.setdefault(seg, []).append(c)
                    else:
                        actions["skipped_bloom_over_budget"].setdefault(
                            comp, []
                        ).append([seg, c])
            new_blooms[comp] = {s: sorted(cs) for s, cs in bm.items() if cs}
        for comp, zm in list(new_zones.items()):
            cols_everywhere = sorted(
                {c for stats in zm.values() for c in stats}
            )
            if not cols_everywhere:
                continue
            # per-COLUMN diff: a segment with stats for only part of
            # the component's column set (a writer that passed a
            # narrower zone_cols) is a coverage gap too
            missing_by_seg: dict[int, list[str]] = {}
            for seg in new_pins.get(comp, []):
                missing = [
                    c for c in cols_everywhere if c not in zm.get(seg, {})
                ]
                if missing:
                    missing_by_seg[seg] = missing
            if not missing_by_seg:
                continue
            changed = True
            actions["rebuilt_zone_stats"].setdefault(comp, []).extend(
                sorted(missing_by_seg)
            )
            if not dry_run:
                # ONE stats job for every gap segment of the component
                # (schema-pinned: a gap column a vintage predates is
                # genuinely all-NULL there, and [None, None, n] is its
                # correct — and prunable — zonemap entry)
                union_cols = sorted(
                    {c for cs in missing_by_seg.values() for c in cs}
                )
                stats_many = _segment_zone_stats_many(
                    spark,
                    f"{root}/{comp}",
                    sorted(missing_by_seg),
                    union_cols,
                    schema=_schema_from_json(schemas.get(comp)),
                )
                for seg, missing in missing_by_seg.items():
                    zm[seg] = {
                        **zm.get(seg, {}),
                        **{c: stats_many[seg][c] for c in missing},
                    }
        # counts plane: backfill missing, and (opt-in) verify existing
        new_counts = _carry_counts(counts, new_pins)
        backfilled: dict[str, list[int]] = {}
        fixed_counts: dict[str, list[int]] = {}
        for comp, segs in new_pins.items():
            cm = new_counts.setdefault(comp, {})
            for seg in segs:
                if seg not in cm:
                    cm[seg] = _segment_row_count(spark, f"{root}/{comp}", seg)
                    backfilled.setdefault(comp, []).append(seg)
                elif verify_counts:
                    actual = _segment_row_count(spark, f"{root}/{comp}", seg)
                    if actual != cm[seg]:
                        cm[seg] = actual
                        fixed_counts.setdefault(comp, []).append(seg)
        if backfilled:
            changed = True
            actions["backfilled_counts"] = backfilled
        if fixed_counts:
            changed = True
            actions["fixed_counts"] = fixed_counts
        if dry_run:
            # same shape as the committing path (callers branch on
            # report["ok"]); the verdict is the CURRENT un-repaired one
            report = validate_segmented(spark, root)
            return {
                "actions": actions,
                "committed": False,
                "ok": report["ok"],
                "errors": report["errors"],
                "version": base,
            }
        if not changed:
            committed = False
            break
        if not new_pins:
            raise RuntimeError(
                f"repair_segmented: every pinned segment of {root} is "
                "missing — nothing left to repair toward; restore the "
                "data or re-bootstrap"
            )
        kw: dict = {}
        if new_zones:
            kw["zones"] = {c: z for c, z in new_zones.items() if z}
        if new_blooms:
            kw["blooms"] = {c: b for c, b in new_blooms.items() if b}
        if meta:
            kw["meta"] = meta
        if new_schemas:
            kw["schemas"] = new_schemas
        kw["counts"] = new_counts
        try:
            commit_segment_manifest(
                spark, root, new_pins, expected_base=base, **kw
            )
            committed = True
            break
        except ConcurrentCommitError as e:
            last_err = e
    else:
        raise last_err
    if sweep_orphans:
        actions["swept_orphans"] = expire_segments(
            spark, root, orphan_grace_sec=orphan_grace_sec
        )
    report = validate_segmented(spark, root)
    return {
        "actions": actions,
        "committed": committed,
        "ok": report["ok"],
        "errors": report["errors"],
        "version": report["version"],
    }


def maintain(
    spark, root: str, policy: dict | None = None, dry_run: bool = False
) -> dict:
    """THE maintenance cadence verb: one call sequences everything a
    fleet scheduler runs against a segmented root — size-tiered
    compaction → z-order recluster waves → coverage repair → retention
    / orphan sweep — each step under its own minimal snapshot+flip
    (every verb is independently retry-safe against rival ingests), so
    an ingest landing mid-cadence conflicts with at most one step's
    commit and the cadence still converges. ``dry_run=True`` produces
    the SAME report shape from the same planning code paths
    (plan_recluster, the size tier, repair's probing dry-run) with no
    commit and no mutation.

    ``policy`` keys (compact/recluster are OPT-IN — they rewrite data,
    so the policy must name them; repair and expire default ON — they
    are no-ops on a healthy root and pass ``False`` to skip):

    - ``"compact"``: kwargs for :func:`compact_segments`
      (``components``, ``min_segments``, ``max_segment_bytes``,
      ``reducers``). Size-tiered when ``max_segment_bytes`` is set.
    - ``"normalize_renames"``: ``True`` folds every component whose
      recorded schema still carries ``prior_names`` to one segment
      under the CURRENT physical names and retires the rename shim —
      closing the renamed-column pushdown gap on cadence (predicates
      on a renamed column filter post-scan until normalization).
      Opt-in like every data rewrite; a no-op when nothing is renamed.
      NOTE it ends the lagging-writer grace for those renames.
    - ``"apply_tombstones"``: ``{component: {"id_col": str,
      "merged": bool, "auto": dict | None}}`` — PHYSICAL apply of each
      component's logical deletes (:func:`apply_tombstones`) on
      cadence, keeping the read-time watermark fold bounded under
      delete/upsert churn. ``merged=True`` (default) applies the
      sequence-watermark rule — required for components mutated via
      :func:`upsert_rows` / :func:`merge_rows`. Opt-in (rewrites
      data); a no-op when the component has no pinned tombstones (or
      only a prior apply's empty reset segment). Runs FIRST: the
      live-only fold it leaves is what compaction's size tier then
      sees, instead of two full rewrites per cadence.

      ``"auto"`` makes the apply PRESSURE-DRIVEN (the index families'
      counter-triggered design — operators/incr_index — ported to the
      lake core): the O(dataset) rewrite fires only when accumulated
      churn has actually inflated the merged-read fold, so an
      every-cadence policy stops paying full rewrites for quiet
      tables. Keys (fire when ANY bound is hit; all driver-side
      manifest/listing reads, ZERO jobs when below threshold):

      * ``"max_rows"``: int — the component's tombstone-row pressure
        counter (:func:`component_tombstone_rows_key`, advanced by
        every delete/upsert/merge commit, reset by the apply) has
        reached this many churned keys.
      * ``"max_rows_ratio"``: float — pressure-counter rows /
        component PHYSICAL rows (manifest counts plane,
        footer-backfilled) has reached this fraction — the exact form
        of the ratio policy: byte ratios lie when tombstone rows are
        narrow relative to wide data rows (r14 VERDICT #2).
      * ``"max_bytes_ratio"``: float — pinned tombstone-component
        bytes / data-component bytes (``segment_sizes`` listings) has
        reached this fraction — the counter-free fallback for
        components whose tombstones predate the counter.
    - ``"recluster"``: ``{component: kwargs}`` for
      operators.zcluster.recluster_zorder (``exprs``, ``zone_cols``,
      ``n_segments``, ``bits``, ``min_segments``,
      ``max_segment_bytes``, ``max_waves``). Runs AFTER compaction so
      freshly folded segments join the wave.
    - ``"repair"``: ``True`` (default) / ``False`` / kwargs for
      :func:`repair_segmented`. Runs with its own orphan sweep
      disabled — retention is the last step's job.
    - ``"expire"``: kwargs for :func:`expire_segments`
      (``keep_manifests``, ``orphan_grace_sec``, ``reader_grace_sec``)
      or ``False``. Sweeps the debris every earlier step may have
      left (failed-attempt slices, pre-compaction segments past
      retention).

    Returns ``{"dry_run", "compact", "recluster", "repair", "expire",
    "version"}`` — per-step reports an operator can alert on."""
    policy = policy or {}
    report: dict = {"dry_run": dry_run}

    # ---- 0) physical tombstone apply (bounds the watermark fold).
    # Runs BEFORE compaction: the live-only fold it leaves is what the
    # size tier then sees (already one segment -> compaction skips it),
    # instead of compacting dead revisions only to rewrite them again.
    akw = policy.get("apply_tombstones")
    if not akw:
        report["apply_tombstones"] = {"skipped": True}
    else:
        state_now = _manifest_state(spark, root)
        pins_now, meta_now = state_now[0], state_now[3]
        arep: dict[str, str] = {}
        for comp, kw in akw.items():
            if _tombstone_component(comp) not in pins_now:
                arep[comp] = "no_tombstones"
                continue
            auto = kw.get("auto")
            if auto:
                # pressure gate: fire the O(dataset) rewrite only when
                # accumulated churn crossed a bound — all driver-side
                # (meta counter / size listings), zero Spark jobs when
                # the table is quiet
                fire = False
                if "max_rows" in auto:
                    n = int(
                        meta_now.get(component_tombstone_rows_key(comp), 0)
                    )
                    fire = n >= int(auto["max_rows"])
                if not fire and "max_rows_ratio" in auto:
                    # churned keys / physical component rows, BOTH from
                    # the metadata plane (pressure counter + counts) —
                    # byte ratios lie when tombstone rows are narrow
                    # relative to wide data rows; this one doesn't
                    n = int(
                        meta_now.get(component_tombstone_rows_key(comp), 0)
                    )
                    known = state_now[6].get(comp, {})
                    dr = sum(
                        int(known[s])
                        if s in known
                        else _segment_row_count(spark, f"{root}/{comp}", s)
                        for s in pins_now.get(comp, [])
                    )
                    fire = dr > 0 and n / dr >= float(
                        auto["max_rows_ratio"]
                    )
                if not fire and "max_bytes_ratio" in auto:
                    tname = _tombstone_component(comp)
                    tb = sum(
                        segment_sizes(
                            spark, root, tname, pins_now[tname]
                        ).values()
                    )
                    db = sum(
                        segment_sizes(
                            spark, root, comp, pins_now.get(comp, [])
                        ).values()
                    )
                    fire = db > 0 and tb / db >= float(
                        auto["max_bytes_ratio"]
                    )
                if not fire:
                    arep[comp] = "below_pressure"
                    continue
            if dry_run:
                arep[comp] = "would_apply"
            else:
                _pins, applied = _apply_tombstones(
                    spark,
                    root,
                    comp,
                    kw["id_col"],
                    merged=bool(kw.get("merged", True)),
                )
                arep[comp] = "applied" if applied else "no_tombstones"
        report["apply_tombstones"] = arep

    # ---- 1) size-tiered compaction
    ckw = policy.get("compact")
    if ckw is None:
        report["compact"] = {"skipped": True}
    else:
        before = segment_pins(spark, root)
        if dry_run:
            # plan only on the dry path — the apply path lets
            # compact_segments do its own (identical) fold selection,
            # instead of paying a second sizing pass it then discards
            names = list(ckw.get("components") or before)
            min_seg = int(ckw.get("min_segments", 2))
            max_bytes = ckw.get("max_segment_bytes")
            plan: dict[str, list[int]] = {}
            for name in names:
                if max_bytes is None:
                    fold = list(before.get(name, []))
                else:
                    sizes = segment_sizes(spark, root, name, before.get(name, []))
                    fold = [s for s in before.get(name, []) if sizes[s] < max_bytes]
                if len(fold) >= min_seg:
                    plan[name] = fold
            report["compact"] = {"would_fold": plan}
        else:
            after = compact_segments(spark, root, **ckw)
            report["compact"] = {
                "folded": {
                    n: sorted(set(before[n]) - set(after.get(n, [])))
                    for n in before
                    if set(before[n]) - set(after.get(n, []))
                }
            }

    # ---- 1b) rename normalization: full-fold the components whose
    # schema still carries prior_names (the pushdown gap ages out here)
    if not policy.get("normalize_renames"):
        report["normalize_renames"] = {"skipped": True}
    else:
        schemas_now = _manifest_state(spark, root)[4]
        targets = sorted(
            c for c, sj in schemas_now.items() if _has_prior_names(sj)
        )
        if dry_run:
            report["normalize_renames"] = {"would_normalize": targets}
        else:
            if targets:
                compact_segments(
                    spark, root, components=targets, min_segments=1
                )
            report["normalize_renames"] = {"normalized": targets}

    # ---- 2) recluster waves
    rkw = policy.get("recluster")
    if not rkw:
        report["recluster"] = {"skipped": True}
    else:
        from ed_housing_data_pipeline_spark.operators import (  # noqa: PLC0415
            zcluster,
        )

        rrep: dict[str, dict] = {}
        for comp, kw in rkw.items():
            kind = kw.get("kind", "zorder")  # or "sorted": 1-D ORDER BY
            if dry_run:
                exprs = (
                    kw["exprs"] if kind == "zorder" else [kw["order_expr"]]
                )
                pkw = {
                    k: kw[k]
                    for k in (
                        "min_segments",
                        "max_segment_bytes",
                        "max_waves",
                        "force",
                    )
                    if k in kw
                }
                if kind == "sorted":
                    pkw["bits"] = "sort"
                elif "bits" in kw:
                    pkw["bits"] = kw["bits"]
                p = zcluster.plan_recluster(spark, root, comp, exprs, **pkw)
                rrep[comp] = {
                    "would_fold": p["fold"],
                    "level_merge": p["level_merge"],
                }
            else:
                before_c = set(segment_pins(spark, root).get(comp, []))
                verb = (
                    zcluster.recluster_zorder
                    if kind == "zorder"
                    else zcluster.recluster_sorted
                )
                pins = verb(
                    spark, root, comp,
                    **{k: v for k, v in kw.items() if k != "kind"},
                )
                rrep[comp] = {
                    "folded": sorted(before_c - set(pins.get(comp, []))),
                    "new_segments": sorted(set(pins.get(comp, [])) - before_c),
                }
        report["recluster"] = rrep

    # ---- 3) coverage repair (no sweep: retention is step 4)
    pkw = policy.get("repair", True)
    if pkw is False:
        report["repair"] = {"skipped": True}
    else:
        pkw = {} if pkw is True else dict(pkw)
        pkw["sweep_orphans"] = False
        report["repair"] = repair_segmented(spark, root, dry_run=dry_run, **pkw)

    # ---- 3b) retire inert legacy watermark keys (meta-only flip).
    # Bare pre-r13 ``cdf_watermark:<component>`` keys carry no source
    # identity: once ignored by migrated consumers they are junk, and
    # worse, a FIRST consume from a different source_root with the
    # same component names would silently adopt one and skip its own
    # bootstrap window (r14 ADVICE #5). Default ON; fleets still
    # mid-migration (a same-source consumer that has not run since
    # r13) pass ``{"retire_legacy_watermarks": False}`` until it has.
    if policy.get("retire_legacy_watermarks", True) is False:
        report["retire_legacy_watermarks"] = {"skipped": True}
    else:
        retired: list[str] = []
        for _attempt in range(3):
            st = _manifest_state(spark, root)
            meta_now, base_now = st[3], st[5]
            bare = sorted(
                k
                for k in meta_now
                if k.startswith("cdf_watermark:")
                and ":" not in k[len("cdf_watermark:"):]
            )
            if not bare:
                break
            if dry_run:
                report["retire_legacy_watermarks"] = {"would_retire": bare}
                break
            mkw: dict = {
                "meta": {k: v for k, v in meta_now.items() if k not in bare}
            }
            if st[1]:
                mkw["zones"] = st[1]
            if st[2]:
                mkw["blooms"] = st[2]
            if st[4]:
                mkw["schemas"] = st[4]
            if st[6]:
                mkw["counts"] = st[6]
            try:
                commit_segment_manifest(
                    spark, root, st[0], expected_base=base_now, **mkw
                )
                retired = bare
                break
            except ConcurrentCommitError:
                continue  # rival commit: re-read and retry the sweep
        if "retire_legacy_watermarks" not in report:
            report["retire_legacy_watermarks"] = {"retired": retired}

    # ---- 4) retention + orphan sweep
    ekw = policy.get("expire")
    if ekw is False or (ekw is None and "expire" in policy):
        report["expire"] = {"skipped": True}
    elif dry_run:
        # expire is grace-gated deletion; a dry cadence reports the
        # step as deferred rather than simulating mtimes
        report["expire"] = {"skipped": True, "reason": "dry_run"}
    else:
        report["expire"] = {
            "swept": expire_segments(spark, root, **(ekw or {}))
        }

    report["version"] = segment_pins_versioned(spark, root)[1]
    return report


def expire_segments(
    spark,
    root: str,
    keep_manifests: int = 2,
    orphan_grace_sec: float = 24 * 3600,
    reader_grace_sec: float | None = None,
) -> dict[str, list[int]]:
    """Retention for a segmented dataset: expire old manifest
    snapshots (normal snapshot retention), then sweep segment dirs no
    RETAINED manifest pins — but, as in expire_snapshots, only when
    provably stale (newest mtime among the ``_INTENT.s<N>`` marker and
    the segment dir older than the grace period), so a live writer's
    just-written not-yet-committed segments always survive. Pins of
    every retained manifest version (not just the committed one) are
    honored, so time travel across retained manifests stays readable.

    ``reader_grace_sec`` (default: ``orphan_grace_sec``) additionally
    retains committed-but-superseded manifests younger than it, so a
    concurrent reader's lazily-scanned pins are never swept from under
    it (see expire_snapshots' ``min_age_sec``). A frequent committer
    (the streaming sink) passes a small grace matched to its batch
    cadence to bound manifest accumulation."""
    root = root.rstrip("/")
    expire_snapshots(
        spark, f"{root}/manifest", keep_latest=keep_manifests,
        orphan_grace_sec=orphan_grace_sec,
        min_age_sec=(
            orphan_grace_sec if reader_grace_sec is None else reader_grace_sec
        ),
    )
    keep: dict[str, set[int]] = {}
    # (component, seg, col) bloom advertisements across ALL retained
    # manifests: a sidecar none of them advertises (rename/drop left it
    # for reader grace, or a crash orphaned it) is age-gated away even
    # when its segment is still pinned
    adv_blooms: dict[str, set[tuple[int, str]]] = {}
    for v in snapshot_versions(spark, f"{root}/manifest"):
        try:
            parsed = json.loads(read_snapshot_blob(spark, f"{root}/manifest", v))
        except Exception:  # noqa: BLE001 - torn/in-flight manifest dir
            continue
        for name, segs in parsed.items():
            if name.startswith("_"):  # manifest metadata (e.g. _zones)
                continue
            keep.setdefault(name, set()).update(int(s) for s in segs)
        for name, bm in parsed.get("_blooms", {}).items():
            adv_blooms.setdefault(name, set()).update(
                (int(s), c) for s, cols in bm.items() for c in cols
            )
    jvm, fs = _fs(spark, root)
    now_ms = time.time() * 1000.0
    dropped: dict[str, list[int]] = {}
    jroot = jvm.org.apache.hadoop.fs.Path(root)
    for st in _list_status(jvm, fs, jroot):
        name = st.getPath().getName()
        if not st.isDirectory() or name == "manifest":
            continue
        comp_root = f"{root}/{name}"
        present = set(segment_numbers(spark, comp_root))
        # dangling intent markers / bloom sidecars (claimed id or
        # sidecar written, crash before data or before the manifest
        # flip): no pin will ever arrive for that id — age-gate and
        # drop the file alone
        bloom_files: dict[int, list] = {}
        for cst in _list_status(jvm, fs, jvm.org.apache.hadoop.fs.Path(comp_root)):
            cname = cst.getPath().getName()
            if cst.isDirectory():
                # a crashed staged write (stage_segments) leaves its
                # _STAGE.<id> dir behind: never pinnable, so age-gate
                # on the newest mtime inside and drop it whole
                if cname.startswith("_STAGE."):
                    try:
                        best = float(cst.getModificationTime())
                        it = fs.listFiles(cst.getPath(), True)
                        while it.hasNext():
                            best = max(best, float(it.next().getModificationTime()))
                    except Exception:  # noqa: BLE001 - racer swept it
                        continue
                    if now_ms - best > orphan_grace_sec * 1000.0:
                        fs.delete(cst.getPath(), True)
                continue
            if cname.startswith("_BLOOM.s"):
                stem = cname[len("_BLOOM.s"):]
                try:
                    seg_str, rest = stem.split(".", 1)
                    iseg = int(seg_str)
                except ValueError:
                    continue
                bloom_files.setdefault(iseg, []).append(cst.getPath())
                col = rest[:-5] if rest.endswith(".json") else rest
                if (iseg, col) not in adv_blooms.get(name, set()):
                    # no retained manifest advertises this sidecar
                    # (rename/drop reader-grace leftover, or a crash
                    # before the flip): age-gate and drop the file
                    # alone, pinned segment or not
                    if (
                        now_ms - float(cst.getModificationTime())
                        > orphan_grace_sec * 1000.0
                    ):
                        fs.delete(cst.getPath(), False)
                    continue
            elif cname.startswith("_INTENT.s"):
                try:
                    iseg = int(cname[len("_INTENT.s"):])
                except ValueError:
                    continue
            else:
                continue
            if iseg in present or iseg in keep.get(name, set()):
                continue
            if now_ms - float(cst.getModificationTime()) > orphan_grace_sec * 1000.0:
                fs.delete(cst.getPath(), False)
        for seg in present:
            if seg in keep.get(name, set()):
                continue
            jint = jvm.org.apache.hadoop.fs.Path(f"{comp_root}/_INTENT.s{seg}")
            jseg = jvm.org.apache.hadoop.fs.Path(_segment_dir(comp_root, seg))
            try:
                marks = []
                if fs.exists(jint):
                    marks.append(
                        float(fs.getFileStatus(jint).getModificationTime())
                    )
                best = float(fs.getFileStatus(jseg).getModificationTime())
                it = fs.listFiles(jseg, True)
                while it.hasNext():
                    best = max(best, float(it.next().getModificationTime()))
                marks.append(best)
            except Exception:  # noqa: BLE001 - a concurrent sweeper got
                continue  # here first; the segment is already gone
            if now_ms - max(marks) > orphan_grace_sec * 1000.0:
                fs.delete(jseg, True)
                fs.delete(jint, False)
                for jb in bloom_files.get(seg, []):  # sidecars die with it
                    fs.delete(jb, False)
                dropped.setdefault(name, []).append(seg)
    return {name: sorted(segs) for name, segs in dropped.items()}


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    n_buckets: int,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED catalog table (hash-partitioned files by
    ``bucket_by``, optionally sorted within buckets).

    This is the co-located-join design for 100 TB fact tables: two
    tables bucketed on the same key with the same bucket count join
    WITHOUT any Exchange — the shuffle was paid once at write time and
    amortized over every subsequent join/agg on that key. Bucketing
    requires the catalog (saveAsTable), not a bare path.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)
