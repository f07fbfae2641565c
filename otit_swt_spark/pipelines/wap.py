"""Write-audit-publish (WAP) versioned tables: snapshot isolation over
plain parquet, the sandbox analog of an ACID table format (no Delta /
Iceberg jars in this environment — reference parity note: the reference
mutates its stores in place and offers no snapshot isolation at all).

Layout (all paths scheme-agnostic via the Hadoop FileSystem API):

    root/
      _manifests/m00001.json        one immutable manifest per version
      data/v1-<tok>/...             write-once physical data dirs; <tok> is
      data/v2-<tok>/<pcol>=<val>/   a per-WRITER random token, so two
                                    writers racing to the same version
                                    number never share a staging directory
                                    (and a loser's cleanup can only ever
                                    delete its own files)

A manifest maps each logical partition to the physical directory holding
its CURRENT rows. Data dirs are write-once: a merge writes NEW dirs for
only the partitions it touches and the next manifest points untouched
partitions at their existing dirs — a 1-partition change against a
100 TB table stages one partition's worth of files and never rewrites
(or even lists) the rest; readers get manifest-level partition pruning
without touching the filesystem of unselected partitions.

The publish step is a two-phase single-winner protocol. Phase 1 CLAIMS
the version slot by atomically creating ``.claim.m<next>`` —
``O_CREAT|O_EXCL`` via ``java.io.File.createNewFile`` on local FS,
NameNode-atomic create on HDFS (:func:`fsutil.create_exclusive`); exactly
one racing writer wins, every loser gets :class:`ConcurrentWriteError`
immediately and deletes only its own token-named data directory. Phase 2
(winner only) stages the manifest to a writer-unique temp name and
renames it into ``m<next>.json``; because losers never reach the rename,
the local-FS replacing-rename TOCTOU (two writers each reading back
their own token and both reporting success) cannot occur. A read-back
token check remains as defense in depth. Crash behavior: a crash before
the claim leaves only orphan staged files; a crash BETWEEN claim and
rename wedges that one version number (claim present, manifest absent) —
the current version stays fully readable, and :func:`repair` recovers the
slot by deleting claims above the current version whose manifest never
appeared, after a staleness check (``vacuum`` separately collects spent
claims at or below the published version). A writer that fails — rather
than crashes — after winning the claim releases it on the way out. On S3-like stores
without atomic create, pair the claim with an external lock service,
exactly as Delta/Iceberg do.

The optional ``audit`` callable sees the complete next-version DataFrame
BEFORE publish — row-count expectations, constraint checks — and any
exception aborts with the staged data cleaned up.
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from otit_swt_spark import fsutil
from otit_swt_spark.pipelines.merge import apply_changes

#: manifest key for the single physical dir of an unpartitioned table
_ALL = "__all__"


class ConcurrentWriteError(RuntimeError):
    """Another writer published the next version first; retry from the
    new current version."""


class AuditError(RuntimeError):
    """The audit callable rejected the staged version; nothing published."""


#: manifest key for a NULL partition value (Spark's own directory sentinel)
_NULL_PART = "__HIVE_DEFAULT_PARTITION__"


def _part_key(value) -> str:
    """Canonical manifest key for a partition value (NULL-safe), in
    SPARK's rendering: booleans lowercase — manifest keys come from
    unescaped directory names ('true'), and Python str(True) ('True')
    would silently miss them (merge replaced instead of merging, reads
    pruned to empty)."""
    if value is None:
        return _NULL_PART
    if value is True:
        return "true"
    if value is False:
        return "false"
    return str(value)


def _unescape_dir(name: str) -> str:
    """Reverse Spark/Hive's %XX directory-name escaping so manifest keys
    are the partition VALUES, matching what ``str(row[pcol])`` yields —
    a value like ``10:00`` writes dir ``p=10%3A00`` and must still be
    addressable as ``'10:00'``."""
    return re.sub(r"%([0-9A-Fa-f]{2})",
                  lambda m: chr(int(m.group(1), 16)), name)


def _mdir(root: str) -> str:
    return f"{root.rstrip('/')}/_manifests"


def _mpath(root: str, version: int) -> str:
    return f"{_mdir(root)}/m{version:05d}.json"


def current_version(spark: SparkSession, root: str) -> int:
    """Highest published manifest number (0 = not a WAP table yet)."""
    names = fsutil.listdir(spark, _mdir(root))
    versions = [int(n[1:-5]) for n in names
                if re.fullmatch(r"m\d+\.json", n)]
    return max(versions, default=0)


def _load_manifest(spark: SparkSession, root: str, version: int) -> dict:
    return json.loads(fsutil.read_text(spark, _mpath(root, version)))


def _claim_path(root: str, version: int) -> str:
    return f"{_mdir(root)}/.claim.m{version:05d}"


def _publish_manifest(spark: SparkSession, root: str, manifest: dict) -> None:
    """Single-winner publish: atomically CLAIM the version slot with an
    exclusive-create lock file (``O_CREAT|O_EXCL`` on local FS, NameNode
    create on HDFS — :func:`fsutil.create_exclusive`), then stage the
    manifest to a writer-unique temp name and rename it into the slot.
    Only the claim winner ever attempts the rename, which closes the
    local-FS TOCTOU where Hadoop's replacing rename let two writers each
    read back their own token and BOTH report success. The read-back
    token check stays as defense in depth."""
    version, token = manifest["version"], manifest["writer"]
    if not fsutil.create_exclusive(spark, _claim_path(root, version)):
        raise ConcurrentWriteError(
            f"version {version} was claimed by another writer")
    # Phase 2 failures must release the OWNED claim: vacuum only removes
    # claims <= current version, so a claim left at current+1 after a
    # failed write/rename would wedge every future publish of that slot
    # (ConcurrentWriteError forever, with only manual fs surgery).
    # Process-crash between claim and rename still leaves a stale claim —
    # that path is repair()'s job; this handles every raising failure.
    try:
        tmp = f"{_mdir(root)}/.m{version:05d}.{token}.staged"
        fsutil.write_text(spark, tmp, json.dumps(manifest))
        if not fsutil.rename(spark, tmp, _mpath(root, version)):
            fsutil.delete(spark, tmp)
            raise ConcurrentWriteError(
                f"version {version} was published by another writer")
        published = _load_manifest(spark, root, version)
        if published.get("writer") != token:
            raise ConcurrentWriteError(
                f"version {version} was published by another writer "
                f"(lost the rename race)")
    except BaseException:
        # release only if OUR manifest is not the published one — if the
        # rename succeeded and a later step failed, the slot is settled
        # and the claim is spent (vacuum will collect it)
        if not fsutil.exists(spark, _mpath(root, version)):
            fsutil.delete(spark, _claim_path(root, version))
        raise


def _write_version_data(spark: SparkSession, root: str, frame: DataFrame,
                        version: int, partition_col: str | None,
                        token: str) -> dict[str, str]:
    """Write ``frame`` under the WRITER-UNIQUE data/v<version>-<token> dir
    and return manifest entries (partition value -> physical dir, relative
    to root). The token keeps two racing writers' staged files disjoint,
    so the race loser's cleanup can never touch the winner's data. Keys
    are un-escaped partition VALUES (NULL -> the Hive sentinel), so
    values containing %/:-style characters stay addressable."""
    rel = f"data/v{version}-{token}"
    out = f"{root.rstrip('/')}/{rel}"
    if partition_col is None:
        frame.write.mode("overwrite").parquet(out)
        return {_ALL: rel}
    frame.write.mode("overwrite").partitionBy(partition_col).parquet(out)
    return {_unescape_dir(n.split("=", 1)[1]): f"{rel}/{n}"
            for n in fsutil.listdir(spark, out)
            if n.startswith(f"{partition_col}=")}


def _read_entries(spark: SparkSession, root: str, entries: dict[str, str],
                  partition_col: str | None) -> DataFrame:
    """Assemble the table from manifest entries. Partition dirs written by
    the same version share a basePath read (restores the partition column
    from the dir name); dirs from different versions are unioned by name —
    the number of distinct version dirs is bounded by merges since the
    last full rewrite, not by partition count."""
    r = root.rstrip("/")
    if partition_col is None:
        return spark.read.parquet(f"{r}/{entries[_ALL]}")
    by_base: dict[str, list[str]] = {}
    for rel in entries.values():
        base = rel.rsplit("/", 1)[0]
        by_base.setdefault(base, []).append(f"{r}/{rel}")
    parts = [spark.read.option("basePath", f"{r}/{base}").parquet(*paths)
             for base, paths in sorted(by_base.items())]
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def init_table(spark: SparkSession, root: str, df: DataFrame,
               partition_col: str | None = None) -> int:
    """Create version 1. Returns the published version number."""
    if current_version(spark, root) != 0:
        raise ValueError(f"{root} is already a WAP table")
    token = uuid.uuid4().hex[:8]
    entries = _write_version_data(spark, root, df, 1, partition_col, token)
    _publish_manifest(spark, root, {
        "version": 1, "partition_col": partition_col, "entries": entries,
        "writer": token})
    return 1


def read_table(spark: SparkSession, root: str,
               partitions: list | None = None,
               version: int | None = None) -> DataFrame:
    """Read a table version (default: current). ``partitions`` selects
    entries at the MANIFEST, so unselected partitions cost zero filesystem
    calls — pruning without a directory listing. Time travel: pass any
    still-vacuumed ``version``."""
    v = version or current_version(spark, root)
    if v == 0:
        raise FileNotFoundError(f"{root} has no published versions")
    m = _load_manifest(spark, root, v)
    entries = m["entries"]
    if partitions is not None:
        want = {_part_key(p) for p in partitions}
        entries = {k: rel for k, rel in entries.items() if k in want}
        if not entries:
            empty = read_table(spark, root, version=v)
            return empty.filter(F.lit(False))
    return _read_entries(spark, root, entries, m["partition_col"])


def publish(spark: SparkSession, root: str, frame: DataFrame,
            audit: Callable[[DataFrame], None] | None = None) -> int:
    """Full-table WAP replace: stage ``frame`` as the next version, audit
    the staged files, publish atomically. On audit failure or publish race
    the staged data is deleted and the current version is untouched."""
    base = current_version(spark, root)
    if base == 0:
        raise FileNotFoundError(f"{root} has no published versions")
    m = _load_manifest(spark, root, base)
    nxt = base + 1
    token = uuid.uuid4().hex[:8]
    entries = _write_version_data(spark, root, frame, nxt,
                                  m["partition_col"], token)
    staged = _read_entries(spark, root, entries, m["partition_col"])
    try:
        if audit is not None:
            audit(staged)
        _publish_manifest(spark, root, {
            "version": nxt, "partition_col": m["partition_col"],
            "entries": entries, "writer": token})
    except Exception:
        # only OUR token-named staging dir — never a racing winner's data
        fsutil.delete(spark, f"{root.rstrip('/')}/data/v{nxt}-{token}")
        raise
    return nxt


def merge_upsert(spark: SparkSession, root: str, changes: DataFrame,
                 key: str, deleted_col: str | None = None,
                 audit: Callable[[DataFrame], None] | None = None) -> int:
    """WAP keyed merge (same CDC contract as ``pipelines.merge``): for a
    partitioned table only the partitions in the change batch are read and
    restaged — untouched partitions' physical dirs carry over into the
    next manifest unread and byte-identical. The audit callable sees the
    COMPLETE next version (staged new dirs unioned with carried-over
    refs). Returns the published version."""
    base = current_version(spark, root)
    if base == 0:
        raise FileNotFoundError(f"{root} has no published versions")
    m = _load_manifest(spark, root, base)
    pcol, nxt = m["partition_col"], base + 1
    if pcol is None:
        merged = apply_changes(read_table(spark, root), changes, key,
                               deleted_col)
        return publish(spark, root, merged, audit)
    parts = [_part_key(r[0]) for r in changes.select(pcol).distinct().collect()]
    target = read_table(spark, root, partitions=parts)
    merged = apply_changes(target, changes, key, deleted_col)
    token = uuid.uuid4().hex[:8]
    new_entries = _write_version_data(spark, root, merged, nxt, pcol, token)
    # carry untouched partitions over by reference; a touched partition
    # with no surviving rows simply drops out of the manifest
    entries = {k: rel for k, rel in m["entries"].items() if k not in parts}
    entries.update(new_entries)
    staged_full = _read_entries(spark, root, entries, pcol)
    try:
        if audit is not None:
            audit(staged_full)
        _publish_manifest(spark, root, {
            "version": nxt, "partition_col": pcol, "entries": entries,
            "writer": token})
    except Exception:
        # only OUR token-named staging dir — never a racing winner's data
        fsutil.delete(spark, f"{root.rstrip('/')}/data/v{nxt}-{token}")
        raise
    return nxt


def compact(spark: SparkSession, root: str,
            partitions: list | None = None,
            target_files_per_partition: int = 1) -> int:
    """Small-file compaction: rewrite the named partitions (default: the
    partitions whose dirs hold more than ``target_files_per_partition``
    data files) coalesced to the target file count, and publish the
    result as a new CONTENT-IDENTICAL version. The small-files problem is
    the chronic failure mode of long-lived merge-heavy tables at 100 TB —
    every merge adds files, scan task counts balloon — and compaction
    through the same two-phase publish keeps snapshot isolation: readers
    of the old version keep their files (``vacuum`` reclaims them later),
    and a concurrent merge racing the compaction loses cleanly at the
    claim.

    Returns the new version, or the CURRENT version unchanged if nothing
    needed compaction (no empty no-op versions)."""
    base = current_version(spark, root)
    if base == 0:
        raise FileNotFoundError(f"{root} has no published versions")
    m = _load_manifest(spark, root, base)
    pcol, r = m["partition_col"], root.rstrip("/")

    def n_files(rel: str) -> int:
        return sum(1 for f in fsutil.listdir(spark, f"{r}/{rel}")
                   if f.endswith(".parquet"))

    if partitions is not None:
        todo = [_part_key(p) for p in partitions if _part_key(p) in m["entries"]]
    else:
        todo = [k for k, rel in m["entries"].items()
                if n_files(rel) > target_files_per_partition]
    if not todo:
        return base
    nxt = base + 1
    token = uuid.uuid4().hex[:8]
    compacted = _read_entries(
        spark, root, {k: m["entries"][k] for k in todo}, pcol)
    if pcol is None:
        compacted = compacted.coalesce(max(1, target_files_per_partition))
    else:
        # hash-repartition on the partition column: each value lands in
        # exactly one task, so each rewritten dir gets one file (times the
        # target multiplier)
        compacted = compacted.repartition(
            max(1, target_files_per_partition * len(todo)), F.col(pcol))
    new_entries = _write_version_data(spark, root, compacted, nxt, pcol, token)
    entries = {k: rel for k, rel in m["entries"].items() if k not in todo}
    entries.update(new_entries)
    try:
        _publish_manifest(spark, root, {
            "version": nxt, "partition_col": pcol, "entries": entries,
            "writer": token})
    except Exception:
        fsutil.delete(spark, f"{r}/data/v{nxt}-{token}")
        raise
    return nxt


def vacuum(spark: SparkSession, root: str, keep_last: int = 2) -> list[str]:
    """Drop manifests older than the last ``keep_last`` versions and any
    physical dir no kept manifest references. Returns deleted paths."""
    cur = current_version(spark, root)
    keep_versions = [v for v in range(max(1, cur - keep_last + 1), cur + 1)
                     if fsutil.exists(spark, _mpath(root, v))]
    referenced = set()
    for v in keep_versions:
        for rel in _load_manifest(spark, root, v)["entries"].values():
            referenced.add(rel.split("/")[1])  # data/<vdir>[/part]
    r = root.rstrip("/")
    deleted = []
    for d in fsutil.listdir(spark, f"{r}/data"):
        if d in referenced:
            continue
        # live-writer guard: a publish in flight stages data/v<n>-<tok>
        # with n > cur BEFORE claiming its slot; deleting it would let
        # the writer publish a manifest over vanished files. Dirs at
        # n > cur are spared (if that writer loses the slot race its
        # rename fails and a later vacuum, with cur advanced, reaps the
        # dir safely).
        m = re.match(r"v(\d+)-", d)
        if m and int(m.group(1)) > cur:
            continue
        fsutil.delete(spark, f"{r}/data/{d}")
        deleted.append(f"{r}/data/{d}")
    for v in range(1, max(1, cur - keep_last + 1)):
        p = _mpath(root, v)
        if fsutil.exists(spark, p):
            fsutil.delete(spark, p)
            deleted.append(p)
    # claim files for settled slots (<= current version) are spent: the
    # rename-refuses-existing check still rejects any late writer there.
    # Claims ABOVE cur may be a live writer mid-publish — never touched.
    for v in range(1, cur + 1):
        c = _claim_path(root, v)
        if fsutil.exists(spark, c):
            fsutil.delete(spark, c)
            deleted.append(c)
    return deleted


def repair(spark: SparkSession, root: str,
           min_age_ms: int = 15 * 60 * 1000) -> list[str]:
    """Recover a table wedged by a writer that CRASHED between claiming a
    version slot and renaming its manifest in (claim present above the
    current version, manifest absent): delete such claims once they are
    at least ``min_age_ms`` old. The staleness check is what keeps this
    safe to run while writers are live — a writer's claim-to-rename gap
    is one small-file write plus one rename, so a claim minutes old with
    no manifest belongs to a dead writer, not a slow one. Returns the
    deleted claim paths; publish of those slots works again afterwards.
    (``vacuum`` cannot do this: it only collects claims AT OR BELOW the
    published version, because a claim above it may be a live publish.)"""
    import time

    deleted = []
    cur = current_version(spark, root)
    for name in fsutil.listdir(spark, _mdir(root)):
        m = re.fullmatch(r"\.claim\.m(\d{5,})", name)
        if not m:
            continue
        v = int(m.group(1))
        c = _claim_path(root, v)
        if v <= cur or fsutil.exists(spark, _mpath(root, v)):
            continue  # settled slot (vacuum's job) or publish completed
        age = int(time.time() * 1000) - fsutil.modification_time_ms(spark, c)
        if age >= min_age_ms:
            fsutil.delete(spark, c)
            deleted.append(c)
    return deleted


def table_diff(spark: SparkSession, root: str, v_from: int, v_to: int,
               key: str) -> DataFrame:
    """Change data feed between two published versions (the Delta-CDF
    analog): one row per changed key with ``change_type`` in
    ``insert`` / ``delete`` / ``update``. Computed as a keyed full-outer
    join between the two version snapshots comparing an md5 digest of all
    non-key columns — works for any schema without enumerating columns.
    The digest hashes ``to_json(struct(...))``, which is injective over
    field boundaries and NULL-distinguishing (a delimiter-joined concat
    would collide NULL with its sentinel string and let embedded
    delimiters shift field boundaries). Both sides read through the
    manifests, so partition carry-over means untouched partitions diff as
    byte-identical digests (they ARE the same files)."""
    a = read_table(spark, root, version=v_from)
    b = read_table(spark, root, version=v_to)
    # UNION of both schemas: a column added (or dropped) between the
    # versions is itself a change — hashing v_from's columns only
    # missed updates that touched new columns and crashed on dropped
    # ones. A side lacking a column contributes NULL for it.
    cols = sorted({*a.columns, *b.columns} - {key})

    def digest(df: DataFrame) -> DataFrame:
        d = F.md5(F.to_json(F.struct(*[
            (F.col(c) if c in df.columns
             else F.lit(None)).alias(c) for c in cols])))
        return df.select(F.col(key), d.alias("__d"))

    da = digest(a).withColumnRenamed("__d", "__da")
    db = digest(b).withColumnRenamed("__d", "__db")
    joined = da.join(db, key, "full_outer")
    return (joined.select(
        key,
        F.when(F.col("__da").isNull(), F.lit("insert"))
         .when(F.col("__db").isNull(), F.lit("delete"))
         .when(F.col("__da") != F.col("__db"), F.lit("update"))
         .alias("change_type"))
        .filter(F.col("change_type").isNotNull()))
