"""Mini transactional table format: manifest-listed atomic commits
with time travel — the composition of `sink_snapshot`'s atomic
publish and `sink_file_manifest`'s per-file metadata into one log
(round-9 VERDICT missing #1). Mirrors LSD's snapshot/commit
machinery [lsd:src/lsd/table.py snapshot logic — UNVERIFIED,
SURVEY.md §2 tables]: LSD publishes complete snapshot directories
and readers resolve a current pointer once; Delta/Iceberg generalize
that to an append-only commit LOG where version n is the union of
the file manifests of commits 1..n. This module implements the log:

- a table is `{path}/data/...parquet` files plus `{path}/_log/
  {version:020d}.json` commit entries, each listing exactly the data
  files that commit ADDS — plus, for COMPACTION commits (round-11,
  Delta OPTIMIZE analog), the files it removes from the visible set
  (`compacts`); plain appends mirror LSD's append-mostly snapshots;
- a commit writes its data files FIRST (invisible — no reader lists
  the data dir), then claims the next version number by O_CREAT|
  O_EXCL on the log entry: the filesystem's atomic create is the
  whole concurrency story. A loser gets FileExistsError, re-reads
  the log, and retries at the next version — optimistic concurrency,
  no locks, no torn reads. A writer that CRASHES between the data
  write and the log link leaves orphan files that no reader ever
  sees (test_table_log covers both races).
- `read_version(spark, path, n)` unions the manifests of commits
  1..n and hands Spark exactly that file list — time travel is just
  "stop reading the log at n". Reading the log is driver-side
  metadata work, |commits|-sized, like every table format's.

100 TB: data files never move or rewrite on commit (append = link
one JSON). The read path is CHECKPOINTED (round-10 VERDICT missing
#2): every CHECKPOINT_INTERVAL commits the winning writer also
writes `{version:020d}.checkpoint.json` — the full cumulative file
list at that version — and advances a `_last_checkpoint` pointer
(Delta's convention), so planning a version-n read opens one
checkpoint plus the <=K suffix entries instead of walking all n
commit files; a 10^5-commit table plans in O(K), not O(n).
Checkpoints are pure consolidation: crash between the commit link
and the checkpoint write (or a stale pointer) only costs readers a
longer walk, never correctness — the scan fallback and the
pointer-miss path are both tested. The parquet file list Spark
receives is the same partition-pruned scan any static dir read gets.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

LOG_DIR = "_log"
LAST_CHECKPOINT = "_last_checkpoint"
CHECKPOINT_INTERVAL = 10


def init_table(path: str) -> None:
    os.makedirs(os.path.join(path, LOG_DIR), exist_ok=True)
    os.makedirs(os.path.join(path, "data"), exist_ok=True)


def _entry_path(path: str, version: int) -> str:
    return os.path.join(path, LOG_DIR, f"{version:020d}.json")


def _ckpt_path(path: str, version: int) -> str:
    return os.path.join(path, LOG_DIR, f"{version:020d}.checkpoint.json")


def latest_version(path: str) -> int:
    log = os.path.join(path, LOG_DIR)
    versions = [
        int(f[:-5])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    ]
    return max(versions, default=0)


def checkpoint_versions(path: str) -> list[int]:
    """All published checkpoint versions, ascending (a dir scan —
    the fallback when the _last_checkpoint pointer is absent or
    points past the requested time-travel version)."""
    log = os.path.join(path, LOG_DIR)
    suffix = ".checkpoint.json"
    return sorted(
        int(f[: -len(suffix)])
        for f in os.listdir(log)
        if f.endswith(suffix) and f[: -len(suffix)].isdigit()
    )


def write_data_files(df: DataFrame, path: str, tag: str) -> list[str]:
    """Stage a commit's data files (parquet) under a commit-unique
    subdir. Staged files are INVISIBLE: readers only see files
    listed by a published log entry, so a crash after this step
    leaks space, never rows."""
    out = os.path.join(path, "data", tag)
    df.write.mode("errorifexists").parquet(out)
    return sorted(
        os.path.join(out, f)
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )


def try_commit(
    path: str,
    version: int,
    files: list[str],
    writer: str,
    compacts: list[str] | None = None,
) -> bool:
    """Publish `files` as commit `version`. Returns False if another
    writer already owns that version (the caller re-reads the log
    and retries at latest_version()+1). Atomicity: the content is
    written to a writer-private temp file and the version slot is
    claimed with os.link — an atomic create-if-absent on POSIX, so
    exactly one writer wins and no reader ever observes a partially
    written entry. `compacts` marks a COMPACTION commit: the listed
    files leave the visible set from this version on (they remain
    reachable via time travel to older versions until vacuumed)."""
    entry = {"version": version, "writer": writer, "files": files}
    if compacts:
        entry["compacts"] = compacts
    tmp = _entry_path(path, version) + f".{writer}.tmp"
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    try:
        os.link(tmp, _entry_path(path, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def commit(
    path: str,
    files: list[str],
    writer: str,
    checkpoint_interval: int | None = CHECKPOINT_INTERVAL,
    compacts: list[str] | None = None,
) -> int:
    """Optimistic-concurrency append: retry version claims until one
    sticks; returns the committed version. The winner of a version
    divisible by `checkpoint_interval` also consolidates the log into
    a checkpoint manifest (pass None/0 to disable)."""
    while True:
        v = latest_version(path) + 1
        if try_commit(path, v, files, writer, compacts=compacts):
            if checkpoint_interval and v % checkpoint_interval == 0:
                write_checkpoint(path, v, writer)
            return v


def compact(
    spark: SparkSession,
    path: str,
    writer: str = "compactor",
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """OPTIMIZE (Delta's compaction analog — the small-files answer):
    rewrite the CURRENT manifest's file set as one consolidated
    parquet set, then publish a compaction commit that adds the new
    files and marks the old ones compacted-away. Safe against
    concurrent appenders by construction: the manifest walk applies
    each entry's `compacts` removals entry-by-entry, so an append
    that lands between our snapshot read and our version claim keeps
    its files (we only remove the exact set we consolidated). Time
    travel to pre-compaction versions still resolves the original
    files until vacuum's retention window lets them go.

    Output sizing is Delta-style bin packing: ceil(total input bytes
    / target_file_bytes) files via coalesce (no shuffle — compaction
    is an IO rewrite, not a repartition)."""
    v = latest_version(path)
    old = manifest(path, v)
    total = sum(os.path.getsize(f) for f in old)
    n_out = max(1, -(-total // target_file_bytes))
    new = write_data_files(
        spark.read.parquet(*old).coalesce(n_out),
        path,
        f"compact-v{v}-{writer}",
    )
    return commit(path, new, writer, compacts=old)


def write_checkpoint(path: str, version: int, writer: str = "ckpt") -> None:
    """Consolidate commits 1..version into one manifest file and
    advance the _last_checkpoint pointer. Content is deterministic
    from the log, so concurrent checkpointers are benign; both files
    land via atomic rename (writer-private temp + os.replace), and
    the pointer only moves FORWARD — a racing older checkpointer can
    never roll it back. A crash anywhere in here costs readers a
    longer suffix walk, never a wrong file list."""
    files = manifest(path, version)
    tmp = _ckpt_path(path, version) + f".{writer}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": files}, fh)
    os.replace(tmp, _ckpt_path(path, version))
    ptr = os.path.join(path, LOG_DIR, LAST_CHECKPOINT)
    if _pointer_version(path) >= version:
        return  # a newer checkpoint already published the pointer
    tmp = ptr + f".{writer}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version}, fh)
    os.replace(tmp, ptr)


def _pointer_version(path: str) -> int:
    """_last_checkpoint's version, or 0 when absent/unreadable (the
    pointer is a hint: a missing or torn one falls back to the
    checkpoint dir scan, never an error)."""
    try:
        with open(os.path.join(path, LOG_DIR, LAST_CHECKPOINT)) as fh:
            return int(json.load(fh)["version"])
    except (OSError, ValueError, KeyError):
        return 0


def _best_checkpoint(path: str, version: int) -> int:
    """Largest published checkpoint <= version. Fast path: the
    _last_checkpoint pointer (one open, no listing — the object-store
    read pattern); dir-scan fallback for time travel to a version
    older than the pointer, or when the pointer is missing/stale."""
    c = _pointer_version(path)
    if 0 < c <= version and os.path.exists(_ckpt_path(path, c)):
        return c
    older = [v for v in checkpoint_versions(path) if v <= version]
    return max(older, default=0)


def _apply_entry(files: list[str], entry: dict) -> list[str]:
    """One log entry against a running file list: compaction removals
    first (an entry never compacts its own additions), then adds."""
    drop = set(entry.get("compacts", ()))
    if drop:
        files = [f for f in files if f not in drop]
    return files + list(entry["files"])


def manifest(path: str, version: int) -> list[str]:
    """All data files visible at `version` (commits 1..version, net
    of compaction removals): the best checkpoint <= version plus the
    suffix of per-commit entries after it — O(CHECKPOINT_INTERVAL)
    opens on a checkpointed table regardless of total commit count."""
    files: list[str] = []
    start = 1
    ck = _best_checkpoint(path, version)
    if ck:
        with open(_ckpt_path(path, ck)) as fh:
            files = list(json.load(fh)["files"])
        start = ck + 1
    for v in range(start, version + 1):
        with open(_entry_path(path, v)) as fh:
            files = _apply_entry(files, json.load(fh))
    return files


def vacuum(
    path: str,
    min_age_sec: float = 24 * 3600.0,
    keep_versions: int | None = None,
) -> tuple[list[str], int]:
    """Garbage-collect data files no reader can reach: files staged
    by crashed (or racing-then-retried) writers that no commit ever
    referenced, and — when `keep_versions` bounds time travel —
    files that only pre-retention versions resolve (compacted-away
    originals). With full history retention (the default) every
    committed file stays reachable via some version; compaction is
    what makes the retention knob meaningful. Returns (deleted
    paths, bytes freed).

    Safety mirrors Delta's VACUUM: the reachable set is computed
    FROM THE LOG (checkpoint + suffix walk over every retained
    version), never by trusting a directory listing, and
    `min_age_sec` (Delta's retention window) protects IN-FLIGHT
    commits — a writer stages files BEFORE linking its log entry, so
    a freshly staged, not-yet-committed file looks orphaned; only
    files older than the window may be deleted (production default:
    well past any plausible commit duration; tests pass 0 for
    determinism)."""
    latest = latest_version(path)
    lo = 1 if keep_versions is None else max(1, latest - keep_versions + 1)
    reachable: set[str] = set()
    for v in range(lo, latest + 1):
        reachable.update(manifest(path, v))
    data_root = os.path.join(path, "data")
    now = time.time()
    deleted, freed = [], 0
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            fp = os.path.join(dirpath, f)
            if (
                f.endswith(".parquet")
                and fp not in reachable
                and now - os.path.getmtime(fp) >= min_age_sec
            ):
                freed += os.path.getsize(fp)
                os.unlink(fp)
                deleted.append(fp)
    return sorted(deleted), freed


def manifest_full_walk(path: str, version: int) -> list[str]:
    """The pre-checkpoint read path (every commit entry opened) —
    kept as the equivalence oracle for checkpointed reads."""
    files: list[str] = []
    for v in range(1, version + 1):
        with open(_entry_path(path, v)) as fh:
            files = _apply_entry(files, json.load(fh))
    return files


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time-travel read: exactly the files committed by versions
    1..version, as one parquet scan."""
    files = manifest(path, version)
    if not files:
        raise ValueError(f"table at {path} has no commit <= {version}")
    return spark.read.parquet(*files)


def _version_agg_sql(pred: str, v: int) -> str:
    return (
        f"SELECT CAST({v} AS INT) AS version, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS cents "
        f"FROM orders WHERE {pred}"
    )


from pyspark.sql import functions as F  # noqa: E402

from lsd_spark.catalog import load  # noqa: E402
from lsd_spark.registry import register  # noqa: E402


@register(
    "sink_table_log",
    oracle=(
        _version_agg_sql("o_orderkey % 3 = 0", 1)
        + " UNION ALL "
        + _version_agg_sql("o_orderkey % 3 IN (0, 1)", 2)
        + " UNION ALL "
        + _version_agg_sql("TRUE", 3)
        + " ORDER BY version"
    ),
    cacheable=False,
)
def sink_table_log(spark, sf_dir):
    """End-to-end drive of the commit log: three commits (writer A
    twice, writer B once), one LOST RACE (A and B both target
    version 2; exactly one atomic create wins and B retries at 3),
    one CRASHED writer (files staged, log entry never published),
    then a TIME-TRAVEL read of every version. Returns per-version
    (row count, exact cents sum); the oracle recomputes each
    version's cumulative slice from the source table, so a row
    leaked by the orphan, dropped by the race, or double-counted by
    the retry breaks the hash."""
    import shutil
    import tempfile

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    sl = [o.filter(F.col("o_orderkey") % 3 == i) for i in (0, 1, 2)]
    base = tempfile.mkdtemp(prefix="lsd_tlog_")
    try:
        init_table(base)
        v1 = commit(base, write_data_files(sl[0], base, "a1"), "A")
        assert v1 == 1
        # the race: both writers stage, both observe latest=1 and
        # target version 2; A's atomic create wins, B must retry
        fa = write_data_files(sl[1], base, "a2")
        fb = write_data_files(sl[2], base, "b1")
        target = latest_version(base) + 1
        assert try_commit(base, target, fa, "A")
        assert not try_commit(base, target, fb, "B")  # lost the race
        vb = commit(base, fb, "B")  # re-reads the log, lands at 3
        assert vb == 3
        # crash simulation: staged data files with NO log entry —
        # must stay invisible to every read below
        write_data_files(sl[0], base, "crashed-writer")
        rows = []
        for v in (1, 2, 3):
            got = (
                read_version(spark, base, v)
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                    ).alias("cents"),
                )
                .first()
            )
            rows.append((v, got["n"], got["cents"]))
        return spark.createDataFrame(
            rows, "version int, n_rows bigint, cents bigint"
        ).orderBy("version")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@register(
    "sink_table_log_checkpoint",
    oracle=(
        _version_agg_sql("o_orderkey % 12 < 5", 5)
        + " UNION ALL "
        + _version_agg_sql("o_orderkey % 12 < 7", 7)
        + " UNION ALL "
        + _version_agg_sql("o_orderkey % 12 < 10", 10)
        + " UNION ALL "
        + _version_agg_sql("TRUE", 12)
        + " ORDER BY version"
    ),
    cacheable=False,
)
def sink_table_log_checkpoint(spark, sf_dir):
    """Checkpointed log planning (round-10 VERDICT missing #2,
    mirroring Delta's _last_checkpoint over LSD's snapshot-dir
    consolidation): 12 commits at CHECKPOINT_INTERVAL=5 publish
    checkpoint manifests at versions 5 and 10 plus the pointer; the
    op asserts checkpointed manifests match the full log walk at
    every read version, then DELETES commit entries 1..10 and
    re-reads versions 10 and 12 — proving the planner runs off the
    checkpoint + suffix, not the walked-over entries. Returns
    per-version (rows, exact cents); the oracle recomputes each
    cumulative slice from the source table."""
    import shutil
    import tempfile

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = tempfile.mkdtemp(prefix="lsd_tlogck_")

    def agg(v: int):
        got = (
            read_version(spark, base, v)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                ).alias("cents"),
            )
            .first()
        )
        return (v, got["n"], got["cents"])

    try:
        init_table(base)
        for i in range(12):
            fs = write_data_files(
                o.filter(F.col("o_orderkey") % 12 == i), base, f"c{i:02d}"
            )
            commit(base, fs, "A", checkpoint_interval=5)
        assert checkpoint_versions(base) == [5, 10]
        assert _pointer_version(base) == 10
        for v in (5, 7, 10, 12):
            assert manifest(base, v) == manifest_full_walk(base, v)
        rows = [agg(5), agg(7)]
        for v in range(1, 11):  # checkpoint 10 covers these entries
            os.unlink(_entry_path(base, v))
        rows += [agg(10), agg(12)]
        return spark.createDataFrame(
            rows, "version int, n_rows bigint, cents bigint"
        ).orderBy("version")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _vacuum_version_sql(pred: str, v: int) -> str:
    return (
        f"SELECT CAST({v} AS INT) AS version, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS cents, "
        "CAST(0 AS INT) AS age_guarded_deletes, "
        "CAST(2 AS INT) AS orphans_deleted "
        f"FROM orders WHERE {pred}"
    )


@register(
    "sink_table_log_vacuum",
    oracle=(
        _vacuum_version_sql("o_orderkey % 3 = 0", 1)
        + " UNION ALL "
        + _vacuum_version_sql("o_orderkey % 3 IN (0, 1)", 2)
        + " UNION ALL "
        + _vacuum_version_sql("TRUE", 3)
        + " ORDER BY version"
    ),
    cacheable=False,
)
def sink_table_log_vacuum(spark, sf_dir):
    """VACUUM for the commit-log table (Delta's GC analog over LSD's
    snapshot dirs): crashed writers leave staged-but-never-committed
    parquet files that no manifest references — invisible to readers
    but real storage. The op commits three slices, stages TWO orphan
    writers, then (a) vacuums with the production retention window —
    the just-staged orphans are younger than the window, so ZERO
    deletions (the in-flight-commit guard, age_guarded_deletes), and
    (b) vacuums with min_age_sec=0 — exactly the two orphan file
    sets go, committed files stay, and every version's time-travel
    read still matches the oracle's cumulative slices afterwards. A
    vacuum that trusted a directory listing, ignored the checkpoint
    walk, or deleted a reachable file breaks the hash."""
    import shutil
    import tempfile

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = tempfile.mkdtemp(prefix="lsd_tlvac_")
    try:
        init_table(base)
        for i in range(3):
            commit(
                base,
                write_data_files(
                    o.filter(F.col("o_orderkey") % 3 == i), base, f"c{i}"
                ),
                "A",
            )
        # two crashed writers: staged, never published
        write_data_files(o.limit(7), base, "crash-1")
        write_data_files(o.limit(3), base, "crash-2")
        guarded, _ = vacuum(base)  # production window: orphans too young
        deleted, freed = vacuum(base, min_age_sec=0.0)
        dirs = {p.split("/data/")[1].split("/")[0] for p in deleted}
        assert dirs == {"crash-1", "crash-2"} and freed > 0, (dirs, freed)
        rows = []
        for v in (1, 2, 3):
            got = (
                read_version(spark, base, v)
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                    ).alias("cents"),
                )
                .first()
            )
            rows.append((v, got["n"], got["cents"], len(guarded), len(dirs)))
        return spark.createDataFrame(
            rows,
            "version int, n_rows bigint, cents bigint, "
            "age_guarded_deletes int, orphans_deleted int",
        ).orderBy("version")
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _compact_version_sql(pred: str, v: int) -> str:
    return (
        f"SELECT CAST({v} AS INT) AS version, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) "
        "AS BIGINT) AS cents, "
        "TRUE AS files_shrunk, TRUE AS gc_pruned_history "
        f"FROM orders WHERE {pred}"
    )


@register(
    "sink_table_log_compact",
    oracle=(
        _compact_version_sql("o_orderkey % 4 IN (0, 1)", 2)
        + " UNION ALL "
        + _compact_version_sql("o_orderkey % 4 IN (0, 1, 2)", 3)
        + " UNION ALL "
        + _compact_version_sql("o_orderkey % 4 IN (0, 1, 2)", 4)
        + " UNION ALL "
        + _compact_version_sql("TRUE", 5)
        + " ORDER BY version"
    ),
    cacheable=False,
)
def sink_table_log_compact(spark, sf_dir):
    """COMPACTION commits (Delta OPTIMIZE over the commit log — the
    small-files answer at 100 TB, where a month of small appends
    otherwise turns every scan into a million-file listing): three
    appends, then `compact` rewrites the live set as one consolidated
    commit (v4, same rows by construction), then a post-compaction
    append (v5). Verified: v2/v3 time travel still resolves the
    ORIGINAL files, v4 reproduces v3's rows through the consolidated
    set, v5 = consolidated + the new append, the live manifest
    genuinely shrank, and vacuum(keep_versions=2) then deletes
    exactly the compacted-away originals — after which pre-compaction
    history is pruned (v3 unreadable, documented retention semantics)
    while v4/v5 re-verify byte-identical. A compaction that lost or
    duplicated a row, dropped a concurrent append's files, or a
    vacuum that trusted a listing breaks the hash."""
    import shutil
    import tempfile

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    base = tempfile.mkdtemp(prefix="lsd_tlcomp_")

    def agg(v):
        got = (
            read_version(spark, base, v)
            .agg(
                F.count("*").cast("long").alias("n"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
                ).alias("cents"),
            )
            .first()
        )
        return (got["n"], got["cents"])

    try:
        init_table(base)
        for i in range(3):
            commit(
                base,
                write_data_files(
                    o.filter(F.col("o_orderkey") % 4 == i), base, f"c{i}"
                ),
                "A",
            )
        pre_files = manifest(base, 3)
        assert compact(spark, base) == 4
        commit(
            base,
            write_data_files(
                o.filter(F.col("o_orderkey") % 4 == 3), base, "c3"
            ),
            "A",
        )
        files_shrunk = len(manifest(base, 4)) < len(pre_files)
        r2, r3, r4 = agg(2), agg(3), agg(4)
        assert r4 == r3  # compaction preserves the live rows
        # retention-bounded GC: originals only v1..v3 can see go away
        deleted, freed = vacuum(base, min_age_sec=0.0, keep_versions=2)
        assert set(deleted) == set(pre_files) and freed > 0
        pruned = False
        try:
            agg(3)  # pre-compaction history is gone past retention
        except Exception:
            pruned = True
        r4b, r5 = agg(4), agg(5)
        assert r4b == r4  # survivors re-verify after the GC
        rows = [
            (2, *r2, bool(files_shrunk), pruned),
            (3, *r3, bool(files_shrunk), pruned),
            (4, *r4b, bool(files_shrunk), pruned),
            (5, *r5, bool(files_shrunk), pruned),
        ]
        return spark.createDataFrame(
            rows,
            "version int, n_rows bigint, cents bigint, "
            "files_shrunk boolean, gc_pruned_history boolean",
        ).orderBy("version")
    finally:
        shutil.rmtree(base, ignore_errors=True)
