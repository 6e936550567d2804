"""Keyed MERGE (upsert/delete) into a partitioned parquet table — the lake
equivalent of the reference's per-record Redshift INSERTs (`app/mapper.js:284`
fires INSERT per feature row; a lake table needs idempotent upsert instead,
because replays and corrections REWRITE keys rather than append duplicates).

Plain parquet has no row-level MERGE, so the operator makes the classic
trade explicit: partition the table by a stable hash-bucket of the key, and
a merge rewrites ONLY the buckets the changeset touches — cost scales with
|changeset| x (table_size / n_buckets), never the whole table. That is the
same touched-partition contract as `incremental.update_rollup` (day
partitions) generalized to arbitrary keys, and the precursor of what table
formats (Delta/Iceberg/Hudi) do with file-level instead of bucket-level
granularity.

Crash safety (VERDICT r7 item 4): the merged buckets are STAGED to a sibling
directory first, then swapped in via a journaled rename sequence — the
table's live directory is never written in place, so there is no
mid-overwrite mixed-generation window and no separate delete step for
emptied buckets:

1. stage: write every touched bucket's merged rows (possibly none, when the
   bucket's every key was deleted) to `_<name>.merge-<uuid>/_bucket=N/`,
   then fsync every staged file and directory entry (durability of the DATA
   the journal will point at, not just of the journal).
2. journal: write `<path>/_merge.journal` (fsync'd tmp + atomic rename)
   recording the merge id, staging dir, touched buckets, which of them had
   a pre-existing live dir, and a {staged file: size} manifest. The
   `_`-prefixed name carries no `=`, so Spark's file index ignores it.
   Recovery VALIDATES the manifest before rolling forward; a torn staged
   file rolls the merge BACK to the complete old generation instead.
3. swap, per touched bucket: rename the live `_bucket=N` out to
   `_merge-old-N` (invisible to readers — no `=`), then rename the staged
   `_bucket=N` in (absent for emptied buckets, which thereby disappear with
   no rmtree-while-live window).
4. delete the journal, then remove the old dirs and the staging dir.

A crash before step 2 leaves the table untouched (orphan staging dirs are
invisible and swept by the next merge). A crash after step 2 is rolled
FORWARD — `merge_into` and `read_table` both complete the swap from the
journal before doing anything else (every step is an idempotent
presence-checked rename, and the journal is only written once the staged
data is complete) — so a reader sees the complete old generation or the
complete new one, never a mix and never a bucket half-rewritten in place.
Concurrent readers mid-swap must still be fenced by the caller's scheduler,
exactly as `compaction.compact_dataset` documents; the journal closes the
crash-consistency gap, a metadata-pointer table format is the upgrade path
for lock-free readers.

Semantics per key in the changeset: upsert row (last-wins within a batch by
`seq_col`) replaces the existing row or inserts; a row with `_deleted=true`
removes the key. Keys outside the changeset are byte-stable (their buckets
are not rewritten)."""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_JOURNAL = "_merge.journal"


def bucket_of(key_col, n_buckets: int):
    """Stable bucket id: non-negative xxhash64 mod n_buckets. Pure row
    function — append/repartition-stable, engine-recomputable."""
    return F.pmod(F.xxhash64(key_col.cast("string")), F.lit(n_buckets))


def _staged_buckets(staging: str) -> set[int]:
    try:
        return {
            int(d.split("=", 1)[1])
            for d in os.listdir(staging)
            if d.startswith("_bucket=")
        }
    except OSError:
        return set()


def _staged_files(staging: str) -> dict[str, int]:
    """{relative path: size} for every file under the staging dir — the
    manifest the journal records so recovery can tell durable staging from
    staging torn by a power loss (sizes catch truncation; the staged files
    are also fsync'd before the journal lands, so an intact journal implies
    intact staging on a well-behaved filesystem — the manifest is the check
    for filesystems that reorder data vs. metadata anyway)."""
    out = {}
    for root, _dirs, files in os.walk(staging):
        for fn in files:
            p = os.path.join(root, fn)
            out[os.path.relpath(p, staging)] = os.path.getsize(p)
    return out


def _fsync_tree(staging: str) -> None:
    """fsync every staged file and every directory entry under (and
    including) the staging dir, so the journal's roll-forward promise is
    backed by durable data — journal fsync alone orders the JOURNAL, not the
    parquet it points at (ADVICE r8: intact journal + torn staging rolled
    forward would install a truncated bucket as the new generation)."""
    for root, dirs, files in os.walk(staging, topdown=False):
        for fn in files:
            fd = os.open(os.path.join(root, fn), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        fd = os.open(root, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)


def _validate_staging(path: str, journal: dict) -> bool:
    """True iff every journaled staged file that is STILL in the staging dir
    has its recorded size. Files already swapped into the table (their
    bucket dir was renamed out of staging by a prior recovery attempt) are
    exempt — but ONLY with corroboration that a swap actually installed
    them: the live `_bucket=N` must contain that manifest file at its
    recorded size (parquet part names embed task UUIDs, so an old-generation
    bucket can never alias a staged file). Without the corroboration, a
    power loss that dropped the staging bucket's dir entry BEFORE any swap
    rename — the exact data-vs-metadata reorder class this manifest exists
    to catch — would validate, roll forward, and leave that bucket at the
    old generation while installing the others: a silent mixed-generation
    table (ADVICE r9). A journal without a manifest (written by a
    pre-manifest version) validates trivially."""
    manifest = journal.get("files")
    if manifest is None:
        return True
    staging = journal["staging"]
    # The staging dir itself must exist while the journal does: _apply_swap
    # renames bucket dirs OUT of it but the dir (and its committer metadata)
    # survives until _finish_merge, which deletes the journal FIRST. A
    # journal over a vanished staging dir is the power-loss anomaly the
    # parent-entry fsync prevents — treat it as torn (roll back), never as
    # 'every bucket already swapped in'.
    if not os.path.isdir(staging):
        return False
    for rel, size in manifest.items():
        p = os.path.join(staging, rel)
        bucket_dir = os.path.join(staging, rel.split(os.sep, 1)[0])
        if not os.path.isdir(bucket_dir):
            # bucket dir gone from staging: corroborate the swap-in before
            # exempting — the file must be live at its recorded size
            live_p = os.path.join(path, rel)
            if not os.path.isfile(live_p) or os.path.getsize(live_p) != size:
                return False
            continue
        if not os.path.isfile(p) or os.path.getsize(p) != size:
            return False
    return True


def _rollback_merge(path: str, journal: dict) -> None:
    """Undo an unswappable merge (staging failed validation): restore every
    moved-out old bucket and remove every installed or staged new one, then
    drop the journal and staging. Possible without an undo log because the
    moved-out `_merge-old-N` dirs survive until _finish_merge (which only
    runs after a successful roll-forward) and the journal records which
    buckets HAD a live dir before the swap — distinguishing an installed
    new-key bucket (delete it) from an untouched original (leave it).
    Fenced on journal currency like _apply_swap: a stale recoverer must not
    roll back a newer merge's generation."""
    if not _journal_is_current(path, journal):
        return
    had_live = set(journal.get("had_live", journal["buckets"]))
    for b in journal["buckets"]:
        live = os.path.join(path, f"_bucket={b}")
        old = os.path.join(path, f"_merge-old-{b}")
        if os.path.isdir(old):
            shutil.rmtree(live, ignore_errors=True)  # installed new gen, if any
            _rename_converging(old, live)
        elif b not in had_live and os.path.isdir(live):
            shutil.rmtree(live, ignore_errors=True)  # new-key bucket install
    jpath = os.path.join(path, _JOURNAL)
    try:
        os.remove(jpath)
    except FileNotFoundError:
        pass
    shutil.rmtree(journal["staging"], ignore_errors=True)


def _rename_converging(src: str, dst: str) -> None:
    """Rename that tolerates a CONCURRENT recoverer having already performed
    the same step (recovery-on-read can race another reader): on failure,
    succeed iff the postcondition (dst present) already holds."""
    try:
        os.rename(src, dst)
    except OSError:
        if not os.path.isdir(dst):
            raise


def _journal_is_current(path: str, journal: dict) -> bool:
    """True iff the on-disk journal still names `journal`'s merge. The
    last-moment fence for a LAGGING recoverer: a recoverer that loaded the
    journal then stalled past this merge's completion (and possibly past
    SUBSEQUENT merges) must not replay renames against a newer generation —
    in particular _apply_swap's emptied-bucket branch would move a newer
    merge's live bucket out, and a fall-through cleanup would then delete
    it. A journal that is GONE also fails the fence: whoever removed it owns
    (or already finished) the cleanup. Residual TOCTOU between this check
    and the following renames is microseconds against the stall-scale hazard
    it fences; a hard guarantee needs a lease file, noted in the module
    docstring's reader-fencing caveat."""
    try:
        with open(os.path.join(path, _JOURNAL)) as f:
            return json.load(f).get("id") == journal.get("id")
    except (OSError, ValueError):
        return False


def _apply_swap(path: str, journal: dict) -> None:
    """Idempotently complete the journaled bucket swap: every step is a
    presence-checked rename, so replaying after a crash at any point
    converges to the complete new generation. The journal's `staged` list
    (recorded at merge time, not re-derived from the staging dir) is what
    distinguishes an already-swapped-in NEW bucket from an emptied one — a
    replay must not move a freshly-installed bucket out as if it were old.
    Precondition (established by _sweep_leftovers before each journal write):
    any `_merge-old-N` dir present belongs to THIS journal's swap, never to a
    previously committed merge whose cleanup crashed. Entry is fenced on the
    journal still being current (_journal_is_current) — a stale recoverer
    no-ops."""
    if not _journal_is_current(path, journal):
        return
    staging = journal["staging"]
    staged = set(journal["staged"])
    for b in journal["buckets"]:
        live = os.path.join(path, f"_bucket={b}")
        old = os.path.join(path, f"_merge-old-{b}")
        src = os.path.join(staging, f"_bucket={b}")
        if b in staged:
            if os.path.isdir(src):
                # not yet swapped in: move the live dir out (if any and not
                # already moved), then the staged dir in
                if os.path.isdir(live) and not os.path.isdir(old):
                    _rename_converging(live, old)
                _rename_converging(src, live)
            # else: already swapped in by a prior attempt — no-op
        else:
            # emptied bucket (all keys deleted): while the journal exists a
            # live dir without a moved-out sibling is still the OLD
            # generation — move it out so the keys stay deleted
            if os.path.isdir(live) and not os.path.isdir(old):
                _rename_converging(live, old)


def _finish_merge(path: str, journal: dict) -> None:
    """Delete the journal (the commit point for cleanup), then the
    superseded bucket dirs and the staging dir. A crash inside this cleanup
    leaves garbage (stale old/staging dirs, no journal) — invisible to
    readers and removed by _sweep_leftovers at the next merge.

    The journal is deleted only if its content still names THIS merge
    (matching `id`): a lagging recoverer that loaded a stale journal must
    not delete the journal a SUBSEQUENT merge has since written, nor sweep
    its in-flight dirs — and when the journal is GONE entirely, this
    cleanup no-ops too (whoever removed it owns the cleanup; our rmtrees
    here would race a newer merge's recovery). ADVICE r8; the same fence
    guards _apply_swap's entry."""
    if not _journal_is_current(path, journal):
        return
    jpath = os.path.join(path, _JOURNAL)
    try:
        os.remove(jpath)
    except FileNotFoundError:
        pass  # concurrent recoverer deleted it between the fence and here
    for b in journal["buckets"]:
        shutil.rmtree(os.path.join(path, f"_merge-old-{b}"), ignore_errors=True)
    shutil.rmtree(journal["staging"], ignore_errors=True)


def _sweep_leftovers(path: str) -> None:
    """Remove committed-merge garbage: `_merge-old-*` dirs inside the table
    and orphan `_<name>.merge-*` staging dirs beside it. Called only when NO
    journal exists (post-recovery), so every such dir is from a merge whose
    swap committed (journal deleted) but whose cleanup crashed, or from a
    staging write that never reached its journal — in both cases garbage.
    Without this sweep a stale `_merge-old-N` would make the NEXT merge of
    bucket N misread its own swap state (skipped move-out, then a rename
    onto a non-empty target, or a silently resurrected old generation)."""
    try:
        for d in os.listdir(path):
            if d.startswith("_merge-old-"):
                shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    except OSError:
        return  # table doesn't exist yet
    parent = os.path.dirname(path.rstrip("/")) or "."
    name = os.path.basename(path.rstrip("/"))
    try:
        siblings = os.listdir(parent)
    except OSError:
        return
    for d in siblings:
        if d.startswith(f"_{name}.merge-"):
            shutil.rmtree(os.path.join(parent, d), ignore_errors=True)


def recover_merge(path: str) -> bool:
    """Roll an interrupted merge FORWARD from its journal; returns True if a
    recovery ran. Callable from any merge/read entry point — the journal
    only exists between the staging write completing and the swap
    committing, every swap step is idempotent, concurrent recoverers
    converge (_rename_converging), and a recoverer that stalls past a
    SUBSEQUENT merge is fenced by the journal id (_finish_merge). Readers
    running CONCURRENTLY with a swap must still be fenced by the caller's
    scheduler (see module docstring) — recovery-on-read closes the
    crash-consistency gap, not the live-concurrency one.

    A journal that does not parse means the system crashed before the
    journal's fsync'd data committed — no swap rename can have happened yet
    (they strictly follow the fsync), so the old generation is intact and
    the journal is dropped. A journal that parses but whose staged-file
    manifest does not validate (a file missing or size-torn despite the
    pre-journal fsync — a filesystem that reordered data vs. metadata)
    must NOT roll forward: the merge is rolled BACK to the complete old
    generation instead of installing a truncated bucket as the new one."""
    jpath = os.path.join(path, _JOURNAL)
    if not os.path.isfile(jpath):
        return False
    try:
        with open(jpath) as f:
            journal = json.load(f)
    except FileNotFoundError:
        return False  # concurrent recoverer finished between check and open
    except (ValueError, OSError):
        try:
            os.remove(jpath)
        except FileNotFoundError:
            pass
        return False
    if not _validate_staging(path, journal):
        _rollback_merge(path, journal)
        return True
    _apply_swap(path, journal)
    _finish_merge(path, journal)
    return True


def merge_into(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int = 64,
    seq_col: str | None = None,
    deleted_col: str = "_deleted",
) -> list[int]:
    """Apply a changeset to the bucket-partitioned table at `path`; returns
    the bucket ids rewritten. `changes` carries the full row schema plus
    optionally `deleted_col` (bool) and `seq_col` for within-batch ordering
    (highest seq wins per key; omitted -> the changeset must be unique per
    key and is validated to be). First call creates the table.

    SINGLE WRITER, ENFORCED (VERDICT r12 item 5): the journal protocol makes
    one writer crash-safe, but two LIVE sessions merging the same table
    would interleave bucket swaps and silently lose updates. The whole merge
    therefore runs under operators/lease.writer_lease on the table dir — a
    second concurrent writer gets ConcurrentWriterError immediately; a
    CRASHED writer's lease is broken after its TTL and the journal rolls its
    merge forward/back as before (two-session contention and takeover are
    pinned in tests/test_write_lease.py)."""
    from plenario_mapper_spark.operators.lease import writer_lease

    with writer_lease(path):
        return _merge_into_locked(
            spark, path, changes, key, n_buckets, seq_col, deleted_col
        )


def _merge_into_locked(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    key: str,
    n_buckets: int,
    seq_col: str | None,
    deleted_col: str,
) -> list[int]:
    from pyspark.errors import AnalysisException

    recover_merge(path)  # complete any interrupted predecessor first
    # Committed-merge garbage must be gone BEFORE this merge's journal can
    # land: _apply_swap reads `_merge-old-N` presence as "this swap already
    # moved the live dir out", so a stale old dir from a prior merge whose
    # CLEANUP crashed would wedge the swap (rename onto a non-empty target)
    # or, for an emptied bucket, resurrect the superseded generation. Runs
    # at entry — before the staging write — because the sweep also clears
    # orphan staging dirs and must not eat this merge's own.
    _sweep_leftovers(path)
    has_del = deleted_col in changes.columns
    # collapse the changeset to one row per key (last-wins by seq)
    if seq_col is not None:
        w = Window.partitionBy(key).orderBy(F.desc(seq_col))
        changes = (
            changes.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", seq_col)
        )
    c = changes.withColumn("_bucket", bucket_of(F.col(key), n_buckets)).localCheckpoint()
    if seq_col is None:
        dup = c.groupBy(key).count().filter(F.col("count") > 1).count()
        if dup:
            raise ValueError(
                f"{dup} keys appear more than once in the changeset and no "
                f"seq_col was given to order them"
            )
    buckets = sorted(r["_bucket"] for r in c.select("_bucket").distinct().collect())
    upserts = c.filter(~F.col(deleted_col)) if has_del else c
    if has_del:
        upserts = upserts.drop(deleted_col)
    first_batch = False
    try:
        existing = spark.read.parquet(path).filter(F.col("_bucket").isin(buckets))
        # keep existing rows whose key is NOT in the changeset (deletes and
        # upserts both displace), then add the upsert rows
        survivors = existing.join(c.select(key), key, "left_anti")
        merged = survivors.unionByName(upserts)
    except AnalysisException:  # first batch: table doesn't exist yet
        merged = upserts
        first_batch = True

    if first_batch:
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(path)
        return buckets

    # Stage the touched buckets' merged rows to a sibling dir. The write
    # reads the live bucket dirs and writes elsewhere, so no lineage
    # checkpoint is needed and the live table is untouched until the swap.
    parent = os.path.dirname(path.rstrip("/")) or "."
    name = os.path.basename(path.rstrip("/"))
    merge_id = uuid.uuid4().hex[:8]
    staging = os.path.join(parent, f"_{name}.merge-{merge_id}")
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(staging)

    # Make the STAGED DATA durable before the journal can promise to install
    # it: fsync every staged file and directory entry (journal fsync alone
    # orders the journal, not the parquet it points at — intact journal over
    # torn staging would roll a truncated bucket forward, ADVICE r8). The
    # journal additionally records each staged file's size so recovery can
    # validate instead of trust. The staging dir's PARENT entry syncs too:
    # without it a power loss can commit the journal while the staging dir
    # NAME vanishes, which recovery would misread as 'every bucket already
    # swapped in' and half-apply the merge (deletes without upserts).
    _fsync_tree(staging)
    pfd = os.open(parent, os.O_RDONLY)
    try:
        os.fsync(pfd)
    finally:
        os.close(pfd)

    # Journal AFTER staging is durable: its presence means "roll forward".
    # flush+fsync BEFORE the atomic rename so a system crash cannot commit
    # the rename's metadata without the journal's data (a torn journal is
    # then PROOF no swap rename has happened — recover_merge relies on it).
    # `id` ties the journal to this merge (stale-recoverer fence); `had_live`
    # records which touched buckets pre-existed, making a validation-failure
    # rollback able to tell an installed new-key bucket from an original.
    journal = {
        "id": merge_id,
        "staging": staging,
        "buckets": [int(b) for b in buckets],
        "staged": sorted(int(b) for b in _staged_buckets(staging)),
        "files": _staged_files(staging),
        "had_live": sorted(
            int(b)
            for b in buckets
            if os.path.isdir(os.path.join(path, f"_bucket={b}"))
        ),
    }
    jpath = os.path.join(path, _JOURNAL)
    tmp = jpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(journal, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, jpath)
    # directory-entry durability for the rename itself
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)

    _apply_swap(path, journal)
    _finish_merge(path, journal)
    return buckets


def read_table(spark: SparkSession, path: str) -> DataFrame:
    """Read the merged table without the bucketing column. Completes any
    journaled in-flight swap first (recovery-on-read), so a post-crash
    reader sees the complete new generation, never a mixed one."""
    recover_merge(path)
    return spark.read.parquet(path).drop("_bucket")
