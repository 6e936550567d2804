"""Keyed MERGE into bucket-partitioned parquet: upsert/delete semantics,
touched-bucket-only rewrites, last-wins ordering."""

import os

from pyspark.sql import functions as F

from plenario_mapper_spark.operators import merge as MG


def test_merge_upsert_insert_delete_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    assert sorted(map(tuple, MG.read_table(spark, path).collect())) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    changes = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k long, v string, _deleted boolean",
    )
    MG.merge_into(spark, path, changes, "k", n_buckets=8)
    assert sorted(
        map(tuple, MG.read_table(spark, path).collect())
    ) == [(1, "a"), (2, "B"), (4, "d")]


def test_merge_rewrites_only_touched_buckets(spark, tmp_path):
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    # snapshot per-bucket mtimes
    def mtimes():
        out = {}
        for d in os.listdir(path):
            if d.startswith("_bucket="):
                files = sorted(os.listdir(os.path.join(path, d)))
                out[d] = [
                    (f, os.path.getmtime(os.path.join(path, d, f)))
                    for f in files
                    if f.endswith(".parquet")
                ]
        return out
    before = mtimes()
    touched = MG.merge_into(
        spark, path,
        spark.createDataFrame([(7, "SEVEN")], "k long, v string"),
        "k", n_buckets=8,
    )
    after = mtimes()
    assert len(touched) == 1
    touched_dir = f"_bucket={touched[0]}"
    for d in before:
        if d == touched_dir:
            assert before[d] != after[d]
        else:
            assert before[d] == after[d], d
    got = dict(map(tuple, MG.read_table(spark, path).collect()))
    assert got[7] == "SEVEN" and got[6] == "v6" and len(got) == 50


def test_merge_last_wins_by_seq_and_dup_guard(spark, tmp_path):
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    dup = spark.createDataFrame(
        [(1, "x"), (1, "y")], "k long, v string"
    )
    with _pytest.raises(ValueError, match="more than once"):
        MG.merge_into(spark, path, dup, "k")
    seqd = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "z", 1)], "k long, v string, seq long"
    )
    MG.merge_into(spark, path, seqd, "k", seq_col="seq")
    got = dict(map(tuple, MG.read_table(spark, path).collect()))
    assert got == {1: "y", 2: "z"}


def _table_snapshot(spark, path):
    return sorted(map(tuple, MG.read_table(spark, path).collect()))


def test_merge_kill_between_steps_readers_see_old_or_new(spark, tmp_path):
    """VERDICT r7 item 4: simulate a crash at EVERY filesystem step of the
    journaled swap — each os.rename, the journal os.replace, AND the cleanup
    steps (journal os.remove, old/staging shutil.rmtree; a crash between the
    journal delete and the rmtrees leaves stale _merge-old dirs that once
    wedged the next merge of the same bucket). After each kill, a plain
    read_table (recovery-on-read) must return either the complete pre-merge
    table or the complete post-merge table — never a mixed generation, never
    a half-rewritten bucket, never a resurrected deleted key — and a
    follow-up merge of the SAME changeset must complete and land on the
    post-merge snapshot (no leftover can wedge or corrupt it)."""
    import shutil as _shutil
    import pytest as _pytest

    base_rows = [(i, f"v{i}") for i in range(40)]
    # the changeset: update key 7, insert key 100 (a bucket with no prior
    # dir at n_buckets=8 is unlikely for 40 keys, but the staged-list
    # journal field is exercised regardless), delete EVERY key of one
    # bucket so an emptied-bucket rename-out is in the sequence
    victim_bucket_keys = None

    def build(path):
        base = spark.createDataFrame(base_rows, "k long, v string")
        MG.merge_into(spark, path, base, "k", n_buckets=8)
        by_bucket = {}
        for k, _ in base_rows:
            b = spark.range(1).select(
                MG.bucket_of(F.lit(k).cast("long"), 8)
            ).collect()[0][0]
            by_bucket.setdefault(b, []).append(k)
        return min(by_bucket.values(), key=len)

    path0 = str(tmp_path / "ref")
    victim_bucket_keys = build(path0)

    def changeset():
        rows = [(7, "SEVEN", False), (100, "hundred", False)]
        rows += [(k, None, True) for k in victim_bucket_keys if k not in (7, 100)]
        return spark.createDataFrame(rows, "k long, v string, _deleted boolean")

    # reference final state, no crash
    MG.merge_into(spark, path0, changeset(), "k", n_buckets=8)
    want_new = _table_snapshot(spark, path0)

    # count the fs steps a clean merge takes, by probing with an unbounded kill
    class Kill(Exception):
        pass

    real = {
        "rename": os.rename,
        "replace": os.replace,
        "remove": os.remove,
        "rmtree": _shutil.rmtree,
    }

    def run_with_kill(kill_at):
        """Returns ('done'|'killed', snapshot_after_recovery_read)."""
        path = str(tmp_path / f"t{kill_at}")
        base = spark.createDataFrame(base_rows, "k long, v string")
        MG.merge_into(spark, path, base, "k", n_buckets=8)
        want_old = _table_snapshot(spark, path)
        calls = {"n": 0}

        def counting(fn):
            def inner(*a, **kw):
                calls["n"] += 1
                if calls["n"] > kill_at:
                    raise Kill()
                return fn(*a, **kw)
            return inner

        os.rename, os.replace = counting(real["rename"]), counting(real["replace"])
        os.remove, _shutil.rmtree = counting(real["remove"]), counting(real["rmtree"])
        try:
            MG.merge_into(spark, path, changeset(), "k", n_buckets=8)
            outcome = "done"
        except Kill:
            outcome = "killed"
        finally:
            os.rename, os.replace = real["rename"], real["replace"]
            os.remove, _shutil.rmtree = real["remove"], real["rmtree"]
        got = _table_snapshot(spark, path)
        assert got in (want_old, want_new), (
            f"kill_at={kill_at}: mixed generation visible: {got}"
        )
        # whatever the crash left behind, the SAME merge must be re-runnable
        # and land on the new generation (stale olds/staging cannot wedge it)
        MG.merge_into(spark, path, changeset(), "k", n_buckets=8)
        assert _table_snapshot(spark, path) == want_new, f"kill_at={kill_at}"
        leftovers = [
            d for d in os.listdir(path) if d.startswith("_merge")
        ]
        assert leftovers == [], f"kill_at={kill_at}: {leftovers}"
        # orphan staging dirs beside the table are swept too
        stray = [
            d
            for d in os.listdir(tmp_path)
            if d.startswith(f"_t{kill_at}.merge-")
        ]
        assert stray == [], f"kill_at={kill_at}: {stray}"
        return outcome, got

    kill_at = 0
    while True:
        outcome, got = run_with_kill(kill_at)
        if outcome == "done":
            assert got == want_new
            break
        kill_at += 1
    assert kill_at >= 5  # journal replace + bucket renames + cleanup steps


def test_merge_recovery_is_idempotent_and_completes(spark, tmp_path):
    """A journal left by a crash must roll FORWARD on the next merge_into as
    well as on read_table, and recover_merge twice is a no-op."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "k long, v string")
    MG.merge_into(spark, path, base, "k", n_buckets=4)

    # fabricate an interrupted merge: stage a new value for key 3, journal
    # it, but perform no swap (crash right after the journal replace)
    changes = spark.createDataFrame([(3, "THREE")], "k long, v string")
    import json as _json
    import uuid as _uuid

    c = changes.withColumn("_bucket", MG.bucket_of(F.col("k"), 4))
    b = c.select("_bucket").collect()[0][0]
    staging = str(tmp_path / f"_tbl.merge-{_uuid.uuid4().hex[:8]}")
    existing = spark.read.parquet(path).filter(F.col("_bucket") == b)
    merged = existing.join(c.select("k"), "k", "left_anti").unionByName(c)
    merged.write.mode("overwrite").partitionBy("_bucket").parquet(staging)
    with open(os.path.join(path, "_merge.journal"), "w") as f:
        _json.dump({"staging": staging, "buckets": [int(b)], "staged": [int(b)]}, f)

    assert MG.recover_merge(path) is True
    assert MG.recover_merge(path) is False  # journal gone, second call no-op
    got = dict(map(tuple, MG.read_table(spark, path).collect()))
    assert got[3] == "THREE" and len(got) == 20
    # no leftovers
    leftovers = [d for d in os.listdir(path) if d.startswith("_merge")]
    assert leftovers == []
    assert not os.path.exists(staging)


def _rows(spark, path):
    return sorted(map(tuple, MG.read_table(spark, path).collect()))


def _crash_before_swap(spark, path, changes, monkeypatch):
    """Run merge_into up to the journal write, then 'crash' (raise) before
    any swap rename — leaving an intact journal over the staged buckets."""
    def _boom(p, j):
        raise RuntimeError("simulated crash after journal, before swap")

    monkeypatch.setattr(MG, "_apply_swap", _boom)
    try:
        MG.merge_into(spark, path, changes, "k", n_buckets=8)
    except RuntimeError:
        pass
    monkeypatch.undo()
    assert os.path.isfile(os.path.join(path, MG._JOURNAL))


def test_torn_staging_rolls_back_not_forward(spark, tmp_path, monkeypatch):
    """ADVICE r8 (medium): an intact journal over power-loss-torn staged
    parquet must NOT roll forward (installing a truncated bucket as the new
    generation is silent data loss). The journal's {staged file: size}
    manifest detects the tear and recovery rolls the merge BACK to the
    complete old generation."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    before = _rows(spark, path)

    changes = spark.createDataFrame([(2, "B"), (5, "e")], "k long, v string")
    _crash_before_swap(spark, path, changes, monkeypatch)

    # tear one staged parquet file (truncate to half its recorded size)
    journal = __import__("json").load(open(os.path.join(path, MG._JOURNAL)))
    rel, size = next(
        (r, s) for r, s in journal["files"].items() if r.endswith(".parquet")
    )
    torn = os.path.join(journal["staging"], rel)
    with open(torn, "r+b") as f:
        f.truncate(size // 2)

    assert MG.recover_merge(path) is True
    # rolled BACK: old generation intact, journal and staging gone
    assert _rows(spark, path) == before
    assert not os.path.isfile(os.path.join(path, MG._JOURNAL))
    assert not os.path.isdir(journal["staging"])
    # and the table still merges cleanly afterwards
    MG.merge_into(spark, path, changes, "k", n_buckets=8)
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (3, "c"), (4, "d"), (5, "e")]


def test_torn_staging_mid_swap_restores_moved_out_buckets(
    spark, tmp_path, monkeypatch
):
    """Rollback must also undo a PARTIALLY executed swap: buckets whose live
    dir was already moved out (their _merge-old-N sibling exists) are
    restored, and an installed new-key bucket is removed (the journal's
    had_live list tells the two apart)."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    before = _rows(spark, path)

    changes = spark.createDataFrame([(2, "B"), (5, "e")], "k long, v string")
    orig_swap = MG._apply_swap

    def _partial(p, j):
        # move ONE pre-existing touched bucket out, install its staged dir,
        # then crash
        b = j["had_live"][0]
        os.rename(
            os.path.join(p, f"_bucket={b}"), os.path.join(p, f"_merge-old-{b}")
        )
        os.rename(
            os.path.join(j["staging"], f"_bucket={b}"),
            os.path.join(p, f"_bucket={b}"),
        )
        raise RuntimeError("simulated crash mid-swap")

    monkeypatch.setattr(MG, "_apply_swap", _partial)
    try:
        MG.merge_into(spark, path, changes, "k", n_buckets=8)
    except RuntimeError:
        pass
    monkeypatch.undo()

    journal = __import__("json").load(open(os.path.join(path, MG._JOURNAL)))
    # tear a STILL-STAGED file (one whose bucket was not yet swapped in)
    rel, size = next(
        (r, s)
        for r, s in journal["files"].items()
        if r.endswith(".parquet")
        and os.path.isfile(os.path.join(journal["staging"], r))
    )
    with open(os.path.join(journal["staging"], rel), "r+b") as f:
        f.truncate(size // 2)

    assert MG.recover_merge(path) is True
    assert _rows(spark, path) == before  # moved-out bucket restored
    assert not os.path.isfile(os.path.join(path, MG._JOURNAL))
    assert MG._apply_swap is orig_swap


def test_dropped_staging_bucket_dir_rolls_back_not_mixed(
    spark, tmp_path, monkeypatch
):
    """ADVICE r9 (medium): a power loss that drops a staging BUCKET DIR entry
    before any swap rename (the data-vs-metadata reorder class the manifest
    exists to catch) must not be mistaken for 'that bucket already swapped
    in'. Without live-side corroboration, validation passed, recovery rolled
    forward, and _apply_swap silently left the vanished bucket at the OLD
    generation while installing the others — a mixed-generation table with
    no error. With it, the merge rolls BACK whole."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    before = _rows(spark, path)

    # touch two DIFFERENT buckets so a mixed-generation outcome is possible
    changes = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    _crash_before_swap(spark, path, changes, monkeypatch)

    journal = __import__("json").load(open(os.path.join(path, MG._JOURNAL)))
    assert len(journal["staged"]) >= 2, "need two staged buckets for the scenario"
    # simulate the reordered power loss: one staged bucket dir vanishes
    # entirely while the journal (fsync'd earlier) survives intact
    import shutil as _sh

    _sh.rmtree(os.path.join(journal["staging"], f"_bucket={journal['staged'][0]}"))

    assert MG.recover_merge(path) is True
    # rolled BACK whole: old generation intact — NOT (2,"b"),(3,"C") mixed
    assert _rows(spark, path) == before
    assert not os.path.isfile(os.path.join(path, MG._JOURNAL))
    # and the table still merges cleanly afterwards
    MG.merge_into(spark, path, changes, "k", n_buckets=8)
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (3, "C"), (4, "d")]


def test_swapped_in_bucket_still_exempt_from_staging_validation(
    spark, tmp_path, monkeypatch
):
    """The corroboration must not turn recovery conservative: a bucket that
    a prior recovery attempt ALREADY renamed into the table (live dir holds
    the manifest's files at recorded sizes) is exempt, and the replay rolls
    forward to completion."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
    )
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    changes = spark.createDataFrame([(2, "B"), (3, "C")], "k long, v string")
    _crash_before_swap(spark, path, changes, monkeypatch)

    journal = __import__("json").load(open(os.path.join(path, MG._JOURNAL)))
    # replay a PARTIAL prior recovery by hand: swap the first staged bucket
    b = journal["staged"][0]
    live = os.path.join(path, f"_bucket={b}")
    if os.path.isdir(live):
        os.rename(live, os.path.join(path, f"_merge-old-{b}"))
    os.rename(os.path.join(journal["staging"], f"_bucket={b}"), live)

    assert MG.recover_merge(path) is True  # rolls FORWARD
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (3, "C"), (4, "d")]
    assert not os.path.isfile(os.path.join(path, MG._JOURNAL))


def test_intact_staging_still_rolls_forward(spark, tmp_path, monkeypatch):
    """The manifest must not turn crash recovery conservative: an intact
    journal over INTACT staging still rolls forward to the new generation."""
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    changes = spark.createDataFrame(
        [(2, "B", False), (6, "f", False)], "k long, v string, _deleted boolean"
    )
    _crash_before_swap(spark, path, changes, monkeypatch)
    assert MG.recover_merge(path) is True
    assert _rows(spark, path) == [(1, "a"), (2, "B"), (6, "f")]
    assert not os.path.isfile(os.path.join(path, MG._JOURNAL))


def test_stale_recoverer_cannot_delete_newer_journal(spark, tmp_path, monkeypatch):
    """ADVICE r8 (low): a lagging recoverer holding a SUPERSEDED journal must
    not delete the journal a subsequent merge has since written, nor sweep
    that merge's _merge-old-* dirs."""
    import json as _json

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    changes = spark.createDataFrame([(2, "B")], "k long, v string")
    _crash_before_swap(spark, path, changes, monkeypatch)
    stale = _json.load(open(os.path.join(path, MG._JOURNAL)))

    # a newer merge replaces the journal (different id)
    newer = dict(stale, id="ffffffff")
    _json.dump(newer, open(os.path.join(path, MG._JOURNAL), "w"))

    MG._finish_merge(path, stale)  # the lagging recoverer's cleanup attempt
    # the newer journal survives untouched
    on_disk = _json.load(open(os.path.join(path, MG._JOURNAL)))
    assert on_disk["id"] == "ffffffff"
    # restore the real journal and let recovery complete normally
    _json.dump(stale, open(os.path.join(path, MG._JOURNAL), "w"))
    assert MG.recover_merge(path) is True
    assert _rows(spark, path) == [(1, "a"), (2, "B")]


def test_stale_recoverer_noops_when_journal_gone_or_replaced(
    spark, tmp_path, monkeypatch
):
    """The last-moment currency fence (review r9): a recoverer holding a
    LOADED journal whose on-disk twin has since been deleted (another
    recoverer finished) or replaced (a newer merge) must no-op in
    _apply_swap, _rollback_merge, AND _finish_merge — its emptied-bucket
    rename would otherwise move a newer generation's live bucket out, and
    its cleanup would delete it."""
    import json as _json

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    MG.merge_into(spark, path, base, "k", n_buckets=8)
    before = _rows(spark, path)
    changes = spark.createDataFrame([(2, "B")], "k long, v string")
    _crash_before_swap(spark, path, changes, monkeypatch)
    stale = _json.load(open(os.path.join(path, MG._JOURNAL)))

    # journal GONE (another recoverer completed + cleaned): all three no-op
    os.remove(os.path.join(path, MG._JOURNAL))
    MG._apply_swap(path, stale)
    MG._rollback_merge(path, stale)
    MG._finish_merge(path, stale)
    assert _rows(spark, path) == before  # live generation untouched
    assert os.path.isdir(stale["staging"])  # staging not swept by the stale actor

    # restore the journal: normal recovery still completes the merge
    _json.dump(stale, open(os.path.join(path, MG._JOURNAL), "w"))
    assert MG.recover_merge(path) is True
    assert _rows(spark, path) == [(1, "a"), (2, "B")]
