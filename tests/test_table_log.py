"""Transactional commit-log table format (lsd_spark/sources/
table_log.py): atomic version claims, lost-race retry, crash
invisibility, time-travel reads. Mirrors the reference's
snapshot/commit machinery [lsd:src/lsd/table.py snapshot logic —
UNVERIFIED, SURVEY.md §2 tables]."""

import json
import os

import pytest

from lsd_spark.sources import table_log as tl


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


def test_time_travel_reads_exact_versions(spark, tmp_path):
    base = str(tmp_path / "t")
    tl.init_table(base)
    v1 = tl.commit(base, tl.write_data_files(_mk(spark, [(1, 1.0)]), base, "c1"), "A")
    v2 = tl.commit(base, tl.write_data_files(_mk(spark, [(2, 2.0)]), base, "c2"), "A")
    v3 = tl.commit(base, tl.write_data_files(_mk(spark, [(3, 3.0)]), base, "c3"), "B")
    assert (v1, v2, v3) == (1, 2, 3)
    assert {r.k for r in tl.read_version(spark, base, 1).collect()} == {1}
    assert {r.k for r in tl.read_version(spark, base, 2).collect()} == {1, 2}
    assert {r.k for r in tl.read_version(spark, base, 3).collect()} == {1, 2, 3}
    assert tl.latest_version(base) == 3


def test_crashed_writer_files_invisible(spark, tmp_path):
    """Data files staged without a published log entry must never
    reach a reader — the partial-commit / crash case."""
    base = str(tmp_path / "t")
    tl.init_table(base)
    tl.commit(base, tl.write_data_files(_mk(spark, [(1, 1.0)]), base, "c1"), "A")
    # crash: staging succeeded, commit never happened
    orphan = tl.write_data_files(_mk(spark, [(99, 9.9)] * 5), base, "crashed")
    assert orphan  # files really are on disk
    got = {r.k for r in tl.read_version(spark, base, tl.latest_version(base)).collect()}
    assert got == {1}


def test_lost_race_retries_at_next_version(spark, tmp_path):
    """Two writers race for the same version: exactly one atomic
    create wins; the loser's retry lands at the next version with
    NO data lost or duplicated."""
    base = str(tmp_path / "t")
    tl.init_table(base)
    tl.commit(base, tl.write_data_files(_mk(spark, [(1, 1.0)]), base, "c1"), "A")
    fa = tl.write_data_files(_mk(spark, [(2, 2.0)]), base, "a2")
    fb = tl.write_data_files(_mk(spark, [(3, 3.0)]), base, "b1")
    target = tl.latest_version(base) + 1
    assert tl.try_commit(base, target, fa, "A") is True
    assert tl.try_commit(base, target, fb, "B") is False
    assert tl.commit(base, fb, "B") == target + 1
    # winner owns version 2, loser version 3, nothing lost
    with open(tl._entry_path(base, 2)) as fh:
        assert json.load(fh)["writer"] == "A"
    with open(tl._entry_path(base, 3)) as fh:
        assert json.load(fh)["writer"] == "B"
    got = sorted(r.k for r in tl.read_version(spark, base, 3).collect())
    assert got == [1, 2, 3]


def test_loser_tmp_file_cleaned_and_entry_intact(spark, tmp_path):
    """The losing try_commit must not disturb the winner's entry and
    must not leave its temp file behind."""
    base = str(tmp_path / "t")
    tl.init_table(base)
    f1 = tl.write_data_files(_mk(spark, [(1, 1.0)]), base, "c1")
    assert tl.try_commit(base, 1, f1, "A")
    before = open(tl._entry_path(base, 1)).read()
    f2 = tl.write_data_files(_mk(spark, [(2, 2.0)]), base, "c2")
    assert not tl.try_commit(base, 1, f2, "B")
    assert open(tl._entry_path(base, 1)).read() == before
    leftovers = [f for f in os.listdir(os.path.join(base, tl.LOG_DIR)) if f.endswith(".tmp")]
    assert leftovers == []


def test_read_before_first_commit_raises(spark, tmp_path):
    base = str(tmp_path / "t")
    tl.init_table(base)
    with pytest.raises(ValueError):
        tl.read_version(spark, base, 0)
