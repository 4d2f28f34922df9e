"""ManifestLog: the Delta-style segment log (O(1) appends, checkpoint
roll-up, legacy single-file migration)."""

import json
import os

from vstream_spark.storage.manifest import ManifestLog


def _seg(i):
    return {
        "id": f"seg-{i:04d}",
        "path": f"/tmp/seg-{i:04d}",
        "count": 10,
        "min_event_time": i * 100,
        "max_event_time": i * 100 + 99,
    }


def test_append_is_one_file_per_mutation(tmp_path):
    log = ManifestLog(str(tmp_path), checkpoint_interval=1000)
    before = len(os.listdir(log.dir))
    for i in range(5):
        log.append(_seg(i))
    # exactly one new delta file per append — no O(n) rewrite
    assert len(os.listdir(log.dir)) == before + 5
    snap = log.snapshot()
    assert [s["id"] for s in snap] == [f"seg-{i:04d}" for i in range(5)]


def test_update_remove_and_order(tmp_path):
    log = ManifestLog(str(tmp_path))
    for i in range(4):
        log.append(_seg(i))
    log.update("seg-0002", index_file="/x/_hnsw-l2.idx")
    log.remove(["seg-0001"])
    snap = log.snapshot()
    assert [s["id"] for s in snap] == ["seg-0000", "seg-0002", "seg-0003"]
    assert snap[1]["index_file"] == "/x/_hnsw-l2.idx"
    # update of a removed/unknown id is a no-op, not an error
    log.update("seg-9999", index_file="/nope")
    assert len(log.snapshot()) == 3


def test_checkpoint_bounds_replay(tmp_path):
    log = ManifestLog(str(tmp_path), checkpoint_interval=10)
    for i in range(25):
        log.append(_seg(i))
    ckpts = [f for f in os.listdir(log.dir) if f.endswith(".checkpoint.json")]
    assert len(ckpts) == 2  # versions 10 and 20
    # a fresh reader starts from the checkpoint pointer, replays <= interval
    fresh = ManifestLog(str(tmp_path), checkpoint_interval=10)
    assert fresh._last_checkpoint_version() == 20
    assert len(fresh.snapshot()) == 25


def test_replace_writes_checkpoint(tmp_path):
    log = ManifestLog(str(tmp_path))
    for i in range(5):
        log.append(_seg(i))
    log.replace([_seg(99)])
    fresh = ManifestLog(str(tmp_path))
    snap = fresh.snapshot()
    assert [s["id"] for s in snap] == ["seg-0099"]
    # replace rolled up: replay starts at the new checkpoint
    assert fresh._last_checkpoint_version() == fresh.version()


def test_crash_leftover_tmp_ignored(tmp_path):
    log = ManifestLog(str(tmp_path))
    log.append(_seg(0))
    # a crashed writer leaves a .tmp; readers and version() must ignore it
    with open(log._delta_path(99) + ".tmp", "w") as f:
        f.write('{"add": {"id": "ghost"}}')
    assert log.version() == 0
    assert [s["id"] for s in log.snapshot()] == ["seg-0000"]


def test_stale_pointer_falls_back_to_scan(tmp_path):
    log = ManifestLog(str(tmp_path), checkpoint_interval=5)
    for i in range(6):
        log.append(_seg(i))
    with open(os.path.join(log.dir, "_last_checkpoint"), "w") as f:
        f.write("999")  # pointer to a checkpoint that doesn't exist
    fresh = ManifestLog(str(tmp_path), checkpoint_interval=5)
    assert fresh._last_checkpoint_version() == 5
    assert len(fresh.snapshot()) == 6


def test_legacy_segments_json_migration(tmp_path, spark):
    from vstream_spark.storage.segments import SegmentStore

    base = tmp_path / "store"
    base.mkdir()
    legacy = [_seg(0), _seg(1)]
    with open(base / "segments.json", "w") as f:
        json.dump(legacy, f)
    st = SegmentStore(spark, str(base))
    assert [s["id"] for s in st.segments()] == ["seg-0000", "seg-0001"]
    assert not os.path.exists(base / "segments.json")  # renamed .migrated
    # a second open does not re-migrate
    st2 = SegmentStore(spark, str(base))
    assert len(st2.segments()) == 2


def test_snapshot_as_of_replays_history(tmp_path):
    log = ManifestLog(str(tmp_path), checkpoint_interval=4)
    versions = {}
    for i in range(10):
        versions[i] = log.append(_seg(i))
    log.remove(["seg-0003"])
    # each historical version re-materializes exactly
    for i in range(10):
        snap = log.snapshot(as_of=versions[i])
        assert [s["id"] for s in snap] == [f"seg-{j:04d}" for j in range(i + 1)]
    # as_of past the end clamps to latest (post-remove state)
    assert len(log.snapshot(as_of=10**6)) == 9
    # time-travel across a checkpoint boundary: version 3 predates ckpt at 4
    assert len(log.snapshot(as_of=3)) == 4
    # latest-read caching still sees new mutations after a time-travel read
    log.append(_seg(77))
    assert log.snapshot()[-1]["id"] == "seg-0077"


def test_snapshot_as_of_before_replace(tmp_path):
    log = ManifestLog(str(tmp_path))
    for i in range(3):
        log.append(_seg(i))
    v_pre = log.version()
    log.replace([_seg(42)])
    assert [s["id"] for s in log.snapshot()] == ["seg-0042"]
    # logical history before the compaction checkpoint is still replayable
    assert [s["id"] for s in log.snapshot(as_of=v_pre)] == [
        "seg-0000", "seg-0001", "seg-0002",
    ]


def test_store_read_as_of_pins_flush(tmp_path, spark):
    from vstream_spark.storage.segments import SegmentStore

    st = SegmentStore(spark, str(tmp_path / "tt-store"))
    rows1 = [(i, [float(i), 0.0], 1000 + i, 10**9, "I") for i in range(5)]
    rows2 = [(i + 100, [float(i), 1.0], 2000 + i, 10**9, "I") for i in range(5)]
    schema = "id long, emb array<float>, event_time long, ttl long, op string"
    st.upsert_batch(spark.createDataFrame(rows1, schema))
    v1 = st.manifest.version()
    st.upsert_batch(spark.createDataFrame(rows2, schema))
    assert st.read().count() == 10
    pinned = st.read(as_of=v1)
    assert sorted(r.id for r in pinned.select("id").collect()) == [0, 1, 2, 3, 4]
    # pruning composes with the pin
    assert st.read(min_event_time=2000, as_of=v1) is None


def test_time_travel_cannot_resurrect_erased_data_after_compact(tmp_path, spark):
    """GDPR interplay: a pinned pre-erasure version stays readable only until
    compaction VACUUMs the old segment files (Delta semantics) — after that,
    the logical history remains in the manifest but the data is physically
    gone, so erased rows cannot be resurrected through as_of."""
    import pytest
    from pyspark.sql import functions as F

    from vstream_spark.storage.segments import SegmentStore

    st = SegmentStore(spark, str(tmp_path / "privacy"))
    schema = "id long, emb array<float>, event_time long, ttl long, op string"
    st.upsert_batch(
        spark.createDataFrame([(i, [float(i)], 100 + i, 10**9, "I") for i in range(6)], schema)
    )
    v_pre = st.manifest.version()
    st.delete_where(F.col("id") >= 3, event_time=9000)
    # before compaction the pinned version still sees the erased rows
    assert st.read(as_of=v_pre).count() == 6
    st.compact()
    # compaction rewrote + vacuumed: the pre-erasure files are gone
    with pytest.raises(Exception, match="PATH_NOT_FOUND|Path does not exist|does not exist"):
        st.read(as_of=v_pre).count()
    # the live read serves the erased state
    from vstream_spark.operators.knn import apply_deletes

    assert sorted(r.id for r in apply_deletes(st.read()).select("id").collect()) == [0, 1, 2]
