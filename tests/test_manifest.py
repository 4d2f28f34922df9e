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
