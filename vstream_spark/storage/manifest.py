"""Log-structured segment manifest — O(1) appends at million-segment scale.

The reference tracks SSTs in RocksDB's MANIFEST, a log of version edits
with periodic snapshots (``db/version_set.cc`` VersionEdit/VersionSet).
The single-file ``segments.json`` analog rewrites O(segments) bytes per
flush — fine at thousands of segments, pathological at 100 TB (a segment
per micro-batch ~= millions of entries). This module applies the same
public log+checkpoint pattern Delta Lake / Iceberg use for exactly this
problem:

  _manifest/
    000000000000.checkpoint.json   full state at version 0
    000000000001.json              {"add": {...}}          one action/line
    000000000002.json              {"update": {"id": ...}}
    ...
    000000000100.checkpoint.json   rolled-up state (every checkpoint_interval)
    _last_checkpoint               pointer: avoids scanning for the checkpoint

A mutation writes ONE new delta file (atomic tmp+rename) — never rewrites
prior state. A reader loads the last checkpoint plus at most
``checkpoint_interval`` deltas, so snapshot cost is O(interval), not
O(history). Maintenance ops (compact/evict) that genuinely replace the
set write a fresh checkpoint via ``replace``.

Local-fs writes here map 1:1 onto object-store puts (each version is a new
immutable object); the atomic-rename becomes put-if-absent at that layer.
"""

from __future__ import annotations

import json
import os

_DIR = "_manifest"
_LAST = "_last_checkpoint"


class ManifestLog:
    """Versioned action log with periodic checkpoints."""

    def __init__(self, base_dir: str, checkpoint_interval: int = 100):
        self.dir = os.path.join(base_dir, _DIR)
        self.checkpoint_interval = checkpoint_interval
        os.makedirs(self.dir, exist_ok=True)
        # (version, segments) cache: snapshot() revalidates against disk
        self._cache_version = -1
        self._cache: list[dict] = []

    # -- paths ---------------------------------------------------------------

    def _delta_path(self, v: int) -> str:
        return os.path.join(self.dir, f"{v:012d}.json")

    def _ckpt_path(self, v: int) -> str:
        return os.path.join(self.dir, f"{v:012d}.checkpoint.json")

    def _atomic_write(self, path: str, payload: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.write(payload)
        os.replace(tmp, path)

    # -- read side -----------------------------------------------------------

    def version(self) -> int:
        """Latest committed version (-1 if the log is empty)."""
        v = -1
        for name in os.listdir(self.dir):
            if name.endswith(".tmp") or name == _LAST:
                continue
            try:
                v = max(v, int(name.split(".")[0]))
            except ValueError:
                continue
        return v

    def _last_checkpoint_version(self, as_of: int | None = None) -> int:
        if as_of is None:
            try:
                with open(os.path.join(self.dir, _LAST)) as f:
                    v = int(f.read().strip())
                if os.path.exists(self._ckpt_path(v)):
                    return v
            except (OSError, ValueError):
                pass
        # fall back to scanning (pointer missing/stale, or time-travel read:
        # the newest checkpoint at-or-before as_of)
        best = -1
        for name in os.listdir(self.dir):
            if name.endswith(".checkpoint.json"):
                v = int(name.split(".")[0])
                if as_of is None or v <= as_of:
                    best = max(best, v)
        return best

    def snapshot(self, as_of: int | None = None) -> list[dict]:
        """Segment list at version ``as_of`` (default: latest), append order
        preserved. Time travel is the RocksDB GetSnapshot / SequenceNumber
        read analog (``db/version_set.cc`` keeps superseded Versions alive
        for open snapshots): any committed version can be re-materialized by
        replaying the log, because mutations only ever ADD files. Physical
        availability mirrors Delta/Iceberg semantics — a version is readable
        until maintenance (compact/evict) vacuums the data files it
        references."""
        latest = self.version()
        latest_read = as_of is None or as_of >= latest
        if latest_read:
            as_of = latest
            if latest == self._cache_version:
                return [dict(s) for s in self._cache]
        # latest reads use the _last_checkpoint pointer (O(1), no directory
        # scan); only genuine time-travel reads fall back to scanning for the
        # newest checkpoint at-or-before as_of (ADVICE r4: passing the
        # normalized as_of made the pointer fast path unreachable)
        ckpt = self._last_checkpoint_version(as_of=None if latest_read else as_of)
        if ckpt > as_of:  # stale-pointer guard: never replay past the target
            ckpt = self._last_checkpoint_version(as_of=as_of)
        segs: list[dict] = []
        if ckpt >= 0:
            with open(self._ckpt_path(ckpt)) as f:
                segs = json.load(f)
        by_id = {s["id"]: s for s in segs}
        for v in range(ckpt + 1, as_of + 1):
            path = self._delta_path(v)
            if not os.path.exists(path):
                continue  # v was a checkpoint-only version
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        seg = action["add"]
                        by_id[seg["id"]] = seg
                        segs.append(seg)
                    elif "remove" in action:
                        gone = action["remove"]
                        by_id.pop(gone, None)
                        segs = [s for s in segs if s["id"] != gone]
                    elif "update" in action:
                        upd = action["update"]
                        cur = by_id.get(upd["id"])
                        if cur is not None:
                            cur.update({k: v2 for k, v2 in upd.items() if k != "id"})
        if as_of == latest:
            self._cache_version = latest
            self._cache = [dict(s) for s in segs]
        return [dict(s) for s in segs]

    # -- write side ----------------------------------------------------------

    def _commit(self, actions: list[dict]) -> int:
        v = self.version() + 1
        self._atomic_write(
            self._delta_path(v), "\n".join(json.dumps(a) for a in actions) + "\n"
        )
        if v > 0 and v % self.checkpoint_interval == 0:
            self._checkpoint(v)
        return v

    def _checkpoint(self, v: int) -> None:
        # roll the log up INTO version v (deltas <= v are now redundant)
        self._cache_version = -1  # force replay through v
        segs = self.snapshot()
        self._atomic_write(self._ckpt_path(v), json.dumps(segs))
        self._atomic_write(os.path.join(self.dir, _LAST), str(v))

    def append(self, seg: dict) -> int:
        """Record a new segment. O(1): one delta file."""
        return self._commit([{"add": seg}])

    def update(self, seg_id: str, **fields) -> int:
        """Patch fields of an existing segment (e.g. index_file). O(1)."""
        return self._commit([{"update": {"id": seg_id, **fields}}])

    def remove(self, seg_ids: list[str]) -> int:
        """Drop segments (evict). O(#removed)."""
        return self._commit([{"remove": sid} for sid in seg_ids])

    def replace(self, segs: list[dict]) -> int:
        """Replace the whole set (compaction). Writes a fresh checkpoint —
        readers never replay across a replace."""
        v = self.version() + 1
        self._atomic_write(self._ckpt_path(v), json.dumps(segs))
        self._atomic_write(os.path.join(self.dir, _LAST), str(v))
        self._cache_version = v
        self._cache = [dict(s) for s in segs]
        return v
