"""In-memory write journal: the mutable overlay over immutable segments.

Semantics follow the reference journal (/root/reference/internal/pack/
journal/journal.go:22-50, insert.go:30-60, tomb.go): inserts/updates/
deletes land here first (WAL-backed), reads merge journal rows over
segment scan results with snapshot isolation, and a background merge
drains committed rows into new immutable segments.

TPU-first inversion: the journal is host-only numpy (it is small and
mutation-heavy — the wrong shape for the device); segments are the
device-resident fast path. Journal query evaluation uses the same keyform
semantics as the kernels via a numpy reference evaluator (exec/oracle.py),
so merged results are bit-identical whether a row was found on device or
in the overlay.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..schema.schema import META_RID, META_XMIN, META_XMAX, Schema
from ..types import FilterMode, Snapshot

__all__ = ["Journal", "JournalRow"]


@dataclass
class _Seg:
    """One journal segment: columnar buffers in insert order."""
    data: dict = field(default_factory=dict)       # name -> list
    rids: list = field(default_factory=list)
    xmins: list = field(default_factory=list)
    n: int = 0


class Journal:
    def __init__(self, schema: Schema, max_size: int = 1 << 17):
        self.schema = schema
        self.max_size = max_size
        self.tip = _Seg()
        self.tail: list[_Seg] = []          # immutable full segments
        # tombstones: rid -> xid that deleted it (may target segment rows)
        self.tomb: dict[int, int] = {}
        # per-row xmax for journal rows replaced/deleted (parallel to data)
        self._committed: set[int] = set()   # committed xids
        self._aborted: set[int] = set()

    # ------------------------------------------------------------- write --

    def insert(self, xid: int, rids: np.ndarray, data: dict) -> None:
        """Append rows (already assigned rids) under transaction xid."""
        n = len(rids)
        seg = self.tip
        for f in self.schema.fields:
            seg.data.setdefault(f.name, []).extend(
                _tolist(data[f.name], n))
        seg.rids.extend(int(r) for r in rids)
        seg.xmins.extend([xid] * n)
        seg.n += n
        if seg.n >= self.max_size:
            self.rotate()

    def delete(self, xid: int, rids) -> int:
        cnt = 0
        for r in rids:
            r = int(r)
            if r in self.tomb and self.tomb[r] in self._committed:
                continue
            self.tomb[r] = xid
            cnt += 1
        return cnt

    def rotate(self) -> None:
        if self.tip.n:
            self.tail.append(self.tip)
            self.tip = _Seg()

    def commit(self, xid: int) -> None:
        self._committed.add(xid)

    def abort(self, xid: int) -> None:
        self._aborted.add(xid)

    # -------------------------------------------------------------- read --

    @property
    def nrows(self) -> int:
        return self.tip.n + sum(s.n for s in self.tail)

    def is_empty(self) -> bool:
        return self.nrows == 0 and not self.tomb

    def _segments(self):
        yield from self.tail
        if self.tip.n:
            yield self.tip

    def visible_rows(self, snap: Snapshot) -> tuple[dict, np.ndarray]:
        """All journal rows visible under snapshot (insert order).

        Returns (data dict of object arrays, rids u64). A row is visible
        when its inserting xid is visible and no visible tombstone covers
        its rid."""
        cols: dict[str, list] = {f.name: [] for f in self.schema.fields}
        rids: list[int] = []
        for seg in self._segments():
            for i in range(seg.n):
                xid = seg.xmins[i]
                if not self._xid_visible(xid, snap):
                    continue
                rid = seg.rids[i]
                t = self.tomb.get(rid)
                if t is not None and self._xid_visible(t, snap):
                    continue
                for name in cols:
                    cols[name].append(seg.data[name][i])
                rids.append(rid)
        out = {n: np.array(v, dtype=object) for n, v in cols.items()}
        return out, np.array(rids, np.uint64)

    def deleted_rids(self, snap: Snapshot) -> np.ndarray:
        """Rids with a visible tombstone (for the segment exclude mask)."""
        out = [r for r, x in self.tomb.items() if self._xid_visible(x, snap)]
        return np.array(sorted(out), np.uint64)

    def _xid_visible(self, xid: int, snap: Snapshot) -> bool:
        if xid in self._aborted:
            return False
        if xid == snap.xown:
            return True
        if snap.xmax and xid >= snap.xmax:
            return False
        if xid in snap.xact:
            return False
        return xid in self._committed or not snap.xmax

    # ------------------------------------------------------------- merge --

    def mergable(self) -> tuple[dict, np.ndarray, np.ndarray, set[int]] | None:
        """Committed rows ready to merge into segments.

        Returns (data, rids, deleted_rids, drained_xids) or None. Aborted
        rows are dropped; uncommitted rows stay (the caller only merges
        when everything pending is committed — reference NextMergable
        semantics simplified to full-drain)."""
        pending = set()
        for seg in self._segments():
            for x in seg.xmins:
                if x not in self._committed and x not in self._aborted:
                    pending.add(x)
        for x in self.tomb.values():
            if x not in self._committed and x not in self._aborted:
                pending.add(x)
        if pending:
            return None
        snap = Snapshot(xown=0, xmin=0, xmax=0, xact=frozenset())
        data, rids = self.visible_rows(snap)
        deleted = self.deleted_rids(snap)
        drained = set(self._committed)
        return data, rids, deleted, drained

    def clear(self) -> None:
        self.tip = _Seg()
        self.tail = []
        self.tomb.clear()
        self._committed.clear()
        self._aborted.clear()

    def drop_drained(self, tail_segs: list, tomb: dict, xids: set) -> None:
        """Remove exactly the content a merge drained (captured under the
        table lock before the merge built its segment). Rows/tombstones
        inserted AFTER the capture — concurrent transactions — survive,
        unlike a blanket clear() which would silently lose them."""
        drained_ids = {id(s) for s in tail_segs}
        self.tail = [s for s in self.tail if id(s) not in drained_ids]
        for r, x in tomb.items():
            if self.tomb.get(r) == x:
                del self.tomb[r]
        # an xid can only be drained when fully committed/aborted at
        # capture time (mergable() guarantees no pending), so dropping the
        # outcome sets is safe for rows inserted later under NEW xids
        self._committed -= xids
        self._aborted -= xids


def _tolist(col, n: int) -> list:
    if isinstance(col, np.ndarray):
        return list(col[:n])
    return list(col)[:n]
