"""CellUnion: sorted, deduped, sibling-collapsed cell-id sets.

Semantics: /root/reference/s2/cellunion.go. Driver-side (coverings are
small); the *batch* membership test used by the spatial join is
``ranges()`` + numpy searchsorted in gos2_spark.spark.joins, which mirrors
ContainsCellID's binary search (cellunion.go:118-133) over whole columns.
"""

from __future__ import annotations

import numpy as np

from ..kernels import hilbert as H

MAX_LEVEL = 30


def _lsb(x: int) -> int:
    return x & (-x)


def _immediate_parent(x: int) -> int:
    nlsb = _lsb(x) << 2
    return (x & ~(nlsb - 1)) | nlsb


def _is_face(x: int) -> bool:
    return (x & ((1 << 60) - 1)) == 0


class CellUnion:
    def __init__(self, cell_ids, normalize: bool = True):
        self.ids: list[int] = [int(c) for c in cell_ids]
        if normalize:
            self.normalize()

    def normalize(self) -> None:
        """Sort, drop contained, collapse 4-sibling groups (cellunion.go:34-92)."""
        self.ids.sort()
        output: list[int] = []
        for ci in self.ids:
            if output and _contains(output[-1], ci):
                continue
            j = len(output) - 1
            while j >= 0 and _contains(ci, output[j]):
                j -= 1
            del output[j + 1:]
            # cascade sibling collapse
            while len(output) >= 3:
                f0, f1, f2 = output[-3], output[-2], output[-1]
                if (f0 ^ f1 ^ f2 ^ ci) != 0:
                    break
                mask = _lsb(ci) << 1
                mask = ~(mask + (mask << 1)) & ((1 << 64) - 1)
                should = ci & mask
                if (
                    (f0 & mask) != should
                    or (f1 & mask) != should
                    or (f2 & mask) != should
                    or _is_face(ci)
                ):
                    break
                del output[-3:]
                ci = _immediate_parent(ci)
            output.append(ci)
        self.ids = output

    def denormalize(self, min_level: int, level_mod: int) -> list[int]:
        """Re-expand to satisfy minLevel/levelMod (cellunion.go:94-116)."""
        output: list[int] = []
        arr = np.array(self.ids, dtype=np.uint64) if self.ids else np.array([], dtype=np.uint64)
        levels = H.level(arr) if len(arr) else []
        for cid, level in zip(self.ids, levels):
            level = int(level)
            new_level = max(min_level, level)
            if level_mod > 1:
                new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
                new_level = min(MAX_LEVEL, new_level)
            if new_level == level:
                output.append(cid)
            else:
                a = np.array([cid], dtype=np.uint64)
                cur = int(H.child_begin_at_level(a, new_level)[0])
                end = int(H.child_end_at_level(a, new_level)[0])
                while cur != end:
                    output.append(cur)
                    cur = int(H.next_cell(np.array([cur], dtype=np.uint64))[0])
        return output

    def contains_cellid(self, cid: int) -> bool:
        """Binary search over the sorted span (cellunion.go:118-133)."""
        import bisect

        idx = bisect.bisect_left(self.ids, cid)
        if idx < len(self.ids) and _range_min(self.ids[idx]) <= cid:
            return True
        return idx > 0 and _range_max(self.ids[idx - 1]) >= cid

    def intersects_cellid(self, cid: int) -> bool:
        """cellunion.go:135-143."""
        import bisect

        idx = bisect.bisect_left(self.ids, cid)
        if idx < len(self.ids) and _range_min(self.ids[idx]) <= _range_max(cid):
            return True
        return idx > 0 and _range_max(self.ids[idx - 1]) >= _range_min(cid)

    def ranges(self) -> tuple[np.ndarray, np.ndarray]:
        """(range_min, range_max) uint64 arrays — the join build side."""
        arr = np.array(self.ids, dtype=np.uint64)
        return H.range_min(arr), H.range_max(arr)

    def contains_batch(self, leaf_ids: np.ndarray) -> np.ndarray:
        """Vectorized ContainsCellID over a whole column of leaf ids.

        Mirrors the reference's sort.Search: searchsorted against the sorted
        disjoint [range_min, range_max] spans.
        """
        rmin, rmax = self.ranges()
        leaf = np.asarray(leaf_ids, dtype=np.uint64)
        if len(rmin) == 0:
            return np.zeros(len(leaf), dtype=bool)
        pos = np.searchsorted(rmin, leaf, side="right") - 1
        valid = pos >= 0
        pos = np.clip(pos, 0, len(rmin) - 1)
        return valid & (leaf <= rmax[pos])

    def __len__(self) -> int:
        return len(self.ids)

    def __iter__(self):
        return iter(self.ids)

    def __repr__(self) -> str:
        return f"CellUnion({len(self.ids)} cells)"


def _range_min(x: int) -> int:
    return x - (_lsb(x) - 1)


def _range_max(x: int) -> int:
    return x + (_lsb(x) - 1)


def _contains(a: int, b: int) -> bool:
    return _range_min(a) <= b <= _range_max(a)
