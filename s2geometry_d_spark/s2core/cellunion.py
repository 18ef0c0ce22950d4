"""Cell unions: sorted vectors of non-overlapping cell ids.

Normalization, denormalization and set algebra over python-int id lists
(driver-side; the Spark-side equivalents are exploded-row set operations in
operators/).  Semantics studied from the reference
(vnayar/s2geometry-d src/s2/s2cell_union.d:136-179,375-498,743-874);
independent re-expression.
"""

from __future__ import annotations

from .cellid import MAX_LEVEL, CellId

_MASK64 = (1 << 64) - 1


def _lsb(cid: int) -> int:
    return cid & (-cid & _MASK64)


def _range_min(cid: int) -> int:
    return cid - (_lsb(cid) - 1)


def _range_max(cid: int) -> int:
    return cid + (_lsb(cid) - 1)


def _level(cid: int) -> int:
    return MAX_LEVEL - ((_lsb(cid).bit_length() - 1) >> 1)


def _parent(cid: int, level: int) -> int:
    nl = 1 << (2 * (MAX_LEVEL - level))
    return ((cid & -nl) | nl) & _MASK64


def _are_siblings(a: int, b: int, c: int, d: int) -> bool:
    """True if a,b,c,d are the four children of a common parent, in order."""
    # Necessary: the xor of the four sibling ids is zero (the two
    # child-position bits take all four values, parent bits cancel).
    if (a ^ b ^ c) != d:
        return False
    # Exact: all four agree on every bit above the child-position bits,
    # and d is not a face cell (faces have no parent).
    mask = _lsb(d) << 1
    mask = ~(mask + (mask << 1)) & _MASK64
    idm = d & mask
    is_face = (d & ((1 << 61) - 1)) == (1 << 60)
    return (a & mask) == idm and (b & mask) == idm and (c & mask) == idm and not is_face


def normalize(ids: list[int]) -> list[int]:
    """Sort, drop contained cells, merge complete sibling quadruples."""
    out: list[int] = []
    for cid in sorted(ids):
        if out and _range_max(out[-1]) >= cid:  # contained by previous
            if _range_min(out[-1]) <= cid <= _range_max(out[-1]):
                continue
        while out and _range_min(cid) <= out[-1] <= _range_max(cid):
            out.pop()
        while len(out) >= 3 and _are_siblings(out[-3], out[-2], out[-1], cid):
            cid = _parent(cid, _level(cid) - 1)
            del out[-3:]
        out.append(cid)
    return out


def denormalize(ids: list[int], min_level: int, level_mod: int) -> list[int]:
    """Expand cells so every level is >= min_level and
    (level - min_level) % level_mod == 0."""
    out: list[int] = []
    for cid in ids:
        level = _level(cid)
        new_level = max(min_level, level)
        if level_mod > 1:
            new_level += (MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(MAX_LEVEL, new_level)
        if new_level == level:
            out.append(cid)
        else:
            c = CellId(cid)
            cur = c.child_begin(new_level)
            end = c.child_end(new_level)
            while cur.id != end.id:
                out.append(cur.id)
                cur = cur.next()
    return out


def is_normalized(ids: list[int]) -> bool:
    for i, cid in enumerate(ids):
        if i and _range_max(ids[i - 1]) >= _range_min(cid):
            return False
        if i >= 3 and _are_siblings(ids[i - 3], ids[i - 2], ids[i - 1], cid):
            return False
    return True


def contains_id(ids: list[int], target: int) -> bool:
    """Binary search containment of one cell id in a normalized union."""
    import bisect

    i = bisect.bisect_right(ids, target)
    if i < len(ids) and _range_min(ids[i]) <= target:
        return True
    return i > 0 and _range_max(ids[i - 1]) >= target


def intersects_id(ids: list[int], target: int) -> bool:
    import bisect

    i = bisect.bisect_right(ids, _range_max(target))
    if i < len(ids) and _range_min(ids[i]) <= _range_max(target):
        return True
    return i > 0 and _range_max(ids[i - 1]) >= _range_min(target)


def contains_point(ids: list[int], lat_deg: float, lng_deg: float) -> bool:
    return contains_id(ids, CellId.from_latlng(lat_deg, lng_deg).id)


def union(x: list[int], y: list[int]) -> list[int]:
    return normalize(list(x) + list(y))


def intersection(x: list[int], y: list[int]) -> list[int]:
    """Merge-with-skips intersection of two normalized unions: keep the
    smaller cell wherever ranges overlap."""
    import bisect

    out: list[int] = []
    i = j = 0
    while i < len(x) and j < len(y):
        imin = _range_min(x[i])
        jmin = _range_min(y[j])
        if imin > jmin:
            # either y[j] contains x[i], or they are disjoint
            if x[i] <= _range_max(y[j]):
                out.append(x[i])
                i += 1
            else:
                # skip to the first y[k] >= imin; the one before it may
                # still contain x[i]
                j = bisect.bisect_left(y, imin, j + 1)
                if x[i] <= _range_max(y[j - 1]):
                    j -= 1
        elif jmin > imin:
            if y[j] <= _range_max(x[i]):
                out.append(y[j])
                j += 1
            else:
                i = bisect.bisect_left(x, jmin, i + 1)
                if y[j] <= _range_max(x[i - 1]):
                    i -= 1
        else:
            # same range_min: one contains the other; keep the smaller cell
            if x[i] < y[j]:
                out.append(x[i])
                i += 1
            else:
                out.append(y[j])
                j += 1
    return out  # intersection of normalized unions is normalized


def difference(x: list[int], y: list[int]) -> list[int]:
    """x \\ y by divide and conquer on each cell of x."""
    out: list[int] = []

    def recurse(cid: int) -> None:
        if not intersects_id(y, cid):
            out.append(cid)
            return
        if contains_id(y, cid):
            return
        for child in CellId(cid).children():
            recurse(child.id)

    for cid in x:
        recurse(cid)
    return normalize(out)


def from_begin_end(begin: int, end: int) -> list[int]:
    """Normalized union covering the leaf range [begin, end) — the
    'maximumTile' tiling primitive (s2cell_id.d:673-700, s2cell_union.d:136-179)."""
    out: list[int] = []
    cid = begin  # a leaf id (odd); end is the leaf-iterator sentinel
    while cid < end:
        c = maximum_tile(cid, end)
        out.append(c)
        cid = _range_max(c) + 2  # next leaf id
    return normalize(out)


def maximum_tile(cid: int, limit: int) -> int:
    """Largest cell starting at cid's range_min that ends before ``limit``
    (s2cell_id.d:673-700)."""
    start = _range_min(cid)
    if start >= _range_min(limit):
        return limit
    if _range_max(cid) >= limit:
        # too large: shrink via first children
        c = CellId(cid)
        while True:
            c = c.child(0)
            if _range_max(c.id) < limit:
                return c.id
    # may be too small: grow while the parent stays aligned and bounded
    c = CellId(cid)
    while c.level() > 0:
        p = c.parent(c.level() - 1)
        if p.range_min().id != start or p.range_max().id >= limit:
            break
        c = p
    return c.id


def expand_at_level(ids: list[int], expand_level: int) -> list[int]:
    """Expand a normalized union so it contains everything within the width
    of level-``expand_level`` cells: cells finer than expand_level coarsen
    to their expand_level parent, then every cell's all-neighbors at
    expand_level are added (s2cell_union.d Expand(int), :516-540)."""
    from .cellid import CellId

    out: list[int] = []
    level_lsb = 1 << (2 * (30 - expand_level))
    i = len(ids) - 1
    while i >= 0:
        cid = CellId(ids[i])
        if cid.lsb() < level_lsb:
            cid = cid.parent(expand_level)
            # skip siblings already covered by this parent
            while i > 0 and CellId(ids[i - 1]).parent(expand_level) == cid:
                i -= 1
        out.append(cid.id)
        out.extend(n.id for n in cid.append_all_neighbors(max(expand_level, cid.level())))
        i -= 1
    return normalize(out)


def expand_by_radius(
    ids: list[int], min_radius_radians: float, max_level_diff: int = 0
) -> list[int]:
    """Buffered covering: expand the union so it contains all points within
    ``min_radius_radians`` of it (s2cell_union.d Expand(S1Angle),
    :541-560).  ``max_level_diff`` bounds how much finer than the union's
    coarsest cell the expansion cells may be (0 = same level: fastest,
    coarsest result)."""
    from . import metrics
    from .cellid import CellId

    if not ids:
        return []
    min_level = min(CellId(c).level() for c in ids)
    radius_level = metrics.MIN_WIDTH.get_level_for_min_value(min_radius_radians)
    if radius_level == 0 and min_radius_radians > metrics.MIN_WIDTH.get_value(0):
        # radius wider than a face cell: two face-level expansions
        ids = expand_at_level(ids, 0)
        return expand_at_level(ids, 0)
    return expand_at_level(ids, min(min_level + max_level_diff, radius_level))


def exact_area(ids: list[int]) -> float:
    """Sum of exact cell areas (s2cell_union.d:566-606 ExactArea)."""
    import numpy as np

    from . import cellid

    if not ids:
        return 0.0
    return float(cellid.cells_exact_area(np.array(ids, dtype=np.uint64)).sum())


def average_area(ids: list[int]) -> float:
    """Sum of AVG_AREA metric values (AverageBasedArea)."""
    import numpy as np

    from . import cellid

    if not ids:
        return 0.0
    return float(cellid.cells_average_area(np.array(ids, dtype=np.uint64)).sum())


def leaf_count(ids: list[int]) -> int:
    """Number of leaf cells covered; lsb(id) == 4^(30-level) == leaves."""
    return sum(_lsb(c) for c in ids)
