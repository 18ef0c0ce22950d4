"""Region coverer: approximate any region by <= max_cells cell ids.

Priority-queue subdivision with the reference's exact heuristic so that
covering output is deterministic and reproducible (SURVEY.md §2.6):
seed with a <=4-cell fast covering of the region's bound, repeatedly pop
the largest / least-covered candidate, expand children that may intersect,
finish with normalize + denormalize.  Semantics studied from
vnayar/s2geometry-d src/s2/s2region_coverer.d:254-346,500-800;
independent python re-expression.

Regions are any objects exposing ``contains_cell(Cell)``,
``may_intersect_cell(Cell)`` and ``cell_union_bound() -> list[CellId]``
(see regions.py).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

from . import cellunion
from .cellid import MAX_LEVEL, CellId
from .regions import Cell


@dataclass
class CovererOptions:
    max_cells: int = 8
    min_level: int = 0
    max_level: int = MAX_LEVEL
    level_mod: int = 1

    def true_max_level(self) -> int:
        if self.level_mod == 1:
            return self.max_level
        return self.max_level - (self.max_level - self.min_level) % self.level_mod


@dataclass
class _Candidate:
    cell: Cell
    is_terminal: bool
    children: list = field(default_factory=list)

    @property
    def num_children(self) -> int:
        return len(self.children)


class RegionCoverer:
    def __init__(self, options: CovererOptions | None = None):
        self.options = options or CovererOptions()
        self._region = None
        self._interior = False
        self._result: list[int] = []
        self._pq: list = []
        self._seq = 0  # deterministic tie-break for equal priorities

    # -- public API -------------------------------------------------------
    def get_covering(self, region) -> list[int]:
        self._interior = False
        return self._get_covering_internal(region)

    def get_interior_covering(self, region) -> list[int]:
        self._interior = True
        return self._get_covering_internal(region)

    def get_fast_covering(self, region) -> list[int]:
        ids = [c.id for c in region.cell_union_bound()]
        return self.canonicalize_covering(ids)

    # -- core loop ----------------------------------------------------------
    def _get_covering_internal(self, region) -> list[int]:
        self._region = region
        self._result = []
        self._pq = []
        self._seq = 0

        self._get_initial_candidates()
        opts = self.options
        while self._pq and (not self._interior or len(self._result) < opts.max_cells):
            _, _, cand = heapq.heappop(self._pq)
            # Expand if we're below min_level, have a single child, or the
            # child count still fits the budget; else emit as terminal.
            if (
                self._interior
                or cand.cell.level < opts.min_level
                or cand.num_children == 1
                or len(self._result) + len(self._pq) + cand.num_children <= opts.max_cells
            ):
                for child in cand.children:
                    if not self._interior or len(self._result) < opts.max_cells:
                        self._add_candidate(child)
            else:
                cand.is_terminal = True
                self._add_candidate(cand)

        self._pq = []
        self._region = None

        result = cellunion.normalize(self._result)
        if opts.min_level > 0 or opts.level_mod > 1:
            result = cellunion.denormalize(result, opts.min_level, opts.level_mod)
        self._result = []
        return result

    # -- candidates -----------------------------------------------------------
    def _new_candidate(self, cell: Cell) -> _Candidate | None:
        if not self._region.may_intersect_cell(cell):
            return None
        is_terminal = False
        opts = self.options
        if cell.level >= opts.min_level:
            if self._interior:
                if self._region.contains_cell(cell):
                    is_terminal = True
                elif cell.level + opts.level_mod > opts.max_level:
                    return None
            else:
                if cell.level + opts.level_mod > opts.max_level or self._region.contains_cell(cell):
                    is_terminal = True
        return _Candidate(cell=cell, is_terminal=is_terminal)

    def _max_children_shift(self) -> int:
        return 2 * self.options.level_mod

    def _add_candidate(self, cand: _Candidate | None) -> None:
        if cand is None:
            return
        if cand.is_terminal:
            self._result.append(cand.cell.cell_id.id)
            return

        # Expand one level at a time until min_level so we don't skip it.
        num_levels = 1 if cand.cell.level < self.options.min_level else self.options.level_mod
        num_terminals = self._expand_children(cand, cand.cell, num_levels)

        if cand.num_children == 0:
            # No child may-intersects: drop the candidate entirely (the
            # reference's DeleteCandidate path) — a dead pq entry would
            # inflate the budget test below and force others terminal early.
            return
        if (
            not self._interior
            and num_terminals == 1 << self._max_children_shift()
            and cand.cell.level >= self.options.min_level
        ):
            # All children terminal: emit the parent instead.
            cand.is_terminal = True
            self._add_candidate(cand)
        else:
            # Priority: largest cells first; among equals, fewest intersecting
            # children; then fewest terminal children.  heapq is a min-heap so
            # the (positive) key pops smallest first — exactly this ordering.
            shift = self._max_children_shift()
            priority = (((cand.cell.level << shift) + cand.num_children) << shift) + num_terminals
            self._seq += 1
            heapq.heappush(self._pq, (priority, self._seq, cand))

    def _expand_children(self, cand: _Candidate, cell: Cell, num_levels: int) -> int:
        num_levels -= 1
        num_terminals = 0
        for child_cell in cell.subdivide():
            if num_levels > 0:
                if self._region.may_intersect_cell(child_cell):
                    num_terminals += self._expand_children(cand, child_cell, num_levels)
                continue
            child = self._new_candidate(child_cell)
            if child is not None:
                cand.children.append(child)
                if child.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _get_initial_candidates(self) -> None:
        tmp = RegionCoverer(
            CovererOptions(
                max_cells=min(4, self.options.max_cells),
                max_level=self.options.max_level,
            )
        )
        ids = tmp.get_fast_covering(self._region)
        ids = self._adjust_cell_levels(ids)
        for cid in ids:
            self._add_candidate(self._new_candidate(Cell(CellId(cid))))

    # -- level adjustment / canonicalization ----------------------------------
    def _adjust_level(self, level: int) -> int:
        opts = self.options
        if opts.level_mod > 1 and level > opts.min_level:
            level -= (level - opts.min_level) % opts.level_mod
        return level

    def _adjust_cell_levels(self, ids: list[int]) -> list[int]:
        if self.options.level_mod == 1:
            return ids
        out: list[int] = []
        for cid in ids:
            c = CellId(cid)
            level = c.level()
            new_level = self._adjust_level(level)
            if new_level != level:
                c = c.parent(new_level)
            if out and CellId(out[-1]).contains(c):
                continue
            while out and c.contains(CellId(out[-1])):
                out.pop()
            out.append(c.id)
        return out

    def canonicalize_covering(self, ids: list[int]) -> list[int]:
        """Force an arbitrary id list to conform to the options."""
        opts = self.options
        ids = list(ids)
        if opts.max_level < MAX_LEVEL or opts.level_mod > 1:
            for k, cid in enumerate(ids):
                c = CellId(cid)
                level = c.level()
                new_level = self._adjust_level(min(level, opts.max_level))
                if new_level != level:
                    ids[k] = c.parent(new_level).id
        ids = cellunion.normalize(ids)
        if opts.min_level > 0 or opts.level_mod > 1:
            ids = cellunion.denormalize(ids, opts.min_level, opts.level_mod)

        excess = len(ids) - opts.max_cells
        if excess <= 0 or self.is_canonical(ids):
            return ids
        if excess * len(ids) > 10000:
            return self.get_covering(_CellUnionRegion(ids))
        # Repeatedly merge the adjacent pair with the deepest common ancestor.
        while len(ids) > opts.max_cells:
            best_index, best_level = -1, -1
            for i in range(len(ids) - 1):
                level = _common_ancestor_level(ids[i], ids[i + 1])
                level = self._adjust_level(level)
                if level > best_level:
                    best_level, best_index = level, i
            if best_level < opts.min_level:
                break
            anc = CellId(ids[best_index]).parent(best_level)
            ids = _replace_with_ancestor(ids, anc)
            while best_level > opts.min_level:
                best_level -= opts.level_mod
                anc = anc.parent(best_level)
                if not _contains_all_children(ids, anc, opts.level_mod):
                    break
                ids = _replace_with_ancestor(ids, anc)
        return ids

    def is_canonical(self, ids: list[int]) -> bool:
        opts = self.options
        min_level, max_level, level_mod = opts.min_level, opts.true_max_level(), opts.level_mod
        too_many = len(ids) > opts.max_cells
        same_parent_count = 1
        prev: CellId | None = None
        for cid in ids:
            c = CellId(cid)
            if not c.is_valid():
                return False
            level = c.level()
            if level < min_level or level > max_level:
                return False
            if level_mod > 1 and (level - min_level) % level_mod != 0:
                return False
            if prev is not None:
                if prev.range_max().id >= c.range_min().id:
                    return False
                if too_many and _common_ancestor_level(prev.id, cid) >= min_level:
                    return False
                plevel = level - level_mod
                if plevel < min_level or level != prev.level() or (
                    c.parent(plevel).id != prev.parent(plevel).id
                ):
                    same_parent_count = 1
                else:
                    same_parent_count += 1
                    if same_parent_count == 1 << (2 * level_mod):
                        return False
            prev = c
        return True


def flood_fill(region, start: CellId) -> list[int]:
    """All edge-connected cells at start's level intersecting the region
    (s2region_coverer.d:334-346)."""
    seen = {start.id}
    frontier = [start]
    out: list[int] = []
    while frontier:
        cid = frontier.pop()
        if not region.may_intersect_cell(Cell(cid)):
            continue
        out.append(cid.id)
        for nbr in cid.get_edge_neighbors():
            if nbr.id not in seen:
                seen.add(nbr.id)
                frontier.append(nbr)
    return out


def get_simple_covering(region, start_point, level: int) -> list[int]:
    """Fixed-level BFS covering from a seed point (s2region_coverer.d:315-331)."""
    start = CellId.from_point(*start_point).parent(level)
    return flood_fill(region, start)


class _CellUnionRegion:
    """Adapter so a normalized cell-id list can be re-covered."""

    def __init__(self, ids: list[int]):
        self.ids = ids

    def contains_cell(self, cell: Cell) -> bool:
        return cellunion.contains_id(self.ids, cell.cell_id.id)

    def may_intersect_cell(self, cell: Cell) -> bool:
        return cellunion.intersects_id(self.ids, cell.cell_id.id)

    def cell_union_bound(self) -> list[CellId]:
        # Sound seed: the union itself when small, else all six faces.
        if 0 < len(self.ids) <= 6:
            return [CellId(c) for c in self.ids]
        return [CellId.from_face(f) for f in range(6)]


def _common_ancestor_level(a: int, b: int) -> int:
    ca, cb = CellId(a), CellId(b)
    bits = max(a ^ b, max(ca.lsb(), cb.lsb()))
    return max(60 - (bits.bit_length() - 1), -1) >> 1


def _replace_with_ancestor(ids: list[int], anc: CellId) -> list[int]:
    lo, hi = anc.range_min().id, anc.range_max().id
    return [c for c in ids if c < lo] + [anc.id] + [c for c in ids if c > hi]


def _contains_all_children(ids: list[int], anc: CellId, level_mod: int) -> bool:
    import bisect

    level = anc.level() + level_mod
    child = anc.child_begin(level)
    end = anc.child_end(level)
    i = bisect.bisect_left(ids, anc.range_min().id)
    while child.id != end.id:
        if i >= len(ids) or ids[i] != child.id:
            return False
        i += 1
        child = child.next()
    return True
