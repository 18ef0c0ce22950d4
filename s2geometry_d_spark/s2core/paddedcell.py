"""PaddedCell: a cell with a UV-space padding margin
(s2padded_cell.d:11-141) — the descent primitive the reference's
crossing-edge query and fast covering use to walk the cell hierarchy while
keeping every edge within ``padding`` of a cell visible to that cell.

The useful property (tested): a child built incrementally from its parent
(clip the parent's padded bound at the padded middle) has EXACTLY the same
bound as one built from scratch from the child id, so a recursive descent
never re-derives geometry.  ``shrink_to_fit`` jumps the descent straight to
the smallest cell whose (padded) interior still contains a query rect —
the standard seek in both reference consumers.
"""

from __future__ import annotations

import math

from . import coords
from .cellid import MAX_LEVEL, CellId
from .hilbert import INVERT_MASK, IJ_TO_POS, POS_TO_IJ, POS_TO_ORIENTATION, SWAP_MASK

_EPS = 2.0 ** -52


def _uv_to_ij(u: float) -> int:
    """UV -> clamped leaf ij (STtoIJ(UVtoST(u)) with the library's
    clamped-lround semantics, via the shared coords kernels)."""
    return int(coords.st_to_ij(float(coords.uv_to_st(u))))


class PaddedCell:
    __slots__ = ("id", "padding", "level", "bound", "_middle", "_ij_lo", "orientation")

    def __init__(self, cid: CellId, padding: float):
        self.id = cid
        self.padding = padding
        self._middle = None
        if cid.is_face():
            limit = 1.0 + padding
            self.bound = ((-limit, limit), (-limit, limit))
            self._middle = ((-padding, padding), (-padding, padding))
            self._ij_lo = (0, 0)
            self.orientation = cid.face() & 1
            self.level = 0
        else:
            face, i, j, orient = cid.to_face_ij_orientation()
            self.level = cid.level()
            (ulo, uhi), (vlo, vhi) = cid.get_bound_uv()
            self.bound = (
                (ulo - padding, uhi + padding),
                (vlo - padding, vhi + padding),
            )
            size = cid.get_size_ij()
            self._ij_lo = (i & -size, j & -size)
            self.orientation = orient

    @classmethod
    def _from_parent(cls, parent: "PaddedCell", i: int, j: int) -> "PaddedCell":
        """Child in (i, j) position (each 0/1), reusing the parent's padded
        bound clipped at the padded middle (s2padded_cell.d:31-45)."""
        self = cls.__new__(cls)
        self.padding = parent.padding
        self.level = parent.level + 1
        pos = IJ_TO_POS[parent.orientation][2 * i + j]
        self.id = parent.id.child(pos)
        self._middle = None
        size = 1 << (MAX_LEVEL - self.level)
        self._ij_lo = (parent._ij_lo[0] + i * size, parent._ij_lo[1] + j * size)
        self.orientation = parent.orientation ^ POS_TO_ORIENTATION[pos]
        mid = parent.middle()
        bu = list(parent.bound[0])
        bv = list(parent.bound[1])
        bu[1 - i] = mid[0][1 - i]
        bv[1 - j] = mid[1][1 - j]
        self.bound = (tuple(bu), tuple(bv))
        return self

    def child(self, i: int, j: int) -> "PaddedCell":
        return PaddedCell._from_parent(self, i, j)

    def middle(self):
        """The 2*padding-wide strip between this cell's four children."""
        if self._middle is None:
            size = 1 << (MAX_LEVEL - self.level)
            u = coords.st_to_uv_scalar((2 * self._ij_lo[0] + size) / coords.MAX_SI_TI)
            v = coords.st_to_uv_scalar((2 * self._ij_lo[1] + size) / coords.MAX_SI_TI)
            self._middle = (
                (u - self.padding, u + self.padding),
                (v - self.padding, v + self.padding),
            )
        return self._middle

    def get_child_ij(self, pos: int) -> tuple[int, int]:
        """Traversal position -> (i, j) under this cell's orientation."""
        ij = POS_TO_IJ[self.orientation][pos]
        return ij >> 1, ij & 1

    def shrink_to_fit(self, rect) -> CellId:
        """Smallest descendant (or self) whose interior still contains
        ``rect`` with the padding margin (s2padded_cell.d:73-100).
        REQUIRES: bound intersects rect."""
        size = 1 << (MAX_LEVEL - self.level)
        if self.level == 0:
            if rect[0][0] <= 0 <= rect[0][1] or rect[1][0] <= 0 <= rect[1][1]:
                return self.id
        else:
            u_mid = coords.st_to_uv_scalar((2 * self._ij_lo[0] + size) / coords.MAX_SI_TI)
            v_mid = coords.st_to_uv_scalar((2 * self._ij_lo[1] + size) / coords.MAX_SI_TI)
            if rect[0][0] <= u_mid <= rect[0][1] or rect[1][0] <= v_mid <= rect[1][1]:
                return self.id
        pad = self.padding + 1.5 * _EPS
        padded = (
            (rect[0][0] - pad, rect[0][1] + pad),
            (rect[1][0] - pad, rect[1][1] + pad),
        )
        ij_min = [0, 0]
        ij_xor = [0, 0]
        for d in range(2):
            lo = max(self._ij_lo[d], _uv_to_ij(padded[d][0]))
            hi = min(self._ij_lo[d] + size - 1, _uv_to_ij(padded[d][1]))
            ij_min[d] = lo
            ij_xor[d] = lo ^ hi
        level_msb = ((ij_xor[0] | ij_xor[1]) << 1) + 1
        level = MAX_LEVEL - int(math.floor(math.log2(level_msb)))
        if level <= self.level:
            return self.id
        return CellId.from_face_ij(self.id.face(), ij_min[0], ij_min[1]).parent(level)

    # -- curve geometry ----------------------------------------------------

    def _vertex(self, i: int, j: int) -> tuple[float, float, float]:
        u = coords.st_to_uv_scalar((2 * i) / coords.MAX_SI_TI)
        v = coords.st_to_uv_scalar((2 * j) / coords.MAX_SI_TI)
        x, y, z = coords.face_uv_to_xyz_scalar(self.id.face(), u, v)
        n = math.sqrt(x * x + y * y + z * z)
        return x / n, y / n, z / n

    def get_center(self) -> tuple[float, float, float]:
        size = 1 << (MAX_LEVEL - self.level)
        si = 2 * self._ij_lo[0] + size
        ti = 2 * self._ij_lo[1] + size
        u = coords.st_to_uv_scalar(si / coords.MAX_SI_TI)
        v = coords.st_to_uv_scalar(ti / coords.MAX_SI_TI)
        x, y, z = coords.face_uv_to_xyz_scalar(self.id.face(), u, v)
        n = math.sqrt(x * x + y * y + z * z)
        return x / n, y / n, z / n

    def get_entry_vertex(self) -> tuple[float, float, float]:
        """First vertex of this cell in Hilbert traversal order."""
        i, j = self._ij_lo
        if self.orientation & INVERT_MASK:
            size = 1 << (MAX_LEVEL - self.level)
            i += size
            j += size
        return self._vertex(i, j)

    def get_exit_vertex(self) -> tuple[float, float, float]:
        """Last vertex of this cell in Hilbert traversal order."""
        i, j = self._ij_lo
        size = 1 << (MAX_LEVEL - self.level)
        if self.orientation == 0 or self.orientation == SWAP_MASK + INVERT_MASK:
            i += size
        else:
            j += size
        return self._vertex(i, j)
