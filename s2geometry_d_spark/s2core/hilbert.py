"""Hilbert-curve orientation and 4-bit block lookup tables.

The S2 cell id maps (face, i, j) leaf coordinates to a position on a
face-local Hilbert curve, 4 bits of i/j at a time through two 1024-entry
lookup tables.  Semantics follow the public S2 design as studied in the
reference library (vnayar/s2geometry-d: src/s2/s2coords.d:476-512 for the
orientation tables, src/s2/s2cell_id.d:1140-1237 for the block tables);
this is an independent numpy/python re-expression, not a port.
"""

from __future__ import annotations

import numpy as np

SWAP_MASK = 0x01
INVERT_MASK = 0x02
LOOKUP_BITS = 4

# IJ_TO_POS[orientation][ij] -> pos ; POS_TO_IJ[orientation][pos] -> ij
IJ_TO_POS = (
    (0, 1, 3, 2),
    (0, 3, 1, 2),
    (2, 3, 1, 0),
    (2, 1, 3, 0),
)
POS_TO_IJ = (
    (0, 1, 3, 2),
    (0, 2, 3, 1),
    (3, 2, 0, 1),
    (3, 1, 0, 2),
)
POS_TO_ORIENTATION = (SWAP_MASK, 0, 0, INVERT_MASK | SWAP_MASK)


def _build_tables() -> tuple[np.ndarray, np.ndarray]:
    lookup_pos = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)
    lookup_ij = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.uint64)

    def recurse(level: int, i: int, j: int, orig_orient: int, pos: int, orient: int) -> None:
        if level == LOOKUP_BITS:
            ij = (i << LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orient] = (pos << 2) + orient
            lookup_ij[(pos << 2) + orig_orient] = (ij << 2) + orient
            return
        i2, j2, pos2 = i << 1, j << 1, pos << 2
        r = POS_TO_IJ[orient]
        for idx in range(4):
            recurse(
                level + 1,
                i2 + (r[idx] >> 1),
                j2 + (r[idx] & 1),
                orig_orient,
                pos2 + idx,
                orient ^ POS_TO_ORIENTATION[idx],
            )

    for orientation in range(4):
        recurse(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


LOOKUP_POS, LOOKUP_IJ = _build_tables()
# Plain-python tuple copies for the scalar (int) code paths: indexing a numpy
# array with a python int returns np.uint64, which poisons later arithmetic
# under NEP-50-less numpy; tuples of ints avoid that.
LOOKUP_POS_PY = tuple(int(x) for x in LOOKUP_POS)
LOOKUP_IJ_PY = tuple(int(x) for x in LOOKUP_IJ)
