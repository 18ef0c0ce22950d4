"""`covering(region_spec)` as a COLUMN kernel (SURVEY §2.11's last listed
UDF): region specs arrive as ROWS — (kind, params, max_cells) — and each
row yields its RegionCoverer covering as an array of signed cell ids.

The driver-side coverer (spatial_join.compute_coverings) is right for a
handful of query regions; this kernel is the dimension-side-at-scale form —
a TABLE of millions of region specs covers in parallel across executors,
feeding the same covering-join machinery (explode + equi-join) with no
driver geometry.  Reference: s2region_coverer.d:60-66 over the region
kinds of s2cap.d / s2latlng_rect.d.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.ArrayType(T.LongType()))
def covering_cells(
    kind: pd.Series, params: pd.Series, max_cells: pd.Series
) -> pd.Series:
    """kind: 'cap' (params [lat, lng, radius_deg]) or 'rect'
    (params [lat_lo, lat_hi, lng_lo, lng_hi], degrees, lng may wrap).
    Returns the covering as signed-flipped int64 cell ids."""
    from ..s2core.coverer import CovererOptions, RegionCoverer
    from ..s2core.regions import Cap, LatLngRect

    flip = np.uint64(1 << 63)
    out = []
    for k, p, mc in zip(kind, params, max_cells):
        if k == "cap":
            region = Cap.from_latlng_radius(float(p[0]), float(p[1]), float(p[2]))
        elif k == "rect":
            region = LatLngRect.from_degrees(
                float(p[0]), float(p[1]), float(p[2]), float(p[3])
            )
        else:
            out.append([])
            continue
        cov = RegionCoverer(CovererOptions(max_cells=int(mc))).get_covering(region)
        out.append([int(np.int64(np.uint64(c) ^ flip)) for c in cov])
    return pd.Series(out)
