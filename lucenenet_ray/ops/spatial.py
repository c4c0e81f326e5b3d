"""Spatial search (Lucene.Net.Spatial analogs).

Reference semantics re-expressed (NOT ported):

- :func:`quad_cell` / :func:`quad_cells` —
  ``Spatial/Prefix/Tree/QuadPrefixTree.cs``: recursive quadrant letters
  per level, 'A' = NW, 'B' = NE, 'C' = SW, 'D' = SE (:182-185
  CheckBattenberg order); a point's level-L cell is the length-L letter
  string, and every prefix is its ancestor cell — the
  RecursivePrefixTreeStrategy token family.

- :func:`bbox_filter` — ``Vector/PointVectorStrategy`` +
  NumericRangeQuery pair (the "two ranges" rectangle): vectorized
  per-batch compares over lat/lon columns (the FieldCache pattern).

- :func:`knn_euclidean` — ``Vector/DistanceValueSource.cs``: squared
  Euclidean degree distance (the strategy's sort key; monotone with the
  true distance for ranking) — per-batch partial top-k against broadcast
  query points, tiny driver merge (the ops/knn.py shape).

Grid coordinates are INTEGER-derived (``x = lon_centi * 2^L // 36000``)
so the engine and the DuckDB oracle agree bit-for-bit with no float
rounding at cell boundaries; only the distance query touches doubles,
and it uses *, +, - exclusively (exact and order-identical in both
engines).

Scale shape: cells are partition keys — hive-partition the corpus by a
coarse cell level and a bbox/radius query prunes whole directories, the
same contract as ops/knn.py (LSH) and ops/ivf.py (IVF) pruning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# deterministic synthetic geo columns for the documents corpus (no geo in
# the testdata): centi-degree ints derived from doc_id — integer exact.
LAT_MULT, LON_MULT = 7919, 104729


def synth_latlon_centi(doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(lat_centi in [-9000, 9000), lon_centi in [-18000, 18000)) int64."""
    d = np.asarray(doc_ids, dtype=np.int64)
    lat = (d * LAT_MULT) % 18000 - 9000
    lon = (d * LON_MULT) % 36000 - 18000
    return lat, lon


def quad_cells_from_centi(lat_centi: np.ndarray, lon_centi: np.ndarray,
                          level: int) -> np.ndarray:
    """Vectorized level-L quad cell strings from centi-degree ints."""
    grid = 1 << level
    x = (np.asarray(lon_centi, dtype=np.int64) + 18000) * grid // 36000
    y = (np.asarray(lat_centi, dtype=np.int64) + 9000) * grid // 18000
    letters = np.empty((len(x), level), dtype="U1")
    for i in range(level):
        shift = level - 1 - i
        xb = (x >> shift) & 1
        yb = (y >> shift) & 1
        # A=NW(x0,y1) B=NE(x1,y1) C=SW(x0,y0) D=SE(x1,y0)
        code = np.where(yb == 1, np.where(xb == 0, "A", "B"),
                        np.where(xb == 0, "C", "D"))
        letters[:, i] = code
    return np.array(["".join(row) for row in letters])


def quad_cell(lat: float, lon: float, level: int) -> str:
    """Single-point cell (QuadPrefixTree letter path)."""
    lat_c = np.asarray([int(round(lat * 100))], dtype=np.int64)
    lon_c = np.asarray([int(round(lon * 100))], dtype=np.int64)
    return quad_cells_from_centi(lat_c, lon_c, level)[0]


def quad_cells(lat: float, lon: float, max_level: int) -> list[str]:
    """All ancestor cells down to max_level (the indexed token family)."""
    full = quad_cell(lat, lon, max_level)
    return [full[:i] for i in range(1, max_level + 1)]


def _cell_bounds(x: int, n: int, total: int, off: int) -> tuple[int, int]:
    """Centi-degree half-open range [lo, hi) of grid slot x out of n:
    inverse of ``(c + off) * n // total`` (ceil boundaries)."""
    lo = -((-x * total) // n) - off
    hi = -((-(x + 1) * total) // n) - off
    return lo, hi


def quad_cover(lat_lo: int, lat_hi: int, lon_lo: int, lon_hi: int,
               max_level: int) -> list[str]:
    """RecursivePrefixTreeStrategy Intersects cell cover
    (``Spatial/Prefix/RecursivePrefixTreeStrategy.cs`` →
    ``IntersectsPrefixTreeFilter.cs`` / AbstractVisitingPrefixTreeFilter
    visit-or-leaf recursion): descend the quad tree from level 1; a cell
    whose bounds lie FULLY inside the query rectangle is emitted at its
    own level (all indexed descendants match by prefix); a partially
    overlapping cell recurses, until ``max_level`` where it is emitted as
    a grid-approximate leaf. Rectangle bounds are INCLUSIVE centi-degree
    ints — all integer math, mirrored by the SQL oracle.

    Returns a prefix-free cover (no cell is an ancestor of another),
    sorted."""
    out: list[str] = []

    def visit(path: str, x: int, y: int, level: int) -> None:
        grid = 1 << level
        lon_a, lon_b = _cell_bounds(x, grid, 36000, 18000)
        lat_a, lat_b = _cell_bounds(y, grid, 18000, 9000)
        if lon_a > lon_hi or lon_b <= lon_lo or lat_a > lat_hi or lat_b <= lat_lo:
            return  # disjoint
        inside = (lon_a >= lon_lo and lon_b - 1 <= lon_hi
                  and lat_a >= lat_lo and lat_b - 1 <= lat_hi)
        if inside or level == max_level:
            out.append(path)
            return
        for dy in (1, 0):
            for dx in (0, 1):
                letter = ("A" if dx == 0 else "B") if dy == 1 else (
                    "C" if dx == 0 else "D")
                visit(path + letter, 2 * x + dx, 2 * y + dy, level + 1)

    for dy in (1, 0):
        for dx in (0, 1):
            letter = ("A" if dx == 0 else "B") if dy == 1 else (
                "C" if dx == 0 else "D")
            visit(letter, dx, dy, 1)
    return sorted(out)


def intersects_filter(docs_ds, cover: list[str], max_level: int,
                      id_col: str = "doc_id"):
    """Docs whose max_level cell starts with any cover prefix — the
    IntersectsPrefixTreeFilter match. Vectorized: one GeoEnrich pass plus
    a pyarrow starts_with OR-fold (cover is small by construction). At
    scale the cover prefixes are partition-prunable ranges
    [p, p+successor) over the hive-partitioned coarse cell key."""
    import pyarrow.compute as pc

    def fil(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        lat_c, lon_c = synth_latlon_centi(ids)
        cells = pa.array(quad_cells_from_centi(lat_c, lon_c, max_level),
                         type=pa.string())
        mask = None
        for p in cover:
            m = pc.starts_with(cells, p)
            mask = m if mask is None else pc.or_(mask, m)
        return batch.filter(mask) if mask is not None else batch.slice(0, 0)

    return docs_ds.map_batches(fil, batch_format="pyarrow")


class GeoEnrich:
    """map_batches stage: append lat/lon (degrees, float64) and the
    level-L quad cell to each doc — the 'index-time' spatial tokens."""

    def __init__(self, level: int = 3, id_col: str = "doc_id"):
        self.level = level
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        lat_c, lon_c = synth_latlon_centi(ids)
        cells = quad_cells_from_centi(lat_c, lon_c, self.level)
        return batch.append_column(
            "lat", pa.array(lat_c.astype(np.float64) / 100.0)
        ).append_column(
            "lon", pa.array(lon_c.astype(np.float64) / 100.0)
        ).append_column("cell", pa.array(cells, type=pa.string()))


def bbox_filter(docs_ds, lat_min: float, lat_max: float, lon_min: float,
                lon_max: float, level: int = 3, id_col: str = "doc_id"):
    """Rectangle intersects-filter: [lat_min, lat_max) × [lon_min, lon_max)
    (half-open like NumericRangeQuery with includeUpper=false)."""
    def fil(batch: pa.Table) -> pa.Table:
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        m = (lat >= lat_min) & (lat < lat_max) & \
            (lon >= lon_min) & (lon < lon_max)
        return batch.filter(pa.array(m))

    return docs_ds.map_batches(GeoEnrich(level, id_col),
                               batch_format="pyarrow") \
                  .map_batches(fil, batch_format="pyarrow")


def knn_euclidean(docs_ds, query_points: np.ndarray, k: int = 10,
                  id_col: str = "doc_id") -> pa.Table:
    """Top-k nearest docs per query point by squared Euclidean degrees
    (DistanceValueSource sort key; *,+,- only → bit-exact in SQL).
    Returns (query_id, rank, doc_id, dist2)."""
    import ray

    from lucenenet_ray.util.tables import dataset_to_table

    qp = np.asarray(query_points, dtype=np.float64)
    qref = ray.put(qp)

    def partial(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        lat = batch.column("lat").to_numpy()
        lon = batch.column("lon").to_numpy()
        out_q, out_id, out_d = [], [], []
        kk = min(k, len(ids))
        for qi in range(q.shape[0]):
            dlat = lat - q[qi, 0]
            dlon = lon - q[qi, 1]
            d2 = dlat * dlat + dlon * dlon
            part = (np.argpartition(d2, kk - 1)[:kk]
                    if kk < len(ids) else np.arange(len(ids)))
            order = part[np.lexsort((ids[part], d2[part]))]
            out_q.extend([qi] * len(order))
            out_id.extend(ids[order].tolist())
            out_d.extend(d2[order].tolist())
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "doc_id": pa.array(out_id, type=pa.int64()),
            "dist2": pa.array(out_d, type=pa.float64()),
        })

    t = dataset_to_table(
        docs_ds.map_batches(GeoEnrich(1, id_col), batch_format="pyarrow")
               .map_batches(partial, batch_format="pyarrow"),
        schema=pa.schema([("query_id", pa.int64()), ("doc_id", pa.int64()),
                          ("dist2", pa.float64())]))
    q = t.column("query_id").to_numpy()
    v = t.column("doc_id").to_numpy()
    d = t.column("dist2").to_numpy()
    rows = []
    for qi in range(qp.shape[0]):
        m = q == qi
        order = np.lexsort((v[m], d[m]))[:k]
        for r, j in enumerate(order, 1):
            rows.append((qi, r, int(v[m][j]), float(d[m][j])))
    return pa.table({
        "query_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "rank": pa.array([r[1] for r in rows], type=pa.int64()),
        "doc_id": pa.array([r[2] for r in rows], type=pa.int64()),
        "dist2": pa.array([r[3] for r in rows], type=pa.float64()),
    })


# ---------------------------------------------------------------------------
# Geohash prefix tree (Prefix/Tree/GeohashPrefixTree.cs; the encoding
# itself is Niemeyer's public geohash algorithm, implemented by the
# Spatial4n dependency the reference tree delegates to)

_GEOHASH_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: float, lon: float, precision: int = 12) -> str:
    """Standard base-32 geohash: bits alternate lon/lat (lon first),
    grouped 5 per character."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits = []
    even = True
    while len(bits) < precision * 5:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                bits.append(1)
                lon_lo = mid
            else:
                bits.append(0)
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                bits.append(1)
                lat_lo = mid
            else:
                bits.append(0)
                lat_hi = mid
        even = not even
    out = []
    for i in range(precision):
        v = 0
        for b in bits[i * 5:i * 5 + 5]:
            v = (v << 1) | b
        out.append(_GEOHASH_B32[v])
    return "".join(out)


def geohash_cells(lat: float, lon: float, max_precision: int) -> list[str]:
    """Ancestor-prefix token family (GeohashPrefixTree.GetCell levels)."""
    full = geohash_encode(lat, lon, max_precision)
    return [full[:i] for i in range(1, max_precision + 1)]


class GeohashEnrich:
    """map_batches stage: append the precision-P geohash of the synthetic
    coords — GeohashPrefixTree tokens as a partition-key column."""

    def __init__(self, precision: int = 4, id_col: str = "doc_id"):
        self.precision = precision
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        lat_c, lon_c = synth_latlon_centi(ids)
        gh = [geohash_encode(la / 100.0, lo / 100.0, self.precision)
              for la, lo in zip(lat_c.tolist(), lon_c.tolist())]
        return batch.append_column("geohash", pa.array(gh, type=pa.string()))
