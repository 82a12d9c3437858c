"""Dependency-free planar geometry kernel over WKT.

The reference's geospatial operators (petk/exploration.py:52-66,
petk/validation.py:11-60) use shapely/geopandas/pyproj. None of those
libraries exist in this environment, so the kernel implements the
required subset — WKT parsing, bounds, centroids, geometry-type/Z
introspection, ring self-intersection validity, bbox intersection,
multi-part explode, and a spherical transverse-Mercator projection for
metric area/length — in pure Python. It is deliberately isolated behind
this module so shapely or Apache Sedona can slot in unchanged
(SURVEY §7.M6).

Everything here is driver-free: the functions are called from
Arrow-batched pandas UDFs (geo/kernel.py), one Python call per
geometry, vectorized per batch.

Supported types: POINT, LINESTRING, POLYGON, MULTIPOINT,
MULTILINESTRING, MULTIPOLYGON (+ Z variants), EMPTY.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass, field


@dataclass
class Geom:
    """Parsed geometry: ``parts`` is a list of single-part geometries;
    each part is a list of rings (polygons) or one coordinate list
    (points/linestrings). Coordinates are (x, y[, z]) tuples."""

    geom_type: str  # normalized single-part type: Point/LineString/Polygon
    multi: bool
    has_z: bool
    parts: list = field(default_factory=list)

    @property
    def display_type(self) -> str:
        return ("Multi" if self.multi else "") + self.geom_type


_TYPE_RE = re.compile(
    r"^\s*(MULTIPOLYGON|MULTILINESTRING|MULTIPOINT|POLYGON|LINESTRING|POINT)"
    r"\s*(Z|ZM|M)?\s*(EMPTY|\(.*\))\s*$",
    re.IGNORECASE | re.DOTALL,
)


def _parse_coord_seq(body: str, has_z: bool) -> list[tuple]:
    coords = []
    for tok in body.split(","):
        nums = [float(v) for v in tok.split()]
        coords.append(tuple(nums[: 3 if has_z else 2]))
    return coords


def _split_groups(body: str) -> list[str]:
    """Split a parenthesized group list at depth 0: '(a),(b)' → ['a','b']."""
    out, depth, start = [], 0, None
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                out.append(body[start:i])
    return out


def parse_wkt(wkt: str | None) -> Geom | None:
    """Parse WKT → Geom, or None for null/unparseable input."""
    if wkt is None:
        return None
    m = _TYPE_RE.match(wkt)
    if not m:
        return None
    t = m.group(1).upper()
    zflag = (m.group(2) or "").upper()
    body = m.group(3)
    has_z = "Z" in zflag
    empty = body.upper() == "EMPTY"

    multi = t.startswith("MULTI")
    base = t[5:] if multi else t
    geom_type = {"POINT": "Point", "LINESTRING": "LineString", "POLYGON": "Polygon"}[base]
    g = Geom(geom_type, multi, has_z)
    if empty:
        return g

    inner = body[1:-1]
    try:
        if base == "POINT":
            if multi:
                # MULTIPOINT((1 2),(3 4)) or MULTIPOINT(1 2, 3 4)
                groups = _split_groups(inner)
                if groups:
                    pts = [_parse_coord_seq(grp, has_z)[0] for grp in groups]
                else:
                    pts = _parse_coord_seq(inner, has_z)
                g.parts = [[p] for p in pts]
            else:
                pt = _parse_coord_seq(inner, has_z)[0]
                if not has_z and len(pt) < 3:
                    # Probe for an un-flagged Z (POINT Z written without space etc.)
                    nums = [float(v) for v in inner.split()]
                    if len(nums) >= 3:
                        g.has_z = True
                        pt = tuple(nums[:3])
                g.parts = [[pt]]
        elif base == "LINESTRING":
            if multi:
                g.parts = [
                    [_parse_coord_seq(grp, has_z)] for grp in _split_groups(inner)
                ]
                g.parts = [p[0] for p in g.parts]
            else:
                g.parts = [_parse_coord_seq(inner, has_z)]
        else:  # POLYGON
            if multi:
                g.parts = [
                    [_parse_coord_seq(ring, has_z) for ring in _split_groups(poly)]
                    for poly in _split_groups(inner)
                ]
            else:
                g.parts = [
                    [_parse_coord_seq(ring, has_z) for ring in _split_groups(inner)]
                ]
    except (ValueError, IndexError):
        return None
    return g


# ---------------------------------------------------------------------------
# Introspection
# ---------------------------------------------------------------------------

def _iter_coords(g: Geom):
    if g.geom_type == "Polygon":
        for part in g.parts:
            for ring in part:
                yield from ring
    else:
        for part in g.parts:
            yield from part


def bounds(g: Geom | None) -> tuple | None:
    """(minx, miny, maxx, maxy) — shapely ``.bounds`` equivalent."""
    if g is None:
        return None
    xs, ys = [], []
    for c in _iter_coords(g):
        xs.append(c[0])
        ys.append(c[1])
    if not xs:
        return None
    return (min(xs), min(ys), max(xs), max(ys))


def _ring_area_centroid(ring: list[tuple]) -> tuple[float, float, float]:
    """Signed shoelace area + area-weighted centroid of one ring."""
    a = cx = cy = 0.0
    n = len(ring)
    for i in range(n - 1):
        x0, y0 = ring[i][0], ring[i][1]
        x1, y1 = ring[i + 1][0], ring[i + 1][1]
        cross = x0 * y1 - x1 * y0
        a += cross
        cx += (x0 + x1) * cross
        cy += (y0 + y1) * cross
    a *= 0.5
    if a == 0:
        return 0.0, 0.0, 0.0
    return a, cx / (6 * a), cy / (6 * a)


def centroid(g: Geom | None) -> tuple[float, float] | None:
    """Area/length/point-weighted centroid — shapely ``.centroid``
    semantics for the supported types."""
    if g is None or not g.parts:
        return None
    if g.geom_type == "Point":
        xs = [p[0][0] for p in g.parts]
        ys = [p[0][1] for p in g.parts]
        return (sum(xs) / len(xs), sum(ys) / len(ys))
    if g.geom_type == "LineString":
        tot = wx = wy = 0.0
        for part in g.parts:
            for i in range(len(part) - 1):
                x0, y0 = part[i][0], part[i][1]
                x1, y1 = part[i + 1][0], part[i + 1][1]
                seg = math.hypot(x1 - x0, y1 - y0)
                tot += seg
                wx += seg * (x0 + x1) / 2
                wy += seg * (y0 + y1) / 2
        if tot == 0:
            c = next(_iter_coords(g))
            return (c[0], c[1])
        return (wx / tot, wy / tot)
    # Polygon: outer rings positive, holes negative (shoelace signs work
    # out as long as ring orientations follow convention; we use |area|
    # for outer and subtract holes explicitly).
    tot = wx = wy = 0.0
    for part in g.parts:
        for ri, ring in enumerate(part):
            a, cx, cy = _ring_area_centroid(ring)
            a = abs(a) * (1 if ri == 0 else -1)
            tot += a
            wx += a * cx
            wy += a * cy
    if tot == 0:
        c = next(_iter_coords(g))
        return (c[0], c[1])
    return (wx / tot, wy / tot)


# ---------------------------------------------------------------------------
# Validity (ring self-intersection — the reference's dominant failure
# mode via shapely explain_validity, petk/validation.py:30-34)
# ---------------------------------------------------------------------------

def _segments_intersect(p1, p2, p3, p4) -> tuple[float, float] | None:
    """Proper intersection point of open segments p1p2 and p3p4 (touching
    at shared endpoints does not count), else None."""
    d1x, d1y = p2[0] - p1[0], p2[1] - p1[1]
    d2x, d2y = p4[0] - p3[0], p4[1] - p3[1]
    den = d1x * d2y - d1y * d2x
    if den == 0:
        return None
    t = ((p3[0] - p1[0]) * d2y - (p3[1] - p1[1]) * d2x) / den
    u = ((p3[0] - p1[0]) * d1y - (p3[1] - p1[1]) * d1x) / den
    eps = 1e-12
    if eps < t < 1 - eps and eps < u < 1 - eps:
        return (p1[0] + t * d1x, p1[1] + t * d1y)
    return None


def explain_validity(g: Geom | None) -> str | None:
    """None if valid; else a shapely-style reason string
    ('Self-intersection[x y]', 'Too few points in geometry component',
    'Null geometry')."""
    if g is None:
        return "Null geometry"
    if g.geom_type != "Polygon":
        if g.geom_type == "LineString":
            for part in g.parts:
                if len(part) < 2:
                    return "Too few points in geometry component"
        return None
    for part in g.parts:
        for ring in part:
            if len(ring) < 4:
                return "Too few points in geometry component"
            if ring[0][:2] != ring[-1][:2]:
                return "Ring not closed"
            segs = [(ring[i], ring[i + 1]) for i in range(len(ring) - 1)]
            for i in range(len(segs)):
                for j in range(i + 1, len(segs)):
                    pt = _segments_intersect(*segs[i], *segs[j])
                    if pt is not None:
                        return f"Self-intersection[{pt[0]} {pt[1]}]"
    return None


# ---------------------------------------------------------------------------
# BBox intersection (D3) — geopandas .cx slice semantics
# ---------------------------------------------------------------------------

def intersects_bbox(g: Geom | None, xmin, xmax, ymin, ymax) -> bool:
    """Envelope-intersects test, matching geopandas' .cx coordinate
    slice (which selects by bounding-box intersection)."""
    if g is None:
        return False
    b = bounds(g)
    if b is None:
        return False
    return not (b[2] < xmin or b[0] > xmax or b[3] < ymin or b[1] > ymax)


# ---------------------------------------------------------------------------
# Metric projection + sliver detection (D5)
# ---------------------------------------------------------------------------

_R = 6371007.0  # mean Earth radius (m)
_K0 = 0.9996


def _utm_project(lon: float, lat: float, zone: int) -> tuple[float, float]:
    """Spherical transverse Mercator (public-formula approximation of
    epsg:326xx; adequate for threshold-style sliver detection — the
    reference reprojects via pyproj, petk/validation.py:54)."""
    lon0 = math.radians(zone * 6 - 183)
    lam = math.radians(lon) - lon0
    phi = math.radians(lat)
    b = math.cos(phi) * math.sin(lam)
    b = max(min(b, 1 - 1e-12), -1 + 1e-12)
    x = 0.5 * _R * _K0 * math.log((1 + b) / (1 - b)) + 500_000
    y = _R * _K0 * (math.atan2(math.tan(phi), math.cos(lam)) - phi) + _R * _K0 * phi
    return x, y


def epsg_zone(epsg: int) -> int:
    """UTM zone from an epsg:326xx / 327xx code."""
    return epsg % 100


def explode(g: Geom) -> list[Geom]:
    """Multi-part → list of single-part geoms (geopandas .explode)."""
    out = []
    for part in g.parts:
        out.append(Geom(g.geom_type, False, g.has_z, [part]))
    return out


def _project_part(part, geom_type: str, zone: int):
    if geom_type == "Polygon":
        return [
            [_utm_project(c[0], c[1], zone) for c in ring] for ring in part
        ]
    return [_utm_project(c[0], c[1], zone) for c in part]


def part_measure(g: Geom, zone: int) -> tuple[str, float]:
    """(kind, measure) of a single-part geometry in metric space:
    ('polygon', area m²), ('line', length m), ('point', 0)."""
    part = g.parts[0]
    if g.geom_type == "Polygon":
        proj = _project_part(part, "Polygon", zone)
        area = 0.0
        for ri, ring in enumerate(proj):
            a, _, _ = _ring_area_centroid(ring)
            area += abs(a) * (1 if ri == 0 else -1)
        return "polygon", area
    if g.geom_type == "LineString":
        proj = _project_part(part, "LineString", zone)
        length = sum(
            math.hypot(proj[i + 1][0] - proj[i][0], proj[i + 1][1] - proj[i][1])
            for i in range(len(proj) - 1)
        )
        return "line", length
    return "point", 0.0


def sliver_count(g: Geom | None, threshold: float, epsg: int) -> int:
    """Number of degenerate parts: polygon area < t m² or line length
    < t m after metric reprojection; points never (petk/tools.py:112-118,
    petk/validation.py:53-60)."""
    if g is None:
        return 0
    zone = epsg_zone(epsg)
    n = 0
    for part in explode(g):
        kind, m = part_measure(part, zone)
        if kind in ("polygon", "line") and m < threshold:
            n += 1
    return n
