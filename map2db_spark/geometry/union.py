"""Union of same-feature geometry fragments across tiles (G5,
map2db.py:776-784).

The reference computes ``fragment.union(stored)`` with GEOS.  In the
map2db dataflow the operands are always *tile-clipped fragments of one
source geometry*: disjoint interiors that share boundary segments
along tile edges, with coordinates snapped to the microdegree grid.
That special structure admits an exact, GEOS-free union:

- points: set union;
- lines: concatenate parts, dropping exact duplicates (a line lying
  exactly on a shared tile edge is emitted by both tiles);
- polygons: edge-cancellation dissolve — orient all rings
  consistently, node edges at shared vertices, cancel opposite
  directed edges (the shared tile-boundary runs), re-chain the
  remaining edges into rings, classify shells vs holes by signed
  area and containment.

All predicates run on integer microdegree coordinates (exact), never
on floats.  The operation is commutative and associative, so it is a
safe distributed aggregate (any combine order gives the same result
after normalization).
"""

from __future__ import annotations

from collections import defaultdict

from map2db_spark.geometry.normalize import (
    normalize_line,
    normalize_multilinestring,
    normalize_multipoint,
    normalize_multipolygon,
)

SCALE = 1_000_000


def _to_int(p):
    return (int(round(p[0] * SCALE)), int(round(p[1] * SCALE)))


def _to_float(p):
    return (p[0] / SCALE, p[1] / SCALE)


def union_points(fragments):
    """fragments: iterable of point lists -> deduped sorted point list."""
    out = set()
    for frag in fragments:
        out.update(frag)
    return normalize_multipoint(out)


def union_lines(fragments):
    """fragments: iterable of line-part lists -> concatenated parts with
    exact duplicates dropped."""
    seen = set()
    out = []
    for frag in fragments:
        for part in frag:
            key = tuple(normalize_line(list(part)))
            if key not in seen:
                seen.add(key)
                out.append(list(part))
    return normalize_multilinestring(out)


def _ring_area2_int(ring) -> int:
    s = 0
    for i in range(len(ring) - 1):
        x0, y0 = ring[i]
        x1, y1 = ring[i + 1]
        s += x0 * y1 - x1 * y0
    return s


def _orient(ring, ccw: bool):
    closed = ring if ring[0] == ring[-1] else ring + [ring[0]]
    area2 = _ring_area2_int(closed)
    if area2 == 0:
        return None
    if (area2 > 0) != ccw:
        closed = closed[::-1]
    return closed


def _on_segment(a, b, p) -> bool:
    """p strictly between a and b, collinear (integer-exact)."""
    if p == a or p == b:
        return False
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if cross != 0:
        return False
    return (
        min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
        and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
    )


def _point_in_ring(p, ring) -> bool:
    """Even-odd rule, integer-exact; boundary counts as inside."""
    x, y = p
    inside = False
    for i in range(len(ring) - 1):
        a, b = ring[i], ring[i + 1]
        if p == a or _on_segment(a, b, p):
            return True
        if (a[1] > y) != (b[1] > y):
            # x < x-coordinate of edge at height y (exact rational compare)
            xnum = (b[0] - a[0]) * (y - a[1])
            xden = b[1] - a[1]
            lhs = (x - a[0]) * xden
            if xden > 0:
                if lhs < xnum:
                    inside = not inside
            else:
                if lhs > xnum:
                    inside = not inside
    return inside


def union_polygons(fragments):
    """fragments: iterable of polygon lists (each polygon = rings list,
    shell first) -> dissolved polygon list (float coords)."""
    polys = [poly for frag in fragments for poly in frag]
    if len(polys) == 1:
        return normalize_multipolygon(polys)

    # 1. orient (shells CCW, holes CW) and convert to exact integers
    directed = []  # directed edges (u, v)
    for rings in polys:
        for k, ring in enumerate(rings):
            r = _orient([_to_int(p) for p in ring], ccw=(k == 0))
            if r is None:
                continue
            for i in range(len(r) - 1):
                if r[i] != r[i + 1]:
                    directed.append((r[i], r[i + 1]))

    # 2. node edges at any vertex lying on them (shared-boundary splits)
    vertices = set()
    for u, v in directed:
        vertices.add(u)
        vertices.add(v)
    noded = []
    for u, v in directed:
        splits = [p for p in vertices if _on_segment(u, v, p)]
        if not splits:
            noded.append((u, v))
            continue
        if u[0] != v[0]:
            splits.sort(key=lambda p: p[0], reverse=u[0] > v[0])
        else:
            splits.sort(key=lambda p: p[1], reverse=u[1] > v[1])
        chain = [u] + splits + [v]
        for i in range(len(chain) - 1):
            noded.append((chain[i], chain[i + 1]))

    # 3. cancel opposite directed pairs (shared boundary disappears)
    count: dict = defaultdict(int)
    for e in noded:
        count[e] += 1
    survivors = []
    for (u, v), n in sorted(count.items()):
        m = count.get((v, u), 0)
        keep = n - min(n, m)
        survivors.extend([(u, v)] * keep)

    # 4. chain into rings (leftmost-turn walk keeps rings simple at
    #    degree>2 junctions)
    out_edges: dict = defaultdict(list)
    for u, v in survivors:
        out_edges[u].append(v)
    for u in out_edges:
        out_edges[u].sort()

    def take_next(u, incoming):
        cands = out_edges[u]
        if not cands:
            return None
        if incoming is None or len(cands) == 1:
            return cands.pop(0)
        # face traversal at a junction: take the first edge CLOCKWISE
        # from the reverse of the incoming direction — with CCW shells
        # this keeps the interior on the left and closes each ring
        # instead of crossing over at a touching vertex
        import math

        rev = math.atan2(incoming[1] - u[1], incoming[0] - u[0])

        def cw_delta(v):
            ang = math.atan2(v[1] - u[1], v[0] - u[0])
            d = (rev - ang) % (2 * math.pi)
            return d if d > 1e-12 else 2 * math.pi

        best = min(range(len(cands)), key=lambda i: cw_delta(cands[i]))
        return cands.pop(best)

    rings = []
    starts = sorted(out_edges.keys())
    for start in starts:
        while out_edges[start]:
            ring = [start]
            prev = None
            cur = start
            while True:
                nxt = take_next(cur, prev)
                if nxt is None:
                    ring = None
                    break
                ring.append(nxt)
                prev, cur = cur, nxt
                if cur == start:
                    break
            if ring and len(ring) >= 4:
                rings.append(ring)
            elif ring is None:
                break

    # 5. classify: CCW = shell, CW = hole; attach holes to containing shell
    shells = []
    holes = []
    for r in rings:
        a2 = _ring_area2_int(r)
        if a2 > 0:
            shells.append(r)
        elif a2 < 0:
            holes.append(r)
    result = []
    for s in shells:
        result.append([[_to_float(p) for p in s]])
    for h in holes:
        probe = h[0]
        for i, s in enumerate(shells):
            if _point_in_ring(probe, s):
                result[i].append([_to_float(p) for p in h])
                break
    return normalize_multipolygon(result)
