"""Boolean operations on spherical loops: union / intersection / difference.

Classic crossing-split-stitch on the sphere, re-derived from the
BooleanOperation semantics (s2/boolean_operation.go:24-201) but built on
the *robust* crossing/intersection machinery of the core files rather
than the reference's admittedly stubbed Builder path (s2/builder.go:149
"A full implementation of edge splitting is omitted" — see SURVEY.md
provenance note):

1. find all boundary crossings (robust CrossingSign cascade);
2. compute each crossing point (normalized cross of the two edge
   normals, oriented to the segment side — s2/edge_crossings.go:172-250
   simple-intersection form);
3. split both boundaries at their crossings, classify every arc by a
   midpoint PIP against the other loop;
4. keep arcs per the operation's rule and stitch them back into closed
   loops at the crossing points.

Scope: generic position (no shared vertices, boundaries cross
transversally) — the covering/term machinery upstream never feeds
degenerate pairs here without flagging.  Verified by point-sampling
differentials (membership in the result == boolean of memberships),
which is stronger than fixture vectors: it checks the *region*, not the
vertex list.
"""

from __future__ import annotations

import math

import numpy as np

from geo_spark.kernel import predicates as pred
from geo_spark.kernel.pip import loop_contains_points, loop_origin_inside
from geo_spark.kernel.relations import loop_relation


def robust_crossing(a0, a1, b0, b1) -> bool:
    """Strict interior crossing via the triage/exact cascade."""
    acb = -int(pred.robust_sign(a0, a1, b0)[0])
    bda = int(pred.robust_sign(a0, a1, b1)[0])
    if acb != bda or acb == 0:
        return False
    cbd = -int(pred.robust_sign(b0, b1, a1)[0])
    dac = int(pred.robust_sign(b0, b1, a0)[0])
    return cbd == acb and dac == acb


def _exact_intersection_dir(a0, a1, b0, b1) -> np.ndarray:
    """cross(cross(a0,a1), cross(b0,b1)) in exact rational arithmetic
    (the ExactIntersection tier of s2/edge_crossings.go:322-378, with
    Fraction standing in for big.Float).  Floats are exact rationals,
    so the result direction carries no conditioning error; only the
    final Fraction->float conversion rounds."""
    from fractions import Fraction as Fr

    av0 = [Fr(float(c)) for c in a0]
    av1 = [Fr(float(c)) for c in a1]
    bv0 = [Fr(float(c)) for c in b0]
    bv1 = [Fr(float(c)) for c in b1]

    def cross(u, v):
        return [
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0],
        ]

    x = cross(cross(av0, av1), cross(bv0, bv1))
    # scale to a representable float range before converting (rational
    # magnitudes here can be ~1e-32 for near-parallel inputs)
    mx = max(abs(c) for c in x)
    if mx == 0:
        # edges exactly on one great circle: pre-screened as crossing,
        # so this cannot happen for valid inputs
        raise ValueError("coincident great circles in edge_intersection")
    return np.array([float(c / mx) for c in x], dtype=np.float64)


def edge_intersection(a0, a1, b0, b1) -> np.ndarray:
    """Intersection point of two crossing edges: the unit vector on both
    great circles, oriented to the segment side (s2/edge_crossings.go
    :172-250).  The double-precision cross-of-crosses direction error
    grows as eps/sin(theta) for edges meeting at angle theta; below
    sin(theta) ~ 1e-3 that error crosses the stitch-key resolution
    (_key rounds at 1e-12), so ill-conditioned pairs fall back to the
    exact rational tier (the stable->exact cascade of the reference)."""
    na = np.cross(a0, a1)
    nb = np.cross(b0, b1)
    x = np.cross(na, nb)
    norm = math.sqrt(x @ x)
    # conditioning: norm == |na||nb| sin(theta)
    scale = math.sqrt(float(na @ na)) * math.sqrt(float(nb @ nb))
    if norm <= 1e-3 * scale:
        x = _exact_intersection_dir(a0, a1, b0, b1)
        norm = math.sqrt(x @ x)
    x = x / norm
    # Orient toward the segments: the true crossing point has positive
    # dot with the sum of all four endpoints' midpoint direction.
    if float(x @ (a0 + a1 + b0 + b1)) < 0:
        x = -x
    return x


def _split_chain(
    verts: np.ndarray,
    crossings: dict[int, list[np.ndarray]],
    vertex_keys: set[tuple] | None = None,
):
    """Closed chain -> list of arcs between consecutive crossing points.

    crossings maps edge index -> interior crossing points on that edge;
    ``vertex_keys`` marks chain vertices that are themselves crossing
    points (shared-vertex crossings).  Each arc is (points list,
    start_key, end_key) with rounded-tuple keys for stitching."""
    vertex_keys = vertex_keys or set()
    n = len(verts)
    path: list[tuple[np.ndarray, tuple | None]] = []
    for i in range(n):
        a = verts[i]
        b = verts[(i + 1) % n]
        ka = _key(a)
        path.append((a, ka if ka in vertex_keys else None))
        pts = crossings.get(i, [])
        pts = sorted(pts, key=lambda p: float((p - a) @ (p - a)))
        for p in pts:
            path.append((p, _key(p)))
    # rotate so the path starts at a crossing (if any)
    start = next((k for k, (_, key) in enumerate(path) if key is not None), None)
    if start is None:
        return [([p for p, _ in path], None, None)]
    path = path[start:] + path[:start]
    arcs = []
    current = [path[0][0]]
    current_start = path[0][1]
    for p, key in path[1:]:
        current.append(p)
        if key is not None:
            arcs.append((current, current_start, key))
            current = [p]
            current_start = key
    current.append(path[0][0])
    arcs.append((current, current_start, path[0][1]))
    return arcs


def _key(p: np.ndarray) -> tuple:
    return (round(float(p[0]), 12), round(float(p[1]), 12), round(float(p[2]), 12))


def _arc_midpoint(arc: list[np.ndarray]) -> np.ndarray:
    # a point strictly inside the arc: midpoint of the longest segment
    best = None
    best_d = -1.0
    for i in range(len(arc) - 1):
        d = float((arc[i] - arc[i + 1]) @ (arc[i] - arc[i + 1]))
        if d > best_d:
            best_d = d
            best = 0.5 * (arc[i] + arc[i + 1])
    best = best / math.sqrt(best @ best)
    return best


# Probe points used to classify an arc/edge against the OTHER region must
# stay clear of that region's vertices: a probe landing on (or within the
# side-probe offset of) a vertex of the other boundary sits exactly on the
# membership discontinuity — the shared-vertex tangency family, where one
# region's boundary passes through the other's vertex without crossing.
_PROBE_CLEARANCE = 2e-8


def _clear_of(p: np.ndarray, avoid: np.ndarray | None) -> bool:
    if avoid is None or len(avoid) == 0:
        return True
    d2 = ((avoid - p) ** 2).sum(axis=1).min()
    return float(d2) > _PROBE_CLEARANCE * _PROBE_CLEARANCE


def _arc_probes(
    arc: list[np.ndarray], avoid: np.ndarray | None, k: int = 3
) -> list[np.ndarray]:
    """Up to ``k`` points strictly inside the arc, spread across its longest
    segments, each at least _PROBE_CLEARANCE (chord) from every ``avoid``
    vertex.  Falls back to the plain longest-segment midpoint when the whole
    arc runs within clearance of the avoid set (then the arc is a seam and
    is classified elsewhere)."""
    order = sorted(
        range(len(arc) - 1),
        key=lambda i: -float((arc[i] - arc[i + 1]) @ (arc[i] - arc[i + 1])),
    )
    out: list[np.ndarray] = []
    for i in order:
        for t in (0.5, 0.381966, 0.618034):
            p = (1.0 - t) * arc[i] + t * arc[i + 1]
            p = p / math.sqrt(p @ p)
            if _clear_of(p, avoid):
                out.append(p)
                if len(out) >= k:
                    return out
    return out if out else [_arc_midpoint(arc)]


def _stitch(arcs: list[tuple[list[np.ndarray], tuple, tuple]]) -> list[np.ndarray]:
    """Join arcs end-key -> start-key into closed loops.

    A junction where ≥2 arcs end and ≥2 start (a shared vertex that is a
    VertexCrossing of the two boundaries) makes the pairing ambiguous;
    any choice closes the same point set into rings, but may thread two
    lobes into one self-touching "bowtie" ring.  Bowties break the
    XOR-parity contract (origin_inside of a self-touching ring is
    ill-defined), so after assembly every ring is split at repeated
    vertices back into simple loops — parity membership is invariant
    under that split."""
    by_start: dict[tuple, list[int]] = {}
    for i, arc in enumerate(arcs):
        by_start.setdefault(arc[1], []).append(i)
    loops = []
    used: set[int] = set()
    for idx in range(len(arcs)):
        if idx in used:
            continue
        ring: list[np.ndarray] = []
        i = idx
        while i is not None and i not in used:
            used.add(i)
            ring.extend(arcs[i][0][:-1])
            candidates = [j for j in by_start.get(arcs[i][2], []) if j not in used]
            i = candidates[0] if candidates else None
        if len(ring) >= 3:
            for simple in _split_at_repeats(_dedup_ring(np.array(ring))):
                loops.append(simple)
    return [r for r in loops if len(r) >= 3]


def _split_at_repeats(ring: np.ndarray) -> list[np.ndarray]:
    """Split a closed ring at any vertex that occurs more than once into
    simple sub-rings (same total parity membership)."""
    keys = [_key(p) for p in ring]
    seen: dict[tuple, int] = {}
    for i, k in enumerate(keys):
        if k in seen:
            j = seen[k]
            lobe = ring[j:i]
            rest = np.concatenate([ring[:j], ring[i:]])
            out = []
            if len(lobe) >= 3:
                out.extend(_split_at_repeats(lobe))
            if len(rest) >= 3:
                out.extend(_split_at_repeats(rest))
            return out
        seen[k] = i
    return [ring] if len(ring) >= 3 else []


def _dedup_ring(ring: np.ndarray) -> np.ndarray:
    keep = [0]
    for i in range(1, len(ring)):
        if not np.allclose(ring[i], ring[keep[-1]], atol=1e-14):
            keep.append(i)
    if len(keep) > 1 and np.allclose(ring[keep[-1]], ring[keep[0]], atol=1e-14):
        keep.pop()
    return ring[keep]


def _insert_collinear_splits(a_verts: np.ndarray, b_verts: np.ndarray):
    """Detect partial collinear overlaps and return augmented vertex
    arrays with the other chain's strictly-interior endpoints inserted
    (exact copies), or (None, None) when there is nothing to insert.

    Collinearity is decided exactly (triage filter, then the exact
    determinant WITHOUT symbolic perturbation — perturbed RobustSign
    never reports 0); betweenness along the minor arc reduces to two
    chordal dot-product signs for distinct on-circle points."""
    from geo_spark.kernel import predicates as pred
    from geo_spark.kernel.pip import _eq

    def splits_for(verts, others):
        n = len(verts)
        ins: dict[int, list[np.ndarray]] = {}
        for i in range(n):
            a0, a1 = verts[i], verts[(i + 1) % n]
            for p in others:
                if _eq(p, a0) or _eq(p, a1):
                    continue
                if int(pred.triage_sign(a0[None], a1[None], p[None])[0]) != 0:
                    continue
                if pred.exact_sign_scalar(a0, a1, p, perturb=False) != 0:
                    continue
                if (
                    float((p - a0) @ (a1 - a0)) > 0
                    and float((p - a1) @ (a0 - a1)) > 0
                ):
                    ins.setdefault(i, []).append(p)
        return ins

    ins_a = splits_for(a_verts, b_verts)
    ins_b = splits_for(b_verts, a_verts)
    if not ins_a and not ins_b:
        return None, None

    def augment(verts, ins):
        out = []
        for i in range(len(verts)):
            a0 = verts[i]
            out.append(a0)
            pts = ins.get(i, [])
            pts.sort(key=lambda p: float((p - a0) @ (p - a0)))
            out.extend(pts)
        return np.array(out)

    return augment(a_verts, ins_a), augment(b_verts, ins_b)


def loop_boolean(
    a_verts: np.ndarray, b_verts: np.ndarray, op: str
) -> list[np.ndarray]:
    """op in {'union','intersection','difference'}; returns result loops
    (CCW rings).  Difference = A minus B."""
    a_verts = np.atleast_2d(np.asarray(a_verts, dtype=np.float64))
    b_verts = np.atleast_2d(np.asarray(b_verts, dtype=np.float64))
    # snap-round B onto A (see _snap_rings): near-coincident boundaries
    # must become exactly coincident before the crossing machinery runs
    snapped = _snap_rings([b_verts], [a_verts])
    if not snapped:
        # B collapsed below the snap tolerance: treat as empty region
        if op == "union" or op == "difference":
            return [a_verts]
        if op == "intersection":
            return []
        raise ValueError(op)
    b_verts = snapped[0]
    a_oi = loop_origin_inside(a_verts)
    b_oi = loop_origin_inside(b_verts)
    na, nb = len(a_verts), len(b_verts)

    # Degenerate pre-pass 1 — identical vertex cycles (exact): the cases
    # the reference's AI-ported BooleanOperation ignores
    # (s2/boolean_operation.go:122-124); here A==B collapses exactly.
    a_keys = [_key(v) for v in a_verts]
    b_keys = [_key(v) for v in b_verts]
    if na == nb and set(a_keys) == set(b_keys):
        try:
            off = b_keys.index(a_keys[0])
        except ValueError:
            off = -1
        if off >= 0 and all(
            b_keys[(off + i) % nb] == a_keys[i] for i in range(na)
        ):
            if op == "union" or op == "intersection":
                return [a_verts]
            if op == "difference":
                return []
            raise ValueError(op)

    # Degenerate pre-pass 1b — partial collinear overlaps: when an edge
    # of one loop lies on the other's great circle and their spans
    # overlap without matching vertices, insert the other edge's interior
    # endpoints (exact copies) into the chain and restart once.  After
    # augmentation every coincident stretch is vertex-for-vertex aligned,
    # so the whole-edge seam machinery below handles it; insertion can
    # only add vertices already present in the other chain, so the
    # second pass inserts nothing and terminates.
    aug_a, aug_b = _insert_collinear_splits(a_verts, b_verts)
    if aug_a is not None:
        return loop_boolean(aug_a, aug_b, op)

    # Degenerate pre-pass 2 — exact seam edges: an A edge coinciding
    # vertex-for-vertex with a B edge (either direction).  Seams are
    # excluded from crossing detection (a coincident pair is not a
    # crossing), force chain splits at their endpoints, and are
    # classified after splitting by probing the other loop just off the
    # edge's left/right side — the numeric stand-in for the symbolic
    # degeneracy handling of the C++ S2BooleanOperation.  Only
    # whole-edge coincidence is handled; partial collinear overlap
    # remains out of scope (documented in SURVEY §8.1).
    b_edge_by_keys: dict[tuple[tuple, tuple], int] = {}
    for j in range(nb):
        b_edge_by_keys[(b_keys[j], b_keys[(j + 1) % nb])] = j
    seam_pairs: dict[int, int] = {}  # a-edge idx -> b-edge idx
    seam_arc_keys: set[tuple[tuple, tuple]] = set()
    seam_b_edges: set[int] = set()
    vkeys: set[tuple] = set()
    for i in range(na):
        ek = (a_keys[i], a_keys[(i + 1) % na])
        j = b_edge_by_keys.get(ek)
        if j is None:
            j = b_edge_by_keys.get((ek[1], ek[0]))
        if j is not None:
            seam_pairs[i] = j
            seam_b_edges.add(j)
            seam_arc_keys.add(ek)
            seam_arc_keys.add((ek[1], ek[0]))
            vkeys.add(ek[0])
            vkeys.add(ek[1])

    # All pairwise crossings: strict interior crossings plus shared-vertex
    # crossings (the VertexCrossing parity rule, s2/edge_crossings.go:117-142
    # — the loopA/loopB fixture family crosses exactly at shared vertices).
    from geo_spark.kernel.pip import _eq, _vertex_crossing

    cross_a: dict[int, list[np.ndarray]] = {}
    cross_b: dict[int, list[np.ndarray]] = {}
    found = bool(seam_pairs)
    for i in range(na):
        a0, a1 = a_verts[i], a_verts[(i + 1) % na]
        for j in range(nb):
            if seam_pairs.get(i) == j:
                continue  # coincident edges are a seam, not a crossing
            b0, b1 = b_verts[j], b_verts[(j + 1) % nb]
            if robust_crossing(a0, a1, b0, b1):
                x = edge_intersection(a0, a1, b0, b1)
                cross_a.setdefault(i, []).append(x)
                cross_b.setdefault(j, []).append(x)
                found = True
            elif (
                _eq(a0, b0) or _eq(a0, b1) or _eq(a1, b0) or _eq(a1, b1)
            ) and _vertex_crossing(a0, a1, b0, b1):
                shared = a0 if (_eq(a0, b0) or _eq(a0, b1)) else a1
                vkeys.add(_key(shared))
                found = True

    if not found:
        # No boundary crossings: pure containment cases.
        a_in_b, _ = loop_relation(b_verts, b_oi, a_verts, a_oi)  # b contains a
        b_in_a, _ = loop_relation(a_verts, a_oi, b_verts, b_oi)
        disjoint = not (a_in_b or b_in_a) and not bool(
            loop_contains_points(a_verts, a_oi, b_verts[:1])[0]
        )
        if op == "union":
            if b_in_a:
                return [a_verts]
            if a_in_b:
                return [b_verts]
            return [a_verts, b_verts]
        if op == "intersection":
            if b_in_a:
                return [b_verts]
            if a_in_b:
                return [a_verts]
            return []
        if op == "difference":
            if a_in_b:
                return []
            if b_in_a:
                # Hole under the XOR-parity convention (the polygon
                # containment rule, s2/polygon.go:591-613): the hole ring
                # keeps its orientation; parity subtracts it.
                return [a_verts, b_verts]
            return [a_verts]
        raise ValueError(op)

    a_arcs = _split_chain(a_verts, cross_a, vkeys)
    b_arcs = _split_chain(b_verts, cross_b, vkeys)

    def is_seam(arc) -> bool:
        # seam endpoints are vkeys, so every seam edge is its own
        # two-point arc; a longer arc between the same endpoints is a
        # different path, so the edge-pair match requires exactly 2 pts
        pts, s, e = arc
        return len(pts) == 2 and s is not None and (s, e) in seam_arc_keys

    _SEAM_EPS = 1e-8

    def keep_seam(arc) -> bool:
        """Classify A's copy of a coincident edge by probing B just off
        the edge's sides (rings are CCW: A's interior lies left).
        union: boundary iff the right side is outside B; intersection:
        iff B's interior is also on the left; difference: iff B's
        interior is NOT on the left.  Majority-voted across probe
        positions along the edge: a single position can sit within
        _SEAM_EPS of an unrelated feature (isolated tangency) and
        classify the wrong side."""
        pts, _, _ = arc
        p0, p1 = pts[0], pts[1]
        nrm = np.cross(p0, p1)
        nrm = nrm / math.sqrt(nrm @ nrm)
        ts = (0.5, 0.381966, 0.618034)
        votes = 0
        for t in ts:
            mid = (1.0 - t) * p0 + t * p1
            mid = mid / math.sqrt(mid @ mid)
            left = mid + _SEAM_EPS * nrm
            left = left / math.sqrt(left @ left)
            right = mid - _SEAM_EPS * nrm
            right = right / math.sqrt(right @ right)
            if op == "union":
                keep = not bool(
                    loop_contains_points(b_verts, b_oi, right[None, :])[0]
                )
            elif op == "intersection":
                keep = bool(
                    loop_contains_points(b_verts, b_oi, left[None, :])[0]
                )
            else:  # difference
                keep = not bool(
                    loop_contains_points(b_verts, b_oi, left[None, :])[0]
                )
            votes += int(keep)
        return votes >= 2

    def keep_rule(arc, other_verts, other_oi, want_inside):
        mid = _arc_midpoint(arc[0])
        inside = bool(loop_contains_points(other_verts, other_oi, mid[None, :])[0])
        return inside == want_inside

    # A's seam copies are classified by the side probe; B's copies of
    # the same geometry are always dropped (one representative).
    a_seams = [a for a in a_arcs if is_seam(a)]
    a_arcs = [a for a in a_arcs if not is_seam(a)]
    b_arcs = [b for b in b_arcs if not is_seam(b)]

    kept = [a for a in a_seams if keep_seam(a)]
    if op == "union":
        kept += [a for a in a_arcs if keep_rule(a, b_verts, b_oi, False)]
        kept += [b for b in b_arcs if keep_rule(b, a_verts, a_oi, False)]
    elif op == "intersection":
        kept += [a for a in a_arcs if keep_rule(a, b_verts, b_oi, True)]
        kept += [b for b in b_arcs if keep_rule(b, a_verts, a_oi, True)]
    elif op == "difference":
        kept += [a for a in a_arcs if keep_rule(a, b_verts, b_oi, False)]
        # B's arcs inside A, reversed.
        for arc, s, e in b_arcs:
            if keep_rule((arc, s, e), a_verts, a_oi, True):
                kept.append((arc[::-1], e, s))
    else:
        raise ValueError(op)

    return _stitch(kept)


# Snap radius for the pre-overlay vertex merge (chord units, ~6 mm on
# Earth).  The overlay's double-precision edge intersection degrades as
# 1/sin(angle) for nearly-parallel edges; merging vertices closer than
# SNAP_RADIUS turns near-coincident boundaries into *exactly* coincident
# ones, which the identical-cycle / seam / shared-vertex pre-passes
# handle symbolically.  This is the numeric stand-in for S2Builder's
# snap-function contract (s2/builder.go:63-118: vertices within
# snapRadius are merged before edges are assembled).
SNAP_RADIUS = 1e-9


def _snap_rings(b_rings: list, a_rings: list, eps: float = SNAP_RADIUS) -> list:
    """Replace every B vertex lying within ``eps`` (chord distance) of an
    A vertex with that A vertex exactly; collapse consecutive duplicates.
    Rings reduced below 3 distinct vertices are dropped (they enclose
    area < eps^2 — below the snap tolerance by construction)."""
    if not a_rings or not b_rings:
        return b_rings
    anchors = np.concatenate(a_rings)
    out = []
    for r in b_rings:
        # (nb, na) squared chord distances, vectorized
        d2 = ((r[:, None, :] - anchors[None, :, :]) ** 2).sum(axis=2)
        j = np.argmin(d2, axis=1)
        hit = d2[np.arange(len(r)), j] < eps * eps
        snapped = np.where(hit[:, None], anchors[j], r)
        snapped = _dedup_ring(snapped)
        if len(snapped) >= 3:
            out.append(snapped)
    return out


def _snap_insert_vertices(
    target_rings: list, source_rings: list, eps: float = SNAP_RADIUS
) -> list:
    """Vertex-EDGE snap tier: every source vertex lying within ``eps``
    of a target edge's interior (but not near its endpoints) is
    inserted into that edge as an exact chain vertex.  Afterwards a
    source edge running along the target edge matches it vertex-for-
    vertex and falls into the exact seam machinery — the case
    vertex-vertex snapping cannot see (edges coincide to ~1e-20 while
    their vertices are far apart).  Perturbs the target boundary by at
    most eps, the same contract as the vertex merge
    (s2/builder.go:63-118 snap-rounding semantics)."""
    if not source_rings or not target_rings:
        return target_rings
    src = np.concatenate(source_rings)
    out = []
    for r in target_rings:
        n = len(r)
        ins: dict[int, list[np.ndarray]] = {}
        for i in range(n):
            a0, a1 = r[i], r[(i + 1) % n]
            nrm = np.cross(a0, a1)
            nn = math.sqrt(nrm @ nrm)
            if nn == 0:
                continue
            nrm = nrm / nn
            d = np.abs(src @ nrm)
            t0 = (src - a0) @ (a1 - a0)
            t1 = (src - a1) @ (a0 - a1)
            e0 = ((src - a0) ** 2).sum(axis=1)
            e1 = ((src - a1) ** 2).sum(axis=1)
            m = (
                (d < eps)
                & (t0 > 0)
                & (t1 > 0)
                & (e0 > eps * eps)
                & (e1 > eps * eps)
            )
            if m.any():
                ins.setdefault(i, []).extend(src[k] for k in np.nonzero(m)[0])
        out.append(_augment_ring(r, ins) if ins else r)
    return out


def _parity_contains(prepped: list, pts: np.ndarray) -> np.ndarray:
    """XOR-parity membership over a list of (verts, origin_inside)."""
    inside = np.zeros(len(np.atleast_2d(pts)), dtype=bool)
    for v, oi in prepped:
        inside ^= loop_contains_points(v, oi, np.atleast_2d(pts))
    return inside


def _collect_collinear_splits(rings: list, other_verts: np.ndarray):
    """Per-ring edge -> strictly-interior other-chain endpoints lying on
    the edge's great circle (the multi-ring form of the loop pre-pass)."""
    from geo_spark.kernel import predicates as pred
    from geo_spark.kernel.pip import _eq

    out = []
    any_ins = False
    for verts in rings:
        n = len(verts)
        ins: dict[int, list[np.ndarray]] = {}
        for i in range(n):
            a0, a1 = verts[i], verts[(i + 1) % n]
            for p in other_verts:
                if _eq(p, a0) or _eq(p, a1):
                    continue
                if int(pred.triage_sign(a0[None], a1[None], p[None])[0]) != 0:
                    continue
                if pred.exact_sign_scalar(a0, a1, p, perturb=False) != 0:
                    continue
                if (
                    float((p - a0) @ (a1 - a0)) > 0
                    and float((p - a1) @ (a0 - a1)) > 0
                ):
                    ins.setdefault(i, []).append(p)
                    any_ins = True
        out.append(ins)
    return out, any_ins


def _augment_ring(verts: np.ndarray, ins: dict) -> np.ndarray:
    out = []
    for i in range(len(verts)):
        a0 = verts[i]
        out.append(a0)
        pts = ins.get(i, [])
        pts.sort(key=lambda p: float((p - a0) @ (p - a0)))
        out.extend(pts)
    return np.array(out)


def polygon_boolean(a_rings: list, b_rings: list, op: str) -> list[np.ndarray]:
    """Boolean operation between two multi-ring regions under the
    XOR-parity convention (shells and holes alike; s2/polygon.go:591-613
    membership): returns result rings, each normalized to enclose the
    smaller side so XOR-parity membership composes.

    The generalization of :func:`loop_boolean`: an arc of either
    boundary belongs to the result boundary iff the result membership
    op(inA, inB) flips across it — for an arc of A's boundary inA flips
    and inB is constant, so the rule reduces to a single midpoint
    membership test in the *other* region; coincident (seam) arcs, where
    both flip, are classified by probing both sides and kept as one
    copy.  Valid polygons (rings disjoint within each side) are assumed;
    results are valid while every result ring encloses less than a
    hemisphere.
    """
    if op not in ("union", "intersection", "difference"):
        raise ValueError(op)
    a_rings = [np.atleast_2d(np.asarray(r, dtype=np.float64)) for r in a_rings]
    b_rings = [np.atleast_2d(np.asarray(r, dtype=np.float64)) for r in b_rings]

    # pre-pass 0: snap-round B's vertices onto A's (S2Builder semantics,
    # s2/builder.go:63-118) so near-coincident boundaries — where the
    # double-precision edge intersection is ill-conditioned — become
    # exactly coincident and fall into the symbolic seam machinery.
    b_rings = _snap_rings(b_rings, a_rings)
    # pre-pass 0b: vertex-EDGE snap both ways — a B edge can run along
    # an A edge to within ~1e-20 while all four vertices are far apart;
    # inserting each side's near-edge vertices into the other's chains
    # turns the overlap into exact shared-vertex/seam geometry.
    a_rings = _snap_insert_vertices(a_rings, b_rings)
    b_rings = _snap_insert_vertices(b_rings, a_rings)

    # pre-pass: partial collinear overlaps -> insert split vertices and
    # restart once (second pass provably inserts nothing)
    b_verts_all = np.concatenate(b_rings) if b_rings else np.empty((0, 3))
    a_verts_all = np.concatenate(a_rings) if a_rings else np.empty((0, 3))
    ins_a, any_a = _collect_collinear_splits(a_rings, b_verts_all)
    ins_b, any_b = _collect_collinear_splits(b_rings, a_verts_all)
    if any_a or any_b:
        return polygon_boolean(
            [_augment_ring(r, i) for r, i in zip(a_rings, ins_a)],
            [_augment_ring(r, i) for r, i in zip(b_rings, ins_b)],
            op,
        )

    a_prep = [(r, loop_origin_inside(r)) for r in a_rings]
    b_prep = [(r, loop_origin_inside(r)) for r in b_rings]

    # Orient every ring so its region lies on the LEFT of the traversal
    # (shells CCW, holes CW).  NOTE: parity membership is orientation-
    # SENSITIVE (reversing one ring complements the parity set globally),
    # so all membership probes keep using the small-side-normalized input
    # preps (a_prep/b_prep); the reoriented rings exist only so arc
    # splitting/stitching has consistent directions.
    def _orient(rings, prepped):
        # Membership must FLIP across the ring's own boundary, so a probe
        # pair (left, right) straddling an edge is decisive only when the
        # two memberships differ.  A probe landing on/near ANOTHER ring of
        # the same polygon (e.g. an edge midpoint coinciding with a hole
        # vertex — triangle apothem == hole circumradius) gives equal
        # memberships; in that case move along the edge / to the next edge
        # until a decisive pair is found.
        avoid = np.concatenate(rings) if rings else None
        out = []
        for r in rings:
            n = len(r)
            oriented = None
            # pass 0 keeps probe pairs clear of the polygon's own other
            # vertices (e.g. a hole vertex tangent to this edge): the
            # decisive-flip retry below cannot detect a pair that flips
            # across the WRONG feature.  Pass 1 drops the clearance filter
            # so sub-clearance-sized rings still get oriented.
            for use_clearance in (True, False):
                for i in range(n):
                    p0, p1 = r[i], r[(i + 1) % n]
                    for t in (0.5, 0.381966, 0.618034, 0.145898, 0.854102):
                        nrm = np.cross(p0, p1)
                        nn = math.sqrt(nrm @ nrm)
                        if nn == 0:
                            break
                        nrm = nrm / nn
                        mid = (1.0 - t) * p0 + t * p1
                        mid = mid / math.sqrt(mid @ mid)
                        if use_clearance and not _clear_of(mid, avoid):
                            continue
                        probes = np.stack([mid + 1e-8 * nrm, mid - 1e-8 * nrm])
                        probes = probes / np.sqrt(
                            (probes**2).sum(axis=1, keepdims=True)
                        )
                        m = _parity_contains(prepped, probes)
                        if bool(m[0]) != bool(m[1]):
                            oriented = r if bool(m[0]) else r[::-1]
                            break
                    if oriented is not None:
                        break
                if oriented is not None:
                    break
            out.append(oriented if oriented is not None else r)
        return out

    a_rings = _orient(a_rings, a_prep)
    b_rings = _orient(b_rings, b_prep)

    def member_op(pts: np.ndarray) -> np.ndarray:
        in_a = _parity_contains(a_prep, pts)
        in_b = _parity_contains(b_prep, pts)
        if op == "union":
            return in_a | in_b
        if op == "intersection":
            return in_a & in_b
        return in_a & ~in_b

    from geo_spark.kernel.pip import _eq, _vertex_crossing

    # seams + crossings across every (a-ring, b-ring) pair
    a_keys = [[_key(v) for v in r] for r in a_rings]
    b_keys = [[_key(v) for v in r] for r in b_rings]
    b_edges: dict[tuple[tuple, tuple], tuple[int, int]] = {}
    for rj, keys in enumerate(b_keys):
        nb = len(keys)
        for j in range(nb):
            b_edges[(keys[j], keys[(j + 1) % nb])] = (rj, j)

    seam_pairs: dict[tuple[int, int], tuple[int, int]] = {}
    seam_arc_keys: set[tuple[tuple, tuple]] = set()
    a_vkeys: list[set] = [set() for _ in a_rings]
    b_vkeys: list[set] = [set() for _ in b_rings]
    for ri, keys in enumerate(a_keys):
        na = len(keys)
        for i in range(na):
            ek = (keys[i], keys[(i + 1) % na])
            hit = b_edges.get(ek) or b_edges.get((ek[1], ek[0]))
            if hit is not None:
                seam_pairs[(ri, i)] = hit
                seam_arc_keys.add(ek)
                seam_arc_keys.add((ek[1], ek[0]))
                a_vkeys[ri].update(ek)
                b_vkeys[hit[0]].update(ek)

    cross_a: list[dict[int, list[np.ndarray]]] = [dict() for _ in a_rings]
    cross_b: list[dict[int, list[np.ndarray]]] = [dict() for _ in b_rings]
    found = bool(seam_pairs)
    for ri, ra in enumerate(a_rings):
        na = len(ra)
        for i in range(na):
            a0, a1 = ra[i], ra[(i + 1) % na]
            for rj, rb in enumerate(b_rings):
                nb = len(rb)
                for j in range(nb):
                    if seam_pairs.get((ri, i)) == (rj, j):
                        continue
                    b0, b1 = rb[j], rb[(j + 1) % nb]
                    if robust_crossing(a0, a1, b0, b1):
                        x = edge_intersection(a0, a1, b0, b1)
                        cross_a[ri].setdefault(i, []).append(x)
                        cross_b[rj].setdefault(j, []).append(x)
                        found = True
                    elif (
                        _eq(a0, b0) or _eq(a0, b1) or _eq(a1, b0) or _eq(a1, b1)
                    ) and _vertex_crossing(a0, a1, b0, b1):
                        shared = a0 if (_eq(a0, b0) or _eq(a0, b1)) else a1
                        a_vkeys[ri].add(_key(shared))
                        b_vkeys[rj].add(_key(shared))
                        found = True

    _SEAM_EPS = 1e-8
    _SEAM_TS = (0.5, 0.381966, 0.618034, 0.145898, 0.854102)

    # vertex sets each side's probes must stay clear of (see _arc_probes)
    a_avoid = np.concatenate(a_rings) if a_rings else np.empty((0, 3))
    b_avoid = np.concatenate(b_rings) if b_rings else np.empty((0, 3))
    both_avoid = np.concatenate([a_avoid, b_avoid])

    def seam_vote(p0, p1):
        """(flip, left_in_result): majority-voted membership-flip test
        across probe positions along the seam.  A single position can
        sit within _SEAM_EPS of an unrelated feature — e.g. a same-side
        hole vertex tangent to the shell edge (within-side tangencies
        are NOT snapped; only B snaps onto A) — and classify the wrong
        side; such features meet the edge in isolated points, so
        positions within probe clearance of ANY input vertex are skipped
        up front and the remaining spread-out majority decides."""
        nrm = np.cross(p0, p1)
        nrm = nrm / math.sqrt(nrm @ nrm)
        ts = [
            t
            for t in _SEAM_TS
            if _clear_of(
                (m := (1.0 - t) * p0 + t * p1) / math.sqrt(m @ m), both_avoid
            )
        ]
        if len(ts) < 3:
            ts = list(_SEAM_TS)
        flips = 0
        lefts = 0
        for t in ts:
            mid = (1.0 - t) * p0 + t * p1
            mid = mid / math.sqrt(mid @ mid)
            probes = np.stack(
                [mid + _SEAM_EPS * nrm, mid - _SEAM_EPS * nrm]
            )
            probes = probes / np.sqrt(
                (probes**2).sum(axis=1, keepdims=True)
            )
            m = member_op(probes)
            if bool(m[0]) != bool(m[1]):
                flips += 1
                lefts += int(bool(m[0]))
        if flips * 2 <= len(ts):
            return False, False
        return True, lefts * 2 > flips

    def untouched_inside(ring, other_prep, other_avoid) -> bool:
        """Whole-ring side decision, majority-voted across probe points
        spread over the ring's edges, each kept clear of the other
        boundary's vertices (a midpoint can coincide with a tangency of
        the other boundary)."""
        probes = _arc_probes(list(ring) + [ring[0]], other_avoid, k=3)
        votes = int(
            _parity_contains(other_prep, np.stack(probes)).sum()
        )
        return votes * 2 > len(probes)

    def is_seam(arc) -> bool:
        pts, s, e = arc
        return len(pts) == 2 and s is not None and (s, e) in seam_arc_keys

    kept = []
    whole: list[np.ndarray] = []

    def handle_side(
        rings, crossings, vkeys, other_prep, other_avoid, keep_when_inside, reverse
    ):
        # with region-left input orientation, kept arcs already have the
        # result region on their left — except B's arcs in a difference
        # (the result lies in B's complement), which are reversed
        for ri, ring in enumerate(rings):
            if not crossings[ri] and not vkeys[ri]:
                # untouched ring: voted whole-ring side decision
                if untouched_inside(ring, other_prep, other_avoid) == keep_when_inside:
                    whole.append(ring[::-1] if reverse else ring)
                continue
            for arc in _split_chain(ring, crossings[ri], vkeys[ri]):
                if is_seam(arc):
                    continue  # handled once from the A side below
                # majority over probe points clear of the other boundary's
                # vertices: an arc interior can pass exactly through an
                # other-side vertex (shared-vertex tangency) where a single
                # midpoint test sits on the membership discontinuity
                probes = _arc_probes(arc[0], other_avoid, k=3)
                votes = int(
                    _parity_contains(other_prep, np.stack(probes)).sum()
                )
                inside = votes * 2 > len(probes)
                if inside == keep_when_inside:
                    if reverse:
                        pts, s, e = arc
                        kept.append((pts[::-1], e, s))
                    else:
                        kept.append(arc)

    # A-side seam copies: keep iff the result membership flips across
    # the coincident edge, directed so the result stays on the left
    for ri, ring in enumerate(a_rings):
        if not cross_a[ri] and not a_vkeys[ri]:
            continue
        for arc in _split_chain(ring, cross_a[ri], a_vkeys[ri]):
            if not is_seam(arc):
                continue
            pts, s, e = arc
            flip, left_in = seam_vote(pts[0], pts[1])
            if not flip:
                continue
            if left_in:
                kept.append(arc)  # result on the left: native direction
            else:
                kept.append((pts[::-1], e, s))

    if op == "union":
        handle_side(a_rings, cross_a, a_vkeys, b_prep, b_avoid, False, False)
        handle_side(b_rings, cross_b, b_vkeys, a_prep, a_avoid, False, False)
    elif op == "intersection":
        handle_side(a_rings, cross_a, a_vkeys, b_prep, b_avoid, True, False)
        handle_side(b_rings, cross_b, b_vkeys, a_prep, a_avoid, True, False)
    else:  # difference
        handle_side(a_rings, cross_a, a_vkeys, b_prep, b_avoid, False, False)
        handle_side(b_rings, cross_b, b_vkeys, a_prep, a_avoid, True, True)

    if not found and not whole and not kept:
        return []

    from geo_spark.kernel.measures import loop_area

    out = []
    for rg in whole + _stitch(kept):
        rg = np.asarray(rg)
        if loop_area(rg) > 2.0 * math.pi:
            rg = rg[::-1]
        out.append(rg)
    return out
