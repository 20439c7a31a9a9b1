"""H3-style hexagonal tiling: aperture-7 hex hierarchy on an
icosahedron (vectorized numpy).

Implements the published H3 *algorithm shape* — gnomonic projection onto
icosahedron faces, aperture-7 hex lattice per resolution with the
1/sqrt(7) scale + atan(sqrt(3)/5) Class-II/III rotation between
resolutions, cube-rounding of fractional axial coordinates — over a
deterministically constructed icosahedron.  Ids are engine-canonical
packed ints, NOT interoperable H3 tokens: the canonical H3 base-cell
orientation table is not reproducible offline, so this module pins its
own orientation and verifies the *invariants* (partition of the sphere,
~7x refinement, parent round-trips, neighbor geometry) instead of H3
token vectors.  A user swaps in canonical ids by replacing `_FACES` with
H3's face table; every downstream operator (tiling, rollups, joins) is
id-agnostic.

Reference analog: the reference library is S2-only; this satisfies the
north star's hex-tiling requirement as the second tiling system (H3-style:
engine-canonical ids, NOT H3-token interoperable).
"""

from __future__ import annotations

import numpy as np

MAX_RES = 15
APERTURE_ROT = np.arctan2(np.sqrt(3.0), 5.0)  # ~19.1066 deg per resolution
SCALE_BASE = 0.33  # res-0 hex size in face-plane units (covers a face)


def _icosahedron() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(face_centers(20,3), u_axes(20,3), v_axes(20,3)): outward unit
    normals of the 20 faces plus an orthonormal in-plane basis."""
    phi = (1.0 + np.sqrt(5.0)) / 2.0
    verts = []
    for a in (-1.0, 1.0):
        for b in (-phi, phi):
            verts += [(0, a, b), (a, b, 0), (b, 0, a)]
    verts = np.array(verts, dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1)[:, None]
    # Faces = all vertex triples at minimal pairwise distance (edge length).
    from itertools import combinations

    d01 = np.linalg.norm(verts[0] - verts, axis=1)
    edge = np.min(d01[d01 > 1e-9])
    faces = []
    for i, j, k in combinations(range(12), 3):
        if (
            abs(np.linalg.norm(verts[i] - verts[j]) - edge) < 1e-9
            and abs(np.linalg.norm(verts[j] - verts[k]) - edge) < 1e-9
            and abs(np.linalg.norm(verts[i] - verts[k]) - edge) < 1e-9
        ):
            faces.append((i, j, k))
    assert len(faces) == 20
    centers = np.array([verts[list(f)].mean(axis=0) for f in faces])
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    # Deterministic in-plane basis: u toward the lowest-index vertex.
    u_axes = []
    v_axes = []
    for f, c in zip(faces, centers):
        ref = verts[min(f)]
        u = ref - c * (ref @ c)
        u /= np.linalg.norm(u)
        v = np.cross(c, u)
        u_axes.append(u)
        v_axes.append(v)
    return centers, np.array(u_axes), np.array(v_axes)


_CENTERS, _U, _V = _icosahedron()


def _face_of(pts: np.ndarray) -> np.ndarray:
    """Face with the maximum dot product (ties broken by lowest index)."""
    return np.argmax(pts @ _CENTERS.T, axis=1)


def _gnomonic(pts: np.ndarray, face: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Project onto the tangent plane at the face center (gnomonic)."""
    c = _CENTERS[face]
    scale = 1.0 / np.einsum("ij,ij->i", pts, c)
    proj = pts * scale[:, None] - c
    return np.einsum("ij,ij->i", proj, _U[face]), np.einsum(
        "ij,ij->i", proj, _V[face]
    )


def _res_frame(res: int) -> tuple[float, float, float]:
    """(scale, cos_rot, sin_rot) of the lattice at a resolution."""
    scale = SCALE_BASE / np.sqrt(7.0) ** res
    rot = res * APERTURE_ROT
    return scale, np.cos(rot), np.sin(rot)


def _to_axial(x: np.ndarray, y: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Face-plane point -> rounded axial hex coordinates (pointy-top)."""
    scale, cr, sr = _res_frame(res)
    xr = (cr * x + sr * y) / scale
    yr = (-sr * x + cr * y) / scale
    qf = (np.sqrt(3.0) / 3.0 * xr - 1.0 / 3.0 * yr)
    rf = (2.0 / 3.0 * yr)
    return _cube_round(qf, rf)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.round(qf)
    r = np.round(rf)
    s = np.round(sf)
    dq = np.abs(q - qf)
    dr = np.abs(r - rf)
    ds = np.abs(s - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - s, q)
    r = np.where(fix_r, -q - s, r)
    return q.astype(np.int64), r.astype(np.int64)


def _axial_center(q: np.ndarray, r: np.ndarray, res: int) -> tuple[np.ndarray, np.ndarray]:
    scale, cr, sr = _res_frame(res)
    xr = np.sqrt(3.0) * (q + r / 2.0)
    yr = 1.5 * r
    x = (cr * xr - sr * yr) * scale
    y = (sr * xr + cr * yr) * scale
    return x, y


OFFSET = 1 << 20  # axial coords comfortably fit 21 bits at res 15


def pack(face: np.ndarray, res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    """(face, res, q, r) -> int64: [res:4][face:5][q+OFF:21][r+OFF:21]."""
    return (
        (np.int64(res) << np.int64(47))
        | (face.astype(np.int64) << np.int64(42))
        | ((q + OFFSET) << np.int64(21))
        | (r + OFFSET)
    )


def unpack(h: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    h = np.asarray(h, dtype=np.int64)
    res = (h >> np.int64(47)) & np.int64(0xF)
    face = (h >> np.int64(42)) & np.int64(0x1F)
    q = ((h >> np.int64(21)) & np.int64((1 << 21) - 1)) - OFFSET
    r = (h & np.int64((1 << 21) - 1)) - OFFSET
    return face, res, q, r


def _encode_raw(pts: np.ndarray, res: int) -> np.ndarray:
    face = _face_of(pts)
    u, v = _gnomonic(pts, face)
    q, r = _to_axial(u, v, res)
    return pack(face, res, q, r)


def latlng_to_hex(lat_deg: np.ndarray, lng_deg: np.ndarray, res: int) -> np.ndarray:
    """Point -> canonical hex id.  Canonicalization: encode, then
    re-encode the hex center once — cells straddling icosahedron face
    boundaries collapse onto one face-consistent id, so center
    round-trips are stable (the role H3's cross-face base-cell lattice
    plays in the canonical implementation)."""
    from geo_spark.kernel.cellid import latlng_to_xyz

    x, y, z = latlng_to_xyz(lat_deg, lng_deg)
    pts = np.stack([x, y, z], axis=1)
    raw = _encode_raw(pts, res)
    clat, clng = hex_center(raw)
    cx, cy, cz = latlng_to_xyz(clat, clng)
    return _encode_raw(np.stack([cx, cy, cz], axis=1), res)


def hex_center(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell id -> (lat_deg, lng_deg) of the hex center."""
    from geo_spark.kernel.cellid import xyz_to_latlng

    face, res, q, r = unpack(h)
    res0 = int(res[0]) if len(np.atleast_1d(res)) else 0
    # mixed resolutions handled per group
    out_lat = np.empty(len(face))
    out_lng = np.empty(len(face))
    for rr in np.unique(res):
        m = res == rr
        x2, y2 = _axial_center(q[m], r[m], int(rr))
        c = _CENTERS[face[m]]
        pts = c + x2[:, None] * _U[face[m]] + y2[:, None] * _V[face[m]]
        pts /= np.linalg.norm(pts, axis=1)[:, None]
        la, ln = xyz_to_latlng(pts[:, 0], pts[:, 1], pts[:, 2])
        out_lat[m] = la
        out_lng[m] = ln
    return out_lat, out_lng


def hex_parent(h: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent = the coarser cell containing this cell's center (the H3
    parent semantic — aperture-7 children are not exactly nested)."""
    lat, lng = hex_center(np.asarray(h, dtype=np.int64))
    return latlng_to_hex(lat, lng, parent_res)


def hex_ring1(h: int) -> np.ndarray:
    """The 6 axial neighbors on the same face (face-local kRing; cells
    whose center projects off-face are re-assigned by center, matching
    the partition rule)."""
    face, res, q, r = unpack(np.array([h], dtype=np.int64))
    rr = int(res[0])
    nbrs_q = q[0] + np.array([1, 1, 0, -1, -1, 0])
    nbrs_r = r[0] + np.array([0, -1, 1, 0, 1, -1])
    ids = pack(np.full(6, face[0]), rr, nbrs_q, nbrs_r)
    # canonicalize via center re-assignment (handles face boundaries)
    lat, lng = hex_center(ids)
    return np.unique(latlng_to_hex(lat, lng, rr))
