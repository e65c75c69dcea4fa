"""Bit-for-bit parity tests for the Hilbert CellID codec.

Golden vectors ported from /root/reference/s2/cellid_test.go (values only).
"""

import numpy as np
import pytest

from gos2_spark.kernels import hilbert as H
from gos2_spark.kernels import projection as P

# cellid_test.go:187-207 — C++-generated (id, lat_deg, lng_deg) pairs.
LATLNG_VECTORS = [
    (0x47A1CBD595522B39, 49.703498679, 11.770681595),
    (0x46525318B63BE0F9, 55.685376759, 12.588490937),
    (0x52B30B71698E729D, 45.486546517, -93.449700022),
    (0x46ED8886CFADDA85, 58.299984854, 23.049300056),
    (0x3663F18A24CBE857, 34.364439040, 108.330699969),
    (0x10A06C0A948CF5D, -30.694551352, -30.048758753),
    (0x2B2BFD076787C5DF, -25.285264027, 133.823116966),
    (0xB09DFF882A7809E1, -75.000000031, 0.000000133),
    (0x94DAA3D000000001, -24.694439215, -47.537363213),
    (0x87A1000000000001, 38.899730392, -99.901813021),
    (0x4FC76D5000000001, 81.647200334, -55.631712940),
    (0x3B00955555555555, 10.050986518, 78.293170610),
    (0x1DCC469991555555, -34.055420593, 18.551140038),
    (0xB112966AAAAAAAAB, -69.219262171, 49.670072392),
]

# cellid_test.go:357-393 — token <-> id pairs.
TOKEN_VECTORS = [
    ("1", 0x1000000000000000),
    ("3", 0x3000000000000000),
    ("14", 0x1400000000000000),
    ("41", 0x4100000000000000),
    ("094", 0x0940000000000000),
    ("537", 0x5370000000000000),
    ("3fec", 0x3FEC000000000000),
    ("72f3", 0x72F3000000000000),
    ("52b8c", 0x52B8C00000000000),
    ("990ed", 0x990ED00000000000),
    ("4476dc", 0x4476DC0000000000),
    ("2a724f", 0x2A724F0000000000),
    ("7d4afc4", 0x7D4AFC4000000000),
    ("b675785", 0xB675785000000000),
    ("40cd6124", 0x40CD612400000000),
    ("3ba32f81", 0x3BA32F8100000000),
    ("08f569b5c", 0x08F569B5C0000000),
    ("385327157", 0x3853271570000000),
    ("166c4d1954", 0x166C4D1954000000),
    ("96f48d8c39", 0x96F48D8C39000000),
    ("0bca3c7f74c", 0x0BCA3C7F74C00000),
    ("1ae3619d12f", 0x1AE3619D12F00000),
    ("07a77802a3fc", 0x07A77802A3FC0000),
    ("4e7887ec1801", 0x4E7887EC18010000),
    ("4adad7ae74124", 0x4ADAD7AE74124000),
    ("90aba04afe0c5", 0x90ABA04AFE0C5000),
    ("8ffc3f02af305c", 0x8FFC3F02AF305C00),
    ("6fa47550938183", 0x6FA4755093818300),
    ("aa80a565df5e7fc", 0xAA80A565DF5E7FC0),
    ("01614b5e968e121", 0x01614B5E968E1210),
    ("aa05238e7bd3ee7c", 0xAA05238E7BD3EE7C),
    ("48a23db9c2963e5b", 0x48A23DB9C2963E5B),
]


def test_cellid_from_latlng_bit_exact():
    ids = np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64)
    lat = np.array([v[1] for v in LATLNG_VECTORS])
    lng = np.array([v[2] for v in LATLNG_VECTORS])
    got = P.cellid_from_latlng(lat, lng)
    assert (got == ids).all(), [
        (hex(int(a)), hex(int(b))) for a, b in zip(got, ids) if a != b
    ]


def test_cellid_to_latlng_within_tolerance():
    # cellid_test.go:208-213: center latlng within 1e-9 degrees (~0.1mm).
    ids = np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64)
    lat = np.array([v[1] for v in LATLNG_VECTORS])
    lng = np.array([v[2] for v in LATLNG_VECTORS])
    glat, glng = P.cellid_to_latlng(ids)
    dist = P.latlng_distance(
        np.radians(lat), np.radians(lng), np.radians(glat), np.radians(glng)
    )
    assert (dist <= 1e-9 * np.pi / 180).all()


def test_tokens_roundtrip():
    toks = [t for t, _ in TOKEN_VECTORS]
    ids = np.array([i for _, i in TOKEN_VECTORS], dtype=np.uint64)
    assert (H.from_token(toks) == ids).all()
    assert list(H.to_token(ids)) == toks


def test_token_error_cases():
    # cellid_test.go:408-429.
    assert H.to_token(np.array([0], dtype=np.uint64))[0] == "X"
    bad = ["876b e99", "876bee99\n", "876[ee99", " 876bee99", "X",
           "12345678901234567"]
    assert (H.from_token(bad) == 0).all()


def test_string_repr():
    # cellid_test.go:180-185.
    assert H.to_string(0xBB04000000000000) == "5/31200"


def test_level_parent_children():
    ids = np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64)
    leaf_mask = H.is_leaf(ids)
    lv = H.level(ids)
    assert (lv[leaf_mask] == 30).all()
    # parent at level l has level l; contains the original id
    for l in (0, 5, 10, 20):
        par = H.parent(ids, l)
        assert (H.level(par) == l).all()
        assert H.contains(par, ids).all()
    # children of a parent tile all share that parent
    par10 = H.parent(ids, 10)
    ch = H.children(par10)
    for k in range(4):
        assert (H.parent(ch[:, k], 10) == par10).all()
        assert (H.level(ch[:, k]) == 11).all()


def test_range_min_max_cover_exactly():
    ids = H.parent(np.array([v[0] for v in LATLNG_VECTORS], dtype=np.uint64), 8)
    rmin, rmax = H.range_min(ids), H.range_max(ids)
    # a level-8 cell spans 2*lsb - 1 id values (lsb = 2^(2*(30-8)))
    assert (rmax - rmin == (np.uint64(1) << np.uint64(2 * (30 - 8) + 1)) - np.uint64(2)).all()
    assert H.is_leaf(rmin).all() and H.is_leaf(rmax).all()


def test_face_ij_roundtrip_random():
    rng = np.random.default_rng(42)
    f = rng.integers(0, 6, 10000).astype(np.int64)
    i = rng.integers(0, H.MAX_SIZE, 10000).astype(np.int64)
    j = rng.integers(0, H.MAX_SIZE, 10000).astype(np.int64)
    ids = H.cellid_from_face_ij(f, i, j)
    gf, gi, gj, _ = H.face_ij_orientation(ids)
    assert (gf.astype(np.int64) == f).all()
    assert (gi.astype(np.int64) == i).all()
    assert (gj.astype(np.int64) == j).all()


def test_signed_bias_preserves_order():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2**63 - 1, 5000, dtype=np.int64).view(np.uint64)
    b = a | np.uint64(1 << 63)  # high-bit set (faces 4-5)
    allv = np.concatenate([a, b])
    signed = H.to_signed(allv)
    order_u = np.argsort(allv, kind="stable")
    order_s = np.argsort(signed, kind="stable")
    assert (order_u == order_s).all()
    assert (H.from_signed(signed) == allv).all()


def test_advance_and_traversal():
    begin = H.child_begin_at_level(
        np.array([H.cellid_from_face_pos_level(0, 0, 0)], dtype=np.uint64), 5
    )
    nxt = H.next_cell(begin)
    assert (H.advance(begin, 1) == nxt).all()
    assert (H.advance(nxt, -1) == begin).all()
    # advance clamps at the beginning
    assert (H.advance(begin, -100) == begin).all()


def test_edge_neighbors_face1():
    # cellid_test.go:222-231: edge neighbors of face-1 corner cell at level 0.
    cid = H.parent(H.cellid_from_face_ij(
        np.array([1]), np.array([0]), np.array([0])), 0)
    nbrs = P.edge_neighbors(cid)[0]
    faces = [int(f) for f in H.face(nbrs)]
    assert faces == [5, 3, 2, 0]
    lv = H.level(nbrs)
    assert (lv == 0).all()


def test_coverage_property():
    # cellid_test.go TestCoverage-style: random points' leaf-cell center is
    # close to the point (within the max leaf diagonal / 2 ~ 1.21e-8 rad).
    rng = np.random.default_rng(4)
    v = rng.normal(size=(100000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ids = P.cellid_from_xyz(v[:, 0], v[:, 1], v[:, 2])
    cx, cy, cz = P.cellid_to_xyz_raw(ids)
    n = np.sqrt(cx * cx + cy * cy + cz * cz)
    ang = P.point_angle(v[:, 0], v[:, 1], v[:, 2], cx / n, cy / n, cz / n)
    max_dist = 0.5 * 1.2193272972170106e-8  # MaxDiag at level 30 (metric.go)
    assert ang.max() <= max_dist


def test_vertex_neighbors():
    # cellid_test.go:315-333: vertex neighbors of the leaf containing face-2 center.
    cid = int(P.cellid_from_xyz(np.array([0.0]), np.array([0.0]), np.array([1.0]))[0])
    nbrs = sorted(P.vertex_neighbors(cid, 5))
    # the 4 level-5 cells around the face-2 center vertex
    expect = []
    for i_off, j_off in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        half = 1 << (30 - 5)
        base = 1 << 29
        cc = H.cellid_from_face_ij(
            np.array([2]), np.array([base + i_off * half]), np.array([base + j_off * half])
        )
        expect.append(int(H.parent(cc, 5)[0]))
    assert nbrs == sorted(expect)


def test_neighborhood_matches_scalar_all_neighbors():
    """Vectorized 3x3 neighborhood == scalar AppendAllNeighbors port,
    including cross-face wrap and cube-corner degeneracy."""
    rng = np.random.default_rng(7)
    lat = np.concatenate([
        rng.uniform(-89.9, 89.9, 500),
        [89.999, -89.999, 0.0, 45.0, -45.0],
        rng.uniform(-0.01, 0.01, 20),
    ])
    lng = np.concatenate([
        rng.uniform(-180, 180, 500),
        [12.0, -171.0, 180.0, 44.99, 135.01],
        rng.uniform(179.9, 180.0, 20),
    ])
    ids = P.cellid_from_latlng(np.radians(lat), np.radians(lng))
    for lvl in (1, 4, 8, 15, 25):
        batch = P.neighborhood(ids, lvl)
        par = H.parent(ids, lvl)
        for r in range(len(ids)):
            want = set(P.all_neighbors(int(par[r]), lvl)) | {int(par[r])}
            got = set(int(x) for x in batch[r])
            assert want == got, (lvl, lat[r], lng[r])
        # parent first: consumers rely on column 0 being the own cell
        assert (batch[:, 0] == par).all()
