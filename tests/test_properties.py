"""Hypothesis property tests for the core CellID codec and neighbors —
laws the reference guarantees by construction (cellid.go), checked here on
adversarially-shrunk inputs rather than fixed seeds (no Spark session)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gos2_spark.kernels import hilbert as H
from gos2_spark.kernels import projection as PJ

lat_s = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
lng_s = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
level_s = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(lat=lat_s, lng=lng_s)
def test_cellid_roundtrip_distance_bound(lat, lng):
    """point -> leaf cell -> center is within the leaf MaxDiag/2 bound
    (the reference's own TestCoverage invariant, cellid_test.go)."""
    from gos2_spark.geometry.metric import MAX_DIAG

    ids = PJ.cellid_from_latlng(np.array([lat]), np.array([lng]))
    clat, clng = PJ.cellid_to_latlng(ids)
    x1, y1, z1 = PJ.latlng_to_xyz(np.radians(lat), np.radians(lng))
    x2, y2, z2 = PJ.latlng_to_xyz(np.radians(clat), np.radians(clng))
    d = float(np.asarray(PJ.point_angle(x1, y1, z1, x2, y2, z2)).reshape(-1)[0])
    assert d <= MAX_DIAG.value(30) / 2 * 1.0001


@settings(max_examples=300, deadline=None)
@given(lat=lat_s, lng=lng_s, lvl=level_s)
def test_parent_contains_leaf(lat, lng, lvl):
    """Parent(l) range always contains the leaf; level laws hold."""
    leaf = PJ.cellid_from_latlng(np.array([lat]), np.array([lng]))
    par = H.parent(leaf, lvl)
    assert int(H.level(par)[0]) == lvl
    assert int(H.range_min(par)[0]) <= int(leaf[0]) <= int(H.range_max(par)[0])
    assert bool(H.contains(par, leaf)[0])


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s, lvl=st.integers(min_value=0, max_value=29))
def test_children_partition_parent(lat, lng, lvl):
    """The 4 children exactly tile the parent's Hilbert range."""
    cell = H.parent(PJ.cellid_from_latlng(np.array([lat]), np.array([lng])), lvl)
    ch = H.children(cell)[0]
    assert len(set(int(c) for c in ch)) == 4
    lo = int(H.range_min(cell)[0])
    hi = int(H.range_max(cell)[0])
    child_ranges = sorted(
        (int(H.range_min(np.array([c], dtype=np.uint64))[0]),
         int(H.range_max(np.array([c], dtype=np.uint64))[0]))
        for c in ch
    )
    assert child_ranges[0][0] == lo and child_ranges[-1][1] == hi
    # leaf ids are odd (2k+1), so adjacent sibling ranges sit exactly 2
    # apart in id space (cellid.go:289-293 semantics)
    for (lo_a, hi_a), (lo_b, _) in zip(child_ranges, child_ranges[1:]):
        assert lo_b == hi_a + 2


@settings(max_examples=200, deadline=None)
@given(lat=lat_s, lng=lng_s)
def test_token_roundtrip(lat, lng):
    ids = PJ.cellid_from_latlng(np.array([lat]), np.array([lng]))
    tok = H.to_token(ids)
    back = H.from_token(np.array(tok, dtype=object))
    assert int(back[0]) == int(ids[0])


@settings(max_examples=150, deadline=None)
@given(lat=lat_s, lng=lng_s, lvl=st.integers(min_value=1, max_value=30))
def test_neighborhood_symmetry(lat, lng, lvl):
    """3x3 neighborhood symmetry: if B is in A's block, A is in B's
    (adjacency on the cube is symmetric, including cross-face wraps)."""
    a = H.parent(PJ.cellid_from_latlng(np.array([lat]), np.array([lng])), lvl)
    block = PJ.neighborhood(a, lvl)[0]
    a_id = int(a[0])
    for b in set(int(x) for x in block):
        back = set(int(x) for x in PJ.neighborhood(
            np.array([b], dtype=np.uint64), lvl)[0])
        assert a_id in back, (hex(a_id), hex(b), lvl)


# --- URL parser pattern laws (pipeline/web.py) ------------------------------
# The Spark expressions are pinned by tests/test_web_pipeline.py URL_CASES;
# here the same regex is property-checked in pure re against URLs built
# from arbitrary components (Java and Python share these constructs).

import re as _re

from gos2_spark.pipeline.web import _HOST_RE as _HOST_RE_PAT

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
    min_size=1, max_size=10,
).filter(lambda s: not s.startswith("-"))
_scheme = st.sampled_from(["http", "https", "ftp", "ws+ssl"])
_seg = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-~%", min_size=1, max_size=8
)


@settings(max_examples=300, deadline=None)
@given(
    scheme=_scheme,
    labels=st.lists(_label, min_size=1, max_size=4),
    userinfo=st.one_of(st.none(), _seg),
    port=st.one_of(st.none(), st.integers(min_value=1, max_value=65535)),
    segs=st.lists(_seg, min_size=0, max_size=5),
    query=st.one_of(st.none(), _seg),
)
def test_url_host_regex_recovers_components(scheme, labels, userinfo, port, segs, query):
    host = ".".join(labels)
    url = f"{scheme}://"
    if userinfo is not None:
        url += f"{userinfo}@"
    url += host
    if port is not None:
        url += f":{port}"
    url += "".join(f"/{s}" for s in segs)
    if query is not None:
        url += f"?{query}"
    m = _re.match(_HOST_RE_PAT, url)
    assert m is not None and m.group(1).lower() == host.lower()
    # path recovery: the two-group pattern used by url_path_depth
    m2 = _re.match(_HOST_RE_PAT + r"(?::\d+)?([^?#]*)", url)
    path = m2.group(2)
    assert [s for s in path.split("/") if s] == segs
