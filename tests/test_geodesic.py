import numpy as np

from x_as_supervision_tpu.data import geodesic as GEO


def _disk_mask(h=64, w=64, r=20):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - h // 2) ** 2 + (xx - w // 2) ** 2 <= r * r)


def test_native_lib_loaded():
    assert GEO._load_lib() is not None, "libfastmarch.so should be built"


def test_fmm_distance_on_disk_approximates_radius():
    mask = _disk_mask()
    seeds = np.zeros_like(mask, np.uint8)
    seeds[32, 32] = 1
    d = GEO.fmm_distance(seeds, mask.astype(np.uint8))
    # distance at (32, 32+15) should be ~15 (FMM first-order error is small)
    assert abs(d[32, 47] - 15.0) < 0.8
    # diagonal: true euclidean 10*sqrt(2) ~ 14.14
    assert abs(d[42, 42] - 14.14) < 1.0
    # outside mask: zero
    assert d[0, 0] == 0.0


def test_fmm_matches_dijkstra_fallback_roughly():
    mask = _disk_mask(32, 32, 12)
    seeds = np.zeros_like(mask, np.uint8)
    seeds[16, 16] = 1
    fmm = GEO.fmm_distance(seeds, mask.astype(np.uint8))
    dij = GEO._dijkstra_fallback(seeds, mask.astype(np.uint8))
    inside = mask & (fmm > 0)
    # the two discretizations disagree most near the seed (first-order FMM
    # overestimates diagonals, 8-connected Dijkstra overestimates circles);
    # globally they track each other
    ratio = dij[inside] / np.maximum(fmm[inside], 1e-6)
    assert 0.95 < ratio.mean() < 1.1
    assert np.all(ratio > 0.75) and np.all(ratio < 1.25)


def test_compute_geodesic_dis_shapes_and_degenerate():
    mask = _disk_mask()[None].astype(np.float32)
    params = [2, 1, 3, 20, 0.0]
    dist, centers = GEO.compute_geodesic_dis(mask, "x.jpg", params)
    assert dist.shape == mask.shape
    assert np.isfinite(dist).all()
    # in-mask weights exceed the background floor near the centroid
    assert dist[0, 32, 32] >= 1 + 1  # exp(0)+1 + bg(=0+20)... sanity: > 2

    # degenerate: centroid off-mask (a ring) -> all ones
    ring = (_disk_mask(64, 64, 25) & ~_disk_mask(64, 64, 12))[None]
    dist2, _ = GEO.compute_geodesic_dis(ring.astype(np.float32), "x.jpg", params)
    np.testing.assert_allclose(np.asarray(dist2, np.float32), 1.0)


def test_explicit_centers():
    mask = _disk_mask()[None].astype(np.float32)
    params = [2, 1, 3, 20, 0.0]
    centers = np.array([[32.0, 32.0], [40.0, 32.0]])
    dist, used = GEO.compute_geodesic_dis(mask, "x.jpg", params, centers=centers)
    assert used.shape == (2, 2)
    assert np.isfinite(dist).all()
