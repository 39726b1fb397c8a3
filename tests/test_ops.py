"""Unit tests for the sampling/cost/filter ops against NumPy references."""

import numpy as np
import pytest

from facebook360_dep_tpu.ops import cost, filters, sampling


def test_bilinear_sample_matches_reference_convention():
    """Mirror util/CvUtil.h:107-120 getPixelBilinear semantics."""
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    # at a pixel center, returns that pixel
    out = sampling.bilinear_sample(img, np.asarray([1.5, 2.5]))
    assert float(out) == img[2, 1]
    # halfway between two centers
    out = sampling.bilinear_sample(img, np.asarray([2.0, 0.5]))
    assert float(out) == (img[0, 1] + img[0, 2]) / 2
    # clamp-to-edge beyond borders
    out = sampling.bilinear_sample(img, np.asarray([-3.0, -3.0]))
    assert float(out) == img[0, 0]
    # NaN coords -> NaN
    out = sampling.bilinear_sample(img, np.asarray([np.nan, 1.0]))
    assert np.isnan(float(out))


def test_box_sum():
    img = np.random.RandomState(0).rand(8, 9).astype(np.float32)
    out = np.asarray(sampling.box_sum(img, 1))
    # interior pixel: exact 3x3 sum
    assert np.isclose(out[4, 4], img[3:6, 3:6].sum(), atol=1e-5)
    assert out.shape == img.shape


def test_rgb_variance_flat_is_zero():
    img = np.full((6, 6, 3), 0.25, np.float32)
    var = np.asarray(sampling.rgb_variance(img))
    np.testing.assert_allclose(var, 0.0, atol=1e-7)


def test_probe_disparities_endpoints():
    d = np.asarray(cost.probe_disparities(150, 1e-4, 2.0))
    assert d[0] == pytest.approx(2.0)  # probe 0 = closest depth
    assert d[-1] == pytest.approx(1e-4)
    assert np.all(np.diff(d) < 0)


def test_combine_ssds_drop_two_worst():
    # 5 srcs, single pixel; worst-2 by biased SSD must be dropped
    biased = np.asarray([1.0, 2.0, 100.0, 3.0, 50.0], np.float32).reshape(5, 1, 1)
    unbiased = np.asarray([10.0, 20.0, 999.0, 30.0, 555.0], np.float32).reshape(5, 1, 1)
    valid = np.ones((5, 1, 1), bool)
    variance = np.full((1, 1), 0.01, np.float32)
    c, conf = cost.combine_ssds(biased, unbiased, valid, variance)
    keep = 3
    expected = (10.0 + 20.0 + 30.0) / keep / keep / 0.01
    assert float(c[0, 0]) == pytest.approx(expected, rel=1e-5)
    assert float(conf[0, 0]) == pytest.approx(0.01)


def test_combine_ssds_insufficient_cameras():
    biased = np.zeros((3, 1, 1), np.float32)
    unbiased = np.zeros((3, 1, 1), np.float32)
    valid = np.zeros((3, 1, 1), bool)
    variance = np.full((1, 1), 0.01, np.float32)
    c, conf = cost.combine_ssds(biased, unbiased, valid, variance)
    assert float(c[0, 0]) == pytest.approx(float(cost.FLT_MAX))
    assert float(conf[0, 0]) == 0.0


def test_combine_ssds_min_var_floor():
    biased = np.asarray([[1.0]], np.float32).reshape(1, 1, 1)
    unbiased = np.asarray([[4.0]], np.float32).reshape(1, 1, 1)
    valid = np.ones((1, 1, 1), bool)
    variance = np.zeros((1, 1), np.float32)
    c, conf = cost.combine_ssds(biased, unbiased, valid, variance)
    assert float(conf[0, 0]) == pytest.approx(cost.MIN_VAR)
    assert float(c[0, 0]) == pytest.approx(4.0 / cost.MIN_VAR, rel=1e-4)


def test_masked_median():
    img = np.asarray(
        [[1.0, 9.0, 2.0], [3.0, 100.0, 4.0], [5.0, 6.0, 7.0]], np.float32
    )
    mask = np.ones((3, 3), bool)
    out = np.asarray(filters.masked_median(img, None, mask, radius=1))
    assert float(out[1, 1]) == 5.0  # median of all nine
    # masked-out center passes background through
    mask2 = mask.copy()
    mask2[0, 0] = False
    bg = np.full((3, 3), -1.0, np.float32)
    out2 = np.asarray(filters.masked_median(img, bg, mask2, radius=1))
    assert float(out2[0, 0]) == -1.0


def test_masked_median_ignores_nan_and_zero():
    img = np.asarray([[np.nan, 0.0, 2.0], [3.0, 4.0, 5.0], [6.0, 7.0, 8.0]], np.float32)
    mask = np.ones((3, 3), bool)
    out = np.asarray(filters.masked_median(img, None, mask, radius=1))
    # window of (1,1): valid values {2,3,4,5,6,7,8} -> median 5
    assert float(out[1, 1]) == 5.0


def test_sorting_network_zero_one_principle():
    # A comparator network sorts all inputs iff it sorts all 0-1 inputs
    # (Knuth 5.3.4); exhaustive over 2^9 vectors for the median-9 case plus
    # the non-power-of-two sizes the filters use.
    import itertools

    for n in (2, 3, 5, 9, 25):
        pairs = filters._sorting_network_pairs(n)
        assert all(i < j < n for i, j in pairs)
        if n > 9:
            vectors = [np.random.default_rng(n).integers(0, 2, n) for _ in range(512)]
        else:
            vectors = [np.array(v) for v in itertools.product((0, 1), repeat=n)]
        for v in vectors:
            a = v.copy()
            for i, j in pairs:
                a[i], a[j] = min(a[i], a[j]), max(a[i], a[j])
            assert (np.diff(a) >= 0).all(), (n, v, a)


def test_masked_median_matches_numpy_on_random_maps():
    # the sorting-network median must agree with a brute-force numpy median
    # over valid window samples, across random masks/NaNs/zeros
    rng = np.random.default_rng(7)
    h = w = 12
    img = rng.uniform(0.5, 2.0, (h, w)).astype(np.float32)
    img[rng.uniform(size=(h, w)) < 0.1] = np.nan
    img[rng.uniform(size=(h, w)) < 0.1] = 0.0
    mask = rng.uniform(size=(h, w)) < 0.8
    out = np.asarray(filters.masked_median(img, None, mask, radius=1))
    for y in range(h):
        for x in range(w):
            if not mask[y, x]:
                assert out[y, x] == 0.0
                continue
            samples = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and mask[yy, xx]:
                        v = img[yy, xx]
                        if np.isfinite(v) and v != 0:
                            samples.append(v)
            expect = np.median(samples) if samples else 0.0
            np.testing.assert_allclose(out[y, x], expect, rtol=1e-6, err_msg=f"{y},{x}")


def test_joint_bilateral_flat_guide_is_box_mean():
    rng = np.random.RandomState(3)
    img = rng.rand(6, 6).astype(np.float32)
    guide = np.full((6, 6, 3), 0.5, np.float32)
    mask = np.ones((6, 6), bool)
    out = np.asarray(filters.joint_bilateral(img, guide, mask, radius=1))
    # flat guide -> all weights equal -> mean over clamp-to-edge window
    expected = np.asarray(sampling.box_mean(np.pad(img, 1, mode="edge"), 1))[1:-1, 1:-1]
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_temporal_bilateral_static_scene():
    t, h, w = 3, 4, 5
    rng = np.random.RandomState(4)
    guide = np.repeat(rng.rand(1, h, w, 3).astype(np.float32), t, axis=0)
    images = np.stack([np.full((h, w), v, np.float32) for v in [1.0, 2.0, 3.0]])
    masks = np.ones((t, h, w), bool)
    out = np.asarray(filters.temporal_bilateral(guide, images, masks, 1, sigma=0.1, spatial_radius=0))
    # identical guides -> equal weights -> mean over time
    np.testing.assert_allclose(out, 2.0, atol=1e-5)
