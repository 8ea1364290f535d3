"""Associative-scan tridiagonal solver + tridiagonal spline path tests."""

import numpy as np
import jax.numpy as jnp

from gps_optimize_slam_tpu.ops import alignment
from gps_optimize_slam_tpu.ops.tridiag import tridiag_solve


def dense_from_bands(a, b, c):
    n = len(b)
    A = np.diag(b)
    A += np.diag(a[1:], -1)
    A += np.diag(c[:-1], 1)
    return A


def test_random_diagonally_dominant():
    rng = np.random.default_rng(0)
    for n in [3, 17, 128, 1000]:
        a = rng.normal(size=n)
        c = rng.normal(size=n)
        b = np.abs(a) + np.abs(c) + rng.uniform(1.0, 2.0, n)
        a[0] = c[-1] = 0.0
        d = rng.normal(size=(n, 3))
        x = np.asarray(tridiag_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)))
        ref = np.linalg.solve(dense_from_bands(a, b, c), d)
        np.testing.assert_allclose(x, ref, atol=1e-9)


def test_decoupled_segments():
    # Identity rows (a=c=0, b=1) must decouple independent blocks exactly.
    rng = np.random.default_rng(1)
    n = 40
    a = rng.normal(size=n) * 0.3
    c = rng.normal(size=n) * 0.3
    b = np.abs(a) + np.abs(c) + 1.5
    for j in [0, 10, 11, 25, n - 1]:
        a[j] = c[j] = 0.0
        b[j] = 1.0
    a[0] = c[-1] = 0.0
    # Also zero couplings INTO identity rows.
    for j in [10, 11, 25]:
        if j + 1 < n:
            a[j + 1] = 0.0
        c[j - 1] = 0.0
    d = rng.normal(size=(n, 2))
    x = np.asarray(tridiag_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c), jnp.asarray(d)))
    ref = np.linalg.solve(dense_from_bands(a, b, c), d)
    np.testing.assert_allclose(x, ref, atol=1e-10)


def test_spline_tridiagonal_equals_dense():
    # The corner-eliminated tridiagonal spline must reproduce the dense
    # block solve (and hence scipy) on gap-segmented data.
    rng = np.random.default_rng(2)
    seg_times = [
        np.linspace(0.0, 10.0, 40),          # cubic
        np.linspace(20.0, 21.0, 4),          # minimal cubic (m=4)
        np.array([30.0, 30.5, 31.2]),        # linear
        np.linspace(40.0, 55.0, 80),         # cubic
    ]
    gps_t = np.concatenate(seg_times)
    gps_p = rng.normal(size=(len(gps_t), 3)) * 3
    slam_t = np.linspace(-1.0, 56.0, 500)
    dense = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        spline_solver="dense",
    )
    tri = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        spline_solver="tridiagonal",
    )
    np.testing.assert_array_equal(np.asarray(tri.valid), np.asarray(dense.valid))
    v = np.asarray(dense.valid)
    np.testing.assert_allclose(
        np.asarray(tri.aligned)[v], np.asarray(dense.aligned)[v], atol=1e-9
    )


def test_spline_tridiagonal_on_fixture_matches_scipy():
    from tests.test_alignment import load_fixture, oracle_align

    slam_t, gps_t, gps_p = load_fixture()
    ref_a, ref_v = oracle_align(slam_t, gps_t, gps_p)
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        spline_solver="tridiagonal",
    )
    np.testing.assert_array_equal(np.asarray(out.valid), ref_v)
    np.testing.assert_allclose(np.asarray(out.aligned)[ref_v], ref_a[ref_v], atol=1e-9)


def test_spline_tridiagonal_large_scale():
    # 20k GPS samples — the regime where the dense path is intractable.
    rng = np.random.default_rng(3)
    m = 20000
    gps_t = np.cumsum(rng.uniform(0.08, 0.12, m))
    gps_p = np.stack(
        [np.sin(gps_t * 0.1) * 100, np.cos(gps_t * 0.07) * 80, gps_t * 0.01], -1
    )
    slam_t = np.linspace(gps_t[0], gps_t[-1], 5000)
    out = alignment.align_gps_to_slam(
        jnp.asarray(slam_t), jnp.asarray(gps_t), jnp.asarray(gps_p),
        spline_solver="tridiagonal",
    )
    assert np.asarray(out.valid).all()
    # Smooth signal: spline interpolation error must be tiny.
    truth = np.stack(
        [np.sin(slam_t * 0.1) * 100, np.cos(slam_t * 0.07) * 80, slam_t * 0.01], -1
    )
    err = np.abs(np.asarray(out.aligned) - truth).max()
    assert err < 1e-4, err


def test_tridiag_pallas_ladder_matches_lax(monkeypatch):
    """tridiag_solve(platform != cpu) swaps its three scans onto the
    single-kernel Pallas ladders; verified in interpret mode against the
    lax path (reassociation changes f32 rounding only)."""
    import jax
    import jax.numpy as jnp

    from gps_optimize_slam_tpu.ops import tridiag
    from gps_optimize_slam_tpu.ops import pallas_scan

    real_impl = tridiag._scan_impl

    def fake_impl(platform, identity):
        if platform not in ("cpu",):
            return pallas_scan.make_scan_fn(identity, interpret=True)
        return real_impl(platform, identity)

    monkeypatch.setattr(tridiag, "_scan_impl", fake_impl)

    rng = np.random.default_rng(0)
    n = 700
    a = rng.uniform(0.1, 0.4, n)
    b = rng.uniform(1.5, 2.5, n)
    c = rng.uniform(0.1, 0.4, n)
    d = rng.normal(size=(n, 3))
    # Passive identity rows decouple segments — include some.
    a[0] = c[-1] = 0.0
    a[200] = c[199] = 0.0
    f32 = jnp.float32
    want = np.asarray(
        tridiag.tridiag_solve(
            jnp.asarray(a, f32), jnp.asarray(b, f32), jnp.asarray(c, f32),
            jnp.asarray(d, f32), platform="cpu",
        )
    )
    got = np.asarray(
        tridiag.tridiag_solve(
            jnp.asarray(a, f32), jnp.asarray(b, f32), jnp.asarray(c, f32),
            jnp.asarray(d, f32), platform="tpu",
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
