"""One-sided-Jacobi 3×3 SVD tests vs LAPACK, incl. the ill-conditioned
float32 regime where XLA's general TPU SVD was measured to fail."""

import numpy as np
import jax.numpy as jnp

from gps_optimize_slam_tpu.ops.linalg3 import svd3x3


def check_svd(H, atol_recon, atol_sv, dtype=np.float64):
    Hj = jnp.asarray(H.astype(dtype))
    U, S, Vt = svd3x3(Hj)
    U, S, Vt = np.asarray(U, np.float64), np.asarray(S, np.float64), np.asarray(Vt, np.float64)
    # Orthonormality.
    np.testing.assert_allclose(U.swapaxes(-1, -2) @ U, np.broadcast_to(np.eye(3), U.shape), atol=1e-6 if dtype == np.float32 else 1e-12)
    np.testing.assert_allclose(Vt @ Vt.swapaxes(-1, -2), np.broadcast_to(np.eye(3), Vt.shape), atol=1e-6 if dtype == np.float32 else 1e-12)
    # Singular values match LAPACK (computed in f64).
    S_ref = np.linalg.svd(H.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(S, S_ref, atol=atol_sv)
    # Reconstruction.
    recon = U @ (S[..., :, None] * Vt)
    np.testing.assert_allclose(recon, H.astype(np.float64), atol=atol_recon)
    assert np.all(np.diff(S, axis=-1) <= 1e-12)  # descending


def test_random_batch_f64():
    rng = np.random.default_rng(0)
    H = rng.normal(size=(64, 3, 3))
    check_svd(H, atol_recon=1e-12, atol_sv=1e-12)


def test_illconditioned_f64():
    rng = np.random.default_rng(1)
    for i in range(20):
        U, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        V, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        S = np.diag([1e6, 3e3, 10.0 ** rng.uniform(-4, 1)])
        H = U @ S @ V.T
        check_svd(H[None], atol_recon=1e-6, atol_sv=2e-6)


def test_illconditioned_f32_relative_accuracy():
    # The kitti-04 regime: σ1/σ3 ~ 1e5. One-sided Jacobi must keep the
    # small singular value to ~relative precision (HᵀH-based methods lose
    # it entirely at this conditioning in f32).
    rng = np.random.default_rng(2)
    for i in range(10):
        U, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        V, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        sv = np.array([4.6e5, 2.3e3, 4.6e0])
        H = (U @ np.diag(sv) @ V.T).astype(np.float32)
        Uj, Sj, Vtj = svd3x3(jnp.asarray(H))
        S_ref = np.linalg.svd(H.astype(np.float64), compute_uv=False)
        rel = np.abs(np.asarray(Sj, np.float64) - S_ref) / S_ref
        assert rel[0] < 1e-6 and rel[1] < 1e-4 and rel[2] < 1e-2, rel
        recon = np.asarray(Uj, np.float64) @ (
            np.asarray(Sj, np.float64)[:, None] * np.asarray(Vtj, np.float64)
        )
        np.testing.assert_allclose(recon, H, atol=sv[0] * 1e-6)


def test_rank_deficient_and_zero():
    # Rank-2, rank-1, zero matrices: orthonormal completion must hold.
    a = np.array([1.0, 2.0, 3.0])
    b = np.array([-1.0, 0.5, 2.0])
    cases = [
        np.outer(a, b),  # rank 1
        np.outer(a, b) + np.outer(b, a),  # rank 2 symmetric
        np.zeros((3, 3)),
    ]
    for H in cases:
        U, S, Vt = svd3x3(jnp.asarray(H))
        U, S, Vt = map(lambda x: np.asarray(x, np.float64), (U, S, Vt))
        np.testing.assert_allclose(U.T @ U, np.eye(3), atol=1e-10)
        S_ref = np.linalg.svd(H, compute_uv=False)
        np.testing.assert_allclose(S, S_ref, atol=1e-10)
        np.testing.assert_allclose(U @ (S[:, None] * Vt), H, atol=1e-9)


def test_rotationlike_inputs():
    from scipy.spatial.transform import Rotation

    rng = np.random.default_rng(3)
    R = Rotation.from_rotvec(rng.normal(size=(32, 3))).as_matrix()
    check_svd(R, atol_recon=1e-12, atol_sv=1e-12)


def test_unrolled_sweeps_match_fori():
    # unroll=True runs the SAME sweep ops as the fori form, just as
    # straight-line code (used on the RANSAC tail's latency-critical scalar
    # calls). XLA's per-compilation fusion choices reassociate a few FMAs,
    # so parity is few-ulp, not bitwise (measured ~1e-15 f64 on this host).
    rng = np.random.default_rng(7)
    H64 = rng.normal(size=(16, 3, 3))
    U_a, S_a, Vt_a = svd3x3(jnp.asarray(H64))
    U_b, S_b, Vt_b = svd3x3(jnp.asarray(H64), unroll=True)
    for a, b in ((U_a, U_b), (S_a, S_b), (Vt_a, Vt_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
    H32 = H64.astype(np.float32)
    U_a, S_a, Vt_a = svd3x3(jnp.asarray(H32))
    U_b, S_b, Vt_b = svd3x3(jnp.asarray(H32), unroll=True)
    for a, b in ((U_a, U_b), (S_a, S_b), (Vt_a, Vt_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
