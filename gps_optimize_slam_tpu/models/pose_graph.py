"""Pose-graph NLLS: Gauss-Newton with GPS unary priors and loop closures.

Extension beyond the reference (BASELINE.json config 5: "pose-graph NLLS
with GPS unary priors + loop closures (Gauss-Newton sparse CG solve)") —
the global-optimisation alternative to filtering: all poses optimised
jointly over

* odometry (binary) factors from SLAM relative poses,
* GPS unary position priors (masked),
* loop-closure (binary) factors between arbitrary pose pairs (masked),

minimising the weighted squared residual norm. TPU-native design: the
normal equations are solved MATRIX-FREE — Jv via `jax.jvp`, Jᵀu via
`jax.vjp`, so the Gauss-Newton system (JᵀJ + λI)δ = −Jᵀr becomes CG on
Hessian-vector products with no sparse-matrix assembly at all; XLA fuses
each CG iteration into a handful of batched kernels. Rotations live on the
SO(3) manifold: the state is updated through a local tangent retraction
(quaternion exp map), residual orientation errors through the log map.

Everything is fixed-shape: loop closures are a padded (max_loops, 2) index
array with a validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gps_optimize_slam_tpu.ops import quaternion as quat
from gps_optimize_slam_tpu.utils.precision import highp


class PoseGraphData(NamedTuple):
    """Factor-graph inputs (all fixed shapes)."""

    odo_dp: jnp.ndarray  # (N-1,3) SLAM relative translations (local frame)
    odo_dq: jnp.ndarray  # (N-1,4) SLAM relative rotations
    gps: jnp.ndarray  # (N,3) GPS position priors (arbitrary where invalid)
    gps_valid: jnp.ndarray  # (N,) bool
    loop_ij: jnp.ndarray  # (L,2) int32 loop-closure pose pairs
    loop_dp: jnp.ndarray  # (L,3) measured relative translation i→j
    loop_dq: jnp.ndarray  # (L,4) measured relative rotation
    loop_valid: jnp.ndarray  # (L,) bool
    w_odo_p: float = 10.0  # weight (1/σ) translation odometry
    w_odo_q: float = 20.0  # weight rotation odometry
    w_gps: float = 2.0  # weight GPS prior
    w_loop_p: float = 10.0
    w_loop_q: float = 20.0


class PoseGraphState(NamedTuple):
    positions: jnp.ndarray  # (N,3)
    quaternions: jnp.ndarray  # (N,4)


def _retract(state: PoseGraphState, delta: jnp.ndarray) -> PoseGraphState:
    """Apply a tangent update δ = (N,6): [δp, δθ] with right-multiplied
    SO(3) increments."""
    dp = delta[:, :3]
    dth = delta[:, 3:]
    return PoseGraphState(
        positions=state.positions + dp,
        quaternions=quat.normalize(
            quat.mul(state.quaternions, quat.exp_map(dth))
        ),
    )


def _relative_residual(p_i, q_i, p_j, q_j, meas_dp, meas_dq, w_p, w_q):
    """Weighted SE(3) residual of pose_i→pose_j against a measurement."""
    q_i_inv = quat.conj(quat.normalize(q_i))
    dp_est = quat.rotate(q_i_inv, p_j - p_i)
    dq_est = quat.mul(q_i_inv, quat.normalize(q_j))
    r_p = (dp_est - meas_dp) * w_p
    # log(meas⁻¹ ∘ est): rotation error in the tangent space.
    r_q = quat.log_map(quat.mul(quat.conj(meas_dq), dq_est)) * w_q
    return jnp.concatenate([r_p, r_q], axis=-1)


def residuals(state: PoseGraphState, data: PoseGraphData) -> jnp.ndarray:
    """All weighted residuals, flattened (fixed shape; invalid rows zero)."""
    r_odo = _relative_residual(
        state.positions[:-1],
        state.quaternions[:-1],
        state.positions[1:],
        state.quaternions[1:],
        data.odo_dp,
        data.odo_dq,
        data.w_odo_p,
        data.w_odo_q,
    )
    r_gps = (state.positions - data.gps) * data.w_gps
    r_gps = jnp.where(data.gps_valid[:, None], r_gps, 0.0)
    i = data.loop_ij[:, 0]
    j = data.loop_ij[:, 1]
    r_loop = _relative_residual(
        state.positions[i],
        state.quaternions[i],
        state.positions[j],
        state.quaternions[j],
        data.loop_dp,
        data.loop_dq,
        data.w_loop_p,
        data.w_loop_q,
    )
    r_loop = jnp.where(data.loop_valid[:, None], r_loop, 0.0)
    return jnp.concatenate([r_odo.ravel(), r_gps.ravel(), r_loop.ravel()])


class GNResult(NamedTuple):
    state: PoseGraphState
    cost_history: jnp.ndarray  # (iters+1,) 0.5·‖r‖² per iteration
    final_cost: jnp.ndarray


@partial(jax.jit, static_argnames=("iterations", "cg_iters"))
@highp
def solve_pose_graph(
    init: PoseGraphState,
    data: PoseGraphData,
    iterations: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
) -> GNResult:
    """Gauss-Newton with matrix-free CG normal-equation solves.

    Each iteration linearises the residual around the current state in the
    tangent space (δ ∈ R^{N×6}), solves (JᵀJ + λI)δ = −Jᵀr by conjugate
    gradients using jvp/vjp Hessian-vector products, and retracts.
    """
    n = init.positions.shape[0]
    dtype = init.positions.dtype

    def cost(state):
        r = residuals(state, data)
        return 0.5 * jnp.sum(r * r)

    def gn_step(state, _):
        def r_of_delta(delta):
            return residuals(_retract(state, delta), data)

        delta0 = jnp.zeros((n, 6), dtype)
        r0, pullback = jax.vjp(r_of_delta, delta0)
        grad = pullback(r0)[0]  # Jᵀ r

        def hvp(v):
            _, jv = jax.jvp(r_of_delta, (delta0,), (v,))
            return pullback(jv)[0] + damping * v

        delta, _ = jax.scipy.sparse.linalg.cg(
            hvp, -grad, maxiter=cg_iters, tol=1e-10
        )
        new_state = _retract(state, delta)
        # Keep the step only if it reduces the cost (plain GN safeguard).
        improved = cost(new_state) < cost(state)
        new_state = jax.tree.map(
            lambda a, b: jnp.where(improved, a, b), new_state, state
        )
        return new_state, cost(new_state)

    c0 = cost(init)
    final, costs = jax.lax.scan(gn_step, init, None, length=iterations)
    return GNResult(
        state=PoseGraphState(
            positions=final.positions,
            quaternions=quat.normalize(final.quaternions),
        ),
        cost_history=jnp.concatenate([c0[None], costs]),
        final_cost=costs[-1],
    )


def solve_pose_graph_checkpointed(
    init: PoseGraphState,
    data: PoseGraphData,
    iterations: int = 10,
    cg_iters: int = 50,
    damping: float = 1e-6,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> GNResult:
    """``solve_pose_graph`` with periodic orbax checkpointing and resume.

    The long-running optimisation (SURVEY §5: the one loop worth
    checkpointing) runs in rounds of ``checkpoint_every`` GN iterations —
    each round ONE jitted ``solve_pose_graph`` call carrying the state — and
    persists (state, cost history, round index) after every round. If
    ``checkpoint_dir`` holds a checkpoint and ``resume`` is True, the run
    continues from it; a completed run restores instantly. Deterministic:
    an interrupted+resumed run reproduces the uninterrupted result exactly
    (GN rounds are pure functions of the carried state).
    """
    import numpy as np

    from gps_optimize_slam_tpu.utils import checkpoint as ckpt

    if checkpoint_dir is None:
        return solve_pose_graph(
            init, data, iterations=iterations, cg_iters=cg_iters, damping=damping
        )

    state = init
    costs: list = []
    start = 0
    if resume:
        import os

        if os.path.exists(os.path.join(checkpoint_dir, "state")):
            state, meta = ckpt.restore_checkpoint(checkpoint_dir, init)
            state = PoseGraphState(
                positions=jnp.asarray(state.positions),
                quaternions=jnp.asarray(state.quaternions),
            )
            costs = list(meta["costs"])
            start = int(meta["iterations_done"])

    first_round = True
    while start < iterations:
        step = min(checkpoint_every, iterations - start)
        res = solve_pose_graph(
            state, data, iterations=step, cg_iters=cg_iters, damping=damping
        )
        state = res.state
        hist = np.asarray(res.cost_history)
        if first_round and start == 0:
            costs = [float(hist[0])]
        costs.extend(float(c) for c in hist[1:])
        start += step
        first_round = False
        ckpt.save_checkpoint(
            checkpoint_dir,
            state,
            metadata={"iterations_done": start, "costs": costs},
        )

    cost_history = jnp.asarray(np.asarray(costs, np.float64))
    return GNResult(
        state=state, cost_history=cost_history, final_cost=cost_history[-1]
    )


@partial(jax.jit, static_argnames=("max_loops", "suppression_radius"))
@highp
def propose_loop_closures(
    positions: jnp.ndarray,
    times: jnp.ndarray,
    quaternions: jnp.ndarray,
    radius: float = 5.0,
    min_time_gap: float = 30.0,
    max_loops: int = 32,
    suppression_radius: int = 25,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Proximity-based loop-closure proposal over a trajectory (the front
    end the pose-graph solver was missing — VERDICT r2 task 5).

    For every pose j, finds the nearest pose i at least ``min_time_gap``
    seconds EARLIER; candidate revisits are pairs closer than ``radius``
    metres. Candidates that are not the locally best revisit within
    ``suppression_radius`` poses are suppressed (one closure per revisit
    event, not a chain of near-duplicates), and the ``max_loops`` closest
    survivors are kept. The measured relative pose is read from the
    trajectory passed in — pass the trajectory you trust locally (e.g. raw
    SLAM, which is drift-free over a single revisit) while optimising a
    different initial state.

    Fully jittable, fixed shapes: returns ``(loop_ij (max_loops, 2),
    loop_dp (max_loops, 3), loop_dq (max_loops, 4), loop_valid
    (max_loops,))`` ready for ``PoseGraphData``. O(N²) distance matrix —
    the pose-graph solver is in-core anyway; for >HBM trajectories run it
    on a fused-output subsample.
    """
    n = positions.shape[0]
    dtype = positions.dtype
    d2 = jnp.sum(
        (positions[:, None, :] - positions[None, :, :]) ** 2, axis=-1
    )
    earlier = (times[None, :] - times[:, None]) > min_time_gap  # [i, j]
    d2m = jnp.where(earlier, d2, jnp.inf)
    best_i = jnp.argmin(d2m, axis=0)  # (n,) nearest sufficiently-old pose
    best_d2 = jnp.min(d2m, axis=0)

    # Non-minimum suppression: j survives only where best_d2 is the minimum
    # over its ±suppression_radius neighbourhood (one closure per revisit).
    w = suppression_radius
    neigh_min = best_d2
    for s in range(1, w + 1):
        neigh_min = jnp.minimum(
            neigh_min,
            jnp.minimum(
                jnp.roll(jnp.where(jnp.arange(n) < n - s, best_d2, jnp.inf), s),
                jnp.roll(jnp.where(jnp.arange(n) >= s, best_d2, jnp.inf), -s),
            ),
        )
    # Shifted copies above are padded with +inf at the wrapped edges, so the
    # neighbourhood never wraps around the trajectory ends.
    is_local_best = best_d2 <= neigh_min
    score = jnp.where(
        is_local_best & (best_d2 < radius * radius), best_d2, jnp.inf
    )
    top_score, j_sel = jax.lax.top_k(-score, max_loops)
    loop_valid = jnp.isfinite(-top_score)
    i_sel = best_i[j_sel]
    loop_ij = jnp.stack([i_sel, j_sel], axis=-1).astype(jnp.int32)

    q_i = quat.normalize(quaternions[i_sel])
    q_j = quat.normalize(quaternions[j_sel])
    q_i_inv = quat.conj(q_i)
    loop_dp = quat.rotate(q_i_inv, positions[j_sel] - positions[i_sel]).astype(dtype)
    loop_dq = quat.mul(q_i_inv, q_j).astype(dtype)
    loop_dp = jnp.where(loop_valid[:, None], loop_dp, 0.0)
    loop_dq = jnp.where(
        loop_valid[:, None],
        loop_dq,
        jnp.zeros((4,), dtype).at[3].set(1.0),
    )
    return loop_ij, loop_dp, loop_dq, loop_valid


def build_data_from_fusion(
    slam_pos: jnp.ndarray,
    slam_quat: jnp.ndarray,
    aligned_gps: jnp.ndarray,
    gps_valid: jnp.ndarray,
    loop_ij: Optional[jnp.ndarray] = None,
    loop_dp: Optional[jnp.ndarray] = None,
    loop_dq: Optional[jnp.ndarray] = None,
    loop_valid: Optional[jnp.ndarray] = None,
    **weights,
) -> PoseGraphData:
    """Assemble factors from the standard fusion inputs (odometry from the
    SLAM stream, unary priors from the aligned GPS)."""
    from gps_optimize_slam_tpu.ops import se3

    dp, dq = se3.relative_poses_along(slam_pos, slam_quat)
    if loop_ij is None:
        loop_ij = jnp.zeros((1, 2), jnp.int32)
        loop_dp = jnp.zeros((1, 3), slam_pos.dtype)
        loop_dq = jnp.zeros((1, 4), slam_pos.dtype).at[:, 3].set(1.0)
        loop_valid = jnp.zeros((1,), bool)
    return PoseGraphData(
        odo_dp=dp,
        odo_dq=dq,
        gps=jnp.nan_to_num(aligned_gps, nan=0.0),
        gps_valid=gps_valid,
        loop_ij=loop_ij,
        loop_dp=loop_dp,
        loop_dq=loop_dq,
        loop_valid=loop_valid,
        **weights,
    )
