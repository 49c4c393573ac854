"""Feature triangulation: inverse-depth Levenberg-Marquardt over all stereo
observations of a feature.

Reproduces the reference's ``Feature.initialize_position`` /
``generate_initial_guess`` / ``cost`` / ``jacobian`` / ``check_motion``
(reference src/feature/feature_position_initializer.py:6-77,
feature_depth_estimator.py:4-15, feature_observation.py:4-39,
feature_motion_checker.py:16-45) with fixed shapes: a feature has at most
``max_cam_states`` observations, each contributing a (cam0, cam1) pose pair,
giving 2N masked single-camera views.

Quirk preserved: the reference's ``inner_count`` is shared across outer LM
iterations, so at most ``inner_loop_max_iteration`` linear solves happen in
TOTAL — the loop below replicates that exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ...config import TriangulationConfig
from ...utils import quaternion as quat


class TriangulationViews(NamedTuple):
    """2N masked camera views of one feature, all expressed in the anchor
    (first observing cam0) frame: x_ci = R @ x_anchor + t."""

    R: jnp.ndarray  # (2N, 3, 3)
    t: jnp.ndarray  # (2N, 3)
    z: jnp.ndarray  # (2N, 2) normalized measurements
    mask: jnp.ndarray  # (2N,)
    R_anchor: jnp.ndarray  # (3, 3) anchor cam0 -> world
    t_anchor: jnp.ndarray  # (3,)


def build_views(cam_q, cam_p, obs, obs_mask, R_c0c1, t_c0c1) -> TriangulationViews:
    """Assemble the masked view list from window poses + slot-aligned obs.

    cam_q/cam_p: (N,4)/(N,3) window poses (world->cam0 quaternion, cam0
    position in world); obs: (N,4) normalized [u0 v0 u1 v1]; obs_mask: (N,).
    Views are ordered [cam0_0, cam1_0, cam0_1, cam1_1, ...] to match the
    reference's interleaved pose list.
    """
    N = obs.shape[0]
    dtype = obs.dtype

    R_w_c0 = quat.to_rotation(cam_q)  # (N,3,3) world->cam0
    # cam0 -> world pose
    R_c0_w = jnp.swapaxes(R_w_c0, -1, -2)
    t_c0_w = cam_p

    # cam1 -> world: cam0_pose * inv(T_cam1_cam0) with T_c1_c0 = (R_c0c1, t_c0c1)^-1
    R_c1_c0 = R_c0c1.T
    t_c1_c0 = -R_c0c1.T @ t_c0c1
    R_c1_w = R_c0_w @ R_c1_c0
    t_c1_w = jnp.einsum("nij,j->ni", R_c0_w, t_c1_c0) + t_c0_w

    # anchor = first valid obs cam0 pose
    first = jnp.argmax(obs_mask)
    R_a = R_c0_w[first]
    t_a = t_c0_w[first]

    # view_i: anchor -> cam_i transform: inv(pose_i) * anchor_pose
    def rel(Rp, tp):
        Rr = jnp.einsum("nji,jk->nik", Rp, R_a)  # Rp^T @ R_a
        tr = jnp.einsum("nji,nj->ni", Rp, t_a - tp)
        return Rr, tr

    R0r, t0r = rel(R_c0_w, t_c0_w)
    R1r, t1r = rel(R_c1_w, t_c1_w)

    R_all = jnp.stack([R0r, R1r], axis=1).reshape(2 * N, 3, 3)
    t_all = jnp.stack([t0r, t1r], axis=1).reshape(2 * N, 3)
    z_all = obs.reshape(N, 2, 2).reshape(2 * N, 2)
    m_all = jnp.stack([obs_mask, obs_mask], axis=1).reshape(2 * N)
    # Roll the anchor pair to the front so masked entries never sit before
    # valid ones; view order within the valid set is preserved because slots
    # are chronologically compact (obs_mask is contiguous in practice for the
    # slots a live feature observed).
    return TriangulationViews(R_all, t_all, z_all, m_all, R_a, t_a)


def _initial_guess(views: TriangulationViews):
    """Two-view closed-form depth (reference feature_depth_estimator.py:4-15):
    anchor cam0 view and its cam1 partner (first valid observation pair)."""
    first = jnp.argmax(views.mask)  # index of anchor cam0 view
    z1 = views.z[first]
    z2 = views.z[first + 1]
    R, t = views.R[first + 1], views.t[first + 1]
    m = R @ jnp.concatenate([z1, jnp.ones((1,), z1.dtype)])
    a = m[:2] - z2 * m[2]
    b = z2 * t[2] - t[:2]
    depth = (a @ b) / (a @ a)
    p = jnp.concatenate([z1, jnp.ones((1,), z1.dtype)]) * depth
    # inverse-depth parameterization (alpha, beta, rho)
    return jnp.stack([p[0] / p[2], p[1] / p[2], 1.0 / p[2]])


def _costs(views, x):
    """Per-view squared reprojection error, masked (reference
    feature_observation.py:4-12)."""
    alpha, beta, rho = x[0], x[1], x[2]
    g = jnp.stack([alpha, beta, jnp.ones_like(alpha)])
    h = jnp.einsum("nij,j->ni", views.R, g) + rho * views.t  # (2N,3)
    z_hat = h[:, :2] / h[:, 2:3]
    e = jnp.sum((z_hat - views.z) ** 2, axis=-1)
    return jnp.where(views.mask, e, 0.0)


def _total_cost(views, x):
    return jnp.sum(_costs(views, x))


def _normal_equations(views, x, huber_eps):
    """Accumulate A = sum w^2 J^T J, b = sum w^2 J^T r over masked views
    (reference feature_observation.py:14-39 + the LM accumulation loop)."""
    alpha, beta = x[0], x[1]
    rho = x[2]
    g = jnp.stack([alpha, beta, jnp.ones_like(alpha)])
    h = jnp.einsum("nij,j->ni", views.R, g) + rho * views.t  # (2N,3)
    h1, h2 = h[:, 0], h[:, 1]
    # masked views must stay finite so w2=0 actually zeroes them (0*inf=nan)
    h3 = jnp.where(views.mask, h[:, 2], 1.0)

    W = jnp.concatenate([views.R[:, :, :2], views.t[:, :, None]], axis=-1)  # (2N,3,3)
    J0 = W[:, 0, :] / h3[:, None] - W[:, 2, :] * (h1 / (h3 * h3))[:, None]
    J1 = W[:, 1, :] / h3[:, None] - W[:, 2, :] * (h2 / (h3 * h3))[:, None]
    J = jnp.stack([J0, J1], axis=1)  # (2N,2,3)

    z_hat = jnp.stack([h1 / h3, h2 / h3], axis=-1)
    r = z_hat - views.z  # (2N,2)

    e = jnp.linalg.norm(r, axis=-1)
    w = jnp.where(e <= huber_eps, 1.0, huber_eps / (2.0 * e))
    w2 = jnp.where(views.mask, w * w, 0.0)

    A = jnp.einsum("n,nki,nkj->ij", w2, J, J)
    b = jnp.einsum("n,nki,nk->i", w2, J, r)
    return A, b


def _solve3(A, b):
    """Closed-form 3x3 solve (Cramer / adjugate).  Batched LU is pathological
    on TPU for tiny systems; this is a handful of VPU ops."""
    c0 = jnp.cross(A[:, 1], A[:, 2])
    c1 = jnp.cross(A[:, 2], A[:, 0])
    c2 = jnp.cross(A[:, 0], A[:, 1])
    det = A[:, 0] @ c0
    safe = jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    x = jnp.stack([b @ c0, b @ c1, b @ c2]) / safe
    return jnp.where(jnp.abs(det) > 1e-30, x, jnp.zeros_like(x))


def triangulate(views: TriangulationViews, tri: TriangulationConfig,
                active=None):
    """LM solve; returns (position_world, is_valid).

    Loop structure mirrors the reference exactly: outer loop recomputes the
    normal equations; the inner loop retries the damped solve until the cost
    drops, with the inner counter shared across outer iterations.

    ``active=False`` makes the loops exit immediately (outputs unused by the
    caller).  Under ``vmap`` a while_loop runs until EVERY batch element's
    condition is false, so without this the padding slots of a masked batch
    — whose stale observations never converge — would drag every frame to
    the worst-case iteration count.
    """
    dtype = views.z.dtype
    x0 = _initial_guess(views)
    lambd0 = jnp.asarray(tri.initial_damping, dtype)
    cost0 = _total_cost(views, x0)
    eye3 = jnp.eye(3, dtype=dtype)

    if tri.static_solve:
        x = _triangulate_static(views, tri, x0, lambd0, cost0, eye3, active)
        return _finish(views, x)

    # carry: (x, lambd, total_cost, delta_norm, outer, inner)
    def outer_cond(c):
        x, lam, cost, dnorm, outer, inner = c
        return jnp.logical_and(
            outer < tri.outer_loop_max_iteration, dnorm > tri.estimation_precision
        )

    def outer_body(c):
        x, lam, cost, dnorm, outer, inner = c
        A, b = _normal_equations(views, x, tri.huber_epsilon)

        def inner_cond(ic):
            x, lam, cost, dnorm, inner, reduced = ic
            return jnp.logical_and(inner < tri.inner_loop_max_iteration, ~reduced)

        def inner_body(ic):
            x, lam, cost, dnorm, inner, reduced = ic
            delta = _solve3(A + lam * eye3, b)
            x_new = x - delta
            dnorm_new = jnp.linalg.norm(delta)
            cost_new = _total_cost(views, x_new)
            better = cost_new < cost
            x = jnp.where(better, x_new, x)
            cost = jnp.where(better, cost_new, cost)
            lam = jnp.where(
                better, jnp.maximum(lam / 10.0, 1e-10), jnp.minimum(lam * 10.0, 1e12)
            )
            return (x, lam, cost, dnorm_new, inner + 1, better)

        x, lam, cost, dnorm, inner, _ = lax.while_loop(
            inner_cond, inner_body, (x, lam, cost, dnorm, inner, jnp.array(False))
        )
        return (x, lam, cost, dnorm, outer + 1, inner)

    dnorm0 = jnp.asarray(jnp.inf, dtype)
    if active is not None:
        dnorm0 = jnp.where(active, dnorm0, 0.0)  # inactive: loops never run
    init = (x0, lambd0, cost0, dnorm0, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    x, _, _, _, _, _ = lax.while_loop(outer_cond, outer_body, init)
    return _finish(views, x)


def _finish(views: TriangulationViews, x):
    dtype = views.z.dtype
    final = jnp.stack([x[0], x[1], jnp.ones((), dtype)]) / x[2]
    depths = jnp.einsum("nij,j->ni", views.R, final)[:, 2] + views.t[:, 2]
    # validity: positive depth in every observing camera
    ok = jnp.all(jnp.where(views.mask, depths > 0, True))
    pos_world = views.R_anchor @ final + views.t_anchor
    return pos_world, ok


def _triangulate_static(views, tri, x0, lambd0, cost0, eye3, active):
    """Result-identical straight-line form of the reference's nested LM
    loops (see ``triangulate``).

    The reference shares the inner damping-retry counter across outer
    iterations, so at most ``inner_loop_max_iteration`` linear solves run in
    TOTAL; solves group into "outer" segments that each start by recomputing
    the normal equations at the current estimate and end when a solve
    reduces the cost.  The flat recurrence below walks those (at most)
    inner_max solve slots with masked updates: a slot that opens a new
    segment first applies the outer-loop termination test (outer count /
    delta-norm precision) and refreshes (A, b).  Spin iterations the
    reference performs after the inner counter saturates never change the
    estimate, so dropping them preserves the result exactly.
    """
    dtype = views.z.dtype
    OMAX = tri.outer_loop_max_iteration
    IMAX = tri.inner_loop_max_iteration
    eps = tri.estimation_precision

    x, lam, cost = x0, lambd0, cost0
    dnorm = jnp.asarray(jnp.inf, dtype)
    if active is not None:
        dnorm = jnp.where(active, dnorm, 0.0)
    alive = jnp.ones((), bool) if active is None else active
    group_start = jnp.ones((), bool)
    outer = jnp.zeros((), jnp.int32)
    A = jnp.zeros((3, 3), dtype)
    b = jnp.zeros((3,), dtype)

    for _ in range(IMAX):
        # segment boundary: outer-loop termination test + NE refresh
        cond_ok = (outer < OMAX) & (dnorm > eps)
        alive = alive & jnp.where(group_start, cond_ok, True)
        start_now = alive & group_start
        A_new, b_new = _normal_equations(views, x, tri.huber_epsilon)
        A = jnp.where(start_now, A_new, A)
        b = jnp.where(start_now, b_new, b)
        outer = outer + start_now.astype(jnp.int32)

        # one damped solve (the reference's inner_body), masked by ``alive``
        delta = _solve3(A + lam * eye3, b)
        x_new = x - delta
        dnorm_new = jnp.linalg.norm(delta)
        cost_new = _total_cost(views, x_new)
        better = cost_new < cost
        x = jnp.where(alive & better, x_new, x)
        cost = jnp.where(alive & better, cost_new, cost)
        lam = jnp.where(
            alive,
            jnp.where(better, jnp.maximum(lam / 10.0, 1e-10),
                      jnp.minimum(lam * 10.0, 1e12)),
            lam,
        )
        dnorm = jnp.where(alive, dnorm_new, dnorm)
        group_start = jnp.where(alive, better, group_start)
    return x


def check_motion(views: TriangulationViews, obs_mask, first_z, tri: TriangulationConfig,
                 cam_q, cam_p):
    """Baseline check (reference feature_motion_checker.py:16-45).  With the
    EuRoC config's negative threshold this always passes, but the real test is
    implemented for configs that enable it."""
    if tri.translation_threshold < 0:
        return jnp.ones((), bool)
    N = obs_mask.shape[0]
    idx = jnp.arange(N)
    first = jnp.argmax(obs_mask)
    last = (N - 1) - jnp.argmax(obs_mask[::-1])
    R_first = quat.to_rotation(cam_q[first]).T  # cam->world
    t_first = cam_p[first]
    t_last = cam_p[last]
    direction = jnp.concatenate([first_z, jnp.ones((1,), first_z.dtype)])
    direction = direction / jnp.linalg.norm(direction)
    direction = R_first @ direction
    translation = t_last - t_first
    parallel = translation @ direction
    ortho = translation - parallel * direction
    return jnp.linalg.norm(ortho) > tri.translation_threshold
