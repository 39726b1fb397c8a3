"""Bundle adjustment: Levenberg-Marquardt with Schur complement in JAX.

The reference solves rig calibration with Ceres (numeric-diff functors +
Huber loss + parameter locking; ``calibration/GeometricCalibration.h:53-384``,
``.cpp:995-1205``). Here the same problem is a JAX-native sparse LM:

- per-observation residuals/Jacobians via ``jax.jacfwd`` under ``vmap``
  (exact derivatives instead of Ceres' central differences),
- the point-block structure exploited with a Schur complement — H_pp is
  block-diagonal 3x3 per trace (segment-sum), the camera system is dense and
  tiny (<= ~32 cameras x 12 params),
- Huber robustness via IRLS reweighting (delta = 1, matching
  ceres::HuberLoss(1.0)),
- parameter locking/sharing via a free-mask over the global camera parameter
  vector and per-camera group index maps (shared principal/focal/distortion,
  GeometricCalibration.cpp:1108-1140),
- the reference-camera gauge (baseline radius lock, SphericalReprojection
  functor) as a manifold retraction after each accepted step.

Runs in float64 on CPU (calibration is a host-side solve; the data is tiny).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core import camera as cam
from ..utils.hostmath import on_host

# Calibration is a host-side double-precision solve (the reference uses
# Camera::Real = double throughout); without x64, f32 camera math inflates
# reprojection residuals enough to break outlier rejection.
jax.config.update("jax_enable_x64", True)

HUBER_DELTA = 1.0


def _bucket(n: int, quantum: int = 256) -> int:
    """Round up to the shape bucket (compile-cache friendly padding)."""
    return max(((n + quantum - 1) // quantum) * quantum, quantum)


def rodrigues(rotvec: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis (3,) -> rotation matrix (3,3) (Eigen AngleAxis convention)."""
    angle = jnp.linalg.norm(rotvec)
    safe = jnp.maximum(angle, 1e-30)
    k = rotvec / safe
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]], rotvec.dtype
    )
    r = jnp.eye(3, dtype=rotvec.dtype) + jnp.sin(angle) * kx + (1 - jnp.cos(angle)) * (kx @ kx)
    return jnp.where(angle < 1e-12, jnp.eye(3, dtype=rotvec.dtype), r)


def rotation_to_rotvec(r: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    return Rotation.from_matrix(np.asarray(r)).as_rotvec()


class Problem(NamedTuple):
    """A calibration problem over one rig.

    Camera parameters are flattened into one global vector theta:
      [positions (N*3) | rotvecs (N*3) | principals (P*2) | focals (P) |
       distortions (D*3)]
    with per-camera index maps pf_idx (camera -> principal/focal slot) and
    d_idx (camera -> distortion slot) implementing group sharing.
    """

    base_cams: cam.Camera  # stacked (N,), double
    pf_idx: np.ndarray  # (N,)
    d_idx: np.ndarray  # (N,)
    n_cams: int
    n_pf: int
    n_d: int

    # observations, padded to a shape bucket; the first n_obs are real
    obs_cam: jnp.ndarray  # (K,) int32
    obs_point: jnp.ndarray  # (K,) int32
    obs_pixel: jnp.ndarray  # (K, 2)
    obs_weight: jnp.ndarray  # (K,) residual scale 1/sqrt(w); inf = padding
    n_obs: int = -1  # real observation count (-1 = all)

    @property
    def theta_size(self) -> int:
        return 6 * self.n_cams + 3 * self.n_pf + 3 * self.n_d

    def slices(self):
        n, p, d = self.n_cams, self.n_pf, self.n_d
        return {
            "position": (0, 3 * n),
            "rotvec": (3 * n, 6 * n),
            "principal": (6 * n, 6 * n + 2 * p),
            "focal": (6 * n + 2 * p, 6 * n + 3 * p),
            "distortion": (6 * n + 3 * p, 6 * n + 3 * p + 3 * d),
        }


def pack_theta(problem: Problem, rig: cam.Rig) -> np.ndarray:
    """Initial parameter vector from a rig (group slots take the first member)."""
    cams = jax.tree.map(np.asarray, rig.cameras)
    n = problem.n_cams
    positions = cams.position.reshape(-1)
    rotvecs = np.stack([rotation_to_rotvec(cams.rotation[i]) for i in range(n)]).reshape(-1)
    principals = np.zeros((problem.n_pf, 2))
    focals = np.zeros(problem.n_pf)
    distortions = np.zeros((problem.n_d, 3))
    for i in range(n):
        principals[problem.pf_idx[i]] = cams.principal[i]
        focals[problem.pf_idx[i]] = cams.focal[i][0]  # scalar focal (x, -x)
        distortions[problem.d_idx[i]] = cams.distortion[i]
    return np.concatenate(
        [positions, rotvecs, principals.reshape(-1), focals, distortions.reshape(-1)]
    )


def unpack_rig(problem: Problem, rig: cam.Rig, theta: np.ndarray) -> cam.Rig:
    s = problem.slices()
    n = problem.n_cams
    positions = theta[s["position"][0] : s["position"][1]].reshape(n, 3)
    rotvecs = theta[s["rotvec"][0] : s["rotvec"][1]].reshape(n, 3)
    principals = theta[s["principal"][0] : s["principal"][1]].reshape(problem.n_pf, 2)
    focals = theta[s["focal"][0] : s["focal"][1]]
    distortions = theta[s["distortion"][0] : s["distortion"][1]].reshape(problem.n_d, 3)
    cams = []
    for i in range(n):
        c = jax.tree.map(np.asarray, rig.camera(i))
        f = focals[problem.pf_idx[i]]
        dist = distortions[problem.d_idx[i]]
        cams.append(
            c._replace(
                position=positions[i],
                rotation=np.asarray(rodrigues(jnp.asarray(rotvecs[i]))),
                principal=principals[problem.pf_idx[i]],
                focal=np.asarray([f, -f]),
                distortion=dist,
                distortion_max=np.asarray(cam._solve_distortion_max(dist)),
            )
        )
    return rig._replace(cameras=cam.stack_cameras(cams))


def make_problem(
    rig: cam.Rig,
    obs_cam,
    obs_point,
    obs_pixel,
    obs_weight=None,
    shared_principal_and_focal: bool = False,
    shared_distortion: bool = True,
) -> Problem:
    n = len(rig.ids)
    groups = list(dict.fromkeys(rig.groups))  # unique, in order
    g_idx = np.asarray([groups.index(g) for g in rig.groups])
    pf_idx = g_idx if shared_principal_and_focal else np.arange(n)
    d_idx = g_idx if shared_distortion else np.arange(n)
    k = len(obs_cam)
    if obs_weight is None:
        obs_weight = np.ones(k)
    # pad the observation count to a bucket so successive calibration passes
    # (whose observation counts differ slightly after outlier removal) reuse
    # the same compiled LM step; padded rows have weight=inf -> residual
    # scale 0 -> zero residuals and Jacobians
    k_pad = _bucket(k)
    if k_pad > k:
        pad = k_pad - k
        obs_cam = np.concatenate([np.asarray(obs_cam), np.zeros(pad, np.int32)])
        obs_point = np.concatenate([np.asarray(obs_point), np.zeros(pad, np.int32)])
        obs_pixel = np.concatenate([np.asarray(obs_pixel), np.zeros((pad, 2))])
        obs_weight = np.concatenate([np.asarray(obs_weight), np.full(pad, np.inf)])
    base = jax.tree.map(lambda a: jnp.asarray(a, jnp.float64) if np.asarray(a).dtype.kind == "f" else jnp.asarray(a), rig.cameras)
    return Problem(
        base_cams=base,
        pf_idx=np.asarray(pf_idx),
        d_idx=np.asarray(d_idx),
        n_cams=n,
        n_pf=int(pf_idx.max()) + 1,
        n_d=int(d_idx.max()) + 1,
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_point, jnp.int32),
        obs_pixel=jnp.asarray(obs_pixel, jnp.float64),
        obs_weight=jnp.asarray(obs_weight, jnp.float64),
        n_obs=k,
    )


def _project(base_cam, position, rotvec, principal, focal, distortion, world):
    """Pixel projection with replaced parameters (makeCamera equivalent,
    GeometricCalibration.h:17-32). Distortion clamp is dropped inside the
    solver (Ceres' numeric functor behaves identically in-range)."""
    c = base_cam._replace(
        position=position,
        rotation=rodrigues(rotvec),
        principal=principal,
        focal=jnp.stack([focal, -focal]),
        distortion=distortion,
        distortion_max=jnp.asarray(jnp.inf, position.dtype),
    )
    return cam.pixel(c, world)


def _per_obs_params(problem: Problem, theta):
    """Gather each observation's camera-side parameter slices + global column
    indices (12 per observation) from the flat theta."""
    s = problem.slices()
    n = problem.n_cams
    ci = problem.obs_cam
    pf = jnp.asarray(problem.pf_idx)[ci]
    di = jnp.asarray(problem.d_idx)[ci]

    pos_cols = s["position"][0] + 3 * ci[:, None] + jnp.arange(3)[None]
    rot_cols = s["rotvec"][0] + 3 * ci[:, None] + jnp.arange(3)[None]
    pri_cols = s["principal"][0] + 2 * pf[:, None] + jnp.arange(2)[None]
    foc_cols = s["focal"][0] + pf[:, None]
    dist_cols = s["distortion"][0] + 3 * di[:, None] + jnp.arange(3)[None]
    cols = jnp.concatenate([pos_cols, rot_cols, pri_cols, foc_cols, dist_cols], axis=1)  # (K, 12)

    params = (
        theta[pos_cols],  # (K, 3)
        theta[rot_cols],
        theta[pri_cols],
        theta[foc_cols][:, 0],
        theta[dist_cols],
    )
    return params, cols


def _res_args(problem: Problem, theta, points):
    (pos, rot, pri, foc, dist), cols = _per_obs_params(problem, theta)
    world = points[problem.obs_point]
    wscale = 1.0 / jnp.sqrt(problem.obs_weight)
    args = (pos, rot, pri, foc, dist, world, problem.obs_cam, problem.obs_pixel, wscale)
    return args, cols


def _make_res_one(base):
    def res_one(pos, rot, pri, foc, dist, world, ci, pixel, wscale):
        base_c = jax.tree.map(lambda a: a[ci], base)
        pred = _project(base_c, pos, rot, pri, foc, dist, world)
        return (pred - pixel) * wscale

    return res_one


def residuals(problem: Problem, theta, points):
    """(K, 2) weighted residuals only — no Jacobians (for cost evaluation)."""
    args, _ = _res_args(problem, theta, points)
    return jax.vmap(_make_res_one(problem.base_cams))(*args)


def residuals_and_jacobians(problem: Problem, theta, points):
    """(K,2) residuals plus per-observation Jacobians wrt the 12 camera params
    and the 3 point coords, all via one vmapped jacfwd."""
    args, cols = _res_args(problem, theta, points)
    res_one = _make_res_one(problem.base_cams)
    r = jax.vmap(res_one)(*args)
    jac = jax.vmap(jax.jacfwd(res_one, argnums=(0, 1, 2, 3, 4, 5)))(*args)
    j_cam = jnp.concatenate(
        [jac[0], jac[1], jac[2], jac[3][..., None], jac[4]], axis=-1
    )  # (K, 2, 12)
    j_pt = jac[5]  # (K, 2, 3)
    return r, j_cam, j_pt, cols


def huber_weights(r_norm, delta=HUBER_DELTA):
    """IRLS weights for ceres::HuberLoss: w = 1 inside, delta/|r| outside."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-30))


def huber_cost(r_norm, delta=HUBER_DELTA):
    return jnp.where(
        r_norm <= delta, r_norm * r_norm, 2 * delta * r_norm - delta * delta
    )


def lm_step(problem: Problem, theta, points, lam, free_mask, robust=True):
    """One Levenberg-Marquardt step via Schur complement. Returns
    (new_theta, new_points, new_cost, predicted_ok)."""
    m = points.shape[0]
    np_cam = problem.theta_size
    r, j_cam, j_pt, cols = residuals_and_jacobians(problem, theta, points)
    r_norm = jnp.linalg.norm(r, axis=-1)
    w = huber_weights(r_norm) if robust else jnp.ones_like(r_norm)
    sw = jnp.sqrt(w)[:, None]
    r_w = r * sw
    j_cam = j_cam * sw[..., None]
    j_pt = j_pt * sw[..., None]

    # zero out locked columns
    col_free = free_mask[cols]  # (K, 12)
    j_cam = j_cam * col_free[:, None, :]

    pid = problem.obs_point
    # H_pp (M, 3, 3), b_p (M, 3)
    h_pp = jax.ops.segment_sum(jnp.einsum("kri,krj->kij", j_pt, j_pt), pid, m)
    b_p = jax.ops.segment_sum(-jnp.einsum("kri,kr->ki", j_pt, r_w), pid, m)
    h_pp_diag = jax.vmap(jnp.diagonal)(h_pp) + 1e-8  # (M, 3)
    h_pp = h_pp + lam * jax.vmap(jnp.diag)(h_pp_diag)
    h_pp_inv = jnp.linalg.inv(h_pp)

    # dense camera system
    jtj = jnp.einsum("kri,krj->kij", j_cam, j_cam)  # (K, 12, 12)
    rows = cols[:, :, None].repeat(12, 2)
    colz = cols[:, None, :].repeat(12, 1)
    h_cc = jnp.zeros((np_cam, np_cam), theta.dtype).at[rows, colz].add(jtj)
    b_c = jnp.zeros((np_cam,), theta.dtype).at[cols].add(-jnp.einsum("kri,kr->ki", j_cam, r_w))

    # W per point: (M, np_cam, 3) is too big when np_cam large; use per-obs
    # scatter into (M, 12, 3) + column map per obs is per-camera — a point can
    # be seen by many cameras, so accumulate into dense (M, np, 3) via scatter.
    w_ct = jnp.einsum("kri,krj->kij", j_cam, j_pt)  # (K, 12, 3)
    w_full = jnp.zeros((m, np_cam, 3), theta.dtype)
    w_full = w_full.at[pid[:, None], cols, :].add(w_ct)

    # Schur: S = H_cc + lam*diag - sum_p W_p Hpp^-1 W_p^T
    s_mat = h_cc - jnp.einsum("mic,mcd,mjd->ij", w_full, h_pp_inv, w_full)
    rhs = b_c - jnp.einsum("mic,mcd,md->i", w_full, h_pp_inv, b_p)
    diag = jnp.diag(h_cc)
    s_mat = s_mat + jnp.diag(lam * (diag + 1e-8))
    # lock rows/cols: identity on locked entries
    s_mat = jnp.where(free_mask[:, None] & free_mask[None, :], s_mat, 0.0)
    s_mat = s_mat + jnp.diag(jnp.where(free_mask, 0.0, 1.0))
    rhs = rhs * free_mask

    delta_c = jnp.linalg.solve(s_mat, rhs)
    delta_p = jnp.einsum("mcd,md->mc", h_pp_inv, b_p - jnp.einsum("mic,i->mc", w_full, delta_c))

    cost = jnp.sum(huber_cost(r_norm)) if robust else jnp.sum(r_norm**2)
    return theta + delta_c, points + delta_p, cost


def total_cost(problem: Problem, theta, points, robust=True):
    r_norm = jnp.linalg.norm(residuals(problem, theta, points), axis=-1)
    return jnp.sum(huber_cost(r_norm)) if robust else jnp.sum(r_norm**2)


@on_host
def residual_norms(problem: Problem, theta, points) -> np.ndarray:
    """Per-observation reprojection error norms (padding rows excluded)."""
    norms = np.asarray(jnp.linalg.norm(residuals(problem, theta, points), axis=-1))
    return norms[: problem.n_obs] if problem.n_obs >= 0 else norms


_SOLVER_CACHE: dict = {}


def _jitted_solvers(problem: Problem, robust: bool):
    """Module-cached jitted (lm_step, total_cost) keyed by problem shape.

    The problem's arrays are traced arguments (so re-running a pass with new
    observations of the same padded shape hits the compile cache); its
    shape-defining ints stay static via the cache key.
    """
    key = (
        problem.n_cams,
        problem.n_pf,
        problem.n_d,
        int(problem.obs_cam.shape[0]),
        bool(robust),
    )
    hit = _SOLVER_CACHE.get(key)
    if hit is not None:
        return hit
    n_cams, n_pf, n_d = problem.n_cams, problem.n_pf, problem.n_d
    pf_idx, d_idx = problem.pf_idx, problem.d_idx

    n_obs = problem.n_obs

    def rebuild(base_cams, obs_cam, obs_point, obs_pixel, obs_weight):
        return Problem(
            base_cams, pf_idx, d_idx, n_cams, n_pf, n_d,
            obs_cam, obs_point, obs_pixel, obs_weight, n_obs,
        )

    @jax.jit
    def step(p: Problem, theta, points, lam, free):
        return lm_step(
            rebuild(p.base_cams, p.obs_cam, p.obs_point, p.obs_pixel, p.obs_weight),
            theta, points, lam, free, robust=robust,
        )

    @jax.jit
    def cost_fn(p: Problem, theta, points):
        return total_cost(
            rebuild(p.base_cams, p.obs_cam, p.obs_point, p.obs_pixel, p.obs_weight),
            theta, points, robust,
        )

    _SOLVER_CACHE[key] = (step, cost_fn)
    return step, cost_fn


@on_host
def solve_lm(
    problem: Problem,
    theta0,
    points0,
    free_mask,
    robust: bool = True,
    max_iterations: int = 25,
    lam0: float = 1e-4,
    baseline_lock: tuple | None = None,
):
    """LM with adaptive damping. ``baseline_lock=(ref_idx, rel_idx, radius)``
    retracts the relative camera back onto the baseline sphere (the
    reference's SphericalReprojectionFunctor gauge)."""
    theta = jnp.asarray(theta0, jnp.float64)
    points = jnp.asarray(points0, jnp.float64)
    free_mask = jnp.asarray(free_mask, bool)
    lam = lam0
    step, cost_fn = _jitted_solvers(problem, robust)
    cost = float(cost_fn(problem, theta, points))
    for _ in range(max_iterations):
        new_theta, new_points, _ = step(problem, theta, points, lam, free_mask)
        if baseline_lock is not None:
            new_theta = _retract_baseline(problem, new_theta, *baseline_lock)
        new_cost = float(cost_fn(problem, new_theta, new_points))
        if new_cost < cost:
            theta, points, cost = new_theta, new_points, new_cost
            lam = max(lam * 0.3, 1e-12)
        else:
            lam = min(lam * 4.0, 1e8)
            if lam >= 1e8:
                break
    return np.asarray(theta), np.asarray(points), cost


def _retract_baseline(problem: Problem, theta, ref_idx, rel_idx, radius):
    s0 = problem.slices()["position"][0]
    ref = jax.lax.dynamic_slice(theta, (s0 + 3 * ref_idx,), (3,))
    rel = jax.lax.dynamic_slice(theta, (s0 + 3 * rel_idx,), (3,))
    v = rel - ref
    v = v / jnp.maximum(jnp.linalg.norm(v), 1e-30) * radius
    return jax.lax.dynamic_update_slice(theta, ref + v, (s0 + 3 * rel_idx,))


# ---------------------------------------------------------------------------
# Triangulation (TriangulationFunctor, GeometricCalibration.h:216-265)
# ---------------------------------------------------------------------------


import functools


@functools.partial(jax.jit, static_argnames=("iterations", "force_in_front"))
def _triangulate_jit(rig_cams, obs_cam, obs_pixel, obs_valid, iterations, force_in_front):

    def one(cams_idx, pixels, valid):
        def r_fn(inv):
            world = inv / jnp.maximum(jnp.sum(inv * inv), 1e-30)

            def res(ci, px, ok):
                c = jax.tree.map(lambda a: a[ci], rig_cams)
                return (cam.pixel(c, world) - px) * ok

            return jax.vmap(res)(cams_idx, pixels, valid).reshape(-1)

        def avg_at_distance(distance):
            def ray_pt(ci, px, ok):
                c = jax.tree.map(lambda a: a[ci], rig_cams)
                return cam.rig_point(c, px, distance) * ok.astype(jnp.float64)

            pts = jax.vmap(ray_pt)(cams_idx, pixels, valid)
            return jnp.sum(pts, axis=0) / jnp.maximum(jnp.sum(valid), 1)

        # init: average of rays at 10 m (kInitialDistance)
        world0 = avg_at_distance(10.0)
        inv = world0 / jnp.maximum(jnp.sum(world0 * world0), 1e-30)

        def gn(inv, _):
            r = r_fn(inv)
            j = jax.jacfwd(r_fn)(inv)
            h = j.T @ j + 1e-12 * jnp.eye(3, dtype=jnp.float64)
            return inv - jnp.linalg.solve(h, j.T @ r), None

        inv, _ = jax.lax.scan(gn, inv, None, length=iterations)
        world = inv / jnp.maximum(jnp.sum(inv * inv), 1e-30)

        if force_in_front:
            def behind(ci, ok):
                c = jax.tree.map(lambda a: a[ci], rig_cams)
                return cam.is_behind(c, world) & ok

            any_behind = jnp.any(jax.vmap(behind)(cams_idx, valid))
            world = jnp.where(any_behind, avg_at_distance(cam.KNEAR_INFINITY), world)
        return world

    return jax.vmap(one)(obs_cam, obs_pixel, obs_valid)


@on_host
def triangulate(
    rig_cams: cam.Camera,  # stacked (N,), float64
    obs_cam: np.ndarray,  # (M, max_obs) padded camera indices
    obs_pixel: np.ndarray,  # (M, max_obs, 2)
    obs_valid: np.ndarray,  # (M, max_obs) bool
    iterations: int = 10,
    force_in_front: bool = True,
):
    """Gauss-Newton on the inverse-world parametrization, vmapped over traces.

    inv = world / |world|^2 keeps the solver from overshooting behind the rig
    (GeometricCalibration.h:216-231). Initialized from the average ray point
    at 10 m (averageAtDistance, :269-275). Jitted with a persistent cache:
    bucketed input shapes (triangulate_traces) make every pass a cache hit.
    """
    return np.asarray(
        _triangulate_jit(
            jax.tree.map(jnp.asarray, rig_cams),
            jnp.asarray(obs_cam, jnp.int32),
            jnp.asarray(obs_pixel, jnp.float64),
            jnp.asarray(obs_valid, bool),
            iterations,
            force_in_front,
        )
    )
