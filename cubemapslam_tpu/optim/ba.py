"""Bundle adjustment with Schur-complement reduction, fully on device.

Replaces g2o's BlockSolver_6_3 + LinearSolverEigen path used by
Optimizer::LocalBundleAdjustment / BundleAdjustment (Optimizer.cpp:192-451,
453-621): point vertices marginalized via the Schur complement
(setMarginalized(true), Optimizer.cpp:309), Levenberg-Marquardt outer loop,
Huber kernel in the first phase, chi2 outlier cut between phases
(cpp:365-398).

TPU design (SURVEY.md §7 step 7): the observation graph is a fixed-size COO
edge list. Each LM iteration:
  * residual/Jacobian for all edges at once (vmapped analytic Jacobians),
  * Hcc/Hpp/b assembled by segment-sum scatter-adds,
  * point blocks (3x3) inverted in batch,
  * the reduced camera system S = Hcc - W Hpp^-1 Wᵀ is solved MATRIX-FREE by
    preconditioned CG: each matvec is two gathers + two segment-sums + one
    batched 3x3 apply (O(E) memory, no 6Mx6M materialization) — the same
    operator the distributed BA shards over a keyframe mesh axis.
Gauge/boundary keyframes are handled by projecting their tangent updates to
zero inside the CG operator (the fixed KFs of LocalBA, Optimizer.cpp:260-282).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.geometry import mat3_apply, se3_exp, se3_compose
from cubemapslam_tpu.optim.residuals import reproj_residual, reproj_jacobians
from cubemapslam_tpu.optim.pose_opt import _huber_weight, CHI2_TH, HUBER_DELTA


class BAProblem(NamedTuple):
    """Fixed-shape BA state: camera table, point table, COO observations."""

    R: jnp.ndarray            # (M,3,3) world->camera rotations
    t: jnp.ndarray            # (M,3)
    cam_fixed: jnp.ndarray    # (M,) bool — gauge + boundary KFs
    cam_valid: jnp.ndarray    # (M,) bool
    X: jnp.ndarray            # (P,3) world points
    pt_valid: jnp.ndarray     # (P,) bool
    obs_cam: jnp.ndarray      # (E,) int32
    obs_pt: jnp.ndarray       # (E,) int32
    obs_face: jnp.ndarray     # (E,) int32
    obs_uv: jnp.ndarray       # (E,2) in-face pixels
    obs_inv_sigma2: jnp.ndarray  # (E,)
    obs_valid: jnp.ndarray    # (E,) bool


def _psum(x, axis_name):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def _psum_pts(x, axis_name, n_boundary):
    """Point-table reduction with BOUNDARY-ONLY exchange.

    With landmark ownership by keyframe block (dist.shard_ba_problem
    shard_points=True), a point observed by a single shard has ALL its
    edges on that shard: its accumulator rows are complete locally and
    zero everywhere else, so only the [0, n_boundary) prefix — points
    observed from >=2 blocks, permuted to the front — needs the psum.
    Interior rows stay local (they are garbage on non-owner shards, which
    never read them: a shard's gathers only touch points its own edges
    observe). Cuts the per-CG-iteration exchange from O(P) to
    O(boundary) — the SURVEY §7 step 10 design."""
    if axis_name is None or n_boundary is None:
        return _psum(x, axis_name)
    if n_boundary <= 0:
        return x
    return jnp.concatenate(
        [jax.lax.psum(x[:n_boundary], axis_name), x[n_boundary:]], axis=0)


def _edge_terms(cam, prob: BAProblem, w: jnp.ndarray):
    """Residuals + weighted normal-equation blocks for all edges."""
    Rc = prob.R[prob.obs_cam]
    tc = prob.t[prob.obs_cam]
    Xp = prob.X[prob.obs_pt]
    e = reproj_residual(cam, Rc, tc, Xp, prob.obs_face, prob.obs_uv)
    Jc, Jp = reproj_jacobians(cam, Rc, tc, Xp, prob.obs_face)
    JcT = Jc.transpose(0, 2, 1) * w[:, None, None]      # (E,6,2)
    JpT = Jp.transpose(0, 2, 1) * w[:, None, None]      # (E,3,2)
    Hcc_e = JcT @ Jc                                     # (E,6,6)
    Hpp_e = JpT @ Jp                                     # (E,3,3)
    W_e = JcT @ Jp                                       # (E,6,3)
    bc_e = -(JcT @ e[..., None])[..., 0]                 # (E,6) = -JᵀWe
    bp_e = -(JpT @ e[..., None])[..., 0]                 # (E,3)
    return e, Hcc_e, Hpp_e, W_e, bc_e, bp_e


def _chi2(cam, prob: BAProblem):
    Rc = prob.R[prob.obs_cam]
    tc = prob.t[prob.obs_cam]
    Xp = prob.X[prob.obs_pt]
    e = reproj_residual(cam, Rc, tc, Xp, prob.obs_face, prob.obs_uv)
    return jnp.sum(e * e, axis=-1) * prob.obs_inv_sigma2


def _robust_cost(chi2, active, robust):
    rho = jnp.where(robust & (chi2 > CHI2_TH),
                    2.0 * HUBER_DELTA * jnp.sqrt(jnp.maximum(chi2, 1e-20))
                    - CHI2_TH, chi2)
    return jnp.sum(jnp.where(active, rho, 0.0))


def _apply_updates(prob: BAProblem, dc, dp):
    free = prob.cam_valid & ~prob.cam_fixed
    dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)
    dR, dt = se3_exp(dc)
    R_new, t_new = se3_compose(dR, dt, prob.R, prob.t)
    R_new = jnp.where(free[:, None, None], R_new, prob.R)
    t_new = jnp.where(free[:, None], t_new, prob.t)
    return R_new, t_new, prob.X + dp


# ---------------------------------------------------------------------------
# Direct dense-Schur solver, structure-of-arrays edge layout.
#
# TPU rule this whole section is built around: the edge dimension E must be
# the LAST (lane) axis of every per-edge array. The CG path's (E,2,6)/
# (E,6,6) batched-tiny-matmul layout pads each row to an (8,128) tile —
# a 10-40x physical blowup that made one LM relinearization ~100 ms at the
# Lafida working scale (measured). Here every per-edge quantity is an (E,)
# lane; camera-side reductions ride the MXU as (C, E) @ (E, M) one-hot
# matmuls (the one-hot is constant across LM iterations and hoisted), and
# point-side reductions are a single (lanes, P) scatter-add.
# ---------------------------------------------------------------------------


class _DirectCtx(NamedTuple):
    """Per-call constants of the compacted local problem (the edge graph is
    fixed across all LM iterations — only R/t/X change). Edges are held in
    PER-CAMERA ROW form (M, Nc): camera-side reductions are then plain row
    sums, the per-edge camera pose is a broadcast (no gathers), and the
    coupling scatter batches per camera — every layout stays lane-major."""

    obs_pt: jnp.ndarray      # (M,Nc) int32 point id per row slot
    uv: jnp.ndarray          # (2,M,Nc) in-face measurements
    inv_sigma2: jnp.ndarray  # (M,Nc) (0 where invalid)
    Rf: jnp.ndarray          # (9,M,Nc) per-edge face-rotation lanes
    valid0: jnp.ndarray      # (M,Nc) bool
    sel: jnp.ndarray         # (M,Nc) original column index (for write-back)


def _make_direct_ctx(cam, prob: BAProblem, Nc_max: int) -> _DirectCtx:
    """Compact each camera's observation row to its first <= Nc_max live
    entries (the (2C, N) rows local_ba gathers are mostly padding — a
    keyframe's live observations are typically a fraction of the feature
    budget) and precompute the per-edge constants.

    REQUIRES the flat edge arrays to be row-major over cameras:
    obs_cam == repeat(arange(M), N). local_ba builds them exactly so."""
    M = prob.R.shape[0]
    E0 = prob.obs_cam.shape[0]
    assert E0 % M == 0, "direct solver expects (M, N) row-major edges"
    N = E0 // M
    Nc = min(Nc_max, N)
    ok = prob.obs_valid.reshape(M, N)
    # stable per-row compaction: live entries first
    order = jnp.argsort(~ok, axis=1, stable=True)[:, :Nc]   # (M,Nc)
    row = jnp.arange(M)[:, None]
    e_ok = ok[row, order]
    obs_pt = jnp.where(e_ok, prob.obs_pt.reshape(M, N)[row, order], 0)
    uv = prob.obs_uv.reshape(M, N, 2)[row, order]           # (M,Nc,2)
    inv_s2 = jnp.where(e_ok,
                       prob.obs_inv_sigma2.reshape(M, N)[row, order], 0.0)
    face = jnp.clip(prob.obs_face.reshape(M, N)[row, order], 0, 4)
    Rf = cam.face_R.reshape(5, 9).T[:, face]                # (9,M,Nc)
    return _DirectCtx(obs_pt=obs_pt, uv=uv.transpose(2, 0, 1),
                      inv_sigma2=inv_s2, Rf=Rf, valid0=e_ok, sel=order)


def _lanes_eval(cam, ctx: _DirectCtx, R, t, X):
    """Residual + camera-frame/local-point lanes at the current state.

    Returns (Xc [3x(M,Nc)], local [3x(M,Nc)], e0, e1, chi2)."""
    M, Nc = ctx.obs_pt.shape
    R9 = R.reshape(M, 9).T[:, :, None]                      # (9,M,1)
    t3 = t.T[:, :, None]                                    # (3,M,1)
    X_e = X.T[:, ctx.obs_pt.reshape(-1)].reshape(3, M, Nc)
    Xc = [R9[3 * i + 0] * X_e[0] + R9[3 * i + 1] * X_e[1]
          + R9[3 * i + 2] * X_e[2] + t3[i] for i in range(3)]
    local = [ctx.Rf[3 * i + 0] * Xc[0] + ctx.Rf[3 * i + 1] * Xc[1]
             + ctx.Rf[3 * i + 2] * Xc[2] for i in range(3)]
    fx, fy, cx, cy = (cam.fxycxy[0], cam.fxycxy[1],
                      cam.fxycxy[2], cam.fxycxy[3])
    z = local[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    e0 = ctx.uv[0] - (local[0] * fx / z_safe + cx)
    e1 = ctx.uv[1] - (local[1] * fy / z_safe + cy)
    chi2 = (e0 * e0 + e1 * e1) * ctx.inv_sigma2
    return Xc, local, e0, e1, chi2


def _lanes_jac(cam, ctx: _DirectCtx, R, Xc, local):
    """Pose (2x6) and point (2x3) Jacobian lanes (analytic, unrolled —
    the same math as residuals.pose_jac_from_state / reproj_jacobians,
    g2o_cubemap_vertices_edges.cpp:61-223). R is the (M,3,3) camera table
    (broadcast over each camera's row of edges)."""
    M = R.shape[0]
    R9 = R.reshape(M, 9).T[:, :, None]                      # (9,M,1)
    fx, fy = cam.fxycxy[0], cam.fxycxy[1]
    lx, ly, lz = local
    z_safe = jnp.where(jnp.abs(lz) < 1e-12, 1e-12, lz)
    iz = 1.0 / z_safe
    a0 = fx * iz
    a2 = -fx * lx * iz * iz
    b1 = fy * iz
    b2 = -fy * ly * iz * iz
    JR = [[a0 * ctx.Rf[0 + k] + a2 * ctx.Rf[6 + k] for k in range(3)],
          [b1 * ctx.Rf[3 + k] + b2 * ctx.Rf[6 + k] for k in range(3)]]
    x, y, z = Xc
    Jc, Jp = [], []
    for r in range(2):
        A0, A1, A2 = JR[r]
        h0 = A1 * z - A2 * y
        h1 = -A0 * z + A2 * x
        h2 = A0 * y - A1 * x
        Jc.append([-A0, -A1, -A2, h0, h1, h2])
        Jp.append([-(A0 * R9[0 + j] + A1 * R9[3 + j] + A2 * R9[6 + j])
                   for j in range(3)])
    return Jc, Jp


def _inv3_lanes(H, lm_lambda, pt_valid):
    """Damped 3x3 inverse in (3,3,P) lane layout via the adjugate."""
    tr = H[0][0] + H[1][1] + H[2][2]
    d = lm_lambda * jnp.maximum(tr / 3.0, 1e-6) + 1e-8
    a, b, c = H[0][0] + d, H[0][1], H[0][2]
    e, f = H[1][1] + d, H[1][2]
    i = H[2][2] + d
    # symmetric: rows (a b c / b e f / c f i)
    A = e * i - f * f
    B = c * f - b * i
    C = b * f - c * e
    det = a * A + b * B + c * C
    idet = jnp.where(pt_valid, 1.0 / jnp.where(
        jnp.abs(det) < 1e-20, 1e-20, det), 0.0)
    E = a * i - c * c
    F = b * c - a * f
    I = a * e - b * b
    return [[A * idet, B * idet, C * idet],
            [B * idet, E * idet, F * idet],
            [C * idet, F * idet, I * idet]]


def _lm_step_direct(cam, prob: BAProblem, ctx: _DirectCtx, active, robust,
                    lm_lambda, m_free: int,
                    lanes_now=None):
    """One damped GN step via DENSE Schur complement + Cholesky.

    For a LOCAL problem (m_free <= ~50 free cameras, P <= ~8k points) the
    reduced camera system S = Hcc - W Hpp^-1 Wᵀ is only (6*m_free)²:
    assembling it densely is two MXU matmuls over a (6*m_free, 3P)
    coupling matrix, and the direct solve removes the deep sequential-CG
    latency that made the matrix-free path 4+ seconds per local BA at map
    scale (the reference's LocalBundleAdjustment likewise uses a DIRECT
    sparse solver — LinearSolverEigen, Optimizer.cpp:301-310).

    The coupling/Schur blocks are built for the FIRST ``m_free`` cameras
    only: cameras at index >= m_free must all be fixed anchors (their
    tangent updates are zero, so their coupling columns never enter the
    reduced system — they still constrain the point system through
    Hpp/bp). ``lanes_now`` optionally passes a precomputed _lanes_eval at
    the current state to avoid a redundant evaluation."""
    M = prob.R.shape[0]
    Mf = m_free
    P = prob.X.shape[0]
    if lanes_now is None:
        lanes_now = _lanes_eval(cam, ctx, prob.R, prob.t, prob.X)
    Xc, local, e0, e1, chi2 = lanes_now
    w = ctx.inv_sigma2 * jnp.where(robust, _huber_weight(chi2), 1.0)
    w = jnp.where(active, w, 0.0)                           # (M,Nc)
    Jc, Jp = _lanes_jac(cam, ctx, prob.R, Xc, local)

    # camera-side reduction: 21 sym Hcc + 6 bc lanes -> plain row sums
    # (edges are grouped per camera)
    cam_red = []
    for a in range(6):
        for b in range(a, 6):
            cam_red.append(jnp.sum(
                w * (Jc[0][a] * Jc[0][b] + Jc[1][a] * Jc[1][b]), axis=-1))
    for a in range(6):
        cam_red.append(jnp.sum(
            -w * (Jc[0][a] * e0 + Jc[1][a] * e1), axis=-1))
    Hcc = jnp.zeros((6, 6, Mf))
    k = 0
    for a in range(6):
        for b in range(a, 6):
            Hcc = Hcc.at[a, b].set(cam_red[k][:Mf])
            if a != b:
                Hcc = Hcc.at[b, a].set(cam_red[k][:Mf])
            k += 1
    bc = jnp.stack([cam_red[21 + a][:Mf] for a in range(6)])  # (6,Mf)
    # damping for the camera blocks
    tr_c = sum(Hcc[a, a] for a in range(6))
    dmp_c = lm_lambda * jnp.maximum(tr_c / 6.0, 1e-6) + 1e-8
    Hcc_d = Hcc + jnp.eye(6)[:, :, None] * dmp_c[None, None, :]

    # point-side reduction: 6 sym Hpp + 3 bp lanes -> one (9,P) scatter
    # (ALL edges: anchor cameras constrain the points)
    pt_lanes = []
    for b in range(3):
        for c in range(b, 3):
            pt_lanes.append(w * (Jp[0][b] * Jp[0][c] + Jp[1][b] * Jp[1][c]))
    for b in range(3):
        pt_lanes.append(-w * (Jp[0][b] * e0 + Jp[1][b] * e1))
    pt_red = jnp.zeros((9, P)).at[:, ctx.obs_pt.reshape(-1)].add(
        jnp.stack([x.reshape(-1) for x in pt_lanes]))
    Hpp = [[pt_red[0], pt_red[1], pt_red[2]],
           [pt_red[1], pt_red[3], pt_red[4]],
           [pt_red[2], pt_red[4], pt_red[5]]]
    bp = pt_red[6:9]                                        # (3,P)
    Hinv = _inv3_lanes(Hpp, lm_lambda, prob.pt_valid)       # (3,3,P) lanes

    # coupling for the FREE cameras only (anchors have zero tangent
    # updates, so their coupling columns never enter the reduced system —
    # they still constrain the points via Hpp/bp above): per-camera
    # batched scatter into (Mf,18,P) — every scatter target is a small
    # lane-major plane, no layout copies
    Wv = jnp.stack([
        w[:Mf] * (Jc[0][a][:Mf] * Jp[0][b][:Mf]
                  + Jc[1][a][:Mf] * Jp[1][b][:Mf])
        for a in range(6) for b in range(3)])               # (18,Mf,Nc)
    Wv = Wv.transpose(1, 0, 2)                              # (Mf,18,Nc)
    Wd = jax.vmap(lambda idx, v: jnp.zeros((18, P)).at[:, idx].add(v))(
        ctx.obs_pt[:Mf], Wv)                                # (Mf,18,P)
    Wd = Wd.reshape(Mf, 6, 3, P)
    Hinv_s = jnp.stack([jnp.stack(r) for r in Hinv])        # (3,3,P)
    Y = jnp.einsum("mabp,bcp->macp", Wd, Hinv_s)            # (Mf,6,3,P)
    A = Y.reshape(Mf * 6, 3 * P)                            # (ma),(cp)
    B = Wd.reshape(Mf * 6, 3 * P)                           # (nd),(cp)
    U = jax.lax.dot_general(A, B, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)

    S = (-U).reshape(Mf, 6, Mf, 6)
    idx = jnp.arange(Mf)
    S = S.at[idx, :, idx, :].add(Hcc_d.transpose(2, 0, 1))
    S = S.reshape(Mf * 6, Mf * 6)
    rhs = bc.T.reshape(-1) - A @ bp.reshape(-1)

    # project out fixed/invalid cameras: identity rows/cols, zero rhs
    free = (prob.cam_valid & ~prob.cam_fixed)[:Mf]
    free6 = jnp.repeat(free, 6)
    keep = free6[:, None] & free6[None, :]
    S = jnp.where(keep, S, 0.0)
    S = S + jnp.diag(jnp.where(free6, 0.0, 1.0))
    rhs = jnp.where(free6, rhs, 0.0)

    c, lower = jax.scipy.linalg.cho_factor(
        S + 1e-8 * jnp.eye(Mf * 6), lower=True)
    dcf = jax.scipy.linalg.cho_solve((c, lower), rhs).reshape(Mf, 6)
    dcf = jnp.where(free[:, None], dcf, 0.0)
    dc = jnp.zeros((M, 6)).at[:Mf].set(dcf)

    # back-substitute: dp = Hpp^-1 (bp - Wᵀ dc)  (anchor dc = 0)
    s_cp = (B.T @ dcf.reshape(-1)).reshape(3, P)
    r_cp = [bp[c2] - s_cp[c2] for c2 in range(3)]
    dp = jnp.stack([Hinv[b][0] * r_cp[0] + Hinv[b][1] * r_cp[1]
                    + Hinv[b][2] * r_cp[2] for b in range(3)]).T  # (P,3)
    return _apply_updates(prob, dc, dp)


def _bundle_adjust_direct(cam, prob: BAProblem, phase_iters, chi2_cut,
                          Nc_max: int, n_free: int):
    """Direct-solver BA driver (see bundle_adjust). Returns
    (updated problem, per-ORIGINAL-edge inlier mask)."""
    ctx = _make_direct_ctx(cam, prob, Nc_max)
    active = ctx.valid0
    Mf = min(n_free, prob.R.shape[0])

    def lm_loop(prob, active, robust, n_iters):
        def body(_, carry):
            # the CURRENT state's lane eval + cost are carried across
            # iterations so each LM iteration evaluates the model exactly
            # once (at the trial point)
            prob, lm_lambda, lanes_now, cost = carry
            R_n, t_n, X_n = _lm_step_direct(cam, prob, ctx, active, robust,
                                            lm_lambda, Mf,
                                            lanes_now=lanes_now)
            cand = prob._replace(R=R_n, t=t_n, X=X_n)
            lanes_c = _lanes_eval(cam, ctx, cand.R, cand.t, cand.X)
            cost_c = _robust_cost(lanes_c[4], active, robust)
            improved = cost_c < cost
            prob = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(improved, (1,) * new.ndim), new, old),
                cand, prob)
            lanes_now = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(improved, (1,) * new.ndim), new, old),
                list(lanes_c), list(lanes_now))
            cost = jnp.where(improved, cost_c, cost)
            lm_lambda = jnp.where(improved, lm_lambda * 0.5,
                                  lm_lambda * 4.0)
            return (prob, jnp.clip(lm_lambda, 1e-6, 1e4), lanes_now, cost)

        lanes0 = list(_lanes_eval(cam, ctx, prob.R, prob.t, prob.X))
        cost0 = _robust_cost(lanes0[4], active, robust)
        prob, _, _, _ = jax.lax.fori_loop(
            0, n_iters, body, (prob, jnp.float32(1e-4), lanes0, cost0))
        return prob

    anchor_state = _gauge_entry(prob)
    for phase, n in enumerate(phase_iters):
        robust = phase == 0
        prob = lm_loop(prob, active, robust, n)
        Xc, _, _, _, chi2 = _lanes_eval(cam, ctx, prob.R, prob.t, prob.X)
        d = jnp.sqrt(Xc[0] ** 2 + Xc[1] ** 2 + Xc[2] ** 2)
        in_fov = Xc[2] / jnp.maximum(d, 1e-12) > cam.cos_fov_th
        active = active & (chi2 <= chi2_cut) & in_fov
    prob = _gauge_retract(prob, anchor_state)

    # scatter the compact inlier verdicts back onto the original edges via
    # the per-row compaction map; row slots dropped by the per-camera cap
    # were never optimized — left as-is
    M = prob.R.shape[0]
    N = prob.obs_cam.shape[0] // M
    base = prob.obs_valid.reshape(M, N)
    row = jnp.arange(M)[:, None]
    upd = jnp.where(ctx.valid0, active, base[row, ctx.sel])
    inl_full = base.at[row, ctx.sel].set(upd).reshape(-1)
    return prob, inl_full


def _lm_step(cam, prob: BAProblem, active, robust, lm_lambda,
             cg_iters: int, axis_name=None, n_boundary=None):
    """One damped GN step via Schur + matrix-free CG. Returns candidate
    (R, t, X).

    With ``axis_name`` set, the observation arrays are the local shard of an
    SPMD program (keyframe-block partitioned edges): every segment-sum into
    the camera/point tables is followed by a psum, so the reduced system —
    and hence the pose/point updates — is bitwise identical on all devices
    while each device only touches its own edges. This is the collective
    layout of the distributed global BA (SURVEY.md §7 step 10)."""
    M = prob.R.shape[0]
    P = prob.X.shape[0]
    chi2 = _chi2(cam, prob)
    w = prob.obs_inv_sigma2 * jnp.where(robust, _huber_weight(chi2), 1.0)
    w = jnp.where(active, w, 0.0)
    _, Hcc_e, Hpp_e, W_e, bc_e, bp_e = _edge_terms(cam, prob, w)

    Hcc = _psum(jnp.zeros((M, 6, 6)).at[prob.obs_cam].add(Hcc_e),
                axis_name)
    Hpp = _psum_pts(jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(Hpp_e),
                    axis_name, n_boundary)
    bc = _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(bc_e), axis_name)
    bp = _psum_pts(jnp.zeros((P, 3)).at[prob.obs_pt].add(bp_e),
                   axis_name, n_boundary)

    # damping (LM): scale diagonals; regularize empty blocks
    eyeP = jnp.eye(3)
    Hpp_d = Hpp + (lm_lambda * jnp.eye(3))[None] * jnp.maximum(
        jnp.trace(Hpp, axis1=1, axis2=2)[:, None, None] / 3.0, 1e-6)
    Hpp_d = Hpp_d + 1e-8 * eyeP[None]
    Hpp_inv = jnp.linalg.inv(Hpp_d)
    Hpp_inv = jnp.where(prob.pt_valid[:, None, None], Hpp_inv, 0.0)

    Hcc_d = Hcc + (lm_lambda * jnp.eye(6))[None] * jnp.maximum(
        jnp.trace(Hcc, axis1=1, axis2=2)[:, None, None] / 6.0, 1e-6)
    Hcc_d = Hcc_d + 1e-8 * jnp.eye(6)[None]

    free = prob.cam_valid & ~prob.cam_fixed            # (M,)

    def schur_matvec(x):
        """x: (M,6) -> S x, with fixed cameras projected out."""
        x = jnp.where(free[:, None], x, 0.0)
        hx = (Hcc_d @ x[..., None])[..., 0]            # (M,6)
        v = (W_e.transpose(0, 2, 1)
             @ x[prob.obs_cam][..., None])[..., 0]     # (E,3)
        s = _psum_pts(jnp.zeros((P, 3)).at[prob.obs_pt].add(v),
                      axis_name, n_boundary)
        y = (Hpp_inv @ s[..., None])[..., 0]           # (P,3)
        z = (W_e @ y[prob.obs_pt][..., None])[..., 0]  # (E,6)
        coup = _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(z), axis_name)
        out = hx - coup
        return jnp.where(free[:, None], out, x)

    # reduced rhs: bc - W Hpp^-1 bp
    yb = (Hpp_inv @ bp[..., None])[..., 0]
    zb = (W_e @ yb[prob.obs_pt][..., None])[..., 0]
    rhs = bc - _psum(jnp.zeros((M, 6)).at[prob.obs_cam].add(zb), axis_name)
    rhs = jnp.where(free[:, None], rhs, 0.0)

    # block-Jacobi preconditioner
    Pinv = jnp.linalg.inv(Hcc_d)

    def precond(r):
        return jnp.where(free[:, None], (Pinv @ r[..., None])[..., 0], r)

    def cg_body(_, carry):
        x, r, z, p = carry
        Ap = schur_matvec(p)
        rz = jnp.sum(r * z)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-20)
        x = x + alpha * p
        r_new = r - alpha * Ap
        z_new = precond(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.maximum(rz, 1e-20)
        p = z_new + beta * p
        return (x, r_new, z_new, p)

    x0 = jnp.zeros((M, 6))
    r0 = rhs
    z0 = precond(r0)
    dc, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, r0, z0, z0))

    # back-substitute point updates
    v = (W_e.transpose(0, 2, 1) @ dc[prob.obs_cam][..., None])[..., 0]
    s = _psum_pts(jnp.zeros((P, 3)).at[prob.obs_pt].add(v),
                  axis_name, n_boundary)
    dp = (Hpp_inv @ (bp - s)[..., None])[..., 0]
    dp = jnp.where(prob.pt_valid[:, None], dp, 0.0)

    dR, dt = se3_exp(dc)
    R_new, t_new = se3_compose(dR, dt, prob.R, prob.t)
    R_new = jnp.where(free[:, None, None], R_new, prob.R)
    t_new = jnp.where(free[:, None], t_new, prob.t)
    X_new = prob.X + dp
    return R_new, t_new, X_new


def _centers(p):
    return -mat3_apply(p.R.transpose(0, 2, 1), p.t)


def _gauge_entry(prob: BAProblem):
    """Scale-gauge anchor. With a single fixed camera, uniform scaling
    about its center is an EXACT cost null direction of monocular BA (the
    classic 7th gauge dof); iterative/damped solvers accumulate motion
    along it once LM's lambda shrinks (measured x10 map inflation per call
    on an orbit sequence — g2o's direct Cholesky stays on the gauge slice
    numerically, so the reference never needed this). Remember the
    distance from the anchor to the farthest valid camera at ENTRY; the
    retraction removes the pure-scale gauge motion after optimization.
    Scaling is exactly cost-invariant, so this changes nothing but the
    gauge."""
    fixedv = prob.cam_fixed & prob.cam_valid
    n_fixedv = jnp.sum(fixedv.astype(jnp.int32))
    anchor = jnp.where(jnp.any(fixedv), jnp.argmax(fixedv),
                       jnp.argmax(prob.cam_valid)).astype(jnp.int32)
    c0 = _centers(prob)
    ref_d = jnp.linalg.norm(c0 - c0[anchor], axis=-1)
    gauge_j = jnp.argmax(jnp.where(prob.cam_valid, ref_d, -1.0))
    return anchor, gauge_j, ref_d[gauge_j], n_fixedv


def _gauge_retract(prob: BAProblem, anchor_state):
    anchor, gauge_j, d_in, n_fixedv = anchor_state
    c1 = _centers(prob)
    d_out = jnp.linalg.norm(c1[gauge_j] - c1[anchor])
    # only when scale is actually free (<=1 fixed camera) and well-defined
    s = jnp.where((n_fixedv <= 1) & (d_out > 1e-9) & (d_in > 1e-9),
                  d_in / d_out, 1.0)
    ca = c1[anchor]
    c_new = ca + s * (c1 - ca)
    t_new = -mat3_apply(prob.R, c_new)
    X_new = ca + s * (prob.X - ca)
    free = prob.cam_valid & ~prob.cam_fixed
    return prob._replace(
        t=jnp.where(free[:, None], t_new, prob.t),
        X=jnp.where(prob.pt_valid[:, None], X_new, prob.X))


def bundle_adjust(cam: CubemapCamera, prob: BAProblem,
                  phase_iters: Tuple[int, ...] = (5, 10),
                  chi2_cut: float = CHI2_TH,
                  cg_iters: int = 30,
                  axis_name=None,
                  solver: str = "cg",
                  max_obs_per_cam: int = 1024,
                  n_free: int = None,
                  n_boundary: int = None
                  ) -> Tuple[BAProblem, jnp.ndarray]:
    """Two-phase LM BA (LocalBundleAdjustment schedule, Optimizer.cpp:341-398:
    5 robust iters, chi2 outlier cut, 10 non-robust iters, final cut).

    solver="cg" is the matrix-free Schur-CG path (O(E) memory, shardable
    with ``axis_name`` for the distributed global BA; with ``n_boundary``
    the point-table exchanges reduce to the boundary prefix only — see
    _psum_pts and dist.shard_ba_problem(shard_points=True)); solver="direct" is
    the dense-Schur Cholesky path for COMPACT local problems (single
    device only — see _lm_step_direct; requires row-major (M, N) edges
    with obs_cam == repeat(arange(M), N)). max_obs_per_cam caps each
    camera's compacted observation row in the direct path.

    Returns (updated problem, per-edge inlier mask).
    """
    assert solver in ("cg", "direct")
    assert not (solver == "direct" and axis_name is not None)
    if solver == "direct":
        # n_free: all cameras at index >= n_free must be fixed anchors
        # (the local_ba layout: free block first, then anchors)
        nf = prob.R.shape[0] if n_free is None else n_free
        return _bundle_adjust_direct(cam, prob, phase_iters, chi2_cut,
                                     max_obs_per_cam, nf)
    active = prob.obs_valid

    def lm_loop(prob, active, robust, n_iters):
        def body(_, carry):
            prob, lm_lambda = carry
            chi2 = _chi2(cam, prob)
            cost = _psum(_robust_cost(chi2, active, robust), axis_name)
            R_n, t_n, X_n = _lm_step(cam, prob, active, robust,
                                     lm_lambda, cg_iters, axis_name,
                                     n_boundary)
            cand = prob._replace(R=R_n, t=t_n, X=X_n)
            cost_n = _psum(_robust_cost(_chi2(cam, cand), active, robust),
                           axis_name)
            improved = cost_n < cost
            prob = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(improved, (1,) * new.ndim), new, old),
                cand, prob)
            lm_lambda = jnp.where(improved, lm_lambda * 0.5, lm_lambda * 4.0)
            # lambda floor 1e-6 (not ~0): the damping term is what bounds
            # motion along near-null gauge directions in the CG solve
            return prob, jnp.clip(lm_lambda, 1e-6, 1e4)

        prob, _ = jax.lax.fori_loop(0, n_iters, body,
                                    (prob, jnp.float32(1e-4)))
        return prob

    anchor_state = _gauge_entry(prob)
    for phase, n in enumerate(phase_iters):
        robust = phase == 0
        prob = lm_loop(prob, active, robust, n)
        chi2 = _chi2(cam, prob)
        # outlier cut + FOV cheirality (behind-camera points)
        Xc = mat3_apply(prob.R[prob.obs_cam],
                        prob.X[prob.obs_pt]) + prob.t[prob.obs_cam]
        d = jnp.linalg.norm(Xc, axis=-1)
        in_fov = Xc[..., 2] / jnp.maximum(d, 1e-12) > cam.cos_fov_th
        active = active & (chi2 <= chi2_cut) & in_fov
    prob = _gauge_retract(prob, anchor_state)
    return prob, active
