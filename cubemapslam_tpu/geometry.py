"""SO3 / SE3 / Sim3 Lie-group operations, batched and jit-friendly.

TPU-native replacement for the reference's vendored g2o types (`SE3Quat`,
`Sim3` in ThirdParty/g2o/g2o/types/{se3quat.h,sim3.h}) and the cv::Mat/Eigen
glue in Converter.{h,cpp}. Everything operates on trailing-dim arrays so the
same code serves a single pose and a vmapped table of poses.

Conventions: rotations are (...,3,3) matrices; SE3 tangent is (...,6) ordered
[rho(3), phi(3)] (translation first, like g2o's se3quat exp); Sim3 tangent is
(...,7) [rho, phi, log_s]. Poses are world->camera (Tcw) unless noted.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def _safe_norm(v: jnp.ndarray) -> jnp.ndarray:
    """Norm over the last axis with a well-defined (zero) gradient at v=0."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta = _safe_norm(phi)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    theta2 = theta * theta
    # Taylor-safe coefficients
    a = jnp.where(theta < _EPS, 1.0 - theta2 / 6.0,
                  jnp.sin(theta) / jnp.where(theta < _EPS, 1.0, theta))
    b = jnp.where(theta < _EPS, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(theta < _EPS, 1.0,
                                                     theta2))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a * K + b * K2


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,3) axis-angle (angle in [0, pi]).

    theta comes from atan2(|w|/2, (tr-1)/2) so the map is differentiable at
    the identity (arccos has an infinite derivative there)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    w = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    sin_t = 0.5 * _safe_norm(w)                  # = sin(theta) for theta<pi
    theta = jnp.arctan2(sin_t, cos_t)
    # generic: w * theta / (2 sin theta); near pi needs the diagonal route
    scale = jnp.where(theta < 1e-5, 0.5 + theta * theta / 12.0,
                      theta / jnp.maximum(2.0 * sin_t, _EPS))
    generic = w * scale[..., None]
    # near theta = pi: axis from diagonal of (R + I)/2
    near_pi = theta[..., None] > (jnp.pi - 1e-3)
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = jnp.maximum((diag - cos_t[..., None])
                          / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis_sq)
    # fix signs using off-diagonal sums
    s12 = R[..., 0, 1] + R[..., 1, 0]
    s13 = R[..., 0, 2] + R[..., 2, 0]
    s23 = R[..., 1, 2] + R[..., 2, 1]
    # choose the dominant axis positive, infer the others' signs
    sign1 = jnp.where(axis[..., 0] >= jnp.maximum(axis[..., 1], axis[..., 2]),
                      1.0, jnp.where(axis[..., 1] >= axis[..., 2],
                                     jnp.sign(s12), jnp.sign(s13)))
    sign2 = jnp.where(axis[..., 1] > jnp.maximum(axis[..., 0], axis[..., 2]),
                      1.0, jnp.where(axis[..., 0] >= axis[..., 2],
                                     jnp.sign(s12), jnp.sign(s23)))
    sign3 = jnp.where(axis[..., 2] > jnp.maximum(axis[..., 0], axis[..., 1]),
                      1.0, jnp.where(axis[..., 0] >= axis[..., 1],
                                     jnp.sign(s13), jnp.sign(s23)))
    sign1 = jnp.where(sign1 == 0, 1.0, sign1)
    sign2 = jnp.where(sign2 == 0, 1.0, sign2)
    sign3 = jnp.where(sign3 == 0, 1.0, sign3)
    axis = axis * jnp.stack([sign1, sign2, sign3], -1)
    pi_branch = axis * theta[..., None]
    return jnp.where(near_pi, pi_branch, generic)


def _so3_left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """V matrix such that t = V @ rho in se3 exp."""
    theta = _safe_norm(phi)[..., None, None]
    K = hat(phi)
    K2 = K @ K
    theta2 = theta * theta
    b = jnp.where(theta < _EPS, 0.5 - theta2 / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.where(theta < _EPS, 1.0,
                                                     theta2))
    c = jnp.where(theta < _EPS, 1.0 / 6.0 - theta2 / 120.0,
                  (jnp.where(theta < _EPS, 1.0, theta) - jnp.sin(theta))
                  / jnp.where(theta < _EPS, 1.0, theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b * K + c * K2


def se3_exp(xi: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(...,6) [rho, phi] -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = _so3_left_jacobian(phi)
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Inverse of se3_exp -> (...,6)."""
    phi = so3_log(R)
    V = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def mat3_apply(M: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) x (...,3) -> (...,3) unrolled to lane-shaped arithmetic.

    einsum/@ on batched tiny matrices lowers to grouped convolutions or
    padded dots on TPU — pathological inside optimizer loops (and 6x worse
    under the package-wide Precision.HIGHEST default). The unrolled form is
    pure elementwise VPU work with one stack."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [M[..., 0, 0] * x + M[..., 0, 1] * y + M[..., 0, 2] * z,
         M[..., 1, 0] * x + M[..., 1, 1] * y + M[..., 1, 2] * z,
         M[..., 2, 0] * x + M[..., 2, 1] * y + M[..., 2, 2] * z], axis=-1)


def se3_inverse(R: jnp.ndarray, t: jnp.ndarray):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -mat3_apply(Rt, t)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) o (Rb,tb): x -> Ra(Rb x + tb) + ta."""
    return Ra @ Rb, mat3_apply(Ra, tb) + ta


def se3_apply(R, t, x):
    return mat3_apply(R, x) + t


# ---------------------------------------------------------------------------
# Quaternions (TUM trajectory output, Horn solver)
# ---------------------------------------------------------------------------

def rot_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) -> (...,4) quaternion [qx,qy,qz,qw], qw >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically best per element
    qw_ = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    qx_ = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    qy_ = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    qz_ = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    cand = jnp.stack([qw_, qx_, qy_, qz_], -1)
    case = jnp.argmax(cand, axis=-1)

    def _safe(x):
        return jnp.where(jnp.abs(x) < _EPS, _EPS, x)

    q_w = jnp.stack([qw_, (m21 - m12) / _safe(4 * qw_),
                     (m02 - m20) / _safe(4 * qw_),
                     (m10 - m01) / _safe(4 * qw_)], -1)
    q_x = jnp.stack([(m21 - m12) / _safe(4 * qx_), qx_,
                     (m01 + m10) / _safe(4 * qx_),
                     (m02 + m20) / _safe(4 * qx_)], -1)
    q_y = jnp.stack([(m02 - m20) / _safe(4 * qy_),
                     (m01 + m10) / _safe(4 * qy_), qy_,
                     (m12 + m21) / _safe(4 * qy_)], -1)
    q_z = jnp.stack([(m10 - m01) / _safe(4 * qz_),
                     (m02 + m20) / _safe(4 * qz_),
                     (m12 + m21) / _safe(4 * qz_), qz_], -1)
    case_b = case[..., None]
    wxyz = jnp.select([case_b == 0, case_b == 1, case_b == 2, case_b == 3],
                      [q_w, q_x, q_y, q_z])
    wxyz = wxyz * jnp.where(wxyz[..., :1] < 0, -1.0, 1.0)
    return jnp.concatenate([wxyz[..., 1:], wxyz[..., :1]], -1)  # xyzw


def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """(...,4) [qx,qy,qz,qw] -> (...,3,3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], -1),
    ], -2)


# ---------------------------------------------------------------------------
# Sim3 (loop closing): g = (s, R, t); x -> s R x + t
# ---------------------------------------------------------------------------

def _sim3_W(phi: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """W matrix of the Sim3 exponential: t = W @ rho.

    W = A*hat(phi) + B*hat(phi)^2 + C*I with the standard four-branch
    closed form (Strasdat; cf. g2o sim3.h used by the reference's
    VertexSim3Expmap)."""
    theta = _safe_norm(phi)
    s = jnp.exp(sigma)
    small_t = theta < 1e-5
    small_s = jnp.abs(sigma) < 1e-5
    th = jnp.where(small_t, 1.0, theta)
    sig = jnp.where(small_s, 1.0, sigma)
    t2 = th * th
    C = jnp.where(small_s, 1.0, (s - 1.0) / sig)
    # sigma ~ 0 branch
    A_s0 = jnp.where(small_t, 0.5, (1.0 - jnp.cos(th)) / t2)
    B_s0 = jnp.where(small_t, 1.0 / 6.0, (th - jnp.sin(th)) / (t2 * th))
    # sigma != 0, theta ~ 0 branch
    A_t0 = ((sig - 1.0) * s + 1.0) / (sig * sig)
    B_t0 = ((0.5 * sig * sig - sig + 1.0) * s - 1.0) / (sig * sig * sig)
    # general branch
    a = s * jnp.sin(th)
    b = s * jnp.cos(th)
    c = t2 + sig * sig
    A_g = (a * sig + (1.0 - b) * th) / (th * c)
    B_g = (C - ((b - 1.0) * sig + a * th) / c) / t2
    A = jnp.where(small_s, A_s0, jnp.where(small_t, A_t0, A_g))
    B = jnp.where(small_s, B_s0, jnp.where(small_t, B_t0, B_g))
    K = hat(phi)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return (A[..., None, None] * K + B[..., None, None] * K2
            + C[..., None, None] * eye)


def sim3_exp(xi: jnp.ndarray):
    """(...,7) [rho, phi, sigma] -> (s, R, t)."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    W = _sim3_W(phi, sigma)
    t = jnp.einsum("...ij,...j->...i", W, rho)
    return s, R, t


def sim3_inverse(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * mat3_apply(Rt, t)


def sim3_compose(sa, Ra, ta, sb, Rb, tb):
    """(sa,Ra,ta) o (sb,Rb,tb): x -> sa Ra (sb Rb x + tb) + ta."""
    return (sa * sb, Ra @ Rb,
            sa[..., None] * mat3_apply(Ra, tb) + ta)


def sim3_apply(s, R, t, x):
    return s[..., None] * mat3_apply(R, x) + t


def sim3_log(s, R, t) -> jnp.ndarray:
    """Inverse of sim3_exp (solve t = W rho for rho) -> (...,7)."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], -1)
