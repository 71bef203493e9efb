"""Descriptor matching: batched, masked, MXU-friendly.

Replaces ORBMatcher (include/ORBMatcher.h, src/ORBMatcher.cpp, 1692 LoC).
Design changes for TPU:

* Hamming distance runs on the MXU: descriptors are unpacked to (N,256)
  {0,1} matrices once per frame, and the full distance matrix is
  ``rowsum(A) + rowsum(B) - 2 A Bᵀ`` — one matmul instead of the reference's
  per-candidate SWAR popcount loop (DescriptorDistance, cpp:951-967).
* The reference's windowed grid search — including the 465-line cross-face
  window case analysis (Frame::GetFeaturesInArea, Frame.cpp:251-716) —
  collapses into an *angular* gate between unit bearing rays:
  ``ray_a . ray_b >= cos(window)``. Rays are global directions, so windows
  wrap across cube-face boundaries with no case analysis at all.
* Sequential best/second-best bookkeeping becomes masked top-2 reductions;
  one-to-one assignment is a scatter-min auction; the 12-degree rotation
  histogram with top-3-bin filtering (ComputeThreeMaxima, cpp:905-946) is a
  segment-sum + top-k.

Thresholds follow the reference: TH_LOW=50, TH_HIGH=100, HISTO 12-degree
bins (cpp:42-45), chi2 3.84 epipolar gate (CheckDistEpipolarLine,
cpp:388-407).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu.camera import CubemapCamera

TH_LOW = 50
TH_HIGH = 100
N_ROT_BINS = 30          # ceil(360/HISTO_LENGTH) bins of 12 deg (cpp:135)
BIG = jnp.float32(1e9)

# The reference's search radii are PIXELS on its 650^2 cube faces
# (fx = w/2 = 325, System.cpp:83-84; every shipped calibration uses 650
# faces). Angular windows are the calibration-independent quantity: a
# radius of r px means atan(r/325) degrees of bearing. Converting through
# the ACTUAL face focal instead would widen the window 4x at a 160-px
# test face — wide enough for repetitive texture to alias matches onto
# the motion prediction, which measurably turns the constant-velocity
# model into a positive feedback loop ((1+b)^k rotation-error growth,
# NOTES_TPU.md round 4). Keypoint DETECTION noise, however, lives in
# actual pixels, so the angular window keeps a floor of 6 actual pixels
# (~3 sigma of corner localization across pyramid levels — below it,
# true re-detections fall outside the gate and matching starves;
# measured: floor 3 px kept damping-1.0 stable but starved the
# fast-motion scenarios, floor 6 px keeps both). At the reference's face
# size the floor only touches the tightest local-map radii (2.5/4 px ->
# 6 px); the 15/30 px motion windows are the reference's exactly.
WINDOW_REF_FOCAL = 325.0
WINDOW_FLOOR_PX = 6.0


def _window_cos(r_px, fx):
    """cos of the effective angular search radius for a reference-pixel
    window r_px on a face with focal fx."""
    ang = jnp.maximum(jnp.arctan(jnp.asarray(r_px) / WINDOW_REF_FOCAL),
                      jnp.arctan(WINDOW_FLOOR_PX / fx))
    return jnp.cos(ang)


# ---------------------------------------------------------------------------
# Hamming distance on the MXU
# ---------------------------------------------------------------------------

def unpack_descriptors(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) float32 bit matrix (for matmul Hamming)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)


def hamming_matrix(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """(Na,256),(Nb,256) {0,1} -> (Na,Nb) float32 Hamming distances.

    dist = |a| + |b| - 2 a.b — a single MXU matmul. bf16 operands are EXACT
    here ({0,1} inputs, f32 accumulation) and keep the native MXU rate (the
    package default precision is 'highest', which would decompose an f32
    dot into multiple passes).
    """
    cross = jax.lax.dot_general(
        bits_a.astype(jnp.bfloat16), bits_b.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    na = jnp.sum(bits_a, axis=1, keepdims=True)
    nb = jnp.sum(bits_b, axis=1, keepdims=True)
    return na + nb.T - 2.0 * cross


def hamming_pairs(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Hamming distance for aligned pairs: (N,8),(N,8) -> (N,)."""
    x = desc_a ^ desc_b
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Rotation-consistency histogram
# ---------------------------------------------------------------------------

def rotation_consistency(angle1: jnp.ndarray, angle2: jnp.ndarray,
                         matched: jnp.ndarray,
                         bin_deg: float = 12.0) -> jnp.ndarray:
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (ComputeThreeMaxima + filtering, ORBMatcher.cpp:905-946;
    secondary/tertiary bins dropped when <0.1x the max bin). bin_deg is the
    reference's HISTO_LENGTH (bin width in degrees, cpp:44)."""
    import math
    n_bins = int(math.ceil(360.0 / bin_deg))
    rot = angle1 - angle2
    rot_deg = jnp.rad2deg(rot)
    rot_deg = jnp.where(rot_deg < 0, rot_deg + 360.0, rot_deg)
    bins = jnp.round(rot_deg / bin_deg).astype(jnp.int32) % n_bins
    counts = jnp.zeros(n_bins, jnp.float32).at[bins].add(
        matched.astype(jnp.float32))
    top_val, top_idx = jax.lax.top_k(counts, 3)
    keep2 = top_val[1] >= 0.1 * top_val[0]
    keep3 = top_val[2] >= 0.1 * top_val[0]
    ok = ((bins == top_idx[0])
          | ((bins == top_idx[1]) & keep2)
          | ((bins == top_idx[2]) & keep3))
    return matched & ok


# ---------------------------------------------------------------------------
# One-to-one resolution (auction by scatter-min)
# ---------------------------------------------------------------------------

def resolve_one_to_one(best_idx: jnp.ndarray, best_dist: jnp.ndarray,
                       matched: jnp.ndarray, n_targets: int) -> jnp.ndarray:
    """Enforce one-to-one: when several queries pick the same target, only the
    smallest-distance query survives (ties broken by query index), mirroring
    the vMatchedDistance bookkeeping in SearchForInitialization
    (ORBMatcher.cpp:718-748)."""
    n_q = best_idx.shape[0]
    # combined key: distance-major, query-index-minor
    key = (best_dist.astype(jnp.int32) * n_q
           + jnp.arange(n_q, dtype=jnp.int32))
    key = jnp.where(matched, key, jnp.iinfo(jnp.int32).max)
    tgt = jnp.where(matched, best_idx, 0)
    owner_key = jnp.full((n_targets,), jnp.iinfo(jnp.int32).max,
                         jnp.int32).at[tgt].min(key)
    return matched & (owner_key[tgt] == key)


def _masked_top2(dist: jnp.ndarray, gate: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            jnp.ndarray]:
    """Per-row best & second-best over a gated distance matrix.

    Returns (best_idx, best_dist, second_idx, second_dist); gated-out
    entries are BIG.
    """
    d = jnp.where(gate, dist, BIG)
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    d2 = d.at[jnp.arange(d.shape[0]), best_idx].set(BIG)
    second_idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    second = jnp.min(d2, axis=1)
    return best_idx, best, second_idx, second


class MatchResult(NamedTuple):
    idx: jnp.ndarray       # (N1,) int32 target index (undefined if ~ok)
    ok: jnp.ndarray        # (N1,) bool
    dist: jnp.ndarray      # (N1,) float32 Hamming distance

    @property
    def count(self):
        return jnp.sum(self.ok.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Search variants
# ---------------------------------------------------------------------------

def search_for_initialization(kp1, kp2, cam: CubemapCamera,
                              window_px: float = 100.0,
                              nn_ratio: float = 0.9,
                              check_orientation: bool = True,
                              center_rays=None,
                              th_low: float = TH_LOW,
                              histo_bin_deg: float = 12.0) -> MatchResult:
    """Two-view bootstrap matching (SearchForInitialization cpp:676-794):
    level-0 keypoints only, windowed search (angular here), NN ratio, TH_LOW,
    one-to-one, rotation histogram.

    center_rays: optional per-kp1 window centers — the feature's LAST
    matched direction (vbPrevMatched, cpp:687+791-793), which lets matches
    follow features across many frames so initialization parallax can
    accumulate; defaults to kp1's own rays."""
    bits1 = unpack_descriptors(kp1.desc)
    bits2 = unpack_descriptors(kp2.desc)
    dist = hamming_matrix(bits1, bits2)
    cos_win = _window_cos(window_px, cam.fxycxy[0])
    centers = kp1.rays if center_rays is None else center_rays
    ray_dot = centers @ kp2.rays.T
    gate = (ray_dot >= cos_win)
    gate &= (kp1.level[:, None] == 0) & (kp2.level[None, :] == 0)
    gate &= kp1.valid[:, None] & kp2.valid[None, :]
    best_idx, best, _, second = _masked_top2(dist, gate)
    ok = (best <= th_low) & (best < nn_ratio * second)
    ok = resolve_one_to_one(best_idx, best, ok, kp2.n)
    if check_orientation:
        ok = rotation_consistency(kp1.angle, kp2.angle[best_idx], ok,
                                  bin_deg=histo_bin_deg)
    return MatchResult(idx=best_idx, ok=ok, dist=best)


def search_by_projection(query_rays_cam: jnp.ndarray,
                         query_desc: jnp.ndarray,
                         query_levels: jnp.ndarray,
                         query_valid: jnp.ndarray,
                         kp, cam: CubemapCamera,
                         scale_factors: jnp.ndarray,
                         radius_px,
                         level_lo_off: int, level_hi_off: int,
                         th: float = TH_HIGH,
                         nn_ratio: Optional[float] = None,
                         target_free: Optional[jnp.ndarray] = None,
                         query_angles: Optional[jnp.ndarray] = None,
                         check_orientation: bool = False) -> MatchResult:
    """Generic projection search (SearchByProjection variants cpp:51-378).

    query_rays_cam: (Q,3) camera-frame directions of projected 3D points (the
    gate uses angles, so no per-face window logic). query_levels predicts the
    scale level; candidates must be in [level+level_lo_off, level+level_hi_off]
    and within radius_px * scale_factor[level] (converted to an angle).
    nn_ratio, when given, applies the best/second same-level ratio test of the
    local-map variant (cpp:117-121). target_free masks frame keypoints still
    unassociated (cpp:93-95).
    """
    qn = query_rays_cam / jnp.maximum(
        jnp.linalg.norm(query_rays_cam, axis=-1, keepdims=True), 1e-12)
    # FOV gate (cpp:164-166) + on-cubemap gate
    cos_fov = cam.cos_fov_th
    in_fov = qn[:, 2] >= cos_fov
    _, qface = C.ray_to_cubemap(cam, qn)
    projectable = in_fov & (qface != C.UNKNOWN_FACE) & query_valid

    bits_q = unpack_descriptors(query_desc)
    bits_t = unpack_descriptors(kp.desc)
    dist = hamming_matrix(bits_q, bits_t)

    # radius_px may be a scalar or a per-query (Q,) array (the viewing-cos
    # dependent radius of the local-map search, ORBMatcher.cpp:380-386);
    # interpreted at the reference face focal (see WINDOW_REF_FOCAL)
    r_eff = jnp.asarray(radius_px) * scale_factors[
        jnp.clip(query_levels, 0, scale_factors.shape[0] - 1)]
    cos_win = _window_cos(r_eff, cam.fxycxy[0])        # (Q,)
    ray_dot = qn @ kp.rays.T                            # (Q, N)
    gate = ray_dot >= cos_win[:, None]
    lvl = kp.level[None, :]
    gate &= (lvl >= query_levels[:, None] + level_lo_off)
    gate &= (lvl <= query_levels[:, None] + level_hi_off)
    gate &= kp.valid[None, :] & projectable[:, None]
    if target_free is not None:
        gate &= target_free[None, :]

    best_idx, best, second_idx, second = _masked_top2(dist, gate)
    ok = best <= th
    if nn_ratio is not None:
        # ratio applies only when best and runner-up share a scale level
        # (SearchByProjection local-map variant, cpp:117-121)
        same_level = kp.level[best_idx] == kp.level[second_idx]
        ok &= ~(same_level & (best > nn_ratio * second))
    if check_orientation and query_angles is not None:
        ok = rotation_consistency(query_angles, kp.angle[best_idx], ok)
    ok = resolve_one_to_one(best_idx, best, ok, kp.n)
    return MatchResult(idx=best_idx, ok=ok, dist=best)


def epipolar_chi2(cam: CubemapCamera, E12: jnp.ndarray,
                  rays1: jnp.ndarray, rays2: jnp.ndarray,
                  uv2: jnp.ndarray, level_sigma2_2: jnp.ndarray
                  ) -> jnp.ndarray:
    """Pairwise ray-epipolar chi-square (CheckDistEpipolarLine cpp:388-407).

    rays1 (N1,3), rays2/uv2/level_sigma2_2 (N2,...). Returns (N1,N2) of
    num^2 / (|n|^2 sigma^2 levelSigma2). The anisotropic sigma uses the
    epipolar-plane normal n = E12ᵀ ray1 expressed in frame 2's rig frame.
    """
    n = rays1 @ E12                                     # (N1,3) normals
    num = jnp.einsum("ik,jk->ij", n, rays2)             # (N1,N2)
    den = jnp.sum(n * n, axis=-1, keepdims=True)        # (N1,1)
    # sigma depends on (kp2, normal): (N1,N2), factored into matmuls
    sig = C.vector_sigma_along_normal_pairwise(cam, uv2, n)
    chi2 = num * num / jnp.maximum(
        den * sig * sig * level_sigma2_2[None, :], 1e-20)
    return jnp.where(den > 0, chi2, jnp.inf)


def search_for_triangulation(kp1, kp2, cam: CubemapCamera,
                             E12: jnp.ndarray,
                             level_sigma2: jnp.ndarray,
                             free1: Optional[jnp.ndarray] = None,
                             free2: Optional[jnp.ndarray] = None,
                             epipole_ray2: Optional[jnp.ndarray] = None,
                             epipole_guard_deg: float = 3.0,
                             check_orientation: bool = True,
                             th_low: float = TH_LOW,
                             histo_bin_deg: float = 12.0,
                             chi2_th: float = 7.68) -> MatchResult:
    """Epipolar-gated matching for new-point triangulation
    (SearchForTriangulation cpp:971-1125). The reference walks BoW-aligned
    feature groups; the TPU version computes the full gated Hamming matrix —
    same capability, one matmul. E12 relates frames via
    ray2ᵀ (E12ᵀ·) constraint with frame-2 anisotropic sigma; keypoints near
    the epipole are rejected (cpp:1040-1053 analog, angular form).
    free1/free2 mask keypoints not yet bound to a landmark.
    """
    bits1 = unpack_descriptors(kp1.desc)
    bits2 = unpack_descriptors(kp2.desc)
    dist = hamming_matrix(bits1, bits2)
    chi2 = epipolar_chi2(cam, E12, kp1.rays, kp2.rays, kp2.uv, level_sigma2)
    # chi2_th default 2x the reference's 3.84 (ORBMatcher.cpp:1040): the
    # sigma model (like the reference's) puts noise only on ray2, but ray1
    # perturbs the epipolar PLANE by the same amount — measured on
    # map-verified pairs, single-sided 3.84 rejects ~60% of true matches.
    # The triangulation reprojection gates (5.991 both frames) keep
    # precision downstream.
    gate = (chi2 < chi2_th) & kp1.valid[:, None] & kp2.valid[None, :]
    if epipole_ray2 is not None:
        # reject frame-2 keypoints whose ray is within the guard cone of the
        # epipole (triangulation is ill-conditioned there; cpp:1040-1053)
        cos_guard = jnp.cos(jnp.deg2rad(epipole_guard_deg))
        near_epipole = jnp.abs(kp2.rays @ epipole_ray2) >= cos_guard
        gate &= ~near_epipole[None, :]
    if free1 is not None:
        gate &= free1[:, None]
    if free2 is not None:
        gate &= free2[None, :]
    best_idx, best, _, _ = _masked_top2(dist, gate)
    ok = best <= th_low
    if check_orientation:
        ok = rotation_consistency(kp1.angle, kp2.angle[best_idx], ok,
                                  bin_deg=histo_bin_deg)
    ok = resolve_one_to_one(best_idx, best, ok, kp2.n)
    return MatchResult(idx=best_idx, ok=ok, dist=best)
