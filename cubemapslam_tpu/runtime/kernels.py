"""Jitted device stages for tracking and local mapping.

Each function here is one fixed-shape jitted program; the host state machine
(runtime/system.py) strings them together. Citations point at the reference
logic each stage re-implements.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.optim.pose_opt import pose_optimization
from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust
from cubemapslam_tpu.solvers import (initialize_two_view, triangulate_rays)
from cubemapslam_tpu.features.extractor import Keypoints


class TrackingKernels:
    """Factory that jit-compiles all per-frame stages for one geometry."""

    def __init__(self, cfg: SlamConfig, cam: CubemapCamera):
        self.cfg = cfg
        self.cam = cam
        self.scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
        self.level_sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
        self.inv_level_sigma2 = 1.0 / self.level_sigma2
        self.log_scale = float(jnp.log(jnp.float32(cfg.scale_factor)))
        # matcher thresholds from config (ORBMatcher.cpp:42-45 constants)
        self.th_low = float(cfg.th_low)
        self.th_high = float(cfg.th_high)
        self.histo_bin = float(cfg.histo_length)

    # ------------------------------------------------------------------
    # Initialization (CubemapInitialization + CreateInitialMapCubemap,
    # Tracking.cpp:391-565)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def match_for_initialization(self, kp_ref: Keypoints, kp_cur: Keypoints,
                                 prev_rays):
        res = M.search_for_initialization(
            kp_ref, kp_cur, self.cam, window_px=100.0, nn_ratio=0.9,
            center_rays=prev_rays, th_low=self.th_low,
            histo_bin_deg=self.histo_bin)
        # vbPrevMatched update: matched ref features re-center their search
        # window on the matched current direction (cpp:791-793)
        new_prev = jnp.where(res.ok[:, None], kp_cur.rays[res.idx],
                             prev_rays)
        return res.idx, res.ok, res.count, new_prev

    @functools.partial(jax.jit, static_argnums=0)
    def two_view_init(self, key, kp_ref: Keypoints, kp_cur: Keypoints,
                      m_idx, m_ok):
        """Run ray RANSAC init over the matched pairs (fixed N1 length)."""
        rays1 = kp_ref.rays
        rays2 = kp_cur.rays[m_idx]
        uv1 = kp_ref.uv
        uv2 = kp_cur.uv[m_idx]
        res = initialize_two_view(
            self.cam, key, rays1, rays2, uv1, uv2, m_ok,
            n_iters=self.cfg.init_ransac_iters,
            min_parallax=self.cfg.init_min_parallax_deg,
            min_triangulated=self.cfg.init_min_triangulated,
            good_ratio=self.cfg.init_good_ratio)
        return res

    @functools.partial(jax.jit, static_argnums=(0, 3))
    def downselect_keypoints(self, kp: Keypoints, priority, n_keep: int):
        """Reduce an init-extractor keypoint set (3x features,
        Tracking.cpp:96) to the arena feature width, keeping the
        highest-priority rows. Returns (reduced Keypoints, selected
        indices)."""
        p = jnp.where(kp.valid, priority, -jnp.inf)
        _, sel = jax.lax.top_k(p, n_keep)
        sel = sel.astype(jnp.int32)
        red = Keypoints(
            uv=kp.uv[sel], response=kp.response[sel], angle=kp.angle[sel],
            level=kp.level[sel], face=kp.face[sel], desc=kp.desc[sel],
            rays=kp.rays[sel], valid=kp.valid[sel])
        return red, sel

    # ------------------------------------------------------------------
    # Motion-model tracking (TrackWithMotionModel, Tracking.cpp:620-677)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,), static_argnames=("radius",))
    def track_last_frame(self, arena: SM.MapArena, kp_cur: Keypoints,
                         last_assoc, last_outlier, last_kp_level,
                         last_kp_angle, R_pred, t_pred,
                         radius: float = 15.0):
        """Project last frame's landmarks into the predicted pose and match
        (SearchByProjection frame-vs-last, ORBMatcher.cpp:130-251).

        Returns assoc (N,) landmark ids for current keypoints (-1 none).
        """
        lm = last_assoc
        has = (lm >= 0) & ~last_outlier
        has &= jnp.where(lm >= 0, arena.lm_valid[jnp.maximum(lm, 0)], False)
        Xw = arena.lm_pos[jnp.maximum(lm, 0)]
        Xc = G.se3_apply(R_pred, t_pred, Xw)
        # rotation-consistency ON: reference parity (the frame-vs-last
        # SearchByProjection runs the 12-degree histogram filter,
        # ORBMatcher.cpp:135-251) — it prunes the rotation-biased false
        # matches that otherwise confirm a drifting motion prediction
        res = M.search_by_projection(
            Xc, arena.lm_desc[jnp.maximum(lm, 0)], last_kp_level, has,
            kp_cur, self.cam, self.scale_factors, radius,
            level_lo_off=-1, level_hi_off=1, th=self.th_high,
            query_angles=last_kp_angle, check_orientation=True)
        # per-current-kp landmark assoc; scatter-max so losing queries
        # (which carry -1) never clobber a winner's entry
        assoc = jnp.full((kp_cur.n,), SM.NO_LM, jnp.int32)
        assoc = assoc.at[res.idx].max(
            jnp.where(res.ok, lm, SM.NO_LM).astype(jnp.int32))
        return assoc, jnp.sum((assoc >= 0).astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=0)
    def track_reference_kf(self, arena: SM.MapArena, kp_cur: Keypoints,
                           ref_kf: jnp.ndarray):
        """Match current frame against a keyframe's landmark-bearing features
        (replaces SearchByBoW frame-vs-KF, ORBMatcher.cpp:409-539 — on TPU
        the full Hamming matmul with NN-ratio 0.7 + rotation histogram is
        cheaper than vocabulary alignment)."""
        kf_desc = arena.kf_desc[ref_kf]
        kf_lm = arena.kf_obs_lm[ref_kf]
        kf_has = (kf_lm >= 0) & arena.kf_kp_valid[ref_kf]
        kf_has &= jnp.where(kf_lm >= 0,
                            arena.lm_valid[jnp.maximum(kf_lm, 0)], False)
        bits_kf = M.unpack_descriptors(kf_desc)
        bits_cur = M.unpack_descriptors(kp_cur.desc)
        dist = M.hamming_matrix(bits_kf, bits_cur)
        gate = kf_has[:, None] & kp_cur.valid[None, :]
        best_idx, best, _, second = M._masked_top2(dist, gate)
        ok = (best <= self.th_low) & (best < 0.7 * second)
        ok = M.rotation_consistency(arena.kf_angle[ref_kf],
                                    kp_cur.angle[best_idx], ok,
                                    bin_deg=self.histo_bin)
        ok = M.resolve_one_to_one(best_idx, best, ok, kp_cur.n)
        assoc = jnp.full((kp_cur.n,), SM.NO_LM, jnp.int32)
        assoc = assoc.at[best_idx].max(
            jnp.where(ok, kf_lm, SM.NO_LM).astype(jnp.int32))
        return assoc, jnp.sum((assoc >= 0).astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=0)
    def optimize_pose(self, arena: SM.MapArena, kp_cur: Keypoints,
                      assoc, R0, t0):
        """PoseOptimization on the current associations
        (Optimizer.cpp:48-190). Returns (R, t, outlier mask, n_inliers)."""
        has = (assoc >= 0) & kp_cur.valid
        has &= jnp.where(assoc >= 0,
                         arena.lm_valid[jnp.maximum(assoc, 0)], False)
        Xw = arena.lm_pos[jnp.maximum(assoc, 0)]
        uv_face = C.cubemap_uv_to_in_face(self.cam, kp_cur.uv)
        inv_s2 = self.inv_level_sigma2[
            jnp.clip(kp_cur.level, 0, self.cfg.n_levels - 1)]
        R, t, inl, n = pose_optimization(
            self.cam, R0, t0, Xw, kp_cur.face, uv_face, inv_s2, has)
        outlier = has & ~inl
        return R, t, outlier, n

    # ------------------------------------------------------------------
    # Local map tracking (TrackLocalMap, Tracking.cpp:679-719)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("max_local",))
    def select_local_landmarks(self, arena: SM.MapArena, assoc,
                               max_local: int = 8192, covis=None):
        """Local keyframes by observation voting (UpdateLocalKeyFrames,
        Tracking.cpp:881-988) then their landmarks (UpdateLocalPoints,
        855-878), compacted to a fixed-size index set."""
        K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
        member = jnp.zeros(L + 1, bool).at[
            jnp.where(assoc >= 0, assoc, L)].set(True)[:-1]
        obs = arena.kf_obs_lm
        obs_ok = (obs >= 0) & arena.kf_kp_valid & arena.kf_valid[:, None]
        votes = jnp.sum(
            jnp.where(obs_ok & member[jnp.maximum(obs, 0)], 1, 0), axis=1)
        # K1 = KFs observing current-frame landmarks (vote counts); the
        # reference then EXPANDS with each K1 member's covisible
        # neighbors/children/parent (Tracking.cpp:905-972) — without the
        # expansion the local map carries only the directly-shared
        # landmarks and TrackLocalMap starves (measured: 8 KFs/159 points
        # vs 25+/500+ expanded on the same frame)
        if covis is None:
            covis = SM.covisibility_matrix(arena)
        votersf = (votes > 0).astype(jnp.float32)
        nb_strength = jnp.max(covis.astype(jnp.float32)
                              * votersf[:, None], axis=0)
        expanded = (votes > 0) | (nb_strength
                                  >= self.cfg.covisibility_weight_th)
        expanded &= arena.kf_valid
        # top-80 cap (Tracking.cpp:934), voters ranked first
        k_eff = min(self.cfg.max_local_keyframes, K)
        prio = jnp.where(expanded,
                         votes.astype(jnp.float32) * 1e6 + nb_strength,
                         -1.0)
        top_p, local_kfs = jax.lax.top_k(prio, k_eff)
        local_mask = jnp.zeros(K, bool).at[local_kfs].set(top_p > 0)
        # their landmarks
        in_local = local_mask[:, None] & obs_ok
        lm_local = jnp.zeros(L + 1, bool).at[
            jnp.where(in_local, obs, L)].set(True)[:-1]
        lm_local &= arena.lm_valid
        # compact to fixed max_local indices: cumsum-rank compaction (the
        # selection score is binary, so a full top_k sort over L=65536 —
        # ~10 ms on TPU — buys nothing over stable index order)
        P = min(max_local, L)
        rank = jnp.cumsum(lm_local.astype(jnp.int32)) - 1
        can = lm_local & (rank < P)
        sel = jnp.full(P + 1, 0, jnp.int32).at[
            jnp.where(can, rank, P)].set(
            jnp.arange(L, dtype=jnp.int32))[:-1]
        sel_ok = jnp.arange(P) < jnp.sum(can.astype(jnp.int32))
        # pKFmax: the KF sharing the most observations with this frame
        # (Tracking.cpp:930-933; becomes mpReferenceKF, Tracking.cpp:938).
        # The winning VOTE COUNT rides along so callers can keep the
        # previous reference KF when the vote map is empty (the reference
        # only reassigns if(pKFmax), Tracking.cpp:935-938).
        pkf_max = jnp.argmax(votes).astype(jnp.int32)
        return (sel, sel_ok, local_mask, pkf_max, votes[pkf_max])

    @functools.partial(jax.jit, static_argnums=0)
    def search_local_points(self, arena: SM.MapArena, kp_cur: Keypoints,
                            assoc, sel, sel_ok, R, t,
                            radius_scale=1.0):
        """isInFrustum gates + windowed projection match for the selected
        local landmarks (SearchLocalPoints Tracking.cpp:794-843,
        Frame::isInFrustum Frame.cpp:197-249, SearchByProjection
        ORBMatcher.cpp:51-128). Merges new matches into assoc. Also returns
        visible/found counter updates."""
        Xw = arena.lm_pos[sel]
        Xc = G.se3_apply(R, t, Xw)
        dist = jnp.linalg.norm(Xc, axis=-1)
        Ow = -R.T @ t
        PO = Xw - Ow
        # viewing angle vs landmark normal
        view_cos = jnp.sum(PO * arena.lm_normal[sel], axis=-1) / jnp.maximum(
            dist, 1e-12)
        in_range = ((dist >= 0.8 * arena.lm_min_dist[sel])
                    & (dist <= 1.2 * arena.lm_max_dist[sel]))
        ray_n = Xc / jnp.maximum(dist, 1e-12)[:, None]
        in_fov = ray_n[:, 2] >= self.cam.cos_fov_th
        _, face = C.ray_to_cubemap(self.cam, ray_n)
        frustum = (sel_ok & in_fov & (face != C.UNKNOWN_FACE)
                   & in_range & (view_cos > 0.5))
        # not already matched in this frame
        member = jnp.zeros(arena.n_lm_cap + 1, bool).at[
            jnp.where(assoc >= 0, assoc, arena.n_lm_cap)].set(True)[:-1]
        already = member[sel]
        query_ok = frustum & ~already
        lvl = SM.predict_scale(dist, arena.lm_max_dist[sel],
                               self.log_scale, self.cfg.n_levels)
        # radius by viewing cos (RadiusByViewingCos, ORBMatcher.cpp:380-386)
        # x radius_scale: the reference widens its SearchLocalPoints
        # threshold when tracking is weak (th=5 soon after reloc vs th=1,
        # Tracking.cpp:829-841) — under a weakly-constrained pose the
        # projections land outside the tight nominal window (measured at
        # working scale: ~850 queried in-frustum landmarks yielded only
        # ~40 matches once inliers dropped below ~100)
        radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * radius_scale
        # target keypoints without associations
        target_free = assoc < 0
        res = M.search_by_projection(
            Xc, arena.lm_desc[sel], lvl, query_ok, kp_cur, self.cam,
            self.scale_factors, radius, level_lo_off=-1, level_hi_off=0,
            th=self.th_high, nn_ratio=0.8, target_free=target_free)
        assoc_new = assoc.at[res.idx].max(
            jnp.where(res.ok, sel, SM.NO_LM).astype(jnp.int32))
        # counter updates (IncreaseVisible / IncreaseFound,
        # Tracking.cpp:800-833, 700-707)
        vis_add = jnp.zeros(arena.n_lm_cap, jnp.int32).at[sel].add(
            frustum.astype(jnp.int32))
        # diagnostics: local funnel (in-frustum, queried, newly matched)
        diag = jnp.stack([jnp.sum(frustum.astype(jnp.int32)),
                          jnp.sum(query_ok.astype(jnp.int32)),
                          jnp.sum(res.ok.astype(jnp.int32))])
        return assoc_new, vis_add, diag

    # ------------------------------------------------------------------
    # Fused per-frame stages: fewer host<->device round trips (each synced
    # jitted call costs ~20-50ms through the TPU tunnel)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0,),
                       static_argnames=("radius",))
    def track_motion_fused(self, arena: SM.MapArena, kp_cur: Keypoints,
                           last_assoc, last_outlier, last_kp_level,
                           last_kp_angle, R_pred, t_pred,
                           radius: float = 15.0):
        """track_last_frame + optimize_pose in one program."""
        assoc, n = self.track_last_frame(
            arena, kp_cur, last_assoc, last_outlier, last_kp_level,
            last_kp_angle, R_pred, t_pred, radius=radius)
        R, t, outlier, n_inl = self.optimize_pose(arena, kp_cur, assoc,
                                                  R_pred, t_pred)
        return assoc, n, R, t, outlier, n_inl

    @functools.partial(jax.jit, static_argnums=0)
    def graph_cache(self, arena: SM.MapArena):
        """(covisibility, observation counts) from ONE incidence build.

        The observation graph changes only at keyframe/mapping/BA/loop
        events — never during pure frame tracking — so the host refreshes
        this cache once per event and passes it into track_frame_full;
        rebuilding the incidence inside every frame cost ~20 ms/frame at
        the working scale (measured, profile_track.py)."""
        O = SM.incidence_matrix(arena)
        return (SM.covisibility_matrix(arena, O=O),
                SM.observation_counts(arena, O=O))

    @functools.partial(jax.jit, static_argnums=0)
    def track_local_fused(self, arena: SM.MapArena, kp_cur: Keypoints,
                          assoc, outlier, R, t, covis=None,
                          radius_scale=1.0):
        """TrackLocalMap in one program: local selection + projection
        search + pose optimization + visible/found counter updates."""
        assoc = jnp.where(outlier, SM.NO_LM, assoc)
        (sel, sel_ok, _, pkf_max,
         pkf_votes) = self.select_local_landmarks(arena, assoc,
                                                  covis=covis)
        assoc, vis_add, diag = self.search_local_points(
            arena, kp_cur, assoc, sel, sel_ok, R, t,
            radius_scale=radius_scale)
        R, t, outlier, n_final = self.optimize_pose(arena, kp_cur, assoc,
                                                    R, t)
        arena = self.update_found_counters(arena, assoc, outlier, vis_add)
        return (arena, assoc, outlier, R, t, n_final, pkf_max, pkf_votes,
                diag)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def track_frame_full(self, arena: SM.MapArena, kp_cur: Keypoints,
                         last_assoc, last_outlier, last_kp_level,
                         last_kp_angle, rel_R, rel_t, last_ref,
                         vel_R, vel_t, vel_gain, ref_kf, covis, cnt):
        """The WHOLE per-frame SLAM tracking path as one device program:
        motion-model match (radius 15) -> widen to 30 if <20 matches
        (Tracking.cpp:641-648) -> reference-KF fallback if still <20
        (Tracking.cpp:191-200) -> TrackLocalMap (Tracking.cpp:679-719),
        with every branch resolved by lax.cond on device. The host fetches
        ONE packed scalar vector per frame instead of syncing after each
        stage (3-6 blocking int() pulls cost 20-50ms each over the TPU
        tunnel — the reference hides stage latency with threads,
        System.cpp:108-128; here the device queue stays full instead).

        The last pose arrives as (rel_R, rel_t, last_ref) — the pose
        RELATIVE to its reference keyframe, re-anchored here against the
        CURRENT keyframe table (UpdateLastFrame semantics,
        Tracking.cpp:612-618) — and the motion model as (vel_R, vel_t,
        vel_gain) with the prediction composed ON DEVICE
        (Tracking.cpp:626-631; vel_gain = motion_model_damping, 0 when no
        velocity exists yet). The host never dispatches per-frame 3x3
        algebra over the tunnel.

        Returns (arena, assoc, outlier, R, t, packed, vel_R, vel_t,
        rel_R, rel_t) with packed (23,) f32 = [n_matches, n_inliers,
        n_final, n_ref_obs, live_kf, first_free_slot, track_ok,
        new_ref_kf, local_frustum, local_queried, local_matched,
        R.ravel(9), t(3)] — the frame's ONLY host fetch;
        n_final/arena counters only updated when track_ok.
        first_free_slot (-1 if the arena is full) feeds the host's
        NeedNewKeyFrame check without another fetch.
        """
        R_ref = arena.kf_R[last_ref]
        t_ref = arena.kf_t[last_ref]
        R_last, t_last = G.se3_compose(rel_R, rel_t, R_ref, t_ref)
        tw = G.se3_log(vel_R, vel_t) * vel_gain
        # velocity plausibility gate: a re-anchoring jump after a bundle
        # adjustment that MOVED the reference keyframe lands in the
        # frame-to-frame velocity; extrapolating it doubles the jump and
        # the next frame's windows land on nothing (measured: a single
        # 0.13 rad pose correction became a permanent tracking loss).
        # 0.2 rad/frame is far beyond any plausible camera rotation at
        # camera rate; implausible velocities predict from the last pose.
        rot_mag = jnp.linalg.norm(tw[3:6])
        tw = jnp.where(rot_mag < 0.2, tw, 0.0)
        Rv, tv = G.se3_exp(tw)
        R_pred, t_pred = G.se3_compose(Rv, tv, R_last, t_last)
        st = self.track_motion_fused(arena, kp_cur, last_assoc,
                                     last_outlier, last_kp_level,
                                     last_kp_angle, R_pred, t_pred,
                                     radius=15.0)

        def widen(_):
            return self.track_motion_fused(arena, kp_cur, last_assoc,
                                           last_outlier, last_kp_level,
                                           last_kp_angle, R_pred, t_pred,
                                           radius=30.0)

        st = jax.lax.cond(st[1] < 20, widen, lambda _: st, None)

        # zero-velocity hypothesis: the constant-velocity extrapolation is
        # a PRIOR; when matching under it starves (acceleration beyond the
        # model), re-match from the unextrapolated last pose before
        # falling back to the reference keyframe (robustness addition —
        # the reference drops straight to TrackReferenceKeyFrame,
        # Tracking.cpp:191-200, whose BoW matching is pose-free)
        def zero_vel(_):
            return self.track_motion_fused(arena, kp_cur, last_assoc,
                                           last_outlier, last_kp_level,
                                           last_kp_angle, R_last, t_last,
                                           radius=30.0)

        st2 = jax.lax.cond(st[1] < 20, zero_vel, lambda _: st, None)
        st = jax.lax.cond(st2[5] > st[5], lambda _: st2, lambda _: st,
                          None)

        def ref_fallback(_):
            assoc2, n2 = self.track_reference_kf(arena, kp_cur, ref_kf)
            R2, t2, out2, ni2 = self.optimize_pose(arena, kp_cur, assoc2,
                                                   R_last, t_last)
            return assoc2, n2, R2, t2, out2, ni2

        use_ref = st[1] < 20
        assoc, n, R, t, outlier, n_inl = jax.lax.cond(
            use_ref, ref_fallback, lambda _: st, None)

        track_ok = (n >= 15) & (n_inl >= 10)

        # covis/cnt arrive as the host's cached graph views (refreshed at
        # keyframe/mapping/BA/loop events — the only places the obs graph
        # changes; see graph_cache)

        def do_local(arena):
            # adaptive widening: a weakly-constrained pose (few motion
            # inliers) scatters projections beyond the nominal window
            rs = jnp.where(n_inl < 100, 3.0, 1.0)
            return self.track_local_fused(arena, kp_cur, assoc, outlier,
                                          R, t, covis=covis,
                                          radius_scale=rs)

        def skip_local(arena):
            return (arena, assoc, outlier, R, t, jnp.int32(0), ref_kf,
                    jnp.int32(0), jnp.zeros(3, jnp.int32))

        (arena, assoc_f, outlier_f, R_f, t_f, n_final,
         pkf_max, pkf_votes, local_diag) = jax.lax.cond(
            track_ok, do_local, skip_local, arena)
        # keep the previous mpReferenceKF when the vote map is empty
        # (reference reassigns only if(pKFmax), Tracking.cpp:935-938);
        # electing argmax over all-zero votes would crown slot 0, possibly
        # an invalid KF, and poison the ref-relative pose anchor
        new_ref = jnp.where(pkf_votes > 0, pkf_max, ref_kf)

        # NeedNewKeyFrame's reference count tracks MATURE map points only:
        # nRefMatches = mpReferenceKF->TrackedMapPoints(nMinObs) with
        # nMinObs=3 (2 while the map has <=2 KFs), Tracking.cpp:741-748 —
        # counted on the NEW reference KF, which TrackLocalMap just set to
        # pKFmax, the point-richest covisible KF (Tracking.cpp:930-938).
        # Counting every observation on the newest KF instead makes c2
        # fire every frame (a fresh KF has mostly young points),
        # degenerating into one keyframe per frame.
        live_kf = jnp.sum(arena.kf_valid.astype(jnp.int32))
        row = arena.kf_obs_lm[new_ref]
        row_ok = (row >= 0) & arena.kf_kp_valid[new_ref]
        row_ok &= jnp.where(row >= 0,
                            arena.lm_valid[jnp.maximum(row, 0)], False)
        min_obs = jnp.where(live_kf > 2, 3, 2)
        n_ref_obs = jnp.sum(
            (row_ok & (cnt[jnp.maximum(row, 0)] >= min_obs))
            .astype(jnp.int32))
        free = ~arena.kf_valid
        first_free = jnp.where(jnp.any(free),
                               jnp.argmax(free).astype(jnp.int32),
                               jnp.int32(-1))
        scalars = jnp.concatenate([
            jnp.stack([n, n_inl, n_final, n_ref_obs, live_kf,
                       first_free, track_ok.astype(jnp.int32), new_ref]),
            local_diag]).astype(jnp.float32)
        # motion-model velocity (Tracking.cpp:307-316) and the ref-KF-
        # relative pose, computed ON DEVICE so the host never dispatches
        # per-frame 3x3 algebra over the tunnel; the pose rides the packed
        # fetch (a separate np.asarray(R) costs another ~26ms tunnel RPC)
        R_li, t_li = G.se3_inverse(R_last, t_last)
        vel_R, vel_t = G.se3_compose(R_f, t_f, R_li, t_li)
        R_ri, t_ri = G.se3_inverse(arena.kf_R[new_ref], arena.kf_t[new_ref])
        rel_R, rel_t = G.se3_compose(R_f, t_f, R_ri, t_ri)
        packed = jnp.concatenate([scalars, R_f.reshape(-1), t_f])
        return (arena, assoc_f, outlier_f, R_f, t_f, packed,
                vel_R, vel_t, rel_R, rel_t)

    # ------------------------------------------------------------------
    # Relocalization (Tracking::Relocalization, Tracking.cpp:990-1151):
    # ALL BoW candidates evaluated in ONE vmapped program (the reference
    # round-robins PnP RANSAC across candidates host-side; a sync per
    # candidate stage costs ~20-50ms over the TPU tunnel)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def reloc_candidates_fused(self, arena: SM.MapArena, kp_cur: Keypoints,
                               cand_idx, cand_ok, keys):
        """Per candidate KF: BoW-style match (>=15) -> bearing-EPnP RANSAC
        -> PoseOptimization (>=10 inliers). Returns stacked
        (assoc, R, t, outlier, score) where score = n2 inliers for passing
        candidates, -1 otherwise."""
        from cubemapslam_tpu.solvers.pnp import pnp_ransac
        lvl_sig2 = self.level_sigma2[
            jnp.clip(kp_cur.level, 0, self.cfg.n_levels - 1)]

        def one(args):
            c, ok_c, key = args
            assoc, n = self.track_reference_kf(arena, kp_cur, c)
            has = (assoc >= 0) & kp_cur.valid
            pw = arena.lm_pos[jnp.maximum(assoc, 0)]
            res = pnp_ransac(self.cam, key, pw, kp_cur.rays, kp_cur.uv,
                             lvl_sig2, has,
                             n_iters=self.cfg.pnp_ransac_iters)
            R, t, outlier, n2 = self.optimize_pose(arena, kp_cur, assoc,
                                                   res.R, res.t)
            good = ok_c & (n >= 15) & res.success & (n2 >= 10)
            return assoc, R, t, outlier, jnp.where(good, n2, -1)

        # lax.map (sequential), NOT vmap: vmapping the PnP RANSAC over the
        # candidates lets XLA materialize a (C * iters * N, 3, 3) broadcast
        # whose (4,128)-tiled layout is ~18GB at the Lafida working scale
        return jax.lax.map(one, (cand_idx, cand_ok, keys))

    @functools.partial(jax.jit, static_argnums=0)
    def reloc_widen_fused(self, arena: SM.MapArena, kp_cur: Keypoints,
                          assoc, outlier, R, t):
        """Widening pass for the accepted candidate: local-landmark
        projection search + final PoseOptimization (the two SearchByProjection
        widening passes, Tracking.cpp:1078-1140)."""
        assoc = jnp.where(outlier, SM.NO_LM, assoc)
        sel, sel_ok, _, _, _ = self.select_local_landmarks(arena, assoc)
        assoc2, _, _ = self.search_local_points(arena, kp_cur, assoc,
                                                sel, sel_ok, R, t)
        R, t, outlier, n3 = self.optimize_pose(arena, kp_cur, assoc2, R, t)
        return assoc2, R, t, outlier, n3

    # ------------------------------------------------------------------
    # Keyframe creation
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def insert_keyframe(self, arena: SM.MapArena, slot, kp: Keypoints,
                        assoc, outlier, R, t, frame_id, timestamp):
        """Write a frame into arena row `slot` (CreateNewKeyFrame,
        Tracking.cpp:776-792 + LocalMapping::ProcessNewKeyFrame attaching
        observations, LocalMapping.cpp:133-173)."""
        good_assoc = jnp.where(outlier, SM.NO_LM, assoc)
        arena = arena._replace(
            kf_R=arena.kf_R.at[slot].set(R),
            kf_t=arena.kf_t.at[slot].set(t),
            kf_valid=arena.kf_valid.at[slot].set(True),
            kf_frame_id=arena.kf_frame_id.at[slot].set(frame_id),
            kf_timestamp=arena.kf_timestamp.at[slot].set(timestamp),
            kf_uv=arena.kf_uv.at[slot].set(kp.uv),
            kf_rays=arena.kf_rays.at[slot].set(kp.rays),
            kf_face=arena.kf_face.at[slot].set(kp.face),
            kf_level=arena.kf_level.at[slot].set(kp.level),
            kf_angle=arena.kf_angle.at[slot].set(kp.angle),
            kf_desc=arena.kf_desc.at[slot].set(kp.desc),
            kf_kp_valid=arena.kf_kp_valid.at[slot].set(kp.valid),
            kf_obs_lm=arena.kf_obs_lm.at[slot].set(good_assoc),
        )
        # stats refresh for the landmarks this keyframe now observes ONLY
        # (the reference likewise updates per-MapPoint on insertion,
        # LocalMapping.cpp:157-158); a full-arena recompute is ~1 GB of
        # descriptor traffic at working scale
        touched = jnp.zeros(arena.n_lm_cap, bool).at[
            jnp.maximum(good_assoc, 0)].max(good_assoc >= 0)
        return SM.update_landmark_stats_touched(
            arena, self.scale_factors, touched,
            max_touched=arena.n_feat,
            max_obs=min(32 * arena.n_feat, arena.n_kf_cap * arena.n_feat))

    @functools.partial(jax.jit, static_argnums=0)
    def update_found_counters(self, arena: SM.MapArena, assoc, outlier,
                              vis_add):
        found_add = jnp.zeros(arena.n_lm_cap, jnp.int32).at[
            jnp.where((assoc >= 0) & ~outlier, assoc, 0)].add(
            jnp.where((assoc >= 0) & ~outlier, 1, 0))
        return arena._replace(
            lm_visible=arena.lm_visible + vis_add,
            lm_found=arena.lm_found + found_add)
