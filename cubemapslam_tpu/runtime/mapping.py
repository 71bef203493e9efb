"""Local mapping stages: map-point culling, triangulation of new landmarks,
duplicate fusion, local BA, keyframe culling.

Re-implements the LocalMapping thread's per-keyframe pipeline
(LocalMapping.cpp:52-117: ProcessNewKeyFrame -> MapPointCulling ->
CreateNewMapPoints -> SearchInNeighbors -> LocalBundleAdjustment ->
KeyFrameCulling) as jitted stages over the map arena.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.features.extractor import Keypoints
from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust
from cubemapslam_tpu.solvers import triangulate_rays


def _kf_keypoints(arena: SM.MapArena, k) -> Keypoints:
    """View arena row k as a Keypoints struct (for the matchers)."""
    return Keypoints(
        uv=arena.kf_uv[k], response=jnp.ones(arena.n_feat),
        angle=arena.kf_angle[k], level=arena.kf_level[k],
        face=arena.kf_face[k], desc=arena.kf_desc[k],
        rays=arena.kf_rays[k], valid=arena.kf_kp_valid[k])


def _relative_geometry(arena, k1, k2):
    """R21/t21 mapping frame-1 points to frame 2, and the epipolar matrix in
    the convention matching.epipolar_chi2 expects (ComputeE12,
    LocalMapping.cpp:469-482)."""
    R1, t1 = arena.kf_R[k1], arena.kf_t[k1]
    R2, t2 = arena.kf_R[k2], arena.kf_t[k2]
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    E12 = (G.hat(t21) @ R21).T
    return R21, t21, E12


class MappingKernels:
    def __init__(self, cfg, cam):
        import math
        self.cfg = cfg
        self.cam = cam
        self.log_scale = math.log(cfg.scale_factor)
        self.scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
        self.level_sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
        self.inv_level_sigma2 = 1.0 / self.level_sigma2
        self.th_low = float(cfg.th_low)
        self.histo_bin = float(cfg.histo_length)

    # ------------------------------------------------------------------
    # MapPointCulling (LocalMapping.cpp:175-206)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def cull_map_points(self, arena: SM.MapArena, current_kf_count,
                        cnt=None):
        """Probation culling of RECENT landmarks only
        (mlpRecentAddedMapPoints, LocalMapping.cpp:175-206): within ~3
        keyframes of creation a landmark must keep found/visible >= 0.25 and
        accumulate >= 2 observations; after that it leaves the probation
        list and these tests never fire again (mature landmarks are removed
        only by BA outlier cuts / fusion)."""
        if cnt is None:
            cnt = SM.observation_counts(arena)
        ratio = arena.lm_found.astype(jnp.float32) / jnp.maximum(
            arena.lm_visible.astype(jnp.float32), 1.0)
        age = current_kf_count - 1 - arena.lm_birth  # in keyframes (counter)
        probation = age <= 3
        bad_ratio = arena.lm_valid & probation & (
            ratio < self.cfg.mp_found_ratio_th)
        bad_obs = arena.lm_valid & probation & ((age >= 2) & (cnt <= 2))
        bad = bad_ratio | bad_obs
        n_bad = jnp.stack([jnp.sum(bad_ratio.astype(jnp.int32)),
                           jnp.sum(bad_obs.astype(jnp.int32))])
        return arena._replace(lm_valid=arena.lm_valid & ~bad), n_bad

    # ------------------------------------------------------------------
    # CreateNewMapPoints (LocalMapping.cpp:209-386)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def triangulate_with_neighbor(self, arena: SM.MapArena, k_new, k_nb):
        """Match free keypoints of (k_new, k_nb) on the epipolar constraint
        and triangulate candidates. Returns per-k_new-feature candidate
        world points + metadata (validity masked); allocation happens in
        commit_new_landmarks."""
        kp1 = _kf_keypoints(arena, k_new)
        kp2 = _kf_keypoints(arena, k_nb)
        R21, t21, E12 = _relative_geometry(arena, k_new, k_nb)
        # baseline / median-depth gate is checked host-side (cpp:240-247)
        free1 = arena.kf_obs_lm[k_new] < 0
        free2 = arena.kf_obs_lm[k_nb] < 0
        # epipole: camera-1 center seen from frame 2
        e2 = t21 / jnp.maximum(jnp.linalg.norm(t21), 1e-12)
        res = M.search_for_triangulation(
            kp1, kp2, self.cam, E12,
            self.level_sigma2[jnp.clip(kp2.level, 0,
                                       self.cfg.n_levels - 1)],
            free1=free1, free2=free2, epipole_ray2=e2,
            epipole_guard_deg=1.0, th_low=self.th_low,
            histo_bin_deg=self.histo_bin,
            chi2_th=float(self.cfg.chi2_epipolar))
        rays1 = kp1.rays
        rays2 = kp2.rays[res.idx]
        X1 = triangulate_rays(rays1, rays2, R21, t21)     # frame-1 coords
        ok = res.ok & jnp.all(jnp.isfinite(X1), axis=-1)

        def cnt(m):
            return jnp.sum(m.astype(jnp.int32))

        # parallax between the viewing rays in a COMMON frame (the
        # reference measures the angle at the 3D point between world-frame
        # normals, LocalMapping.cpp:286-300); dotting each camera's
        # LOCAL-frame ray would conflate relative rotation with parallax
        # and reject everything under look-at/orbit motion
        rays2_in1 = rays2 @ R21                           # R21ᵀ per row
        cos_par = jnp.sum(rays1 * rays2_in1, axis=-1)
        ok &= cos_par < 0.9998
        n_par = cnt(ok)
        # FOV cheirality both frames (cpp:306-318)
        d1 = jnp.linalg.norm(X1, axis=-1)
        # scale-free depth sanity: at parallax >= ~1.15 deg a true point lies
        # within ~50 baselines; anything beyond is a near-zero-parallax
        # artifact whose reprojection happens to pass both gates
        ok &= d1 <= 50.0 * jnp.linalg.norm(t21)
        n_depth = cnt(ok)
        ok &= X1[:, 2] / jnp.maximum(d1, 1e-12) > self.cam.cos_fov_th
        X2 = X1 @ R21.T + t21
        d2 = jnp.linalg.norm(X2, axis=-1)
        ok &= X2[:, 2] / jnp.maximum(d2, 1e-12) > self.cam.cos_fov_th
        # reprojection chi2 both frames (cpp:320-349)
        uvp1, f1 = C.ray_to_cubemap(self.cam, X1)
        uvp2, f2 = C.ray_to_cubemap(self.cam, X2)
        s1 = self.level_sigma2[jnp.clip(kp1.level, 0,
                                        self.cfg.n_levels - 1)]
        s2 = self.level_sigma2[jnp.clip(kp2.level[res.idx], 0,
                                        self.cfg.n_levels - 1)]
        e1 = jnp.sum((uvp1 - kp1.uv) ** 2, axis=-1)
        e2_ = jnp.sum((uvp2 - kp2.uv[res.idx]) ** 2, axis=-1)
        ok &= (f1 >= 0) & (e1 <= 5.991 * s1)
        ok &= (f2 >= 0) & (e2_ <= 5.991 * s2)
        n_chi2 = cnt(ok)
        # scale consistency (cpp:351-362)
        ratio_dist = d2 / jnp.maximum(d1, 1e-12)
        sf1 = self.scale_factors[jnp.clip(kp1.level, 0,
                                          self.cfg.n_levels - 1)]
        sf2 = self.scale_factors[jnp.clip(kp2.level[res.idx], 0,
                                          self.cfg.n_levels - 1)]
        ratio_oct = sf1 / sf2
        rf = 1.5 * self.cfg.scale_factor
        ok &= (ratio_dist * rf > ratio_oct) & (ratio_dist < ratio_oct * rf)
        # world coordinates
        R1, t1 = arena.kf_R[k_new], arena.kf_t[k_new]
        Xw = (X1 - t1) @ R1
        # diagnostics: per-gate survivor counts (raw epipolar matches,
        # post-parallax, post-depth, post-chi2) for the replenishment
        # analysis (NOTES_TPU round 5)
        gates = jnp.stack([cnt(res.ok), n_par, n_depth, n_chi2])
        return Xw, ok, res.idx, cos_par, gates

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def commit_new_landmarks_multi(self, arena: SM.MapArena, k_new, nb_idx,
                                   Xw, ok, idx2, kf_counter, frame_id):
        """Allocate free landmark slots for the accepted candidates of ALL
        neighbors in one pass and wire observations (k_new row + each
        neighbor's row). Xw/ok/idx2 are (B, N, ...) stacked per neighbor;
        ``ok`` must select at most one neighbor per k_new feature (the
        widest-parallax winner mask). One batched pass replaces B
        sequential commits, each of which re-derived the free-slot order
        over the whole landmark table."""
        B, N = ok.shape
        L = arena.n_lm_cap
        free = ~arena.lm_valid
        # stable free-slot list (cumsum compaction, cheaper than argsort)
        f_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
        slots = jnp.full(L + 1, L, jnp.int32).at[
            jnp.where(free, jnp.minimum(f_rank, L - 1), L)].set(
            jnp.arange(L, dtype=jnp.int32))[:-1]
        n_free = jnp.sum(free.astype(jnp.int32))
        okf = ok.reshape(-1)
        rank = jnp.cumsum(okf.astype(jnp.int32)) - 1
        can = okf & (rank < n_free)
        slot = jnp.where(can, slots[jnp.clip(rank, 0, L - 1)], L)
        pad = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
        Xw_f = Xw.reshape(-1, 3)
        lm_pos = pad(arena.lm_pos).at[slot].set(Xw_f)[:-1]
        lm_valid = pad(arena.lm_valid).at[slot].set(can)[:-1]
        lm_first_kf = pad(arena.lm_first_kf).at[slot].set(
            jnp.asarray(k_new, jnp.int32))[:-1]
        lm_birth = pad(arena.lm_birth).at[slot].set(
            jnp.asarray(kf_counter, jnp.int32))[:-1]
        lm_first_frame = pad(arena.lm_first_frame).at[slot].set(
            jnp.asarray(frame_id, jnp.int32))[:-1]
        lm_visible = pad(arena.lm_visible).at[slot].set(1)[:-1]
        lm_found = pad(arena.lm_found).at[slot].set(1)[:-1]
        # k_new row: the winner mask admits at most one neighbor per
        # feature, so a min-reduce over B picks the allocated slot
        slot_bn = slot.reshape(B, N)
        can_bn = can.reshape(B, N)
        new_slot = jnp.min(jnp.where(can_bn, slot_bn, L), axis=0)  # (N,)
        obs = arena.kf_obs_lm
        row_new = jnp.where(new_slot < L, new_slot, obs[k_new])
        obs = obs.at[k_new].set(row_new)
        for b in range(B):
            row_nb = obs[nb_idx[b]].at[idx2[b]].max(
                jnp.where(can_bn[b], slot_bn[b], SM.NO_LM).astype(
                    jnp.int32))
            obs = obs.at[nb_idx[b]].set(row_nb)
        return arena._replace(
            lm_pos=lm_pos, lm_valid=lm_valid, lm_first_kf=lm_first_kf,
            lm_birth=lm_birth, lm_first_frame=lm_first_frame,
            lm_visible=lm_visible, lm_found=lm_found,
            kf_obs_lm=obs), jnp.sum(can.astype(jnp.int32))

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def commit_new_landmarks(self, arena: SM.MapArena, k_new, k_nb,
                             Xw, ok, idx2, kf_counter, frame_id):
        """Allocate free landmark slots for the accepted candidates and wire
        observations in both keyframes."""
        L = arena.n_lm_cap
        free = ~arena.lm_valid
        # stable order of free slots
        order = jnp.argsort(jnp.where(free, 0, 1),
                            stable=True).astype(jnp.int32)
        n_free = jnp.sum(free.astype(jnp.int32))
        rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
        can = ok & (rank < n_free)
        slot = order[jnp.clip(rank, 0, L - 1)]
        slot = jnp.where(can, slot, L)  # dump
        # write landmark rows
        lm_pos = arena.lm_pos
        pad = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
        lm_pos = pad(arena.lm_pos).at[slot].set(Xw)[:-1]
        lm_valid = pad(arena.lm_valid).at[slot].set(can)[:-1]
        lm_first_kf = pad(arena.lm_first_kf).at[slot].set(
            jnp.asarray(k_new, jnp.int32))[:-1]
        lm_birth = pad(arena.lm_birth).at[slot].set(
            jnp.asarray(kf_counter, jnp.int32))[:-1]
        lm_first_frame = pad(arena.lm_first_frame).at[slot].set(
            jnp.asarray(frame_id, jnp.int32))[:-1]
        lm_visible = pad(arena.lm_visible).at[slot].set(1)[:-1]
        lm_found = pad(arena.lm_found).at[slot].set(1)[:-1]
        # observations in both keyframes
        N = arena.n_feat
        obs = arena.kf_obs_lm
        row_new = jnp.where(can, slot, obs[k_new])
        obs = obs.at[k_new].set(row_new)
        # neighbor: scatter via idx2
        row_nb = obs[k_nb]
        row_nb = row_nb.at[idx2].max(
            jnp.where(can, slot, SM.NO_LM).astype(jnp.int32))
        obs = obs.at[k_nb].set(row_nb)
        return arena._replace(
            lm_pos=lm_pos, lm_valid=lm_valid, lm_first_kf=lm_first_kf,
            lm_birth=lm_birth, lm_first_frame=lm_first_frame,
            lm_visible=lm_visible, lm_found=lm_found,
            kf_obs_lm=obs), jnp.sum(can.astype(jnp.int32))

    # ------------------------------------------------------------------
    # SearchInNeighbors / Fuse (LocalMapping.cpp:388-466,
    # ORBMatcher.cpp:1127-1244)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1,
                       static_argnames=("defer_redirect",))
    def fuse_pair(self, arena: SM.MapArena, k_src, k_dst, cnt=None,
                  defer_redirect: bool = False):
        """Project k_src's landmarks into k_dst; merge duplicates (the
        landmark with more observations wins) or add missing observations.

        cnt: optional precomputed observation counts (one O(K*N) pass per
        mapping step instead of one per fuse call; counts drifting by a few
        fuse merges only affects which duplicate wins a merge).
        defer_redirect: return (arena, redirect) without rewriting the
        observation table — the caller composes redirects across fuse
        calls and applies ONE table rewrite."""
        lm = arena.kf_obs_lm[k_src]
        has = (lm >= 0) & arena.kf_kp_valid[k_src]
        has &= jnp.where(lm >= 0, arena.lm_valid[jnp.maximum(lm, 0)], False)
        lm_s = jnp.maximum(lm, 0)
        Xw = arena.lm_pos[lm_s]
        R, t = arena.kf_R[k_dst], arena.kf_t[k_dst]
        Xc = G.se3_apply(R, t, Xw)
        dist = jnp.linalg.norm(Xc, axis=-1)
        lvl = SM.predict_scale(dist, arena.lm_max_dist[lm_s],
                               self.log_scale, self.cfg.n_levels)
        in_band = ((dist >= 0.8 * arena.lm_min_dist[lm_s])
                   & (dist <= 1.2 * arena.lm_max_dist[lm_s]))
        kp_dst = _kf_keypoints(arena, k_dst)
        res = M.search_by_projection(
            Xc, arena.lm_desc[lm_s], lvl, has & in_band, kp_dst,
            self.cam, self.scale_factors, 3.0,
            level_lo_off=-1, level_hi_off=1, th=self.th_low)
        # matched target feature j: either free (add obs) or holds another
        # landmark (merge: fewer-obs landmark redirected to the other)
        j = res.idx
        tgt_lm = arena.kf_obs_lm[k_dst][j]
        if cnt is None:
            cnt = SM.observation_counts(arena)
        add = res.ok & (tgt_lm < 0)
        row = arena.kf_obs_lm[k_dst]
        row = row.at[jnp.where(add, j, arena.n_feat - 1)].max(
            jnp.where(add, lm, SM.NO_LM).astype(jnp.int32))
        obs = arena.kf_obs_lm.at[k_dst].set(row)
        merge = res.ok & (tgt_lm >= 0) & (tgt_lm != lm)
        tgt_s = jnp.maximum(tgt_lm, 0)
        src_wins = cnt[lm_s] >= cnt[tgt_s]
        loser = jnp.where(src_wins, tgt_s, lm_s)
        winner = jnp.where(src_wins, lm_s, tgt_s)
        redirect = jnp.arange(arena.n_lm_cap, dtype=jnp.int32)
        redirect = redirect.at[jnp.where(merge, loser, 0)].set(
            jnp.where(merge, winner, redirect[0]))
        lm_valid = arena.lm_valid & ~(
            jnp.zeros(arena.n_lm_cap, bool).at[
                jnp.where(merge, loser, 0)].set(merge))
        arena = arena._replace(kf_obs_lm=obs, lm_valid=lm_valid)
        if defer_redirect:
            return arena, redirect
        arena = SM.apply_redirect(arena, redirect)
        return arena

    # ------------------------------------------------------------------
    # Local bundle adjustment (Optimizer::LocalBundleAdjustment,
    # Optimizer.cpp:192-451)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
    def local_ba(self, arena: SM.MapArena, center_kf, max_cams: int = 48,
                 covis=None):
        """BA over the covisible neighborhood of center_kf: top covisible KFs
        are free (except KF 0), other observers of their landmarks are fixed
        anchors; landmarks observed by the free set are optimized.

        The problem is COMPACTED before the solve (the reference's
        LocalBundleAdjustment builds its g2o graph from the local set only,
        Optimizer.cpp:195-310): the <=2*max_cams cameras' landmarks are
        gathered into a fixed max_local_points table so the point system,
        scatter targets, and gauge retraction are O(local), and the reduced
        camera system is solved DIRECTLY (dense Schur + Cholesky) instead
        of by deep sequential CG — measured 4.18 s -> tens of ms per call
        at the Lafida working scale (650^2 faces, 2000 feats, 64k arena)."""
        K, N = arena.n_kf_cap, arena.n_feat
        if covis is None:
            covis = SM.covisibility_matrix(arena)
        w = covis[center_kf]
        w = w.at[center_kf].set(jnp.iinfo(jnp.int32).max)  # center included
        w = jnp.where(arena.kf_valid, w, -1)
        _, cam_idx = jax.lax.top_k(w, max_cams)
        cam_w = w[cam_idx]
        local_valid = cam_w > 0                            # covisible + ctr
        # landmarks seen by local cams
        obs_rows = arena.kf_obs_lm[cam_idx]                # (C,N)
        rows_ok = ((obs_rows >= 0) & arena.kf_kp_valid[cam_idx]
                   & local_valid[:, None])
        lm_ids = jnp.maximum(obs_rows, 0)
        pt_local = jnp.zeros(arena.n_lm_cap + 1, bool).at[
            jnp.where(rows_ok, lm_ids, arena.n_lm_cap)].set(True)[:-1]
        pt_local &= arena.lm_valid
        # fixed anchors: other KFs observing local landmarks. Scored by
        # summed covisibility with the local set (the weights ARE
        # shared-landmark counts, KeyFrame.cpp:315-404) — an exact count
        # of local-POINT sightings would need another O(K*N) table pass
        # (~15 ms on TPU) for the same anchor ranking
        in_local_set = jnp.zeros(K, bool).at[cam_idx].max(local_valid)
        anchor_votes = jnp.sum(
            jnp.where(local_valid[:, None], covis[cam_idx], 0), axis=0)
        anchor_votes = jnp.where(in_local_set | ~arena.kf_valid, 0,
                                 anchor_votes)
        _, fix_idx = jax.lax.top_k(anchor_votes, max_cams)
        fix_valid = anchor_votes[fix_idx] > 0

        all_idx = jnp.concatenate([cam_idx, fix_idx])      # (2C,)
        all_valid = jnp.concatenate([local_valid, fix_valid])
        all_fixed = jnp.concatenate(
            [local_valid & (cam_idx == 0), jnp.ones_like(fix_valid)])
        # gauge guard: if neither KF 0 nor any boundary anchor is in the
        # problem (the whole map became "local"), fix the temporally oldest
        # local KF (by frame id — slots are recycled) — otherwise the
        # window is gauge-free and drifts against the rest of the map.
        # The monocular SCALE gauge (free whenever <=1 camera is fixed) is
        # handled inside bundle_adjust by an exact post-solve retraction.
        has_fixed = jnp.any(all_fixed & all_valid)
        age_key = jnp.where(local_valid, arena.kf_frame_id[cam_idx],
                            jnp.iinfo(jnp.int32).max)
        oldest = jnp.argmin(age_key)
        all_fixed = all_fixed.at[oldest].set(
            all_fixed[oldest] | ~has_fixed)
        # ---- compact the point system to O(local) fixed shapes ----
        L = arena.n_lm_cap
        P = min(int(getattr(self.cfg, "max_local_ba_points", 16384)), L)
        rank = jnp.cumsum(pt_local.astype(jnp.int32)) - 1
        can_pt = pt_local & (rank < P)
        # lm_sel[p] = arena landmark id of compact point p (L = empty)
        lm_sel = jnp.full(P + 1, L, jnp.int32).at[
            jnp.where(can_pt, rank, P)].set(
            jnp.arange(L, dtype=jnp.int32))[:-1]
        pt_ok = lm_sel < L
        lm_sel_s = jnp.minimum(lm_sel, L - 1)
        inv = jnp.full(L + 1, -1, jnp.int32).at[
            jnp.where(pt_ok, lm_sel_s, L)].set(
            jnp.arange(P, dtype=jnp.int32))[:-1]
        X_local = arena.lm_pos[lm_sel_s]

        # gather edges from the 2C keyframe rows
        sub_obs = arena.kf_obs_lm[all_idx]                 # (2C,N)
        sub_ok = ((sub_obs >= 0) & arena.kf_kp_valid[all_idx]
                  & all_valid[:, None])
        sub_lm = jnp.maximum(sub_obs, 0)
        sub_ok &= arena.lm_valid[sub_lm]
        e_pt = inv[sub_lm].reshape(-1)                     # compact ids
        sub_ok = sub_ok.reshape(-1) & (e_pt >= 0)
        e_pt = jnp.maximum(e_pt, 0)
        Csz = all_idx.shape[0]
        e_cam = jnp.repeat(jnp.arange(Csz, dtype=jnp.int32), N)
        e_face = arena.kf_face[all_idx].reshape(-1)
        e_uv = C.cubemap_uv_to_in_face(
            self.cam, arena.kf_uv[all_idx].reshape(-1, 2))
        e_is2 = self.inv_level_sigma2[jnp.clip(
            arena.kf_level[all_idx].reshape(-1), 0,
            self.cfg.n_levels - 1)]
        prob = BAProblem(
            R=arena.kf_R[all_idx], t=arena.kf_t[all_idx],
            cam_fixed=all_fixed, cam_valid=all_valid,
            X=X_local, pt_valid=pt_ok,
            obs_cam=e_cam, obs_pt=e_pt, obs_face=e_face, obs_uv=e_uv,
            obs_inv_sigma2=e_is2, obs_valid=sub_ok)
        out, inl = bundle_adjust(
            self.cam, prob, phase_iters=(5, 10), solver="direct",
            n_free=max_cams,
            max_obs_per_cam=int(getattr(self.cfg,
                                        "max_local_ba_obs_per_cam", 1280)))
        touched = can_pt
        # write back through dump-row scatters: padding entries from top_k
        # can collide with real rows, so anything not meant to write goes to
        # a phantom row K (cameras) / L (landmarks) dropped afterwards.
        upd = all_valid & ~all_fixed
        tgt_upd = jnp.where(upd, all_idx, K)
        pad_rows = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
        kf_R = pad_rows(arena.kf_R).at[tgt_upd].set(out.R)[:-1]
        kf_t = pad_rows(arena.kf_t).at[tgt_upd].set(out.t)[:-1]
        lm_pos = pad_rows(arena.lm_pos).at[
            jnp.where(pt_ok, lm_sel_s, L)].set(out.X)[:-1]
        # remove outlier observations (Optimizer.cpp:401-419)
        kill = sub_ok & ~inl
        obs_rows_new = jnp.where(kill.reshape(Csz, N), SM.NO_LM,
                                 arena.kf_obs_lm[all_idx])
        tgt_obs = jnp.where(all_valid, all_idx, K)
        kf_obs = pad_rows(arena.kf_obs_lm).at[tgt_obs].set(
            obs_rows_new)[:-1]
        return arena._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos,
                              kf_obs_lm=kf_obs), touched

    # ------------------------------------------------------------------
    # Fused per-keyframe mapping step: the whole LocalMapping::Run body
    # (cull -> triangulate -> fuse -> local BA -> KF culling) in ONE device
    # program, with neighbor selection on device. The host dispatches it
    # fire-and-forget after keyframe insertion, so the next frame's
    # extraction/render overlaps with mapping on the host side — the
    # functional-pipeline analog of the reference's LocalMapping thread
    # (System.cpp:108-128).
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7, 8),
                       donate_argnums=1)
    def mapping_step(self, arena: SM.MapArena, slot, kf_counter, frame_id,
                     n_neighbors: int = 6, max_cams: int = 48,
                     run_ba: bool = True, run_cull: bool = True):
        """slot: new keyframe arena row. kf_counter: monotonic keyframe
        count AFTER insertion. frame_id: the keyframe's source frame.

        The covisibility matrix is computed ONCE here and threaded through
        BA and keyframe culling, and landmark statistics refresh only the
        TOUCHED set (new keyframe's rows + fuse neighborhood + BA-moved
        points) — the reference's per-object incremental updates
        (KeyFrame::UpdateConnections, MapPoint::Update*) have no
        full-arena analogs in its per-KF loop either."""
        O = SM.incidence_matrix(arena)
        covis = SM.covisibility_matrix(arena, O=O)
        w = covis[slot].at[slot].set(-1)
        w = jnp.where(arena.kf_valid, w, -1)
        # Triangulation neighbors: top covisible PLUS three keyframes
        # forced at TARGET temporal baselines (closest to 4/8/16 frames
        # back). The reference's top-20 covisible (LocalMapping.cpp:230)
        # spans this range for free at its cadence; a pure-covisibility
        # ranking drifts to over-wide pairs once the tracked set ages
        # (descriptor overlap dies — measured: raw epipolar yield
        # 3400 -> 700), while pure recency under dense insertion picks
        # 1-2-frame pairs whose parallax (< 1.15 deg at scene depth)
        # fails the triangulation gate (measured: 2500 raw -> 200 after
        # the parallax cut). Targeted baselines keep pairs inside the
        # window where BOTH hold (NOTES_TPU round 5).
        big = jnp.int32(1 << 24)
        K_ = arena.n_kf_cap
        # (a baseline/median-depth geometric target was tried and
        # measured WORSE at both scales — the frame-distance targets
        # empirically hold across the shipped configurations)
        fid0 = arena.kf_frame_id[slot]
        chosen = jnp.zeros(K_, bool)
        eligible = arena.kf_valid & (jnp.arange(K_) != slot) \
            & (arena.kf_frame_id < fid0)
        for d in (4, 8, 16):
            c = jnp.abs(arena.kf_frame_id - (fid0 - d))
            c = jnp.where(eligible & ~chosen, c, 1 << 30)
            j = jnp.argmin(c)
            ok_j = c[j] < (1 << 30)
            w = w.at[j].add(jnp.where(ok_j, big, 0))
            chosen = chosen.at[j].set(chosen[j] | ok_j)
        nb_w, nb_idx = jax.lax.top_k(w, n_neighbors)
        nb_idx = nb_idx.astype(jnp.int32)
        nb_ok = nb_w > 0

        cnt0 = SM.observation_counts(arena, O=O)
        arena, n_cull_lm = self.cull_map_points(arena, kf_counter, cnt=cnt0)

        # triangulate against every neighbor IN ONE VMAPPED PROGRAM; keep
        # the widest-parallax winner per feature (committing
        # nearest-neighbor first locks features to near-zero-baseline
        # triangulations)
        Xw_b, ok_b, idx2_b, cos_b, gates_b = jax.vmap(
            lambda nb: self.triangulate_with_neighbor(arena, slot, nb)
        )(nb_idx)
        ok_b &= nb_ok[:, None]
        all_cos = jnp.where(ok_b, cos_b, 2.0)
        winner = jnp.argmin(all_cos, axis=0)
        win_ok = ok_b & (winner[None, :] == jnp.arange(
            n_neighbors)[:, None])
        arena, n_new = self.commit_new_landmarks_multi(
            arena, slot, nb_idx, Xw_b, win_ok, idx2_b,
            kf_counter - 1, frame_id)

        # bidirectional fuse with the top neighbors (SearchInNeighbors);
        # redirects are composed and applied in ONE table rewrite
        ident = jnp.arange(arena.n_lm_cap, dtype=jnp.int32)
        redirect_total = ident
        for i in range(min(4, n_neighbors)):
            def fuse_i(carry, i=i):
                a, red = carry
                a, r1 = self.fuse_pair(a, slot, nb_idx[i], cnt=cnt0,
                                       defer_redirect=True)
                a, r2 = self.fuse_pair(a, nb_idx[i], slot, cnt=cnt0,
                                       defer_redirect=True)
                return a, r2[r1[red]]
            arena, redirect_total = jax.lax.cond(
                nb_ok[i], fuse_i, lambda c: c, (arena, redirect_total))
        arena = SM.apply_redirect(arena, redirect_total)

        # touched set: everything observed by the new KF or its fuse
        # neighborhood (covers triangulations, fuse targets, culled obs)
        rows = jnp.concatenate([jnp.reshape(slot, (1,)).astype(jnp.int32),
                                nb_idx])
        row_obs = arena.kf_obs_lm[rows]
        row_live = (row_obs >= 0) & arena.kf_kp_valid[rows]
        touched = jnp.zeros(arena.n_lm_cap, bool).at[
            jnp.maximum(row_obs, 0).reshape(-1)].max(row_live.reshape(-1))
        stats_caps = dict(
            max_touched=min(max((n_neighbors + 1) * arena.n_feat,
                                int(getattr(self.cfg, "max_local_ba_points",
                                            16384))), arena.n_lm_cap),
            max_obs=min(48 * arena.n_feat,
                        arena.n_kf_cap * arena.n_feat))
        arena = SM.update_landmark_stats_touched(
            arena, self.scale_factors, touched, **stats_caps)
        if run_ba:
            arena, ba_touched = self.local_ba(arena, slot, max_cams,
                                              covis=covis)
            arena = SM.update_landmark_stats_touched(
                arena, self.scale_factors, ba_touched, **stats_caps)
        if run_cull:
            arena, n_culled = self.cull_keyframes(arena, slot, covis=covis)
        else:
            # KF culling amortized to alternate mapping steps (the
            # histogram pass costs ~66 ms at working scale; redundancy
            # accumulates over several keyframes, not one)
            n_culled = jnp.int32(0)
        # first free keyframe slot (or -1) so the host's NeedNewKeyFrame
        # check doesn't have to pull the whole validity mask
        free = ~arena.kf_valid
        first_free = jnp.where(jnp.any(free), jnp.argmax(free), -1)
        # diagnostics (fire-and-forget in production — never fetched; the
        # working-scale debug driver pulls them): new triangulations, live
        # landmark count, live obs in the new KF's row, probation-cull
        # breakdown, gated-vs-raw triangulation yield
        n_live_lm = jnp.sum(arena.lm_valid.astype(jnp.int32))
        row = arena.kf_obs_lm[slot]
        n_row = jnp.sum(((row >= 0) & arena.kf_kp_valid[slot]
                         & arena.lm_valid[jnp.maximum(row, 0)])
                        .astype(jnp.int32))
        g = jnp.sum(gates_b, axis=0)   # (4,) raw/parallax/depth/chi2
        return arena, jnp.stack([
            n_culled, first_free.astype(jnp.int32), n_new, n_live_lm,
            n_row, n_cull_lm[0], n_cull_lm[1],
            g[0], jnp.sum(ok_b.astype(jnp.int32)), g[1], g[2], g[3]])

    # ------------------------------------------------------------------
    # Deferred local BA (LocalMapping.cpp:84-90: BA runs only when the
    # keyframe queue is empty; a new arrival aborts it via mbAbortBA).
    # Dispatched by the host on the first non-inserting frame after a
    # keyframe; a pending BA is dropped when a newer keyframe supersedes
    # it. Splitting BA out of mapping_step also halves the worst-case
    # single-frame device latency (BA and mapping land on different
    # frames' sync windows).
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
    def ba_step(self, arena: SM.MapArena, slot, max_cams: int = 48):
        """local_ba around ``slot`` + touched-landmark stats refresh, as
        one program. No-ops (identity arena) when the slot is no longer a
        valid keyframe (culled or loop-replaced since the deferral)."""
        stats_caps = dict(
            max_touched=min(int(getattr(self.cfg, "max_local_ba_points",
                                        16384)), arena.n_lm_cap),
            max_obs=min(48 * arena.n_feat,
                        arena.n_kf_cap * arena.n_feat))

        def run(arena):
            arena, touched = self.local_ba(arena, slot, max_cams)
            return SM.update_landmark_stats_touched(
                arena, self.scale_factors, touched, **stats_caps)

        return jax.lax.cond(arena.kf_valid[slot], run, lambda a: a, arena)

    # ------------------------------------------------------------------
    # KeyFrameCulling (LocalMapping.cpp:561-619)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
    def cull_keyframes(self, arena: SM.MapArena, center_kf,
                       max_culls: int = 3, covis=None):
        """Cull up to ``max_culls`` redundant keyframes, ONE AT A TIME with
        redundancy recomputed between culls. Redundancy is interdependent —
        two KFs each redundant GIVEN the other must not go in one batch
        (their landmarks would lose all observers). The reference's loop
        erases sequentially and re-reads live observation counts
        (LocalMapping.cpp:561-619).

        The (L, levels) observation-level histogram is built ONCE; each
        round derives the redundancy scores from it and, after a cull,
        subtracts only the culled keyframe's O(N) contribution — instead
        of re-deriving the full O(K*N) one-hot scatter three times."""
        K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
        if covis is None:
            covis = SM.covisibility_matrix(arena)
        local0 = covis[center_kf] >= self.cfg.covisibility_weight_th

        # build the (L, levels) observation-level histogram ONCE (the only
        # O(K*N) pass); every round then works on the <=n_cand CANDIDATE
        # rows only — full-table gathers/scatters cost ~15 ms each on TPU
        # and three rounds of them dominated this stage
        seg0, live0 = SM._flat_obs(arena)
        lev_full = jnp.clip(arena.kf_level.reshape(-1), 0, 15)
        # flat scalar scatter — a (K*N, 16) one-hot operand would be tiled
        # to 128 lanes (8x physical blowup) before the scatter
        hist = jnp.zeros((L + 1) * 16).at[seg0 * 16 + lev_full].add(
            live0.astype(jnp.float32))

        n_cand = min(self.cfg.max_local_keyframes, K)
        cand_w = jnp.where(local0 & arena.kf_valid, covis[center_kf], -1)
        cand_w = cand_w.at[0].set(-1).at[center_kf].set(-1)
        cw, cand_idx = jax.lax.top_k(cand_w, n_cand)
        cand_ok = cw > 0
        rows_obs = arena.kf_obs_lm[cand_idx]                # (C,N)
        rows_lev = jnp.clip(arena.kf_level[cand_idx], 0, 15)
        rows_lm = jnp.maximum(rows_obs, 0)
        rows_live = ((rows_obs >= 0) & arena.kf_kp_valid[cand_idx]
                     & arena.lm_valid[rows_lm] & cand_ok[:, None])
        rows_idx_le = jnp.minimum(rows_lev + 1, 15)

        def one(carry, _):
            kf_valid, hist, n = carry
            ok_r = rows_live & kf_valid[cand_idx][:, None]
            cum = jnp.cumsum(hist.reshape(L + 1, 16)[:-1], axis=1)
            n_le = cum[rows_lm, rows_idx_le]                # (C,N)
            redundant = ok_r & (n_le - 1.0 >= 3.0)
            n_red = jnp.sum(redundant, axis=1)
            n_tot = jnp.sum(ok_r, axis=1)
            frac = n_red.astype(jnp.float32) / jnp.maximum(
                n_tot.astype(jnp.float32), 1.0)
            elig = (cand_ok & kf_valid[cand_idx]
                    & (frac > self.cfg.kf_culling_redundant_ratio))
            worst_c = jnp.argmax(jnp.where(elig, frac, -1.0))
            worst = cand_idx[worst_c]
            any_cull = jnp.any(elig)
            kf_valid = kf_valid.at[worst].set(kf_valid[worst] & ~any_cull)
            # subtract the culled KF's own observations (O(N) scatter)
            row_ok = rows_live[worst_c] & any_cull
            seg_row = jnp.where(row_ok, rows_lm[worst_c], L)
            hist = hist.at[seg_row * 16 + rows_lev[worst_c]].add(
                -row_ok.astype(jnp.float32))
            return (kf_valid, hist, n + any_cull.astype(jnp.int32)), None

        (kf_valid, _, n_culled), _ = jax.lax.scan(
            one, (arena.kf_valid, hist, jnp.int32(0)), None,
            length=max_culls)
        return arena._replace(kf_valid=kf_valid), n_culled
