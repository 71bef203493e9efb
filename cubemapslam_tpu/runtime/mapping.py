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
    def cull_map_points(self, arena: SM.MapArena, current_kf_count):
        """Probation culling of RECENT landmarks only
        (mlpRecentAddedMapPoints, LocalMapping.cpp:175-206): within ~3
        keyframes of creation a landmark must keep found/visible >= 0.25 and
        accumulate >= 2 observations; after that it leaves the probation
        list and these tests never fire again (mature landmarks are removed
        only by BA outlier cuts / fusion)."""
        cnt = SM.observation_counts(arena)
        ratio = arena.lm_found.astype(jnp.float32) / jnp.maximum(
            arena.lm_visible.astype(jnp.float32), 1.0)
        age = current_kf_count - 1 - arena.lm_birth  # in keyframes (counter)
        probation = age <= 3
        bad = arena.lm_valid & probation & (
            (ratio < self.cfg.mp_found_ratio_th)
            | ((age >= 2) & (cnt <= 2)))
        return arena._replace(lm_valid=arena.lm_valid & ~bad)

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
        # parallax between the viewing rays in a COMMON frame (the
        # reference measures the angle at the 3D point between world-frame
        # normals, LocalMapping.cpp:286-300); dotting each camera's
        # LOCAL-frame ray would conflate relative rotation with parallax
        # and reject everything under look-at/orbit motion
        rays2_in1 = rays2 @ R21                           # R21ᵀ per row
        cos_par = jnp.sum(rays1 * rays2_in1, axis=-1)
        ok &= cos_par < 0.9998
        # FOV cheirality both frames (cpp:306-318)
        d1 = jnp.linalg.norm(X1, axis=-1)
        # scale-free depth sanity: at parallax >= ~1.15 deg a true point lies
        # within ~50 baselines; anything beyond is a near-zero-parallax
        # artifact whose reprojection happens to pass both gates
        ok &= d1 <= 50.0 * jnp.linalg.norm(t21)
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
        return Xw, ok, res.idx, cos_par

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

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def fuse_pair(self, arena: SM.MapArena, k_src, k_dst):
        """Project k_src's landmarks into k_dst; merge duplicates (the
        landmark with more observations wins) or add missing observations."""
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
        arena = SM.apply_redirect(arena, redirect)
        return arena

    # ------------------------------------------------------------------
    # Local bundle adjustment (Optimizer::LocalBundleAdjustment,
    # Optimizer.cpp:192-451)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
    def local_ba(self, arena: SM.MapArena, center_kf, max_cams: int = 48):
        """BA over the covisible neighborhood of center_kf: top covisible KFs
        are free (except KF 0), other observers of their landmarks are fixed
        anchors; landmarks observed by the free set are optimized."""
        K, N = arena.n_kf_cap, arena.n_feat
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
        # fixed anchors: other KFs observing local landmarks
        seg, live = SM._flat_obs(arena)
        kf_idx_full = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        sees_local = live & pt_local[jnp.minimum(seg, arena.n_lm_cap - 1)]
        in_local_set = jnp.zeros(K, bool).at[cam_idx].max(local_valid)
        anchor_votes = jnp.zeros(K, jnp.int32).at[kf_idx_full].add(
            sees_local.astype(jnp.int32))
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
        # gather edges from the 2C keyframe rows
        sub_obs = arena.kf_obs_lm[all_idx]                 # (2C,N)
        sub_ok = ((sub_obs >= 0) & arena.kf_kp_valid[all_idx]
                  & all_valid[:, None])
        sub_lm = jnp.maximum(sub_obs, 0)
        sub_ok &= arena.lm_valid[sub_lm]
        sub_ok &= pt_local[sub_lm]
        Csz = all_idx.shape[0]
        e_cam = jnp.repeat(jnp.arange(Csz, dtype=jnp.int32), N)
        e_pt = sub_lm.reshape(-1)
        e_face = arena.kf_face[all_idx].reshape(-1)
        e_uv = C.cubemap_uv_to_in_face(
            self.cam, arena.kf_uv[all_idx].reshape(-1, 2))
        e_is2 = self.inv_level_sigma2[jnp.clip(
            arena.kf_level[all_idx].reshape(-1), 0,
            self.cfg.n_levels - 1)]
        prob = BAProblem(
            R=arena.kf_R[all_idx], t=arena.kf_t[all_idx],
            cam_fixed=all_fixed, cam_valid=all_valid,
            X=arena.lm_pos, pt_valid=pt_local,
            obs_cam=e_cam, obs_pt=e_pt, obs_face=e_face, obs_uv=e_uv,
            obs_inv_sigma2=e_is2, obs_valid=sub_ok.reshape(-1))
        out, inl = bundle_adjust(self.cam, prob, phase_iters=(5, 10),
                                 cg_iters=24)
        # write back through dump-row scatters: padding entries from top_k
        # can collide with real rows, so anything not meant to write goes to
        # a phantom row K that is dropped afterwards.
        upd = all_valid & ~all_fixed
        tgt_upd = jnp.where(upd, all_idx, K)
        pad_rows = lambda a: jnp.concatenate(  # noqa: E731
            [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
        kf_R = pad_rows(arena.kf_R).at[tgt_upd].set(out.R)[:-1]
        kf_t = pad_rows(arena.kf_t).at[tgt_upd].set(out.t)[:-1]
        lm_pos = jnp.where(pt_local[:, None], out.X, arena.lm_pos)
        # remove outlier observations (Optimizer.cpp:401-419)
        kill = sub_ok.reshape(-1) & ~inl
        obs_rows_new = jnp.where(kill.reshape(Csz, N), SM.NO_LM,
                                 arena.kf_obs_lm[all_idx])
        tgt_obs = jnp.where(all_valid, all_idx, K)
        kf_obs = pad_rows(arena.kf_obs_lm).at[tgt_obs].set(
            obs_rows_new)[:-1]
        return arena._replace(kf_R=kf_R, kf_t=kf_t, lm_pos=lm_pos,
                              kf_obs_lm=kf_obs)

    # ------------------------------------------------------------------
    # Fused per-keyframe mapping step: the whole LocalMapping::Run body
    # (cull -> triangulate -> fuse -> local BA -> KF culling) in ONE device
    # program, with neighbor selection on device. The host dispatches it
    # fire-and-forget after keyframe insertion, so the next frame's
    # extraction/render overlaps with mapping on the host side — the
    # functional-pipeline analog of the reference's LocalMapping thread
    # (System.cpp:108-128).
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 5, 6, 7),
                       donate_argnums=1)
    def mapping_step(self, arena: SM.MapArena, slot, kf_counter, frame_id,
                     n_neighbors: int = 6, max_cams: int = 48,
                     run_ba: bool = True):
        """slot: new keyframe arena row. kf_counter: monotonic keyframe
        count AFTER insertion. frame_id: the keyframe's source frame."""
        covis = SM.covisibility_matrix(arena)
        w = covis[slot].at[slot].set(-1)
        w = jnp.where(arena.kf_valid, w, -1)
        nb_w, nb_idx = jax.lax.top_k(w, n_neighbors)
        nb_idx = nb_idx.astype(jnp.int32)
        nb_ok = nb_w > 0

        arena = self.cull_map_points(arena, kf_counter)

        # triangulate against every neighbor; keep the widest-parallax
        # winner per feature (committing nearest-neighbor first locks
        # features to near-zero-baseline triangulations)
        cands = []
        for i in range(n_neighbors):
            Xw, ok, idx2, cos_par = self.triangulate_with_neighbor(
                arena, slot, nb_idx[i])
            ok &= nb_ok[i]
            cands.append((Xw, ok, idx2, jnp.where(ok, cos_par, 2.0)))
        all_cos = jnp.stack([c[3] for c in cands])
        winner = jnp.argmin(all_cos, axis=0)
        for i, (Xw, ok, idx2, _) in enumerate(cands):
            arena, _ = self.commit_new_landmarks(
                arena, slot, nb_idx[i], Xw, ok & (winner == i), idx2,
                kf_counter - 1, frame_id)

        # bidirectional fuse with the top neighbors (SearchInNeighbors)
        for i in range(min(4, n_neighbors)):
            def fuse_i(a, i=i):
                a = self.fuse_pair(a, slot, nb_idx[i])
                return self.fuse_pair(a, nb_idx[i], slot)
            arena = jax.lax.cond(nb_ok[i], fuse_i, lambda a: a, arena)

        arena = SM.update_landmark_stats(arena, self.scale_factors)
        if run_ba:
            arena = self.local_ba(arena, slot, max_cams)
            arena = SM.update_landmark_stats(arena, self.scale_factors)
        arena, n_culled = self.cull_keyframes(arena, slot)
        # first free keyframe slot (or -1) so the host's NeedNewKeyFrame
        # check doesn't have to pull the whole validity mask
        free = ~arena.kf_valid
        first_free = jnp.where(jnp.any(free), jnp.argmax(free), -1)
        return arena, jnp.stack([n_culled, first_free.astype(jnp.int32)])

    # ------------------------------------------------------------------
    # KeyFrameCulling (LocalMapping.cpp:561-619)
    # ------------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
    def cull_keyframes(self, arena: SM.MapArena, center_kf,
                       max_culls: int = 3):
        """Cull up to ``max_culls`` redundant keyframes, ONE AT A TIME with
        redundancy recomputed between culls. Redundancy is interdependent —
        two KFs each redundant GIVEN the other must not go in one batch
        (their landmarks would lose all observers). The reference's loop
        erases sequentially and re-reads live observation counts
        (LocalMapping.cpp:561-619); a few sequential rounds per mapping
        step keep pace with one insertion per frame."""
        local0 = SM.covisibility_matrix(arena)[center_kf] \
            >= self.cfg.covisibility_weight_th

        def one(carry, _):
            kf_valid, n = carry
            a = arena._replace(kf_valid=kf_valid)
            n_red, n_tot = SM.redundant_keyframe_scores(a)
            frac = n_red.astype(jnp.float32) / jnp.maximum(
                n_tot.astype(jnp.float32), 1.0)
            elig = (local0 & kf_valid
                    & (frac > self.cfg.kf_culling_redundant_ratio))
            elig = elig.at[0].set(False).at[center_kf].set(False)
            worst = jnp.argmax(jnp.where(elig, frac, -1.0))
            any_cull = jnp.any(elig)
            kf_valid = kf_valid.at[worst].set(kf_valid[worst] & ~any_cull)
            return (kf_valid, n + any_cull.astype(jnp.int32)), None

        (kf_valid, n_culled), _ = jax.lax.scan(
            one, (arena.kf_valid, jnp.int32(0)), None, length=max_culls)
        return arena._replace(kf_valid=kf_valid), n_culled
