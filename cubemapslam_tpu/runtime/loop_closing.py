"""Loop detection, Sim3 computation, and loop correction.

Re-implements the LoopClosing thread (src/LoopClosing.cpp): DetectLoop with
the 3-consecutive-keyframe covisibility-consistency check (cpp:102-228),
ComputeSim3 (SearchByBoW -> Sim3 RANSAC -> OptimizeSim3 -> Scw-projection
acceptance, cpp:230-399), and CorrectLoop (Sim3 propagation to the covisible
neighborhood, landmark remap + fusion, essential-graph optimization,
cpp:401-584) — as jitted stages + a small host consistency tracker. The
spanning tree of the reference is replaced by the sequential keyframe chain
(consecutive KFs are covisible by construction), and the transient global-BA
thread becomes an explicit distributed-BA call.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu import place as PL
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.optim.pose_graph import optimize_essential_graph
from cubemapslam_tpu.optim.sim3_opt import optimize_sim3
from cubemapslam_tpu.solvers.sim3 import sim3_ransac


class LoopKernels:
    def __init__(self, cfg, cam):
        import math
        self.cfg = cfg
        self.cam = cam
        self.level_sigma2 = jnp.asarray(cfg.level_sigma2, jnp.float32)
        self.inv_level_sigma2 = 1.0 / self.level_sigma2
        self.scale_factors = jnp.asarray(cfg.scale_factors, jnp.float32)
        self.log_scale = math.log(cfg.scale_factor)

    @functools.partial(jax.jit, static_argnums=0)
    def detect_candidates_fused(self, arena: SM.MapArena, bow_table, slot):
        """DetectLoop phase 1 on device (LoopClosing.cpp:110-149): covisible
        exclusion set, minScore from covisible BoW scores, candidate
        selection — one program, one small fetch. Returns (cand_idx (8,),
        cand_ok (8,), cand_groups (8,K) candidate covisibility groups incl.
        self, for the host's 3-consecutive-KF consistency bookkeeping)."""
        covis = SM.covisibility_matrix(arena)
        nb = (covis[slot] >= self.cfg.covisibility_weight_th) \
            & arena.kf_valid
        exclude = nb.at[slot].set(True)
        scores = PL.bow_scores(bow_table[slot], bow_table)
        has_nb = jnp.any(nb)
        min_score = jnp.where(
            has_nb, jnp.min(jnp.where(nb, scores, jnp.inf)), 0.0)
        cand_idx, cand_ok = PL.detect_candidates(
            bow_table[slot], bow_table, arena.kf_valid, exclude, covis,
            min_score.astype(jnp.float32))
        groups = covis[cand_idx] > 0                       # (8,K)
        groups = groups.at[jnp.arange(cand_idx.shape[0]),
                           cand_idx].set(True)
        return cand_idx, cand_ok, groups

    @functools.partial(jax.jit, static_argnums=0)
    def match_kf_pair(self, arena: SM.MapArena, k1, k2):
        """Landmark-feature matching between two keyframes (the SearchByBoW
        KF-KF variant, ORBMatcher.cpp:541-674, as a full gated matmul).
        Returns per-k1-feature index into k2 (+ok)."""
        d1 = arena.kf_desc[k1]
        d2 = arena.kf_desc[k2]
        lm1 = arena.kf_obs_lm[k1]
        lm2 = arena.kf_obs_lm[k2]
        has1 = (lm1 >= 0) & arena.kf_kp_valid[k1]
        has1 &= jnp.where(lm1 >= 0, arena.lm_valid[jnp.maximum(lm1, 0)],
                          False)
        has2 = (lm2 >= 0) & arena.kf_kp_valid[k2]
        has2 &= jnp.where(lm2 >= 0, arena.lm_valid[jnp.maximum(lm2, 0)],
                          False)
        dist = M.hamming_matrix(M.unpack_descriptors(d1),
                                M.unpack_descriptors(d2))
        gate = has1[:, None] & has2[None, :]
        best_idx, best, _, second = M._masked_top2(dist, gate)
        ok = (best <= self.cfg.th_low) & (best < 0.75 * second)
        ok = M.rotation_consistency(arena.kf_angle[k1],
                                    arena.kf_angle[k2][best_idx], ok,
                                    bin_deg=float(self.cfg.histo_length))
        ok = M.resolve_one_to_one(best_idx, best, ok, arena.n_feat)
        return best_idx, ok

    @functools.partial(jax.jit, static_argnums=0)
    def search_by_sim3(self, arena: SM.MapArena, k1, k2,
                       s12, R12, t12, idx2_in, ok_in):
        """Widen KF-KF landmark matches using a computed Sim3
        (SearchBySim3, ORBMatcher.cpp:1365-1586 — mutual-agreement variant,
        without the line-1507 z-component typo): project each KF's landmarks
        into the other through S12/S21 (radius 7.5*scale at the predicted
        level, TH_HIGH) and accept bidirectional agreements; merge them into
        the existing per-k1-feature matches (already-matched features are
        excluded from both directions, cpp:1392-1404)."""
        from cubemapslam_tpu.runtime.mapping import _kf_keypoints
        N = arena.n_feat
        kp1 = _kf_keypoints(arena, k1)
        kp2 = _kf_keypoints(arena, k2)
        lm1 = arena.kf_obs_lm[k1]
        lm2 = arena.kf_obs_lm[k2]
        has1 = (lm1 >= 0) & arena.kf_kp_valid[k1]
        has1 &= jnp.where(lm1 >= 0, arena.lm_valid[jnp.maximum(lm1, 0)],
                          False)
        has2 = (lm2 >= 0) & arena.kf_kp_valid[k2]
        has2 &= jnp.where(lm2 >= 0, arena.lm_valid[jnp.maximum(lm2, 0)],
                          False)
        # already-matched exclusions from the input match set
        am1 = ok_in
        am2 = jnp.zeros(N, bool).at[idx2_in].max(ok_in)
        lm1s = jnp.maximum(lm1, 0)
        lm2s = jnp.maximum(lm2, 0)

        # direction A: KF2 landmarks -> KF1 features (queries are kf2 feats)
        X2c2 = G.se3_apply(arena.kf_R[k2], arena.kf_t[k2],
                           arena.lm_pos[lm2s])
        X2c1 = G.sim3_apply(s12, R12, t12, X2c2)
        d_a = jnp.linalg.norm(X2c1, axis=-1)
        lvl_a = SM.predict_scale(d_a, arena.lm_max_dist[lm2s],
                                 self.log_scale, self.cfg.n_levels)
        resA = M.search_by_projection(
            X2c1, arena.lm_desc[lm2s], lvl_a, has2 & ~am2, kp1,
            self.cam, self.scale_factors, 7.5,
            level_lo_off=-1, level_hi_off=0, th=float(self.cfg.th_high))
        # direction B: KF1 landmarks -> KF2 features
        S21 = G.sim3_inverse(s12, R12, t12)
        X1c1 = G.se3_apply(arena.kf_R[k1], arena.kf_t[k1],
                           arena.lm_pos[lm1s])
        X1c2 = G.sim3_apply(*S21, X1c1)
        d_b = jnp.linalg.norm(X1c2, axis=-1)
        lvl_b = SM.predict_scale(d_b, arena.lm_max_dist[lm1s],
                                 self.log_scale, self.cfg.n_levels)
        resB = M.search_by_projection(
            X1c2, arena.lm_desc[lm1s], lvl_b, has1 & ~am1, kp2,
            self.cam, self.scale_factors, 7.5,
            level_lo_off=-1, level_hi_off=0, th=float(self.cfg.th_high))
        # agreement (cpp:1567-1584): kf1 feature i is accepted when
        # direction B matched it to kf2 feature j AND direction A matched
        # that same j back to i. resA is indexed by kf2 feature (query j),
        # resA.idx[j] = kf1 feature it matched.
        a_match_of_j = jnp.where(resA.ok, resA.idx, -1)   # kf2 j -> kf1 i
        agree = resB.ok & (a_match_of_j[resB.idx] ==
                           jnp.arange(N, dtype=jnp.int32))
        idx2_out = jnp.where(ok_in, idx2_in,
                             jnp.where(agree, resB.idx, 0))
        ok_out = ok_in | agree
        return idx2_out, ok_out

    @functools.partial(jax.jit, static_argnums=0)
    def sim3_candidates(self, arena: SM.MapArena, k1, k2, idx2, ok):
        """Matched landmark pairs in each KF's camera frame for the Sim3
        solver (Sim3Solver ctor, Sim3Solver.cpp:41-136)."""
        lm1 = jnp.maximum(arena.kf_obs_lm[k1], 0)
        lm2 = jnp.maximum(arena.kf_obs_lm[k2][idx2], 0)
        X1w = arena.lm_pos[lm1]
        X2w = arena.lm_pos[lm2]
        p1 = G.se3_apply(arena.kf_R[k1], arena.kf_t[k1], X1w)
        p2 = G.se3_apply(arena.kf_R[k2], arena.kf_t[k2], X2w)
        uv1 = arena.kf_uv[k1]
        uv2 = arena.kf_uv[k2][idx2]
        s1 = self.level_sigma2[jnp.clip(arena.kf_level[k1], 0,
                                        self.cfg.n_levels - 1)]
        lev2 = arena.kf_level[k2][idx2]
        s2 = self.level_sigma2[jnp.clip(lev2, 0, self.cfg.n_levels - 1)]
        return p1, p2, uv1, uv2, s1, s2

    @functools.partial(jax.jit, static_argnums=0)
    def refine_sim3(self, arena: SM.MapArena, k1, k2, idx2, ok,
                    s12, R12, t12):
        """OptimizeSim3 over the matched pairs (Optimizer.cpp:888-1091)."""
        p1, p2, uv1, uv2, s1, s2 = self.sim3_candidates(arena, k1, k2,
                                                        idx2, ok)
        uv1f = C.cubemap_uv_to_in_face(self.cam, uv1)
        uv2f = C.cubemap_uv_to_in_face(self.cam, uv2)
        f1 = arena.kf_face[k1]
        f2 = arena.kf_face[k2][idx2]
        return optimize_sim3(
            self.cam, s12, R12, t12, p1, p2, uv1f, f1, uv2f, f2,
            1.0 / s1, 1.0 / s2, ok, th2=10.0, fix_scale=False)

    @functools.partial(jax.jit, static_argnums=0)
    def scw_project(self, arena: SM.MapArena, k_cur, k_loop,
                    s_cl, R_cl, t_cl, idx2, ok):
        """Project the loop-neighborhood landmarks through the corrected
        S_cw into the current keyframe and count total loop matches — the
        >=40 acceptance gate (LoopClosing.cpp:340-399; projection variant
        ORBMatcher.cpp:796-903: radius 10*scale at the predicted level,
        TH_LOW). Returns (per-current-feature loop-landmark id or -1,
        total match count)."""
        from cubemapslam_tpu.runtime.mapping import _kf_keypoints
        K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
        covis = SM.covisibility_matrix(arena)
        nb = (covis[k_loop] >= self.cfg.covisibility_weight_th) \
            & arena.kf_valid
        nb = nb.at[k_loop].set(True)
        # loop landmark set: union of the neighborhood's observations
        obs = arena.kf_obs_lm
        obs_ok = (obs >= 0) & arena.kf_kp_valid & nb[:, None]
        member = jnp.zeros(L + 1, bool).at[
            jnp.where(obs_ok, obs, L)].set(True)[:-1]
        member &= arena.lm_valid
        # existing matches from the refined Sim3 set: current feature i ->
        # loop-KF feature idx2[i] -> its landmark
        lm_loop_row = arena.kf_obs_lm[k_loop]
        cur_match = jnp.where(ok, lm_loop_row[idx2], SM.NO_LM)
        cur_match = jnp.where(
            (cur_match >= 0)
            & arena.lm_valid[jnp.maximum(cur_match, 0)],
            cur_match, SM.NO_LM)
        already = jnp.zeros(L + 1, bool).at[
            jnp.where(cur_match >= 0, cur_match, L)].set(True)[:-1]
        # corrected S_cw = S_cl o T_loop_w
        S_cw = G.sim3_compose(
            s_cl, R_cl, t_cl,
            jnp.ones(()), arena.kf_R[k_loop], arena.kf_t[k_loop])
        Xc = G.sim3_apply(*S_cw, arena.lm_pos)          # (L,3)
        d = jnp.linalg.norm(Xc, axis=-1)
        lvl = SM.predict_scale(d, arena.lm_max_dist,
                               self.log_scale, self.cfg.n_levels)
        kp_cur = _kf_keypoints(arena, k_cur)
        target_free = cur_match < 0
        res = M.search_by_projection(
            Xc, arena.lm_desc, lvl, member & ~already, kp_cur,
            self.cam, self.scale_factors, 10.0,
            level_lo_off=-1, level_hi_off=0, th=float(self.cfg.th_low),
            target_free=target_free)
        loop_assoc = cur_match.at[res.idx].max(
            jnp.where(res.ok, jnp.arange(L, dtype=jnp.int32), SM.NO_LM))
        total = jnp.sum((loop_assoc >= 0).astype(jnp.int32))
        return loop_assoc, total

    @functools.partial(jax.jit, static_argnums=(0, 2))
    def loop_member_landmarks(self, arena: SM.MapArena, max_sel: int,
                              k_loop):
        """Compact the loop neighborhood's landmark set (mvpLoopMapPoints,
        LoopClosing.cpp:306-320: union of the loop KF + its covisible
        neighbors' observations) to a fixed-size index list."""
        L = arena.n_lm_cap
        covis = SM.covisibility_matrix(arena)
        nb = (covis[k_loop] >= self.cfg.covisibility_weight_th) \
            & arena.kf_valid
        nb = nb.at[k_loop].set(True)
        obs = arena.kf_obs_lm
        obs_ok = (obs >= 0) & arena.kf_kp_valid & nb[:, None]
        member = jnp.zeros(L + 1, bool).at[
            jnp.where(obs_ok, obs, L)].set(True)[:-1]
        member &= arena.lm_valid
        score = jnp.where(member, 1.0, -1.0)
        val, sel = jax.lax.top_k(score, min(max_sel, L))
        return sel.astype(jnp.int32), val > 0

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def search_and_fuse(self, arena: SM.MapArena, neigh_idx, neigh_ok,
                        sel, sel_ok):
        """Project the loop landmark set into EVERY corrected keyframe and
        fuse duplicates with loop-landmark-wins Replace semantics
        (LoopClosing::SearchAndFuse, cpp:586-612 + ORBMatcher::Fuse(Scw)
        radius 4): a matched feature already holding a different landmark
        has it REPLACED by the loop landmark; a free feature gains the
        observation. neigh_idx: fixed-size corrected-KF slots (masked by
        neigh_ok); sel/sel_ok: compacted loop landmark ids."""
        L = arena.n_lm_cap

        def body(i, arena):
            k = neigh_idx[i]
            valid_kf = neigh_ok[i] & arena.kf_valid[k]
            ok_q = sel_ok & arena.lm_valid[sel] & valid_kf
            Xw = arena.lm_pos[sel]
            Xc = G.se3_apply(arena.kf_R[k], arena.kf_t[k], Xw)
            d = jnp.linalg.norm(Xc, axis=-1)
            lvl = SM.predict_scale(d, arena.lm_max_dist[sel],
                                   self.log_scale, self.cfg.n_levels)
            in_band = ((d >= 0.8 * arena.lm_min_dist[sel])
                       & (d <= 1.2 * arena.lm_max_dist[sel]))
            from cubemapslam_tpu.runtime.mapping import _kf_keypoints
            kp_dst = _kf_keypoints(arena, k)
            res = M.search_by_projection(
                Xc, arena.lm_desc[sel], lvl, ok_q & in_band, kp_dst,
                self.cam, self.scale_factors, 4.0,
                level_lo_off=-1, level_hi_off=1,
                th=float(self.cfg.th_low))
            j = res.idx
            lm_q = sel
            row = arena.kf_obs_lm[k]
            tgt = row[j]
            # skip queries whose landmark is already in this row (self-fuse)
            add = res.ok & (tgt < 0)
            merge = res.ok & (tgt >= 0) & (tgt != lm_q)
            row_new = row.at[jnp.where(add, j, arena.n_feat - 1)].max(
                jnp.where(add, lm_q, SM.NO_LM).astype(jnp.int32))
            obs = arena.kf_obs_lm.at[k].set(row_new)
            loser = jnp.maximum(tgt, 0)
            winner = lm_q
            redirect = jnp.arange(L, dtype=jnp.int32)
            redirect = redirect.at[jnp.where(merge, loser, 0)].set(
                jnp.where(merge, winner, redirect[0]))
            dead = jnp.zeros(L, bool).at[
                jnp.where(merge, loser, 0)].set(merge)
            arena = arena._replace(kf_obs_lm=obs,
                                   lm_valid=arena.lm_valid & ~dead)
            return SM.apply_redirect(arena, redirect)

        return jax.lax.fori_loop(0, neigh_idx.shape[0], body, arena)

    @functools.partial(jax.jit, static_argnums=0, donate_argnums=1)
    def loop_fuse(self, arena: SM.MapArena, k_cur, loop_assoc):
        """Fuse the matched loop landmarks into the current keyframe
        (CorrectLoop, LoopClosing.cpp:519-536): a current feature holding a
        different landmark has it REPLACED by the loop landmark (the loop
        point survives, MapPoint::Replace semantics); a free feature gains
        the observation."""
        L = arena.n_lm_cap
        row = arena.kf_obs_lm[k_cur]
        has_loop = loop_assoc >= 0
        new_row = jnp.where(has_loop, loop_assoc, row)
        obs = arena.kf_obs_lm.at[k_cur].set(new_row)
        merge = has_loop & (row >= 0) & (row != loop_assoc)
        loser = jnp.maximum(row, 0)
        winner = jnp.maximum(loop_assoc, 0)
        redirect = jnp.arange(L, dtype=jnp.int32)
        redirect = redirect.at[jnp.where(merge, loser, 0)].set(
            jnp.where(merge, winner, redirect[0]))
        dead = jnp.zeros(L, bool).at[jnp.where(merge, loser, 0)].set(merge)
        arena = arena._replace(kf_obs_lm=obs,
                               lm_valid=arena.lm_valid & ~dead)
        return SM.apply_redirect(arena, redirect)

    @functools.partial(jax.jit, static_argnums=0)
    def propagate_and_pose_graph(self, arena: SM.MapArena,
                                 k_cur, k_loop,
                                 s_cl, R_cl, t_cl,
                                 neigh_pre: jnp.ndarray,
                                 loop_i, loop_j, loop_valid):
        """CorrectLoop core (LoopClosing.cpp:442-584 +
        OptimizeEssentialGraph): seed the current KF with the corrected Sim3
        S_cw = S_cl * T_lw, propagate through its covisible set, run the
        essential-graph optimization over loop + chain + covisibility edges,
        recover SE3 poses and remap all landmarks.

        (s_cl, R_cl, t_cl): Sim3 mapping loop-KF camera frame -> current-KF
        camera frame. neigh_pre: (K,) bool — the current KF's covisible set
        measured BEFORE loop fusion (mvpCurrentConnectedKFs): loop fusion
        links the current KF to the loop side, and propagating the
        correction into that side would corrupt it. loop_i/j: previous loop
        edges (fixed-size, masked).
        """
        K = arena.n_kf_cap
        ones = jnp.ones(K)
        # current vertices from SE3 (scale 1)
        s_v = ones
        R_v = arena.kf_R
        t_v = arena.kf_t
        # corrected Sim3 of the current KF: S_cw = S_cl ∘ T_lw
        S_lw = (jnp.ones(()), arena.kf_R[k_loop], arena.kf_t[k_loop])
        S_cw_corr = G.sim3_compose(s_cl, R_cl, t_cl, *S_lw)
        # propagate to the PRE-FUSION covisible KFs of k_cur:
        # S_iw_corr = (T_ic) ∘ S_cw_corr
        covis = SM.covisibility_matrix(arena)
        neigh = neigh_pre & arena.kf_valid
        neigh = neigh.at[k_cur].set(True)
        T_cw_inv = G.se3_inverse(arena.kf_R[k_cur], arena.kf_t[k_cur])
        R_ic = jnp.einsum("kij,jl->kil", arena.kf_R, T_cw_inv[0])
        t_ic = (jnp.einsum("kij,j->ki", arena.kf_R, T_cw_inv[1])
                + arena.kf_t)
        S_iw_corr = G.sim3_compose(
            ones, R_ic, t_ic,
            jnp.broadcast_to(S_cw_corr[0], (K,)),
            jnp.broadcast_to(S_cw_corr[1], (K, 3, 3)),
            jnp.broadcast_to(S_cw_corr[2], (K, 3)))
        s_v = jnp.where(neigh, S_iw_corr[0], s_v)
        R_v = jnp.where(neigh[:, None, None], S_iw_corr[1], R_v)
        t_v = jnp.where(neigh[:, None], S_iw_corr[2], t_v)

        # remap landmarks of the corrected neighborhood through
        # S_old -> S_corr (LoopClosing.cpp:462-500). Owner = the landmark's
        # REFERENCE keyframe: the first live KF still observing it (the
        # reference remaps via mpRefKF; the creator may have been culled or
        # sit outside the corrected set), falling back to the creator.
        seg, live = SM._flat_obs(arena)
        kf_of = jnp.repeat(jnp.arange(K, dtype=jnp.int32), arena.n_feat)
        ref_raw = SM.reference_keyframes(arena, seg, live, kf_of)
        own = jnp.where(ref_raw < K, ref_raw,
                        jnp.clip(arena.lm_first_kf, 0, K - 1))
        owned_by_neigh = neigh[own] & arena.lm_valid
        p_cam = G.se3_apply(arena.kf_R[own], arena.kf_t[own], arena.lm_pos)
        S_inv = G.sim3_inverse(S_iw_corr[0][own], S_iw_corr[1][own],
                               S_iw_corr[2][own])
        lm_new = G.sim3_apply(*S_inv, p_cam)
        lm_pos = jnp.where(owned_by_neigh[:, None], lm_new, arena.lm_pos)

        # ----- essential graph edges (Optimizer.cpp:700-780) -----
        # chain edges (spanning-tree substitute; consecutive KFs are
        # covisible by construction), in TEMPORAL order: keyframe slots are
        # recycled, so successors are found by sorting valid slots by
        # frame id, not by slot index
        idx = jnp.arange(K, dtype=jnp.int32)
        ordkey = jnp.where(arena.kf_valid, arena.kf_frame_id,
                           jnp.iinfo(jnp.int32).max)
        order = jnp.argsort(ordkey).astype(jnp.int32)
        chain_i = order
        chain_j = jnp.roll(order, -1)
        chain_ok = (arena.kf_valid[chain_i] & arena.kf_valid[chain_j]
                    & (idx + 1 < K))
        # ALL covisibility edges with weight >= essential_graph_min_weight
        # (minFeat=100): the full upper triangle, masked — the reference
        # inserts every such pair, not a per-KF top-k
        cov_i = jnp.repeat(idx, K)
        cov_j = jnp.tile(idx, K)
        cov_w = covis.reshape(-1)
        cov_ok = ((cov_w >= self.cfg.essential_graph_min_weight)
                  & arena.kf_valid[cov_i] & arena.kf_valid[cov_j]
                  & (cov_i < cov_j))
        # the new loop edge
        new_i = jnp.asarray([k_cur], jnp.int32)
        new_j = jnp.asarray([k_loop], jnp.int32)
        new_ok = jnp.asarray([True])

        e_i = jnp.concatenate([chain_i, cov_i, loop_i, new_i])
        e_j = jnp.concatenate([chain_j, cov_j, loop_j, new_j])
        e_ok = jnp.concatenate([chain_ok, cov_ok, loop_valid, new_ok])

        # Measurement selection (Optimizer.cpp:636-780 semantics): edges
        # WITHIN the corrected neighborhood or within the untouched rest
        # measure the ORIGINAL relative poses (NonCorrectedSim3) so local
        # structure is preserved; edges CROSSING the boundary are loop
        # connections (created by loop fusion) and measure the relative pose
        # of the SEEDED vertices (CorrectedSim3), pulling the loop shut.
        def meas_orig(i, j):
            Si = (jnp.ones(()), arena.kf_R[i], arena.kf_t[i])
            Sj = (jnp.ones(()), arena.kf_R[j], arena.kf_t[j])
            return G.sim3_compose(*Sj, *G.sim3_inverse(*Si))

        def meas_seed(i, j):
            Si = (s_v[i], R_v[i], t_v[i])
            Sj = (s_v[j], R_v[j], t_v[j])
            return G.sim3_compose(*Sj, *G.sim3_inverse(*Si))

        m_orig = jax.vmap(meas_orig)(e_i, e_j)
        m_seed = jax.vmap(meas_seed)(e_i, e_j)
        # only COVISIBILITY edges crossing the boundary are loop
        # connections; the temporal chain crossing the boundary (the drift
        # path into the corrected region) keeps its original measurement so
        # the correction distributes along it instead of snapping at it
        n_chain = chain_i.shape[0]
        n_cov = cov_i.shape[0]
        is_covis = jnp.zeros(e_i.shape[0], bool).at[
            n_chain:n_chain + n_cov].set(True)
        cross = is_covis & (neigh[e_i] != neigh[e_j])
        ms = jnp.where(cross, m_seed[0], m_orig[0])
        mR = jnp.where(cross[:, None, None], m_seed[1], m_orig[1])
        mt = jnp.where(cross[:, None], m_seed[2], m_orig[2])
        # the new loop edge measurement: S_ji between loop and current from
        # the computed Sim3: S_loop_cur = S_cl^-1 (maps cur->loop); equals
        # the seeded cross measurement, set explicitly for clarity
        S_lc = G.sim3_inverse(s_cl, R_cl, t_cl)
        n_edges = e_i.shape[0]
        ms = ms.at[n_edges - 1].set(S_lc[0])
        mR = mR.at[n_edges - 1].set(S_lc[1])
        mt = mt.at[n_edges - 1].set(S_lc[2])

        fixed = jnp.zeros(K, bool).at[k_loop].set(True)
        s_o, R_o, t_o = optimize_essential_graph(
            s_v, R_v, t_v, arena.kf_valid, fixed, e_i, e_j,
            ms, mR, mt, e_ok, n_iters=12)

        # recover SE3 (t/s) and remap all landmarks old->new
        # (Optimizer.cpp:840-886)
        p_cam_all = G.se3_apply(arena.kf_R[own], arena.kf_t[own], lm_pos)
        S_new_inv = G.sim3_inverse(s_o[own], R_o[own], t_o[own])
        lm_pos_final = jnp.where(
            arena.lm_valid[:, None],
            G.sim3_apply(*S_new_inv, p_cam_all), lm_pos)
        kf_R_new = R_o
        kf_t_new = t_o / jnp.maximum(s_o[:, None], 1e-12)
        arena = arena._replace(
            kf_R=jnp.where(arena.kf_valid[:, None, None], kf_R_new,
                           arena.kf_R),
            kf_t=jnp.where(arena.kf_valid[:, None], kf_t_new, arena.kf_t),
            lm_pos=lm_pos_final)
        return arena


class LoopCloser:
    """Host-side loop-closing state machine (consistency tracking + flow)."""

    def __init__(self, cfg, cam, kernels, mapping):
        self.cfg = cfg
        self.cam = cam
        self.k = LoopKernels(cfg, cam)
        self.mapping = mapping
        self.consistency_th = 3       # mnCovisibilityConsistencyTh (cpp:43)
        self.consistent_groups: List[Tuple[Set[int], int]] = []
        self.last_loop_counter = -100  # keyframe COUNTER at the last loop
        self.loop_edges: List[Tuple[int, int]] = []
        # phase wall times (seconds), appended per event — the
        # working-scale loop-closure timing artifact (SURVEY §5 tracing):
        # detect / sim3 (match+RANSAC+refine+Scw) / correct (fuse + pose
        # graph + SearchAndFuse + stats) / gba
        self.timings: dict = {}

    def _lap(self, name, t0):
        import time as _t
        now = _t.perf_counter()
        self.timings.setdefault(name, []).append(now - t0)
        return now

    def reset(self):
        self.consistent_groups = []
        self.last_loop_counter = -100
        self.loop_edges = []

    def process(self, system, slot: int) -> bool:
        """DetectLoop + ComputeSim3 + CorrectLoop for a new keyframe.
        Returns True if a loop was closed."""
        arena = system.arena
        # >=10 keyframes total and since the last loop (LoopClosing.cpp:
        # 110-118) — measured on the monotonic counter, slots are recycled
        if system.n_kf < 10 or system.n_kf - self.last_loop_counter < 10:
            return False
        # detection phase on device, one fetch (exclusion set, minScore,
        # candidate selection, candidate covisibility groups)
        import time as _t
        t0 = _t.perf_counter()
        cand_idx_d, cand_ok_d, groups_d = self.k.detect_candidates_fused(
            arena, system.bow_table, jnp.int32(slot))
        cand_ok = np.asarray(cand_ok_d)
        t0 = self._lap("detect", t0)
        import os as _os
        if _os.environ.get("CUBEMAP_LOOP_DEBUG"):
            print(f"#loop kf={system.n_kf} slot={slot} "
                  f"cands={int(cand_ok.sum())} "
                  f"groups={len(self.consistent_groups)}", flush=True)
        if not cand_ok.any():
            self.consistent_groups = []
            return False
        cand_idx = np.asarray(cand_idx_d)[cand_ok]
        cand_groups = np.asarray(groups_d)[cand_ok]
        # 3-consecutive-KF consistency (cpp:151-210)
        enough = []
        new_groups: List[Tuple[Set[int], int]] = []
        for c, grow in zip(cand_idx, cand_groups):
            group = set(np.where(grow)[0].tolist()) | {int(c)}
            matched = False
            for prev_set, streak in self.consistent_groups:
                if group & prev_set:
                    new_groups.append((group, streak + 1))
                    if streak + 1 >= self.consistency_th:
                        enough.append(int(c))
                    matched = True
                    break
            if not matched:
                new_groups.append((group, 0))
        self.consistent_groups = new_groups
        import os as _os
        if _os.environ.get("CUBEMAP_LOOP_DEBUG") and cand_ok.any():
            print(f"#loop   consistent={len(new_groups)} enough={enough}",
                  flush=True)
        if not enough:
            return False
        # ComputeSim3 against consistent candidates (cpp:230-399)
        for c in enough:
            if self._try_close(system, slot, int(c)):
                self.last_loop_counter = system.n_kf
                self.consistent_groups = []
                return True
        return False

    def _try_close(self, system, k_cur: int, k_loop: int) -> bool:
        import time as _t
        t0 = _t.perf_counter()
        arena = system.arena
        idx2, ok = self.k.match_kf_pair(arena, jnp.int32(k_cur),
                                        jnp.int32(k_loop))
        n_matches = int(jnp.sum(ok))
        import os as _os
        dbg = _os.environ.get("CUBEMAP_LOOP_DEBUG")
        if dbg:
            print(f"#try {k_cur}<->{k_loop}: kfkf_matches={n_matches}",
                  flush=True)
        if n_matches < 20:
            return False
        p1, p2, uv1, uv2, s1, s2 = self.k.sim3_candidates(
            arena, jnp.int32(k_cur), jnp.int32(k_loop), idx2, ok)
        system.key, sub = jax.random.split(system.key)
        res = sim3_ransac(self.cam, sub, p1, p2, uv1, uv2, s1, s2, ok,
                          n_iters=self.cfg.sim3_ransac_iters,
                          fix_scale=False, min_inliers=20)
        if dbg:
            print(f"#try   sim3 success={bool(res.success)}", flush=True)
        if not bool(res.success):
            return False
        # widen the match set with the RANSAC Sim3 before refinement
        # (SearchBySim3 pass, LoopClosing.cpp:330-339)
        idx2, ok_wide = self.k.search_by_sim3(
            arena, jnp.int32(k_cur), jnp.int32(k_loop),
            res.s12, res.R12, res.t12, idx2, ok & res.inliers)
        s, R, t, inl, n_inl = self.k.refine_sim3(
            arena, jnp.int32(k_cur), jnp.int32(k_loop), idx2,
            ok_wide, res.s12, res.R12, res.t12)
        if dbg:
            print(f"#try   refine n_inl={int(n_inl)}", flush=True)
        if int(n_inl) < 20:
            return False
        # Scw-projection acceptance: project the loop neighborhood's
        # landmarks into the current KF through the corrected Scw and
        # require >=40 total matches (LoopClosing.cpp:340-399)
        loop_assoc, total = self.k.scw_project(
            arena, jnp.int32(k_cur), jnp.int32(k_loop), s, R, t,
            idx2, ok_wide & inl)
        if dbg:
            print(f"#try   scw total={int(total)}", flush=True)
        if int(total) < 40:
            return False
        t0 = self._lap("sim3", t0)
        # the correction neighborhood must be measured BEFORE fusion
        # (mvpCurrentConnectedKFs, LoopClosing.cpp:442-444)
        covis_pre = SM.covisibility_matrix(arena)
        neigh_pre = (covis_pre[k_cur]
                     >= self.cfg.covisibility_weight_th) & arena.kf_valid
        # fuse matched loop landmarks into the current KF (the loop point
        # replaces the current one, LoopClosing.cpp:519-536) BEFORE the
        # pose graph, so the covisibility edges it creates participate
        # (the reference's LoopConnections)
        arena = self.k.loop_fuse(arena, jnp.int32(k_cur), loop_assoc)
        system.arena = arena
        # correct the loop
        max_prev = 16
        li = np.zeros(max_prev, np.int32)
        lj = np.zeros(max_prev, np.int32)
        lv = np.zeros(max_prev, bool)
        for n, (a, b) in enumerate(self.loop_edges[:max_prev]):
            li[n], lj[n], lv[n] = a, b, True
        system.arena = self.k.propagate_and_pose_graph(
            arena, jnp.int32(k_cur), jnp.int32(k_loop), s, R, t,
            neigh_pre, jnp.asarray(li), jnp.asarray(lj), jnp.asarray(lv))
        self.loop_edges.append((k_cur, k_loop))
        # SearchAndFuse over the WHOLE corrected neighborhood
        # (LoopClosing.cpp:586-612): project the loop landmark set into
        # every corrected KF (current + its pre-fusion covisibles) and
        # Replace duplicates — not just the (k_cur, k_loop) pair
        max_neigh = 16
        neigh_np = np.where(np.asarray(neigh_pre))[0]
        ni = np.zeros(max_neigh, np.int32)
        nv = np.zeros(max_neigh, bool)
        ni[0], nv[0] = k_cur, True
        for n_, kf in enumerate(neigh_np[:max_neigh - 1]):
            ni[n_ + 1], nv[n_ + 1] = kf, kf != k_cur
        sel, sel_ok = self.k.loop_member_landmarks(
            system.arena, min(4096, system.arena.n_lm_cap),
            jnp.int32(k_loop))
        system.arena = self.k.search_and_fuse(
            system.arena, jnp.asarray(ni), jnp.asarray(nv), sel, sel_ok)
        system.arena = SM.update_landmark_stats(
            system.arena, jnp.asarray(self.cfg.scale_factors, jnp.float32))
        np.asarray(system.arena.kf_valid[:1])  # value-sync the correction
        t0 = self._lap("correct", t0)
        # full-map BA after the pose-graph correction (the reference spawns
        # a transient GBA thread, LoopClosing.cpp:578 +
        # RunGlobalBundleAdjustment cpp:644-748; here it is an explicit
        # jitted call on the arena-wide problem)
        self._global_ba(system)
        np.asarray(system.arena.kf_valid[:1])  # value-sync the GBA
        self._lap("gba", t0)
        return True

    def _global_ba(self, system):
        """Post-loop global BA (RunGlobalBundleAdjustment analog,
        LoopClosing.cpp:644-748). On a multi-device mesh the arena-wide
        problem is sharded into keyframe blocks and solved SPMD
        (dist.distributed_bundle_adjust); single device runs it locally."""
        from cubemapslam_tpu.dist import (distributed_bundle_adjust,
                                          global_ba_problem_from_arena,
                                          make_mesh, shard_ba_problem)
        from cubemapslam_tpu.optim.ba import bundle_adjust
        inv_s2 = 1.0 / jnp.asarray(self.cfg.level_sigma2, jnp.float32)
        prob = global_ba_problem_from_arena(self.cam, system.arena, inv_s2)
        K, N = system.arena.n_kf_cap, system.arena.n_feat
        devs = jax.devices()
        if len(devs) > 1:
            sharded = shard_ba_problem(prob, len(devs), shard_points=True)
            out_s, inl_s = distributed_bundle_adjust(
                self.cam, sharded, make_mesh(devs), phase_iters=(5, 10),
                cg_iters=50)
            # scatter sharded-order inliers back to (K,N) edge order and
            # un-permute the point table (boundary-first ordering)
            inl_np = np.asarray(inl_s)
            inl = np.zeros(K * N, bool)
            perm = sharded.edge_perm
            real = perm >= 0
            inl[perm[real]] = inl_np[real]
            inl = jnp.asarray(inl)
            X_orig = jnp.zeros_like(out_s.X).at[
                jnp.asarray(sharded.point_perm)].set(out_s.X)
            out = out_s._replace(X=X_orig)
        else:
            # two-phase (robust + chi2 cut + clean) like LocalBA: the
            # single-phase schedule left outlier edges dragging the
            # post-loop solution (measured: post-loop ATE ~8% of scene
            # span vs the 5% bound)
            out, inl = bundle_adjust(self.cam, prob, phase_iters=(5, 10),
                                     cg_iters=50)
        kill = prob.obs_valid & ~inl
        obs = jnp.where(kill.reshape(K, N), SM.NO_LM,
                        system.arena.kf_obs_lm)
        system.arena = system.arena._replace(
            kf_R=out.R, kf_t=out.t, lm_pos=out.X, kf_obs_lm=obs)
