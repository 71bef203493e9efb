"""The map arena: fixed-capacity array-of-structs SLAM map state.

Replaces the reference's pointer-graph map — Map (src/Map.cpp),
KeyFrame (src/KeyFrame.cpp), MapPoint (src/MapPoint.cpp) — with preallocated
tables + validity masks (SURVEY.md §7 step 8). Key re-designs:

* Observations live in ONE place: ``kf_obs_lm[k, i]`` = landmark id observed
  by feature i of keyframe k (-1 if none). Every per-landmark statistic the
  reference maintains incrementally under mutexes (observation counts,
  normals, depth bands, distinctive descriptors — MapPoint.cpp:105-385) is
  derived by segment reductions over this table, so there is no
  add/erase-observation bookkeeping protocol and no lock discipline.
* The covisibility graph (KeyFrame::UpdateConnections, KeyFrame.cpp:315-404)
  is never stored: the weight matrix is ``O Oᵀ`` of the binary KF-landmark
  incidence — one MXU matmul, recomputed on demand.
* MapPoint::Replace (MapPoint.cpp:176-214) is a forwarding gather: fused
  landmark ids are rewritten through a redirect table in one pass.
* The distinctive descriptor (min-median-Hamming, MapPoint.cpp:243-308)
  becomes closest-to-majority: majority bit vector by segment-summing
  unpacked bits, then argmin Hamming to it — a fixed-shape equivalent.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from cubemapslam_tpu import matching as M

NO_LM = -1


class MapArena(NamedTuple):
    """All device-side map state. K keyframes x N features, L landmarks."""

    # keyframes
    kf_R: jnp.ndarray          # (K,3,3) world->cam
    kf_t: jnp.ndarray          # (K,3)
    kf_valid: jnp.ndarray      # (K,) bool
    kf_frame_id: jnp.ndarray   # (K,) int32 source frame id
    kf_timestamp: jnp.ndarray  # (K,) float64-as-float32 seconds
    # per-keyframe features
    kf_uv: jnp.ndarray         # (K,N,2) cubemap cross pixels
    kf_rays: jnp.ndarray       # (K,N,3) unit bearings (camera frame)
    kf_face: jnp.ndarray       # (K,N) int32
    kf_level: jnp.ndarray      # (K,N) int32
    kf_angle: jnp.ndarray      # (K,N) float32
    kf_desc: jnp.ndarray       # (K,N,8) uint32
    kf_kp_valid: jnp.ndarray   # (K,N) bool
    kf_obs_lm: jnp.ndarray     # (K,N) int32 landmark id or NO_LM
    # landmarks
    lm_pos: jnp.ndarray        # (L,3) world
    lm_valid: jnp.ndarray      # (L,) bool
    lm_desc: jnp.ndarray       # (L,8) uint32 distinctive descriptor
    lm_normal: jnp.ndarray     # (L,3) mean viewing direction
    lm_min_dist: jnp.ndarray   # (L,) scale-invariance band
    lm_max_dist: jnp.ndarray   # (L,)
    lm_visible: jnp.ndarray    # (L,) int32  (IncreaseVisible)
    lm_found: jnp.ndarray      # (L,) int32  (IncreaseFound)
    lm_first_kf: jnp.ndarray   # (L,) int32 creating keyframe SLOT
    lm_birth: jnp.ndarray      # (L,) int32 monotonic keyframe counter at
                               # creation (keyframe slots are recycled, so
                               # ages must use the counter, not the slot)
    lm_first_frame: jnp.ndarray  # (L,) int32 creating frame id

    @property
    def n_kf_cap(self):
        return self.kf_R.shape[0]

    @property
    def n_feat(self):
        return self.kf_uv.shape[1]

    @property
    def n_lm_cap(self):
        return self.lm_pos.shape[0]


def make_arena(max_kf: int, n_feat: int, max_lm: int) -> MapArena:
    K, N, L = max_kf, n_feat, max_lm
    eye = jnp.broadcast_to(jnp.eye(3), (K, 3, 3))
    return MapArena(
        kf_R=jnp.array(eye), kf_t=jnp.zeros((K, 3)),
        kf_valid=jnp.zeros(K, bool),
        kf_frame_id=jnp.full(K, -1, jnp.int32),
        kf_timestamp=jnp.zeros(K, jnp.float32),
        kf_uv=jnp.zeros((K, N, 2)), kf_rays=jnp.zeros((K, N, 3)),
        kf_face=jnp.full((K, N), -1, jnp.int32),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N)),
        kf_desc=jnp.zeros((K, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((K, N), bool),
        kf_obs_lm=jnp.full((K, N), NO_LM, jnp.int32),
        lm_pos=jnp.zeros((L, 3)), lm_valid=jnp.zeros(L, bool),
        lm_desc=jnp.zeros((L, 8), jnp.uint32),
        lm_normal=jnp.zeros((L, 3)),
        lm_min_dist=jnp.zeros(L), lm_max_dist=jnp.zeros(L),
        lm_visible=jnp.ones(L, jnp.int32),
        lm_found=jnp.ones(L, jnp.int32),
        lm_first_kf=jnp.full(L, -1, jnp.int32),
        lm_birth=jnp.full(L, -1, jnp.int32),
        lm_first_frame=jnp.full(L, -1, jnp.int32),
    )


# ---------------------------------------------------------------------------
# Derived quantities (segment reductions over kf_obs_lm)
# ---------------------------------------------------------------------------

def _flat_obs(arena: MapArena):
    """Flatten (K,N) observation table; invalid entries point at a dump slot
    (index L, one past the landmark table)."""
    lm = arena.kf_obs_lm.reshape(-1)
    kp_ok = arena.kf_kp_valid.reshape(-1)
    kf_ok = jnp.repeat(arena.kf_valid, arena.n_feat)
    live = (lm >= 0) & kp_ok & kf_ok
    live &= jnp.where(lm >= 0, arena.lm_valid[jnp.maximum(lm, 0)], False)
    seg = jnp.where(live, lm, arena.n_lm_cap)
    return seg, live


def reference_keyframes(arena: MapArena, seg, live, kf_idx) -> jnp.ndarray:
    """(L,) slot of each landmark's reference keyframe: the temporally
    FIRST live keyframe still observing it (mpRefKF semantics,
    MapPoint.cpp:118-135). K (= n_kf_cap) marks 'no observer'. Temporal
    order is by kf_frame_id — slots are recycled, so slot order is not
    creation order."""
    K = arena.n_kf_cap
    # pack (frame_id, slot) so seg-min picks the earliest frame id and
    # breaks ties by slot; frame ids stay < 2^31 / K
    key = arena.kf_frame_id[kf_idx] * K + kf_idx
    big = jnp.iinfo(jnp.int32).max
    best = jnp.full(arena.n_lm_cap + 1, big, jnp.int32).at[seg].min(
        jnp.where(live, key, big))[:-1]
    return jnp.where(best < big, best % K, K)


def incidence_matrix(arena: MapArena) -> jnp.ndarray:
    """(K, L) {0,1} bf16 keyframe-landmark incidence (live observations).

    THE shared intermediate of the per-frame/per-KF graph quantities:
    covisibility = O Oᵀ (one MXU matmul) and observation counts = column
    sum (one reduction). Building O is the expensive part (a per-row
    scatter; ~measured 20 ms at K=512/L=65536 when done twice per frame
    as separate covis + counts passes), so callers build it ONCE and
    derive everything from it. bf16 entries are exactly representable
    ({0,1}) and halve the HBM traffic; products/sums accumulate in f32,
    so all derived counts are bitwise exact."""
    K, L = arena.n_kf_cap, arena.n_lm_cap
    seg, live = _flat_obs(arena)
    # scattered PER KEYFRAME ROW (vmap): each batch writes a VMEM-resident
    # (L+1,) plane — a flat (K, L+1) coordinate scatter of the same K*N
    # updates is ~25 ms on TPU (scatter cost tracks the target size)
    O = jax.vmap(lambda s, lv: jnp.zeros(L + 1, jnp.bfloat16).at[s].max(
        lv.astype(jnp.bfloat16)))(
        seg.reshape(K, arena.n_feat), live.reshape(K, arena.n_feat))
    return O[:, :-1]


def observation_counts(arena: MapArena, O=None) -> jnp.ndarray:
    """(L,) number of keyframe observations per landmark
    (MapPoint::Observations). Pass a precomputed incidence O to avoid
    rebuilding it (counts are its exact column sums)."""
    if O is None:
        O = incidence_matrix(arena)
    return jnp.sum(O.astype(jnp.float32), axis=0).astype(jnp.int32)


def covisibility_matrix(arena: MapArena, O=None) -> jnp.ndarray:
    """(K,K) shared-landmark counts (KeyFrame::UpdateConnections weights,
    KeyFrame.cpp:315-404) as one incidence matmul; diagonal zeroed."""
    K = arena.n_kf_cap
    if O is None:
        O = incidence_matrix(arena)
    W = jax.lax.dot_general(O, O, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    W = W * (1.0 - jnp.eye(K))
    return W.astype(jnp.int32)


def _stats_core(kf_frame_id, Ow, scale_factors, seg, live, kf_idx, desc,
                lev, pos_seg, first_kf_seg, S):
    """Per-segment landmark statistics from a generic observation list.

    seg: (E,) segment id in [0, S] (S = dump). live: (E,) bool.
    kf_idx: (E,) observing keyframe slot. desc: (E,8) uint32. lev: (E,).
    pos_seg: (S,3) landmark world positions per segment.
    first_kf_seg: (S,) creator keyframe slot fallback.

    Returns (normal, min_dist, max_dist, desc, has_obs), each (S,...).
    Implements MapPoint::UpdateNormalAndDepth (MapPoint.cpp:332-385) and
    ComputeDistinctiveDescriptors (cpp:243-308) as segment reductions.
    """
    K = Ow.shape[0]
    E = seg.shape[0]
    seg_s = jnp.minimum(seg, S - 1)
    d = pos_seg[seg_s] - Ow[kf_idx]                          # (E,3)
    dist = jnp.linalg.norm(d, axis=-1)
    dir_n = d / jnp.maximum(dist, 1e-12)[:, None]
    w = live.astype(jnp.float32)
    normal_sum = jnp.zeros((S + 1, 3)).at[seg].add(dir_n * w[:, None])
    cnt = jnp.zeros(S + 1).at[seg].add(w)
    normal = normal_sum[:-1] / jnp.maximum(cnt[:-1, None], 1.0)
    nn = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nn, 1e-12)

    # depth band from the reference keyframe's distance and level
    # (UpdateNormalAndDepth cpp:360-371): maxDist = dist*scale^level,
    # minDist = maxDist / scale^(nLevels-1). The reference KF is the
    # TEMPORALLY first keyframe that STILL observes the landmark — the
    # reference reassigns mpRefKF when the creating KF is erased
    # (MapPoint.cpp:118-135). Keyframe slots are recycled, so "first" is
    # by frame id, not slot index: pack (frame_id, slot) into one int key.
    key = kf_frame_id[kf_idx] * K + kf_idx
    big = jnp.iinfo(jnp.int32).max
    best = jnp.full(S + 1, big, jnp.int32).at[seg].min(
        jnp.where(live, key, big))[:-1]
    ref_kf = jnp.where(best < big, best % K,
                       jnp.clip(first_kf_seg, 0, K - 1))
    d_ref = jnp.linalg.norm(pos_seg - Ow[ref_kf], axis=-1)
    lev_ref = jnp.zeros(S + 1, jnp.int32).at[seg].max(
        jnp.where(live & (kf_idx == ref_kf[seg_s]), lev, 0))
    sf = scale_factors[jnp.clip(lev_ref[:-1], 0,
                                scale_factors.shape[0] - 1)]
    n_levels = scale_factors.shape[0]
    max_dist = d_ref * sf
    min_dist = max_dist / scale_factors[n_levels - 1]

    # distinctive descriptor = observation descriptor closest to the
    # bitwise-majority descriptor
    bits = M.unpack_descriptors(desc)                        # (E,256)
    bit_sum = jnp.zeros((S + 1, 256)).at[seg].add(bits * w[:, None])
    majority = (bit_sum[:-1] > 0.5 * jnp.maximum(cnt[:-1, None], 1.0))
    ham = jnp.sum(bits != majority[seg_s].astype(jnp.float32), axis=-1)
    ham = jnp.where(live, ham, 1e9)
    best_val = jnp.full(S + 1, 1e9).at[seg].min(ham)
    is_best = live & (ham <= best_val[seg])
    # resolve ties by flat index: smallest wins
    flat_idx = jnp.arange(E, dtype=jnp.int32)
    best_idx = jnp.full(S + 1, E, jnp.int32).at[seg].min(
        jnp.where(is_best, flat_idx, E))
    safe_best = jnp.minimum(best_idx[:-1], E - 1)
    best_desc = desc[safe_best]
    return normal, min_dist, max_dist, best_desc, cnt[:-1] > 0


def update_landmark_stats(arena: MapArena,
                          scale_factors: jnp.ndarray) -> MapArena:
    """Recompute lm_normal, lm_min/max_dist and the distinctive descriptor
    for ALL landmarks from the observation table (replaces incremental
    MapPoint::UpdateNormalAndDepth cpp:332-385 and
    ComputeDistinctiveDescriptors cpp:243-308).

    O(K*N) with a (K*N, 256) bit unpack — ~1 GB of traffic at the Lafida
    working scale. Use ONLY for whole-map (re)builds (init, map load, loop
    correction); the per-keyframe pipeline uses
    update_landmark_stats_touched."""
    K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
    seg, live = _flat_obs(arena)
    kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    Ow = -jnp.einsum("kij,ki->kj", arena.kf_R, arena.kf_t)  # (K,3)
    normal, min_dist, max_dist, desc, has_obs = _stats_core(
        arena.kf_frame_id, Ow, scale_factors, seg, live, kf_idx,
        arena.kf_desc.reshape(-1, 8), arena.kf_level.reshape(-1),
        arena.lm_pos, arena.lm_first_kf, L)
    return arena._replace(
        lm_normal=jnp.where(has_obs[:, None], normal, arena.lm_normal),
        lm_min_dist=jnp.where(has_obs, min_dist, arena.lm_min_dist),
        lm_max_dist=jnp.where(has_obs, max_dist, arena.lm_max_dist),
        lm_desc=jnp.where(has_obs[:, None], desc, arena.lm_desc))


def update_landmark_stats_touched(arena: MapArena,
                                  scale_factors: jnp.ndarray,
                                  touched: jnp.ndarray,
                                  max_touched: int = 16384,
                                  max_obs: int = 131072) -> MapArena:
    """Update lm_normal / depth bands / distinctive descriptors for the
    TOUCHED landmarks only (the set whose observers or positions changed
    this step). The touched set and its observations are compacted into
    fixed small shapes so the per-keyframe cost is O(local), not
    O(arena capacity) — the reference updates these stats per-MapPoint
    incrementally for exactly this reason (LocalMapping.cpp:157-158).

    touched: (L,) bool. Landmarks beyond max_touched, or whose observation
    lists overflow max_obs, keep their previous statistics for this call
    (they are refreshed the next time they are touched; overflow needs a
    pathological local set several times the BA window)."""
    K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
    T = min(max_touched, L)
    touched = touched & arena.lm_valid

    # compact touched landmark ids -> lm_sel (T,), inverse map (L+1,)
    rank_t = jnp.cumsum(touched.astype(jnp.int32)) - 1
    can_t = touched & (rank_t < T)
    lm_sel = jnp.full(T + 1, L, jnp.int32).at[
        jnp.where(can_t, rank_t, T)].set(
        jnp.arange(L, dtype=jnp.int32))[:-1]
    t_ok = lm_sel < L
    lm_sel_s = jnp.minimum(lm_sel, L - 1)
    inv = jnp.full(L + 1, -1, jnp.int32).at[
        jnp.where(t_ok, lm_sel_s, L)].set(
        jnp.arange(T, dtype=jnp.int32))[:-1]

    # compact the observations of touched landmarks
    seg_full, live_full = _flat_obs(arena)
    pid_full = inv[seg_full]                      # (K*N,) compact id or -1
    is_t = live_full & (pid_full >= 0)
    rank_o = jnp.cumsum(is_t.astype(jnp.int32)) - 1
    can_o = is_t & (rank_o < max_obs)
    obs_sel = jnp.full(max_obs + 1, K * N, jnp.int32).at[
        jnp.where(can_o, rank_o, max_obs)].set(
        jnp.arange(K * N, dtype=jnp.int32))[:-1]
    o_ok = obs_sel < K * N
    obs_sel_s = jnp.minimum(obs_sel, K * N - 1)

    seg = jnp.where(o_ok, jnp.maximum(pid_full[obs_sel_s], 0), T)
    kf_idx = (obs_sel_s // N).astype(jnp.int32)
    desc = arena.kf_desc.reshape(-1, 8)[obs_sel_s]
    lev = arena.kf_level.reshape(-1)[obs_sel_s]
    Ow = -jnp.einsum("kij,ki->kj", arena.kf_R, arena.kf_t)
    pos_seg = arena.lm_pos[lm_sel_s]
    first_kf_seg = arena.lm_first_kf[lm_sel_s]

    normal, min_dist, max_dist, desc_b, has_obs = _stats_core(
        arena.kf_frame_id, Ow, scale_factors, seg, o_ok, kf_idx, desc,
        lev, pos_seg, first_kf_seg, T)

    # overflow insurance: only write segments whose FULL observation list
    # made it into the compact buffer (otherwise stats would be computed
    # from a prefix subset)
    cnt_full = jnp.zeros(L + 1, jnp.int32).at[seg_full].add(
        live_full.astype(jnp.int32))[:-1]
    cnt_cpt = jnp.zeros(T + 1, jnp.int32).at[seg].add(
        o_ok.astype(jnp.int32))[:-1]
    complete = cnt_cpt == cnt_full[lm_sel_s]
    upd = t_ok & has_obs & complete
    tgt = jnp.where(upd, lm_sel_s, L)

    pad = lambda a: jnp.concatenate(  # noqa: E731
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
    return arena._replace(
        lm_normal=pad(arena.lm_normal).at[tgt].set(normal)[:-1],
        lm_min_dist=pad(arena.lm_min_dist).at[tgt].set(min_dist)[:-1],
        lm_max_dist=pad(arena.lm_max_dist).at[tgt].set(max_dist)[:-1],
        lm_desc=pad(arena.lm_desc).at[tgt].set(desc_b)[:-1])


def predict_scale(dist: jnp.ndarray, max_dist: jnp.ndarray,
                  log_scale_factor: float, n_levels: int) -> jnp.ndarray:
    """MapPoint::PredictScale (MapPoint.cpp:387-419): level from the
    distance ratio."""
    ratio = jnp.maximum(max_dist, 1e-12) / jnp.maximum(dist, 1e-12)
    lvl = jnp.ceil(jnp.log(ratio) / log_scale_factor).astype(jnp.int32)
    return jnp.clip(lvl, 0, n_levels - 1)


def apply_redirect(arena: MapArena, redirect: jnp.ndarray) -> MapArena:
    """Rewrite all observation links through a forwarding table
    (MapPoint::Replace semantics in one gather). redirect: (L,) int32 with
    redirect[l] = l for live landmarks, target id for fused ones."""
    lm = arena.kf_obs_lm
    new = jnp.where(lm >= 0, redirect[jnp.maximum(lm, 0)], lm)
    return arena._replace(kf_obs_lm=new)


def redundant_keyframe_scores(arena: MapArena) -> Tuple[jnp.ndarray,
                                                        jnp.ndarray]:
    """Per-KF (n_redundant, n_total) for KeyFrameCulling
    (LocalMapping.cpp:561-619): an observation is redundant when >=3 OTHER
    keyframes see the landmark at the same or finer scale (level' <= level+1).
    Computed from an (L,levels) level histogram by segment-sum."""
    K, N, L = arena.n_kf_cap, arena.n_feat, arena.n_lm_cap
    seg, live = _flat_obs(arena)
    lev = jnp.clip(arena.kf_level.reshape(-1), 0, 15)
    onehot = jax.nn.one_hot(lev, 16, dtype=jnp.float32) * live[:, None]
    hist = jnp.zeros((L + 1, 16)).at[seg].add(onehot)       # (L+1,16)
    cum = jnp.cumsum(hist, axis=1)                          # levels <= j
    idx = jnp.minimum(lev + 1, 15)
    n_le = cum[seg, idx]                                    # includes self
    n_others = n_le - 1.0
    redundant = live & (n_others >= 3)
    kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    n_red = jnp.zeros(K, jnp.int32).at[kf_idx].add(
        redundant.astype(jnp.int32))
    n_tot = jnp.zeros(K, jnp.int32).at[kf_idx].add(live.astype(jnp.int32))
    return n_red, n_tot


def ba_edges_from_arena(cam, arena: MapArena, cam_sel: jnp.ndarray,
                        inv_level_sigma2: jnp.ndarray):
    """Flatten observations of the selected keyframes into BA COO arrays.

    cam_sel: (K,) bool — which keyframes contribute edges. Returns
    (obs_cam (KN,), obs_pt (KN,), obs_face, obs_uv_inface, obs_inv_sigma2,
    obs_valid) covering the full (K*N) table with validity masking — fixed
    shape, no compaction.
    """
    from cubemapslam_tpu.camera import cubemap_uv_to_in_face
    K, N = arena.n_kf_cap, arena.n_feat
    seg, live = _flat_obs(arena)
    kf_idx = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    live &= cam_sel[kf_idx]
    lm = jnp.maximum(arena.kf_obs_lm.reshape(-1), 0)
    lev = jnp.clip(arena.kf_level.reshape(-1), 0,
                   inv_level_sigma2.shape[0] - 1)
    uv_face = cubemap_uv_to_in_face(cam, arena.kf_uv.reshape(-1, 2))
    return (kf_idx, lm, arena.kf_face.reshape(-1),
            uv_face, inv_level_sigma2[lev], live)
