"""CubemapSLAM system facade + tracking state machine (host shell).

Re-implements System (src/System.cpp) and the Tracking state machine
(src/Tracking.cpp) as a host-side orchestrator over jitted device stages.
The reference's three threads become sequential stage calls (correctness
first; the host pipeline can overlap tracking and mapping later), and every
mutex/queue protocol disappears with the functional map arena.

States mirror Tracking.h:87-93: NO_IMAGES_YET / NOT_INITIALIZED / OK / LOST.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu import warp as W
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.features import build_extractor
from cubemapslam_tpu.runtime.kernels import TrackingKernels
from cubemapslam_tpu.runtime.mapping import MappingKernels


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class FrameState:
    """Host handle to the last processed frame's device arrays."""

    kp: object = None
    assoc: object = None
    outlier: object = None
    R: object = None
    t: object = None
    frame_id: int = -1
    timestamp: float = 0.0


class CubemapSLAM:
    """End-to-end monocular cubemap SLAM (System::TrackCubemap analog)."""

    def __init__(self, cfg: SlamConfig, enable_mapping: bool = True,
                 seed: int = 0):
        self.cfg = cfg
        self.cam = CubemapCamera.from_config(cfg)
        self.kernels = TrackingKernels(cfg, self.cam)
        self.mapping = MappingKernels(cfg, self.cam)
        self.arena = SM.make_arena(cfg.max_keyframes, cfg.n_features,
                                   cfg.max_landmarks)
        self.ba_cams = min(48, cfg.max_keyframes)
        image_hw = (cfg.cube_h, cfg.cube_w)
        self.extract, self.orb_params = build_extractor(
            cfg, self.cam, cfg.n_features, image_hw)
        self.warp_map = None          # built lazily for fisheye input
        self.state = TrackState.NO_IMAGES_YET
        self.n_kf = 0                 # monotonically allocated KF slots
        self.key = jax.random.PRNGKey(seed)
        self.last = FrameState()
        self.init_ref = FrameState()  # initialization reference frame
        self.velocity = None          # (R, t) relative motion model
        self.ref_kf = 0
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.localization_only = False
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.tracked_frames = 0       # frame_counter analog (Tracking.cpp:46)
        self.total_frames = 0
        self.metrics: List[dict] = []

    # ------------------------------------------------------------------
    # Public API (System.h:62-91 analog)
    # ------------------------------------------------------------------

    def track_fisheye(self, fisheye_img: np.ndarray, timestamp: float,
                      mask: Optional[np.ndarray] = None):
        """Warp a fisheye frame to the cubemap cross and track
        (main-loop warp + TrackCubemap, cubemap_lafida.cpp:143-147)."""
        if self.warp_map is None:
            self.warp_map = W.build_warp_map(self.cam, self.cfg.cube_w,
                                             self.cfg.cube_h)
        cube = W.warp_bilinear(jnp.asarray(fisheye_img), self.warp_map)
        return self.track_cubemap(cube, timestamp, mask)

    def track_cubemap(self, cube_img, timestamp: float,
                      mask: Optional[np.ndarray] = None):
        """Track one cubemap-cross grayscale frame. Returns 4x4 Tcw or
        None when tracking is not yet established."""
        self.total_frames += 1
        kp = self.extract(jnp.asarray(cube_img),
                          None if mask is None else jnp.asarray(mask))
        fid = self.frame_id
        self.frame_id += 1
        if self.state in (TrackState.NO_IMAGES_YET,
                          TrackState.NOT_INITIALIZED):
            self._try_initialize(kp, fid, timestamp)
        else:
            self._track_frame(kp, fid, timestamp)
        if self.state == TrackState.OK:
            self.tracked_frames += 1
            Rn = np.asarray(self.last.R)
            tn = np.asarray(self.last.t)
            self.trajectory.append((timestamp, Rn, tn))
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = Rn
            T[:3, 3] = tn
            return T
        return None

    def activate_localization_mode(self):
        """Freeze mapping; track against the existing map
        (System::ActivateLocalizationMode, System.cpp:184-188)."""
        self.localization_only = True

    def deactivate_localization_mode(self):
        self.localization_only = False

    # ------------------------------------------------------------------
    # Initialization (Tracking.cpp:391-565)
    # ------------------------------------------------------------------

    def _enough_kp(self, kp) -> bool:
        return int(jnp.sum(kp.valid)) > self.cfg.min_init_keypoints

    def _try_initialize(self, kp, fid, ts):
        if (self.state == TrackState.NO_IMAGES_YET
                or self.init_ref.kp is None):
            if self._enough_kp(kp):
                self.init_ref = FrameState(kp=kp, frame_id=fid,
                                           timestamp=ts)
                self.state = TrackState.NOT_INITIALIZED
            return
        if not self._enough_kp(kp):
            self.init_ref = FrameState()
            return
        m_idx, m_ok, n = self.kernels.match_for_initialization(
            self.init_ref.kp, kp)
        if int(n) < self.cfg.min_init_matches:
            self.init_ref = FrameState()  # retry with a new reference
            return
        self.key, sub = jax.random.split(self.key)
        res = self.kernels.two_view_init(sub, self.init_ref.kp, kp,
                                         m_idx, m_ok)
        if not bool(res.success):
            return
        self._create_initial_map(kp, fid, ts, m_idx, res)

    def _create_initial_map(self, kp, fid, ts, m_idx, res):
        """CreateInitialMapCubemap (Tracking.cpp:466-565): two keyframes,
        landmarks from the triangulated inliers, scale normalized to median
        depth 1, then a small global BA."""
        # median-depth normalization (KeyFrame::ComputeSceneMedianDepth)
        good = np.asarray(res.good)
        p3d = np.asarray(res.p3d)
        depths = p3d[good][:, 2]
        if good.sum() < self.cfg.min_init_matches or len(depths) == 0:
            return
        med = float(np.median(np.linalg.norm(p3d[good], axis=1)))
        if med <= 0:
            return
        inv = 1.0 / med
        R0 = jnp.eye(3)
        t0 = jnp.zeros(3)
        R1 = res.R21
        t1 = res.t21 * inv
        Xw = jnp.asarray(p3d * inv)

        ref = self.init_ref
        no_assoc = jnp.full((kp.n,), SM.NO_LM, jnp.int32)
        no_out = jnp.zeros(kp.n, bool)
        self.arena = self.kernels.insert_keyframe(
            self.arena, 0, ref.kp, no_assoc, no_out, R0, t0,
            ref.frame_id, ref.timestamp)
        self.arena = self.kernels.insert_keyframe(
            self.arena, 1, kp, no_assoc, no_out, R1, t1, fid, ts)
        self.n_kf = 2
        # landmarks: per-ref-feature candidates matched to current feature
        self.arena, n_new = self.mapping.commit_new_landmarks(
            self.arena, 0, 1, Xw, res.good, m_idx, 0, ref.frame_id)
        self.arena = SM.update_landmark_stats(
            self.arena, self.kernels.scale_factors)
        # small global BA (GlobalBundleAdjustemnt(20), Tracking.cpp:513)
        self.arena = self.mapping.local_ba(self.arena, 1, self.ba_cams)
        # current frame assoc = landmarks now attached to KF1 features
        assoc = self.arena.kf_obs_lm[1]
        self.last = FrameState(kp=kp, assoc=assoc,
                               outlier=jnp.zeros(kp.n, bool),
                               R=self.arena.kf_R[1], t=self.arena.kf_t[1],
                               frame_id=fid, timestamp=ts)
        self.ref_kf = 1
        self.last_kf_frame_id = fid
        self.velocity = None
        self.state = TrackState.OK
        self.init_ref = FrameState()

    # ------------------------------------------------------------------
    # Per-frame tracking (Track, Tracking.cpp:155-389)
    # ------------------------------------------------------------------

    def _track_frame(self, kp, fid, ts):
        k = self.kernels
        # pose prediction by the motion model (Tracking.cpp:626-631)
        if self.velocity is not None:
            Rv, tv = self.velocity
            R_pred, t_pred = G.se3_compose(Rv, tv, self.last.R, self.last.t)
        else:
            R_pred, t_pred = self.last.R, self.last.t

        assoc, n = k.track_last_frame(
            self.arena, kp, self.last.assoc, self.last.outlier,
            self.last.kp.level, R_pred, t_pred, radius=15.0)
        if int(n) < 20:  # widen the window (Tracking.cpp:641-648)
            assoc, n = k.track_last_frame(
                self.arena, kp, self.last.assoc, self.last.outlier,
                self.last.kp.level, R_pred, t_pred, radius=30.0)
        if int(n) < 20:  # fall back to reference KF (Tracking.cpp:191-200)
            assoc, n = k.track_reference_kf(self.arena, kp,
                                            jnp.int32(self.ref_kf))
            R_pred, t_pred = self.last.R, self.last.t
        if int(n) < 15:
            self._set_lost(kp, fid, ts)
            return
        R, t, outlier, n_inl = k.optimize_pose(self.arena, kp, assoc,
                                               R_pred, t_pred)
        if int(n_inl) < 10:
            self._set_lost(kp, fid, ts)
            return

        # local-map tracking (TrackLocalMap, Tracking.cpp:679-719)
        assoc = jnp.where(outlier, SM.NO_LM, assoc)
        sel, sel_ok, local_mask = k.select_local_landmarks(self.arena,
                                                           assoc)
        assoc, vis_add = k.search_local_points(self.arena, kp, assoc, sel,
                                               sel_ok, R, t)
        R, t, outlier, n_final = k.optimize_pose(self.arena, kp, assoc,
                                                 R, t)
        self.arena = k.update_found_counters(self.arena, assoc, outlier,
                                             vis_add)
        n_final_i = int(n_final)
        if n_final_i < self.cfg.min_track_inliers:
            self._set_lost(kp, fid, ts)
            return

        # motion model update (Tracking.cpp:307-316)
        R_last_inv, t_last_inv = G.se3_inverse(self.last.R, self.last.t)
        self.velocity = G.se3_compose(R, t, R_last_inv, t_last_inv)
        self.last = FrameState(kp=kp, assoc=assoc, outlier=outlier,
                               R=R, t=t, frame_id=fid, timestamp=ts)
        self.metrics.append({"frame": fid, "inliers": n_final_i,
                             "matches": int(n)})

        if not self.localization_only and self._need_new_keyframe(
                n_final_i):
            self._create_keyframe(kp, assoc, outlier, R, t, fid, ts)

    def _set_lost(self, kp, fid, ts):
        self.state = TrackState.LOST
        # keep last frame for potential relocalization
        self.metrics.append({"frame": fid, "inliers": 0, "matches": 0})
        if self.n_kf <= 5:
            self.reset()

    def reset(self):
        """System reset (Tracking::Reset, Tracking.cpp:1153-1199)."""
        self.arena = SM.make_arena(self.cfg.max_keyframes,
                                   self.cfg.n_features,
                                   self.cfg.max_landmarks)
        self.n_kf = 0
        self.state = TrackState.NO_IMAGES_YET
        self.last = FrameState()
        self.init_ref = FrameState()
        self.velocity = None
        self.ref_kf = 0

    # ------------------------------------------------------------------
    # Keyframe decision + creation (Tracking.cpp:721-792)
    # ------------------------------------------------------------------

    def _need_new_keyframe(self, n_inliers: int) -> bool:
        if self.n_kf >= self.cfg.max_keyframes - 1:
            return False
        n_ref = int(jnp.sum(
            (self.arena.kf_obs_lm[self.ref_kf] >= 0)
            & self.arena.kf_kp_valid[self.ref_kf]))
        frames_since = self.frame_id - self.last_kf_frame_id
        c1a = frames_since >= self.cfg.fps  # mMaxFrames = fps
        c1b = frames_since >= 0             # mMinFrames quirk: always true
        c2 = (n_inliers < n_ref * self.cfg.keyframe_ref_ratio
              and n_inliers > 15)
        return bool((c1a or c1b) and c2)

    def _create_keyframe(self, kp, assoc, outlier, R, t, fid, ts):
        slot = self.n_kf
        self.arena = self.kernels.insert_keyframe(
            self.arena, slot, kp, assoc, outlier, R, t, fid, ts)
        self.n_kf += 1
        self.ref_kf = slot
        self.last_kf_frame_id = fid
        self._local_mapping(slot)

    # ------------------------------------------------------------------
    # Local mapping pipeline (LocalMapping::Run body per KF)
    # ------------------------------------------------------------------

    def _local_mapping(self, slot: int, n_triangulate_neighbors: int = 6):
        m = self.mapping
        self.arena = m.cull_map_points(self.arena, self.n_kf)
        # top covisible neighbors for triangulation (cpp:219-224; mono
        # uses 20, we cap lower and rely on the wider epipolar search)
        covis = np.asarray(SM.covisibility_matrix(self.arena)[slot])
        order = np.argsort(-covis)
        neighbors = [int(i) for i in order[:n_triangulate_neighbors]
                     if covis[i] > 0 and i != slot]
        for nb in neighbors:
            # baseline / median-depth ratio gate (cpp:240-247)
            Xw, ok, idx2 = m.triangulate_with_neighbor(self.arena, slot, nb)
            self.arena, n_new = m.commit_new_landmarks(
                self.arena, slot, nb, Xw, ok, idx2, self.n_kf - 1,
                int(self.arena.kf_frame_id[slot]))
        for nb in neighbors[:4]:
            self.arena = m.fuse_pair(self.arena, slot, nb)
            self.arena = m.fuse_pair(self.arena, nb, slot)
        self.arena = SM.update_landmark_stats(self.arena,
                                              self.kernels.scale_factors)
        if self.n_kf > 2:
            self.arena = m.local_ba(self.arena, slot, self.ba_cams)
        self.arena, n_culled = m.cull_keyframes(self.arena, slot)

    # ------------------------------------------------------------------
    # Output (System::SaveKeyFrameTrajectoryTUM, System.cpp:238-268)
    # ------------------------------------------------------------------

    def keyframe_trajectory(self) -> List[Tuple[float, np.ndarray,
                                                np.ndarray]]:
        """(timestamp, quat_xyzw, t_wc) per good keyframe, TUM convention
        (camera-to-world)."""
        out = []
        valid = np.asarray(self.arena.kf_valid)
        Rs = np.asarray(self.arena.kf_R)
        tss = np.asarray(self.arena.kf_timestamp)
        ts_ = np.asarray(self.arena.kf_t)
        for k in range(self.n_kf):
            if not valid[k]:
                continue
            Rwc = Rs[k].T
            twc = -Rwc @ ts_[k]
            q = np.asarray(G.rot_to_quat(jnp.asarray(Rwc)))
            out.append((float(tss[k]), q, twc))
        return out

    def save_keyframe_trajectory_tum(self, path: str):
        with open(path, "w") as f:
            for ts, q, t in self.keyframe_trajectory():
                f.write(f"{ts:.6f} {t[0]:.7f} {t[1]:.7f} {t[2]:.7f} "
                        f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")

    def shutdown(self):
        pass
