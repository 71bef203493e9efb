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
import functools
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
from cubemapslam_tpu import place as PL
from cubemapslam_tpu.runtime.kernels import TrackingKernels
from cubemapslam_tpu.runtime.mapping import MappingKernels
from cubemapslam_tpu.runtime.loop_closing import LoopCloser


class TrackState(enum.Enum):
    NO_IMAGES_YET = 0
    NOT_INITIALIZED = 1
    OK = 2
    LOST = 3


@dataclasses.dataclass
class FrameState:
    """Host handle to the last processed frame's device arrays.

    rel_R/rel_t store the pose RELATIVE to the reference keyframe at record
    time, so the frame can be re-anchored after mapping/BA moves the
    keyframes (Tracking::UpdateLastFrame semantics, Tracking.cpp:368-384 +
    612-618 — without this, every local BA invalidates the motion model).
    """

    kp: object = None
    assoc: object = None
    outlier: object = None
    R: object = None
    t: object = None
    rel_R: object = None
    rel_t: object = None
    ref_kf: int = 0
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
        # init-mode extractor with 3x features (Tracking.cpp:96); its output
        # is downselected to the arena feature width after bootstrap
        self.extract_init, _ = build_extractor(
            cfg, self.cam, cfg.n_features * cfg.init_features_factor,
            image_hw)
        self.warp_map = None          # built lazily for fisheye input
        self._native_warp = None      # host-side C++ warp (built with map)
        self._device_warp = None      # pallas device warp (TPU path)
        self._frontend_jit = None     # fused warp+assembly program
        self._fused_step_jit = None   # warp+extract+track single program
        self.state = TrackState.NO_IMAGES_YET
        # n_kf is the MONOTONIC keyframe counter (mnId analog): landmark
        # ages and loop spacing use it. Arena slots are recycled: culled
        # slots return to a free pool (the reference erases KeyFrames and
        # lets the map grow unbounded, KeyFrame.cpp:456-570; fixed arenas
        # must recycle instead of silently refusing keyframes at the cap).
        self.n_kf = 0
        self.arena_full_refusals = 0  # KF refusals due to a full arena
        self.key = jax.random.PRNGKey(seed)
        self.last = FrameState()
        self.init_ref = FrameState()  # initialization reference frame
        self.init_prev_rays = None    # vbPrevMatched window centers
        self.velocity = None          # (R, t) relative motion model
        self.ref_kf = 0
        self.frame_id = 0
        self.last_kf_frame_id = 0
        self.localization_only = False
        # mbVO (Tracking.h / Tracking.cpp:207-277): in localization mode,
        # True when the last frame tracked <10 MAP landmarks — the system
        # is doing visual odometry on frame-to-frame matches and attempts
        # relocalization every frame, preferring the reloc hypothesis
        self.mb_vo = False
        self.loop_closing_enabled = True
        # Deferred local BA (LocalMapping::Run, LocalMapping.cpp:84-90):
        # the reference runs LocalBundleAdjustment only when its keyframe
        # queue is EMPTY, and aborts it (mbAbortBA) when a new keyframe
        # arrives mid-solve. The functional analog: keyframe insertion
        # dispatches the mapping step WITHOUT BA; the BA program is
        # dispatched on the first subsequent frame that does NOT insert a
        # keyframe, and a pending BA is dropped when a new keyframe
        # preempts it. Keyframe cadence therefore depends only on map
        # state, never on measured wall time.
        self._ba_pending_slot = None  # arena slot awaiting deferred BA
        self._ba_superseded = 0       # times a pending BA was replaced
        self._last_mapping_info = None  # mapping_step diagnostics (device)
        self._last_pose_np = None     # host copy of the frame pose
        # keyframe-cadence state (see SlamConfig.keyframe_inlier_decay):
        # peak tracked-inlier count since the last insertion
        self._kf_inlier_peak = 0
        # cached device-side graph views (covisibility, observation
        # counts): the observation graph changes only at keyframe/mapping/
        # BA/loop events, so the cache refreshes there instead of
        # rebuilding the incidence in every frame (~20 ms/frame saved at
        # the working scale — kernels.graph_cache)
        self._graph_covis = None
        self._graph_cnt = None
        # Vocabulary (ORBvoc analog): either pretrained (cfg.vocab_path, the
        # reference's VOC argument) or trained on the fly — bootstrap
        # descriptors first, re-trained once on accumulated keyframe
        # descriptors (see _maybe_retrain_vocab). Shape honors
        # cfg.vocab_branching / cfg.vocab_depth.
        self.vocab = None
        self._vocab_is_bootstrap = False
        if cfg.vocab_path:
            self.vocab = PL.load_vocabulary(cfg.vocab_path)
        self.bow_table = None         # (K, n_words) dense BoW rows
        self.loop_closer = LoopCloser(cfg, self.cam, self.kernels,
                                      self.mapping)
        self.n_loops_closed = 0
        self.trajectory: List[Tuple[float, np.ndarray, np.ndarray]] = []
        self.tracked_frames = 0       # frame_counter analog (Tracking.cpp:46)
        self.total_frames = 0
        self.metrics: List[dict] = []
        # per-stage attribution (SURVEY.md §5 tracing): set to a dict to
        # enable SYNCED stage timing — each stage then blocks on its
        # outputs and records wall ms under stage_times[name]. Off (None)
        # in production: the syncs serialize the device queue and inflate
        # per-frame latency, so the bench only enables this for a short
        # post-run attribution pass.
        self.stage_times: Optional[dict] = None
        self._stage_t0 = 0.0

    def _stage(self, name: str, *arrays):
        if self.stage_times is None:
            return
        import time as _t
        # VALUE sync, not block_until_ready: over the axon tunnel
        # block_until_ready returns at RPC-ack, before the program actually
        # finished (NOTES_TPU.md "Transport"). Fetch the smallest leaf so
        # transfer time doesn't pollute the stage measurement.
        for a in arrays:
            leaves = [x for x in jax.tree.leaves(a)
                      if hasattr(x, "dtype")]
            if not leaves:
                continue
            small = min(leaves, key=lambda x: x.size)
            np.asarray(small if small.size <= 4096 else small.ravel()[:8])
        now = _t.perf_counter()
        self.stage_times.setdefault(name, []).append(
            (now - self._stage_t0) * 1e3)
        self._stage_t0 = now

    def _stage_start(self):
        if self.stage_times is None:
            return
        import time as _t
        self._stage_t0 = _t.perf_counter()

    # ------------------------------------------------------------------
    # Public API (System.h:62-91 analog)
    # ------------------------------------------------------------------

    def prefetch_image(self, img: np.ndarray):
        """Start the async host->device transfer of a FUTURE frame and
        return the device handle to later pass to track_fisheye.

        The reference's per-frame image read+decode happens OUTSIDE its
        timed warp+track region (cubemap_lafida.cpp:128-153: imread at
        134, timer wraps 143-153); over the axon tunnel a synchronous
        0.36 MB upload costs ~33 ms of pure latency, so callers overlap
        the next frame's transfer with the current frame's compute."""
        return jax.device_put(img)

    def track_fisheye(self, fisheye_img: np.ndarray, timestamp: float,
                      mask: Optional[np.ndarray] = None):
        """Warp a fisheye frame to the cubemap cross and track
        (main-loop warp + TrackCubemap, cubemap_lafida.cpp:143-147).

        On TPU the warp runs on device via the pallas tile kernels
        (warp_tpu.py) so only the raw fisheye crosses the host->device
        link; on CPU it runs on host threads via the native C++ plan when
        available, falling back to the fused JAX gather."""
        if jax.default_backend() != "cpu":
            if self._device_warp is None:
                try:
                    from cubemapslam_tpu.warp_tpu import DeviceWarp
                    self._device_warp = DeviceWarp(
                        self.cam, self.cfg.cube_w, self.cfg.cube_h)
                except Exception as e:
                    # visible downgrade: plan-build asserts (tap-range /
                    # window-span violations on a new calibration) are real
                    # regressions, not a silent perf knob
                    import warnings
                    warnings.warn(
                        f"DeviceWarp build failed ({e!r}); falling back "
                        f"to the host warp path", RuntimeWarning)
                    self._device_warp = False
            if (self._device_warp and mask is not None
                    and self.state == TrackState.OK
                    and not self.localization_only
                    and self.stage_times is None):
                # steady-state fast path: warp + extraction + the whole
                # fused tracking program as ONE dispatch (each extra
                # dispatch costs a tunnel RPC; measured ~40 ms/frame of
                # overhead between device cost and frame wall time with
                # the 3-dispatch split)
                return self._track_fisheye_fused(fisheye_img, timestamp,
                                                 mask)
            if self._device_warp:
                # warp + cross assembly as ONE dispatched program: each
                # eager dynamic_update_slice is a separate tunnel dispatch
                if self._frontend_jit is None:
                    from cubemapslam_tpu.warp_tpu import (FACE_CELLS,
                                                          warp_faces_device)
                    dw = self._device_warp
                    fh, fw = self.cfg.cube_face_h, self.cfg.cube_face_w
                    ch, cw = self.cfg.cube_h, self.cfg.cube_w

                    @jax.jit
                    def frontend(args, img):
                        faces = warp_faces_device(dw.plan, args, img)
                        cube = jnp.zeros((ch, cw), jnp.float32)
                        for i, (cx, cy) in enumerate(FACE_CELLS):
                            cube = jax.lax.dynamic_update_slice(
                                cube, faces[i], (cy * fh, cx * fw))
                        return cube

                    self._frontend_jit = frontend
                self._stage_start()
                cube = self._frontend_jit(self._device_warp.args,
                                          jnp.asarray(fisheye_img))
                self._stage("warp", cube)
                return self.track_cubemap(cube, timestamp, mask)
        if self.warp_map is None:
            self.warp_map = W.build_warp_map(self.cam, self.cfg.cube_w,
                                             self.cfg.cube_h)
        if self._native_warp is None:
            try:
                from cubemapslam_tpu.native import NativeWarp
                self._native_warp = NativeWarp(self.warp_map)
            except Exception:
                self._native_warp = False
        if self._native_warp:
            cube = self._native_warp(np.asarray(fisheye_img))
        else:
            cube = W.warp_bilinear(jnp.asarray(fisheye_img), self.warp_map)
        return self.track_cubemap(cube, timestamp, mask)

    def _build_fused_step(self):
        """One jitted program for the whole steady-state frame: device
        warp + cross assembly + ORB extraction + track_frame_full."""
        from cubemapslam_tpu.warp_tpu import FACE_CELLS, warp_faces_device
        dw = self._device_warp
        fh, fw = self.cfg.cube_face_h, self.cfg.cube_face_w
        ch, cw = self.cfg.cube_h, self.cfg.cube_w
        extract = self.extract
        track = self.kernels.track_frame_full

        @functools.partial(jax.jit, donate_argnums=3)
        def step(warp_args, img, mask, arena, last_assoc, last_outlier,
                 last_level, last_angle, rel_R, rel_t, last_ref,
                 vel_R, vel_t, gain, ref_kf, covis, cnt):
            faces = warp_faces_device(dw.plan, warp_args, img)
            cube = jnp.zeros((ch, cw), jnp.float32)
            for i, (cx, cy) in enumerate(FACE_CELLS):
                cube = jax.lax.dynamic_update_slice(
                    cube, faces[i], (cy * fh, cx * fw))
            kp = extract(cube, mask)
            out = track(arena, kp, last_assoc, last_outlier, last_level,
                        last_angle, rel_R, rel_t, last_ref, vel_R, vel_t,
                        gain, ref_kf, covis, cnt)
            return (kp,) + tuple(out)

        return step

    def _track_fisheye_fused(self, fisheye_img, timestamp: float, mask):
        """Steady-state fast path (see track_fisheye)."""
        if self._fused_step_jit is None:
            self._fused_step_jit = self._build_fused_step()
        self.total_frames += 1
        fid = self.frame_id
        self.frame_id += 1
        vel_R, vel_t, gain = self._velocity_args()
        if self._graph_covis is None:
            self._refresh_graph_cache()
        out = self._fused_step_jit(
            self._device_warp.args, jnp.asarray(fisheye_img),
            jnp.asarray(mask), self.arena, self.last.assoc,
            self.last.outlier, self.last.kp.level, self.last.kp.angle,
            self.last.rel_R, self.last.rel_t, jnp.int32(self.last.ref_kf),
            vel_R, vel_t, gain, jnp.int32(self.ref_kf),
            self._graph_covis, self._graph_cnt)
        kp = out[0]
        self._consume_track_outputs(kp, out[1:], fid, timestamp)
        if self.state == TrackState.OK:
            self.tracked_frames += 1
            Rn, tn = self._last_pose_np
            self.trajectory.append((timestamp, Rn, tn))
            T = np.eye(4, dtype=np.float64)
            T[:3, :3] = Rn
            T[:3, 3] = tn
            return T
        return None

    def track_cubemap(self, cube_img, timestamp: float,
                      mask: Optional[np.ndarray] = None):
        """Track one cubemap-cross grayscale frame. Returns 4x4 Tcw or
        None when tracking is not yet established."""
        self.total_frames += 1
        pre_init = self.state in (TrackState.NO_IMAGES_YET,
                                  TrackState.NOT_INITIALIZED)
        extract = self.extract_init if pre_init else self.extract
        self._stage_start()
        kp = extract(jnp.asarray(cube_img),
                     None if mask is None else jnp.asarray(mask))
        self._stage("extract", kp)
        fid = self.frame_id
        self.frame_id += 1
        if self.state in (TrackState.NO_IMAGES_YET,
                          TrackState.NOT_INITIALIZED):
            self._try_initialize(kp, fid, timestamp)
        elif self.state == TrackState.LOST:
            self._relocalize(kp, fid, timestamp)
        else:
            self._track_frame(kp, fid, timestamp)
        if self.state == TrackState.OK:
            self.tracked_frames += 1
            if self._last_pose_np is not None:
                # pose rode the packed per-frame fetch (SLAM path) — a
                # separate np.asarray(R) is another ~26ms tunnel RPC
                Rn, tn = self._last_pose_np
            else:
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
        self.mb_vo = False

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
                self.init_prev_rays = self.init_ref.kp.rays
                self.state = TrackState.NOT_INITIALIZED
            return
        if not self._enough_kp(kp):
            self.init_ref = FrameState()
            return
        m_idx, m_ok, n, self.init_prev_rays = \
            self.kernels.match_for_initialization(
                self.init_ref.kp, kp, self.init_prev_rays)
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
        N = self.cfg.n_features
        # downselect the 3x init keypoint sets to the arena width, keeping
        # triangulated/matched features first (then by response)
        good_j = jnp.asarray(res.good)
        ref_prio = good_j.astype(jnp.float32) * 1e9 + ref.kp.response
        cur_prio = (jnp.zeros(kp.n).at[m_idx].max(
            good_j.astype(jnp.float32) * 1e9) + kp.response)
        ref_red, sel_ref = self.kernels.downselect_keypoints(
            ref.kp, ref_prio, N)
        cur_red, sel_cur = self.kernels.downselect_keypoints(
            kp, cur_prio, N)
        inv_cur = jnp.full((kp.n,), -1, jnp.int32).at[sel_cur].set(
            jnp.arange(N, dtype=jnp.int32))
        Xw_red = Xw[sel_ref]
        good_red = good_j[sel_ref]
        idx2_red = inv_cur[m_idx[sel_ref]]
        good_red &= idx2_red >= 0

        no_assoc = jnp.full((N,), SM.NO_LM, jnp.int32)
        no_out = jnp.zeros(N, bool)
        self.arena = self.kernels.insert_keyframe(
            self.arena, 0, ref_red, no_assoc, no_out, R0, t0,
            ref.frame_id, ref.timestamp)
        self.arena = self.kernels.insert_keyframe(
            self.arena, 1, cur_red, no_assoc, no_out, R1, t1, fid, ts)
        self.n_kf = 2
        kp = cur_red  # the tracked frame continues with the reduced set
        self.arena, n_new = self.mapping.commit_new_landmarks(
            self.arena, 0, 1, Xw_red, good_red, jnp.maximum(idx2_red, 0),
            0, ref.frame_id)
        self.arena = SM.update_landmark_stats(
            self.arena, self.kernels.scale_factors)
        # small global BA (GlobalBundleAdjustemnt(20), Tracking.cpp:513)
        self.arena, _ = self.mapping.local_ba(self.arena, 1, self.ba_cams)
        # current frame assoc = landmarks now attached to KF1 features
        assoc = self.arena.kf_obs_lm[1]
        self.ref_kf = 1
        self._record_frame(kp, assoc, jnp.zeros(kp.n, bool),
                           self.arena.kf_R[1], self.arena.kf_t[1], fid, ts)
        self.last_kf_frame_id = fid
        self.velocity = None
        self.state = TrackState.OK
        self._refresh_graph_cache()
        # train the vocabulary on the bootstrap descriptors (the reference
        # loads a pretrained ORBvoc.txt; ours is domain-trained on the fly
        # at the configured k/depth, then re-trained once more data exists)
        if self.vocab is None:
            desc = np.concatenate([
                np.asarray(ref_red.desc)[np.asarray(ref_red.valid)],
                np.asarray(kp.desc)[np.asarray(kp.valid)]])
            self.vocab = PL.train_vocabulary(
                desc, k=self.cfg.vocab_branching,
                depth=self.cfg.vocab_depth)
            self._vocab_is_bootstrap = True
        self.bow_table = jnp.zeros((self.cfg.max_keyframes,
                                    self.vocab.n_words))
        self._update_bow(0, ref_red)
        self._update_bow(1, kp)
        self.init_ref = FrameState()

    # ------------------------------------------------------------------
    # Per-frame tracking (Track, Tracking.cpp:155-389)
    # ------------------------------------------------------------------

    def _record_frame(self, kp, assoc, outlier, R, t, fid, ts):
        """Store the frame state with its ref-KF-relative pose."""
        self._last_pose_np = None  # host pose not prefetched on this path
        R_ref = self.arena.kf_R[self.ref_kf]
        t_ref = self.arena.kf_t[self.ref_kf]
        Ri, ti = G.se3_inverse(R_ref, t_ref)
        rel_R, rel_t = G.se3_compose(R, t, Ri, ti)
        self.last = FrameState(kp=kp, assoc=assoc, outlier=outlier,
                               R=R, t=t, rel_R=rel_R, rel_t=rel_t,
                               ref_kf=self.ref_kf, frame_id=fid,
                               timestamp=ts)

    def _last_pose(self):
        """Last frame pose re-anchored to the CURRENT ref-KF pose
        (UpdateLastFrame: absorbs whatever BA did to the keyframes)."""
        if self.last.rel_R is None:
            return self.last.R, self.last.t
        R_ref = self.arena.kf_R[self.last.ref_kf]
        t_ref = self.arena.kf_t[self.last.ref_kf]
        return G.se3_compose(self.last.rel_R, self.last.rel_t, R_ref, t_ref)

    def _track_frame(self, kp, fid, ts):
        """Per-frame tracking. The SLAM path runs as ONE fused device
        program (motion -> widen -> ref-KF fallback -> TrackLocalMap, all
        branches on device) with a single packed-scalar fetch; the
        localization-only path keeps the host state machine (mbVO dual
        hypothesis needs host-side relocalization interleaving)."""
        if not self.localization_only:
            return self._track_frame_slam(kp, fid, ts)
        return self._track_frame_localization(kp, fid, ts)

    def _predicted_pose(self):
        """Motion-model pose prediction (Tracking.cpp:626-631).

        cfg.motion_model_damping scales the extrapolated twist: 1.0 is the
        reference's constant-velocity model; 0.0 predicts from the last
        pose. Pose optimization retains a small attraction toward its
        initialization (robust-kernel inlier partitioning), and under
        full extrapolation that bias feeds back on itself — per-frame
        error e grows like (1+beta)^k once per-frame motion noise is large
        relative to the face focal (measured on 160-px-face synthetics:
        x1.5/frame rotation-error growth, while damping 0 merely drifts
        linearly). At dataset scale (650^2 faces, sub-degree per-frame
        motion) the loop gain is < 1 and 1.0 behaves like the reference."""
        R_last, t_last = self._last_pose()
        a = float(self.cfg.motion_model_damping)
        if self.velocity is not None and a > 0.0:
            Rv, tv = self.velocity
            if a < 1.0:
                Rv, tv = G.se3_exp(a * G.se3_log(Rv, tv))
            R_pred, t_pred = G.se3_compose(Rv, tv, R_last, t_last)
        else:
            R_pred, t_pred = R_last, t_last
        return R_last, t_last, R_pred, t_pred

    def _velocity_args(self):
        if self.velocity is not None:
            return (*self.velocity,
                    jnp.float32(self.cfg.motion_model_damping))
        return jnp.eye(3), jnp.zeros(3), jnp.float32(0.0)

    def _track_frame_slam(self, kp, fid, ts):
        k = self.kernels
        # the motion model + last-pose re-anchoring run ON DEVICE inside
        # track_frame_full — eager per-frame 3x3 algebra here would cost
        # one tunnel dispatch per op
        vel_R, vel_t, gain = self._velocity_args()
        if self._graph_covis is None:
            self._refresh_graph_cache()
        out = k.track_frame_full(
            self.arena, kp, self.last.assoc, self.last.outlier,
            self.last.kp.level, self.last.kp.angle,
            self.last.rel_R, self.last.rel_t,
            jnp.int32(self.last.ref_kf), vel_R, vel_t, gain,
            jnp.int32(self.ref_kf), self._graph_covis, self._graph_cnt)
        self._consume_track_outputs(kp, out, fid, ts)

    def _consume_track_outputs(self, kp, out, fid, ts):
        """Host-side epilogue of the fused tracking program: the single
        packed fetch, state transitions, cadence, KF creation/deferred
        BA."""
        (self.arena, assoc, outlier, R, t, packed,
         vel_R, vel_t, rel_R, rel_t) = out
        if hasattr(packed, "copy_to_host_async"):
            packed.copy_to_host_async()
        pk = np.asarray(packed)
        self._stage("track", packed)
        sc = pk[:8]
        local_diag = pk[8:11].astype(int)
        self._last_pose_np = (pk[11:20].reshape(3, 3).astype(np.float64),
                              pk[20:23].astype(np.float64))
        (n, n_inl, n_final, n_ref, live_kf, first_free,
         track_ok, new_ref) = (int(x) for x in sc)
        if not track_ok or n_final < self.cfg.min_track_inliers:
            self._set_lost(kp, fid, ts, live_kf=live_kf)
            return
        # mpReferenceKF = pKFmax, set by TrackLocalMap on device
        # (Tracking.cpp:930-938); rel_R/rel_t are relative to it
        self.ref_kf = new_ref
        # motion model update (Tracking.cpp:307-316) — velocity and the
        # ref-KF-relative pose were computed on device by track_frame_full
        self.velocity = (vel_R, vel_t)
        self.last = FrameState(kp=kp, assoc=assoc, outlier=outlier,
                               R=R, t=t, rel_R=rel_R, rel_t=rel_t,
                               ref_kf=self.ref_kf, frame_id=fid,
                               timestamp=ts)
        self.metrics.append({"frame": fid, "inliers": n_final,
                             "matches": n, "inliers_mm": n_inl,
                             "n_ref": n_ref,
                             "local_frustum": int(local_diag[0]),
                             "local_queried": int(local_diag[1]),
                             "local_matched": int(local_diag[2])})
        self._kf_inlier_peak = max(self._kf_inlier_peak, n_final)
        if self._need_new_keyframe(n_final, n_ref, first_free):
            self._create_keyframe(kp, assoc, outlier, R, t, fid, ts,
                                  slot=first_free)
            self._stage("insert+mapping", self.arena.kf_valid)
        elif self._ba_pending_slot is not None:
            # KF queue empty this frame: run the deferred local BA
            # (LocalMapping.cpp:84-90 — BA only when no new KF is waiting)
            self._dispatch_deferred_ba()
            self._stage("local_ba", self.arena.kf_valid)

    def _track_frame_localization(self, kp, fid, ts):
        k = self.kernels
        R_last, t_last, R_pred, t_pred = self._predicted_pose()

        assoc, n, R, t, outlier, n_inl = k.track_motion_fused(
            self.arena, kp, self.last.assoc, self.last.outlier,
            self.last.kp.level, self.last.kp.angle, R_pred, t_pred,
            radius=15.0)
        if int(n) < 20:  # widen the window (Tracking.cpp:641-648)
            assoc, n, R, t, outlier, n_inl = k.track_motion_fused(
                self.arena, kp, self.last.assoc, self.last.outlier,
                self.last.kp.level, self.last.kp.angle, R_pred, t_pred,
                radius=30.0)

        if self.mb_vo:
            # dual-hypothesis VO mode (Tracking.cpp:231-277): keep the
            # motion-model (VO) result in hand while attempting
            # relocalization; the reloc hypothesis wins when both succeed
            ok_vo = int(n) >= 20
            if self._relocalize(kp, fid, ts):
                self.mb_vo = False
                return
            if not ok_vo:
                self._set_lost(kp, fid, ts)
                return
            R_li, t_li = G.se3_inverse(R_last, t_last)
            self.velocity = G.se3_compose(R, t, R_li, t_li)
            self._record_frame(kp, assoc, outlier, R, t, fid, ts)
            self.mb_vo = int(n_inl) < 10
            self.metrics.append({"frame": fid, "inliers": int(n_inl),
                                 "matches": int(n), "vo": True})
            return

        if int(n) < 20:  # fall back to reference KF (Tracking.cpp:191-200)
            assoc, n = k.track_reference_kf(self.arena, kp,
                                            jnp.int32(self.ref_kf))
            if int(n) < 15:
                self._set_lost(kp, fid, ts)
                return
            R, t, outlier, n_inl = k.optimize_pose(self.arena, kp, assoc,
                                                   R_last, t_last)
        if int(n) < 15 or int(n_inl) < 10:
            if int(n) >= 20:
                # weak map support but live frame-to-frame tracking: enter
                # VO mode instead of LOST (TrackWithMotionModel localization
                # epilogue, Tracking.cpp:670-676)
                self.mb_vo = True
                R_li, t_li = G.se3_inverse(R_last, t_last)
                self.velocity = G.se3_compose(R, t, R_li, t_li)
                self._record_frame(kp, assoc, outlier, R, t, fid, ts)
                self.metrics.append({"frame": fid, "inliers": int(n_inl),
                                     "matches": int(n), "vo": True})
                return
            self._set_lost(kp, fid, ts)
            return
        # mbVO update for the NEXT frame (nmatchesMap<10,
        # Tracking.cpp:670-673); VO mode skips TrackLocalMap
        self.mb_vo = int(n_inl) < 10
        if self.mb_vo:
            R_li, t_li = G.se3_inverse(R_last, t_last)
            self.velocity = G.se3_compose(R, t, R_li, t_li)
            self._record_frame(kp, assoc, outlier, R, t, fid, ts)
            self.metrics.append({"frame": fid, "inliers": int(n_inl),
                                 "matches": int(n), "vo": True})
            return

        # local-map tracking (TrackLocalMap, Tracking.cpp:679-719)
        if self._graph_covis is None:
            self._refresh_graph_cache()
        (self.arena, assoc, outlier, R, t, n_final,
         pkf_max, pkf_votes, _diag) = k.track_local_fused(
            self.arena, kp, assoc, outlier, R, t,
            covis=self._graph_covis)
        n_final_i = int(n_final)
        if n_final_i < self.cfg.min_track_inliers:
            self._set_lost(kp, fid, ts)
            return

        # mpReferenceKF = pKFmax (Tracking.cpp:938) — also in
        # localization-only mode; keep the old reference on empty votes
        if int(pkf_votes) > 0:
            self.ref_kf = int(pkf_max)
        # motion model update (Tracking.cpp:307-316)
        R_last_inv, t_last_inv = G.se3_inverse(R_last, t_last)
        self.velocity = G.se3_compose(R, t, R_last_inv, t_last_inv)
        self._record_frame(kp, assoc, outlier, R, t, fid, ts)
        self.metrics.append({"frame": fid, "inliers": n_final_i,
                             "matches": int(n)})

    def _set_lost(self, kp, fid, ts, live_kf: Optional[int] = None):
        self.state = TrackState.LOST
        # keep last frame for potential relocalization
        self.metrics.append({"frame": fid, "inliers": 0, "matches": 0})
        # reset-if-lost-early uses the LIVE keyframe count
        # (KeyFramesInMap()<=5, Tracking.cpp:296-299)
        if live_kf is None:
            live_kf = int(jnp.sum(self.arena.kf_valid))
        if live_kf <= 5:
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
        self.bow_table = None
        self.mb_vo = False
        self._ba_pending_slot = None
        self._ba_superseded = 0
        self._kf_inlier_peak = 0
        self._graph_covis = None
        self._graph_cnt = None
        self.loop_closer.reset()

    def _update_bow(self, slot: int, kp):
        if self.vocab is None:
            return
        row = PL.bow_vector(self.vocab, kp.desc, kp.valid)
        self.bow_table = self.bow_table.at[slot].set(row)

    def _maybe_retrain_vocab(self):
        """One-time vocabulary re-train on accumulated keyframe descriptors
        (the bootstrap vocab saw only 2 frames; the reference's offline-
        trained vocab sees a whole corpus, ORBVocabulary.h:36-37). The BoW
        table is recomputed for every live keyframe afterwards."""
        if not self._vocab_is_bootstrap:
            return
        # host-counter gate first: n_kf >= live count, so this avoids any
        # device fetch until a retrain is at least possible
        if self.n_kf < self.cfg.vocab_retrain_keyframes:
            return
        valid = np.asarray(self.arena.kf_valid)
        if int(valid.sum()) < self.cfg.vocab_retrain_keyframes:
            return
        desc = np.asarray(self.arena.kf_desc)[valid]
        kp_ok = np.asarray(self.arena.kf_kp_valid)[valid]
        train = desc.reshape(-1, 8)[kp_ok.reshape(-1)]
        self.vocab = PL.train_vocabulary(
            train, k=self.cfg.vocab_branching, depth=self.cfg.vocab_depth)
        self._vocab_is_bootstrap = False
        self.bow_table = self._recompute_bow_table()

    def _recompute_bow_table(self):
        rows = jax.vmap(lambda d, v: PL.bow_vector(self.vocab, d, v))(
            self.arena.kf_desc, self.arena.kf_kp_valid)
        return jnp.where(self.arena.kf_valid[:, None], rows, 0.0)

    # ------------------------------------------------------------------
    # Relocalization (Tracking::Relocalization, Tracking.cpp:990-1151)
    # ------------------------------------------------------------------

    def _relocalize(self, kp, fid, ts) -> bool:
        if self.vocab is None or self.bow_table is None:
            return False
        k = self.kernels
        n_cand = 5
        qbow = PL.bow_vector(self.vocab, kp.desc, kp.valid)
        if self._graph_covis is None:
            self._refresh_graph_cache()
        covis = self._graph_covis
        cand_idx, cand_ok = PL.detect_candidates(
            qbow, self.bow_table, self.arena.kf_valid,
            jnp.zeros(self.arena.n_kf_cap, bool), covis, jnp.float32(0.0))
        # all <=5 candidates evaluated in ONE vmapped program (match + PnP
        # RANSAC + pose opt), then one widening program for the best — two
        # device round-trips total instead of 4+ per candidate
        self.key, sub = jax.random.split(self.key)
        keys = jax.random.split(sub, n_cand)
        assoc_c, R_c, t_c, out_c, score_c = k.reloc_candidates_fused(
            self.arena, kp, cand_idx[:n_cand], cand_ok[:n_cand], keys)
        scores = np.asarray(score_c)
        if scores.max() < 0:
            return False
        for i in np.argsort(-scores):
            if scores[i] < 0:
                break
            assoc2, R, t, outlier, n3 = k.reloc_widen_fused(
                self.arena, kp, assoc_c[i], out_c[i], R_c[i], t_c[i])
            if int(n3) < self.cfg.min_track_inliers_after_reloc:
                continue
            self.ref_kf = int(cand_idx[i])
            self._record_frame(kp, assoc2, outlier, R, t, fid, ts)
            self.velocity = None
            self.state = TrackState.OK
            self.mb_vo = False
            self._kf_inlier_peak = 0
            return True
        return False

    # ------------------------------------------------------------------
    # Keyframe decision + creation (Tracking.cpp:721-792)
    # ------------------------------------------------------------------

    def _free_kf_slot(self) -> int:
        """First free arena slot, or -1 when the arena is full (culling is
        the only way slots free up — mirrored from KeyFrame::SetBadFlag
        recycling, KeyFrame.cpp:456-570)."""
        valid = np.asarray(self.arena.kf_valid)
        free = np.where(~valid)[0]
        return int(free[0]) if len(free) else -1

    def _need_new_keyframe(self, n_inliers: int, n_ref: int,
                           first_free: int) -> bool:
        """NeedNewKeyFrame (Tracking.cpp:721-774). n_ref and first_free
        arrive in the per-frame packed scalars — no extra device fetch."""
        frames_since = self.frame_id - self.last_kf_frame_id
        # (frames_since is 2 on the very next frame after an insertion:
        # frame_id is post-incremented)
        if frames_since < 2 + self.cfg.min_keyframe_gap:
            return False
        c1a = frames_since >= self.cfg.fps  # mMaxFrames = fps
        # c2 redesigned (see SlamConfig.keyframe_inlier_decay): insert
        # when tracking DECAYS below decay * peak-since-last-insertion
        # (single-frame trigger: under fast motion inliers can halve per
        # frame, and a confirmation lag of even one frame loses tracking
        # before the insertion lands — measured on the fast-motion e2e),
        # when tracking is absolutely WEAK (within 2x of the loss
        # threshold — the map is about to die regardless of ratios), or
        # when the local map is too young/thin for coverage to mean
        # anything (mature reference count below the floor).
        bar = self.cfg.keyframe_inlier_decay * self._kf_inlier_peak
        c2_decay = n_inliers < bar
        c2_weak = n_inliers < max(
            2 * self.cfg.min_track_inliers,
            int(self.cfg.keyframe_health_floor_frac * self.cfg.n_features))
        c2_young = n_ref < self.cfg.keyframe_mature_floor
        want = bool((c1a or c2_decay or c2_weak or c2_young)
                    and n_inliers > 15)
        if want and first_free < 0:
            # arena truly full (even culling freed nothing): refuse loudly
            self.arena_full_refusals += 1
            if self.arena_full_refusals == 1:
                import warnings
                warnings.warn(
                    f"keyframe arena full ({self.cfg.max_keyframes} slots, "
                    f"none culled) — refusing new keyframes; raise "
                    f"max_keyframes", RuntimeWarning)
            return False
        return want

    def _create_keyframe(self, kp, assoc, outlier, R, t, fid, ts,
                         slot: Optional[int] = None):
        if slot is None:
            slot = self._free_kf_slot()
        assert slot >= 0
        self.arena = self.kernels.insert_keyframe(
            self.arena, slot, kp, assoc, outlier, R, t, fid, ts)
        self.n_kf += 1
        self.ref_kf = slot
        self.last_kf_frame_id = fid
        # cadence baseline re-establishes from the enriched post-mapping
        # map (the first post-insertion frames set the new peak)
        self._kf_inlier_peak = 0
        self._update_bow(slot, kp)
        # the frame that spawned this KF is re-anchored to it exactly
        self.last.ref_kf = slot
        self.last.rel_R = jnp.eye(3)
        self.last.rel_t = jnp.zeros(3)
        self._maybe_retrain_vocab()
        self._local_mapping(slot)
        if self.loop_closing_enabled:
            if self.loop_closer.process(self, slot):
                self.n_loops_closed += 1
        # Refresh the live frame's associations from the keyframe's
        # observation row: mapping just fused/culled/triangulated, so the
        # row holds the redirected + ENRICHED landmark set for exactly this
        # frame's keypoints (ORB-SLAM2's CheckReplacedInLastFrame pointer
        # forwarding, plus the new triangulations). Without this the next
        # frame's motion matcher queries stale landmark ids and starves.
        self.last.assoc = self.arena.kf_obs_lm[slot]
        self.last.outlier = jnp.zeros_like(self.last.outlier)
        # mapping/loop closing rewired the observation graph
        self._refresh_graph_cache()

    # ------------------------------------------------------------------
    # Local mapping pipeline (LocalMapping::Run body per KF)
    # ------------------------------------------------------------------

    def _local_mapping(self, slot: int):
        """One fused fire-and-forget device program (mapping_step); the
        host never syncs on mapping, so the next frame's host work (render/
        load/dispatch) overlaps it — the functional analog of the
        reference's LocalMapping thread (System.cpp:108-128).

        Local BA does NOT run here: it is deferred to the first subsequent
        frame with no keyframe insertion (the reference runs BA only when
        its KF queue is empty and aborts it when a new KF arrives,
        LocalMapping.cpp:84-90); see _dispatch_deferred_ba."""
        fid = self.last_kf_frame_id
        self.arena, self._last_mapping_info = self.mapping.mapping_step(
            self.arena, jnp.int32(slot), jnp.int32(self.n_kf),
            jnp.int32(fid), max_cams=self.ba_cams,
            run_ba=False, run_cull=True)
        # a BA pending from an older keyframe is superseded (mbAbortBA):
        # the new keyframe's deferred BA covers the same neighborhood.
        # BOUNDED starvation: under sustained per-frame insertion the
        # deferral would never fire, accumulating unoptimized drift that
        # feeds the chi2 gates (measured: KF-per-frame stretches ran with
        # zero BA and the triangulation chi2 kill rate tripled) — after 2
        # supersessions the pending BA runs before being replaced.
        if self._ba_pending_slot is not None:
            self._ba_superseded += 1
            if self._ba_superseded >= 2:
                self._dispatch_deferred_ba()
        if self.n_kf > 2:
            self._ba_pending_slot = slot

    def _refresh_graph_cache(self):
        """Recompute the cached covisibility/observation-count views
        (fire-and-forget device dispatch)."""
        self._graph_covis, self._graph_cnt = self.kernels.graph_cache(
            self.arena)

    def _dispatch_deferred_ba(self):
        """Run the deferred local BA for the most recent keyframe
        (fire-and-forget; the next frame's sync absorbs its latency)."""
        slot = self._ba_pending_slot
        self._ba_pending_slot = None
        self._ba_superseded = 0
        if slot is None:
            return
        # ba_step no-ops on device if the slot was culled meanwhile — no
        # host-side validity fetch (a blocking pull costs ~26ms over the
        # TPU tunnel)
        self.arena = self.mapping.ba_step(self.arena, jnp.int32(slot),
                                          max_cams=self.ba_cams)
        # BA removes outlier observations — refresh the graph views
        self._refresh_graph_cache()

    # ------------------------------------------------------------------
    # Output (System::SaveKeyFrameTrajectoryTUM, System.cpp:238-268)
    # ------------------------------------------------------------------

    def keyframe_trajectory(self) -> List[Tuple[float, np.ndarray,
                                                np.ndarray]]:
        """(timestamp, quat_xyzw, t_wc) per good keyframe in temporal order
        (slots are recycled, so order by frame id), TUM convention
        (camera-to-world)."""
        out = []
        valid = np.asarray(self.arena.kf_valid)
        Rs = np.asarray(self.arena.kf_R)
        tss = np.asarray(self.arena.kf_timestamp)
        ts_ = np.asarray(self.arena.kf_t)
        fids = np.asarray(self.arena.kf_frame_id)
        order = np.argsort(np.where(valid, fids, np.iinfo(np.int32).max))
        for k in order:
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
