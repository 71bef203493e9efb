"""Dataset runner: the cubemap_lafida / cubemap_fangshan CLI equivalent.

Same positional contract as the reference binaries
(cubemap_lafida.cpp:67-83):

    python -m cubemapslam_tpu.apps.run_sequence \
        VOC SETTINGS_YAML IMG_DIR IMG_LIST MASK TRAJ_OUT [PERF_OUT]

* VOC: a pretrained vocabulary npz (scripts/train_vocab.py, the ORBvoc.txt
  analog), a saved map npz (localization on a prebuilt map), or "none"
  (the vocabulary is then trained on the fly from the bootstrap keyframes).
* SETTINGS_YAML: a reference-format calibration (Config/*.yaml loads
  unmodified).
* IMG_LIST: Lafida format "id ts path" lines or plain filenames (fangshan
  style, timestamp parsed from the name; cubemap_fangshan.cpp:90-102).
* MASK: a fisheye-space or cubemap-space mask PNG, or "none" (an FOV-cone
  mask is derived from the calibration).

Writes the TUM keyframe trajectory and the perf summary the reference
prints at exit (median/mean tracking time, tracked-frames ratio;
cubemap_lafida.cpp:159-179).
"""

from __future__ import annotations

import os
import sys
import time
from typing import List, Optional, Tuple

import numpy as np


def read_image_list(img_dir: str, list_path: str
                    ) -> List[Tuple[float, str]]:
    """Lafida 'id ts filename' triplets (cubemap_lafida.cpp:91-107) or bare
    filenames with the timestamp parsed from the stem
    (cubemap_fangshan.cpp:90-102)."""
    out = []
    with open(list_path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 3:
                ts = float(parts[1])
                name = parts[2]
            else:
                name = parts[0]
                stem = os.path.splitext(os.path.basename(name))[0]
                digits = "".join(c for c in stem if c.isdigit() or c == ".")
                try:
                    ts = float(digits)
                except ValueError:
                    ts = float(len(out))
            out.append((ts, os.path.join(img_dir, name)))
    return out


def load_gray(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("L"), np.float32)


def main(argv: Optional[List[str]] = None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 6:
        print(__doc__)
        return 1
    voc_path, settings, img_dir, img_list, mask_path, traj_out = argv[:6]
    perf_out = argv[6] if len(argv) > 6 else None

    import jax.numpy as jnp
    from cubemapslam_tpu.config import load_config
    from cubemapslam_tpu.runtime.system import CubemapSLAM
    from cubemapslam_tpu import warp as W
    from cubemapslam_tpu import serialize

    if settings in ("none", "None", ""):
        # built-in defaults ARE the Lafida cam0 calibration
        # (Config/lafida_cam0_params.yaml values, config.py)
        from cubemapslam_tpu.config import SlamConfig
        cfg = SlamConfig()
    else:
        cfg = load_config(settings)
    slam = CubemapSLAM(cfg)
    if voc_path not in ("none", "None", "") and os.path.exists(voc_path):
        from cubemapslam_tpu import place as PL
        with np.load(voc_path) as z:
            is_vocab = "centers_0" in z
        if is_vocab:
            # pretrained vocabulary artifact (scripts/train_vocab.py —
            # the ORBvoc.txt analog, ORBVocabulary.h:36-37)
            slam.vocab = PL.load_vocabulary(voc_path)
            print(f"loaded vocabulary ({slam.vocab.n_words} words) "
                  f"from {voc_path}")
        else:
            # prebuilt map checkpoint: localize against it
            serialize.load_map(slam, voc_path)
            print(f"loaded map from {voc_path}")

    images = read_image_list(img_dir, img_list)
    print(f"{len(images)} images in sequence")

    # mask: fisheye-space PNG is warped to the cubemap; cubemap-sized PNG
    # is used directly; otherwise derive the FOV cone mask
    wm = W.build_warp_map(slam.cam, cfg.cube_w, cfg.cube_h)
    slam.warp_map = wm
    if mask_path not in ("none", "None", "") and os.path.exists(mask_path):
        m = load_gray(mask_path)
        if m.shape == (cfg.cube_h, cfg.cube_w):
            mask = jnp.asarray((m > 0).astype(np.float32))
        else:
            mask = (W.warp_nearest(jnp.asarray(m), wm) > 0).astype(
                jnp.float32)
        mask = mask * W.fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)
    else:
        mask = W.fov_mask(slam.cam, cfg.cube_w, cfg.cube_h)

    from cubemapslam_tpu.native import make_loader
    loader = make_loader([p for _, p in images],
                         n_workers=int(os.environ.get("DL_WORKERS", "4")))
    # per-stage device tracing (SURVEY.md §5): set CUBEMAP_PROFILE=/dir to
    # capture a jax.profiler trace of the first 50 frames for xprof
    prof_dir = os.environ.get("CUBEMAP_PROFILE")
    if prof_dir:
        import jax
        jax.profiler.start_trace(prof_dir)
    times = []
    for i, (idx, img) in enumerate(loader):
        ts = images[idx][0]
        if img is None:
            img = load_gray(images[idx][1])
        t0 = time.perf_counter()
        slam.track_fisheye(img, ts, mask=mask)
        dt = time.perf_counter() - t0
        times.append(dt)
        if i % 50 == 0:
            print(f"frame {i}/{len(images)} state={slam.state.name} "
                  f"kf={slam.n_kf} {dt*1000:.0f}ms")

        if prof_dir and i == 50:
            import jax
            jax.profiler.stop_trace()
            prof_dir = None
    if prof_dir:
        import jax
        jax.profiler.stop_trace()
    slam.save_keyframe_trajectory_tum(traj_out)
    med = float(np.median(times))
    mean = float(np.mean(times))
    ratio = slam.tracked_frames / max(slam.total_frames, 1)
    print(f"median tracking time: {med*1000:.1f} ms")
    print(f"mean tracking time: {mean*1000:.1f} ms")
    print(f"tracked frames ratio: {ratio:.3f}")
    if perf_out:
        with open(perf_out, "w") as f:
            f.write(f"median_tracking_time_s {med:.6f}\n")
            f.write(f"mean_tracking_time_s {mean:.6f}\n")
            f.write(f"tracked_frames_ratio {ratio:.6f}\n")
            f.write(f"loops_closed {slam.n_loops_closed}\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
