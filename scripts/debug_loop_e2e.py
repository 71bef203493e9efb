"""Replicates tests/test_loop_e2e.py::test_closes_loop_and_reduces_ate
with CUBEMAP_LOOP_DEBUG prints (candidate/consistency tracing) to debug
why a cadence change stops loops from closing. CPU, ~15 min."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("CUBEMAP_LOOP_DEBUG", "1")

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), "..", "tests"))
from test_loop_e2e import loop_cfg, pretrained_vocab, ate_of  # noqa: E402
from cubemapslam_tpu.runtime.system import CubemapSLAM, TrackState  # noqa
from cubemapslam_tpu.synth import (Renderer, loop_trajectory,  # noqa: E402
                                   make_world)
from cubemapslam_tpu.warp import fov_mask  # noqa: E402


def main():
    rng = np.random.default_rng(42)
    n_frames, n_loops = 170, 1.25
    poses = loop_trajectory(n_frames, radius=3.0, n_loops=n_loops,
                            facing="tangent")
    centers_gt = np.stack([-R.T @ t for R, t in poses])
    pts, patches = make_world(rng, n=1500, centers=centers_gt)

    probe = CubemapSLAM(loop_cfg())
    mask = fov_mask(probe.cam, probe.cfg.cube_w, probe.cfg.cube_h)
    ren = Renderer(probe.cam, probe.cfg, "cubemap")
    import tempfile
    import pathlib
    tmp = pathlib.Path(tempfile.mkdtemp())
    voc = pretrained_vocab(rng, pts, patches, ren, probe.extract, mask, tmp)

    slam = CubemapSLAM(loop_cfg(vocab_path=voc))
    for k, (R, t) in enumerate(poses):
        img = ren.render(pts, patches, R, t)
        slam.track_cubemap(jnp.asarray(img), k * 0.1, mask=mask)
        if k % 10 == 0:
            m = slam.metrics[-1] if slam.metrics else {}
            print(f"f{k:3d} {slam.state.name:4.4s} kf={slam.n_kf:3d} "
                  f"live={int(np.asarray(slam.arena.kf_valid).sum()):3d} "
                  f"loops={slam.n_loops_closed} "
                  f"inl={m.get('inliers', 0)}", flush=True)
    print(f"loops={slam.n_loops_closed} state={slam.state.name} "
          f"ate={ate_of(slam, centers_gt):.4f}")


if __name__ == "__main__":
    main()
