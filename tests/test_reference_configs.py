"""Drop-in parity with the reference's shipped calibrations.

Loads the actual Config/*.yaml files from the mounted reference repo
(read-only) and checks that the camera model, warp plans, and extractor
plans build and behave sanely for every calibration the reference ships
(System.cpp:63-91 key set). Skipped when the reference is not mounted.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import warp as W
from cubemapslam_tpu.camera import CubemapCamera
from cubemapslam_tpu.config import load_config
from cubemapslam_tpu.features.extractor import plan_levels

_REF = "/root/reference/Config"
_YAMLS = ["lafida_cam0_params.yaml", "front_cam_params.yaml",
          "left_cam_params.yaml"]

pytestmark = pytest.mark.skipif(not os.path.isdir(_REF),
                                reason="reference repo not mounted")


@pytest.mark.parametrize("name", _YAMLS)
def test_reference_yaml_loads_and_roundtrips(name):
    cfg = load_config(os.path.join(_REF, name))
    # the reference ships 650^2 faces and 190deg FOV for all three rigs
    assert cfg.cube_face_w == 650 and cfg.cube_face_h == 650
    assert abs(cfg.fov_deg - 190.0) < 1e-6
    assert cfg.n_levels == 8 and abs(cfg.scale_factor - 1.2) < 1e-9

    cam = CubemapCamera.from_config(cfg)
    # fisheye <-> ray round-trip on interior pixels
    rng = np.random.default_rng(0)
    uv = jnp.asarray(np.stack([
        rng.uniform(cfg.fisheye_width * 0.3, cfg.fisheye_width * 0.7, 64),
        rng.uniform(cfg.fisheye_height * 0.3, cfg.fisheye_height * 0.7, 64),
    ], -1), jnp.float32)
    rays = C.img_to_ray(cam, uv)
    uv2 = C.ray_to_img(cam, rays)
    err = np.linalg.norm(np.asarray(uv2 - uv), axis=-1)
    assert np.median(err) < 0.5, np.median(err)

    # warp map: a sensible fraction of the cross is valid
    wm = W.build_warp_map(cam, cfg.cube_w, cfg.cube_h)
    frac = float(np.asarray(wm.valid).mean())
    assert 0.25 < frac < 5.0 / 9.0 + 1e-6, frac

    # extractor plan at the configured feature budget
    params = plan_levels(cfg.n_features, cfg.n_levels, cfg.scale_factor,
                         (cfg.cube_h, cfg.cube_w))
    assert params.n_features == cfg.n_features
