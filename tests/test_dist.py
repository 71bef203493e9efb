"""Distributed BA: sharded result must match single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import dist as D
from cubemapslam_tpu.camera import CubemapCamera, cubemap_uv_to_in_face
from cubemapslam_tpu.config import SlamConfig
from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust


def build_problem(rng, cam, n_cams=6, n_pts=80):
    pts = rng.uniform(-2, 2, (n_pts, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    Rs, ts = [], []
    for k in range(n_cams):
        Rs.append(np.asarray(G.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.03, jnp.float32))))
        ts.append((np.array([0.3 * k, 0, 0])
                   + rng.normal(0, 0.01, 3)).astype(np.float32))
    obs = []
    for ci in range(n_cams):
        pc = (Rs[ci] @ pts.T).T + ts[ci]
        uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
        uvf = np.asarray(cubemap_uv_to_in_face(cam, uv))
        face = np.asarray(face)
        for pi in np.where(face >= 0)[0]:
            obs.append((ci, pi, face[pi],
                        uvf[pi] + rng.normal(0, 0.3, 2)))
    E = len(obs)
    X0 = pts + rng.normal(0, 0.03, pts.shape).astype(np.float32)
    return BAProblem(
        R=jnp.asarray(np.stack(Rs)), t=jnp.asarray(np.stack(ts)),
        cam_fixed=jnp.asarray([True] + [False] * (n_cams - 1)),
        cam_valid=jnp.ones(n_cams, bool),
        X=jnp.asarray(X0), pt_valid=jnp.ones(n_pts, bool),
        obs_cam=jnp.asarray([o[0] for o in obs], jnp.int32),
        obs_pt=jnp.asarray([o[1] for o in obs], jnp.int32),
        obs_face=jnp.asarray([o[2] for o in obs], jnp.int32),
        obs_uv=jnp.asarray(np.stack([o[3] for o in obs]), jnp.float32),
        obs_inv_sigma2=jnp.ones(E, jnp.float32),
        obs_valid=jnp.ones(E, bool)), pts


class TestDistributedBA:
    def test_matches_single_device(self, lafida_cam, rng):
        prob, pts_gt = build_problem(rng, lafida_cam)
        # single-device reference (on the padded/reordered problem so edge
        # order is identical)
        n_dev = len(jax.devices())
        assert n_dev >= 8, "conftest must force an 8-device CPU mesh"
        prob_s = D.shard_ba_problem(prob, 8)
        ref, ref_inl = bundle_adjust(lafida_cam, prob_s, cg_iters=20)
        mesh = D.make_mesh(jax.devices()[:8])
        out, inl = D.distributed_bundle_adjust(lafida_cam, prob_s, mesh,
                                               cg_iters=20)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(inl), np.asarray(ref_inl))
        # and it actually solves the problem
        err = np.linalg.norm(np.asarray(out.X) - pts_gt, axis=1)
        assert np.median(err) < 0.02

    def test_dryrun_hook(self):
        D.dryrun(4)

    def test_sharded_points_matches_single_device(self, lafida_cam, rng):
        """Landmark-ownership sharding (boundary-only point exchange,
        SURVEY §7 step 10) must produce the same solution as the
        replicated-table solve."""
        prob, pts_gt = build_problem(rng, lafida_cam)
        sharded = D.shard_ba_problem(prob, 8, shard_points=True)
        assert 0 < sharded.n_boundary <= prob.X.shape[0]
        # ownership is well-formed: every observed point has an owner,
        # interior points' edges all live on the owner's shard
        owner = np.asarray(sharded.owner_shard)
        obs_pt = np.asarray(sharded.prob.obs_pt)
        obs_ok = np.asarray(sharded.prob.obs_valid)
        E = obs_pt.shape[0]
        shard_of_edge = np.repeat(np.arange(8), E // 8)
        for p in np.unique(obs_pt[obs_ok]):
            shards = np.unique(shard_of_edge[obs_ok & (obs_pt == p)])
            if p >= sharded.n_boundary:          # interior
                assert len(shards) == 1 and shards[0] == owner[p]
        ref, ref_inl = bundle_adjust(lafida_cam, sharded.prob,
                                     cg_iters=20)
        mesh = D.make_mesh(jax.devices()[:8])
        out, inl = D.distributed_bundle_adjust(lafida_cam, sharded, mesh,
                                               cg_iters=20)
        np.testing.assert_allclose(np.asarray(out.R), np.asarray(ref.R),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                                   atol=1e-3)
        np.testing.assert_array_equal(np.asarray(inl),
                                      np.asarray(ref_inl))
        err = np.linalg.norm(np.asarray(out.X)[
            np.argsort(sharded.point_perm)] - pts_gt, axis=1)
        assert np.median(err) < 0.02

    def test_partition_honors_keyframe_blocks(self, rng):
        obs_cam = rng.integers(0, 17, 4000).astype(np.int32)
        n_shards = 4
        blocks = D.partition_edges_by_camera(obs_cam, n_shards)
        # complete + disjoint
        all_idx = np.sort(np.concatenate(blocks))
        np.testing.assert_array_equal(all_idx, np.arange(len(obs_cam)))
        # each camera's edges land on exactly ONE shard
        shard_of = np.zeros(len(obs_cam), np.int32)
        for s, b in enumerate(blocks):
            shard_of[b] = s
        for c in np.unique(obs_cam):
            assert len(np.unique(shard_of[obs_cam == c])) == 1
        # balanced by edge count (greedy bound: max <= mean + max cam size)
        sizes = np.array([len(b) for b in blocks])
        biggest_cam = np.bincount(obs_cam).max()
        assert sizes.max() <= sizes.mean() + biggest_cam
