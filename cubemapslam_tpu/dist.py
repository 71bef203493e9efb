"""Distributed global bundle adjustment over a device mesh.

A capability with no reference counterpart (SURVEY.md §2.3, §7 step 10): the
reference is single-process CPU; here global BA scales over TPU chips by
partitioning the observation edge list into keyframe blocks, one shard per
device. Camera and landmark tables are replicated; every segment-sum into a
table inside the Schur-CG operator is followed by a psum over the mesh axis
(see optim/ba.py), so devices exchange only the reduced O(M*6 + P*3)
accumulators over ICI while each touches only its own O(E/n) edges.

The edge partition is free to follow covisibility clusters (keyframe blocks
share landmarks mostly within a block), which keeps the psum'd accumulators
sparse in practice; correctness does not depend on the clustering.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from cubemapslam_tpu import slam_map as SM
from cubemapslam_tpu.camera import CubemapCamera, cubemap_uv_to_in_face
from cubemapslam_tpu.optim.ba import BAProblem, bundle_adjust

AXIS = "kf_block"


def make_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (AXIS,))


def partition_edges_by_camera(obs_cam: np.ndarray,
                              n_shards: int) -> list:
    """Keyframe-block edge partition: ALL edges of one keyframe land on one
    shard, shards balanced by edge count (greedy largest-camera-first
    binning). Returns a list of ``n_shards`` edge-index arrays. Keeping a
    keyframe's edges together makes each device's segment-sum accumulators
    touch only its own keyframes' camera blocks, so the post-psum reduced
    system stays covisibility-local in practice."""
    obs_cam = np.asarray(obs_cam)
    cams, inv, counts = np.unique(obs_cam, return_inverse=True,
                                  return_counts=True)
    shard_of_cam = np.zeros(len(cams), np.int32)
    loads = np.zeros(n_shards, np.int64)
    for ci in np.argsort(-counts, kind="stable"):
        s = int(np.argmin(loads))
        shard_of_cam[ci] = s
        loads[s] += counts[ci]
    edge_shard = shard_of_cam[inv]
    return [np.where(edge_shard == s)[0] for s in range(n_shards)]


def shard_ba_problem(prob: BAProblem, n_shards: int) -> BAProblem:
    """Reorder + pad the edge arrays into ``n_shards`` equal keyframe blocks
    (each keyframe's edges contiguous on one shard; shards padded to the
    largest block with masked-out edges)."""
    blocks = partition_edges_by_camera(prob.obs_cam, n_shards)
    S = max(len(b) for b in blocks)

    def layout(x, fill=0):
        x = np.asarray(x)
        out = np.full((n_shards * S,) + x.shape[1:], fill, x.dtype)
        for s, b in enumerate(blocks):
            out[s * S:s * S + len(b)] = x[b]
        return jnp.asarray(out)

    return prob._replace(
        obs_cam=layout(prob.obs_cam),
        obs_pt=layout(prob.obs_pt),
        obs_face=layout(prob.obs_face),
        obs_uv=layout(prob.obs_uv),
        obs_inv_sigma2=layout(prob.obs_inv_sigma2),
        obs_valid=layout(prob.obs_valid, fill=False))


def distributed_bundle_adjust(cam: CubemapCamera, prob: BAProblem,
                              mesh: Mesh,
                              phase_iters: Tuple[int, ...] = (5, 10),
                              cg_iters: int = 30):
    """Run bundle_adjust as one SPMD program over the mesh.

    ``prob`` must have edge arrays divisible by the mesh size (use
    shard_ba_problem). Returns (updated problem, edge inliers in the
    sharded order).
    """
    n = mesh.devices.size
    assert prob.obs_cam.shape[0] % n == 0

    rep = P()
    shd = P(AXIS)
    in_specs = BAProblem(
        R=rep, t=rep, cam_fixed=rep, cam_valid=rep, X=rep, pt_valid=rep,
        obs_cam=shd, obs_pt=shd, obs_face=shd, obs_uv=shd,
        obs_inv_sigma2=shd, obs_valid=shd)
    out_specs = (in_specs, shd)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(in_specs,),
        out_specs=out_specs, check_vma=False)
    def run(p):
        out, inl = bundle_adjust(cam, p, phase_iters=phase_iters,
                                 cg_iters=cg_iters, axis_name=AXIS)
        return out, inl

    return jax.jit(run)(prob)


def global_ba_problem_from_arena(cam: CubemapCamera, arena: SM.MapArena,
                                 inv_level_sigma2: jnp.ndarray
                                 ) -> BAProblem:
    """Build the full-map BA problem (GlobalBundleAdjustemnt analog,
    Optimizer.cpp:453-621): all valid KFs free except KF 0, all valid
    landmarks."""
    kf_idx, lm, face, uv_face, inv_s2, live = SM.ba_edges_from_arena(
        cam, arena, arena.kf_valid, inv_level_sigma2)
    cam_fixed = jnp.zeros(arena.n_kf_cap, bool).at[0].set(True)
    return BAProblem(
        R=arena.kf_R, t=arena.kf_t, cam_fixed=cam_fixed,
        cam_valid=arena.kf_valid, X=arena.lm_pos,
        pt_valid=arena.lm_valid, obs_cam=kf_idx, obs_pt=lm,
        obs_face=face, obs_uv=uv_face, obs_inv_sigma2=inv_s2,
        obs_valid=live)


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded global-BA step on tiny shapes over an
    ``n_devices`` mesh (driver validation hook)."""
    import numpy as np
    from cubemapslam_tpu.config import SlamConfig
    from cubemapslam_tpu import geometry as G

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = make_mesh(devices)
    cfg = SlamConfig(cube_face_w=64, cube_face_h=64)
    cam = CubemapCamera.from_config(cfg)
    rng = np.random.default_rng(0)
    M, Pn = 8, 64
    pts = rng.uniform(-2, 2, (Pn, 3)).astype(np.float32)
    pts[:, 2] += 5.0
    Rs, ts = [], []
    for k in range(M):
        Rs.append(np.asarray(G.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.02, jnp.float32))))
        ts.append(np.asarray([0.2 * k, 0, 0], np.float32))
    obs_cam, obs_pt, obs_face, obs_uv = [], [], [], []
    from cubemapslam_tpu import camera as C
    for ci in range(M):
        pc = (Rs[ci] @ pts.T).T + ts[ci]
        uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
        uvf = cubemap_uv_to_in_face(cam, uv)
        ok = np.asarray(face) >= 0
        for pi in np.where(ok)[0]:
            obs_cam.append(ci)
            obs_pt.append(pi)
            obs_face.append(int(face[pi]))
            obs_uv.append(np.asarray(uvf[pi]))
    E = len(obs_cam)
    prob = BAProblem(
        R=jnp.asarray(np.stack(Rs)), t=jnp.asarray(np.stack(ts)),
        cam_fixed=jnp.asarray([True] + [False] * (M - 1)),
        cam_valid=jnp.ones(M, bool),
        X=jnp.asarray(pts + rng.normal(0, 0.01, pts.shape).astype(
            np.float32)),
        pt_valid=jnp.ones(Pn, bool),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_pt=jnp.asarray(obs_pt, jnp.int32),
        obs_face=jnp.asarray(obs_face, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv), jnp.float32),
        obs_inv_sigma2=jnp.ones(E, jnp.float32),
        obs_valid=jnp.ones(E, bool))
    prob = shard_ba_problem(prob, n_devices)
    out, inl = distributed_bundle_adjust(cam, prob, mesh,
                                         phase_iters=(2, 2), cg_iters=8)
    jax.block_until_ready(out.R)
    assert np.isfinite(np.asarray(out.R)).all()
    assert np.isfinite(np.asarray(out.X)).all()
