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
from typing import NamedTuple, Optional, Tuple

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


class ShardedBA(NamedTuple):
    """A keyframe-block-sharded BA problem with LANDMARK OWNERSHIP
    (SURVEY §7 step 10): each point is owned by the block observing it
    most; points observed by >=2 blocks ("boundary") are permuted to the
    front of the point table so the SPMD solver exchanges ONLY their
    accumulators per CG iteration (optim.ba._psum_pts)."""

    prob: BAProblem
    edge_perm: np.ndarray     # (E_sharded,) -> original edge idx (-1 pad)
    point_perm: np.ndarray    # (P,) new position -> original point idx
    owner_shard: jnp.ndarray  # (P,) int32 owning shard (new order; -1 none)
    n_boundary: int           # boundary-prefix length (static)


def shard_ba_problem(prob: BAProblem, n_shards: int,
                     return_perm: bool = False,
                     shard_points: bool = False):
    """Reorder + pad the edge arrays into ``n_shards`` equal keyframe blocks
    (each keyframe's edges contiguous on one shard; shards padded to the
    largest block with masked-out edges). With return_perm, also returns
    perm (E_sharded,) int64 mapping layout position -> original edge index
    (-1 for padding), for scattering per-edge results back.

    shard_points=True additionally assigns LANDMARK OWNERSHIP by majority
    observer block and permutes boundary points (observed by >=2 blocks)
    to the front of the point table, returning a ShardedBA — the input of
    the boundary-exchange distributed solver."""
    blocks = partition_edges_by_camera(prob.obs_cam, n_shards)
    S = max(len(b) for b in blocks)
    perm = np.full(n_shards * S, -1, np.int64)
    for s, b in enumerate(blocks):
        perm[s * S:s * S + len(b)] = b

    def layout(x, fill=0):
        x = np.asarray(x)
        out = np.full((n_shards * S,) + x.shape[1:], fill, x.dtype)
        for s, b in enumerate(blocks):
            out[s * S:s * S + len(b)] = x[b]
        return jnp.asarray(out)

    sharded = prob._replace(
        obs_cam=layout(prob.obs_cam),
        obs_pt=layout(prob.obs_pt),
        obs_face=layout(prob.obs_face),
        obs_uv=layout(prob.obs_uv),
        obs_inv_sigma2=layout(prob.obs_inv_sigma2),
        obs_valid=layout(prob.obs_valid, fill=False))
    if not shard_points:
        if return_perm:
            return sharded, perm
        return sharded

    # ---- landmark ownership + boundary-first point permutation ----
    P = int(np.asarray(prob.X).shape[0])
    obs_pt = np.asarray(prob.obs_pt)
    obs_ok = np.asarray(prob.obs_valid)
    # per (shard, point) live-observation counts
    cnt = np.zeros((n_shards, P), np.int32)
    for s, b in enumerate(blocks):
        ok = b[obs_ok[b]]
        np.add.at(cnt[s], obs_pt[ok], 1)
    touched = cnt > 0
    n_touch = touched.sum(axis=0)                       # (P,)
    owner = np.where(n_touch > 0, np.argmax(cnt, axis=0), -1).astype(
        np.int32)
    is_boundary = n_touch >= 2
    # stable permutation: boundary first, then the rest
    point_perm = np.concatenate([np.where(is_boundary)[0],
                                 np.where(~is_boundary)[0]]).astype(
        np.int64)
    n_boundary = int(is_boundary.sum())
    inv = np.empty(P, np.int64)
    inv[point_perm] = np.arange(P)
    X_new = np.asarray(prob.X)[point_perm]
    ptv_new = np.asarray(prob.pt_valid)[point_perm]
    owner_new = owner[point_perm]
    obs_pt_new = jnp.asarray(
        inv[np.asarray(sharded.obs_pt)].astype(np.int32))
    sharded = sharded._replace(X=jnp.asarray(X_new),
                               pt_valid=jnp.asarray(ptv_new),
                               obs_pt=obs_pt_new)
    return ShardedBA(prob=sharded, edge_perm=perm,
                     point_perm=point_perm,
                     owner_shard=jnp.asarray(owner_new),
                     n_boundary=n_boundary)


def distributed_bundle_adjust(cam: CubemapCamera, prob, mesh: Mesh,
                              phase_iters: Tuple[int, ...] = (5, 10),
                              cg_iters: int = 30):
    """Run bundle_adjust as one SPMD program over the mesh.

    ``prob`` is either a plain BAProblem with edge arrays divisible by
    the mesh size (fully-replicated tables, full psums — use
    shard_ba_problem), or a ShardedBA (landmark ownership + boundary-only
    point exchange; each shard maintains authoritative state for its OWN
    points and the final point table is recombined by owner in one psum).
    Returns (updated problem, edge inliers in the sharded order).
    """
    n = mesh.devices.size
    meta = prob if isinstance(prob, ShardedBA) else None
    if meta is not None:
        prob = meta.prob
    assert prob.obs_cam.shape[0] % n == 0

    rep = P()
    shd = P(AXIS)
    prob_specs = BAProblem(
        R=rep, t=rep, cam_fixed=rep, cam_valid=rep, X=rep, pt_valid=rep,
        obs_cam=shd, obs_pt=shd, obs_face=shd, obs_uv=shd,
        obs_inv_sigma2=shd, obs_valid=shd)
    out_specs = (prob_specs, shd)
    n_boundary = meta.n_boundary if meta is not None else None

    if meta is None:
        @functools.partial(
            jax.shard_map, mesh=mesh, in_specs=(prob_specs,),
            out_specs=out_specs, check_vma=False)
        def run(p):
            return bundle_adjust(cam, p, phase_iters=phase_iters,
                                 cg_iters=cg_iters, axis_name=AXIS)

        return jax.jit(run)(prob)

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=(prob_specs, rep),
        out_specs=out_specs, check_vma=False)
    def run_owned(p, owner_shard):
        out, inl = bundle_adjust(cam, p, phase_iters=phase_iters,
                                 cg_iters=cg_iters, axis_name=AXIS,
                                 n_boundary=n_boundary)
        # recombine the point table by owner: interior entries are only
        # authoritative on their owning shard (one O(P) exchange at the
        # END instead of per CG iteration)
        mine = owner_shard == jax.lax.axis_index(AXIS)
        X_full = jax.lax.psum(
            jnp.where(mine[:, None], out.X, 0.0), AXIS)
        X_full = jnp.where((owner_shard >= 0)[:, None], X_full, out.X)
        return out._replace(X=X_full), inl

    return jax.jit(run_owned)(prob, meta.owner_shard)


def global_ba_problem_from_arena(cam: CubemapCamera, arena: SM.MapArena,
                                 inv_level_sigma2: jnp.ndarray
                                 ) -> BAProblem:
    """Build the full-map BA problem (GlobalBundleAdjustemnt analog,
    Optimizer.cpp:453-621): the temporally first valid keyframe fixed
    (slots are recycled, so "KF 0" is by frame id), all valid landmarks.
    The monocular scale gauge is retracted inside bundle_adjust."""
    kf_idx, lm, face, uv_face, inv_s2, live = SM.ba_edges_from_arena(
        cam, arena, arena.kf_valid, inv_level_sigma2)
    ordkey = jnp.where(arena.kf_valid, arena.kf_frame_id,
                       jnp.iinfo(jnp.int32).max)
    first = jnp.argmin(ordkey)
    cam_fixed = jnp.zeros(arena.n_kf_cap, bool).at[first].set(True)
    return BAProblem(
        R=arena.kf_R, t=arena.kf_t, cam_fixed=cam_fixed,
        cam_valid=arena.kf_valid, X=arena.lm_pos,
        pt_valid=arena.lm_valid, obs_cam=kf_idx, obs_pt=lm,
        obs_face=face, obs_uv=uv_face, obs_inv_sigma2=inv_s2,
        obs_valid=live)


def make_synthetic_arena(cfg, cam, n_kf: int = 12, n_pts: int = 256,
                         seed: int = 0, pos_noise: float = 0.01):
    """A populated MapArena for dryruns/benchmarks: keyframes on a short
    trajectory observing a shared random point cloud, observations wired
    through kf_obs_lm exactly as the product's mapping writes them."""
    from cubemapslam_tpu import camera as C
    from cubemapslam_tpu import geometry as G

    rng = np.random.default_rng(seed)
    N = cfg.n_features
    arena = SM.make_arena(max(n_kf, 4), N, max(n_pts, 8))
    d = rng.normal(size=(n_pts, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = (d * rng.uniform(3, 7, (n_pts, 1))).astype(np.float32)
    desc = rng.integers(0, 2 ** 32, (n_pts, 8), dtype=np.uint32)
    arena = arena._replace(
        lm_pos=jnp.asarray(pts + rng.normal(0, pos_noise, pts.shape)
                           .astype(np.float32)),
        lm_valid=jnp.ones(arena.n_lm_cap, bool).at[n_pts:].set(False),
        lm_desc=arena.lm_desc.at[:n_pts].set(jnp.asarray(desc)))
    for k in range(n_kf):
        Rk = np.asarray(G.so3_exp(jnp.asarray(
            rng.normal(size=3) * 0.03, jnp.float32)))
        tk = (np.array([0.25 * k, 0, 0.1 * k])
              + rng.normal(0, 0.01, 3)).astype(np.float32)
        pc = (Rk @ pts.T).T + tk
        uv, face = C.ray_to_cubemap(cam, jnp.asarray(pc, jnp.float32))
        uv, face = np.asarray(uv), np.asarray(face)
        vis = np.where(face >= 0)[0][:N]
        row_lm = np.full(N, SM.NO_LM, np.int32)
        row_uv = np.zeros((N, 2), np.float32)
        row_face = np.full(N, -1, np.int32)
        row_desc = np.zeros((N, 8), np.uint32)
        row_ok = np.zeros(N, bool)
        row_rays = np.zeros((N, 3), np.float32)
        for j, p in enumerate(vis):
            row_lm[j] = p
            row_uv[j] = uv[p] + rng.normal(0, 0.3, 2)
            row_face[j] = face[p]
            row_desc[j] = desc[p]
            row_ok[j] = True
            row_rays[j] = pc[p] / np.linalg.norm(pc[p])
        arena = arena._replace(
            kf_R=arena.kf_R.at[k].set(jnp.asarray(Rk)),
            kf_t=arena.kf_t.at[k].set(jnp.asarray(tk)),
            kf_valid=arena.kf_valid.at[k].set(True),
            kf_frame_id=arena.kf_frame_id.at[k].set(k),
            kf_uv=arena.kf_uv.at[k].set(jnp.asarray(row_uv)),
            kf_rays=arena.kf_rays.at[k].set(jnp.asarray(row_rays)),
            kf_face=arena.kf_face.at[k].set(jnp.asarray(row_face)),
            kf_desc=arena.kf_desc.at[k].set(jnp.asarray(row_desc)),
            kf_kp_valid=arena.kf_kp_valid.at[k].set(jnp.asarray(row_ok)),
            kf_obs_lm=arena.kf_obs_lm.at[k].set(jnp.asarray(row_lm)))
    return arena


def dryrun(n_devices: int) -> None:
    """Compile + execute one sharded global-BA step over an ``n_devices``
    mesh on an ARENA-DERIVED problem — the same construction the product's
    post-loop global BA runs (LoopCloser._global_ba), on tiny shapes."""
    from cubemapslam_tpu.config import SlamConfig

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")
    mesh = make_mesh(devices)
    cfg = SlamConfig(cube_face_w=64, cube_face_h=64, n_features=64,
                     n_levels=2)
    cam = CubemapCamera.from_config(cfg)
    arena = make_synthetic_arena(cfg, cam, n_kf=10, n_pts=96)
    inv_s2 = 1.0 / jnp.asarray(cfg.level_sigma2, jnp.float32)
    prob = global_ba_problem_from_arena(cam, arena, inv_s2)
    sharded = shard_ba_problem(prob, n_devices, shard_points=True)
    out, inl = distributed_bundle_adjust(cam, sharded, mesh,
                                         phase_iters=(2, 2), cg_iters=8)
    jax.block_until_ready(out.R)
    assert np.isfinite(np.asarray(out.R)).all()
    assert np.isfinite(np.asarray(out.X)).all()
    assert int(np.asarray(inl).sum()) > 0
