"""Matching tests with synthetic keypoint sets."""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import camera as C
from cubemapslam_tpu import geometry as G
from cubemapslam_tpu import matching as M
from cubemapslam_tpu.features.extractor import Keypoints


def make_keypoints(cam, rng, n=128, levels=1):
    """Random valid keypoints: rays drawn on the cross, random descriptors."""
    rays = rng.normal(size=(4 * n, 3))
    rays /= np.linalg.norm(rays, axis=1, keepdims=True)
    uv, face = C.ray_to_cubemap(cam, jnp.asarray(rays, jnp.float32))
    uv, face = np.asarray(uv), np.asarray(face)
    keep = np.where(face >= 0)[0][:n]
    assert len(keep) == n
    desc = rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)
    return Keypoints(
        uv=jnp.asarray(uv[keep], jnp.float32),
        response=jnp.ones(n, jnp.float32),
        angle=jnp.asarray(rng.uniform(0, 2 * np.pi, n), jnp.float32),
        level=jnp.asarray(rng.integers(0, levels, n), jnp.int32),
        face=jnp.asarray(face[keep], jnp.int32),
        desc=jnp.asarray(desc),
        rays=jnp.asarray(rays[keep], jnp.float32),
        valid=jnp.ones(n, bool))


def flip_bits(desc, rng, k):
    """Flip k random bits in each 256-bit descriptor row."""
    out = np.array(desc)
    for i in range(out.shape[0]):
        for _ in range(k):
            w = rng.integers(0, 8)
            b = np.uint32(1) << np.uint32(rng.integers(0, 32))
            out[i, w] ^= b
    return out


class TestHamming:
    def test_matches_popcount(self, rng):
        a = rng.integers(0, 2 ** 32, size=(40, 8), dtype=np.uint32)
        b = rng.integers(0, 2 ** 32, size=(60, 8), dtype=np.uint32)
        got = np.asarray(M.hamming_matrix(
            M.unpack_descriptors(jnp.asarray(a)),
            M.unpack_descriptors(jnp.asarray(b))))
        exp = np.zeros((40, 60))
        for i in range(40):
            for j in range(60):
                exp[i, j] = sum(bin(int(x ^ y)).count("1")
                                for x, y in zip(a[i], b[j]))
        np.testing.assert_allclose(got, exp)

    def test_pairs(self, rng):
        a = rng.integers(0, 2 ** 32, size=(30, 8), dtype=np.uint32)
        b = rng.integers(0, 2 ** 32, size=(30, 8), dtype=np.uint32)
        got = np.asarray(M.hamming_pairs(jnp.asarray(a), jnp.asarray(b)))
        exp = [sum(bin(int(x ^ y)).count("1") for x, y in zip(ra, rb))
               for ra, rb in zip(a, b)]
        np.testing.assert_allclose(got, exp)


class TestOneToOne:
    def test_duplicate_resolution(self):
        # queries 0 and 1 both pick target 5; query 1 is closer and wins
        best_idx = jnp.asarray([5, 5, 7], jnp.int32)
        best_dist = jnp.asarray([10.0, 3.0, 8.0])
        matched = jnp.asarray([True, True, True])
        out = np.asarray(M.resolve_one_to_one(best_idx, best_dist, matched,
                                              10))
        np.testing.assert_array_equal(out, [False, True, True])

    def test_tie_breaks_by_index(self):
        best_idx = jnp.asarray([2, 2], jnp.int32)
        best_dist = jnp.asarray([4.0, 4.0])
        matched = jnp.asarray([True, True])
        out = np.asarray(M.resolve_one_to_one(best_idx, best_dist, matched,
                                              5))
        np.testing.assert_array_equal(out, [True, False])


class TestRotationConsistency:
    def test_filters_outlier_rotation(self, rng):
        n = 100
        a1 = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
        a2 = a1 - 0.3  # consistent rotation ~17deg
        # 10 outliers with random rotation
        a2[:10] = rng.uniform(0, 2 * np.pi, 10)
        matched = np.ones(n, bool)
        out = np.asarray(M.rotation_consistency(
            jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(matched)))
        assert out[10:].sum() >= 85      # inliers survive
        assert out[:10].sum() <= 4       # most outliers culled


class TestSearchForInitialization:
    def test_recovers_identity_correspondence(self, lafida_cam, rng):
        kp1 = make_keypoints(lafida_cam, rng, n=128)
        # frame 2 = same keypoints, slightly perturbed descriptors, shuffled
        perm = rng.permutation(128)
        desc2 = flip_bits(np.asarray(kp1.desc), rng, 5)[perm]
        kp2 = Keypoints(
            uv=kp1.uv[perm], response=kp1.response, angle=kp1.angle[perm],
            level=kp1.level, face=kp1.face[perm], desc=jnp.asarray(desc2),
            rays=kp1.rays[perm], valid=kp1.valid)
        # level-0 only matching requires level zeros
        kp1 = kp1._replace(level=jnp.zeros(128, jnp.int32))
        kp2 = kp2._replace(level=jnp.zeros(128, jnp.int32))
        res = M.search_for_initialization(kp1, kp2, lafida_cam,
                                          window_px=100.0)
        ok = np.asarray(res.ok)
        idx = np.asarray(res.idx)
        inv = np.empty(128, int)
        inv[perm] = np.arange(128)
        correct = idx[ok] == inv[np.where(ok)[0]]
        assert ok.sum() > 60
        assert correct.mean() > 0.95


class TestEpipolarChi2:
    def test_true_correspondences_pass(self, lafida_cam, rng):
        # scene points, two poses, perfect projections -> chi2 ~ 0
        pts = rng.uniform(-1, 1, (100, 3))
        pts[:, 2] += 4.0
        R = np.asarray(G.so3_exp(jnp.asarray([0.02, -0.05, 0.01])))
        t = np.array([0.3, 0.05, -0.1], np.float32)
        rays1 = pts / np.linalg.norm(pts, axis=1, keepdims=True)
        p2 = (R @ pts.T).T + t
        rays2 = p2 / np.linalg.norm(p2, axis=1, keepdims=True)
        # E12 with rows/cols such that ray1ᵀ E12 gives the plane normal in
        # frame 2: n2 = R (x1 x (R^T t)) ~ using E = R [t']x with t' = -R^T t
        # Simpler: epipolar constraint ray2ᵀ [t]x R ray1 = 0 -> E21 = [t]x R.
        # The matcher wants n = E12ᵀ ray1 with n . ray2 = 0 -> E12 = (ᵀ of
        # E21): E12 = ([t]x R)ᵀ
        E21 = np.asarray(G.hat(jnp.asarray(t))) @ R
        E12 = E21.T.astype(np.float32)
        uv2, face2 = C.ray_to_cubemap(lafida_cam,
                                      jnp.asarray(rays2, jnp.float32))
        valid = np.asarray(face2) >= 0
        sig2 = jnp.ones(100, jnp.float32)
        chi2 = np.asarray(M.epipolar_chi2(
            lafida_cam, jnp.asarray(E12),
            jnp.asarray(rays1, jnp.float32),
            jnp.asarray(rays2, jnp.float32), uv2, sig2))
        diag = np.diag(chi2)[valid]
        offdiag = chi2[~np.eye(100, dtype=bool)]
        assert np.median(diag) < 0.5
        # random pairs mostly fail the gate
        assert (offdiag > 3.84).mean() > 0.8
