"""Place recognition: vocabulary training, BoW scoring, candidate logic."""

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import place as P


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, (n, 8), dtype=np.uint32)


def perturb(desc, rng, k):
    out = desc.copy()
    for i in range(len(out)):
        for _ in range(k):
            out[i, rng.integers(0, 8)] ^= np.uint32(1) << np.uint32(
                rng.integers(0, 32))
    return out


class TestVocabulary:
    def test_train_and_lookup(self, rng):
        desc = rand_desc(rng, 3000)
        vocab = P.train_vocabulary(desc, k=5, depth=3, seed=0)
        assert vocab.n_words == 125
        ids = np.asarray(P.word_ids(vocab, jnp.asarray(desc[:200])))
        assert ids.min() >= 0 and ids.max() < 125
        # similar descriptors land in the same word most of the time
        near = perturb(desc[:200], rng, 2)
        ids2 = np.asarray(P.word_ids(vocab, jnp.asarray(near)))
        assert (ids == ids2).mean() > 0.6

    def test_bow_self_similarity(self, rng):
        desc = rand_desc(rng, 2000)
        vocab = P.train_vocabulary(desc, k=5, depth=3, seed=0)
        a = rand_desc(rng, 300)
        b = rand_desc(rng, 300)
        valid = jnp.ones(300, bool)
        va = P.bow_vector(vocab, jnp.asarray(a), valid)
        va2 = P.bow_vector(vocab, jnp.asarray(perturb(a, rng, 3)), valid)
        vb = P.bow_vector(vocab, jnp.asarray(b), valid)
        s_same = float(P.bow_scores(va, va2[None, :])[0])
        s_diff = float(P.bow_scores(va, vb[None, :])[0])
        s_self = float(P.bow_scores(va, va[None, :])[0])
        assert abs(s_self - 1.0) < 1e-4
        assert s_same > s_diff

    def test_detect_candidates(self, rng):
        desc = rand_desc(rng, 2000)
        vocab = P.train_vocabulary(desc, k=5, depth=3, seed=0)
        K = 10
        # KFs 0..8 random; KF 9's words == KF 2's (the loop)
        kf_desc = [rand_desc(rng, 200) for _ in range(K)]
        kf_desc[9] = perturb(kf_desc[2], rng, 2)
        valid = jnp.ones(200, bool)
        bows = jnp.stack([P.bow_vector(vocab, jnp.asarray(d), valid)
                          for d in kf_desc])
        kf_valid = jnp.ones(K, bool)
        # query = KF 9; exclude its "covisible" neighbor 8 and itself
        exclude = jnp.zeros(K, bool).at[9].set(True).at[8].set(True)
        covis = jnp.zeros((K, K), jnp.int32)
        idx, ok = P.detect_candidates(bows[9], bows, kf_valid, exclude,
                                      covis, jnp.float32(0.0))
        idx, ok = np.asarray(idx), np.asarray(ok)
        assert ok.any()
        assert idx[np.argmax(ok)] == 2  # best candidate is the true loop


class TestVocabularyArtifact:
    def test_save_load_roundtrip(self, rng, tmp_path):
        desc = rand_desc(rng, 1500)
        vocab = P.train_vocabulary(desc, k=6, depth=3, seed=1)
        path = str(tmp_path / "voc.npz")
        P.save_vocabulary(vocab, path)
        v2 = P.load_vocabulary(path)
        assert v2.k == vocab.k and v2.depth == vocab.depth
        assert v2.n_words == vocab.n_words
        q = rand_desc(rng, 200)
        ids1 = np.asarray(P.word_ids(vocab, jnp.asarray(q)))
        ids2 = np.asarray(P.word_ids(v2, jnp.asarray(q)))
        np.testing.assert_array_equal(ids1, ids2)
        valid = jnp.ones(200, bool)
        np.testing.assert_allclose(
            np.asarray(P.bow_vector(vocab, jnp.asarray(q), valid)),
            np.asarray(P.bow_vector(v2, jnp.asarray(q), valid)))

    def test_system_uses_pretrained_vocab(self, rng, tmp_path):
        """A system built with cfg.vocab_path never trains/retrains
        (the reference's pretrained-ORBvoc path, System.cpp:50-61)."""
        from cubemapslam_tpu.config import SlamConfig
        from cubemapslam_tpu.runtime.system import CubemapSLAM
        desc = rand_desc(rng, 1500)
        vocab = P.train_vocabulary(desc, k=6, depth=3, seed=1)
        path = str(tmp_path / "voc.npz")
        P.save_vocabulary(vocab, path)
        cfg = SlamConfig(cube_face_w=128, cube_face_h=128, n_features=256,
                         n_levels=3, max_keyframes=8, max_landmarks=1024,
                         vocab_path=path)
        slam = CubemapSLAM(cfg)
        assert slam.vocab is not None
        assert slam.vocab.n_words == vocab.n_words
        assert not slam._vocab_is_bootstrap
