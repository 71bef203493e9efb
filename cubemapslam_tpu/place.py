"""Place recognition: binary vocabulary tree + dense BoW scoring.

Replaces DBoW2 (ThirdParty/DBoW2: TemplatedVocabulary<FORB>, BowVector,
KeyFrameDatabase inverted file). Re-design for TPU (SURVEY.md §2.2):

* The reference ships a 1M-leaf / 6-level vocabulary trained offline (the
  ORBvoc.txt blob is stripped from the repo). Here the vocabulary is a
  complete k-ary tree trained by hierarchical binary k-medians (majority-bit
  centroids) on descriptors sampled from the target domain; the tree is a
  dense per-level center table so lookup is a fixed-depth batched
  argmin-Hamming descent (vmap over features), not pointer chasing.
* BoW vectors are DENSE (n_words,) tf-idf rows — one per keyframe, stored as
  a (K, W) matrix. The DBoW2 L1 score  s(v,w) = sum_i min(v_i, w_i)  (for
  L1-normalized vectors, = 1 - 0.5*|v-w|_1) against every keyframe at once
  is a single broadcast reduction; the inverted-file machinery
  (KeyFrameDatabase.cpp:38-51) disappears.
* Loop/relocalization candidate selection (DetectLoopCandidates /
  DetectRelocalizationCandidates, KeyFrameDatabase.cpp:81-314) becomes
  masked vector math over the score/common-word arrays with the
  covisibility-group accumulation as one masked matmul.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cubemapslam_tpu import matching as M


class Vocabulary(NamedTuple):
    """Complete k-ary tree; level l has k^(l+1) centers (packed bits)."""

    centers: Tuple[jnp.ndarray, ...]  # per level: (k^(l+1), 8) uint32
    idf: jnp.ndarray                  # (n_words,) float32
    k: int
    depth: int

    @property
    def n_words(self) -> int:
        return self.centers[-1].shape[0]


def _hamming_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,8),(M,8) uint32 -> (N,M) int popcount distances (numpy)."""
    x = a[:, None, :] ^ b[None, :, :]
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _majority_center(desc: np.ndarray) -> np.ndarray:
    """Majority bit vector of (N,8) uint32 descriptors."""
    bits = np.unpackbits(desc.view(np.uint8), axis=-1,
                         bitorder="little")          # (N,256)
    maj = (bits.sum(0) * 2 >= bits.shape[0]).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


def _kmedians(desc: np.ndarray, k: int, rs: np.random.RandomState,
              n_iter: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Binary k-medians. Returns (centers (k,8), assignment (N,))."""
    n = desc.shape[0]
    if n == 0:
        return np.zeros((k, 8), np.uint32), np.zeros(0, np.int64)
    init = rs.choice(n, size=min(k, n), replace=False)
    centers = desc[init]
    if centers.shape[0] < k:
        centers = np.concatenate(
            [centers, centers[rs.randint(0, centers.shape[0],
                                         k - centers.shape[0])]])
    for _ in range(n_iter):
        d = _hamming_np(desc, centers)
        assign = d.argmin(1)
        for c in range(k):
            sel = desc[assign == c]
            if len(sel) > 0:
                centers[c] = _majority_center(sel)
    d = _hamming_np(desc, centers)
    return centers.astype(np.uint32), d.argmin(1)


def train_vocabulary(descriptors: np.ndarray, k: int = 10, depth: int = 3,
                     seed: int = 0, max_train: int = 60000) -> Vocabulary:
    """Hierarchical binary k-medians (TemplatedVocabulary::create analog).

    descriptors: (N,8) uint32. Returns a Vocabulary with k^depth words.
    """
    rs = np.random.RandomState(seed)
    desc = np.asarray(descriptors, np.uint32)
    if desc.shape[0] > max_train:
        desc = desc[rs.choice(desc.shape[0], max_train, replace=False)]
    groups = [desc]
    levels = []
    for lvl in range(depth):
        centers_lvl = []
        next_groups = []
        for g in groups:
            c, a = _kmedians(g, k, rs)
            centers_lvl.append(c)
            for j in range(k):
                next_groups.append(g[a == j] if len(g) else g)
        levels.append(jnp.asarray(np.concatenate(centers_lvl)))
        groups = next_groups
    n_words = k ** depth
    # idf from training term frequencies (TemplatedVocabulary::setWeights)
    counts = np.array([max(len(g), 1) for g in groups], np.float64)
    idf = np.log(desc.shape[0] / counts)
    return Vocabulary(centers=tuple(levels),
                      idf=jnp.asarray(idf, jnp.float32), k=k, depth=depth)


def word_ids(vocab: Vocabulary, desc: jnp.ndarray) -> jnp.ndarray:
    """(N,8) uint32 -> (N,) word ids by fixed-depth argmin-Hamming descent.

    Each level gathers only the current node's k children and compares
    against those (N x k x 256 elementwise work) instead of computing the
    full N x k^(l+1) Hamming matrix — at the reference-scale 10k-word vocab
    the last level would otherwise be a 1000x larger matmul than needed."""
    bits = M.unpack_descriptors(desc)                   # (N,256)
    node = jnp.zeros(desc.shape[0], jnp.int32)
    for lvl in range(vocab.depth):
        cb = M.unpack_descriptors(vocab.centers[lvl])   # (k^(l+1),256)
        base = node * vocab.k
        cand = cb[base[:, None] + jnp.arange(vocab.k)[None, :]]  # (N,k,256)
        dk = jnp.sum(jnp.abs(cand - bits[:, None, :]), axis=-1)
        node = (base + jnp.argmin(dk, axis=1).astype(jnp.int32))
    return node


def save_vocabulary(vocab: Vocabulary, path: str) -> None:
    """Persist a trained vocabulary as one npz (the ORBvoc.txt analog;
    consumable as the VOC argument of apps/run_sequence)."""
    data = {f"centers_{i}": np.asarray(c)
            for i, c in enumerate(vocab.centers)}
    data["idf"] = np.asarray(vocab.idf)
    data["k"] = np.int64(vocab.k)
    data["depth"] = np.int64(vocab.depth)
    np.savez_compressed(path, **data)


def load_vocabulary(path: str) -> Vocabulary:
    z = np.load(path)
    depth = int(z["depth"])
    centers = tuple(jnp.asarray(z[f"centers_{i}"]) for i in range(depth))
    return Vocabulary(centers=centers, idf=jnp.asarray(z["idf"]),
                      k=int(z["k"]), depth=depth)


def bow_vector(vocab: Vocabulary, desc: jnp.ndarray,
               valid: jnp.ndarray) -> jnp.ndarray:
    """L1-normalized tf-idf dense BoW vector (W,)."""
    w = word_ids(vocab, desc)
    tf = jnp.zeros(vocab.n_words).at[w].add(valid.astype(jnp.float32))
    v = tf * vocab.idf
    return v / jnp.maximum(jnp.sum(jnp.abs(v)), 1e-12)


def bow_scores(query: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score of query (W,) against each row of table (K,W):
    s = sum_i min(|q_i|, |t_i|) in [0,1]."""
    return jnp.sum(jnp.minimum(query[None, :], table), axis=1)


def common_words(query: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """(K,) count of shared vocabulary words."""
    return jnp.sum((query[None, :] > 0) & (table > 0), axis=1)


def detect_candidates(query_bow: jnp.ndarray, bow_table: jnp.ndarray,
                      kf_valid: jnp.ndarray, exclude: jnp.ndarray,
                      covis: jnp.ndarray, min_score: jnp.ndarray,
                      top_k: int = 8):
    """Loop/reloc candidate selection (DetectLoopCandidates,
    KeyFrameDatabase.cpp:81-202).

    exclude: (K,) bool — the query's covisible set (+ itself) for loop
    detection, or all-False for relocalization. covis: (K,K) weights for the
    group-accumulation step. Returns (cand_idx (top_k,), cand_ok (top_k,)).
    """
    K = bow_table.shape[0]
    cw = common_words(query_bow, bow_table)
    eligible = kf_valid & ~exclude & (cw > 0)
    max_cw = jnp.max(jnp.where(eligible, cw, 0))
    eligible &= cw > 0.8 * max_cw
    scores = bow_scores(query_bow, bow_table)
    eligible &= scores >= min_score
    # accumulate scores over top-10 covisible groups (cpp:151-178)
    nb_rank = jnp.argsort(-covis, axis=1)[:, :10]
    nb_mask = jnp.zeros((K, K), bool).at[
        jnp.arange(K)[:, None], nb_rank].set(covis[
            jnp.arange(K)[:, None], nb_rank] > 0)
    nb_mask = nb_mask | jnp.eye(K, dtype=bool)
    s_elig = jnp.where(eligible, scores, 0.0)
    acc = nb_mask @ s_elig
    acc = jnp.where(eligible, acc, -1.0)
    best_acc = jnp.max(acc)
    ok = eligible & (acc > 0.75 * best_acc)
    # return the best-scoring MEMBER of each accepted group, not its anchor
    # (pBestCandidate, KeyFrameDatabase.cpp:170-199): the anchor's top-10
    # covisible set may contain a higher-scoring keyframe
    member_scores = jnp.where(nb_mask & eligible[None, :],
                              scores[None, :], -1.0)
    best_member = jnp.argmax(member_scores, axis=1).astype(jnp.int32)
    val = jnp.full(K, -1.0).at[jnp.where(ok, best_member, 0)].max(
        jnp.where(ok, acc, -1.0))
    top_val, top_idx = jax.lax.top_k(val, top_k)
    return top_idx.astype(jnp.int32), top_val > 0
