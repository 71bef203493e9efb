"""Map save/load (checkpoint/resume).

The reference declares SaveMap/LoadMap but never implements them
(System.h:93-95 TODO) — its Localization Mode only works on the in-memory
map of the same run. The functional arena makes persistence trivial: the
whole SLAM state is a flat dict of arrays. Saved maps enable the
localization-on-prebuilt-map configuration (BASELINE.json) and solver-state
checkpointing for fault tolerance (SURVEY.md §5).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from cubemapslam_tpu import place as PL
from cubemapslam_tpu import slam_map as SM

_FORMAT_VERSION = 1


def save_map(system, path: str) -> None:
    """Serialize arena + vocabulary + BoW table + counters to one npz."""
    arena = system.arena
    data = {f"arena_{k}": np.asarray(v)
            for k, v in arena._asdict().items()}
    data["n_kf"] = np.int64(system.n_kf)
    data["frame_id"] = np.int64(system.frame_id)
    data["format_version"] = np.int64(_FORMAT_VERSION)
    if system.vocab is not None:
        for i, c in enumerate(system.vocab.centers):
            data[f"vocab_centers_{i}"] = np.asarray(c)
        data["vocab_idf"] = np.asarray(system.vocab.idf)
        data["vocab_k"] = np.int64(system.vocab.k)
        data["vocab_depth"] = np.int64(system.vocab.depth)
    if system.bow_table is not None:
        data["bow_table"] = np.asarray(system.bow_table)
    np.savez_compressed(path, **data)


def load_map(system, path: str) -> None:
    """Restore a saved map into a (fresh) system; tracking resumes via
    relocalization against the loaded map."""
    from cubemapslam_tpu.runtime.system import TrackState

    z = np.load(path)
    assert int(z["format_version"]) == _FORMAT_VERSION
    fields = {k[len("arena_"):]: jnp.asarray(v)
              for k, v in z.items() if k.startswith("arena_")}
    system.arena = SM.MapArena(**fields)
    system.n_kf = int(z["n_kf"])
    system.frame_id = int(z["frame_id"])
    if "vocab_idf" in z:
        depth = int(z["vocab_depth"])
        centers = tuple(jnp.asarray(z[f"vocab_centers_{i}"])
                        for i in range(depth))
        system.vocab = PL.Vocabulary(
            centers=centers, idf=jnp.asarray(z["vocab_idf"]),
            k=int(z["vocab_k"]), depth=depth)
    if "bow_table" in z:
        system.bow_table = jnp.asarray(z["bow_table"])
    system.state = TrackState.LOST  # reacquire by relocalization
    system.velocity = None
