"""Train and save an ORB vocabulary artifact (the ORBvoc.txt analog).

The reference ships a pretrained DBoW2 vocabulary loaded at startup
(include/ORBVocabulary.h:36-37, System.cpp:50-61; the ~1M-leaf ORBvoc.txt
blob is stripped from its repo). This trains the TPU framework's k-medians
tree OFFLINE — on a rendered synthetic corpus by default, or on descriptor
dumps from previous runs — and saves one npz consumable as
``run_sequence``'s VOC argument or ``SlamConfig.vocab_path``. With a
pretrained vocabulary the mid-run retrain (runtime/system.py
``_maybe_retrain_vocab``) never fires.

Usage:
    python scripts/train_vocab.py OUT.npz [--frames 48] [--k 10]
        [--depth 4] [--settings CFG.yaml] [--desc DUMP.npy ...] [--seed 0]

Descriptor dumps are (N, 8) uint32 arrays (np.save of ``kp.desc[kp.valid]``).
"""

from __future__ import annotations

import argparse
import sys
import time


def rendered_corpus(cfg, n_frames: int, seed: int):
    """Render a varied synthetic corpus and extract ORB descriptors."""
    import numpy as np
    import jax.numpy as jnp
    from cubemapslam_tpu.camera import CubemapCamera
    from cubemapslam_tpu.features import build_extractor
    from cubemapslam_tpu.synth import Renderer, make_world, loop_trajectory
    from cubemapslam_tpu.warp import fov_mask

    cam = CubemapCamera.from_config(cfg)
    extract, _ = build_extractor(cfg, cam, cfg.n_features,
                                 (cfg.cube_h, cfg.cube_w))
    mask = fov_mask(cam, cfg.cube_w, cfg.cube_h)
    ren = Renderer(cam, cfg, "cubemap")
    rng = np.random.default_rng(seed)
    descs = []
    # several independent worlds so the vocabulary sees diverse texture
    n_worlds = max(1, n_frames // 16)
    per_world = max(1, n_frames // n_worlds)
    for w in range(n_worlds):
        poses = loop_trajectory(per_world, radius=2.5, n_loops=1.0)
        pts, patches = make_world(
            rng, n=900, centers=np.stack([-p[0].T @ p[1] for p in poses]))
        for R, t in poses:
            img = ren.render(pts, patches, R, t)
            kp = extract(jnp.asarray(img), mask)
            descs.append(np.asarray(kp.desc)[np.asarray(kp.valid)])
    return np.concatenate(descs)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output vocabulary npz")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--k", type=int, default=None,
                    help="branching (default: config vocab_branching)")
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--settings", default=None,
                    help="reference-format calibration YAML")
    ap.add_argument("--desc", nargs="*", default=[],
                    help="descriptor dump .npy files instead of rendering")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import numpy as np
    from cubemapslam_tpu import place as PL
    from cubemapslam_tpu.config import SlamConfig, load_config

    if args.settings:
        cfg = load_config(args.settings)
    else:
        # rendering-speed config: vocabulary quality depends on descriptor
        # diversity, not face resolution
        cfg = SlamConfig(cube_face_w=256, cube_face_h=256, n_features=1200,
                         n_levels=4)

    t0 = time.time()
    if args.desc:
        desc = np.concatenate([np.load(p).astype(np.uint32)
                               for p in args.desc])
    else:
        desc = rendered_corpus(cfg, args.frames, args.seed)
    print(f"{desc.shape[0]} training descriptors "
          f"({time.time() - t0:.1f}s)")

    k = args.k if args.k is not None else cfg.vocab_branching
    depth = args.depth if args.depth is not None else cfg.vocab_depth
    t0 = time.time()
    vocab = PL.train_vocabulary(desc, k=k, depth=depth, seed=args.seed)
    PL.save_vocabulary(vocab, args.out)
    print(f"trained k={k} depth={depth} -> {vocab.n_words} words "
          f"({time.time() - t0:.1f}s); saved to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
