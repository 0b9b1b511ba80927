#!/usr/bin/env python
"""Train an ORB visual vocabulary and save it as .npz.

The reference ships a pretrained 1M-leaf DBoW2 vocabulary as a release
blob (Vocabulary/ORBvoc.txt.tar.gz, unpacked by build.sh); this tool is
the training side DBoW2 itself provides (TemplatedVocabulary::create):
extract ORB descriptors from a corpus of images and hierarchically
k-medians-cluster them.

  # from a directory of images
  python tools/train_vocab.py --img_dir /data/frames --out vocab.npz \
      --k 10 --L 4

  # no data handy: synthetic textured corpus (good enough for loop
  # closing / relocalization smoke use; retrain on real frames for
  # production)
  python tools/train_vocab.py --synthetic 40 --out vocab.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--img_dir", default="", help="directory of images")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train from N synthetic textured frames instead")
    p.add_argument("--out", required=True)
    p.add_argument("--k", type=int, default=10, help="branching factor")
    p.add_argument("--L", type=int, default=4, help="tree depth")
    p.add_argument("--n_features", type=int, default=1000,
                   help="ORB features per frame")
    p.add_argument("--max_images", type=int, default=500)
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def synthetic_frames(n: int, seed: int):
    rng = np.random.default_rng(seed)
    try:
        import cv2
    except ImportError:
        cv2 = None
    for i in range(n):
        img = rng.uniform(0, 255, (240, 320)).astype(np.float32)
        for _ in range(rng.integers(150, 400)):
            y, x = rng.integers(4, 230), rng.integers(4, 310)
            s = int(rng.integers(3, 9))
            img[y:y + s, x:x + s] = rng.uniform(0, 255)
        if cv2 is not None:
            img = cv2.GaussianBlur(img, (5, 5), rng.uniform(0.8, 2.0))
        yield np.clip(img, 0, 255).astype(np.uint8)


def main():
    args = parse_args()
    import jax.numpy as jnp

    from iv_slam_tpu.config import ORBConfig
    from iv_slam_tpu.ops.extractor import OrbExtractor
    from iv_slam_tpu.slam.vocabulary import Vocabulary

    frames = []
    if args.synthetic:
        frames = list(synthetic_frames(args.synthetic, args.seed))
    else:
        import cv2

        names = sorted(os.listdir(args.img_dir))[: args.max_images]
        for n in names:
            img = cv2.imread(os.path.join(args.img_dir, n),
                             cv2.IMREAD_GRAYSCALE)
            if img is not None:
                frames.append(img)
    if not frames:
        raise SystemExit("no input images")

    cfg = ORBConfig(n_features=args.n_features, n_levels=4)
    extractors = {}
    descs = []
    for img in frames:
        key = img.shape
        if key not in extractors:
            extractors[key] = OrbExtractor(cfg, *img.shape)
        kp = extractors[key](jnp.asarray(img))
        valid = np.asarray(kp.valid)
        descs.append(np.asarray(kp.desc)[valid])
    corpus = np.concatenate(descs)
    print(f"{len(frames)} frames -> {len(corpus)} descriptors; "
          f"training k={args.k} L={args.L} ...")
    voc = Vocabulary.train(corpus, k=args.k, L=args.L, seed=args.seed)
    voc.save(args.out)
    print(f"saved {voc.n_words}-word vocabulary to {args.out}")


if __name__ == "__main__":
    main()
