"""ORB visual vocabulary: training, transform, scoring.

TPU-native replacement for DBoW2's TemplatedVocabulary<FORB>
(Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h, FORB.cpp):

  * k-medians hierarchical clustering over 256-bit descriptors (the
    binary-descriptor k-means of DBoW2: cluster centers are bitwise
    majority votes, FORB::meanValue); TF-IDF leaf weights;
  * transform: vocabulary-tree descent. On device this is a batched
    per-level (N, k) Hamming argmin via the MXU Hamming matrix; on host the
    C++ extension walks the tree (iv_slam_tpu/native);
  * L1 scoring of normalized BoW vectors (DBoW2 L1Scoring), used by loop
    detection and relocalization candidate search.

The reference ships a pretrained 1M-leaf vocabulary as a release blob;
`train` builds one from a descriptor corpus (any scale), and
`load_dbow2_text` reads the reference's text format when present.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .. import native


def _majority_descriptor(descs: np.ndarray) -> np.ndarray:
    """Bitwise majority vote (FORB::meanValue)."""
    bits = np.unpackbits(descs, axis=1)  # (N, 256)
    maj = (bits.sum(axis=0) * 2 >= descs.shape[0]).astype(np.uint8)
    return np.packbits(maj)


class Vocabulary:
    def __init__(self, children, node_desc, weights, is_leaf, k, L):
        self.children = children        # (nodes, k) int32, -1 = none
        self.node_desc = node_desc      # (nodes, 32) uint8
        self.weights = weights          # (nodes,) float32 (leaf weights)
        self.is_leaf = is_leaf          # (nodes,) bool
        self.k = k
        self.L = L
        leaf_ids = np.nonzero(is_leaf)[0]
        self.word_of_node = np.full(len(is_leaf), -1, np.int32)
        self.word_of_node[leaf_ids] = np.arange(len(leaf_ids), dtype=np.int32)
        self.n_words = len(leaf_ids)
        self.node_of_word = leaf_ids.astype(np.int32)

    # ------------------------------------------------------------ training

    @staticmethod
    def train(
        descriptors: np.ndarray, k: int = 10, L: int = 3,
        seed: int = 0, kmeans_iters: int = 8,
    ) -> "Vocabulary":
        rng = np.random.default_rng(seed)
        children: List[List[int]] = [[-1] * k]
        node_desc = [np.zeros(32, np.uint8)]
        is_leaf = [False]
        # (node_id, descriptor subset, depth)
        stack = [(0, descriptors, 0)]
        while stack:
            node, descs, depth = stack.pop()
            if depth >= L or len(descs) <= k:
                is_leaf[node] = True
                children[node] = [-1] * k
                continue
            # k-medians: init with random distinct descriptors
            idx = rng.choice(len(descs), size=k, replace=False)
            centers = descs[idx].copy()
            for _ in range(kmeans_iters):
                d = native.hamming_matrix(descs, centers)
                assign = d.argmin(axis=1)
                new_centers = []
                for c in range(k):
                    members = descs[assign == c]
                    if len(members) == 0:
                        new_centers.append(centers[c])
                    else:
                        new_centers.append(_majority_descriptor(members))
                new = np.stack(new_centers)
                if (new == centers).all():
                    centers = new
                    break
                centers = new
            d = native.hamming_matrix(descs, centers)
            assign = d.argmin(axis=1)
            kids = []
            for c in range(k):
                members = descs[assign == c]
                child = len(node_desc)
                node_desc.append(centers[c])
                children.append([-1] * k)
                is_leaf.append(False)
                kids.append(child)
                if len(members) > 0:
                    stack.append((child, members, depth + 1))
                else:
                    is_leaf[child] = True
            children[node] = kids
        voc = Vocabulary(
            np.array(children, np.int32),
            np.stack(node_desc),
            np.zeros(len(node_desc), np.float32),
            np.array(is_leaf, bool),
            k, L,
        )
        # TF-IDF weights from the training corpus
        words = voc.transform_words(descriptors)
        counts = np.bincount(
            voc.word_of_node[words], minlength=voc.n_words
        ).astype(np.float64)
        n_docs = max(len(descriptors), 1)
        idf = np.where(counts > 0, np.log(n_docs / np.maximum(counts, 1)), 0.0)
        voc.weights = np.zeros(len(voc.node_desc), np.float32)
        voc.weights[voc.node_of_word] = idf.astype(np.float32)
        return voc

    @staticmethod
    def synthesize(k: int = 10, L: int = 6, seed: int = 0,
                   flip_bits: int = 40) -> "Vocabulary":
        """Synthesize a full k^L tree at ORBvoc scale (k=10, L=6 -> 1M
        leaves) without a descriptor corpus: each child's descriptor is
        its parent's with `flip_bits` random bits flipped, so the tree has
        the coarse-to-fine Hamming structure k-medians training produces.
        Used to exercise realistic-scale place recognition (the reference
        ships a ~1M-leaf ORBvoc.txt, build.sh:22-26) where training one
        from data would need a corpus of millions of descriptors."""
        rng = np.random.default_rng(seed)
        n_internal = (k ** L - 1) // (k - 1)
        n_nodes = n_internal + k ** L
        node_desc = np.empty((n_nodes, 32), np.uint8)
        node_desc[0] = rng.integers(0, 256, 32)
        children = np.full((n_nodes, k), -1, np.int32)
        is_leaf = np.zeros(n_nodes, bool)
        # level-by-level: nodes are laid out in BFS order, so level l
        # occupies [ (k^l - 1)/(k-1), (k^{l+1} - 1)/(k-1) )
        start = 0
        for lvl in range(L):
            n_lvl = k ** lvl
            child_start = start + n_lvl
            ids = np.arange(start, start + n_lvl)
            kid_ids = (child_start
                       + (np.arange(n_lvl * k)).reshape(n_lvl, k))
            children[ids] = kid_ids
            # child descriptors: parent bits with flip_bits flips each
            parent_bits = np.unpackbits(node_desc[ids], axis=1)  # (n,256)
            kid_bits = np.repeat(parent_bits, k, axis=0)
            flips = rng.integers(0, 256, size=(n_lvl * k, flip_bits))
            rows = np.repeat(np.arange(n_lvl * k), flip_bits)
            kid_bits[rows, flips.ravel()] ^= 1
            node_desc[child_start: child_start + n_lvl * k] = np.packbits(
                kid_bits, axis=1)
            start = child_start
        is_leaf[n_internal:] = True
        weights = np.zeros(n_nodes, np.float32)
        weights[n_internal:] = rng.uniform(0.2, 1.0, k ** L).astype(
            np.float32)
        return Vocabulary(children, node_desc, weights, is_leaf, k, L)

    # --------------------------------------------------------- persistence

    def save(self, path: str) -> None:
        """Save as .npz (this framework's native vocabulary format; the
        DBoW2 text format stays readable via load_dbow2_text)."""
        np.savez_compressed(
            path, children=self.children, node_desc=self.node_desc,
            weights=self.weights, is_leaf=self.is_leaf,
            k=np.int32(self.k), L=np.int32(self.L),
        )

    def save_dbow2_text(self, path: str) -> None:
        """Write the reference's DBoW2 text format
        (TemplatedVocabulary::saveToTextFile / loadFromTextFile,
        Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338-1438): header
        "k L scoring weighting", then one line per non-root node in id
        order — "parent is_leaf d0..d31 weight". Node ids are assigned by
        line order on load; our ids are creation-ordered (parent < child)
        so emitting 1..N-1 in order round-trips exactly."""
        n = len(self.node_desc)
        parents = np.full(n, -1, np.int64)
        src = np.repeat(np.arange(len(self.children)), self.children.shape[1])
        dst = self.children.reshape(-1)
        ok = dst >= 0
        parents[dst[ok]] = src[ok]
        # one (n-1, 35) table [parent, is_leaf, d0..d31, weight] written
        # via savetxt (fast enough for ORBvoc-scale, ~1M lines); float64
        # carries the integer columns exactly (all < 2^53)
        table = np.empty((n - 1, 35), np.float64)
        table[:, 0] = parents[1:]
        table[:, 1] = self.is_leaf[1:]
        table[:, 2:34] = self.node_desc[1:]
        table[:, 34] = self.weights[1:]
        with open(path, "w") as f:
            # scoring 0 = L1_NORM, weighting 0 = TF_IDF (ORBvoc settings)
            f.write(f"{self.k} {self.L} 0 0\n")
            np.savetxt(f, table, fmt=["%d"] * 34 + ["%.6f"],
                       delimiter=" ")

    @staticmethod
    def load(path: str) -> "Vocabulary":
        """Load a vocabulary: .npz (native) or DBoW2 text by extension."""
        if path.endswith(".txt"):
            return Vocabulary.load_dbow2_text(path)
        z = np.load(path)
        return Vocabulary(
            z["children"], z["node_desc"], z["weights"],
            z["is_leaf"].astype(bool), int(z["k"]), int(z["L"]),
        )

    @staticmethod
    def load_dbow2_text(path: str) -> "Vocabulary":
        k, L, _scoring, _weighting, parents, descs, weights, leaves = (
            native.parse_vocab_text(path)
        )
        n = len(parents)
        children = np.full((n, k), -1, np.int32)
        fill = np.zeros(n, np.int32)
        for i in range(1, n):
            p = parents[i]
            children[p, fill[p]] = i
            fill[p] += 1
        return Vocabulary(children, descs, weights, leaves.astype(bool), k, L)

    # ----------------------------------------------------------- transform

    def transform_words(self, descriptors: np.ndarray) -> np.ndarray:
        """(N, 32) u8 -> (N,) leaf node ids (host tree descent)."""
        return native.vocab_transform(self.children, self.node_desc, descriptors)

    def transform_words_device(self, descriptors, valid=None) -> np.ndarray:
        """Device tree descent (ops/bow.py): batched per-level Hamming
        argmin under jit — for pipelines whose descriptors are already
        device-resident. Accepts (N, 32) or (B, N, 32)."""
        from ..ops import bow

        return bow.transform_batch(self, descriptors, valid)

    def transform_nodes(
        self, descriptors: np.ndarray, valid: np.ndarray = None,
        device: bool = False,
    ) -> np.ndarray:
        """(N, 32) u8 -> (N,) int64 leaf node ids, -1 where invalid.

        The shared single descent behind bow_vector/feature_vector: one
        transform per keyframe instead of the reference's two (DBoW2
        transform() computes BowVector and FeatureVector in one walk,
        TemplatedVocabulary.h transform(feats, bow, fv, levels_up); the
        earlier rounds here walked the tree once per product)."""
        n = len(descriptors)
        nodes = np.full(n, -1, np.int64)
        idx = np.nonzero(valid)[0] if valid is not None else np.arange(n)
        if len(idx) == 0:
            return nodes
        if device:
            # FIXED-shape call: descend the full padded table and mask,
            # instead of gathering the valid rows — a data-dependent
            # (n_valid, 32) shape would compile a new device program per
            # keyframe (measured 1.65 s/KF through the remote-compile
            # link at ORBvoc scale vs ~5 ms warm at the stable shape)
            w = self.transform_words_device(descriptors, valid=valid)
            nodes[idx] = w[idx]
        else:
            nodes[idx] = self.transform_words(descriptors[idx])
        return nodes

    def bow_vector(
        self, descriptors: np.ndarray, valid: np.ndarray = None,
        nodes: np.ndarray = None,
    ) -> Dict[int, float]:
        """L1-normalized TF-IDF bag of words {word_id: weight}
        (TemplatedVocabulary::transform with TF_IDF + L1 norm).
        Pass `nodes` from transform_nodes to skip the tree descent."""
        if nodes is None:
            nodes = self.transform_nodes(descriptors, valid)
        nd = nodes[nodes >= 0]
        if len(nd) == 0:
            return {}
        words = self.word_of_node[nd]
        wgts = self.weights[nd]
        keep = (words >= 0) & (wgts > 0)
        if not keep.any():
            return {}
        uw, inv = np.unique(words[keep], return_inverse=True)
        sums = np.bincount(inv, weights=wgts[keep].astype(np.float64))
        norm = sums.sum()
        if norm > 0:
            sums = sums / norm
        return {int(w): float(s) for w, s in zip(uw, sums)}

    def feature_nodes(
        self, descriptors: np.ndarray, valid: np.ndarray = None,
        levels_up: int = 4, nodes: np.ndarray = None,
    ) -> np.ndarray:
        """(N,) int64 FeatureVector node id per keypoint (-1 invalid):
        the leaf's ancestor at depth L - levels_up. Array form of DBoW2's
        FeatureVector — what SearchByBoW actually consumes here."""
        if nodes is None:
            nodes = self.transform_nodes(descriptors, valid)
        anc = self._ancestor_at(max(self.L - levels_up, 0))
        out = np.full(len(nodes), -1, np.int64)
        ok = nodes >= 0
        out[ok] = anc[nodes[ok]]
        return out

    def feature_vector(
        self, descriptors: np.ndarray, valid: np.ndarray = None,
        levels_up: int = 4, nodes: np.ndarray = None,
    ) -> Dict[int, List[int]]:
        """Node-at-level -> feature indices (DBoW2 FeatureVector, used by
        SearchByBoW to restrict candidate pairs)."""
        fn = self.feature_nodes(descriptors, valid, levels_up, nodes)
        idx = np.nonzero(fn >= 0)[0]
        fv: Dict[int, List[int]] = {}
        for i in idx:
            fv.setdefault(int(fn[i]), []).append(int(i))
        return fv

    def _parents(self):
        if not hasattr(self, "_parent_arr"):
            n = len(self.node_desc)
            p = np.full(n, -1, np.int32)
            src = np.repeat(
                np.arange(len(self.children), dtype=np.int32),
                self.children.shape[1],
            )
            dst = self.children.reshape(-1)
            ok = dst >= 0
            p[dst[ok]] = src[ok]
            self._parent_arr = p
        return self._parent_arr

    def _depths(self):
        if not hasattr(self, "_depth_arr"):
            n = len(self.node_desc)
            d = np.zeros(n, np.int32)
            frontier = np.array([0], np.int32)
            depth = 0
            while len(frontier) and depth <= self.L + 1:
                kids = self.children[frontier].reshape(-1)
                frontier = kids[kids >= 0].astype(np.int32)
                depth += 1
                d[frontier] = depth
            self._depth_arr = d
        return self._depth_arr

    def _ancestor_at(self, target_depth: int) -> np.ndarray:
        """(nodes,) int32: each node's ancestor at `target_depth` (the
        node itself if already at or above). Cached per depth."""
        cache = getattr(self, "_anc_cache", None)
        if cache is None:
            cache = self._anc_cache = {}
        if target_depth not in cache:
            p, d = self._parents(), self._depths()
            anc = np.arange(len(p), dtype=np.int32)
            for _ in range(int(d.max(initial=0)) - target_depth):
                deep = d[anc] > target_depth
                if not deep.any():
                    break
                anc[deep] = p[anc[deep]]
            cache[target_depth] = anc
        return cache[target_depth]


def l1_score(bow1: Dict[int, float], bow2: Dict[int, float]) -> float:
    """DBoW2 L1Scoring on L1-normalized vectors:
    s = 0.5 * sum_{common} (|v| + |w| - |v - w|)."""
    if len(bow2) < len(bow1):
        bow1, bow2 = bow2, bow1
    s = 0.0
    for w, v in bow1.items():
        u = bow2.get(w)
        if u is not None:
            s += abs(v) + abs(u) - abs(v - u)
    return 0.5 * s
