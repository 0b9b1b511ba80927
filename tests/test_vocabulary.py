import numpy as np
import pytest

pytestmark = pytest.mark.smoke

from iv_slam_tpu import native
from iv_slam_tpu.slam.vocabulary import Vocabulary, l1_score
from iv_slam_tpu.slam.keyframe_db import KeyFrameDatabase


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(9)
    # clustered binary descriptors: 20 clusters with bit-flip noise
    centers = rng.integers(0, 256, (20, 32)).astype(np.uint8)
    descs = []
    for c in centers:
        bits = np.unpackbits(np.tile(c, (50, 1)), axis=1)
        flip = rng.uniform(size=bits.shape) < 0.03
        descs.append(np.packbits(bits ^ flip, axis=1))
    return np.concatenate(descs), centers


def test_native_extension_available():
    assert native.available(), "build iv_slam_tpu/native first"


def test_vocab_train_and_transform(corpus):
    descs, centers = corpus
    voc = Vocabulary.train(descs, k=5, L=3, seed=1)
    assert voc.n_words > 20
    words = voc.transform_words(descs)
    assert words.shape == (len(descs),)
    # same-cluster descriptors should mostly land on the same word
    same, diff = 0, 0
    w = voc.word_of_node[words].reshape(20, 50)
    for c in range(20):
        counts = np.bincount(w[c])
        same += counts.max()
        diff += 50 - counts.max()
    assert same / (same + diff) > 0.8


def test_native_transform_matches_numpy(corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs[:200], k=4, L=2, seed=2)
    out_native = native.vocab_transform(voc.children, voc.node_desc, descs[:50])
    # pure-python fallback
    import iv_slam_tpu.native as nat

    saved = nat._native
    nat._native = None
    try:
        out_py = nat.vocab_transform(voc.children, voc.node_desc, descs[:50])
    finally:
        nat._native = saved
    np.testing.assert_array_equal(out_native, out_py)


def test_bow_scoring_discriminates(corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs, k=5, L=3, seed=1)
    rng = np.random.default_rng(3)
    a = descs[rng.choice(len(descs), 100, replace=False)]
    # b = a with small noise; c = disjoint random sample
    bits = np.unpackbits(a, axis=1)
    b = np.packbits(bits ^ (rng.uniform(size=bits.shape) < 0.02), axis=1)
    c = rng.integers(0, 256, (100, 32)).astype(np.uint8)
    va, vb, vc = (voc.bow_vector(x) for x in (a, b, c))
    assert l1_score(va, vb) > l1_score(va, vc) + 0.2
    assert 0.0 <= l1_score(va, vc) <= 1.0
    assert l1_score(va, va) > 0.99


def test_dbow2_text_roundtrip(tmp_path, corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs[:300], k=3, L=2, seed=4)
    # write in DBoW2 text format: header + per-node lines (BFS order with
    # parent ids; node 0 = root implicit)
    path = str(tmp_path / "voc.txt")
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.L} 0 0\n")
        for node in range(1, len(voc.node_desc)):
            parent = voc._parents()[node]
            leaf = 1 if voc.is_leaf[node] else 0
            dstr = " ".join(str(int(v)) for v in voc.node_desc[node])
            f.write(f"{parent} {leaf} {dstr} {float(voc.weights[node])}\n")
    voc2 = Vocabulary.load_dbow2_text(path)
    assert voc2.n_words == voc.n_words
    w1 = voc.word_of_node[voc.transform_words(descs[:40])]
    w2 = voc2.word_of_node[voc2.transform_words(descs[:40])]
    np.testing.assert_array_equal(w1, w2)


def test_device_transform_matches_host(corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs, k=5, L=3, seed=1)
    host = voc.transform_words(descs[:300])
    dev = voc.transform_words_device(descs[:300])
    np.testing.assert_array_equal(host, dev)
    # batched (B, N, 32) form
    batch = descs[:300].reshape(3, 100, 32)
    dev_b = voc.transform_words_device(batch)
    np.testing.assert_array_equal(dev_b.reshape(-1), host)
    # valid mask -> -1
    valid = np.zeros(300, bool)
    valid[::2] = True
    dev_m = voc.transform_words_device(descs[:300], valid=valid)
    np.testing.assert_array_equal(dev_m[::2], host[::2])
    assert (dev_m[1::2] == -1).all()


def test_device_transform_ragged_tree(corpus):
    """Trees with under-full nodes (k-medians on small subsets leaves
    children rows padded with -1) must still match the host walk."""
    descs, _ = corpus
    rng = np.random.default_rng(11)
    small = descs[rng.choice(len(descs), 60, replace=False)]
    voc = Vocabulary.train(small, k=7, L=3, seed=5)
    assert (voc.children == -1).any()  # the tree really is ragged
    probe = descs[:200]
    np.testing.assert_array_equal(
        voc.transform_words(probe), voc.transform_words_device(probe)
    )


def test_npz_save_load_roundtrip(tmp_path, corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs[:300], k=3, L=2, seed=4)
    path = str(tmp_path / "voc.npz")
    voc.save(path)
    voc2 = Vocabulary.load(path)
    assert voc2.n_words == voc.n_words
    assert (voc2.k, voc2.L) == (voc.k, voc.L)
    w1 = voc.word_of_node[voc.transform_words(descs[:40])]
    w2 = voc2.word_of_node[voc2.transform_words(descs[:40])]
    np.testing.assert_array_equal(w1, w2)
    np.testing.assert_allclose(voc2.weights, voc.weights)


class _MiniMap:
    def covisible_keyframes(self, kf_id, min_weight=15):
        return []


def test_keyframe_db_loop_candidates(corpus):
    descs, _ = corpus
    voc = Vocabulary.train(descs, k=5, L=3, seed=1)
    rng = np.random.default_rng(5)
    db = KeyFrameDatabase(voc)
    sets = []
    for kf in range(6):
        s = descs[rng.choice(len(descs), 80, replace=False)]
        sets.append(s)
        db.add(kf, voc.bow_vector(s))
    # query: near-duplicate of kf 2
    bits = np.unpackbits(sets[2], axis=1)
    q = np.packbits(bits ^ (rng.uniform(size=bits.shape) < 0.01), axis=1)
    qv = voc.bow_vector(q)
    m = _MiniMap()
    cands = db.detect_loop_candidates(99, qv, min_score=0.05,
                                      connected=set(), m=m)
    assert 2 in cands
    reloc = db.detect_relocalization_candidates(qv, m)
    assert 2 in reloc
