"""Keyframe database: inverted BoW index for loop/relocalization candidates
(src/KeyFrameDatabase.cc re-designed over the SoA map store).

DetectLoopCandidates: accumulate shared-word counts through the inverted
file, gate at 0.8 * max common words, L1-score gate at minScore, then
covisibility-group score accumulation and the 0.75 * bestAccScore cut —
the reference's exact candidate funnel.
"""

from __future__ import annotations

from typing import Dict, List

from .vocabulary import Vocabulary, l1_score


class KeyFrameDatabase:
    def __init__(self, voc: Vocabulary):
        self.voc = voc
        self.inverted: Dict[int, List[int]] = {}
        self.bow: Dict[int, Dict[int, float]] = {}

    def add(self, kf_id: int, bow_vec: Dict[int, float]):
        self.bow[kf_id] = bow_vec
        for w in bow_vec:
            self.inverted.setdefault(w, []).append(kf_id)

    def erase(self, kf_id: int):
        bow_vec = self.bow.pop(kf_id, None)
        if bow_vec:
            for w in bow_vec:
                lst = self.inverted.get(w)
                if lst and kf_id in lst:
                    lst.remove(kf_id)

    def clear(self):
        self.inverted.clear()
        self.bow.clear()

    def _shared_word_counts(self, bow_vec, exclude) -> Dict[int, int]:
        counts: Dict[int, int] = {}
        for w in bow_vec:
            for kf in self.inverted.get(w, ()):
                if kf not in exclude:
                    counts[kf] = counts.get(kf, 0) + 1
        return counts

    def detect_loop_candidates(
        self, kf_id: int, bow_vec, min_score: float, connected: set, m
    ) -> List[int]:
        """KeyFrameDatabase::DetectLoopCandidates. `connected` is the
        covisibility neighborhood of kf_id; `m` the map store (for group
        expansion)."""
        counts = self._shared_word_counts(bow_vec, connected | {kf_id})
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = int(0.8 * max_common)
        scored = []
        for kf, c in counts.items():
            if c > min_common:
                s = l1_score(bow_vec, self.bow.get(kf, {}))
                if s >= min_score:
                    scored.append((kf, s))
        if not scored:
            return []
        # accumulate score over covisibility groups (top-10 neighbors)
        best_acc = 0.0
        groups = []
        score_of = dict(scored)
        for kf, s in scored:
            acc = s
            best_kf, best_s = kf, s
            for nb, _w in m.covisible_keyframes(kf)[:10]:
                if nb in score_of:
                    acc += score_of[nb]
                    if score_of[nb] > best_s:
                        best_kf, best_s = nb, score_of[nb]
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)
        min_acc = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf in groups:
            if acc > min_acc and kf not in seen:
                seen.add(kf)
                out.append(kf)
        return out

    def detect_relocalization_candidates(self, bow_vec, m) -> List[int]:
        """KeyFrameDatabase::DetectRelocalizationCandidates (same funnel,
        no min_score gate, no connected exclusion)."""
        counts = self._shared_word_counts(bow_vec, set())
        if not counts:
            return []
        max_common = max(counts.values())
        min_common = int(0.8 * max_common)
        scored = [
            (kf, l1_score(bow_vec, self.bow.get(kf, {})))
            for kf, c in counts.items()
            if c > min_common
        ]
        if not scored:
            return []
        score_of = dict(scored)
        best_acc = 0.0
        groups = []
        for kf, s in scored:
            acc = s
            best_kf, best_s = kf, s
            for nb, _w in m.covisible_keyframes(kf)[:10]:
                if nb in score_of:
                    acc += score_of[nb]
                    if score_of[nb] > best_s:
                        best_kf, best_s = nb, score_of[nb]
            groups.append((acc, best_kf))
            best_acc = max(best_acc, acc)
        min_acc = 0.75 * best_acc
        out, seen = [], set()
        for acc, kf in groups:
            if acc > min_acc and kf not in seen:
                seen.add(kf)
                out.append(kf)
        return out
