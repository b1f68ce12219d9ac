"""Place-recognition database (rebuild of src/KeyFrameDatabase.cc + DBoW2).

The reference uses a DBoW2 `TemplatedVocabulary<FORB>` inverted file. The
TPU-native equivalent keeps the same retrieval contract
(`add/erase/DetectNBestCandidates` with covisibility-group scoring,
KeyFrameDatabase.cc:604) over a vocabulary-free binary signature: each
keyframe is summarized by a bag of LSH words (random bit-triples of its ORB
descriptors), scored by word-overlap — the same inverted-file + common-words
+ covisibility-accumulation logic, without shipping a 100 MB text vocabulary.
"""

from __future__ import annotations

import numpy as np

from .map_store import KeyFrame


class KeyFrameDatabase:
    def __init__(self, n_words: int = 4096, bits_per_word: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.n_words = n_words
        # each word = a random subset of descriptor bits hashed to a bucket
        self.bit_idx = rng.randint(0, 256, (bits_per_word,))
        self.weights = (1 << np.arange(bits_per_word)).astype(np.int64)
        self.inverted: dict[int, set[int]] = {}
        self.kf_words: dict[int, np.ndarray] = {}
        self.kfs: dict[int, KeyFrame] = {}

    def _words(self, kf: KeyFrame) -> np.ndarray:
        descs = [d for d in kf.descriptors if len(d)]
        if not descs:
            return np.zeros(0, np.int64)
        D = np.concatenate(descs, axis=0)
        bits = np.unpackbits(D, axis=1)[:, self.bit_idx]
        words = (bits.astype(np.int64) @ self.weights) % self.n_words
        return np.unique(words)

    def add(self, kf: KeyFrame):
        words = self._words(kf)
        self.kf_words[kf.id] = words
        self.kfs[kf.id] = kf
        for w in words:
            self.inverted.setdefault(int(w), set()).add(kf.id)

    def erase(self, kf: KeyFrame):
        for w in self.kf_words.pop(kf.id, []):
            self.inverted.get(int(w), set()).discard(kf.id)
        self.kfs.pop(kf.id, None)

    def detect_n_best_candidates(self, kf: KeyFrame, n: int = 3,
                                 exclude: set | None = None) -> list[KeyFrame]:
        """DetectNBestCandidates: count shared words, filter by 0.8*max,
        accumulate over covisibility groups, return the top-n group leaders."""
        exclude = exclude or set()
        words = self._words(kf)
        shared: dict[int, int] = {}
        for w in words:
            for kf_id in self.inverted.get(int(w), ()):  # inverted file walk
                if kf_id == kf.id or kf_id in exclude:
                    continue
                shared[kf_id] = shared.get(kf_id, 0) + 1
        if not shared:
            return []
        max_common = max(shared.values())
        min_common = 0.8 * max_common
        scored = {k: v for k, v in shared.items() if v >= min_common}
        # covisibility-group accumulation
        group_scores = []
        for kf_id, sc in scored.items():
            cand = self.kfs.get(kf_id)
            if cand is None or cand.bad:
                continue
            acc = sc
            best_kf = cand
            best_sc = sc
            for nb_id in cand.best_covisible(10):
                if nb_id in shared:
                    acc += shared[nb_id]
                    if shared[nb_id] > best_sc:
                        best_sc = shared[nb_id]
                        best_kf = self.kfs.get(nb_id, cand)
            group_scores.append((acc, best_kf))
        group_scores.sort(key=lambda x: -x[0])
        out, seen = [], set()
        for _, k in group_scores:
            if k is not None and k.id not in seen:
                out.append(k)
                seen.add(k.id)
            if len(out) >= n:
                break
        return out

    # DetectRelocalizationCandidates shares the same scoring path
    detect_relocalization_candidates = detect_n_best_candidates
