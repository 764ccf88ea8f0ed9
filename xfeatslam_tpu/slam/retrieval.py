"""Place-recognition retrieval over float descriptors.

Replaces DBoW2 (/root/reference/thirdparty/DBoW2/) and KeyFrameDatabase
(/root/reference/src/KeyFrameDatabase.cc). The reference feeds XFeat float
descriptors through a binary ORB vocabulary by reinterpreting the first 32
bytes as bits (SURVEY.md §2.3.3) — quantization is essentially arbitrary.
Here retrieval is designed for floats:

- Each KF gets a **VLAD global descriptor** over a fixed random codebook
  (``aggregate_global_desc``): local descriptors are assigned to their
  nearest of K unit anchors and the per-anchor residual sums are intra- and
  globally L2-normalized. Mean pooling (round 1) collapses hundreds of
  near-orthogonal descriptors into noise; VLAD keeps the *which-words-with-
  which-residuals* structure that makes DBoW2's tf-idf tree discriminative,
  with no training data needed.
- Queries are one cosine-similarity matmul over all stored KFs — brute
  force is exact and fast at SLAM scale (hundreds of KFs) and batches on
  TPU.
- ``query_grouped`` reproduces DetectNBestCandidates' covisibility-group
  accumulated scoring (/root/reference/src/KeyFrameDatabase.cc:604-733):
  candidate scores accumulate over covisibility groups and each group
  contributes its best-scoring member.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Set, Tuple

import numpy as np

# Codebook size: 64 anchors measured on a 3-scene x 24-view rendered bank
# (tests/test_retrieval_scale.py): true-revisit ~0.85 cosine vs cross-scene
# max ~0.53 — 16 anchors leave only a 0.14 margin on a ~0.75 pedestal.
N_ANCHORS = 64
# signed power normalization exponent (Jegou et al. burstiness fix); 1.0
# disables it
POWER_ALPHA = 0.5
_ANCHORS: Dict[int, np.ndarray] = {}
# dims whose codebook was installed via use_codebook() (data-derived) as
# opposed to the seeded default — these must be persisted with the atlas,
# or a resumed process aggregates queries under the default codebook
# against stored globals aggregated under the fitted one
_FITTED: Set[int] = set()


def _anchors(dim: int) -> np.ndarray:
    """Fixed random unit codebook (seeded — identical across processes so
    serialized maps stay queryable). A data-derived codebook can replace it
    via fit_codebook()/use_codebook()."""
    a = _ANCHORS.get(dim)
    if a is None:
        rng = np.random.default_rng(12345)
        a = rng.standard_normal((N_ANCHORS, dim)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        _ANCHORS[dim] = a
    return a


def fit_codebook(descs: np.ndarray, n_anchors: int = N_ANCHORS,
                 iters: int = 12, seed: int = 0) -> np.ndarray:
    """Spherical k-means codebook fit on local descriptors (the data-derived
    vocabulary option — role of DBoW2's trained ORB vocabulary,
    /root/reference/thirdparty/DBoW2). Returns (n_anchors, dim) unit
    anchors; activate with use_codebook(). On self-similar workloads
    (repeated office texture) data-derived anchors separate the common-
    texture pedestal better than random ones."""
    d = np.asarray(descs, np.float32)
    d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    rng = np.random.default_rng(seed)
    C = d[rng.choice(len(d), size=n_anchors, replace=len(d) < n_anchors)]
    C = C / np.maximum(np.linalg.norm(C, axis=-1, keepdims=True), 1e-9)
    for _ in range(iters):
        assign = np.argmax(d @ C.T, axis=-1)
        for a in range(n_anchors):
            sel = d[assign == a]
            if len(sel):
                C[a] = sel.sum(0)
        # re-seed empty clusters from the least-well-represented points
        sims = (d * C[assign]).sum(-1)
        empties = [a for a in range(n_anchors) if (assign == a).sum() == 0]
        if empties:
            worst = np.argsort(sims)[: len(empties)]
            C[empties] = d[worst]
        C = C / np.maximum(np.linalg.norm(C, axis=-1, keepdims=True), 1e-9)
    return C.astype(np.float32)


def use_codebook(anchors: Optional[np.ndarray], dim: Optional[int] = None):
    """Install a codebook for `dim` (anchors.shape[1] when given); pass
    anchors=None with dim to restore the default random codebook. Global
    descriptors computed before the switch are incompatible — callers must
    re-aggregate stored keyframes (System.refit_retrieval_codebook does)."""
    if anchors is None:
        _ANCHORS.pop(dim, None)
        _FITTED.discard(dim)
    else:
        a = np.asarray(anchors, np.float32)
        _ANCHORS[a.shape[1]] = a / np.maximum(
            np.linalg.norm(a, axis=-1, keepdims=True), 1e-9)
        _FITTED.add(a.shape[1])


def installed_codebook(dim: int) -> Optional[np.ndarray]:
    """The data-derived codebook installed for `dim`, or None when the
    seeded default is in effect (used by atlas serialization: only fitted
    codebooks need to travel with the checkpoint)."""
    return _ANCHORS.get(dim) if dim in _FITTED else None


def aggregate_global_desc(desc: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """VLAD aggregate of a frame/KF's local descriptors -> (N_ANCHORS*dim,)
    unit vector. Works for float (XFeat, unit 64-d) and binary (ORB 256-d
    0/1) descriptors alike."""
    dim = desc.shape[1]
    d = desc[valid].astype(np.float32)
    out_dim = N_ANCHORS * dim
    if len(d) == 0:
        return np.zeros(out_dim, np.float32)
    norms = np.linalg.norm(d, axis=-1, keepdims=True)
    d = d / np.maximum(norms, 1e-9)
    C = _anchors(dim)
    assign = np.argmax(d @ C.T, axis=-1)  # (N,)
    v = np.zeros((N_ANCHORS, dim), np.float32)
    np.add.at(v, assign, d - C[assign])
    # intra-normalization tames burstiness (Arandjelovic & Zisserman 2013)
    v /= np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-9)
    v = v.reshape(-1)
    # signed power norm: shrinks the common-texture pedestal that dominates
    # cross-scene similarity on repeated structure
    if POWER_ALPHA != 1.0:
        v = np.sign(v) * np.abs(v) ** POWER_ALPHA
    n = np.linalg.norm(v)
    return (v / n if n > 1e-9 else v).astype(np.float32)


def global_desc_dim(desc_dim: int) -> int:
    return N_ANCHORS * desc_dim


class Retrieval:
    def __init__(self, dim: int = 64, capacity: int = 1024):
        self.dim = dim
        self.cap = capacity
        self.descs = np.zeros((capacity, dim), np.float32)
        self.kids = np.full(capacity, -1, np.int64)
        self.map_ids = np.full(capacity, -1, np.int64)
        self.n = 0
        # (map_id, kid) -> row: keyframe ids restart per map, so the key
        # must carry the map (two maps both have a KF 0)
        self._index: Dict[Tuple[int, int], int] = {}

    def add(self, kid: int, gdesc: np.ndarray, map_id: int = 0):
        """Atlas-wide: entries carry their map id (the reference keeps ONE
        KeyFrameDatabase across all Atlas maps, which is what makes map
        merging discoverable)."""
        if self.n >= self.cap:
            self.cap *= 2
            d = np.zeros((self.cap, self.dim), np.float32)
            d[: self.n] = self.descs[: self.n]
            self.descs = d
            for name in ("kids", "map_ids"):
                a = getattr(self, name)
                k = np.full(self.cap, -1, np.int64)
                k[: self.n] = a[: self.n]
                setattr(self, name, k)
        self.descs[self.n] = gdesc
        self.kids[self.n] = kid
        self.map_ids[self.n] = map_id
        self._index[(map_id, kid)] = self.n
        self.n += 1

    def remove(self, kid: int, map_id: int = 0):
        """Evict a culled keyframe (KeyFrameDatabase::erase, called from
        SetBadFlag — /root/reference/src/KeyFrame.cc:655). Without this a
        dead KF can win a similarity query and crash loop verification."""
        i = self._index.pop((map_id, kid), None)
        if i is not None:
            self.kids[i] = -1

    def retag_map(self, old_map_id: int, new_map_id: int, kid_offset: int):
        """A map merge moved every keyframe of ``old_map_id`` into
        ``new_map_id`` with ids shifted by ``kid_offset`` — keep the stored
        entries queryable under their new identity."""
        for key in [k for k in self._index if k[0] == old_map_id]:
            row = self._index.pop(key)
            new_kid = key[1] + kid_offset
            self.kids[row] = new_kid
            self.map_ids[row] = new_map_id
            self._index[(new_map_id, new_kid)] = row

    def query(self, gdesc: np.ndarray, exclude: Set[int],
              top_n: int = 3, min_score: float = 0.30,
              with_map: bool = False, exclude_map_id: Optional[int] = None):
        """Top-N most similar stored KFs (cosine), excluding the covisible
        set — the DetectNBestCandidates role
        (/root/reference/src/KeyFrameDatabase.cc:604). With with_map=True
        returns (kid, map_id, score) triples (cross-map candidates drive
        map merging)."""
        if self.n == 0:
            return []
        sims = self.descs[: self.n] @ gdesc
        order = np.argsort(-sims)
        out = []
        for i in order:
            kid = int(self.kids[i])
            if kid < 0:
                continue
            # exclusion sets are keyframe ids of ONE map — ids collide
            # across maps, so only apply them to that map's entries
            if kid in exclude and (
                exclude_map_id is None
                or int(self.map_ids[i]) == exclude_map_id
            ):
                continue
            if sims[i] < min_score:
                break
            if with_map:
                out.append((kid, int(self.map_ids[i]), float(sims[i])))
            else:
                out.append((kid, float(sims[i])))
            if len(out) >= top_n:
                break
        return out

    def query_grouped(self, gdesc: np.ndarray, exclude: Set[int],
                      covisibles: Callable[[int], List[int]],
                      top_n: int = 3, min_score: float = 0.30,
                      map_id: Optional[int] = None):
        """DetectNBestCandidates semantics
        (/root/reference/src/KeyFrameDatabase.cc:604-733): score candidates
        individually, accumulate scores over each candidate's covisibility
        group (candidate + up to 10 best covisibles that also scored), and
        return the best-scoring member of each of the top-N groups.
        Restricted to one map (pass map_id); cross-map merge candidates go
        through plain `query(with_map=True)`."""
        if self.n == 0:
            return []
        sims = self.descs[: self.n] @ gdesc
        score_of: Dict[int, float] = {}
        for i in range(self.n):
            kid = int(self.kids[i])
            if kid < 0 or (map_id is not None and int(self.map_ids[i]) != map_id):
                continue
            if kid in exclude or sims[i] < min_score:
                continue
            score_of[kid] = float(sims[i])
        if not score_of:
            return []
        groups = []  # (acc_score, best_kid, best_score)
        for kid, s in score_of.items():
            acc, best_kid, best_s = s, kid, s
            for ck in covisibles(kid)[:10]:
                cs = score_of.get(ck)
                if cs is not None:
                    acc += cs
                    if cs > best_s:
                        best_kid, best_s = ck, cs
            groups.append((acc, best_kid, best_s))
        groups.sort(reverse=True)
        out, seen = [], set()
        for acc, best_kid, best_s in groups:
            if best_kid in seen:
                continue
            seen.add(best_kid)
            out.append((best_kid, best_s))
            if len(out) >= top_n:
                break
        return out
