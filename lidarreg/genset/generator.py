"""Balanced registration-set generator (offline CPU tool).

Rebuild of BalancedDatasetGenerator/GenerateBalancedSet.py — the algorithm
that produced the published balanced sets:

  1. candidate extraction per driving session (parallel processes,
     :574-600): stride over source frames; for each, binary-search the
     farthest frame whose GT-aligned overlap stays >= minimum_overlap
     (overlap = 1 m-voxel-downsampled NN fraction with sqrt(2) m tolerance,
     symmetric min, :149-205); pick a random target in (i, j_max] and record
     session/i/j/motion/fields/overlaps (:321-395);
  2. balanced selection (:456-507,528-572): map candidates to the 6-D unit
     hypercube of (tx, ty, tz, roll, pitch, yaw); rejection-sample a random
     6-D point; accept the nearest candidate within 0.1 belonging to the
     least-full session (PerSessionCounter fairness, :94-111); remove and
     re-normalize; repeat until the requested sizes are filled; split and
     save.

GT refinement options (:220-319): per-candidate ICP refine (our TPU ICP or
any callable) and Z-only IRLS refine for datasets with vertical GT drift
(NuScenes/Lyft). Output format identical to the published sets
(lidarreg.data.balanced).
"""
from __future__ import annotations

import dataclasses
import multiprocessing as mp
import os
import pickle
from typing import Callable, Sequence

import numpy as np
from scipy.spatial import cKDTree

from ..data.balanced import BalancedPairs, write_balanced_set


@dataclasses.dataclass
class GensetConfig:
    sizes: tuple = (4000, 200, 7000)      # train / validation / test
    round_to_multiple: int = 96           # GenerateBalancedSet.py:654-751
    minimum_overlap: float = 0.2
    max_spacing: int = 1000
    source_stride: int = 10
    overlap_measure: str = "symmetric"    # 'src_to_tgt' | 'symmetric'
    overlap_voxel: float = 1.0
    refine_GT_for_candidate: bool = False
    refine_GT_Z_only: bool = False
    num_workers: int = 10
    seed: int = 0
    cache_dir: str = "/tmp/lidarreg_genset"
    output_dir: str = "outputs/balanced_sets"


# ----------------------------------------------------------------------- #
# geometry helpers                                                        #
# ----------------------------------------------------------------------- #

def voxel_downsample_np(pts: np.ndarray, voxel: float) -> np.ndarray:
    """Centroid-per-voxel downsample (numpy; offline path)."""
    q = np.floor(pts / voxel).astype(np.int64)
    _, inv = np.unique(q, axis=0, return_inverse=True)
    sums = np.zeros((inv.max() + 1, 3))
    np.add.at(sums, inv, pts)
    counts = np.bincount(inv)
    return sums / counts[:, None]


def overlap_fraction(A: np.ndarray, B: np.ndarray, voxel: float = 1.0):
    """(src->tgt overlap, symmetric overlap) — GenerateBalancedSet.py:155-179."""
    A_ = voxel_downsample_np(A, voxel)
    B_ = voxel_downsample_np(B, voxel)
    d, _ = cKDTree(B_).query(A_, k=1, workers=-1)
    n_over = int((d < np.sqrt(2) * voxel).sum())
    frac = n_over / len(A_)
    return frac, min(frac, n_over / len(B_))


def rotation_matrix_euler_deg(R: np.ndarray) -> np.ndarray:
    """ZYX euler extraction in degrees (utils/tools_3d.py:26-45)."""
    sy = np.hypot(R[0, 0], R[1, 0])
    if sy > 1e-6:
        x = np.arctan2(R[2, 1], R[2, 2])
        y = np.arctan2(-R[2, 0], sy)
        z = np.arctan2(R[1, 0], R[0, 0])
    else:
        x = np.arctan2(-R[1, 2], R[1, 1])
        y = np.arctan2(-R[2, 0], sy)
        z = 0.0
    return np.degrees([x, y, z])


def motion_to_fields(M: np.ndarray) -> np.ndarray:
    return np.hstack([M[:3, 3], rotation_matrix_euler_deg(M[:3, :3])])


def refine_motion_z_irls(M: np.ndarray, A: np.ndarray, B: np.ndarray,
                         iters: int = 5) -> np.ndarray:
    """Z-only IRLS GT refinement for datasets with vertical pose drift
    (GenerateBalancedSet.py refine_GT_Z_only; NuScenes/Lyft recipes)."""
    A_w = A @ M[:3, :3].T + M[:3, 3]
    B_t = cKDTree(voxel_downsample_np(B, 1.0))
    A_d = voxel_downsample_np(A_w, 1.0)
    dz = 0.0
    for _ in range(iters):
        d, idx = B_t.query(A_d + [0, 0, dz], k=1, workers=-1)
        close = d < 2.0
        if close.sum() < 10:
            break
        res = B_t.data[idx[close], 2] - (A_d[close, 2] + dz)
        w = 1.0 / (1.0 + (res / 0.3) ** 2)
        dz += float(np.sum(w * res) / np.sum(w))
    out = M.copy()
    out[2, 3] += dz
    return out


# ----------------------------------------------------------------------- #
# generator                                                               #
# ----------------------------------------------------------------------- #

class PerSessionCounter:
    """Fair-representation bookkeeping (GenerateBalancedSet.py:94-111)."""

    def __init__(self, sessions: Sequence[int]):
        self.num_cands = {int(s): 0 for s in sessions}
        self.num_selected = {int(s): 0 for s in sessions}

    def record_num_cands(self, s, n):
        self.num_cands[int(s)] = n

    def fullness(self, session_inds):
        return np.asarray([
            self.num_selected[int(s)] / max(self.num_cands[int(s)], 1)
            for s in session_inds
        ])

    def record_selected(self, s):
        self.num_selected[int(s)] += 1


class BalancedSetGenerator:
    """dataset adapter protocol: `session_count()`, `session_length(s)`,
    `load_PC(s, i) -> [N, 3]`, `get_relative_motion(s, i, j) -> [4, 4]`."""

    def __init__(self, dataset, config: GensetConfig,
                 refine_icp: Callable | None = None):
        self.ds = dataset
        self.config = config
        self.refine_icp = refine_icp
        os.makedirs(config.cache_dir, exist_ok=True)

    # ---- candidate extraction ---------------------------------------- #

    def calc_gt_overlap(self, A, B, mot, both=False):
        A_w = A @ mot[:3, :3].T + mot[:3, 3]
        frac, sym = overlap_fraction(A_w, B, self.config.overlap_voxel)
        if both:
            return frac, sym
        return sym if self.config.overlap_measure == "symmetric" else frac

    def find_farthest_partner(self, s, i, A, N, previous_spacing=None):
        """Binary search with previous-spacing warm start (:321-371)."""
        cfg = self.config
        if previous_spacing is not None:
            j = min(self._last_index(N), i + previous_spacing)
            if i < j:
                ov = self.calc_gt_overlap(
                    A, self.ds.load_PC(s, j),
                    self.ds.get_relative_motion(s, i, j),
                )
                if abs(ov / cfg.minimum_overlap - 1) < 0.1:
                    return j
        high = min(self._last_index(N), i + cfg.max_spacing)
        low = i + 1
        init = previous_spacing if previous_spacing is not None else 50
        j = max(low + 1, min(high - 1, i + init))
        while high - low > 5:
            ov = self.calc_gt_overlap(
                A, self.ds.load_PC(s, j), self.ds.get_relative_motion(s, i, j)
            )
            if ov > cfg.minimum_overlap:
                low = j + 1
            else:
                high = j - 1
            j = (low + high) // 2
        return low - 1 if (low - 1) > i else None

    def candidate_record(self, s, i, j, A):
        B = self.ds.load_PC(s, j)
        mot = self.ds.get_relative_motion(s, i, j)
        if self.config.refine_GT_for_candidate and self.refine_icp is not None:
            mot = self.refine_icp(mot, A, B)
        if self.config.refine_GT_Z_only:
            mot = refine_motion_z_irls(mot, A, B)
        frac, sym = self.calc_gt_overlap(A, B, mot, both=True)
        ov = sym if self.config.overlap_measure == "symmetric" else frac
        if ov < self.config.minimum_overlap:
            return None
        return np.concatenate([
            [s, i, j], mot.flatten(), motion_to_fields(mot), [frac, sym],
        ])

    def _offset(self) -> int:
        """Frame indexing base: Apollo frames start at 1
        (ApolloSouthbay.py:171 indexing_from)."""
        get = getattr(self.ds, "indexing_from", None)
        return int(get()) if callable(get) else 0

    def _last_index(self, N: int) -> int:
        return N + self._offset() - 1

    def create_candidate_set(self, s: int) -> np.ndarray:
        """Stride source frames; random target inside the overlap window
        (:405-454)."""
        rng = np.random.default_rng(self.config.seed + s)
        N = self.ds.session_length(s)
        records = []
        prev_spacing = None
        off = self._offset()
        for i in range(off, N + off - 1, self.config.source_stride):
            A = self.ds.load_PC(s, i)
            j_max = self.find_farthest_partner(s, i, A, N, prev_spacing)
            if j_max is None:
                prev_spacing = None
                continue
            prev_spacing = j_max - i
            j = int(rng.integers(i + 1, j_max + 1))
            rec = self.candidate_record(s, i, j, A)
            if rec is not None:
                records.append(rec)
        return np.asarray(records) if records else np.zeros((0, 27))

    def _worker(self, s: int):
        cands = self.create_candidate_set(s)
        with open(self._cand_file(s), "wb") as f:
            pickle.dump(cands, f)

    def _cand_file(self, s):
        return os.path.join(self.config.cache_dir, f"cands_{self.ds.name}_{s}.pkl")

    def extract_all_candidates(self) -> np.ndarray:
        """Per-session extraction in up to num_workers processes (:574-600)."""
        # raw adapters restrict to a phase's sessions (e.g. KITTI test is
        # [8, 9, 10] — datasets/KITTI.py:79-84); plain adapters expose a count
        sessions = list(
            getattr(self.ds, "sessions_list", None)
            or range(self.ds.session_count())
        )
        todo = [s for s in sessions if not os.path.exists(self._cand_file(s))]
        if todo:
            if self.config.num_workers > 1:
                procs = []
                for s in todo:
                    p = mp.Process(target=self._worker, args=(s,))
                    p.start()
                    procs.append(p)
                    while len([q for q in procs if q.is_alive()]) >= self.config.num_workers:
                        for q in procs:
                            q.join(0.05)
                for p in procs:
                    p.join()
            else:
                for s in todo:
                    self._worker(s)
        all_c = []
        for s in sessions:
            with open(self._cand_file(s), "rb") as f:
                c = pickle.load(f)
            if len(c):
                all_c.append(c)
        return np.vstack(all_c)

    # ---- balanced selection ------------------------------------------ #

    @staticmethod
    def to_hypercube(cands: np.ndarray) -> np.ndarray:
        """Unit-hypercube embedding of (tx,ty,tz,roll,pitch,yaw). Degenerate
        dimensions (constant across all candidates — e.g. planar datasets
        with no roll spread) are zeroed AND excluded from the acceptance
        distance, otherwise the 0.1-ball rejection sampler almost never
        hits the lower-dimensional candidate manifold."""
        fields = cands[:, 19:25]
        m = fields.min(0, keepdims=True)
        M = fields.max(0, keepdims=True)
        span = M - m
        # scale-aware degeneracy: spreads below 1 mm / 0.001 deg are noise
        # (e.g. ICP-refine jitter on a translation-only drive), and
        # normalizing them to [0, 1] would starve the 0.1-ball sampler
        active = span[0] > 1e-3
        pts = np.where(active, (fields - m) / np.maximum(span, 1e-12), 0.0)
        return pts, active

    def select_balanced(self, cands: np.ndarray, total: int,
                        rng: np.random.Generator) -> np.ndarray:
        """Hypercube rejection sampling with session fairness (:466-507)."""
        counter = PerSessionCounter(np.unique(cands[:, 0]).astype(int))
        for s in np.unique(cands[:, 0]).astype(int):
            counter.record_num_cands(s, int((cands[:, 0] == s).sum()))
        points, active = self.to_hypercube(cands)
        selected = []
        guard = 0
        while len(selected) < total and len(cands) and guard < total * 10_000:
            guard += 1
            r = rng.random(6) * active
            d = np.sqrt((((points - r) * active) ** 2).sum(1))
            close = d < 0.1
            if not close.any():
                continue
            group = np.nonzero(close)[0]
            fullness = counter.fullness(cands[group, 0])
            rare = group[fullness == fullness.min()]
            sel = rare[np.argmin(d[rare])]
            counter.record_selected(cands[sel, 0])
            selected.append(cands[sel])
            cands = np.delete(cands, sel, axis=0)
            if len(cands):
                points, active = self.to_hypercube(cands)
        return np.asarray(selected)

    def create_set(self):
        """Full pipeline -> {train, validation, test} BalancedPairs + files."""
        cfg = self.config
        cands = self.extract_all_candidates()
        rng = np.random.default_rng(cfg.seed)
        # unconditional ceil like the reference (GenerateBalancedSet.py:
        # 138-140, `np.ceil(s/m)*m`): the published sets confirm it
        # (requested 7000/200/300 -> written 7008/288/384)
        m = cfg.round_to_multiple
        sizes = [int(np.ceil(sz / m)) * m for sz in cfg.sizes]
        sel = self.select_balanced(cands, sum(sizes), rng)
        sel = np.asarray(sel).reshape(-1, 27)
        if len(sel) < sum(sizes):
            # not enough candidates for the requested sizes: shrink the
            # splits proportionally (the reference asserts instead; a
            # degraded set is more useful than a crash for small worlds)
            scale = len(sel) / max(sum(sizes), 1)
            sizes = [int(sz * scale) for sz in sizes]
        perm = rng.permutation(len(sel))
        out = {}
        off = 0
        for name, sz in zip(("train", "validation", "test"), sizes):
            rows = sel[perm[off:off + sz]]
            off += sz
            if sz == 0:
                # phase-recipes request a subset of splits (e.g. the test
                # phase only writes test.txt, GenerateBalancedSet.py:661-663);
                # never clobber another phase's files with empties
                continue
            # sort by (session, src) like save_set (:509-517)
            order = np.lexsort((rows[:, 1], rows[:, 0]))
            rows = rows[order]
            pairs = BalancedPairs(
                session_ind=rows[:, 0].astype(np.int64),
                src_ind=rows[:, 1].astype(np.int64),
                tgt_ind=rows[:, 2].astype(np.int64),
                motions=rows[:, 3:19].reshape(-1, 4, 4),
                translations=rows[:, 19:22],
                rpy=rows[:, 22:25],
                overlap=rows[:, 25],
                overlap_symmetric=rows[:, 26],
            )
            path = os.path.join(
                cfg.output_dir, self.ds.name, f"{name}.txt"
            )
            write_balanced_set(path, pairs)
            out[name] = pairs
        return out


# Dataset recipes (GenerateBalancedSet.py:647-751). `sizes` are the
# REQUESTED train/validation/test counts; create_set ceil-rounds each to a
# multiple of 96, matching the published files (7000 -> 7008, 200 -> 288,
# 300 -> 384, 2500 -> 2592). cli.genset maps splits to the dataset phase
# each is extracted from (e.g. Apollo train+validation come from the
# 'train' archive, test from the 'test' archive, :653-663).
RECIPES = {
    "ApolloSouthbay": GensetConfig(sizes=(4000, 200, 7000)),
    "KITTI": GensetConfig(
        sizes=(1400, 200, 600), refine_GT_for_candidate=True,
    ),
    "NuScenes_boston": GensetConfig(
        sizes=(4000, 300, 2500), refine_GT_for_candidate=True,
        refine_GT_Z_only=True,
    ),
    "NuScenes_singapore": GensetConfig(
        sizes=(4000, 300, 2500), refine_GT_for_candidate=True,
        refine_GT_Z_only=True,
    ),
    "LyftLEVEL5": GensetConfig(
        sizes=(2000, 200, 2500), refine_GT_for_candidate=True,
        refine_GT_Z_only=True,
    ),
}
