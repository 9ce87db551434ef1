"""Balanced registration-set IO.

Text schema (one header line + one row per pair):
  session_ind i j mot0..mot15 trans_x trans_y trans_z roll pitch yaw
  overlap overlap_symmetric
— written by BalancedDatasetGenerator/GenerateBalancedSet.py:397-398,509-526
and read with whitespace-separated parsing at
Experiments/dataloader/balanced/ApolloSouthbay.py:100. The published sets
live in the reference checkout (`balanced_sets/<name>/{train,validation,
test}.txt`); this module reads them in place — nothing is copied.
"""
from __future__ import annotations

import dataclasses
import os

import numpy as np

HEADER = (
    "session_ind i j "
    + " ".join(f"mot{k}" for k in range(16))
    + " trans_x trans_y trans_z roll pitch yaw overlap overlap_symmetric"
)


@dataclasses.dataclass
class BalancedPairs:
    session_ind: np.ndarray   # [N] int
    src_ind: np.ndarray       # [N] int
    tgt_ind: np.ndarray       # [N] int
    motions: np.ndarray       # [N, 4, 4] float64 GT motion (src -> tgt frame)
    translations: np.ndarray  # [N, 3]
    rpy: np.ndarray           # [N, 3] roll/pitch/yaw (degrees)
    overlap: np.ndarray       # [N]
    overlap_symmetric: np.ndarray  # [N]

    def __len__(self) -> int:
        return len(self.session_ind)


def read_balanced_set(path: str) -> BalancedPairs:
    data = np.loadtxt(path, skiprows=1, dtype=np.float64)
    data = np.atleast_2d(data)
    return BalancedPairs(
        session_ind=data[:, 0].astype(np.int64),
        src_ind=data[:, 1].astype(np.int64),
        tgt_ind=data[:, 2].astype(np.int64),
        motions=data[:, 3:19].reshape(-1, 4, 4),
        translations=data[:, 19:22],
        rpy=data[:, 22:25],
        overlap=data[:, 25],
        overlap_symmetric=data[:, 26],
    )


def write_balanced_set(path: str, pairs: BalancedPairs) -> None:
    rows = np.concatenate(
        [
            pairs.session_ind[:, None].astype(np.float64),
            pairs.src_ind[:, None].astype(np.float64),
            pairs.tgt_ind[:, None].astype(np.float64),
            pairs.motions.reshape(-1, 16),
            pairs.translations,
            pairs.rpy,
            pairs.overlap[:, None],
            pairs.overlap_symmetric[:, None],
        ],
        axis=1,
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        for r in rows:
            f.write(
                " ".join(
                    [str(int(r[0])), str(int(r[1])), str(int(r[2]))]
                    + [f"{x:.16f}" for x in r[3:]]
                )
                + "\n"
            )


# Dataset nickname LUT (Experiments/dataloader/data_loaders.py:28-62).
DATASET_NICKNAMES = {
    "K": "KITTI_10m",
    "A": "ApolloSouthbay",
    "B": "NuScenes_boston",
    "S": "NuScenes_singapore",
    "L": "LyftLEVEL5",
}


def resolve_dataset_name(name: str) -> str:
    return DATASET_NICKNAMES.get(name, name)


def balanced_set_path(root: str, dataset: str, phase: str) -> str:
    return os.path.join(root, resolve_dataset_name(dataset), f"{phase}.txt")


def default_balanced_root() -> str:
    """Root of the published balanced sets (env-overridable)."""
    return os.environ.get(
        "LIDARREG_BALANCED_SETS", "/root/reference/balanced_sets"
    )
