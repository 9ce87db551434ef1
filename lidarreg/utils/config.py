"""Unified configuration tree (reference flag-name parity, JSON round-trip).

Replaces the reference's three divergent flag systems — Experiments/
config.py:12-131 argparse groups, DGR/config.py:26-154, FCGF_FAST's
constants-in-initialize_args — with one dataclass tree keeping the same
field names, plus the per-dataset default resolution the reference applies
in get_config (Experiments/config.py:90-131: KITTI-family inlier_threshold
1.2 / sigma_d 1.2 / downsample 0.3 / re 5 / te 60; 3DMatch-family 0.10 /
0.10 / 0.03 / 15 / 30). Snapshot discipline: `save`/`load` JSON next to
checkpoints (Experiments/train.py:39-43; test-time reload test.py:333-342).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class NetConfig:
    in_dim: int = 6
    num_layers: int = 12            # config.py:33 (KITTI PointDSC)
    num_channels: int = 128
    num_iterations: int = 10
    ratio: float = 0.1
    k: int = 40


@dataclass
class LossConfig:
    balanced: bool = True
    weight_classification: float = 1.0
    weight_spectralmatching: float = 1.0
    weight_transformation: float = 0.0
    evaluate_interval: int = 1


@dataclass
class OptimConfig:
    optimizer: str = "ADAM"
    lr: float = 1e-4
    weight_decay: float = 1e-6
    momentum: float = 0.9
    batch_size: int = 16
    scheduler_gamma: float = 0.99
    max_epoch: int = 50


@dataclass
class DataConfig:
    dataset: str = "KITTI_10m"
    voxel_size: float = 0.3
    downsample: float = 0.3
    num_node: int = 12000
    use_mutual: bool = False
    augment_axis: int = 0
    augment_rotation: float = 1.0
    augment_translation: float = 0.01
    num_workers: int = 4
    synthetic: bool = True


@dataclass
class EvalConfigTree:
    inlier_threshold: float = 1.2
    sigma_d: float = 1.2
    nms_radius: float = 1.2
    re_thre: float = 5.0
    te_thre: float = 60.0           # cm


@dataclass
class RansacFlags:
    algo: str = "RANSAC"
    codebase: str = "batched"       # unifies 'GC' and 'open3D' backends
    mode: str = "GPF"
    iters: int = 50_000
    prosac: bool = True
    fast_rejection: str = "ELC"
    GC_conf: float = 0.999
    GC_LO: bool = True
    spatial_coherence_weight: float = 0.0
    GPF_factor: float = 2.0
    GPF_grid_wid: int = 10
    GPF_max_matches: int = 10**9


@dataclass
class Config:
    net: NetConfig = field(default_factory=NetConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    data: DataConfig = field(default_factory=DataConfig)
    eval: EvalConfigTree = field(default_factory=EvalConfigTree)
    ransac: RansacFlags = field(default_factory=RansacFlags)
    seed: int = 51

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def save(self, path: str):
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        return cls(
            net=NetConfig(**d.get("net", {})),
            loss=LossConfig(**d.get("loss", {})),
            optim=OptimConfig(**d.get("optim", {})),
            data=DataConfig(**d.get("data", {})),
            eval=EvalConfigTree(**d.get("eval", {})),
            ransac=RansacFlags(**d.get("ransac", {})),
            seed=d.get("seed", 51),
        )

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


# Per-dataset default resolution (Experiments/config.py:90-131).
_OUTDOOR = dict(inlier_threshold=1.2, sigma_d=1.2, nms_radius=1.2,
                downsample=0.3, re_thre=5.0, te_thre=60.0)
_INDOOR = dict(inlier_threshold=0.10, sigma_d=0.10, nms_radius=0.10,
               downsample=0.03, re_thre=15.0, te_thre=30.0)

DATASET_FAMILIES = {
    "KITTI_10m": _OUTDOOR,
    "ApolloSouthbay": _OUTDOOR,
    "NuScenes_boston": _OUTDOOR,
    "NuScenes_singapore": _OUTDOOR,
    "LyftLEVEL5": _OUTDOOR,
    "3DMatch": _INDOOR,
    "3DLoMatch": _INDOOR,
    "Redwood": _INDOOR,
}


def get_config(dataset: str = "KITTI_10m") -> Config:
    """Config with the reference's per-dataset defaults resolved."""
    from ..data.balanced import resolve_dataset_name

    name = resolve_dataset_name(dataset)
    fam = DATASET_FAMILIES.get(name, _OUTDOOR)
    cfg = Config()
    cfg.data.dataset = name
    cfg.data.downsample = fam["downsample"]
    cfg.data.voxel_size = fam["downsample"]
    cfg.eval.inlier_threshold = fam["inlier_threshold"]
    cfg.eval.sigma_d = fam["sigma_d"]
    cfg.eval.nms_radius = fam["nms_radius"]
    cfg.eval.re_thre = fam["re_thre"]
    cfg.eval.te_thre = fam["te_thre"]
    return cfg
