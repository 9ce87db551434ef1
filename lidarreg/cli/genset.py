"""Balanced-set generation CLI — the reference's `python -m
GenerateBalancedSet` entry (BalancedDatasetGenerator/GenerateBalancedSet.py:
647-758), one command per dataset instead of editing `__main__`.

Each dataset recipe runs the generator once per archive phase and writes
only that phase's split files, mirroring the reference's per-phase
BalancedSetGenerator invocations (e.g. Apollo train+validation come from
the 'train' archive, test from the 'test' archive, :653-663):

  python -m lidarreg.cli.genset --dataset A --data_root /data/apollo
  python -m lidarreg.cli.genset --dataset B --phases test --sizes 0 0 2500

`--analyze FILE` prints the registration-set statistics the reference
plots with matplotlib (analyze_registration_set, :603-645) as text
histograms: pair distance, time difference, symmetric overlap,
roll/pitch/yaw.

GT refinement parity (refine_motion, :220-246): datasets flagged
refine_GT_for_candidate run a point-to-point ICP refit of each candidate's
GT motion on 0.3 m-downsampled clouds; refine_GT_Z_only datasets
(NuScenes/Lyft vertical pose drift) use the Z-only IRLS inside the
generator INSTEAD of ICP, like the reference's branch at :240-246.
This is an offline CPU tool: numpy + cKDTree, no device work.
"""
from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np
from scipy.spatial import cKDTree

from ..genset.generator import (
    BalancedSetGenerator,
    GensetConfig,
    RECIPES,
    voxel_downsample_np,
)

# nickname -> (RECIPES key, [(archive phase, (train, val, test) slots)]).
# A slot size of 0 means "this phase does not produce that split"
# (create_set skips writing zero-size splits).
PLANS = {
    "A": ("ApolloSouthbay",
          [("train", (1, 1, 0)), ("test", (0, 0, 1))]),
    "K": ("KITTI",
          [("train", (1, 0, 0)), ("validation", (0, 1, 0)),
           ("test", (0, 0, 1))]),
    "B": ("NuScenes_boston",
          [("train", (1, 0, 0)), ("validation", (0, 1, 0)),
           ("test", (0, 0, 1))]),
    "S": ("NuScenes_singapore",
          [("train", (1, 0, 0)), ("validation", (0, 1, 0)),
           ("test", (0, 0, 1))]),
    "L": ("LyftLEVEL5",
          [("train", (1, 1, 0)), ("test", (0, 0, 1))]),
}
NAME_TO_NICK = {RECIPES_key: nick for nick, (RECIPES_key, _) in PLANS.items()}


def make_adapter(nick: str, phase: str, root: str):
    from ..data import raw

    if nick == "A":
        return raw.ApolloSouthbayFull(phase, root)
    if nick == "K":
        return raw.KITTIOdometryFull(phase, root)
    if nick in ("B", "S"):
        loc = "boston" if nick == "B" else "singapore"
        return raw.NuScenesFull(loc, phase, root)
    if nick == "L":
        # Lyft archives carry no validation phase; validation pairs come
        # from the train archive (LyftLEVEL5.py phases)
        return raw.LyftLEVEL5Full("train" if phase == "validation" else phase,
                                  root)
    raise ValueError(f"unknown dataset {nick!r}")


def icp_refine_np(mot: np.ndarray, A: np.ndarray, B: np.ndarray,
                  voxel: float = 0.3, iters: int = 30,
                  max_dist: float = 1.0) -> np.ndarray:
    """Point-to-point ICP refit of a candidate GT motion (refine_motion,
    GenerateBalancedSet.py:220-246: downsample both clouds to `voxel`,
    ICP from the GT-aligned source, compose the correction)."""
    a = voxel_downsample_np(np.asarray(A, np.float64), voxel)
    b = voxel_downsample_np(np.asarray(B, np.float64), voxel)
    a = a @ mot[:3, :3].T + mot[:3, 3]
    tree = cKDTree(b)
    R = np.eye(3)
    t = np.zeros(3)
    for _ in range(iters):
        aw = a @ R.T + t
        d, idx = tree.query(aw, k=1, workers=-1)
        keep = d < max_dist
        if keep.sum() < 10:
            break
        p = aw[keep]
        q = b[idx[keep]]
        pc, qc = p.mean(0), q.mean(0)
        U, _, Vt = np.linalg.svd((p - pc).T @ (q - qc))
        S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        dR = Vt.T @ S @ U.T
        dt = qc - dR @ pc
        R, t = dR @ R, dR @ t + dt
        if np.abs(dR - np.eye(3)).max() < 1e-7 and np.abs(dt).max() < 1e-6:
            break
    icp_mot = np.eye(4)
    icp_mot[:3, :3] = R
    icp_mot[:3, 3] = t
    return icp_mot @ mot


def _text_hist(title: str, x: np.ndarray, bins: int = 12, width: int = 40):
    x = np.asarray(x, np.float64)
    lines = [f"  {title}: n={len(x)} min={x.min():.3f} "
             f"mean={x.mean():.3f} max={x.max():.3f}"]
    counts, edges = np.histogram(x, bins=bins)
    peak = max(int(counts.max()), 1)
    for c, lo, hi in zip(counts, edges[:-1], edges[1:]):
        bar = "#" * int(round(width * c / peak))
        lines.append(f"    [{lo:9.3f}, {hi:9.3f}) {c:6d} {bar}")
    return "\n".join(lines)


def analyze_registration_set(path: str, time_step: float = 0.1) -> str:
    """Text version of analyze_registration_set (:603-645): the same six
    panels — distance, time difference, symmetric overlap, roll, pitch,
    yaw — as histograms on stdout instead of a matplotlib figure."""
    from ..data.balanced import read_balanced_set

    pairs = read_balanced_set(path)
    dist = np.sqrt((pairs.translations ** 2).sum(1))
    d_time = (pairs.tgt_ind - pairs.src_ind) * time_step
    out = [f"{path}: {len(pairs)} pairs"]
    out.append(_text_hist("dist (m)", dist))
    out.append(_text_hist("time diff (s)", d_time))
    out.append(_text_hist("symmetric overlap", pairs.overlap_symmetric))
    for i, name in enumerate(("roll", "pitch", "yaw")):
        out.append(_text_hist(f"{name} (deg)", pairs.rpy[:, i]))
    return "\n".join(out)


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg genset")
    p.add_argument("--dataset", type=str, default=None,
                   help="K/A/B/S/L nickname or recipe name "
                        "(ApolloSouthbay, KITTI, NuScenes_boston, ...)")
    p.add_argument("--data_root", type=str,
                   default=os.environ.get("LIDARREG_DATA", "/data/lidarreg"))
    p.add_argument("--output_dir", type=str, default="outputs/balanced_sets")
    p.add_argument("--cache_dir", type=str, default="/tmp/lidarreg_genset")
    p.add_argument("--phases", type=str, nargs="+", default=None,
                   help="restrict to these archive phases of the recipe")
    p.add_argument("--sizes", type=int, nargs=3, default=None,
                   help="override requested train/val/test sizes")
    p.add_argument("--round_to_multiple", type=int, default=None)
    p.add_argument("--source_stride", type=int, default=None)
    p.add_argument("--max_spacing", type=int, default=None)
    p.add_argument("--minimum_overlap", type=float, default=None)
    p.add_argument("--num_workers", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--no_refine", action="store_true",
                   help="skip GT refinement even if the recipe enables it")
    p.add_argument("--analyze", type=str, default=None,
                   help="print statistics of an existing balanced-set file "
                        "and exit")
    p.add_argument("--time_step", type=float, default=0.1,
                   help="seconds between frames, for --analyze time-diff")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if args.analyze:
        print(analyze_registration_set(args.analyze, args.time_step))
        return

    if args.dataset is None:
        raise SystemExit("--dataset is required (or use --analyze FILE)")
    nick = NAME_TO_NICK.get(args.dataset, args.dataset)
    if nick not in PLANS:
        raise SystemExit(f"unknown dataset {args.dataset!r}; "
                         f"choices: {sorted(PLANS)} or {sorted(NAME_TO_NICK)}")
    recipe_key, plan = PLANS[nick]
    base = RECIPES[recipe_key]

    overrides = {}
    for field in ("round_to_multiple", "source_stride", "max_spacing",
                  "minimum_overlap", "num_workers", "seed", "cache_dir",
                  "output_dir"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = v
    requested = tuple(args.sizes) if args.sizes else base.sizes
    if args.no_refine:
        overrides["refine_GT_for_candidate"] = False
        overrides["refine_GT_Z_only"] = False

    for phase, slots in plan:
        if args.phases and phase not in args.phases:
            continue
        sizes = tuple(r * s for r, s in zip(requested, slots))
        if sum(sizes) == 0:
            continue
        cfg = dataclasses.replace(base, sizes=sizes, **overrides)
        ds = make_adapter(nick, phase, args.data_root)
        refine = (icp_refine_np
                  if cfg.refine_GT_for_candidate and not cfg.refine_GT_Z_only
                  else None)
        print(f"=== {ds.name} phase={phase} sizes={sizes} ===", flush=True)
        gen = BalancedSetGenerator(ds, cfg, refine_icp=refine)
        out = gen.create_set()
        for split, pairs in out.items():
            print(f"  {split}: {len(pairs)} pairs -> "
                  f"{os.path.join(cfg.output_dir, ds.name, split + '.txt')}")

    # reference recipes end with analyze_registration_set on the test split
    test_file = os.path.join(args.output_dir, recipe_key, "test.txt")
    if os.path.exists(test_file):
        print(analyze_registration_set(test_file, args.time_step))


if __name__ == "__main__":
    main()
