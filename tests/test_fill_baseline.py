"""Real-data readiness drill (VERDICT r3 #9): scripts/fill_baseline.sh must
fill the BASELINE "regenerated reference numbers" table the day raw data
mounts, with no edits. This CI dry-run proves the whole chain against a
fake on-disk KITTI tree: raw archive -> genset balanced txt -> cli.test
over raw clouds -> extracted markdown rows.

Protocol parity: reference Experiments/test_parallel.sh:1-24.
"""
import os
import shutil
import subprocess

import numpy as np

from tests.test_raw import make_pose

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fake_kitti(root, n_frames=30, seed=3):
    rng = np.random.default_rng(seed)
    world = np.c_[rng.uniform(0, 120, (30000, 1)),
                  rng.uniform(-20, 20, (30000, 1)),
                  rng.uniform(0, 5, (30000, 1))].astype(np.float32)
    # geometric texture so surrogate/feature matching has structure
    world[:, 2] += 0.4 * np.sin(world[:, 0] * 0.7) * np.cos(world[:, 1] * 0.9)
    Tr = np.eye(4)
    for s in (8, 9):
        seq = os.path.join(root, "sequences", f"{s:02d}")
        os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        with open(os.path.join(seq, "calib.txt"), "w") as f:
            f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
        rows = []
        for i in range(n_frames):
            x0 = 3.0 * i
            rows.append(make_pose(0, [x0, 0, 0])[:3, :4].ravel())
            m = np.abs(world[:, 0] - x0) < 25
            local = world[m] - [x0, 0, 0]
            scan = np.hstack(
                [local, np.zeros((len(local), 1), np.float32)]
            ).astype(np.float32)
            scan.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
        np.savetxt(os.path.join(root, "poses", f"{s:02d}.txt"),
                   np.asarray(rows))
    # session 10 exists (test-split member) but yields no candidates
    os.makedirs(os.path.join(root, "sequences", "10", "velodyne"),
                exist_ok=True)
    with open(os.path.join(root, "sequences", "10", "calib.txt"), "w") as f:
        f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
    np.savetxt(os.path.join(root, "poses", "10.txt"),
               np.eye(4)[:3, :4].ravel()[None])


def test_fill_baseline_dry_run_over_fake_raw_tree(tmp_path):
    from lidarreg.data.raw import KITTIOdometryFull
    from lidarreg.genset.generator import BalancedSetGenerator, GensetConfig

    data_root = tmp_path / "data"
    kitti_root = data_root / "KITTI_10m"
    _write_fake_kitti(str(kitti_root))

    # genset over the fake tree -> a balanced txt in the published schema
    ds = KITTIOdometryFull("test", str(kitti_root))
    cfg = GensetConfig(
        sizes=(2, 2, 4), round_to_multiple=1, source_stride=2,
        max_spacing=25, num_workers=1, seed=0,
        cache_dir=str(tmp_path / "cache"),
        output_dir=str(tmp_path / "gen"),
    )
    BalancedSetGenerator(ds, cfg).create_set()
    bal_root = tmp_path / "balanced"
    os.makedirs(bal_root / "KITTI_10m")
    shutil.copy(tmp_path / "gen" / "KITTI" / "test.txt",
                bal_root / "KITTI_10m" / "test.txt")

    outdir = tmp_path / "fill"
    env = dict(
        os.environ,
        LIDARREG_DATA=str(data_root),
        LIDARREG_BALANCED_SETS=str(bal_root),
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
    )
    proc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "fill_baseline.sh"),
         "--sets", "K", "--algos", "RANSAC", "--samples", "2",
         "--iters", "2000", "--features", "surrogate",
         "--capacity", "2048", "--synthetic", "false",
         "--outdir", str(outdir)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    rows = (outdir / "BASELINE_rows.md").read_text()
    assert "| K | RANSAC |" in rows and "FAILED" not in rows, rows
    # the row carries real numbers, not dashes
    row = [l for l in rows.splitlines() if l.startswith("| K | RANSAC")][0]
    cells = [c.strip() for c in row.split("|")[3:7]]
    assert all(c and c != "-" and c != "—" for c in cells), row
