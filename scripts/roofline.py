"""Bytes-moved / FLOPs budget for the FCGF forward (BASELINE.md roofline).

Builds the real ResUNetBN2C level structure for bench.py's cloud on CPU,
counts kernel-map NNZ, and prices every forward stage against the two
hardware ceilings that can bound it on a v5e:

  - HBM streaming bandwidth (819 GB/s),
  - random-row gather/scatter rate (~115 M rows/s measured on this chip —
    hash lookups and im2col gathers move one ~32-128 B row per transaction,
    so the HBM transaction rate, not bytes, is the binding constraint;
    CLAUDE.md "TPU gathers cost ~35 ms per ~4M random rows"),
  - MXU bf16 peak (197 TFLOP/s) for the conv contractions.

Measured stage times come from scripts/profile_fcgf_stages.py (TPU,
jitted min-of-5); pass them via --measured "tables=46,maps=66.5,full=146.4"
to print the efficiency column.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_GBPS = 819.0          # v5e HBM bandwidth
GATHER_MROWS = 115.0      # measured random-row gather rate (M rows/s)
MXU_TFLOPS_BF16 = 197.0   # v5e bf16 peak
LOOKUP_ROW_BYTES = 64     # one packed bucket gather: 4 lanes x (D+1) int32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=32768)
    ap.add_argument("--measured", type=str, default="")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from bench import build_pair
    from lidarreg.ops import voxelize_points
    from lidarreg.sparse.hashtable import build_table
    from lidarreg.sparse.tensor import downsample_coords

    cap = args.cap
    rng = np.random.default_rng(51)
    cloud_a, _, _ = build_pair(rng)
    v = voxelize_points(jnp.asarray(cloud_a), 0.3, cap)
    caps = [max(256, cap // d) for d in (1, 1, 2, 4)]

    # level structure (mirrors ResUNetBN2C.__call__)
    c1, v1 = v.coords, v.valid
    c2, v2 = downsample_coords(c1, v1, 1, caps[1])
    c4, v4 = downsample_coords(c2, v2, 2, caps[2])
    c8, v8 = downsample_coords(c4, v4, 4, caps[3])
    levels = [(c1, v1, 1), (c2, v2, 2), (c4, v4, 4), (c8, v8, 8)]
    V = [int(vv.sum()) for _, vv, _ in levels]
    Vcap = [int(cc.shape[0]) for cc, _, _ in levels]

    def nnz(ci, vi, co, vo, s, k=3):
        """NNZ pairs of a k-stencil conv from level (ci) to coords (co)."""
        ci_np = np.asarray(ci)[np.asarray(vi)]
        keys = {tuple(r) for r in ci_np}
        co_np = np.asarray(co)[np.asarray(vo)]
        r = k // 2
        from itertools import product

        n = 0
        for dz in product(range(-r, r + 1), repeat=3):
            off = np.asarray(dz) * s
            n += sum(1 for row in (co_np + off) if tuple(row) in keys)
        return n

    # conv layer table: (name, nnz pairs, Cin, Cout, J, Vo_cap)
    CH = (0, 32, 64, 128, 256)
    TR = (0, 64, 64, 64, 128)
    n11_5 = nnz(c1, v1, c1, v1, 1, k=5)
    n11 = nnz(c1, v1, c1, v1, 1)
    n12 = nnz(c1, v1, c2, v2, 1)
    n22 = nnz(c2, v2, c2, v2, 2)
    n24 = nnz(c2, v2, c4, v4, 2)
    n44 = nnz(c4, v4, c4, v4, 4)
    n48 = nnz(c4, v4, c8, v8, 4)
    n88 = nnz(c8, v8, c8, v8, 8)
    convs = [
        ("conv1 k5 (hitmask-matmul)", n11_5, 1, CH[1], 125, Vcap[0]),
        ("block1 (2x k3)", 2 * n11, CH[1], CH[1], 27, Vcap[0]),
        ("conv2 s2", n12, CH[1], CH[2], 27, Vcap[1]),
        ("block2 (2x k3)", 2 * n22, CH[2], CH[2], 27, Vcap[1]),
        ("conv3 s2", n24, CH[2], CH[3], 27, Vcap[2]),
        ("block3 (2x k3)", 2 * n44, CH[3], CH[3], 27, Vcap[2]),
        ("conv4 s2", n48, CH[3], CH[4], 27, Vcap[3]),
        ("block4 (2x k3)", 2 * n88, CH[4], CH[4], 27, Vcap[3]),
        ("conv4_tr", n48, CH[4], TR[4], 27, Vcap[2]),
        ("block4_tr (2x k3)", 2 * n44, TR[4], TR[4], 27, Vcap[2]),
        ("conv3_tr", n24, TR[4] + CH[3], TR[3], 27, Vcap[1]),
        ("block3_tr (2x k3)", 2 * n22, TR[3], TR[3], 27, Vcap[1]),
        ("conv2_tr", n12, TR[3] + CH[2], TR[2], 27, Vcap[0]),
        ("block2_tr (2x k3)", 2 * n11, TR[2], TR[2], 27, Vcap[0]),
        ("conv1_tr k1", V[0], TR[2] + CH[1], TR[1], 1, Vcap[0]),
        ("final k1", V[0], TR[1], 32, 1, Vcap[0]),
    ]

    print(f"cap={cap}  level valid counts={V}  level caps={Vcap}")
    print()

    # ---- stage 1+2: structure build (downsample + tables) ----------------- #
    scat_rows = sum(Vcap) * 8  # 2*lanes claim rounds per table
    ds_rows = sum(Vcap[:3]) * 3  # downsample: dedup scatter+gather rounds
    print("## structure build (scatter/gather-rate bound)")
    print(f"table claim-round scatters: {scat_rows/1e6:.2f} M rows "
          f"-> {scat_rows/GATHER_MROWS/1e3:.1f} ms at gather rate")
    print(f"downsample dedup traffic:   ~{ds_rows/1e6:.2f} M rows "
          f"-> {ds_rows/GATHER_MROWS/1e3:.1f} ms")
    print()

    # ---- stage 3: kernel-map lookups -------------------------------------- #
    lk = [
        ("km1_c1 (k5 sym-half)", 62 * Vcap[0]),
        ("km2/km4/km8 (k3 sym-half)", 13 * (Vcap[1] + Vcap[2] + Vcap[3])),
        ("down maps (2^3 fine-side)", 8 * (Vcap[0] + Vcap[1] + Vcap[2])),
        ("up maps (scatter inversion)", 0),
    ]
    tot_q = sum(q for _, q in lk)
    print("## kernel maps (gather-rate bound)")
    for name, q in lk:
        print(f"{name:30s} {q/1e6:6.2f} M lookups  "
              f"{q*LOOKUP_ROW_BYTES/2**20:7.1f} MiB  "
              f"{q/GATHER_MROWS/1e3:6.1f} ms at gather rate")
    print(f"{'TOTAL':30s} {tot_q/1e6:6.2f} M lookups  "
          f"{tot_q*LOOKUP_ROW_BYTES/2**20:7.1f} MiB  "
          f"{tot_q/GATHER_MROWS/1e3:6.1f} ms "
          f"({tot_q*LOOKUP_ROW_BYTES/HBM_GBPS/1e6:.2f} ms if BW-bound)")
    print()

    # ---- stage 4: conv stack ---------------------------------------------- #
    print("## conv stack (bf16 gathers, f32 accumulation)")
    print(f"{'layer':28s} {'nnz(M)':>7s} {'gthr ms':>8s} {'GFLOP':>7s} "
          f"{'MXU ms':>7s} {'HBM MiB':>8s} {'BW ms':>6s}")
    tg = tf = tb = 0.0
    for name, nz, cin, cout, J, vo in convs:
        # dense padded einsum the MXU actually runs: J * Vo_cap * Cin * Cout
        flop = 2.0 * J * vo * cin * cout
        # gather: J*Vo neighbor rows of Cin bf16 each (row-rate bound when
        # Cin*2 < transaction size; BW-bound when wide); im2col read once
        rows = 0 if "hitmask" in name or J == 1 else J * vo
        g_ms = rows / GATHER_MROWS / 1e3 if cin * 2 <= 128 else 0.0
        hbm = (rows * cin * 2 + vo * cout * 4 + J * cin * cout * 2) / 2**20
        bw_ms = hbm * 2**20 / HBM_GBPS / 1e9 * 1e3
        mxu_ms = flop / (MXU_TFLOPS_BF16 * 1e12) * 1e3
        tg += max(g_ms, bw_ms)
        tf += flop
        tb += hbm
        print(f"{name:28s} {nz/1e6:7.2f} {g_ms:8.2f} {flop/1e9:7.2f} "
              f"{mxu_ms:7.3f} {hbm:8.1f} {bw_ms:6.2f}")
    print(f"conv stack totals: {tf/1e9:.1f} GFLOP "
          f"({tf/(MXU_TFLOPS_BF16*1e12)*1e3:.2f} ms at MXU peak), "
          f"{tb:.0f} MiB ({tb*2**20/HBM_GBPS/1e6:.1f} ms at HBM BW), "
          f"max(gather,BW) floor {tg:.1f} ms")
    if args.measured:
        kv = dict(p.split("=") for p in args.measured.split(","))
        full = float(kv.get("full", 0))
        if full:
            print()
            print(f"measured full fwd: {full:.1f} ms -> "
                  f"MFU {tf/(full*1e-3)/(MXU_TFLOPS_BF16*1e12)*100:.2f}%, "
                  f"effective HBM {tb*2**20/(full*1e-3)/2**30:.0f} GiB/s")


if __name__ == "__main__":
    main()
