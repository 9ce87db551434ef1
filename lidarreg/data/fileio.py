"""Point-cloud file IO: PLY read/write without Open3D.

The reference leans on `o3d.io.read_point_cloud`/`write_point_cloud` for
`.ply` everywhere a cloud crosses a file boundary — the demo inputs
(`Experiments/demo_registration.py:96-101`), the symmetric-ICP binary
handshake (`FCGF_FAST/net/symmetric_icp.py:10-44`), and the 3DMatch/Redwood
fragment files. This module covers the PLY subset those paths produce and
consume: `ascii 1.0` and `binary_little_endian 1.0` vertex elements with
float32/float64 x/y/z and optional nx/ny/nz normals; unknown vertex
properties are skipped, non-vertex elements (e.g. faces) are ignored on
read.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

_PLY_DTYPES = {
    "float": ("f4", 4), "float32": ("f4", 4),
    "double": ("f8", 8), "float64": ("f8", 8),
    "uchar": ("u1", 1), "uint8": ("u1", 1),
    "char": ("i1", 1), "int8": ("i1", 1),
    "short": ("i2", 2), "uint16": ("u2", 2), "ushort": ("u2", 2),
    "int": ("i4", 4), "int32": ("i4", 4),
    "uint": ("u4", 4), "uint32": ("u4", 4),
}


def read_ply(path: str, return_normals: bool = False):
    """-> [N, 3] float xyz (and [N, 3] normals or None if requested)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        n_vertex = 0
        props: list[Tuple[str, str]] = []  # (name, dtype) of the vertex elem
        in_vertex = False
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"{path}: truncated PLY header")
            tok = line.decode("ascii", "replace").strip().split()
            if not tok:
                continue
            if tok[0] == "format":
                fmt = tok[1]
            elif tok[0] == "element":
                in_vertex = tok[1] == "vertex"
                if in_vertex:
                    n_vertex = int(tok[2])
            elif tok[0] == "property" and in_vertex:
                if tok[1] == "list":
                    raise ValueError(f"{path}: list property in vertex elem")
                props.append((tok[2], tok[1]))
            elif tok[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"{path}: unsupported PLY format {fmt!r}")
        names = [p[0] for p in props]
        for need in ("x", "y", "z"):
            if need not in names:
                raise ValueError(f"{path}: vertex element lacks {need!r}")

        if fmt == "ascii":
            rows = np.loadtxt(f, dtype=np.float64, max_rows=n_vertex,
                              ndmin=2, usecols=range(len(props)))
        else:
            rec = np.dtype([(n, "<" + _PLY_DTYPES[t][0]) for n, t in props])
            raw = np.frombuffer(f.read(rec.itemsize * n_vertex), dtype=rec,
                                count=n_vertex)
            rows = np.stack([raw[n].astype(np.float64) for n in names], 1)

    xyz = rows[:, [names.index(c) for c in "xyz"]].astype(np.float32)
    if not return_normals:
        return xyz
    if all(c in names for c in ("nx", "ny", "nz")):
        nrm = rows[:, [names.index(c) for c in ("nx", "ny", "nz")]]
        return xyz, nrm.astype(np.float32)
    return xyz, None


def write_ply(path: str, xyz: np.ndarray, normals: np.ndarray | None = None,
              binary: bool = True) -> None:
    """Write xyz (+ optional normals) as float32 PLY (the layout
    symmetric_icp.py:10-44 emits for the mesh_align handshake)."""
    xyz = np.asarray(xyz, np.float32).reshape(-1, 3)
    cols = [("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2])]
    if normals is not None:
        normals = np.asarray(normals, np.float32).reshape(-1, 3)
        assert len(normals) == len(xyz)
        cols += [("nx", normals[:, 0]), ("ny", normals[:, 1]),
                 ("nz", normals[:, 2])]
    header = ["ply",
              "format binary_little_endian 1.0" if binary
              else "format ascii 1.0",
              f"element vertex {len(xyz)}"]
    header += [f"property float {n}" for n, _ in cols]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        body = np.stack([c for _, c in cols], 1).astype("<f4")
        if binary:
            f.write(body.tobytes())
        else:
            np.savetxt(f, body, fmt="%.9g")
