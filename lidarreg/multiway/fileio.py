"""Multiway dataset file helpers + config defaults.

Rebuilds Experiments/multiway/fileio.py:13-66 (alphanumeric file listing,
RGBD folder discovery, clean output folders) and initialize_config.py:8-46
(the reconstruction-system defaults dict). The depth/color readers return
numpy arrays (PNG depth in millimetres -> metres float32) without Open3D.
"""
from __future__ import annotations

import os
import re
import shutil
import struct
import zlib
from typing import Dict, List


def sorted_alphanum(file_list: List[str]) -> List[str]:
    """Numeric-aware sort ('frame_2' before 'frame_10'; fileio.py:13-16)."""
    def convert(text):
        return int(text) if text.isdigit() else text

    return sorted(
        file_list, key=lambda key: [convert(c) for c in re.split(r"([0-9]+)", key)]
    )


def get_file_list(path: str, extension: str | None = None) -> List[str]:
    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if os.path.isfile(os.path.join(path, f))
        and (extension is None or os.path.splitext(f)[1] == extension)
    ]
    return sorted_alphanum(files)


def add_if_exists(path_dataset: str, folder_names: List[str]) -> str:
    for name in folder_names:
        path = os.path.join(path_dataset, name)
        if os.path.exists(path):
            return path
    raise FileNotFoundError(f"none of {folder_names} under {path_dataset}")


def get_rgbd_folders(path_dataset: str):
    path_color = add_if_exists(path_dataset, ["image/", "rgb/", "color/"])
    path_depth = os.path.join(path_dataset, "depth/")
    return path_color, path_depth


def get_rgbd_file_lists(path_dataset: str):
    """(color_files, depth_files) sorted alphanumerically (fileio.py:45-51)."""
    path_color, path_depth = get_rgbd_folders(path_dataset)
    color_files = (
        get_file_list(path_color, ".jpg") + get_file_list(path_color, ".png")
    )
    depth_files = get_file_list(path_depth, ".png")
    return color_files, depth_files


def make_clean_folder(path_folder: str):
    if os.path.exists(path_folder):
        shutil.rmtree(path_folder)
    os.makedirs(path_folder)


def check_folder_structure(path_dataset: str):
    path_color, path_depth = get_rgbd_folders(path_dataset)
    assert os.path.exists(path_depth), f"missing depth folder {path_depth}"
    assert os.path.exists(path_color), f"missing color folder {path_color}"


def read_depth_png(path: str, depth_scale: float = 1000.0):
    """16-bit grayscale PNG depth -> [H, W] float32 metres (no Open3D/PIL).

    Minimal PNG decoder for the uncompressed-filter cases the Redwood-style
    datasets ship (bit depth 16, grayscale, filter types 0-4).
    """
    import numpy as np

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n", "not a PNG"
    pos = 8
    idat = b""
    width = height = bitdepth = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bitdepth, color, *_ = struct.unpack(
                ">IIBBBBB", chunk
            )
            assert color == 0, "depth PNGs are grayscale"
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    bpp = bitdepth // 8
    stride = width * bpp
    out = np.zeros((height, width), np.uint16 if bpp == 2 else np.uint8)
    prev = bytearray(stride)
    off = 0
    for row in range(height):
        ft = raw[off]
        line = bytearray(raw[off + 1:off + 1 + stride])
        off += 1 + stride
        if ft == 1:      # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:    # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:    # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:    # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        if bpp == 2:
            out[row] = np.frombuffer(bytes(line), ">u2")
        else:
            out[row] = np.frombuffer(bytes(line), np.uint8)
        prev = line
    return out.astype(np.float32) / depth_scale


def initialize_config(config: Dict | None = None) -> Dict:
    """Reconstruction-system defaults (initialize_config.py:13-46)."""
    config = dict(config or {})
    defaults = {
        "depth_map_type": "redwood",
        "n_frames_per_fragment": 100,
        "n_keyframes_per_n_frame": 5,
        "min_depth": 0.3,
        "max_depth": 3.0,
        "voxel_size": 0.05,
        "max_depth_diff": 0.07,
        "preference_loop_closure_odometry": 0.1,
        "preference_loop_closure_registration": 5.0,
        "tsdf_cubic_size": 3.0,
        "icp_method": "color",
        "global_registration": "ransac",
        "folder_fragment": "fragments/",
        "template_fragment_posegraph": "fragments/fragment_%03d.json",
        "template_fragment_posegraph_optimized":
            "fragments/fragment_optimized_%03d.json",
        "template_fragment_pointcloud": "fragments/fragment_%03d.ply",
        "folder_scene": "scene/",
        "template_global_posegraph": "scene/global_registration.json",
        "template_global_posegraph_optimized":
            "scene/global_registration_optimized.json",
        "template_refined_posegraph": "scene/refined_registration.json",
        "template_refined_posegraph_optimized":
            "scene/refined_registration_optimized.json",
        "template_global_mesh": "scene/integrated.ply",
        "template_global_traj": "scene/trajectory.log",
    }
    for k, v in defaults.items():
        config.setdefault(k, v)
    return config
