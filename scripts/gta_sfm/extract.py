#!/usr/bin/env python
"""Extract GTA-SfM hdf5 archives into the on-disk layout the datasets read.

Counterpart of the reference scripts/gta_sfm/extract.py: each sequence
hdf5 holds image_%d (jpeg bytes), K_%d (3x3), pose_%d (4x4), depth_%d
per frame; output is

  <out>/<sequence>/color/NNNNNN.jpg
  <out>/<sequence>/depth/NNNNNN.npy
  <out>/<sequence>/intrinsics.txt   (# image_id K3x3 header + rows)
  <out>/<sequence>/poses.txt        (# image_id pose4x4 header + rows)

Usage: extract.py <hdf5_dir> <output_dir>
"""

import glob
import io
import os
import sys

import numpy as np
from PIL import Image


def extract_sequence(hdf5_path: str, out_dir: str):
    import h5py

    data = h5py.File(hdf5_path, "r")
    num_images = len(data.keys()) // 4

    color_dir = os.path.join(out_dir, "color")
    depth_dir = os.path.join(out_dir, "depth")
    os.makedirs(color_dir, exist_ok=True)
    os.makedirs(depth_dir, exist_ok=True)

    with open(os.path.join(out_dir, "intrinsics.txt"), "w") as k_stream, \
            open(os.path.join(out_dir, "poses.txt"), "w") as p_stream:
        k_stream.write("# image_id K3x3\n")
        p_stream.write("# image_id pose4x4\n")
        for idx in range(num_images):
            name = f"{idx:06d}"
            img = Image.open(io.BytesIO(data[f"image_{idx}"][:]))
            img.save(os.path.join(color_dir, name + ".jpg"))
            np.save(os.path.join(depth_dir, name + ".npy"),
                    data[f"depth_{idx}"][:])
            K = np.asarray(data[f"K_{idx}"][:]).reshape(-1)
            pose = np.asarray(data[f"pose_{idx}"][:]).reshape(-1)
            k_stream.write(name + " " + " ".join(map(str, K)) + " \n")
            p_stream.write(name + " " + " ".join(map(str, pose)) + " \n")


def main():
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(1)
    hdf5_dir, out_dir = sys.argv[1], sys.argv[2]
    files = sorted(glob.glob(os.path.join(hdf5_dir, "*.hdf5")))
    assert files, f"no .hdf5 files in {hdf5_dir}"
    for i, path in enumerate(files):
        seq = os.path.splitext(os.path.basename(path))[0]
        extract_sequence(path, os.path.join(out_dir, seq))
        print(f"extracted {i + 1}/{len(files)}: {seq}")


if __name__ == "__main__":
    main()
