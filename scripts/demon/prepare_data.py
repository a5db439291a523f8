#!/usr/bin/env python
"""Convert DeMoN h5 archives to the DPSNet-style per-scene layout.

Counterpart of the reference scripts/demon/preparedata_{train,test}.py:
each h5 holds sequences of frames with jpeg image bytes, lz4-compressed
fp16 depth, and a 17-float camera row (fx fy skew cx cy + 3x4 pose);
scenes11 depths/translations are scaled by 0.4. Output per scene:

  <out>/<dataset>_<NNNNN>/0000000.jpg + .npy
  <out>/<dataset>_<NNNNN>/cam.txt      (3x3 intrinsics)
  <out>/<dataset>_<NNNNN>/poses.txt    (rows: 3x4 world-in-camera)

In --train mode, corrupt sequences are skipped and seeded 90/10
train/val scene lists are written (seed 8964, as in the reference).

Usage:
  prepare_data.py <h5_dir> <output_dir> [--train]
"""

import argparse
import glob
import io
import os

import numpy as np
from PIL import Image

TEST_SETS = ("mvs_test", "rgbd_test", "scenes11_test", "sun3d_test")
TRAIN_SETS = ("mvs_train", "rgbd_10_to_20_3d_train", "rgbd_10_to_20_handheld_train",
              "rgbd_20_to_inf_3d_train", "rgbd_20_to_inf_handheld_train",
              "scenes11_train", "sun3d_train_0.01m_to_0.1m",
              "sun3d_train_0.1m_to_0.2m", "sun3d_train_0.2m_to_0.4m",
              "sun3d_train_0.4m_to_0.8m", "sun3d_train_0.8m_to_1.6m",
              "sun3d_train_1.6m_to_infm")


def convert_file(h5_path: str, dump_root: str, dataset_name: str):
    import h5py
    from lz4.block import decompress

    scale = 0.4 if dataset_name.startswith("scenes11") else 1.0
    scenes = []
    with h5py.File(h5_path, "r") as f:
        for seq_idx, seq_name in enumerate(f):
            scene = f"{dataset_name}_{seq_idx:05d}"
            out_dir = os.path.join(dump_root, scene)
            os.makedirs(out_dir, exist_ok=True)
            frames = f[seq_name]["frames"]["t0"]

            poses, intrinsics = [], None
            ok = True
            try:
                for f_idx, f_name in enumerate(frames):
                    frame = frames[f_name]
                    cam = np.asarray(frame["camera"][...])
                    if intrinsics is None:
                        intrinsics = np.array(
                            [[cam[0], 0, cam[3]], [0, cam[1], cam[4]], [0, 0, 1]])
                    pose = np.array([
                        [cam[5], cam[8], cam[11], cam[14] * scale],
                        [cam[6], cam[9], cam[12], cam[15] * scale],
                        [cam[7], cam[10], cam[13], cam[16] * scale]])
                    poses.append(pose.reshape(-1))

                    ext = frame["depth"].attrs["extents"]
                    raw = decompress(frame["depth"][...].tobytes(),
                                     int(ext[0]) * int(ext[1]) * 2)
                    depth = np.frombuffer(raw, dtype=np.float16).astype(np.float32)
                    np.save(os.path.join(out_dir, f"{f_idx:07d}.npy"),
                            depth.reshape(int(ext[0]), int(ext[1])) * scale)

                    img = Image.open(io.BytesIO(frame["image"][...].tobytes()))
                    img.save(os.path.join(out_dir, f"{f_idx:07d}.jpg"))
            except Exception as e:  # corrupt sequence (train archives have a few)
                print(f"  skipping corrupt sequence {scene}: {e}")
                ok = False

            if ok and len(glob.glob(os.path.join(out_dir, "*.jpg"))) >= 2:
                np.savetxt(os.path.join(out_dir, "cam.txt"), intrinsics)
                np.savetxt(os.path.join(out_dir, "poses.txt"),
                           np.asarray(poses), fmt="%.6e")
                scenes.append(scene)
            else:
                import shutil

                shutil.rmtree(out_dir, ignore_errors=True)
    return scenes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("h5_dir")
    parser.add_argument("output_dir")
    parser.add_argument("--train", action="store_true")
    args = parser.parse_args()

    names = TRAIN_SETS if args.train else TEST_SETS
    os.makedirs(args.output_dir, exist_ok=True)
    all_scenes = []
    for name in names:
        path = os.path.join(args.h5_dir, name + ".h5")
        if not os.path.exists(path):
            print(f"missing {path}; skipping")
            continue
        print(f"converting {name}.h5 ...")
        all_scenes += convert_file(path, args.output_dir, name)

    if args.train:
        rng = np.random.default_rng(8964)  # seed matches the reference
        perm = rng.permutation(len(all_scenes))
        cut = int(0.9 * len(all_scenes))
        with open(os.path.join(args.output_dir, "train.txt"), "w") as f:
            f.write("\n".join(all_scenes[i] for i in sorted(perm[:cut])) + "\n")
        with open(os.path.join(args.output_dir, "val.txt"), "w") as f:
            f.write("\n".join(all_scenes[i] for i in sorted(perm[cut:])) + "\n")
    print(f"done: {len(all_scenes)} scenes")


if __name__ == "__main__":
    main()
