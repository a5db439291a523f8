#!/usr/bin/env bash
# Download the DeMoN train/test h5 archives (research use only; cite the
# original sources -- SUN3D, RGB-D SLAM, MVS datasets -- per the DeMoN
# repository: https://github.com/lmb-freiburg/demon).
#
# Usage: ./download_data.sh {train|test} [output_dir]
set -euo pipefail
MODE="${1:?usage: download_data.sh {train|test} [output_dir]}"
OUT="${2:-./${MODE}data}"
mkdir -p "$OUT"

BASE="https://lmb.informatik.uni-freiburg.de/data/demon/traindata"
if [[ "$MODE" == "test" ]]; then
    BASE="https://lmb.informatik.uni-freiburg.de/data/demon/testdata"
    # nyu2_test.h5 (NYU Depth v2) is part of the reference's test set
    # (download_testdata.sh:58) but has no GT poses; the eval CLI skips
    # scenes without poses.
    FILES=(mvs_test.h5 rgbd_test.h5 scenes11_test.h5 sun3d_test.h5
           nyu2_test.h5)
else
    FILES=(mvs_train.h5 rgbd_10_to_20_3d_train.h5
           rgbd_10_to_20_handheld_train.h5 rgbd_20_to_inf_3d_train.h5
           rgbd_20_to_inf_handheld_train.h5 scenes11_train.h5
           sun3d_train_0.01m_to_0.1m.h5 sun3d_train_0.1m_to_0.2m.h5
           sun3d_train_0.2m_to_0.4m.h5 sun3d_train_0.4m_to_0.8m.h5
           sun3d_train_0.8m_to_1.6m.h5 sun3d_train_1.6m_to_infm.h5)
fi

for f in "${FILES[@]}"; do
    wget -c -P "$OUT" "$BASE/$f"
done

echo "Now run: python scripts/demon/prepare_data.py $OUT <output_dir>" \
     "$([[ "$MODE" == train ]] && echo --train)"
