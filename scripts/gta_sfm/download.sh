#!/usr/bin/env bash
# Download the GTA-SfM dataset (200 train + 19 test sequences as hdf5).
#
# Source: HKUST-Aerial-Robotics/Flow-Motion-Depth "extracted_dataset"
# (https://github.com/HKUST-Aerial-Robotics/Flow-Motion-Depth). The test
# split ships as one tar; the train sequences are individual hdf5 files
# listed in urls_train.txt (one dropbox URL per line, taken from that
# repository's page).
#
# Usage: ./download.sh [output_dir]
set -euo pipefail
OUT="${1:-.}"
mkdir -p "$OUT/train_hdf5" "$OUT/test_hdf5"

# Test data (single archive).
wget -c -P "$OUT" https://www.dropbox.com/s/2k4tbmuragjg5bk/test.tar
tar -xf "$OUT/test.tar" -C "$OUT"
mv "$OUT"/test/*.hdf5 "$OUT/test_hdf5/" 2>/dev/null || true

# Train data: fetch every URL in urls_train.txt.
if [[ -f "$(dirname "$0")/urls_train.txt" ]]; then
    wget -c -P "$OUT/train_hdf5" -i "$(dirname "$0")/urls_train.txt"
else
    echo "urls_train.txt not found next to this script;"
    echo "copy the train-sequence dropbox URLs from the Flow-Motion-Depth"
    echo "repository into scripts/gta_sfm/urls_train.txt (one per line)."
fi

echo "Now run: python scripts/gta_sfm/extract.py $OUT/train_hdf5 $OUT/train"
echo "         python scripts/gta_sfm/extract.py $OUT/test_hdf5 $OUT/test"
