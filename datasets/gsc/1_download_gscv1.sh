#!/usr/bin/env bash
# Download + extract Google Speech Commands V1 into gsc_raw_data/.
set -euo pipefail
cd "$(dirname "$0")"

URL="http://download.tensorflow.org/data/speech_commands_v0.01.tar.gz"
OUT_DIR="gsc_raw_data"

mkdir -p "${OUT_DIR}"
if [ ! -f speech_commands_v0.01.tar.gz ]; then
  wget --continue "${URL}"
fi
tar -xzf speech_commands_v0.01.tar.gz -C "${OUT_DIR}"
echo "GSC V1 extracted to $(pwd)/${OUT_DIR}; next: python 2_prepare_data.py ${OUT_DIR} data"
