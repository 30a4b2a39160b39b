#!/usr/bin/env bash
# Build AudioSet manifests + HDF5 dumps from the downloaded wavs:
# scan+filter -> TSV manifest -> int16 HDF5 -> append hdf5path column.
set -euo pipefail
cd "$(dirname "$0")"

LABEL_DIR="data/labels"
HDF5_DIR="data/hdf5"
mkdir -p "${HDF5_DIR}"

prepare_split() {
  # $1 = split name (balanced|eval), $2 = segments csv
  local manifest="${LABEL_DIR}/$1_raw.tsv"
  local h5="${HDF5_DIR}/$1.h5"
  local out="${LABEL_DIR}/$1.csv"
  python ../utils/prepare_label_list.py \
    "data/audio/$1" "${LABEL_DIR}/$2" "${LABEL_DIR}/class_labels_indices.csv" \
    "${manifest}"
  python ../utils/dump_audio_to_hdf5.py "${manifest}" -o "${h5}"
  # append the hdf5path column the training manifests require
  awk -v h5="$(readlink -f "${h5}")" \
    'NR==1 {print $0"\thdf5path"; next} {print $0"\t"h5}' \
    "${manifest}" > "${out}"
  echo "wrote ${out}"
}

prepare_split balanced balanced_train_segments.csv
prepare_split eval eval_segments.csv
