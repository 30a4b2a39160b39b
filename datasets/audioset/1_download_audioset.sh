#!/usr/bin/env bash
# Fetch the AudioSet balanced-train + eval segments as 16 kHz mono wavs.
#
# Requires: yt-dlp, ffmpeg, GNU parallel. Resumable: parallel keeps a joblog
# and skips finished jobs; existing non-empty files are skipped.
#
#   bash datasets/audioset/1_download_audioset.sh [N_JOBS]
set -euo pipefail
cd "$(dirname "$0")"

N_JOBS="${1:-64}"
DATA_DIR="data/audio"
LABEL_DIR="data/labels"
mkdir -p "${DATA_DIR}/balanced" "${DATA_DIR}/eval" "${LABEL_DIR}"

CSV_BASE="http://storage.googleapis.com/us_audioset/youtube_corpus/v1/csv"
for f in balanced_train_segments.csv eval_segments.csv class_labels_indices.csv; do
  [ -f "${LABEL_DIR}/${f}" ] || wget --continue -O "${LABEL_DIR}/${f}" "${CSV_BASE}/${f}"
done

fetch_clip() {
  # $1 = ytid, $2 = start, $3 = end, $4 = outdir
  local out="$4/$1_$2_$3.wav"
  if [ -s "${out}" ]; then
    return 0
  fi
  local stream
  stream="$(yt-dlp -f 'bestaudio' -g "https://www.youtube.com/watch?v=$1")" || return 1
  ffmpeg -nostdin -loglevel error -y \
    -ss "$2" -to "$3" -i "${stream}" \
    -ar 16000 -ac 1 -acodec pcm_s16le "${out}" || return 1
}
export -f fetch_clip

download_split() {
  # $1 = segments csv, $2 = outdir
  tail -n +4 "$1" | sed 's/, /,/g' | \
    awk -F',' '{gsub(/"/, "", $0); print $1" "$2" "$3}' | \
    parallel --resume --joblog "$2/joblog.txt" -j "${N_JOBS}" --colsep ' ' \
      fetch_clip {1} {2} {3} "$2"
}

download_split "${LABEL_DIR}/balanced_train_segments.csv" "${DATA_DIR}/balanced" || true
download_split "${LABEL_DIR}/eval_segments.csv" "${DATA_DIR}/eval" || true
echo "done; next: bash 2_prepare_data.sh"
