#!/usr/bin/env python3
"""Scan downloaded AudioSet wavs and build a filtered manifest.

    python datasets/utils/prepare_label_list.py ROOT_DIR SEGMENTS_CSV \
        CLASS_LABELS_INDICES OUT.tsv
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from uit_mobile_tpu.data.prep import build_audioset_manifest  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("root_data_dir", help="Root of downloaded wavs")
    parser.add_argument("segments_csv", help="AudioSet segments CSV")
    parser.add_argument("class_labels_indices", help="mid -> index CSV")
    parser.add_argument("output_csv", help="Parsed output manifest")
    args = parser.parse_args()
    df = build_audioset_manifest(
        args.root_data_dir, args.segments_csv, args.class_labels_indices
    )
    df.to_csv(args.output_csv, sep="\t", index=False)
    print(f"wrote {len(df)} rows to {args.output_csv}")


if __name__ == "__main__":
    main()
