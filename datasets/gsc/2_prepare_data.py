#!/usr/bin/env python3
"""Prepare Google Speech Commands V1: official splits, merged 537-class
labels (keywords -> 527-536, fillers -> 0=Speech, train keywords dual
"0;idx"), HDF5 dumps + TSV manifests.

    python datasets/gsc/2_prepare_data.py [gsc_raw_data] [data]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from uit_mobile_tpu.data.prep import prepare_gsc  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("gsc_root_path", type=Path, default="gsc_raw_data", nargs="?")
    parser.add_argument("output_root_dir", type=Path, default="data", nargs="?")
    args = parser.parse_args()
    out = prepare_gsc(args.gsc_root_path, args.output_root_dir)
    for name, tsv in out.items():
        print(f"{name}: {tsv}")


if __name__ == "__main__":
    main()
