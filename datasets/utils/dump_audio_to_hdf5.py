#!/usr/bin/env python3
"""Dump wavs listed in a manifest into one HDF5 of int16 PCM arrays.

    python datasets/utils/dump_audio_to_hdf5.py INPUT_CSV -o OUT.h5 [-u]
"""
import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
from uit_mobile_tpu.data.prep import dump_waves  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("input_csv")
    parser.add_argument("-o", "--output", required=True, help="Output data hdf5")
    parser.add_argument("--use_fullname", "-u", action="store_true",
                        help="key by full path instead of basename (GSC)")
    args = parser.parse_args()
    df = pd.read_csv(args.input_csv, sep=r"\s+")
    assert "filename" in df.columns, "Header needs to contain 'filename'"
    dump_waves(df, Path(args.output), use_fullname=args.use_fullname)


if __name__ == "__main__":
    main()
