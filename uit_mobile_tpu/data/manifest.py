"""Manifest (TSV/CSV) reading.

Schema matches the reference's training artifacts (utils.read_tsv_data,
utils.py:320-332): whitespace-separated columns ``filename``, ``labels``
(";"-joined int class indices) and ``hdf5path``. The GSC-vs-AudioSet
``basename`` hack is preserved: with basename=True, filenames are reduced
to their basename unless they contain 'Google_Speech_Commands'.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd


def read_tsv_data(datafile, nrows: int | None = None, basename: bool = True) -> pd.DataFrame:
    df = pd.read_csv(datafile, sep=r"\s+", nrows=nrows).astype(str)
    missing = {"hdf5path", "filename", "labels"} - set(df.columns)
    if missing:
        raise ValueError(
            f"manifest {datafile} must have filename/labels/hdf5path "
            f"columns (missing: {sorted(missing)}; found: {list(df.columns)})"
        )
    # short rows leave NaN cells that survive astype(str) under the arrow
    # dtype backend (found by tests/test_data_fuzz.py) — reject them with
    # the row numbers instead of crashing downstream on a float
    na_rows = df[["filename", "labels", "hdf5path"]].isna().any(axis=1)
    if na_rows.any():
        raise ValueError(
            f"manifest {datafile} has rows with missing "
            f"filename/labels/hdf5path values (row indices: "
            f"{list(df.index[na_rows][:10])})"
        )
    try:
        if df["labels"].str.contains(";").any():
            df["labels"] = df["labels"].str.split(";").apply(
                lambda x: np.array(x, dtype=int)
            )
        else:
            df["labels"] = df["labels"].apply(lambda x: [int(x)])
    except ValueError as e:
        # name the manifest: the numpy/int parse error alone ("invalid
        # literal for int()...") doesn't say WHICH file is malformed
        raise ValueError(
            f"manifest {datafile} has a malformed labels column "
            f"(expected ';'-joined integer class indices): {e}"
        ) from e
    if basename:
        df["filename"] = df["filename"].apply(
            lambda x: x if "Google_Speech_Commands" in x else Path(x).name
        )
    return df


def events_by_file(df: pd.DataFrame):
    """Group a strong-label manifest (one labeled event interval per row:
    filename/labels/hdf5path/from/to) by file.

    -> [(filename, hdf5path, [(class_idx, onset_s, offset_s), ...]), ...]
    Negative label indices are dropped (the chunked-dataset convention,
    reference dataset.py:104-141). Single source for both the SED
    training dataset and the strong evaluation target."""
    groups = []
    for (h5, fname), g in df.groupby(["hdf5path", "filename"], sort=False):
        events = []
        for _, row in g.iterrows():
            for lab in row["labels"]:
                if int(lab) >= 0:
                    events.append((int(lab), float(row["from"]),
                                   float(row["to"])))
        groups.append((fname, h5, events))
    return groups


def multihot(label_idxs, num_classes: int) -> np.ndarray:
    target = np.zeros(num_classes, dtype=np.float32)
    idxs = np.asarray(label_idxs, dtype=np.int64)
    idxs = idxs[idxs >= 0]
    if idxs.size:
        # check before scatter: numpy's own IndexError names neither the
        # label value nor the class count, and a manifest with an
        # out-of-range label is a data bug worth a direct message
        hi = int(idxs.max())
        if hi >= num_classes:
            raise ValueError(
                f"label index {hi} out of range for num_classes="
                f"{num_classes} — the manifest's labels don't match the "
                f"configured head width"
            )
        target[idxs] = 1.0
    return target
