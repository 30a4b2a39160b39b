"""Offline PSL: precomputed teacher targets on a crop-offset grid.

The reference runs its frozen MobileNetV2 teacher INSIDE every training
step (run.py:199-202) because a torch loop has no cheaper option. The
teacher's weights never change, so its probabilities for a given
(clip, crop offset) are a pure function of the data — a TPU-first
framework computes them ONCE, at data-prep time, and the train step
becomes teacher-free (the teacher was 26% of the B=1024 frontier step,
PERF_NOTES round 4).

Mechanics
---------
Crop starts are snapped to a ``grid`` (samples; default 1600 = 0.1 s =
10 mel hops, so every cached crop is hop-aligned). For each manifest
clip, :func:`cache_starts` enumerates the grid of crop starts (long
clips) or zero-pad offsets (short clips) that the reference's random
crop rule (dataset.py:75-93) could draw after snapping, and
:func:`build_psl_cache` scores every one with the teacher, storing
``(n_starts, classes)`` float16 probabilities per clip in one HDF5 file.

At train time :class:`PSLCachedRandomCropHDF5Dataset` draws a UNIFORM
grid index per sample, reads exactly that crop, and overwrites the first
``classes`` target columns with the cached probabilities — the same math
as the in-step overwrite (run.py:199-202), moved into the data pipeline.
The step is then the plain (teacher-free) ``make_train_step``.

Storage: float16 is plenty for sigmoid probabilities feeding BCE (max
rounding error ~5e-4 absolute; the loss delta is pinned in
tests/test_psl_offline.py). A 10 s clip at grid 1600 stores
90 x 527 x 2 B ~ 93 KB.

Failure policy is LOUD: a clip missing from the cache, a grid/
chunk-length mismatch, or a clip whose length changed since the cache
was built all raise with the clip name and the fix (rebuild the cache or
set ``psl: {mode: online}``) — never a silent fall-back to stale
targets.

Sharded builds (multi-host prep): ``build_psl_cache(..., shard=(i, n))``
scores every n-th manifest clip starting at i (strided assignment — long
and short clips balance across hosts), so N hosts each run
``uit-psl-cache --shard i/N -o cache.iofN.h5`` over the SAME manifest
with no coordination. At train time ``psl: {mode: offline, cache: ...}``
accepts a list of shard paths or one glob (``cache.*of4.h5``);
:class:`PSLCachedRandomCropHDF5Dataset` validates that the shards came
from one build (equal grid/chunk/classes, a complete 0..N-1 index set)
and serves the union. A clip in no shard still raises by name.
"""

from __future__ import annotations

import threading
from typing import Callable, Optional

import numpy as np

from .hdf5 import WeakRandomCropHDF5Dataset, _convert
from .manifest import multihot

try:
    from h5py import File as _H5File
except ImportError:  # pragma: no cover
    _H5File = None

CACHE_VERSION = 1
DEFAULT_GRID = 1600  # samples: 0.1 s at 16 kHz = 10 mel hops


def resolve_cache_paths(cache) -> list[str]:
    """Normalize the ``psl: {cache: ...}`` config value to a list of
    existing shard paths.

    Accepts one path, a glob pattern (expands sorted), or a list/tuple of
    either. Raises FileNotFoundError naming the offending entry when a
    literal path is missing or a glob matches nothing — offline PSL never
    starts against a partial cache silently.
    """
    import glob as _glob
    import os

    entries = list(cache) if isinstance(cache, (list, tuple)) else [cache]
    if not entries:
        raise FileNotFoundError(
            "psl cache list is empty — pass one file, a shard glob, or a "
            "non-empty list (uit-psl-cache builds them)")
    paths: list[str] = []
    for entry in entries:
        entry = str(entry)
        if _glob.has_magic(entry):
            hits = sorted(_glob.glob(entry))
            if not hits:
                raise FileNotFoundError(
                    f"PSL cache glob {entry!r} matches no files — build the "
                    f"shards with uit-psl-cache (--shard i/N) or fix the "
                    f"pattern")
            paths.extend(hits)
        else:
            if not os.path.exists(entry):
                raise FileNotFoundError(
                    f"PSL cache {entry} does not exist — build it with "
                    f"uit-psl-cache or switch to psl: {{mode: psl}}")
            paths.append(entry)
    return paths


def cache_starts(n: int, L: int, grid: int) -> list[int]:
    """The ONE copy of the cached-crop grid rule.

    Long clips (n > L): crop starts ``wav[start:start+L]`` for
    ``start in range(0, n-L, grid)`` — the grid snap of the reference's
    ``randint(0, n-L-1)`` (dataset.py:77).
    Short clips (n < L): zero-pad offsets ``out[start:start+n] = wav``
    for ``start in range(0, L-n, grid)`` (dataset.py:85-93).
    Exact length (n == L): the single identity crop.
    """
    if n == L:
        return [0]
    span = n - L if n > L else L - n
    return list(range(0, span, grid))


def _apply_start(wav: np.ndarray, L: int, start: int) -> np.ndarray:
    """Materialize the crop/pad at one grid start (same rule as
    WeakRandomCropHDF5Dataset._read, with the start pinned)."""
    n = wav.shape[-1]
    if n >= L:
        return wav[start:start + L]
    out = np.zeros(L, dtype=wav.dtype)
    out[start:start + n] = wav
    return out


def build_psl_cache(
    data_frame,
    teacher_fn: Callable[[np.ndarray], np.ndarray],
    out_path,
    *,
    chunk_length: float = 1.0,
    grid: int = DEFAULT_GRID,
    sample_rate: int = 16000,
    batch_size: int = 256,
    classes: Optional[int] = None,
    teacher_name: str = "",
    progress: Optional[Callable[[int, int], None]] = None,
    shard: Optional[tuple[int, int]] = None,
) -> dict:
    """Score every grid crop of every manifest clip with the teacher and
    write the float16 probability cache.

    ``teacher_fn(wav_batch (B, L)) -> probs (B, C)`` — any batch-jitted
    eval forward (the CLI builds it from a checkpoint spec). Crops from
    different clips share batches; the final partial batch is padded and
    the pad rows dropped, so the teacher compiles ONE program.

    ``shard=(i, n)`` scores only manifest rows ``i::n`` (strided, so clip
    lengths balance across the n independent builders) and stamps the
    shard identity into the file; the reader refuses incomplete shard
    sets. Returns a summary dict (clips, crops, bytes).
    """
    if _H5File is None:  # pragma: no cover
        raise RuntimeError("h5py is required to build a PSL cache")
    L = int(chunk_length * sample_rate)
    grid = int(grid)
    if grid <= 0:
        raise ValueError(f"grid must be positive, got {grid}")
    df = data_frame.reset_index(drop=True)
    if shard is not None:
        si, sn = int(shard[0]), int(shard[1])
        if not (0 <= si < sn):
            raise ValueError(f"shard index must satisfy 0 <= i < n, "
                             f"got {si}/{sn}")
        df = df.iloc[si::sn].reset_index(drop=True)

    # (fname, n_starts) in manifest order; crops stream through flat batches
    pending_meta: list[tuple[str, int]] = []  # clips flushed in order
    buf: list[np.ndarray] = []
    buf_meta: list[str] = []  # fname per buffered crop
    results: dict[str, list[np.ndarray]] = {}
    n_crops_total = 0

    def flush():
        if not buf:
            return
        k = len(buf)
        batch = np.stack(buf)
        if k < batch_size:  # pad to the compiled batch shape
            batch = np.concatenate(
                [batch, np.zeros((batch_size - k,) + batch.shape[1:],
                                 batch.dtype)])
        probs = np.asarray(teacher_fn(batch))[:k]
        for fname, p in zip(buf_meta, probs):
            results[fname].append(p)
        buf.clear()
        buf_meta.clear()

    import h5py

    with h5py.File(out_path, "w") as out:
        n_classes_seen = None
        for i, row in df.iterrows():
            fname = row["filename"]
            with _H5File(row["hdf5path"], "r") as src:
                try:
                    wav = src[fname][:]
                except KeyError:
                    raise KeyError(
                        f"waveform key {fname!r} not found in "
                        f"{row['hdf5path']} while building the PSL cache"
                    ) from None
            starts = cache_starts(wav.shape[-1], L, grid)
            pending_meta.append((fname, len(starts)))
            results[fname] = []
            for s in starts:
                buf.append(_apply_start(wav, L, s))
                buf_meta.append(fname)
                if len(buf) == batch_size:
                    flush()
            n_crops_total += len(starts)
            # write every clip whose crops are all scored (keeps memory flat)
            flush_to = 0
            for fname_done, n_starts in pending_meta:
                if len(results[fname_done]) < n_starts:
                    break
                probs = np.stack(results.pop(fname_done))
                if classes is not None:
                    probs = probs[:, :classes]
                n_classes_seen = probs.shape[1]
                out.create_dataset(fname_done, data=probs.astype(np.float16))
                flush_to += 1
            pending_meta = pending_meta[flush_to:]
            if progress is not None:
                progress(i + 1, len(df))
        flush()
        for fname_done, _ in pending_meta:
            probs = np.stack(results.pop(fname_done))
            if classes is not None:
                probs = probs[:, :classes]
            n_classes_seen = probs.shape[1]
            out.create_dataset(fname_done, data=probs.astype(np.float16))
        out.attrs["version"] = CACHE_VERSION
        out.attrs["grid"] = grid
        out.attrs["chunk_length"] = L
        out.attrs["sample_rate"] = sample_rate
        out.attrs["classes"] = int(n_classes_seen or 0)
        out.attrs["teacher"] = teacher_name
        if shard is not None:
            out.attrs["shard_index"] = si
            out.attrs["shard_count"] = sn
    import os

    return {
        "clips": len(df),
        "crops": n_crops_total,
        "classes": int(n_classes_seen or 0),
        "bytes": os.path.getsize(out_path),
    }


class PSLCachedRandomCropHDF5Dataset(WeakRandomCropHDF5Dataset):
    """Random grid-aligned crop + cached-teacher target overwrite.

    Emits ``(wav_crop, target, filename)`` where ``target[:classes]`` is
    the cached teacher probability row for the drawn crop — the offline
    equivalent of the reference's in-step PSL overwrite (run.py:199-202).
    Crop starts are drawn uniformly over the cache grid (the grid snap of
    the reference's uniform ``randint``), from the SAME per-dataset rng
    stream the online crop dataset uses.

    ``cache_path`` may be one file, a glob, or a list of shard files from
    a ``--shard i/N`` build; shards must agree on grid/chunk/classes and
    form a complete 0..N-1 index set (validated here, loudly).
    """

    def __init__(self, data_frame, chunk_length: float, num_classes: int,
                 cache_path, sample_rate: int = 16000, rng=None,
                 dtype: str = "float32"):
        super().__init__(data_frame, chunk_length=chunk_length,
                         num_classes=num_classes, sample_rate=sample_rate,
                         rng=rng, dtype=dtype)
        if _H5File is None:  # pragma: no cover
            raise RuntimeError("h5py is required for the offline PSL cache")
        self._cache_paths = resolve_cache_paths(cache_path)
        self._cache_local = threading.local()
        shard_ids: list[tuple[int, int]] = []
        self._clip_shard: dict[str, int] = {}  # fname -> index in _cache_paths
        infos: list[tuple[str, dict, bool]] = []  # (path, attrs, nonempty)
        for pi, path in enumerate(self._cache_paths):
            with _H5File(path, "r") as f:
                attrs = dict(f.attrs)
                for key in ("grid", "chunk_length", "classes"):
                    if key not in attrs:
                        raise ValueError(
                            f"{path} is not a PSL cache (missing attribute "
                            f"{key!r}); build one with uit-psl-cache")
                keys = list(f.keys())
                infos.append((path, attrs, bool(keys)))
                if "shard_index" in attrs:
                    shard_ids.append((int(attrs["shard_index"]),
                                      int(attrs["shard_count"])))
                # the union lookup: which shard file holds each clip
                for fname in keys:
                    if fname in self._clip_shard:
                        raise ValueError(
                            f"clip {fname!r} appears in two PSL shards "
                            f"({self._cache_paths[self._clip_shard[fname]]} "
                            f"and {path}) — the files are not one "
                            f"--shard i/N build; regenerate the shard set")
                    self._clip_shard[fname] = pi
        # one-build consistency: compare every shard against a NON-EMPTY
        # reference. A shard whose manifest stride got zero rows is legal
        # (more prep hosts than clips) but stores classes=0, so empty
        # shards skip the classes comparison. 'teacher' is part of the
        # build identity: same grid/classes from a DIFFERENT teacher
        # checkpoint must not silently mix targets.
        ref_path, attrs0, _ = next((i for i in infos if i[2]), infos[0])
        for path, attrs, nonempty in infos:
            check = ["grid", "chunk_length", "sample_rate", "teacher"]
            if nonempty:
                check.append("classes")
            for key in check:
                a0, a1 = attrs0.get(key), attrs.get(key)
                if str(a0) != str(a1):
                    raise ValueError(
                        f"PSL cache shards disagree on {key}: {ref_path} "
                        f"has {a0}, {path} has {a1} — they are not one "
                        f"build; regenerate the shard set")
        if shard_ids:
            counts = {n for _, n in shard_ids}
            if len(counts) != 1:
                raise ValueError(
                    f"PSL cache shards come from different --shard N builds "
                    f"({sorted(counts)}) across {self._cache_paths}")
            n = counts.pop()
            indices = [i for i, _ in shard_ids]
            dups = sorted({i for i in indices if indices.count(i) > 1})
            if dups:
                raise ValueError(
                    f"duplicate PSL shard indices {dups} across "
                    f"{self._cache_paths} — the files mix more than one "
                    f"--shard i/{n} build; pass each shard exactly once")
            missing = set(range(n)) - set(indices)
            if missing:
                raise ValueError(
                    f"incomplete PSL shard set: built as {n} shards but "
                    f"indices {sorted(missing)} are absent from "
                    f"{self._cache_paths} — pass every shard (glob or list)")
        if int(attrs0["chunk_length"]) != self.chunk_length:
            raise ValueError(
                f"PSL cache {self._cache_paths[0]} was built for "
                f"chunk_length={int(attrs0['chunk_length'])} samples but the "
                f"training config crops {self.chunk_length} — rebuild the "
                f"cache or fix chunk_length")
        self._grid = int(attrs0["grid"])
        self._psl_classes = int(attrs0["classes"])
        if self._psl_classes > num_classes:
            raise ValueError(
                f"PSL cache stores {self._psl_classes} classes but targets "
                f"have {num_classes}")

    def _cache(self, pi: int):
        files = getattr(self._cache_local, "files", None)
        if files is None:
            files = self._cache_local.files = {}
        f = files.get(pi)
        if f is None:
            f = files[pi] = _H5File(self._cache_paths[pi], "r")
        return f

    def _cache_row(self, fname: str, n: int):
        """(grid index, cached probs row) for one clip of n samples."""
        pi = self._clip_shard.get(fname)
        if pi is None:
            raise KeyError(
                f"clip {fname!r} has no entry in the PSL cache(s) "
                f"{self._cache_paths} — rebuild the cache over this "
                f"manifest (uit-psl-cache) or train with psl: "
                f"{{mode: online}}")
        node = self._cache(pi)[fname]
        starts = cache_starts(n, self.chunk_length, self._grid)
        if node.shape[0] != len(starts):
            raise ValueError(
                f"PSL cache entry for {fname!r} has {node.shape[0]} crop "
                f"rows but the clip's length ({n} samples) implies "
                f"{len(starts)} on grid {self._grid} — the audio changed "
                f"since the cache was built; rebuild it")
        gi = self._rng.randrange(len(starts))
        return starts[gi], np.asarray(node[gi], dtype=np.float32)

    def __getitem__(self, index: int):
        row = self._dataframe.iloc[index]
        fname = row["filename"]
        target = multihot(row["labels"], self._num_classes)
        node = self._node(row["hdf5path"], fname)
        n = node.shape[-1]
        L = self.chunk_length
        start, probs = self._cache_row(fname, n)
        if n > L:
            data = node[start:start + L]
        else:
            data = _apply_start(node[:], L, start)
        target[: self._psl_classes] = probs
        return _convert(data, self._dtype), target, fname
