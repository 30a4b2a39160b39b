"""HDF5-backed audio datasets + samplers + batching.

Host-side equivalents of the reference's ``dataset.py`` (WeakHDF5Dataset
:16-56, WeakRandomCropHDF5Dataset :58-102, WeakChunkedHDF5Dataset :104-141,
UnlabeledRandomChunkedHDF5Dataset :143-180, pad/sequential_pad :183-204,
BalancedSampler :207-224, MultiDataLoader :227-247) rebuilt without torch:
numpy batches, thread-pool loading, and an async device-prefetch stage that
keeps the TPU fed (the torch-DataLoader-worker role).

Waveforms are stored as int16 PCM keyed by filename; int arrays are scaled
by 1/32768 to float32 exactly like the reference (dataset.py:44-45).
"""

from __future__ import annotations

import queue
import random as _random
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np
import pandas as pd

from .manifest import multihot

try:
    from h5py import File as _H5File
except ImportError:  # pragma: no cover
    _H5File = None


def _to_float32(data: np.ndarray) -> np.ndarray:
    if np.issubdtype(data.dtype, np.integer):
        # THE conversion pair (frontend.mel): never inline the formula
        from ..frontend import normalize_pcm16

        return normalize_pcm16(data)
    return np.asarray(data, dtype=np.float32)


def _convert(data: np.ndarray, dtype) -> np.ndarray:
    """Stored int16 PCM -> requested emission dtype.

    'int16' keeps the PCM raw (every frontend folds the 1/32768 scale in
    bitwise-exactly — see ops/pallas_mel.py — and the batch crosses the
    host->device link at half the bytes); 'float32' is the reference's
    on-host convention (dataset.py:44-45)."""
    if dtype == np.int16:
        if data.dtype == np.int16:
            return data
        if np.issubdtype(data.dtype, np.integer):
            # wider integer storage can exceed the int16 range; a silent
            # wrap would break the bitwise-parity contract with 'float32'
            raise ValueError(
                f"dtype='int16' requires int16 PCM storage, got {data.dtype}"
            )
        from ..frontend.mel import quantize_pcm16

        return quantize_pcm16(data)
    return _to_float32(data)


class WeakHDF5Dataset:
    """Full-clip dataset: index -> (waveform, multihot target, filename).

    dtype: 'float32' (default, reference semantics) or 'int16' (raw PCM
    emission for the eval/serving fast path)."""

    def __init__(self, data_frame: pd.DataFrame, num_classes: int,
                 dtype: str = "float32"):
        assert dtype in ("float32", "int16"), dtype
        self._dataframe = data_frame.reset_index(drop=True)
        self._num_classes = num_classes
        self._dtype = np.int16 if dtype == "int16" else np.float32
        self._local = threading.local()  # per-thread h5 handle cache

    def __len__(self) -> int:
        return len(self._dataframe)

    def _file(self, hdf5path: str):
        cache = getattr(self._local, "cache", None)
        if cache is None:
            cache = self._local.cache = {}
        if hdf5path not in cache:
            cache[hdf5path] = _H5File(hdf5path, "r")
        return cache[hdf5path]

    def _node(self, hdf5path: str, fname: str):
        """The h5py dataset node for one manifest row, with a useful error:
        h5py's bare KeyError doesn't say which FILE was searched, and a
        basename-mode mismatch (manifest stores paths, HDF5 keys are
        basenames or vice versa) is the most common way to hit it."""
        try:
            return self._file(hdf5path)[fname]
        except KeyError:
            raise KeyError(
                f"waveform key {fname!r} not found in {hdf5path} — check "
                f"the manifest's filename column against the HDF5 keys "
                f"(a basename=True/False mismatch drops or mangles paths)"
            ) from None

    def _read(self, hdf5path: str, fname: str) -> np.ndarray:
        return _convert(self._node(hdf5path, fname)[:], self._dtype)

    def __getitem__(self, index: int):
        row = self._dataframe.iloc[index]
        target = multihot(row["labels"], self._num_classes)
        data = self._read(row["hdf5path"], row["filename"])
        return data, target, row["filename"]


class WeakRandomCropHDF5Dataset(WeakHDF5Dataset):
    """Random fixed-length crop (long clips) or random-offset zero-pad
    (short clips) — reference dataset.py:75-93 semantics."""

    def __init__(self, data_frame, chunk_length: float, num_classes: int,
                 sample_rate: int = 16000, rng: Optional[_random.Random] = None,
                 dtype: str = "float32"):
        super().__init__(data_frame, num_classes, dtype=dtype)
        self.chunk_length = int(chunk_length * sample_rate)
        self._rng = rng or _random.Random()

    def _read(self, hdf5path: str, fname: str) -> np.ndarray:
        node = self._node(hdf5path, fname)
        n = node.shape[-1]
        L = self.chunk_length
        if n > L:
            start = self._rng.randint(0, n - L - 1)
            data = node[start:start + L]
        else:
            loaded = node[:]
            data = np.zeros(L, dtype=loaded.dtype)
            start = self._rng.randint(0, L - n - 1) if L > n else 0
            data[start:start + n] = loaded
        return _convert(data, self._dtype)


class WeakChunkedHDF5Dataset(WeakHDF5Dataset):
    """Time-interval reads driven by 'from'/'to' manifest columns (seconds);
    -1 labels are dropped (reference dataset.py:104-141).

    The reference ships this class but never trains with it (dead code —
    run.py only builds the weak/random-crop variants). Here it is live:
    with ``fixed_length`` (seconds) each interval is random-cropped (long)
    or random-offset zero-padded (short) to a static shape — the
    WeakRandomCropHDF5Dataset semantics applied WITHIN the labeled event
    interval — which is what lets the Trainer consume strong-label
    manifests (see train/loop._build_data: manifests with from/to columns
    route here automatically)."""

    def __init__(self, data_frame, num_classes: int, sample_rate: int = 16000,
                 fixed_length: Optional[float] = None,
                 rng: Optional[_random.Random] = None, dtype: str = "float32"):
        super().__init__(data_frame, num_classes, dtype=dtype)
        self._sr = sample_rate
        self._fixed = int(fixed_length * sample_rate) if fixed_length else None
        self._rng = rng or _random.Random()

    def __getitem__(self, index: int):
        row = self._dataframe.iloc[index]
        target = multihot(row["labels"], self._num_classes)
        node = self._node(row["hdf5path"], row["filename"])
        # clamp BOTH ends into the clip: an annotation overrun with
        # from >= len would slice empty (silence with positive labels);
        # a negative 'from' would h5py-wrap and read the clip's TAIL
        hi = min(int(float(row["to"]) * self._sr), node.shape[-1])
        lo = min(max(int(float(row["from"]) * self._sr), 0), hi)
        if lo >= hi:
            raise ValueError(
                f"{row['filename']}: event interval [{row['from']}, "
                f"{row['to']})s lies outside the {node.shape[-1]}-sample "
                f"clip — fix the manifest row"
            )
        L = self._fixed
        if L is None:
            data = node[lo:hi]
        elif hi - lo > L:
            start = lo + self._rng.randint(0, hi - lo - L - 1)
            data = node[start:start + L]
        else:
            loaded = node[lo:hi]
            n = loaded.shape[-1]
            data = np.zeros(L, dtype=loaded.dtype)
            start = self._rng.randint(0, L - n - 1) if L > n else 0
            data[start:start + n] = loaded
        return _convert(data, self._dtype), target, row["filename"]


class StrongFramewiseHDF5Dataset(WeakHDF5Dataset):
    """SED training dataset: random window + per-time-segment targets.

    One item per FILE (manifest rows with the same filename are that
    file's labeled event intervals). Each read picks a random
    ``chunk_length`` window of the clip and rasterizes the overlapping
    events onto ``n_segments`` segments of ``seg_seconds`` each
    (evaluate.metrics.segment_events_to_targets semantics) — the targets
    for models.uit.forward_train_framewise's (B, tg, C) output. Beyond
    the reference: it has no strong-label training at all."""

    def __init__(self, data_frame, num_classes: int, n_segments: int,
                 seg_seconds: float, chunk_length: float = 1.0,
                 sample_rate: int = 16000, min_overlap: float = 0.5,
                 rng: Optional[_random.Random] = None, dtype: str = "float32",
                 deterministic: bool = False):
        from .manifest import events_by_file

        groups = events_by_file(data_frame)
        df = pd.DataFrame(
            [(f, [e[0] for e in ev], h) for f, h, ev in groups],
            columns=["filename", "labels", "hdf5path"],
        )
        super().__init__(df, num_classes, dtype=dtype)
        self._events = [ev for _, _, ev in groups]
        self._sr = sample_rate
        self._chunk = int(chunk_length * sample_rate)
        self._n_seg = n_segments
        self._seg_s = seg_seconds
        self._min_ov = min_overlap
        self._rng = rng or _random.Random()
        # deterministic=True (evaluation): window offsets are a pure
        # function of the item index — with threaded loader workers a
        # SHARED rng stream interleaves nondeterministically, which would
        # score each validation epoch on different windows
        self._det = deterministic

    def __getitem__(self, index: int):
        from ..evaluate.metrics import segment_events_to_targets

        rng = _random.Random(0x5ED0 + index) if self._det else self._rng
        row = self._dataframe.iloc[index]
        node = self._node(row["hdf5path"], row["filename"])
        n, L = node.shape[-1], self._chunk
        if n > L:
            ws = rng.randint(0, n - L - 1)
            data = node[ws:ws + L]
            off = 0
        else:
            loaded = node[:]
            data = np.zeros(L, dtype=loaded.dtype)
            off = rng.randint(0, L - n - 1) if L > n else 0
            data[off:off + n] = loaded
            ws = 0
        shift = (off - ws) / self._sr  # event time in window coordinates
        events = [(c, on + shift, offs + shift)
                  for c, on, offs in self._events[index]]
        times = np.asarray(
            [[k * self._seg_s, (k + 1) * self._seg_s]
             for k in range(self._n_seg)], dtype=np.float64)
        target = segment_events_to_targets(times, events, self._num_classes,
                                           min_overlap=self._min_ov)
        return _convert(data, self._dtype), target, row["filename"]


class UnlabeledRandomChunkedHDF5Dataset(WeakRandomCropHDF5Dataset):
    """Self-supervised variant: random chunks, all-zero targets."""

    def __init__(self, data_frame, chunk_length: float = 2.0,
                 sample_rate: int = 16000, num_classes: int = 527, rng=None):
        df = data_frame.copy()
        if "labels" not in df.columns:
            df["labels"] = [[] for _ in range(len(df))]
        super().__init__(df, chunk_length, num_classes, sample_rate, rng)

    def __getitem__(self, index: int):
        row = self._dataframe.iloc[index]
        data = self._read(row["hdf5path"], row["filename"])
        return data, np.zeros(self._num_classes, np.float32), row["filename"]


# -------------------------------------------------------------------- batching

def pad_batch(waves: Sequence[np.ndarray], padding_value: float = 0.0):
    """Right-pad to batch max -> ((B, T), lengths). reference dataset.py:183-197.
    Batch dtype follows the waves' (int16 PCM stays int16)."""
    if not waves:
        raise ValueError("pad_batch: empty batch")
    lengths = np.asarray([w.shape[-1] for w in waves], dtype=np.int32)
    pcm16 = waves[0].dtype == np.int16
    # a silent int16/float mix would truncate the floats to ~all-zeros —
    # a real raise (not assert): must survive python -O
    if not all((w.dtype == np.int16) == pcm16 for w in waves):
        raise ValueError("pad_batch: mixed int16/float waveforms in one batch")
    out = np.full((len(waves), int(lengths.max())), padding_value,
                  dtype=np.int16 if pcm16 else np.float32)
    for i, w in enumerate(waves):
        out[i, : w.shape[-1]] = w
    return out, lengths


_NATIVE_COLLATE_WARNED = False


def collate(samples):
    """[(wav, target, fname)] -> dict batch (the sequential_pad contract).

    Uses the native C++ batch assembler (uit_mobile_tpu.native) only in
    its measured win region — long clips at small/mid batch sizes, where
    the per-row copies are big enough to amortize the thread-pool fan-out
    (host sweep, tools/probe_collate.py: 10 s int16 clips B<=256 native
    wins 1.16-1.29x; 1 s clips or B>=1024 numpy's straight row-memcpy
    loop wins up to 10x). Falls back to numpy transparently elsewhere.
    """
    waves, targets, fnames = zip(*samples)
    use_native = False
    try:
        from .. import native

        mean_len = sum(w.shape[-1] for w in waves) / max(len(waves), 1)
        use_native = (native.available() and len(waves) <= 256
                      and mean_len >= 100_000)
    except Exception:
        pass
    if use_native:
        # only the NATIVE call sits in the guarded block: a numpy-path
        # failure must surface as itself, not masquerade as 'native
        # failed' (and burn the one-shot warning)
        try:
            data, lengths = native.pad_batch_native(waves)
        except Exception:
            # a FAILING native assembler (not merely an unbuilt one —
            # that is the clean native.available() branch) must not be
            # silently masked forever: warn once, keep serving via numpy
            global _NATIVE_COLLATE_WARNED
            if not _NATIVE_COLLATE_WARNED:
                _NATIVE_COLLATE_WARNED = True
                import logging

                logging.getLogger("uit_mobile_tpu").warning(
                    "native pad_batch failed; falling back to numpy "
                    "collate", exc_info=True,
                )
            data, lengths = pad_batch(waves)
    else:
        data, lengths = pad_batch(waves)
    return {
        "wav": data,
        "target": np.stack(targets),
        "lengths": lengths,
        "filenames": list(fnames),
    }


# -------------------------------------------------------------------- samplers

class BalancedSampler:
    """Label-frequency-balanced sampling with replacement.

    weight(sample) = sum over its labels of 1000/(class_count + offset)
    (reference dataset.py:207-224).
    """

    def __init__(self, labels_series: pd.Series, offset: int = 100,
                 random_state: Optional[int] = None):
        single = labels_series.copy().explode().reset_index()
        single.columns = ["index", "label"]
        occurrences = single.groupby("label")["index"].apply(len).sort_index()
        weights = (1000.0 / (occurrences + offset)).to_dict()
        w = labels_series.apply(lambda lab: sum(weights[c] for c in lab)).values
        self._p = np.array(w, dtype=np.float64, copy=True)
        self._p /= self._p.sum()
        self._n = len(self._p)
        self._rng = np.random.default_rng(random_state)

    def __len__(self) -> int:
        return self._n

    def __iter__(self) -> Iterator[int]:
        yield from self._rng.choice(self._n, size=self._n, p=self._p)


class RandomSampler:
    def __init__(self, n: int, seed: Optional[int] = None):
        self._n = n
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        return self._n

    def __iter__(self):
        yield from self._rng.permutation(self._n)


class SequentialSampler:
    def __init__(self, n: int):
        self._n = n

    def __len__(self):
        return self._n

    def __iter__(self):
        yield from range(self._n)


# --------------------------------------------------------------------- loaders

class DataLoader:
    """Minimal map-style loader: sampler -> thread-pool fetch -> collate.

    Threads (not processes) carry the h5py reads: they release the GIL in
    libhdf5, and the decoded batches land in shared memory with zero IPC —
    the TPU-side analogue of torch's worker processes.
    """

    def __init__(self, dataset, batch_size: int, sampler=None, shuffle: bool = False,
                 num_workers: int = 2, drop_last: bool = False, seed=None,
                 collate_fn=collate):
        self.dataset = dataset
        self.batch_size = batch_size
        if sampler is None:
            sampler = (RandomSampler(len(dataset), seed) if shuffle
                       else SequentialSampler(len(dataset)))
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.drop_last = drop_last
        self.collate_fn = collate_fn

    def __len__(self) -> int:
        n = len(self.sampler)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        idxs = list(iter(self.sampler))
        batches = [
            idxs[i: i + self.batch_size]
            for i in range(0, len(idxs), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()
        with ThreadPoolExecutor(self.num_workers) as pool:
            # pipeline: keep a couple of batches in flight
            pending = []
            it = iter(batches)

            def submit_next():
                try:
                    b = next(it)
                except StopIteration:
                    return False
                pending.append(pool.submit(
                    lambda bb: self.collate_fn([self.dataset[i] for i in bb]), b
                ))
                return True

            for _ in range(2 + 1):
                submit_next()
            while pending:
                fut = pending.pop(0)
                submit_next()
                yield fut.result()


class MultiDataLoader:
    """Zip N child loaders into dict batches, re-iterating each child on
    exhaustion -> an infinite stream (reference dataset.py:227-247); epochs
    are therefore bounded by epoch_length, as in the reference trainer."""

    def __init__(self, **loaders):
        self.loaders = loaders
        self._iters = {k: iter(v) for k, v in loaders.items()}

    def __len__(self) -> int:
        return min(len(dl) for dl in self.loaders.values())

    def __iter__(self):
        while True:
            out = {}
            for key in self._iters:
                try:
                    out[key] = next(self._iters[key])
                except StopIteration:
                    self._iters[key] = iter(self.loaders[key])
                    try:
                        out[key] = next(self._iters[key])
                    except StopIteration:
                        # PEP 479 would surface this as an opaque
                        # 'generator raised StopIteration' mid-training
                        raise ValueError(
                            f"MultiDataLoader child '{key}' yields zero "
                            f"batches (dataset smaller than batch_size "
                            f"with drop_last, or an empty manifest)"
                        ) from None
            yield out


def device_prefetch(iterator, size: int = 2, sharding=None,
                    process_local: bool = False):
    """Move batches to device ahead of consumption on a background thread.

    With a NamedSharding this doubles as the host->mesh distribution stage.
    With ``process_local=True`` (multi-host training) each array is this
    process's SLICE of the global batch: the stage assembles the globally
    sharded array via ``jax.make_array_from_process_local_data`` — host p's
    rows land on host p's devices, no cross-host data movement (the
    scaling-book multihost input recipe; see parallel/multihost.py).

    The producer thread TERMINATES when the consumer drops or closes the
    generator (generator.close() / GC raises GeneratorExit here): without
    that, wrapping an INFINITE training stream would leak the thread, up
    to `size` device-resident batches, and the source loader's open HDF5
    handles for the life of the process on every abandoned iteration.
    """
    import jax

    if process_local and sharding is None:
        raise ValueError("process_local=True needs the global NamedSharding")

    q: queue.Queue = queue.Queue(maxsize=size)
    _END = object()
    _ERR = object()
    stop = threading.Event()

    def put(x):
        if isinstance(x, np.ndarray) and x.dtype != object:
            if process_local:
                return jax.make_array_from_process_local_data(sharding, x)
            return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)
        if isinstance(x, dict):
            return {k: put(v) for k, v in x.items()}
        return x  # filenames / lists pass through on host

    def producer():
        try:
            for batch in iterator:
                item = put(batch)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surface I/O errors to the consumer
            q.put((_ERR, e))
            return
        q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, tuple) and len(item) == 2 and item[0] is _ERR:
                raise RuntimeError("device_prefetch producer failed") from item[1]
            yield item
    finally:
        stop.set()  # release the producer even mid-q.put
        # drain so a producer blocked on a full queue exits promptly
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
