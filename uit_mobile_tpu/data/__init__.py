from .audio_io import read_wav, read_wav_bytes, write_wav
from .manifest import read_tsv_data, multihot
from .psl_cache import (
    PSLCachedRandomCropHDF5Dataset,
    build_psl_cache,
    cache_starts,
)
from .hdf5 import (
    WeakHDF5Dataset,
    WeakRandomCropHDF5Dataset,
    WeakChunkedHDF5Dataset,
    StrongFramewiseHDF5Dataset,
    UnlabeledRandomChunkedHDF5Dataset,
    BalancedSampler,
    RandomSampler,
    SequentialSampler,
    DataLoader,
    MultiDataLoader,
    device_prefetch,
    collate,
    pad_batch,
)

__all__ = [
    "read_wav",
    "read_wav_bytes",
    "write_wav",
    "read_tsv_data",
    "multihot",
    "WeakHDF5Dataset",
    "WeakRandomCropHDF5Dataset",
    "WeakChunkedHDF5Dataset",
    "StrongFramewiseHDF5Dataset",
    "UnlabeledRandomChunkedHDF5Dataset",
    "BalancedSampler",
    "RandomSampler",
    "SequentialSampler",
    "DataLoader",
    "MultiDataLoader",
    "device_prefetch",
    "collate",
    "pad_batch",
    "PSLCachedRandomCropHDF5Dataset",
    "build_psl_cache",
    "cache_starts",
]
