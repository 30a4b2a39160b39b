"""On-chip A/B: Evaluator bounded async-dispatch window vs synchronous.

Builds a synthetic fixed-shape eval set (the GSC shape: 1 s int16 clips),
then times Evaluator._run_epoch in one process:
  - old-style sync loop (explicit _fwd per batch — the pre-round-3 path)
  - async window depth 1 / 4 / 8
  - scan_batches=8 with the async window
Distinct random clips per row so the relay cannot dedup dispatches.

Usage: python tools/probe_eval_async.py [n_clips] [batch_size]
"""
import os
import sys
import tempfile
import time

import h5py
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    n_clips = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    import jax

    from uit_mobile_tpu import models
    from uit_mobile_tpu.ckpt.io import save_checkpoint
    from uit_mobile_tpu.data import read_tsv_data
    from uit_mobile_tpu.evaluate import Evaluator
    from uit_mobile_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    d = tempfile.mkdtemp(prefix="probe_eval_")
    rng = np.random.default_rng(0)
    h5 = os.path.join(d, "e.h5")
    rows = []
    with h5py.File(h5, "w") as f:
        wavs = (rng.standard_normal((n_clips, 16000)) * 3000).astype(np.int16)
        for i in range(n_clips):
            f[f"c{i}.wav"] = wavs[i]
            rows.append((f"c{i}.wav", str(i % 5), h5))
    tsv = os.path.join(d, "e.tsv")
    pd.DataFrame(rows, columns=["filename", "labels", "hdf5path"]).to_csv(
        tsv, sep="\t", index=False)
    cfg = models.get_model_config("uit_xs", outputdim=537, target_length=102)
    params, state = models.build(cfg, jax.random.key(0))
    ckpt = os.path.join(d, "m.npz")
    save_checkpoint(ckpt, params, state, cfg)
    df = read_tsv_data(tsv, basename=False)

    kw = dict(batch_size=bs, num_workers=2, fast=True, use_pallas=True,
              dtype="int16")

    def run(tag, ev, warm=True):
        if warm:  # compile + warm the loader path once
            ev._run_epoch(df.iloc[: 2 * bs], num_classes=537)
        t0 = time.perf_counter()
        p, t = ev._run_epoch(df, num_classes=537)
        dt = time.perf_counter() - t0
        print(f"{tag:28s} {dt*1e3:9.1f} ms  {n_clips/dt:10.0f} clips/s",
              flush=True)
        return p

    # old-style sync loop (reference comparator)
    ev_sync = Evaluator(ckpt, **kw)
    ev_sync._setup()

    def sync_epoch():
        from uit_mobile_tpu.data.hdf5 import DataLoader, WeakHDF5Dataset
        ds = WeakHDF5Dataset(df, num_classes=537, dtype="int16")
        loader = DataLoader(ds, batch_size=bs, shuffle=False, num_workers=2)
        preds = [ev_sync._fwd(b["wav"]) for b in loader]
        return np.concatenate(preds)

    sync_epoch()  # warm
    t0 = time.perf_counter()
    p_sync = sync_epoch()
    dt = time.perf_counter() - t0
    print(f"{'sync per-batch (old)':28s} {dt*1e3:9.1f} ms  "
          f"{n_clips/dt:10.0f} clips/s", flush=True)

    outs = {}
    for depth in (1, 4, 8):
        ev = Evaluator(ckpt, **kw)
        ev._dispatch_depth = depth
        outs[depth] = run(f"async window depth={depth}", ev)

    ev_scan = Evaluator(ckpt, scan_batches=8, **kw)
    ev_scan._dispatch_depth = 4
    p_scan = run("scan K=8 + window depth=4", ev_scan)

    for depth, p in outs.items():
        print(f"depth={depth} max drift vs sync: {np.abs(p - p_sync).max()}")
    print(f"scan    max drift vs sync: {np.abs(p_scan - p_sync).max()}")


if __name__ == "__main__":
    main()
