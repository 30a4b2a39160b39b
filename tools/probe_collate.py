"""Host-side collate A/B: numpy pad_batch vs the C++ thread-pool
assembler (native.pad_batch_native) across batch size / clip length /
dtype. Pure host probe — no TPU needed.

Measured on this image's host (see data/hdf5.collate for the routing
derived from it):

    B=   32 int16 1s : numpy  0.114 ms   native 1.104 ms   (numpy 10x)
    B=  256 int16 1s : numpy  1.321 ms   native 2.213 ms   (numpy 1.7x)
    B= 1024 int16 1s : numpy  6.915 ms   native 7.271 ms   (wash)
    B=   32 int16 10s: numpy  1.586 ms   native 1.231 ms   (native 1.29x)
    B=  256 int16 10s: numpy 26.545 ms   native 22.937 ms  (native 1.16x)
    B= 1024 int16 10s: numpy 135.4  ms   native 203.4 ms   (numpy 1.5x)

numpy's row-wise ``out[i, :len] = w`` is a straight memcpy loop the
thread-pool fan-out only beats when each row's copy is large AND the
pool isn't saturating memory bandwidth — hence collate routes to native
only for mean length >= 100k samples at B <= 256.

Run:  python tools/probe_collate.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    from uit_mobile_tpu import native
    from uit_mobile_tpu.data.hdf5 import pad_batch

    if not native.available():
        print("native assembler not built — run "
              "`python -m uit_mobile_tpu.native.build` first")
        return
    rng = np.random.default_rng(0)

    def bench(waves, n):
        out = {}
        for name, fn in (("numpy", lambda: pad_batch(waves)),
                         ("native", lambda: native.pad_batch_native(waves))):
            fn()
            t0 = time.perf_counter()
            for _ in range(n):
                fn()
            out[name] = (time.perf_counter() - t0) / n * 1e3
        return out

    for B in (32, 256, 1024):
        for dtype, T in (("int16", 16000), ("f32", 16000), ("int16", 160000)):
            if dtype == "int16":
                ws = [rng.integers(-3000, 3000,
                                   size=rng.integers(T // 2, T + 1),
                                   dtype=np.int16) for _ in range(B)]
            else:
                ws = [rng.standard_normal(rng.integers(T // 2, T + 1))
                      .astype(np.float32) for _ in range(B)]
            n = 20 if B * T > 5_000_000 else 60
            r = bench(ws, n)
            print(f"B={B:5d} {dtype:5s} T~{T:6d}: "
                  f"numpy {r['numpy']:8.3f} ms  native {r['native']:8.3f} ms "
                  f" numpy/native {r['numpy'] / r['native']:.2f}x", flush=True)


if __name__ == "__main__":
    main()
