"""The committed accuracy gate (tools/gate_synthetic.py), CPU-sized.

Round-3 VERDICT item 3: a gate that fails when TRAINING REGRESSES, not
just when it crashes. This runs the real CLI path (cli.train.main ==
run.py, cli.evaluate.main == evaluate.py) on the deterministic synthetic
keyword world and pins a minimum mAPKWS. Marked slow (several minutes of
CPU training); `make test-fast` skips it, `make test` and `make
verify-tpu` (on-chip, full size) run it.
"""

import pytest

from uit_mobile_tpu.data.synthworld import KW_FREQS, build_world

pytestmark = pytest.mark.slow


def test_world_is_deterministic(tmp_path):
    import hashlib

    import h5py

    w1 = build_world(tmp_path / "a", seed=0, n_train=8, n_eval=4)
    w2 = build_world(tmp_path / "b", seed=0, n_train=8, n_eval=4)

    def digest(tsv):
        h5 = tsv.replace(".tsv", ".h5")
        h = hashlib.sha256()
        with h5py.File(h5, "r") as f:
            for k in sorted(f.keys()):
                h.update(k.encode())
                h.update(f[k][...].tobytes())
        return h.hexdigest()

    for key in w1:
        assert digest(w1[key]) == digest(w2[key]), key
    assert len(KW_FREQS) == 10 and min(KW_FREQS) == 527


def test_gate_passes_on_cpu(tmp_path):
    """Full gate: train via the real CLI, evaluate via the real CLI;
    run_gate itself asserts BOTH pinned minimums (mAPKWS >= 0.80 and
    GSC-protocol Accuracy@0.2 >= 0.80 — the observed band is 1.000 /
    0.977 at this size, chance ~0.1)."""
    from tools.gate_synthetic import run_gate

    score = run_gate(tmp_path, small=True, quiet=True)
    assert score >= 0.80, score
