# Convenience targets. `make parity` is the checkpoint-drop runbook: the
# moment the zenodo dumps (or converted .npz files) appear under
# checkpoints/, it runs every BASELINE.json parity gate in one shot.

PY ?= python

.PHONY: test test-fast bench parity verify-tpu help

help:
	@echo "targets: test | test-fast | bench | parity | verify-tpu"

# on-chip gates: (a) numerics — committed goldens vs the REAL TPU's
# outputs (exact/fast/int16/scan/mel-kernel; tools/verify_tpu_numerics.py);
# (b) ACCURACY — synthetic-world train->eval through the real CLI path
# with a pinned minimum mAPKWS (tools/gate_synthetic.py; fails on a
# training regression, not just a crash)
verify-tpu:
	$(PY) tools/verify_tpu_numerics.py
	$(PY) tools/gate_synthetic.py

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -x -m "not slow"

bench:
	$(PY) bench.py

# BASELINE.json parity gates (requires checkpoints/uit_{xs,xxs,xxxs}.{pt|npz}
# and, for the GSC/audioset gates, the prepared datasets under datasets/).
# Config 1: uit_xxxs single clip on the GSC keyword sample (expect
#   Speech ~1.0000 + "Keyword: on" ~0.99, reference README.md:124-140).
# Config 2: uit_xxs top-5 over all samples/*.wav vs README.md:86-140.
# Config 3: uit_xs GSC Accuracy@0.2 = 97.76 (README.md:176-178).
# Config 5: audioset mAP sweep (34.09 / 32.21 / 30.97).
parity:
	@if ! ls checkpoints/uit_xs.npz >/dev/null 2>&1 && \
	    ! ls checkpoints/uit_xs*.pt >/dev/null 2>&1; then \
	  echo "ERROR: no checkpoints/uit_xs{.npz,*.pt} — drop the zenodo dumps in checkpoints/ first (see NEXT_STEPS.md)"; exit 1; fi
	$(PY) -m uit_mobile_tpu.cli.infer samples/85b877b5_nohash_0.wav -m uit_xxxs -k 5
	$(PY) -m uit_mobile_tpu.cli.infer samples/*.wav -m uit_xxs -k 5
	$(PY) -m uit_mobile_tpu.cli.infer samples/*.wav -m uit_xs -k 5
	@if [ -f datasets/gsc/data/labels/test_gsc_aslabels.tsv ]; then \
	  $(PY) -m uit_mobile_tpu.cli.evaluate gsc uit_xs; \
	else echo "SKIP gsc parity: datasets/gsc not prepared"; fi
	@if [ -f datasets/audioset/data/labels/eval.csv ]; then \
	  for m in uit_xs uit_xxs uit_xxxs; do \
	    $(PY) -m uit_mobile_tpu.cli.evaluate audioset $$m; \
	  done; \
	else echo "SKIP audioset mAP sweep: datasets/audioset not prepared"; fi
