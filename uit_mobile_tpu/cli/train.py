"""Training CLI.

    python -m uit_mobile_tpu.cli.train train configs/train_uit_xs.yaml [--key value ...]
    python -m uit_mobile_tpu.cli.train run   configs/train_uit_xs.yaml   # train + eval

Equivalent of the reference ``run.py {train|run}`` Fire CLI (run.py:423-424)
with explicit argparse: any ``--key value`` pair overrides the YAML config.
"""

from __future__ import annotations

import argparse
import sys

from ..utils import parse_config_or_kwargs, parse_override


def _parse_overrides(pairs):
    out = {}
    key = None
    for tok in pairs:
        if tok.startswith("--"):
            key = tok[2:].replace("-", "_")
            out[key] = True  # bare flag
        else:
            assert key is not None, f"value {tok!r} without --key"
            out[key] = parse_override(tok)
            key = None
    return out


def main(argv=None):
    from ..utils import enable_compilation_cache

    enable_compilation_cache()  # reuse compiled executables across runs
    argv = list(sys.argv[1:] if argv is None else argv)
    parser = argparse.ArgumentParser(prog="uit-train")
    parser.add_argument("command", choices=["train", "run", "pretrain", "sed"])
    parser.add_argument("config")
    args, rest = parser.parse_known_args(argv)

    overrides = _parse_overrides(rest)
    config = parse_config_or_kwargs(args.config, **overrides)

    if args.command == "pretrain":
        from ..train.pretrain import pretrain_from_config

        print(pretrain_from_config(config))
        return 0

    if args.command == "sed":
        from ..train.sed import train_sed_from_config

        print(train_sed_from_config(config))
        return 0

    from ..train.loop import train_from_config

    output_model = train_from_config(config)
    if args.command == "run":
        from ..evaluate import Evaluator

        ev = Evaluator(str(output_model))
        ev.gsc(eval_data=config["kws_test_data"])
        ev.audioset(audioset_eval_data=config["audioset_eval_data"])
    print(output_model)
    return 0


if __name__ == "__main__":
    sys.exit(main())
