"""Export a native checkpoint back to the reference's torch format.

    python -m uit_mobile_tpu.cli.export CKPT.npz -o model.pt

The emitted state_dict uses the reference repo's key naming
(blocks.N.attn.qkv.weight, outputlayer.1.weight, ...) so models trained
here load into the original PyTorch code with strict=True (frontend
buffers excepted — they are regenerated there too).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(prog="uit-export")
    parser.add_argument("checkpoint")
    parser.add_argument("-o", "--output", required=True)
    args = parser.parse_args(argv)

    import numpy as np
    import torch

    from ..ckpt.io import load_checkpoint
    from ..ckpt.torch_convert import uit_torch_state_dict_from_params

    params, state, cfg, _ = load_checkpoint(args.checkpoint)
    assert cfg is not None, "checkpoint has no embedded config"
    sd = uit_torch_state_dict_from_params(params, state, cfg)
    torch.save({k: torch.from_numpy(np.array(v)) for k, v in sd.items()},
               Path(args.output))
    print(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
