"""Shared CLI helpers: label maps and checkpoint resolution."""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from .. import models
from ..models import uit as uit_model
from ..utils import get_logger

REPO_ROOT = Path(__file__).resolve().parent.parent.parent
# the 538-row merged AudioSet+keywords index ships as package data; the
# repo-level datasets/ copy is used if present (both are identical)
LABEL_CSV = Path(__file__).resolve().parent.parent / "data" / "merged_class_label_indices.csv"
CACHE_DIR = Path(os.environ.get("UIT_MOBILE_TPU_CACHE", Path.home() / ".cache" / "uit_mobile_tpu"))

log = get_logger()


def load_label_map(path=None) -> dict[int, str]:
    import csv

    if path is None:
        repo_csv = REPO_ROOT / "datasets" / "merged_class_label_indices.csv"
        path = repo_csv if repo_csv.exists() else LABEL_CSV
    with open(path) as f:
        return {int(r["index"]): r["display_name"] for r in csv.DictReader(f)}


def infer_uit_config_from_state_dict(sd: dict, **overrides):
    """Recover a UITConfig from a raw torch state_dict's shapes.

    embed_dim <- patch_embed.proj.weight[0]; depth <- max blocks.N;
    attention type <- qkv out-features vs 3*D; outputdim <- outputlayer.1;
    mlp_ratio <- fc1 hidden / D. num_heads/act/target_length are not
    recoverable from shapes — defaults match every published checkpoint
    (2 heads, relu, 102) and can be overridden.
    """
    D = sd["patch_embed.proj.weight"].shape[0]
    depth = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    three_inner = sd["blocks.0.attn.qkv.weight"].shape[0]
    attention_type = "BNeckAttention" if three_inner < 3 * D else "Attention"
    outputdim = sd["outputlayer.1.weight"].shape[0]
    hidden = sd["blocks.0.mlp.fc1.weight"].shape[0]
    tg = sd["time_pos_embed"].shape[-1]
    # target_length is not exactly recoverable from shapes (any value in
    # [tg*16, tg*16+15] yields the same grid); special-case the two values
    # the reference ecosystem uses (102 fine-tuned, 1012 MAE default) and
    # warn otherwise — pass target_length explicitly for other checkpoints.
    if tg == 6:
        target_length = 102
    elif tg == 63:
        target_length = 1012
    else:
        target_length = tg * 16
        log.warning(
            f"inferred target_length={target_length} from grid size {tg}; "
            "the true value may be up to 15 frames larger — pass "
            "target_length explicitly if long-clip windows matter"
        )
    kwargs = dict(
        outputdim=outputdim,
        embed_dim=D,
        depth=depth,
        num_heads=2,
        mlp_ratio=hidden / D,
        pooling="mean",
        act="relu",
        attention_type=attention_type,
        init_bn="init_bn.1.weight" in sd,
        target_length=target_length,
        patch_size=sd["patch_embed.proj.weight"].shape[-1],
    )
    # act / num_heads / pooling leave no trace in the weight shapes: a raw
    # dump of a GELU audio_transformer_h128_* checkpoint would silently
    # build a ReLU model with no shape mismatch to catch it. Warn whenever
    # the caller did not pin them explicitly (the published uit_* dumps are
    # all relu/2-heads/mean, so the defaults are right for those).
    unverifiable = [k for k in ("act", "num_heads", "pooling") if k not in overrides]
    if unverifiable:
        log.warning(
            "raw state_dict carries no architecture record; assuming "
            + ", ".join(f"{k}={kwargs[k]!r}" for k in unverifiable)
            + " (correct for the published uit_xs/xxs/xxxs dumps). For the "
            "gelu audio_transformer_h128_* family pass act/num_heads/pooling "
            "explicitly — shape checks cannot catch a wrong activation."
        )
    kwargs.update(overrides)
    return models.UITConfig(**kwargs)


def _convert_torch_dump(path, **cfg_overrides):
    from ..ckpt.torch_convert import (
        load_torch_checkpoint,
        uit_params_from_torch_state_dict,
    )

    dump = load_torch_checkpoint(path)
    sd = dump["state_dict"]
    extra = {}
    if dump["config"]:
        c = dump["config"]
        cfg = models.get_model_config(
            c["model"], outputdim=c.get("num_classes", 537), **c.get("model_args", {})
        )
        extra["run_config"] = c  # the training config the dump embeds
    else:
        cfg = infer_uit_config_from_state_dict(sd, **cfg_overrides)
    params, state = uit_params_from_torch_state_dict(sd, cfg)
    return cfg, params, state, extra


def _best_score_in_name(path: Path) -> float:
    """Parse the trainer's ``best_model_<step>_mAP=<score>`` filename; fall
    back to -inf for names without a score (then file order decides)."""
    import re

    m = re.search(r"mAP=([0-9.]+)", path.name)
    if m:
        try:
            return float(m.group(1).rstrip("."))
        except ValueError:
            pass
    return float("-inf")


def _is_orbax_dir(p: Path) -> bool:
    """An orbax_io.save_orbax checkpoint directory (composite: tree+meta)."""
    return (p / "tree").is_dir() and (p / "meta").is_dir()


def _pick_checkpoint_in_dir(p: Path) -> Path:
    """Pick the deliverable checkpoint from an experiment directory:
    the averaged model first (the trainer's final artifact, reference
    run.py:385-397), else the best_* file with the HIGHEST mAP score in
    its name (not lexicographic order), else any checkpoint."""
    if (p / "averaged.npz").exists():
        return p / "averaged.npz"
    best = sorted(p.glob("best_*.npz"), key=_best_score_in_name)
    if best:
        return best[-1]
    if (p / "averaged.pt").exists():
        return p / "averaged.pt"
    best_pt = sorted(p.glob("best*.pt"), key=_best_score_in_name)
    if best_pt:
        return best_pt[-1]
    for pattern in ("*.npz", "*.pt"):
        hits = sorted(p.glob(pattern))
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no checkpoint found under {p}")


def resolve_model(spec: str, return_extra: bool = False, **cfg_overrides):
    """Resolve a model spec -> (cfg, params, state) [+ extra dict].

    Accepted specs (superset of reference inference.py:35-48):
    - a pretrained name (uit_xs/uit_xxs/uit_xxxs): looks for a converted
      native checkpoint ``checkpoints/<name>.npz`` (or $UIT_MOBILE_TPU_CACHE),
      then a torch dump ``checkpoints/<name>*.pt``, then tries the zenodo
      URL (fails cleanly when offline);
    - a native ``.npz`` checkpoint path;
    - a torch ``.pt`` checkpoint path (raw state_dict or trainer dump);
    - an experiment directory (averaged.npz first, then highest-score
      best_* — see _pick_checkpoint_in_dir).

    With ``return_extra=True`` a 4th element is returned: the checkpoint's
    sidecar metadata (includes ``run_config`` — the training config — for
    trainer-produced checkpoints and reference trainer dumps; empty for raw
    state_dicts). Evaluation uses it for config-driven behavior like the
    ``basename`` manifest flag (reference evaluate.py:200-201).

    A comma-joined spec (``a.npz,b.npz,...``) resolves an ENSEMBLE:
    params/state come back as equal-length lists (configs must match
    exactly), which ops.pipeline.make_forward_fn turns into a single
    vmapped program averaging the member probabilities — accepted by
    every surface that builds forwards through the pipeline policy:
    tagging service, streaming sessions, framewise /events, evaluation,
    export, and the inference CLI.
    """
    if "," in spec:
        parts = [s.strip() for s in spec.split(",") if s.strip()]
        if len(parts) < 2:
            raise ValueError(f"ensemble spec needs >=2 checkpoints: {spec!r}")
        resolved = [_resolve_model(s, **cfg_overrides) for s in parts]
        cfg0 = resolved[0][0]
        for part, (c, _, _, _) in zip(parts[1:], resolved[1:]):
            if c != cfg0:
                raise ValueError(
                    f"ensemble members must share one model config: "
                    f"{parts[0]!r} vs {part!r} differ ({cfg0} != {c})"
                )
        out = (cfg0, [r[1] for r in resolved], [r[2] for r in resolved],
               {**(resolved[0][3] or {}), "ensemble": len(parts)})
        return out if return_extra else out[:3]
    out = _resolve_model(spec, **cfg_overrides)
    return out if return_extra else out[:3]


def _resolve_model(spec: str, **cfg_overrides):
    from ..ckpt.io import load_checkpoint

    if spec.startswith(("http://", "https://")):
        # URL spec (e.g. the shipped configs' zenodo 'pretrained:' keys):
        # look for a local copy by filename first, then download.
        from urllib.parse import urlparse

        fname = Path(urlparse(spec).path).name  # strips ?download=1
        for root in (REPO_ROOT / "checkpoints", CACHE_DIR):
            local = root / fname
            if local.exists():
                log.info(f"using local copy {local} for {spec}")
                return _resolve_model(str(local), **cfg_overrides)
        dest = CACHE_DIR / fname
        try:
            import urllib.request

            CACHE_DIR.mkdir(parents=True, exist_ok=True)
            log.info(f"downloading {spec} -> {dest}")
            urllib.request.urlretrieve(spec, dest)
        except Exception as e:
            raise FileNotFoundError(
                f"cannot fetch {spec} ({e}); on offline hosts place the file "
                f"at checkpoints/{fname} or {CACHE_DIR / fname}"
            ) from e
        return _resolve_model(str(dest), **cfg_overrides)

    p = Path(spec)
    if spec in models.PRETRAINED_CHECKPOINTS:
        entry = models.PRETRAINED_CHECKPOINTS[spec]
        for root in (REPO_ROOT / "checkpoints", CACHE_DIR):
            npz = root / f"{spec}.npz"
            if npz.exists():
                params, state, cfg, extra = load_checkpoint(npz)
                if cfg is None:
                    cfg = entry["factory"](**entry["model_kwargs"])
                return cfg, params, state, extra
            hits = sorted(root.glob(f"{spec}*.pt")) if root.exists() else []
            if hits:
                return _convert_torch_dump(hits[0], **cfg_overrides)
        # last resort: fetch the published dump (requires egress)
        url = entry["url"]
        dest = CACHE_DIR / f"{spec}.pt"
        try:
            import urllib.request

            CACHE_DIR.mkdir(parents=True, exist_ok=True)
            log.info(f"downloading {url} -> {dest}")
            urllib.request.urlretrieve(url, dest)
            return _convert_torch_dump(dest, **cfg_overrides)
        except Exception as e:
            raise FileNotFoundError(
                f"no local checkpoint for {spec!r} (looked in "
                f"{REPO_ROOT / 'checkpoints'} and {CACHE_DIR}) and download "
                f"failed ({e}). Place the zenodo dump at "
                f"checkpoints/{spec}.pt or a converted checkpoints/{spec}.npz"
            ) from e
    if p.is_dir():
        if _is_orbax_dir(p):
            from ..ckpt.orbax_io import load_orbax

            params, state, cfg, extra = load_orbax(p)
            assert cfg is not None, f"orbax checkpoint {p} has no embedded config"
            return cfg, params, state, extra
        p = _pick_checkpoint_in_dir(p)
    if p.suffix == ".npz":
        params, state, cfg, extra = load_checkpoint(p)
        assert cfg is not None, f"{p} has no embedded config"
        return cfg, params, state, extra
    if p.suffix == ".pt":
        return _convert_torch_dump(p, **cfg_overrides)
    raise ValueError(f"cannot resolve model spec {spec!r}")
