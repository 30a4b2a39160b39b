"""Generate committed golden tensors for frontend parity tests.

Uses torch.stft (PyTorch's independent C++ FFT path — the same core that
torchaudio.transforms.MelSpectrogram calls) to produce reference power
spectrograms and log-mel outputs with torchaudio-0.13 semantics:
  Spectrogram(center=True, reflect pad, periodic hann, power=2, norm off)
  -> matmul with an HTK norm=None filterbank
  -> AmplitudeToDB(power, top_db=120) with torch 3-D global-max packing.

The mel filterbank formula is re-implemented here in float64->float32 numpy
following the published melscale_fbanks algorithm; the STFT itself is a
genuinely independent implementation, so agreement between these goldens and
the JAX frontend validates framing/window/FFT numerics end to end.

Run from repo root:  python tools/gen_goldens.py
"""

import sys
from pathlib import Path

import numpy as np
import torch

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from uit_mobile_tpu.data.audio_io import read_wav  # noqa: E402


def melscale_fbanks_htk(n_freqs=257, n_mels=64, sample_rate=16000, f_min=0.0, f_max=8000.0):
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs).astype(np.float32)
    m_min = 2595.0 * np.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * np.log10(1.0 + f_max / 700.0)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = (700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)).astype(np.float32)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def torch_power_spec(wav: torch.Tensor, n_fft=512, hop=160, win=512) -> torch.Tensor:
    window = torch.hann_window(win, periodic=True)
    spec = torch.stft(
        wav, n_fft=n_fft, hop_length=hop, win_length=win, window=window,
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    return spec.real ** 2 + spec.imag ** 2  # (B, F, TT)


def amplitude_to_db_torch(x: torch.Tensor, top_db=120.0) -> torch.Tensor:
    # torchaudio.functional.amplitude_to_DB with stype='power', ref=1.0
    x_db = 10.0 * torch.log10(torch.clamp(x, min=1e-10))
    shape = x_db.size()
    packed_channels = shape[-3] if x_db.dim() > 2 else 1
    x_db = x_db.reshape(-1, packed_channels, shape[-2], shape[-1])
    x_db = torch.max(
        x_db, (x_db.amax(dim=(-3, -2, -1)) - top_db).view(-1, 1, 1, 1)
    )
    return x_db.reshape(shape)


def main():
    out = REPO / "tests" / "goldens"
    out.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    cases = {}
    # Case 1: the GSC keyword sample (exactly 16000 samples).
    wav, sr = read_wav(REPO / "samples" / "85b877b5_nohash_0.wav")
    assert sr == 16000
    cases["gsc_sample"] = wav[0][None, :]  # (1, 16000)

    # Case 2: batch of 3 random 1s clips (tests batch-global top_db coupling).
    cases["rand_batch"] = rng.standard_normal((3, 16000)).astype(np.float32) * 0.1

    # Case 3: a 2.5s clip (long-clip framing) + a loud clip to engage top_db.
    long_clip = rng.standard_normal((1, 40000)).astype(np.float32) * 0.05
    long_clip[0, 5000:5050] = 0.99  # transient to force a high max
    cases["long_loud"] = long_clip

    # Case 4: silence (exercises the amin=1e-10 clamp exactly).
    cases["silence"] = np.zeros((1, 16000), dtype=np.float32)

    fb = melscale_fbanks_htk()
    blobs = {"mel_fb": fb}
    for name, w in cases.items():
        t = torch.from_numpy(w)
        power = torch_power_spec(t)                       # (B, F, TT)
        mel = torch.matmul(power.transpose(-1, -2), torch.from_numpy(fb)).transpose(-1, -2)
        logmel = amplitude_to_db_torch(mel)
        blobs[f"{name}_wav"] = w
        blobs[f"{name}_power"] = power.numpy()
        blobs[f"{name}_logmel"] = logmel.numpy()

    np.savez_compressed(out / "frontend_golden.npz", **blobs)
    print("wrote", out / "frontend_golden.npz")
    for k, v in blobs.items():
        print(f"  {k}: {v.shape} {v.dtype}")


if __name__ == "__main__":
    main()
