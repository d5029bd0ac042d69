"""Functional torchaudio.transforms shim (torch-only).

Implements just enough of MelSpectrogram/Resample for the reference tool's
neural path to run on hosts without torchaudio: torch.stft + an HTK mel
filterbank (matching torchaudio defaults: power=2, center reflect-pad,
normalized='window' semantics when normalized=True) and polyphase resampling.
"""

import math

import torch


def _hz_to_mel(f):
    return 2595.0 * math.log10(1.0 + f / 700.0)


def _mel_to_hz(m):
    return 700.0 * (10.0 ** (m / 2595.0) - 1.0)


def _mel_fbanks(n_freqs, f_min, f_max, n_mels, sample_rate):
    import torch as t

    all_freqs = t.linspace(0, sample_rate // 2, n_freqs)
    m_pts = t.linspace(_hz_to_mel(f_min), _hz_to_mel(f_max), n_mels + 2)
    f_pts = t.tensor([_mel_to_hz(float(m)) for m in m_pts])
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return t.clamp(t.min(down, up), min=0.0)


class MelSpectrogram(torch.nn.Module):
    def __init__(self, sample_rate=16000, n_fft=400, hop_length=None,
                 n_mels=128, normalized=False, f_min=0.0, f_max=None,
                 power=2.0, **_kwargs):
        super().__init__()
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.hop_length = hop_length or n_fft // 2
        self.n_mels = n_mels
        self.normalized = normalized
        self.power = power
        f_max = f_max or sample_rate / 2.0
        self.register_buffer(
            "fb", _mel_fbanks(n_fft // 2 + 1, f_min, f_max, n_mels,
                              sample_rate))
        self.register_buffer("window", torch.hann_window(n_fft))

    def forward(self, waveform):
        squeeze = waveform.dim() == 1
        if squeeze:
            waveform = waveform.unsqueeze(0)
        spec = torch.stft(waveform, n_fft=self.n_fft,
                          hop_length=self.hop_length, window=self.window,
                          center=True, pad_mode="reflect",
                          return_complex=True)
        mag = spec.abs() ** self.power
        if self.normalized:
            mag = mag / self.window.pow(2).sum()
        mel = torch.matmul(self.fb.T, mag)
        return mel.squeeze(0) if squeeze else mel


class Resample(torch.nn.Module):
    def __init__(self, orig_freq=16000, new_freq=16000, **_kwargs):
        super().__init__()
        self.orig_freq = int(orig_freq)
        self.new_freq = int(new_freq)

    def forward(self, waveform):
        if self.orig_freq == self.new_freq:
            return waveform
        from scipy.signal import resample_poly

        g = math.gcd(self.new_freq, self.orig_freq)
        up, down = self.new_freq // g, self.orig_freq // g
        out = resample_poly(waveform.detach().cpu().numpy(), up, down,
                            axis=-1, window=("kaiser", 5.0))
        return torch.as_tensor(out, dtype=waveform.dtype)


def __getattr__(name):
    class _Unavailable:
        def __init__(self, *a, **k):
            raise RuntimeError(f"torchaudio.transforms.{name} unavailable (shim)")

    return _Unavailable
