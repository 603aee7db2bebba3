"""Deterministic audio stand-in codec + feature DSP (pure numpy).

Same honesty contract as ``image/codec.py``: no libsndfile/ffmpeg in
this container, so the container format is a deterministic stand-in
(int16 PCM, zlib-compressed, self-describing header) — a real
deployment swaps ``decode``/``encode`` for soundfile/PyAV and keeps
every Ray-side stage unchanged. The FEATURES are real DSP though:
framed RFFT magnitudes pooled into log-spaced bands (a log-mel-like
spectrogram summary), computed with numpy only.
"""

from __future__ import annotations

import zlib

import numpy as np

_MAGIC = b"AUD0"


def synth_pcm(seed: int, n_samples: int, sample_rate: int = 16_000) -> np.ndarray:
    """Deterministic int16 mono PCM: a few seeded sinusoids + noise."""
    rng = np.random.default_rng(seed & 0xFFFFFFFF)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    sig = np.zeros(n_samples)
    for _ in range(3):
        f = rng.uniform(80.0, 4000.0)
        a = rng.uniform(0.1, 0.4)
        sig += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    sig += 0.02 * rng.standard_normal(n_samples)
    return np.clip(sig * 32767.0 / 1.5, -32768, 32767).astype(np.int16)


def encode(pcm: np.ndarray, sample_rate: int = 16_000) -> bytes:
    header = (_MAGIC + int(sample_rate).to_bytes(4, "little")
              + int(len(pcm)).to_bytes(4, "little"))
    return header + zlib.compress(np.ascontiguousarray(pcm).tobytes(), 6)


def decode(buf: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 PCM, sample_rate). Raises on unknown container magic."""
    if bytes(buf[:4]) != _MAGIC:
        raise NotImplementedError(
            "real audio containers (wav/mp3/flac) need a codec library not "
            "present in this container; only the deterministic stand-in "
            "format decodes here"
        )
    sr = int.from_bytes(buf[4:8], "little")
    n = int.from_bytes(buf[8:12], "little")
    pcm = np.frombuffer(zlib.decompress(bytes(buf[12:])), dtype=np.int16)
    if len(pcm) != n:
        raise ValueError(f"corrupt payload: {len(pcm)} samples != header {n}")
    return pcm, sr


def band_energies(pcm: np.ndarray, sample_rate: int, n_bands: int = 16,
                  frame: int = 1024, hop: int = 512) -> np.ndarray:
    """Log-spaced spectral band energies averaged over frames — a
    compact, deterministic audio embedding (real DSP: framed RFFT,
    magnitude pooling). Returns float32 (n_bands,)."""
    x = pcm.astype(np.float64) / 32768.0
    if len(x) < frame:
        x = np.pad(x, (0, frame - len(x)))
    n_frames = 1 + (len(x) - frame) // hop
    idx = (np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None])
    mags = np.abs(np.fft.rfft(x[idx] * np.hanning(frame)[None, :], axis=1))
    # log-spaced band edges over [2 bins, nyquist]; tiny frames can
    # collapse edges — every band slice is clamped INSIDE the bin range
    # (an out-of-range band is silent, 0.0 — never NaN from an empty
    # mean)
    nb = mags.shape[1]
    edges = np.unique(np.round(
        np.logspace(np.log10(2), np.log10(max(nb - 1, 3)), n_bands + 1)
    ).astype(np.int64))
    while len(edges) < n_bands + 1:
        edges = np.r_[edges, edges[-1] + 1]
    e = np.zeros(n_bands)
    for b in range(n_bands):
        lo = min(int(edges[b]), nb)
        hi = min(max(int(edges[b + 1]), lo + 1), nb)
        e[b] = (mags[:, lo:hi] ** 2).mean() if hi > lo else 0.0
    return np.log1p(e).astype(np.float32)


def audio_fingerprint(pcm: np.ndarray, sample_rate: int,
                      n_bands: int = 16, n_chunks: int = 4) -> int:
    """60-bit audio fingerprint in the Haitsma-Kalker (2002) family:
    split the signal into ``n_chunks`` temporal chunks, compute log
    band energies per chunk, and emit one bit per adjacent-band energy
    difference (E[b] > E[b-1]) — n_chunks * (n_bands - 1) = 60 bits.

    Properties that make it a dedup key: invariant to global gain (a
    monotone transform preserves adjacent-band ordering), and mild
    additive noise flips only the bits whose band pair was nearly
    tied. Near-duplicate audio = small Hamming distance; pair
    generation reuses the banded machinery
    (``dedup.simhash.fingerprint_band_pairs``) exactly like image
    pHash. Engine-only (content-dependent DSP, pytest-pinned — same
    convention as the other multimodal content floats)."""
    if n_chunks * (n_bands - 1) > 63:
        raise ValueError(
            f"audio_fingerprint emits n_chunks*(n_bands-1) = "
            f"{n_chunks * (n_bands - 1)} bits, which does not fit the "
            f"int64 fingerprint column; keep it <= 63")
    n = len(pcm)
    fp = 0
    bit = 0
    for q in range(n_chunks):
        seg = pcm[q * n // n_chunks: (q + 1) * n // n_chunks]
        e = band_energies(seg, sample_rate, n_bands)
        for b in range(1, n_bands):
            if e[b] > e[b - 1]:
                fp |= 1 << bit
            bit += 1
    return fp
