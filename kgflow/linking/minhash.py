"""MinHash / LSH primitives for near-duplicate mention (and document)
blocking.

Standard construction (Broder 1997; Leskovec-Rajaraman-Ullman MMDS ch.3):
character k-shingles → H permutation-free minhashes ``h_i(x) = (a_i·x +
b_i) mod p`` over 64-bit shingle fingerprints → signature split into
``bands`` bands of ``rows`` rows; two strings collide in a band iff that
band of their signatures is identical, giving the familiar S-curve with
threshold ≈ ``(1/bands)^(1/rows)``.

All functions are deterministic (seeded) and vectorized with numpy; the
per-batch entry points are designed for ``map_batches`` fan-out to
``(band_id, band_hash, key)`` rows followed by a single ``groupby``
shuffle on the band hash — the reference has no counterpart (OpenUE does
no linking); this is a north-rule stage.
"""

from __future__ import annotations

import numpy as np

_P = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def fnv64(s: str) -> int:
    """Deterministic 64-bit FNV-1a string hash (stable across runs,
    unlike builtin hash())."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8"):
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def mix64(x: int) -> int:
    """splitmix64 finalizer: FNV-1a's low bits avalanche poorly (observed
    bias: ``fnv64(url) % 4`` hit only even classes) — any key used with a
    modulo (shards, salts, buckets) must go through this."""
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def shard_of(s: str, shards: int) -> int:
    return mix64(fnv64(s)) % shards


def mix64_np(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (uint64 in/out, wrapping)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def char_shingles(s: str, k: int = 3) -> np.ndarray:
    """64-bit fingerprints of the k-char shingles of ``s`` (padded so
    strings shorter than k still yield one shingle).

    ASCII fast path: all windows are FNV-1a-hashed at once with k
    vectorized passes over the byte array (identical output to the
    per-shingle loop, since for ASCII the k-char window IS the k-byte
    window). Non-ASCII strings take the exact per-shingle loop."""
    if len(s) < k:
        s = s + "\x00" * (k - len(s))
    if s.isascii():
        b = np.frombuffer(s.encode("ascii"), dtype=np.uint8).astype(np.uint64)
        n = len(b) - k + 1
        h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
        for j in range(k):
            h = (h ^ b[j : j + n]) * _FNV_PRIME
        return np.unique(h)
    out = np.empty(len(s) - k + 1, dtype=np.uint64)
    for i in range(len(s) - k + 1):
        out[i] = fnv64(s[i : i + k])
    return np.unique(out)


class MinHasher:
    def __init__(self, num_hashes: int = 64, seed: int = 42, shingle_k: int = 3):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, int(_P), size=num_hashes).astype(np.uint64)
        self.b = rng.randint(0, int(_P), size=num_hashes).astype(np.uint64)
        self.num_hashes = num_hashes
        self.k = shingle_k

    def signature(self, s: str) -> np.ndarray:
        x = char_shingles(s, self.k)  # [S]
        # (a*x + b) mod p, elementwise over [H, S]
        ax = (self.a[:, None] * x[None, :]) % _P
        hx = (ax + self.b[:, None]) % _P
        return hx.min(axis=1)  # [H]

    def band_hashes(self, s: str, bands: int, rows: int) -> np.ndarray:
        """One 64-bit hash per band of the signature."""
        sig = self.signature(s)[: bands * rows].reshape(bands, rows)
        # mix rows of each band into one value
        out = np.zeros(bands, dtype=np.uint64)
        for r in range(rows):
            out = (out * np.uint64(1099511628211) + sig[:, r]) % _P
        return out


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa = set(char_shingles(a, k).tolist())
    sb = set(char_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)
