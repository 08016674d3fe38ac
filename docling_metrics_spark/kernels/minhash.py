"""Fingerprinting kernels for large-scale dedup: shingles, MinHash, SimHash.

Published algorithms (Broder 1997 resemblance/MinHash; Charikar 2002
SimHash). Pure Python/numpy; deterministic (fixed hash constants, no
process-salted ``hash()``). These back the dedup operators in
``operators/dedup.py``; at cluster scale the per-doc signature computation
is an Arrow UDF and the candidate generation is a band-bucket shuffle join.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAX64 = (1 << 64) - 1


def stable_hash64(data: str | bytes) -> int:
    """Deterministic 64-bit hash (blake2b-based; process-independent)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return struct.unpack("<Q", hashlib.blake2b(data, digest_size=8).digest())[0]


def stable_hash32(data: str | bytes) -> int:
    """Deterministic 32-bit hash (blake2b-based; process-independent)."""
    if isinstance(data, str):
        data = data.encode("utf-8", "surrogatepass")
    return struct.unpack("<I", hashlib.blake2b(data, digest_size=4).digest())[0]


def _splitmix64(h: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (Steele et al.) — avalanche mixing."""
    with np.errstate(over="ignore"):
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


_POLY_BASE = np.uint64(1099511628211)  # FNV-64 prime as polynomial base


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Unique 64-bit hashes of the k-byte shingles of ``text``, fully
    vectorized: sliding windows → polynomial hash (uint64 wraparound) →
    splitmix64 avalanche. ~50× faster than per-shingle blake2b, which
    dominated the MinHash signature UDF."""
    data = np.frombuffer(
        text.encode("utf-8", "surrogatepass"), dtype=np.uint8
    ).astype(np.uint64)
    if data.size == 0:
        return np.empty(0, dtype=np.uint64)
    k = min(k, data.size)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[-1] = 1
        for i in range(k - 2, -1, -1):
            powers[i] = powers[i + 1] * _POLY_BASE
        h = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(_splitmix64(h))


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of 64-bit hashes of the k-character shingles of ``text``."""
    return set(map(int, char_shingle_hashes(text, k)))


def word_ngrams(tokens: list[str], n: int = 3) -> set[tuple[str, ...]]:
    if len(tokens) < n:
        return {tuple(tokens)} if tokens else set()
    return {tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


def _perm_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    # Multiply-shift family (Dietzfelbinger et al.): h_i(x) = a_i*x + b_i
    # mod 2^64 with odd a_i — wraps naturally in uint64, mixes well, and
    # vectorizes exactly (no arbitrary-precision math).
    a = rng.randint(0, _MAX64, size=num_perm, dtype=np.uint64) | np.uint64(1)
    b = rng.randint(0, _MAX64, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(shingle_hashes: "set[int] | np.ndarray",
                      num_perm: int = 128, seed: int = 42) -> np.ndarray:
    """MinHash signature via multiply-shift hashing mod 2^64."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if isinstance(shingle_hashes, np.ndarray):
        x = shingle_hashes.astype(np.uint64, copy=False)
    elif shingle_hashes:
        x = np.fromiter(shingle_hashes, dtype=np.uint64, count=len(shingle_hashes))
    else:
        x = np.empty(0, dtype=np.uint64)
    if x.size == 0:
        return np.full(num_perm, _MAX64, dtype=np.uint64)
    # (a*x + b) mod 2^64 via natural uint64 wraparound (multiply-shift family).
    with np.errstate(over="ignore"):
        ax = x[:, None] * a[None, :] + b[None, :]
    return np.min(ax, axis=0)


def minhash_bands(signature: np.ndarray, num_bands: int = 32) -> list[int]:
    """LSH band keys: hash of each band's slice of the signature."""
    rows = len(signature) // num_bands
    keys = []
    for band in range(num_bands):
        chunk = signature[band * rows : (band + 1) * rows].tobytes()
        keys.append(stable_hash64(struct.pack("<I", band) + chunk))
    return keys


def minhash_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def simhash(tokens: list[str], bits: int = 64) -> int:
    """Charikar SimHash over token unigrams with unit weights (vectorized:
    the per-token per-bit Python loop was the SimHash UDF's hot path)."""
    if not tokens:
        return 0
    hs = np.fromiter(
        (stable_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    shifts = np.arange(bits, dtype=np.uint64)[None, :]
    bitmat = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    acc = (2 * bitmat - 1).sum(axis=0)
    out = 0
    for i in np.nonzero(acc > 0)[0]:
        out |= 1 << int(i)
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MAX64).count("1")
