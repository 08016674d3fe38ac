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


def char_shingles(text: str, k: int = 5) -> set[int]:
    """Set of 64-bit hashes of the k-character shingles of ``text``."""
    if len(text) < k:
        return {stable_hash64(text)} if text else set()
    return {stable_hash64(text[i : i + k]) for i in range(len(text) - k + 1)}


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


def minhash_signature(shingle_hashes: set[int], num_perm: int = 128,
                      seed: int = 42) -> np.ndarray:
    """MinHash signature via multiply-shift hashing mod 2^64."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    if not shingle_hashes:
        return np.full(num_perm, _MAX64, dtype=np.uint64)
    x = np.fromiter(shingle_hashes, dtype=np.uint64, count=len(shingle_hashes))
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
    """Charikar SimHash over token unigrams with unit weights."""
    if not tokens:
        return 0
    acc = np.zeros(bits, dtype=np.int64)
    for tok in tokens:
        h = stable_hash64(tok)
        for i in range(bits):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MAX64).count("1")
