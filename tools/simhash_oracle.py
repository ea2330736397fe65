"""Independent pure-Python oracle for the `dedup_simhash` key.

SimHash candidates have no SQL twin (DuckDB lacks Spark's xxhash64),
which previously left `dedup_simhash` with a weak rows-only check. But
the operator is fully deterministic — xxhash64(seed=42) over UTF-8
shingles, majority bit votes, pigeonhole block join — so this module
recomputes the ENTIRE expected candidate set from the parquet in pure
Python (spec-compliant XXH64, same shingle definition, same blocking)
and `tools/check.py` compares it value-for-value against the Spark
output. An independent reimplementation of the same spec is a stronger
falsifier than any similarity-based secondary assertion: a measured
attempt at "candidates ⊇ verified Jaccard@0.8 pairs" FAILS (hamming of
a 0.98-Jaccard pair ranges 0..10 on this corpus — SimHash approximates
cosine, and ~40-shingle docs give each bit vote high variance), so that
containment is NOT a sound contract and is not used.

Mirrors `excel_to_db_spark/operators/dedup.py` (`shingles`,
`simhash64`, `simhash_pairs`) and the registry call
`simhash_pairs(docs, max_hamming=3, keyset=shingles)`.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Spec-compliant XXH64 (the algorithm behind Spark's xxhash64,
    which uses seed 42 for column hashing)."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i + 32 <= n:
            for _ in range(1):
                v1 = (_rotl((v1 + int.from_bytes(data[i:i + 8], "little")
                             * _P2) & _M64, 31) * _P1) & _M64
                v2 = (_rotl((v2 + int.from_bytes(data[i + 8:i + 16], "little")
                             * _P2) & _M64, 31) * _P1) & _M64
                v3 = (_rotl((v3 + int.from_bytes(data[i + 16:i + 24], "little")
                             * _P2) & _M64, 31) * _P1) & _M64
                v4 = (_rotl((v4 + int.from_bytes(data[i + 24:i + 32], "little")
                             * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ ((_rotl((v * _P2) & _M64, 31) * _P1) & _M64))
                 * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl((int.from_bytes(data[i:i + 8], "little") * _P2) & _M64, 31)
             * _P1) & _M64
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i:i + 4], "little") * _P1)
                         & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def shingles(text: str, k: int = 3) -> list[str]:
    """Distinct k-gram shingles over the token sequence — mirrors
    operators/dedup.py shingles() including the len<k -> empty rule."""
    toks = (text or "").split(" ")
    if len(toks) < k:
        return []
    return sorted({" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)})


def simhash64_py(text: str) -> int:
    """Unsigned 64-bit SimHash, bit i = sign of the per-bit +-1 vote sum
    over xxhash64(shingle) — mirrors operators/dedup.py simhash64()."""
    votes = [0] * 64
    for s in shingles(text):
        h = xxh64(s.encode("utf-8"))
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = 0
    for i in range(64):
        if votes[i] > 0:
            fp |= 1 << i
    return fp


def expected_pairs(docs: list[tuple[int, str]], max_hamming: int = 3,
                   n_blocks: int = 4) -> set[tuple[int, int, int]]:
    """The exact candidate set simhash_pairs() must produce: pigeonhole
    chunk-equality candidates, true-hamming filtered, (d1, d2, hamming)
    with d1 < d2, distinct."""
    fps = {did: simhash64_py(text) for did, text in docs}
    bits_per = 64 // n_blocks
    buckets: dict[tuple[int, int], list[int]] = {}
    for did, fp in fps.items():
        for c in range(n_blocks):
            ck = (fp >> (c * bits_per)) & ((1 << bits_per) - 1)
            buckets.setdefault((c, ck), []).append(did)
    out: set[tuple[int, int, int]] = set()
    for ids in buckets.values():
        ids.sort()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = ids[i], ids[j]
                ham = bin(fps[a] ^ fps[b]).count("1")
                if ham <= max_hamming:
                    out.add((a, b, ham))
    return out
