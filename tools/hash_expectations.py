#!/usr/bin/env python3
"""Independent (non-Scala) re-implementation of the engine's hash
recurrences, for hard DuckDB oracles over the sketch-dedup entries
(VERDICT r3 next-round #4).

Everything here is derived from PUBLIC specifications only:
  - XXH64: the published xxHash algorithm (Cyan4973/xxHash spec) —
    written from the spec's constant table and round structure, NOT
    translated from src/main/scala (the point is an independent
    implementation whose agreement is evidence, not tautology).
  - tokenizer/stopwords/seed: SURVEY.md §8.2 / §8.3 (frozen spec).
  - simhash: Charikar 2002 (sign of per-bit tf-weighted sums).
  - minhash: min over shingles of xxh64("<perm>|<shingle>").
  - fingerprint: h = h*31 + xxh64(token), seed 1125899906842597.

Output: tools/expected/hash_expectations.csv keyed by md5(text) —
doc_id differs per SF dir but DuckDB's md5(text) joins the expectation
to whatever corpus the driver verifies against. All hash columns are
SIGNED int64 (two's complement) to match Spark LongType exactly.

Usage: python3 tools/hash_expectations.py [sfdir ...]
"""
import csv
import hashlib
import os
import re
import sys

import duckdb

M64 = (1 << 64) - 1

# ---- XXH64 from the published spec ------------------------------------

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc, inp):
    return (_rotl((acc + inp * P2) & M64, 31) * P1) & M64


def _merge_round(h, v):
    return ((h ^ _round(0, v)) * P1 + P4) & M64


def xxh64(data: bytes, seed: int) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M64
        v2 = (seed + P2) & M64
        v3 = seed & M64
        v4 = (seed - P1) & M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27) * P1 + P4) & M64
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * P1) & M64, 23) * P2 + P3) & M64
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * P5) & M64, 11) * P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * P2) & M64
    h ^= h >> 29
    h = (h * P3) & M64
    h ^= h >> 32
    return h


def signed64(x: int) -> int:
    x &= M64
    return x - (1 << 64) if x >= (1 << 63) else x


SEED = 42

STOPWORDS = {
    "a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
    "has", "he", "in", "is", "it", "its", "of", "on", "that", "the",
    "to", "was", "were", "will", "with", "this", "but", "they", "have",
    "had", "what", "when", "where", "who"}

_SPLIT = re.compile(r"[^a-z0-9]+")


def tokenize(text: str):
    """SURVEY §8.2: lowercase, split on non-[a-z0-9] runs, drop empty /
    >64-char / stopword tokens, order preserved."""
    return [t for t in _SPLIT.split(text.lower())
            if t and len(t) <= 64 and t not in STOPWORDS]


from functools import lru_cache


@lru_cache(maxsize=1 << 20)
def _cached_xxh(s: str) -> int:
    return xxh64(s.encode("utf-8"), SEED)


def simhash64(tokens) -> int:
    acc = [0] * 64
    for t in tokens:
        h = _cached_xxh(t)
        for b in range(64):
            acc[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return signed64(out)


def fingerprint(tokens) -> int:
    h = 1125899906842597
    for t in tokens:
        h = (h * 31 + _cached_xxh(t)) & M64
    return signed64(h)


def minhash_sig(tokens, n=3, num_perms=16):
    shingles = list({" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)})
    sig = []
    for p in range(num_perms):
        if not shingles:
            sig.append((1 << 63) - 1)  # Long.MaxValue for empty shingle sets
        else:
            # SIGNED min, matching Scala's Long ordering
            sig.append(min(signed64(_cached_xxh(f"{p}|{s}")) for s in shingles))
    return sig


def selftest():
    """xxh64 against the published test vectors (run: --selftest)."""
    vecs = [(b"", 0, 0xEF46DB3751D8E999),
            (b"a", 0, 0xD24EC4F1A98C6E5B),
            (b"abc", 0, 0x44BC2CF5AD770999),
            (b"Nobody inspects the spammish repetition", 0, 0xFBCEA83C8A378BF1)]
    for data, seed, exp in vecs:
        got = xxh64(data, seed)
        assert got == exp, f"xxh64({data!r}, {seed}) = {got:#x}, want {exp:#x}"
    print("xxh64 selftest: all public vectors OK")


def main():
    if sys.argv[1:] == ["--selftest"]:
        return selftest()
    sfdirs = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    con = duckdb.connect()
    texts = {}
    for d in sfdirs:
        for (text,) in con.execute(
                f"SELECT DISTINCT text FROM '{d}/documents.parquet'").fetchall():
            texts[hashlib.md5(text.encode("utf-8")).hexdigest()] = text
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "expected")
    os.makedirs(outdir, exist_ok=True)
    out = os.path.join(outdir, "hash_expectations.csv")
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["text_md5", "simhash", "fingerprint"] +
                   [f"sig{i}" for i in range(16)])
        for md5, text in sorted(texts.items()):
            toks = tokenize(text)
            w.writerow([md5, simhash64(toks), fingerprint(toks)] + minhash_sig(toks))
    print(f"wrote {out}: {len(texts)} distinct texts from {len(sfdirs)} dirs")


if __name__ == "__main__":
    main()
