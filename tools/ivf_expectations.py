#!/usr/bin/env python3
"""Independent Python expectations for ann_ivf_cosine (r4) — completes
the oracle conversion: every harness entry then has a hard DuckDB row.

The IVF algorithm is SPECIFIED (SURVEY §8.9 / Similarity.scala doc):
deterministic spherical k-means — hash-selected sample (xxh64 of the
id's 8 LE bytes, pmod modulus), init = first numLists sample vectors in
ascending id order, fixed iteration count, chunked (2048) partial sums
merged in ascending chunk order, empty cells keep their centroid, ties
to the lowest list id; derived geometry numLists = min(sqrt-round(n),
sampleCap, n), nprobe = min(max(2, numLists/4), numLists); assignment
argmax dot on normalized vectors; probe = nprobe best lists ascending
by (-dot, list); exact cosine on candidates; rank by (cosine desc,
neighbor id asc), k = 5.

This file re-implements that spec in Python with IEEE-identical float
operation order, so the expectation is an independent derivation of the
same algorithm — it guards against implementation bugs (boxing, fold
order, Spark eval subtleties), which is what the oracle rows are for.
Keys: md5 of '%.9e' vector serialization (see ann_expectations.py).

Usage: python3 tools/ivf_expectations.py [sfdir ...]
"""
import csv
import math
import os
import sys

from ann_expectations import load, vkey, dot_of, norm_of
from hash_expectations import xxh64

SEED = 42


def spark_xxhash64_long(x):
    # Spark's xxhash64 on BIGINT == XXH64 of the value's 8 LE bytes
    return xxh64((x & ((1 << 64) - 1)).to_bytes(8, "little"), SEED)


def sample_selected(vid, modulus):
    # Replicates the engine's pmod(xxhash64(id), modulus) == 0 exactly
    # (ADVICE r4 #3): Spark's xxhash64 is a SIGNED 64-bit long and pmod
    # is the non-negative remainder of that signed value — the raw
    # unsigned `% modulus` diverges whenever modulus > 1 (latent at the
    # current SFs, where every corpus has <= 65536 vectors and
    # modulus == 1; real for any larger regeneration).
    h = spark_xxhash64_long(vid)
    signed = h - (1 << 64) if h >= (1 << 63) else h
    return ((signed % modulus) + modulus) % modulus == 0


def normalize(v):
    n = 0.0
    for x in v:
        n += x * x
    inv = 1.0 / math.sqrt(n) if n > 0 else 0.0
    return [x * inv for x in v]


def nearest(v, centroids):
    best, best_dot = 0, float("-inf")
    for li, c in enumerate(centroids):
        d = dot_of(v, c)
        if d > best_dot:
            best_dot, best = d, li
    return best


def ivf_params_for(n, sample_cap=65536):
    sqrt_n = max(4, int(math.floor(math.sqrt(n) + 0.5)))  # Scala math.round
    nl = min(n, sample_cap, sqrt_n)
    return nl, min(nl, max(2, nl // 4))


def train(sampled, num_lists, iters=10, chunk=2048):
    dim = len(sampled[0])
    centroids = [list(v) for v in sampled[:num_lists]]
    n_chunks = (len(sampled) + chunk - 1) // chunk
    for _ in range(iters):
        partials = []
        for ci in range(n_chunks):
            sums = [[0.0] * dim for _ in range(num_lists)]
            counts = [0] * num_lists
            for i in range(ci * chunk, min((ci + 1) * chunk, len(sampled))):
                v = sampled[i]
                li = nearest(v, centroids)
                s = sums[li]
                for d in range(dim):
                    s[d] += v[d]
                counts[li] += 1
            partials.append((sums, counts))
        sums = [[0.0] * dim for _ in range(num_lists)]
        counts = [0] * num_lists
        for ps, pc in partials:
            for li in range(num_lists):
                s, p = sums[li], ps[li]
                for d in range(dim):
                    s[d] += p[d]
                counts[li] += pc[li]
        for li in range(num_lists):
            if counts[li] > 0:
                centroids[li] = normalize(sums[li])
    return centroids


def main():
    sfdirs = sys.argv[1:] or [f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")]
    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "expected")
    rows = []
    for d in sfdirs:
        vecs = load(d)
        n = len(vecs)
        nl, np_ = ivf_params_for(n)
        modulus = max(1, n // 65536)
        sampled = [normalize(v) for vid, v in sorted(vecs)
                   if sample_selected(vid, modulus)][:65536]
        centroids = train(sampled, nl)
        byid = dict(vecs)
        norms = {vid: norm_of(v) for vid, v in vecs}
        keys = {vid: vkey(v) for vid, v in vecs}
        lists = {}
        for vid, v in vecs:
            lists.setdefault(nearest(normalize(v), centroids), []).append(vid)
        for qid in sorted(vid for vid, _ in vecs if vid < 10):
            qn = normalize(byid[qid])
            probe = sorted(((-dot_of(qn, c), li) for li, c in enumerate(centroids)))[:np_]
            cands = set()
            for _, li in probe:
                cands.update(lists.get(li, ()))
            cands.discard(qid)
            scored = sorted(
                ((dot_of(byid[qid], byid[c]) / (norms[qid] * norms[c]), c)
                 for c in cands),
                key=lambda t: (-t[0], t[1]))
            for rank, (cos, c) in enumerate(scored[:5], start=1):
                rows.append((keys[qid], keys[c], repr(cos), rank))
        print(f"{d}: n={n} numLists={nl} nprobe={np_} sample={len(sampled)}")
    with open(os.path.join(outdir, "ann_ivf_expectations.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["qkey", "nkey", "cosine", "rank"])
        w.writerows(rows)
    print(f"wrote {len(rows)} ivf rows")


if __name__ == "__main__":
    main()


# ---- two-level IVF (r4): shared residual codebook, cell = c1*k2 + c2 ----

def ivf2_params_for(n):
    # mirrors Similarity.ivfTwoLevelParamsFor: probe2 = k/2 (residual
    # axis) vs probe1 = k/4 since the r6 50M sweep (recall holds 1.0
    # by doubling residual probes at ~equal wall)
    q = max(2, math.ceil(n ** 0.25))
    k = min(4096, min(n, q))
    p1 = min(k, max(2, k // 4))
    p2 = min(k, max(2, k // 2))
    return k, k, p1, p2


def probe_lists(v, centroids, nprobe):
    dots = sorted(((-dot_of(v, c), li) for li, c in enumerate(centroids)))
    return [li for _, li in dots[:nprobe]]


def subtract(a, b):
    return [a[i] - b[i] for i in range(len(a))]


def two_level(sfdirs, outpath):
    rows = []
    for d in sfdirs:
        vecs = load(d)
        n = len(vecs)
        k1, k2, p1, p2 = ivf2_params_for(n)
        modulus = max(1, n // 65536)
        sampled = [normalize(v) for vid, v in sorted(vecs)
                   if sample_selected(vid, modulus)][:65536]
        coarse = train(sampled, k1)
        residuals = [normalize(subtract(v, coarse[nearest(v, coarse)])) for v in sampled]
        rescode = train(residuals, k2)
        byid = dict(vecs)
        norms = {vid: norm_of(v) for vid, v in vecs}
        keys = {vid: vkey(v) for vid, v in vecs}
        cells = {}
        for vid, v in vecs:
            q = normalize(v)
            ci = nearest(q, coarse)
            cell = ci * k2 + nearest(normalize(subtract(q, coarse[ci])), rescode)
            cells.setdefault(cell, []).append(vid)
        for qid in sorted(vid for vid, _ in vecs if vid < 10):
            q = normalize(byid[qid])
            cands = set()
            for ci in probe_lists(q, coarse, p1):
                r = normalize(subtract(q, coarse[ci]))
                for cj in probe_lists(r, rescode, p2):
                    cands.update(cells.get(ci * k2 + cj, ()))
            cands.discard(qid)
            scored = sorted(
                ((dot_of(byid[qid], byid[c]) / (norms[qid] * norms[c]), c)
                 for c in cands),
                key=lambda t: (-t[0], t[1]))
            for rank, (cos, c) in enumerate(scored[:5], start=1):
                rows.append((keys[qid], keys[c], repr(cos), rank))
        print(f"{d}: n={n} two-level k={k1}x{k2} probes={p1}x{p2}")
    with open(outpath, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["qkey", "nkey", "cosine", "rank"])
        w.writerows(rows)
    print(f"wrote {len(rows)} ivf2 rows")
