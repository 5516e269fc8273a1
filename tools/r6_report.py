#!/usr/bin/env python3
"""Summarize BENCH/r6_campaign.jsonl for the BASELINE.md round-6 section.

Prints: driver-shape best-of table, N->4N scaling efficiency, soak
phase walls + recall fields, cap drops, and the ivf2 probe sweep curve.
"""
import json, sys, collections

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/r6_campaign.jsonl"
recs = [json.loads(l) for l in open(path)]
ok = [r for r in recs if r.get("data")]
fail = [r for r in recs if not r.get("data")]
if fail:
    print("FAILED reps:", [r["tag"] for r in fail], "\n")

def q(r, k):
    return r["data"]["queries"].get(k)

drivers = [r for r in ok if r["tag"].startswith("driver")]
if drivers:
    print("== driver shape (300k docs, 32c) — per rep, best-of last ==")
    keys = ["index_build_s1", "index_build_s2", "queries_sequential",
            "queries_concurrent", "compact_50k_plus_10k", "store_bootstrap",
            "store_puts", "store_search_live", "store_compact",
            "store_search_compacted", "ann_ivf_1m", "ann_lsh_1m", "ann_ivf2_1m"]
    for k in keys:
        vals = [q(r, k) for r in drivers if q(r, k) is not None]
        if vals:
            print(f"  {k:28s} {['%.2f' % v for v in vals]}  best {min(vals):.2f}")
    for m in ("docs_per_sec", "qps_sequential", "qps_concurrent"):
        vals = [r["data"].get(m) for r in drivers if r["data"].get(m)]
        print(f"  {m:28s} {vals}  best {max(vals)}")
    sweeps = [r["data"].get("value") for r in drivers]
    print(f"  harness total (value)        {sweeps}  best {min(sweeps)}")

scale = collections.defaultdict(list)
for r in ok:
    if r["tag"].startswith("scale"):
        scale[r["cpus"]].append(r["data"])
if scale:
    print("\n== scaling (2M docs; best-of per cpus) ==")
    best = {}
    for c in sorted(scale):
        d = scale[c]
        best[c] = (max(x["docs_per_sec"] for x in d),
                   max(x["qps_sequential"] for x in d),
                   max(x["qps_concurrent"] for x in d),
                   min(x["queries"]["index_build"] for x in d))
        print(f"  {c:2d}c reps={len(d)} build={best[c][0]:.0f} docs/s "
              f"(ib {best[c][3]:.1f}s) qps_seq={best[c][1]} qps_conc={best[c][2]}")
    if 2 in best and 8 in best:
        print(f"  eff 2->8:  build {best[8][0]/best[2][0]/4:.2f}  conc-q {best[8][2]/best[2][2]/4:.2f}")
    if 8 in best and 32 in best:
        print(f"  eff 8->32: build {best[32][0]/best[8][0]/4:.2f}  conc-q {best[32][2]/best[8][2]/4:.2f}")

for r in ok:
    t = r["tag"]
    d = r["data"]
    if t.startswith(("dedup_soak", "store_soak", "embdedup", "ann_")):
        print(f"\n== {t} ==")
        for k, v in d["queries"].items():
            if k.startswith(("dedup_soak", "store_", "embdedup", "ann_", "ivf2_")):
                print(f"  {k:28s} {v}")
        for extra in ("dedup_soak", "emb_dedup_probe", "ann_recall", "cap_drops"):
            if extra in d:
                print(f"  {extra}: {json.dumps(d[extra])}")

ab = [r for r in ok if r["tag"].startswith("ab_")]
if ab:
    print("\n== build A/B (interleaved) ==")
    for r in ab:
        print(f"  {r['tag']:14s} s1={q(r,'index_build_s1')} s2={q(r,'index_build_s2')} "
              f"build={r['data']['docs_per_sec']:.0f} docs/s seq={r['data']['qps_sequential']}")
for r in ok:
    if r["tag"].startswith("store_ab"):
        print(f"\n== {r['tag']} ==")
        for k, v in r["data"]["queries"].items():
            if k.startswith("store_"):
                print(f"  {k:28s} {v}")
