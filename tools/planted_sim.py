#!/usr/bin/env python3
"""Design simulator for the planted clustered-embedding fixtures
(q124 and the r17 round-separating spec fixture).

Replicates the ENGINE's trained-IVF pipeline bit-for-bit in numpy:
 - the PlantedDimSql vector formula (integer hash -> float32),
 - md5-ordered corpus-sample centroid init (Similarity.md5Centroids),
 - per-round assignment argmax over round(cosine, 3) with min-c_id
   tiebreak (Similarity.assignCells),
 - per-cell elementwise means in exact arithmetic, rounded to 6 dp and
   cast to float32 (Similarity.lloydCentroids' DECIMAL(28,12) chain —
   python floats are exact for these sums' magnitudes),
 - the nprobe-limited probe search and recall@3 vs brute force
   (Similarity.ivfSearch at q124's dials).

Usage:
  tools/planted_sim.py            # report the shipped fixtures
  tools/planted_sim.py --scan     # grid-scan dials for the r17 law:
                                  #   sampled < r1 < r2 < 1.0
The r16 q124 fixture (spreadProbe=0.2, spreadRest=2.0, nClusters=8,
N=400) measures sampled 0.80 / trained 1.00 here, matching the shipped
record. The r17 spec fixture is chosen by --scan for STRICT per-round
monotonicity, so IvfIndexSpec can pin a law that fails if LloydRounds
silently degrades to 1.
"""
import argparse
import hashlib

import numpy as np


def h(a, d):
    return ((a * 1009 + d * 9176 + 17) % 1000) / 1000.0 - 0.5


def planted(n, n_clusters, spread_probe, spread_rest, n_probes, dim=16,
            center_gain=1.0):
    """The PlantedDimSql formula, generalized by the scan dials."""
    v = np.zeros((n, dim), dtype=np.float64)
    for i in range(n):
        s = spread_probe if i < n_probes else spread_rest
        for d in range(dim):
            v[i, d] = center_gain * h(i % n_clusters, d) + s * h(i + 1000, d)
    return v.astype(np.float32)


def md5_order(n):
    keys = [(hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(n)]
    return [i for _, i in sorted(keys)]


def round_half_up(x, nd):
    """The engines' round(·, nd): HALF_UP (away from zero on exact
    halves), NOT numpy's half-to-even — a .0005-boundary tie decided
    the banker's way would silently diverge from a gate fixture."""
    f = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * f + 0.5) / f


def cos3(a, b):
    """round(cosine, 3) between float32 row-sets a (n,dim) and b (k,dim),
    accumulated in float64 like the engine's decimal-exact path."""
    a64 = a.astype(np.float64)
    b64 = b.astype(np.float64)
    dp = a64 @ b64.T
    na = np.sqrt((a64 * a64).sum(axis=1))[:, None]
    nb = np.sqrt((b64 * b64).sum(axis=1))[None, :]
    return round_half_up(dp / (na * nb), 3)


def assign(emb, cent, cids):
    """argmax cell per vector: max csim, then MIN c_id (engine tiebreak:
    max_by(struct(csim, -c_id))). The engine's centroid ids are the
    SAMPLED VEC_IDS (md5Centroids keeps vec_id as c_id), so ties at
    round(·,3) break on the numeric vec_id, NOT the md5-rank — cent
    rows must arrive sorted by c_id for first-index argmax to match."""
    order = np.argsort(cids, kind="stable")
    c = cos3(emb, cent[order])
    # argmax returns the FIRST index of the max -> min c_id. exact.
    return np.array(cids)[order][c.argmax(axis=1)]


def lloyd(emb, k, rounds):
    order = md5_order(len(emb))
    cids = order[:k]  # centroid ids = the sampled vec_ids (engine-exact)
    cent = emb[cids].copy()
    for _ in range(rounds):
        a = assign(emb, cent, cids)
        new_c, new_ids = [], []
        for cid in cids:
            members = emb[a == cid]
            if len(members) == 0:
                continue  # cells that lose every member drop out
            m = members.astype(np.float64).mean(axis=0)
            new_c.append(round_half_up(m, 6).astype(np.float32))
            new_ids.append(cid)
        cent = np.array(new_c)
        cids = new_ids
    return cent, cids


def recall_at3(emb, cent, cids, nprobe, n_probes):
    """q124's shape: probes = vec_id < n_probes, nprobe cells, top-3."""
    a = assign(emb, cent, cids)
    order = np.argsort(cids, kind="stable")
    scids = np.array(cids)[order]
    csim = cos3(emb[:n_probes], cent[order])
    hits = 0
    total = 0
    sims_all = cos3(emb[:n_probes], emb)
    for p in range(n_probes):
        # truth: brute-force top-3 by (sim desc, vec_id asc), self excluded
        sims = sims_all[p].copy()
        sims[p] = -np.inf
        truth = sorted(range(len(emb)), key=lambda i: (-sims[i], i))[:3]
        # probe cells: nprobe best centroids by (csim desc, c_id asc)
        cells = set(scids[j] for j in
                    sorted(range(len(scids)),
                           key=lambda j: (-csim[p, j], scids[j]))[:nprobe])
        cand = [i for i in range(len(emb)) if a[i] in cells and i != p]
        got = sorted(cand, key=lambda i: (-sims[i], i))[:3]
        hits += len(set(got) & set(truth))
        total += 3
    return hits / total


def run(n, n_clusters, spread_probe, spread_rest, n_probes, rounds_max=3,
        k=8, nprobe=1, center_gain=1.0):
    emb = planted(n, n_clusters, spread_probe, spread_rest, n_probes,
                  center_gain=center_gain)
    out = []
    for r in range(rounds_max + 1):
        cent, cids = lloyd(emb, k, r)
        out.append(recall_at3(emb, cent, cids, nprobe, n_probes))
    return out  # [sampled, r1, r2, r3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan", action="store_true")
    args = ap.parse_args()

    print("shipped q124 fixture (N=400, clusters=8, spread 0.2/2.0, cg=1.0,"
          " 10 probes):")
    r = run(400, 8, 0.2, 2.0, 10)
    print(f"  recall@3 nprobe=1: sampled {r[0]:.3f}  r1 {r[1]:.3f}  "
          f"r2 {r[2]:.3f}  r3 {r[3]:.3f}")
    print("shipped round-separating fixture (RoundSepDimSql: N=300,"
          " clusters=9, spread 0.4/2.0, cg=0.45, 20 probes):")
    r = run(300, 9, 0.4, 2.0, 20, center_gain=0.45)
    print(f"  recall@3 nprobe=1: sampled {r[0]:.3f}  r1 {r[1]:.3f}  "
          f"r2 {r[2]:.3f}  r3 {r[3]:.3f}"
          + ("  [law holds]" if r[0] < r[1] < r[2] < 1.0 else "  [LAW BROKEN]"))

    if not args.scan:
        return
    print("\nscan for sampled < r1 < r2 < 1.0 around the shipped"
          " round-separating dials:")
    for n in (300, 400):
        for ncl in (8, 9, 10):
            for sp in (0.2, 0.4):
                for sr in (1.8, 2.0, 2.2):
                    for cg in (0.4, 0.45, 0.5):
                        r = run(n, ncl, sp, sr, 20, center_gain=cg)
                        strict = r[0] < r[1] < r[2] < 1.0
                        mark = " <== LAW HOLDS" if strict else ""
                        print(f"  N={n} cl={ncl} sp={sp} sr={sr} cg={cg}: "
                              f"{r[0]:.3f} {r[1]:.3f} {r[2]:.3f} {r[3]:.3f}"
                              f"{mark}")


if __name__ == "__main__":
    main()
