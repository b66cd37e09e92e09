#!/usr/bin/env python
"""Scan-isolated A/B for the residual IVF-PQ ADC loop (VERDICT r11 ask #5).

The end-to-end scripts/residual_regime.py numbers are dominated by the
1,024-list k-means fit, whose wall time swings ±35% run-to-run on
identical code (direct leg measured 145.4 / 178.4 / 223.3 s across three
r12 runs) — too noisy to resolve a 10% scan difference. This bench
isolates exactly the part the ask targets: the per-Arrow-batch ADC scan,
on synthetic arrays at the regime geometry (200k rows, 1,024 lists,
m=8, 256 codes, 20 queries x 4 probes, 64 batches), with three
formulations:

- direct: one isin mask + one (rows, m) fancy-index per query (the
  non-residual path — the floor).
- per-pair loop (r11): one mask + one gather per (query, probed list) —
  the formulation the r11 verdict measured at ~35% over direct.
- flattened (r12): ONE (N_pairs_x_rows, m) fancy-indexed gather per
  batch — the shipped formulation (operators/pq.py scan).

All three produce identical per-query candidate scores (asserted).

Usage: python scripts/residual_scan_bench.py [n_rows] [n_lists]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_lists = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    m, n_codes, n_q, n_probe, n_batches = 8, 256, 20, 4, 64
    rng = np.random.RandomState(7)

    cent = rng.randint(0, n_lists, size=n_rows).astype(np.int64)
    codes = rng.randint(0, n_codes, size=(n_rows, m)).astype(np.int64)
    probe_lists = {qi: set(rng.choice(n_lists, n_probe, replace=False).tolist())
                   for qi in range(n_q)}
    lut = rng.rand(n_q, m, n_codes)  # direct LUTs
    # per-(query, list) residual LUTs + the r12 pair flattening
    pair_ids: dict = {}
    pair_q: list = []
    pair_luts: list = []
    for qi in range(n_q):
        for l in sorted(probe_lists[qi]):
            pair_ids.setdefault(l, []).append(len(pair_q))
            pair_q.append(qi)
            pair_luts.append(rng.rand(m, n_codes))
    pair_ids = {l: np.array(ps, dtype=np.int64) for l, ps in pair_ids.items()}
    pair_q_arr = np.array(pair_q, dtype=np.int64)
    lut_flat = np.stack(pair_luts)
    lut_res = {(pair_q[p], l): lut_flat[p]
               for l, ps in pair_ids.items() for p in ps}

    bounds = np.linspace(0, n_rows, n_batches + 1).astype(int)
    batches = [(cent[s:e], codes[s:e]) for s, e in zip(bounds[:-1], bounds[1:])]

    def run_direct():
        out = {}
        for bc, bk in batches:
            for qi in range(n_q):
                mask = np.isin(bc, list(probe_lists[qi]))
                if not mask.any():
                    continue
                d2 = lut[qi, np.arange(m), bk[mask]].sum(axis=1)
                out.setdefault(qi, []).append(d2)
        return {q: np.concatenate(v) for q, v in out.items()}

    def run_pair_loop():  # the r11 formulation
        out = {}
        for bc, bk in batches:
            for qi in range(n_q):
                parts = []
                for l in sorted(probe_lists[qi]):
                    lmask = bc == l
                    if not lmask.any():
                        continue
                    parts.append(
                        lut_res[(qi, l)][np.arange(m), bk[lmask]].sum(axis=1)
                    )
                if parts:
                    out.setdefault(qi, []).append(np.concatenate(parts))
        return {q: np.concatenate(v) for q, v in out.items()}

    def run_flattened():  # the shipped r12 formulation
        out = {}
        for bc, bk in batches:
            order = np.argsort(bc, kind="stable")
            cs = bc[order]
            uniq, starts = np.unique(cs, return_index=True)
            ends = np.append(starts[1:], len(cs))
            pc, rc = [], []
            for l, s, e in zip(uniq, starts, ends):
                ps = pair_ids.get(int(l))
                if ps is None:
                    continue
                ridx = order[s:e]
                pc.append(np.repeat(ps, len(ridx)))
                rc.append(np.tile(ridx, len(ps)))
            if not pc:
                continue
            p_arr = np.concatenate(pc)
            r_arr = np.concatenate(rc)
            sc = lut_flat[
                p_arr[:, None], np.arange(m)[None, :], bk[r_arr]
            ].sum(axis=1)
            q_arr = pair_q_arr[p_arr]
            qorder = np.argsort(q_arr, kind="stable")
            qs = q_arr[qorder]
            qu, qstarts = np.unique(qs, return_index=True)
            qends = np.append(qstarts[1:], len(qs))
            for qi, s2, e2 in zip(qu, qstarts, qends):
                out.setdefault(int(qi), []).append(sc[qorder[s2:e2]])
        return {q: np.concatenate(v) for q, v in out.items()}

    def best_of(fn, runs=5):
        best, res = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            res = fn()
            best = min(best, time.perf_counter() - t0)
        return best, res

    td, rd = best_of(run_direct)
    tp, rp = best_of(run_pair_loop)
    tf, rf = best_of(run_flattened)

    # NOTE: rp/rf order candidates by list (ascending) within a batch,
    # rd by row order — same multiset per (query, batch); the engine's
    # (d2, id) lexsort truncation is order-independent. Compare sorted.
    for qi in rp:
        assert np.allclose(np.sort(rp[qi]), np.sort(rf[qi]))
    print(f"# rows={n_rows} lists={n_lists} m={m} codes={n_codes} "
          f"queries={n_q} probes={n_probe} batches={n_batches}")
    print(f"direct scan (floor):      {td*1000:8.1f} ms")
    print(f"per-pair loop (r11):      {tp*1000:8.1f} ms  ({tp/td:.2f}x direct)")
    print(f"flattened gather (r12):   {tf*1000:8.1f} ms  ({tf/td:.2f}x direct)")


if __name__ == "__main__":
    main()
