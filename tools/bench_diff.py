#!/usr/bin/env python3
"""Bench-noise classifier — the NOTES r15 protocol note, mechanized.

Given two BENCH.json files (each with a per-query `queries` map), diff
them per query and classify the total-time disagreement:

  in-band       total gap within noise (< max(1s, 2% of baseline))
  uniform       broad small inflation across many queries, no small
                group explaining the gap — machine/sandbox contention
                (the mode the CPU-spin band probe cannot see: it
                follows long suite runs and inflates 80+ untouched
                sub-second queries by +0.05-0.6 s each)
  concentrated  a handful of queries explain most of the gap — a real
                regression candidate; those queries are listed
  mixed         neither signature dominates; eyeball the listing

The same thresholds run inside graft.Bench, which compares every run
against the previous committed BENCH.json at the repo root — keep the
two in lockstep (test: BenchDiffSpec runs BOTH sides on shared worked
examples, including the under-20-keys refusal).

With a third argument — the round's TOUCHED query names/prefixes,
comma-separated ("" = the round touched no queries) — the tool runs
the protocol note verbatim instead of the blind heuristic: a gap
concentrating in touched queries is a regression; inflation confined
to untouched queries is machine noise whatever its shape (heavy-tail
contention inflates long iterative queries super-linearly, which the
blind heuristic can only call "mixed").

Usage: python3 tools/bench_diff.py BASELINE.json CANDIDATE.json [touched]
"""
import json
import sys

MIN_COMMON_KEYS = 20       # below this, refuse: no verdict beats junk
TIMER_NOISE_SEC = 0.03     # per-query deltas below this are ignored
GAP_FLOOR_SEC = 1.0        # total gaps below this are in-band outright
GAP_FLOOR_FRAC = 0.02      # ... or below 2% of the baseline total
TOP_MOVERS = 5             # the "handful" whose share classifies
CONCENTRATED_SHARE = 0.6   # top movers explain >= 60% of the gap
UNIFORM_MAX_SHARE = 0.5    # ... or <= 50% with broad inflation
UNIFORM_MIN_BREADTH = 0.4  # >= 40% of queries inflated above noise


def classify(base: dict, cand: dict, touched=None) -> dict:
    keys = sorted(set(base) & set(cand))
    if len(keys) < MIN_COMMON_KEYS:
        # same refusal as Bench.classifyNoise: a verdict computed from a
        # handful of overlapping keys is statistically meaningless
        raise SystemExit(
            f"refusing verdict: only {len(keys)} common query keys "
            f"(< {MIN_COMMON_KEYS}) between the two files")
    deltas = {k: cand[k] - base[k] for k in keys}
    base_total = sum(base[k] for k in keys)
    cand_total = sum(cand[k] for k in keys)
    gap = cand_total - base_total
    movers = sorted(deltas.items(), key=lambda kv: -abs(kv[1]))[:TOP_MOVERS]
    out = {
        "n_queries": len(keys),
        "base_total_sec": round(base_total, 3),
        "cand_total_sec": round(cand_total, 3),
        "gap_sec": round(gap, 3),
        "top_movers": [{"query": k, "delta_sec": round(d, 3),
                        "base_sec": round(base[k], 3)} for k, d in movers],
    }
    floor = max(GAP_FLOOR_SEC, GAP_FLOOR_FRAC * base_total)
    if abs(gap) < floor:
        out["verdict"] = "in-band"
        out["detail"] = f"|gap| {abs(gap):.2f}s < floor {floor:.2f}s"
        return out
    sign = 1.0 if gap > 0 else -1.0
    inflated = [k for k in keys if sign * deltas[k] > TIMER_NOISE_SEC]
    breadth = len(inflated) / len(keys)
    top_share = sum(sign * d for _, d in movers
                    if sign * d > 0) / (sign * gap)
    out["breadth"] = round(breadth, 3)
    out["top5_share"] = round(top_share, 3)
    if touched is not None:
        pref = [t for t in touched if t]
        is_touched = {k: any(k == t or k.startswith(t) for t in pref)
                      for k in keys}
        t_share = sum(sign * deltas[k] for k in keys
                      if is_touched[k] and sign * deltas[k] > 0) / (sign * gap)
        out["touched_share"] = round(t_share, 3)
        if t_share >= 0.5:
            out["verdict"] = "concentrated-in-touched"
            out["detail"] = (f"touched queries explain {t_share:.0%} of the "
                             f"{gap:+.1f}s gap — regression in the round's "
                             "own family; profile top_movers")
        else:
            out["verdict"] = "untouched-inflation"
            out["detail"] = (f"touched queries explain only {t_share:.0%} of "
                             f"the {gap:+.1f}s gap; {len(inflated)}/"
                             f"{len(keys)} queries inflated — machine noise "
                             "per the protocol note (inflation on untouched "
                             "queries), not a plan change")
        return out
    if top_share >= CONCENTRATED_SHARE:
        out["verdict"] = "concentrated"
        out["detail"] = (f"top {TOP_MOVERS} movers explain "
                         f"{top_share:.0%} of the {gap:+.1f}s gap — "
                         "regression candidates listed in top_movers")
    elif breadth >= UNIFORM_MIN_BREADTH and top_share <= UNIFORM_MAX_SHARE:
        out["verdict"] = "uniform"
        out["detail"] = (f"{len(inflated)}/{len(keys)} queries moved "
                         f"{'up' if sign > 0 else 'down'} > "
                         f"{TIMER_NOISE_SEC}s but the top {TOP_MOVERS} "
                         f"explain only {top_share:.0%} of the gap — "
                         "machine noise, not a plan change")
    else:
        out["verdict"] = "mixed"
        out["detail"] = (f"breadth {breadth:.0%}, top-{TOP_MOVERS} share "
                         f"{top_share:.0%} — neither signature dominates")
    return out


def load_queries(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    q = d.get("queries") or (d.get("parsed") or {}).get("queries")
    if not q:
        raise SystemExit(
            f"{path}: no per-query map — need a FULL BENCH.json "
            "(the driver's compact artifact omits queries)")
    return {k: float(v) for k, v in q.items()}


if __name__ == "__main__":
    if len(sys.argv) not in (3, 4):
        raise SystemExit(__doc__)
    touched = sys.argv[3].split(",") if len(sys.argv) == 4 else None
    result = classify(load_queries(sys.argv[1]), load_queries(sys.argv[2]),
                      touched)
    print(json.dumps(result, indent=1))
