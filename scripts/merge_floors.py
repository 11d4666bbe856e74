#!/usr/bin/env python3
"""Merge a dual-mode Bench sweep (bench_full.json shape) into
BASELINE.json as per-mode floors.

Usage: python3 scripts/merge_floors.py <sweep.json> [<iso.json> ...]

- count-mode floors: elementwise min of the existing floors (r7 legacy
  single-mode floors seed the count side — Bench has always timed
  .count() there), the sweep's count dict, and any isolated-run dicts.
- hashed-mode floors: elementwise min of existing hashed floors and the
  sweep's hashed dict. Never compared against count floors — that is
  the r8 mode-mismatch class the dual-mode bench removed.
"""
import json
import sys


def emin(dst: dict, src: dict) -> None:
    for k, v in src.items():
        if isinstance(v, (int, float)):
            dst[k] = min(dst[k], v) if k in dst else v


def main() -> None:
    base = json.load(open("BASELINE.json"))
    sweep = json.load(open(sys.argv[1]))

    r9 = base.setdefault("r9_dual_mode", {
        "sf": "0.1",
        "mode": "local[32], shuffle.partitions=32",
        "note": ("per-mode floors: count = .count() timing (seeded from the "
                 "r7 single-mode floors, same semantics), hashed = full-column-"
                 "evaluation timing (started fresh in r9 — no comparable "
                 "earlier hashed floors exist). Compare driver rounds "
                 "mode-to-mode ONLY; min-of-N per mode per sweep."),
        "floors_count": {},
        "floors_hashed": {},
    })
    # seed count floors from the legacy r7 floors once
    if not r9["floors_count"] and "r7_clean_sweep" in base:
        emin(r9["floors_count"], base["r7_clean_sweep"].get("per_query_floors_s", {}))

    emin(r9["floors_count"], sweep.get("queries", {}))
    emin(r9["floors_hashed"], sweep.get("hashed", {}).get("queries", {}))
    for iso_path in sys.argv[2:]:
        iso = json.load(open(iso_path))
        emin(r9["floors_count"], iso.get("queries", {}))

    r9["floor_sum_count"] = round(sum(r9["floors_count"].values()), 1)
    r9["floor_sum_hashed"] = round(sum(r9["floors_hashed"].values()), 1)
    json.dump(base, open("BASELINE.json", "w"), indent=1)
    print(f"count floors: {len(r9['floors_count'])} entries, "
          f"sum {r9['floor_sum_count']}s; hashed floors: "
          f"{len(r9['floors_hashed'])} entries, sum {r9['floor_sum_hashed']}s")


if __name__ == "__main__":
    main()
