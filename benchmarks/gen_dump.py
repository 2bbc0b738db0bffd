#!/usr/bin/env python
"""Deterministic synthetic GeoNames dump generator for the throughput
race (benchmarks/geonames_throughput.py vs benchmarks/reference_sim.js).

Layout matches the real dump the reference ingests (geonames.js:83-101):
``allCountries.txt`` with the 19 tab-separated GeoNames columns, plus
``admin1CodesASCII.txt`` / ``admin2Codes.txt`` (code, name, asciiname,
geonameid). Content is pure arithmetic off the row index — no RNG —
so the same N always produces byte-identical files and both racers
read literally the same bytes.

Distribution choices mirror the real dump's load profile: ~10% of rows
hit the NL/DE filter (the race measures the full scan either way),
feature codes cycle PPL/PPLA/ADM1/ADM2/STM (exercising the
longest-prefix type map and its misses), and admin code references
resolve for most rows with a deliberate miss share (exercising the
self-parent fallback).

Usage:
  python benchmarks/gen_dump.py /tmp/gnbench 1000000
"""

from __future__ import annotations

import os
import sys

COUNTRIES = ["NL", "DE", "FR", "ES", "IT", "PL", "SE", "NO", "PT", "BE",
             "AT", "CH", "DK", "FI", "GR", "IE", "CZ", "HU", "RO", "BG"]
FCODES = ["PPL", "PPLA", "PPLA2", "ADM1", "ADM2", "STM", "MT", "LK"]
N_ADMIN1_PER_CC = 12
N_ADMIN2_PER_A1 = 8


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gnbench"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "admin1CodesASCII.txt"), "w") as f:
        gid = 9_000_000
        for cc in COUNTRIES:
            for i in range(N_ADMIN1_PER_CC):
                code = f"{cc}.{i:02d}"
                f.write(f"{code}\tAdmin1 {code}\tAdmin1 {code}\t{gid}\n")
                gid += 1

    with open(os.path.join(out_dir, "admin2Codes.txt"), "w") as f:
        gid = 9_500_000
        for cc in COUNTRIES:
            for i in range(N_ADMIN1_PER_CC):
                for j in range(N_ADMIN2_PER_A1):
                    code = f"{cc}.{i:02d}.{j:03d}"
                    f.write(f"{code}\tAdmin2 {code}\tAdmin2 {code}\t{gid}\n")
                    gid += 1

    with open(os.path.join(out_dir, "allCountries.txt"), "w") as f:
        for r in range(n):
            cc = COUNTRIES[r % len(COUNTRIES)]
            fcode = FCODES[(r // 7) % len(FCODES)]
            # ~1/9 of admin1 references deliberately miss the table
            a1 = (r // 3) % (N_ADMIN1_PER_CC + 1)
            a2 = (r // 5) % (N_ADMIN2_PER_A1 + 1)
            lat = ((r * 7919) % 18000) / 100.0 - 90.0
            lon = ((r * 104729) % 36000) / 100.0 - 180.0
            f.write(
                "\t".join(
                    [
                        str(r + 1),
                        f"Place {r}",
                        f"Place {r}",
                        f"Alt{r}a,Alt{r}b",
                        f"{lat:.5f}",
                        f"{lon:.5f}",
                        "P" if fcode.startswith("PPL") else "A",
                        fcode,
                        cc,
                        "",
                        f"{a1:02d}",
                        f"{a2:03d}",
                        "",
                        "",
                        str((r * 37) % 1_000_000),
                        "",
                        str(r % 4000),
                        "Europe/Amsterdam",
                        "2025-01-01",
                    ]
                )
                + "\n"
            )
    print(f"wrote {n} rows to {out_dir}")


if __name__ == "__main__":
    main()
