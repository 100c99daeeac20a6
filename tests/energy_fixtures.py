"""Deterministic energy-domain CSV fixtures (FIXTURES.md §1/§1b).

Mirrors the reference dataset's shape: verbatim dirty headers (with unit
suffixes), dd-mm-yyyy dates, string-typed everything, and — in the dirty
variant — known defect counts for validation-path assertions.
"""

from __future__ import annotations

import csv
import random
from pathlib import Path

HEADERS = [
    "Home ID",
    "Appliance Type",
    "Energy Consumption (kWh)",
    "Time",
    "Date",
    "Outdoor Temperature (°C)",
    "Season",
    "Household Size",
]

APPLIANCES = [
    "Air Conditioning",
    "Computer",
    "Dishwasher",
    "Fridge",
    "Heater",
    "Lights",
    "Microwave",
    "Oven",
    "TV",
    "Washing Machine",
]


def gen_energy_rows(n: int, seed: int = 42) -> list[list[str]]:
    rng = random.Random(seed)
    rows = []
    for _ in range(n):
        day = rng.randint(1, 28)
        month = rng.randint(1, 6)
        rows.append(
            [
                str(rng.randint(1, 500)),
                rng.choice(APPLIANCES),
                f"{rng.uniform(0.1, 5.0):.2f}",
                f"{rng.randint(0, 23)}:{rng.randint(0, 59):02d}",
                f"{day:02d}-{month:02d}-2023",
                f"{rng.uniform(-10.0, 40.0):.1f}",
                rng.choice(["Winter", "Spring"]),
                str(rng.randint(1, 5)),
            ]
        )
    return rows


def write_clean_csv(path: Path, n: int = 500, seed: int = 42) -> None:
    rows = gen_energy_rows(n, seed)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADERS)
        w.writerows(rows)


def write_dirty_csv(path: Path, n: int = 500, seed: int = 43) -> dict[str, int]:
    """Inject known defect counts; returns expectations.

    - empty Home ID          -> dropped
    - empty Appliance Type   -> dropped
    - non-numeric energy     -> cast NULL -> dropped
    - non-numeric household  -> NULL but KEPT (not validated)
    """
    rows = gen_energy_rows(n, seed)
    n_home, n_appl, n_energy, n_house = 10, 10, 10, 10
    idx = iter(range(n))
    for _ in range(n_home):
        rows[next(idx)][0] = ""
    for _ in range(n_appl):
        rows[next(idx)][1] = ""
    for _ in range(n_energy):
        rows[next(idx)][2] = "n/a"
    for _ in range(n_house):
        rows[next(idx)][7] = "unknown"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADERS)
        w.writerows(rows)
    return {
        "total": n,
        "skipped": n_home + n_appl + n_energy,
        "valid": n - (n_home + n_appl + n_energy),
        "null_household_kept": n_house,
    }
