"""Analysis of sweep results — parity with the reference measurements/analysis.py.

Implements the reference's core derived metrics over the pkl dataframes
(analysis.py:57-123, 922-941): empirical-vs-theoretical FPR, bloom speedup
vs no-bloom baseline, cache/VMEM footprint classes, and the BRJ-superiority
fraction.  Table output as markdown; plots optional (matplotlib if present).

Usage: python measurements/analysis.py [pkl ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def add_fpr(df):
    """Empirical + theoretical FPR columns (reference add_fpr, analysis.py:57-67).

    fpr_theo = (1 - (1 - 1/m)^(k n))^k; empirical from the filtered count:
    survivors = true matches + FP * negatives.
    """
    import numpy as np

    sel = df["selectivity"].astype(float)
    true_matches = (df["s-size"] * sel).round()
    negatives = df["s-size"] - true_matches
    df["fpr_emp"] = (df["filtered"] - true_matches) / negatives
    df["fpr_theo"] = (1 - (1 - 1 / df["bloom_size"].astype(float))
                      ** (df["bloom_hashes"] * df["r_size"])) ** df["bloom_hashes"]
    df.loc[df["filtered"].isna(), ["fpr_emp", "fpr_theo"]] = np.nan
    return df


def add_speedup(df, baseline_col="nsec-per-tuple"):
    """Speedup vs the matching no-bloom row (reference add_speedup :74-91)."""
    base = df[df["bloom_filter"] == "no"].set_index(
        ["algorithm", "r_size", "s_size", "selectivity"])[baseline_col]

    def speed(row):
        key = (row["algorithm"], row["r_size"], row["s_size"],
               row["selectivity"])
        if key in base.index:
            return float(base.loc[key]) / row[baseline_col]
        return None

    df["speedup"] = df.apply(speed, axis=1)
    return df


def footprint_class(r_size: int, tuple_bytes: int = 8,
                    vmem_bytes: int = 128 << 20) -> str:
    """S/M/L working-set class vs VMEM (reference get_required_space:107-123
    classifies vs cache levels; VMEM plays that role here)."""
    ws = r_size * tuple_bytes
    if ws <= vmem_bytes // 8:
        return "S"
    if ws <= vmem_bytes:
        return "M"
    return "L"


def brj_superiority(df):
    """Fraction of configs where a bloom variant beats its no-bloom twin
    (reference brj_superiority, analysis.py:922-941)."""
    d = df.dropna(subset=["speedup"])
    if len(d) == 0:
        return float("nan")
    return float((d["speedup"] > 1.0).mean())


def analyze(path: str):
    import pandas as pd

    df = pd.read_pickle(path)
    if "bloom_size" in df and df["bloom_filter"].ne("no").any():
        df = add_fpr(df)
        df = add_speedup(df)
        sup = brj_superiority(df)
    else:
        sup = None
    df["footprint"] = df["r_size"].map(footprint_class)
    out = path.replace(".pkl", "_analysis.md")
    cols = [c for c in ("algorithm", "r_size", "s_size", "selectivity",
                        "bloom_filter", "bloom_hashes", "nsec-per-tuple",
                        "filtered-pct", "fpr_emp", "fpr_theo", "speedup",
                        "footprint", "results") if c in df.columns]
    with open(out, "w") as f:
        f.write(df[cols].to_markdown(index=False))
        if sup is not None:
            f.write(f"\n\nbloom-superiority fraction: {sup:.3f}\n")
    print(f"wrote {out}")
    return df


def cross_run_table():
    """Thesis cross-run summary (reference analysis.py cross_run:961-1005):
    one row per committed sweep — best config, throughput, prune rate."""
    import pandas as pd

    rows = []
    for name in sorted(os.listdir(DATA_DIR)):
        if not name.endswith(".pkl"):
            continue
        df = pd.read_pickle(os.path.join(DATA_DIR, name))
        if "nsec-per-tuple" not in df:
            continue
        best = df.loc[df["nsec-per-tuple"].idxmin()]
        rows.append({
            "sweep": name[:-4],
            "configs": len(df),
            "best ns/tuple": round(float(best["nsec-per-tuple"]), 3),
            "best config": " ".join(
                f"{k}={best[k]}" for k in ("algorithm", "bloom_filter",
                                           "bloom_hashes", "radix_bits",
                                           "devices", "passes")
                if k in best and best[k] not in (None, "no", 0, 1)),
            "results": int(best["results"]) if best["results"] else None,
        })
    out = pd.DataFrame(rows)
    path = os.path.join(DATA_DIR, "cross_run.md")
    with open(path, "w") as f:
        f.write(out.to_markdown(index=False))
    print(out.to_markdown(index=False))
    print(f"wrote {path}")
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cross":
        cross_run_table()
    else:
        paths = sys.argv[1:] or [os.path.join(DATA_DIR, p)
                                 for p in os.listdir(DATA_DIR)
                                 if p.endswith(".pkl")]
        for p in paths:
            analyze(p)
