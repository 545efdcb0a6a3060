"""Aggregate ShapeNet registration results into RRE/RTE threshold tables.

Flag-compatible with the reference's ``compute_metrics_shapenet.py``:
reads ``results-shapenet-seed{S}-{cat}-{n}-{p}.csv`` files and prints the
transposed threshold table.
"""

from __future__ import annotations

import argparse

import numpy as np
import pandas as pd


def metrics_row(df: pd.DataFrame, category: str) -> dict:
    n = len(df)
    row = {"category": category}
    for kind in ("sym", "ransac"):
        for deg in (5, 15, 45):
            row[f"rre_{deg:03d}_{kind}"] = (
                (df[f"rre_{kind}"] <= np.deg2rad(deg)).sum() / n
            )
        for thr in (0.02, 0.05, 0.10, 0.15):
            key = f"rte_{int(thr * 100):03d}_{kind}"
            row[key] = (df[f"rte_{kind}"] <= thr).sum() / n
    return row


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--categories", type=str, nargs="+", required=True)
    parser.add_argument("--n-models", type=int, default=100)
    parser.add_argument("--n-poses-per-model", type=int, default=1)
    parser.add_argument("--random-seed", type=int, default=0)
    args = parser.parse_args(argv)

    rows = []
    for category in args.categories:
        postfix = (
            f"shapenet-seed{args.random_seed}-{category}-"
            f"{args.n_models}-{args.n_poses_per_model}"
        )
        df = pd.read_csv(f"results-{postfix}.csv")
        rows.append(metrics_row(df, category))
    table = pd.DataFrame(rows)
    print(table.transpose())
    return table


if __name__ == "__main__":
    main()
