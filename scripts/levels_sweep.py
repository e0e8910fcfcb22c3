"""Sweep hier_levels candidates through the dense-scan-oracle quality gate.

Finds the cheapest cascade (fewest SDF probes) that still passes the
promotion gate (ops/selection_quality.py::gate) on the committed stress
scene — the prerequisite for promoting a faster default, per the round-3
rule recorded in config.py (hier_levels).  Probe counts:

  level0 (factor f0, keep k0):  (64/f0)^3 probes
  level i (factor fi, keep ki): k_{i-1} * (f_{i-1}/fi)^3 probes
  final:                        k_last * f_last^3 fine evals

Runs on CPU (the oracle is the exact dense 64^3 scan).  Robustness: the
gate must hold on EVERY seed in --seeds (default 3 scenes x batch 2 = 6
independent hand+object draws), not just the committed scene.

Usage:
    python scripts/levels_sweep.py                # default candidate matrix
    python scripts/levels_sweep.py --seeds 3 5 7 --levels "((8,160),(4,256),(2,512))"
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

from hoisdf_tpu.ops.selection_quality import (  # noqa: E402
    gate,
    selection_quality,
    stress_geometry,
)

DEFAULT_CANDIDATES = (
    ((4, 256), (2, 512)),          # current default: 10240 probes
    ((4, 192), (2, 384)),          # 8704
    ((4, 128), (2, 256)),          # 7168 (pre-fix: fails the gate)
    ((4, 96), (2, 192)),           # 6400
    ((8, 160), (4, 256), (2, 512)),  # 7936: shrink the fixed coarse stage
    ((8, 128), (4, 224), (2, 448)),  # 6912
    ((8, 96), (4, 160), (2, 320)),   # 5120
    ((8, 64), (4, 128), (2, 256)),   # 4096
    ((8, 48), (4, 96), (2, 192)),    # 3200
)


def probe_count(levels, bins_n: int = 64) -> int:
    total = (bins_n // levels[0][0]) ** 3
    for (pf, pk), (cf, _) in zip(levels[:-1], levels[1:]):
        total += pk * (pf // cf) ** 3
    total += levels[-1][1] * levels[-1][0] ** 3
    return total


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--seeds", type=int, nargs="+", default=[3, 5, 7])
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--num-points", type=int, default=600)
    parser.add_argument(
        "--levels", action="append", default=[],
        help='extra candidate, e.g. "((8,160),(4,256),(2,512))"',
    )
    parser.add_argument(
        "--no-defaults", action="store_true",
        help="sweep only the --levels candidates (skip the default matrix)",
    )
    args = parser.parse_args()

    candidates = ([] if args.no_defaults else list(DEFAULT_CANDIDATES)) + [
        tuple(tuple(l) for l in ast.literal_eval(s)) for s in args.levels
    ]

    scenes = [
        (seed, stress_geometry(batch=args.batch, seed=seed))
        for seed in args.seeds
    ]

    rows = []
    for levels in candidates:
        worst = {"overlap_at_k": 1.0, "mean_abs_ratio": 0.0,
                 "max_abs_ratio": 0.0, "rank_corr": 1.0}
        ok = True
        for seed, (field, center, cam, bbox) in scenes:
            rep = selection_quality(
                field, center, cam, bbox, sdf_scale=3.1,
                num_points=args.num_points, bins_n=64, levels=levels,
            )
            ok = ok and gate(rep)
            worst["overlap_at_k"] = min(
                worst["overlap_at_k"], float(rep["overlap_at_k"].min()))
            worst["mean_abs_ratio"] = max(
                worst["mean_abs_ratio"], float(rep["mean_abs_ratio"].max()))
            worst["max_abs_ratio"] = max(
                worst["max_abs_ratio"], float(rep["max_abs_ratio"].max()))
            worst["rank_corr"] = min(
                worst["rank_corr"], float(rep["rank_corr"].min()))
        row = {
            "levels": levels,
            "probes": probe_count(levels),
            "gate_pass_all_seeds": ok,
            **{k: round(v, 4) for k, v in worst.items()},
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    passing = [r for r in rows if r["gate_pass_all_seeds"]]
    if passing:
        best = min(passing, key=lambda r: r["probes"])
        print(json.dumps({"cheapest_passing": best["levels"],
                          "probes": best["probes"]}), flush=True)


if __name__ == "__main__":
    main()
