"""Same-session A/B of eval-path config knobs on the real TPU.

Runs bench._attempt for each named variant twice, interleaved (variant
order A,B,...,A,B,...), in ONE process so every number shares the same
tunnel session and dispatch constants — the only methodology that resolved
the ~1-2% stride8 win (docs/PERFORMANCE.md "Round 3" section).

Usage:
    python scripts/ab_eval.py                 # default knob matrix
    python scripts/ab_eval.py --batch 22 --iters 20 --rounds 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py: _attempt/_init_params_on_cpu)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=22)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=2)
    parser.add_argument("--rounds", type=int, default=2)
    parser.add_argument("--setting", default="dexycb")
    parser.add_argument(
        "--variant", action="append", default=[], metavar="NAME:JSON",
        help='e.g. "paired:{\\"paired_sdf_infer\\": true}"; default matrix '
             "if none given",
    )
    args = parser.parse_args()

    from hoisdf_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import synthetic_batch
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model

    if args.variant:
        matrix = []
        for spec in args.variant:
            name, _, doc = spec.partition(":")
            overrides = json.loads(doc)
            overrides = {
                k: tuple(tuple(x) for x in v) if isinstance(v, list) else v
                for k, v in overrides.items()
            }
            # Same semantics as bench.py: hier_levels alone means the
            # WHOLE sampler (historical shared-levels A/Bs) — pass
            # hier_levels_obj explicitly to split the fields.
            if "hier_levels" in overrides:
                overrides.setdefault(
                    "hier_levels_obj", overrides["hier_levels"]
                )
            matrix.append((name, overrides))
    else:
        # merged_field_queries is the production default since round 3 —
        # pin it per variant so 'paired' isolates pairing (a bare
        # {"paired_sdf_infer": true} would now equal paired+merged).
        matrix = [
            ("default", {}),
            ("paired", {"paired_sdf_infer": True,
                        "merged_field_queries": False,
                        "hier_levels_obj": None}),
            ("paired+merged", {"paired_sdf_infer": True,
                               "merged_field_queries": True,
                               "hier_levels_obj": None}),
        ]

    mano = ManoBuffers.from_model(make_synthetic_mano(0))
    setups = []
    for name, overrides in matrix:
        # Production eval mode.  Since round 4 the config default IS
        # "hier"; the explicit pin stays so an A/B matrix can never
        # silently regress to the 927 ms/step dense parity scan (a
        # pre-round-3 A/B run measured exactly that: every variant
        # 21.0 f/s because hier_levels knobs are no-ops under "full").
        overrides = {"sdf_infer_mode": "hier", **overrides}
        cfg = get_config(args.setting, **overrides)
        model = build_model(cfg)
        batch_np_train = synthetic_batch(cfg, batch_size=1, train=True)
        variables = bench._init_params_on_cpu(cfg, model, batch_np_train)
        setups.append((name, cfg, model, variables))
    bench._log(f"params ready for {len(setups)} variants")

    results: dict[str, list[tuple[float, float]]] = {n: [] for n, *_ in setups}
    for rnd in range(args.rounds):
        for name, cfg, model, variables in setups:
            fps, p50 = bench._attempt(
                cfg, model, mano, variables, args.batch, args.iters,
                args.warmup,
            )
            results[name].append((fps, p50))
            print(f"ROUND {rnd} {name}: {fps:.1f} f/s, p50 {p50:.2f} ms",
                  flush=True)

    print(json.dumps({
        name: {
            "fps_best": max(f for f, _ in rs),
            "fps_all": [round(f, 1) for f, _ in rs],
            "p50_best": min(p for _, p in rs),
            "p50_all": [round(p, 2) for _, p in rs],
        }
        for name, rs in results.items()
    }, indent=2), flush=True)


if __name__ == "__main__":
    main()
