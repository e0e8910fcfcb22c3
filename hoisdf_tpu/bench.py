"""Console entry for the repo-root bench harness (``hoisdf-bench``).

``bench.py`` deliberately lives at the repository root: it is the driver's
perf artifact and reads its ``BENCH_r*.json`` history and writes
``docs/eval_batch_sweep*.json`` next to itself.  This shim makes the
installed ``hoisdf-bench`` console script work from a source checkout or
editable install by loading that file by path (a wheel install without the
repo has no bench history to anchor against, so it exits with guidance
instead).
"""

from __future__ import annotations

import importlib.util
import os
import sys


def main() -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "bench.py")
    if not os.path.exists(path):
        sys.exit(
            "hoisdf-bench: repo-root bench.py not found. The bench harness "
            "runs from a source checkout / editable install (it anchors "
            "vs_baseline against sibling BENCH_r*.json files and records "
            "sweeps under docs/); clone the repo and `pip install -e .`."
        )
    spec = importlib.util.spec_from_file_location("hoisdf_bench_root", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


if __name__ == "__main__":
    main()
