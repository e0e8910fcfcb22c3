"""Grad-step batch sweep with fault isolation (VERDICT r4 #3).

Round 4 found the ho3d grad step FAULTS the TPU runtime at batch 44 but
never probed the boundary (26/33/40) or fingerprinted the failing graph.
This sweep runs each batch's grad step in a FRESH process (the only way to
continue after an in-process kernel fault — same protocol as
``bench.py --batch-sweep``), retries each fault once after a recovery
wait, and for every batch that faults twice captures the optimized-HLO
fingerprint with a separate ``--compile-only`` run (compiling a faulting
graph is safe; executing it is what kills the runtime).

Usage:
    python scripts/probe_train_batch_sweep.py                 # ho3d 22..44
    python scripts/probe_train_batch_sweep.py --batches 26,33,40,44
    python scripts/probe_train_batch_sweep.py --cpu --batches 2,3  # smoke

Writes docs/train_batch_sweep.json and prints one JSON line per batch.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(_HERE)
_PROBE = os.path.join(_HERE, "probe_train_roofline.py")


def _log(msg: str) -> None:
    print(f"[train-batch-sweep] {msg}", file=sys.stderr, flush=True)


def _run_probe(batch: int, args, extra=()) -> dict | None:
    """One fresh-process probe attempt; returns the roofline JSON doc or
    None (fault / timeout / crash)."""
    cmd = [
        sys.executable, _PROBE, "--setting", args.setting,
        "--batch", str(batch), "--remat", "none",
        "--iters", str(args.iters), "--mode", args.mode, *extra,
    ]
    if args.cpu:
        cmd.append("--cpu")
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=args.timeout,
            cwd=_REPO,
        )
    except subprocess.TimeoutExpired:
        _log(f"batch={batch}: probe timed out after {args.timeout}s")
        return None
    sys.stderr.write(proc.stderr[-2000:])
    docs = {}
    for line in proc.stdout.splitlines():
        try:
            doc = json.loads(line)
        except ValueError:
            continue
        metric = doc.get("metric", "")
        if metric.startswith("train_grad_roofline_"):
            docs["roofline"] = doc
        elif metric.startswith("train_grad_hlo_"):
            docs["hlo"] = doc
    if "roofline" not in docs:
        _log(f"batch={batch}: rc={proc.returncode}, no roofline line "
             f"(stdout tail: {proc.stdout[-300:]!r})")
        return None
    out = docs["roofline"]
    if "hlo" in docs:
        out["hlo_fingerprint"] = docs["hlo"]["hlo_fingerprint"]
        out["hlo_path"] = docs["hlo"]["hlo_path"]
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--setting", default="ho3d")
    p.add_argument("--mode", default="hier")
    p.add_argument("--batches", default="22,26,33,40,44")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--timeout", type=float, default=2400.0,
                   help="per-attempt subprocess timeout (s); first compile "
                   "of a new batch shape through the remote tunnel can take "
                   "15-20 min")
    p.add_argument("--recovery-wait", type=float, default=90.0,
                   help="seconds to wait for TPU recovery after a fault")
    p.add_argument("--out", default=os.path.join(
        _REPO, "docs", "train_batch_sweep.json"))
    p.add_argument("--hlo-dir", default="/tmp",
                   help="where to dump faulting batches' optimized HLO")
    args = p.parse_args()

    batches = [int(b) for b in args.batches.split(",") if b.strip()]
    rows = []
    for b in batches:
        doc = _run_probe(b, args)
        if doc is None and not args.cpu:
            _log(f"batch={b}: faulted; waiting {args.recovery_wait}s for "
                 "TPU recovery, then retrying once")
            time.sleep(args.recovery_wait)
            doc = _run_probe(b, args)
        if doc is None:
            # Fingerprint the faulting graph without executing it (a fresh
            # process compile is safe — execution is what faults).
            hlo_path = os.path.join(
                args.hlo_dir, f"train_fault_{args.setting}_b{b}.hlo")
            _log(f"batch={b}: faulted twice; capturing compile-only HLO "
                 f"fingerprint -> {hlo_path}")
            if not args.cpu:
                time.sleep(args.recovery_wait)
            fp = _run_probe(
                b, args, extra=("--compile-only", "--dump-hlo", hlo_path))
            row = {
                "batch": b, "ok": False,
                "hlo_fingerprint": (fp or {}).get("hlo_fingerprint"),
                "hlo_path": (fp or {}).get("hlo_path"),
                "gflop": (fp or {}).get("gflop"),
                "hbm_gb": (fp or {}).get("hbm_gb"),
                "roofline_mfu_cap": (fp or {}).get("roofline_mfu_cap"),
            }
        else:
            row = {"batch": b, "ok": True, **{
                k: doc.get(k) for k in (
                    "ms", "fps", "gflop", "hbm_gb",
                    "intensity_flop_per_byte", "roofline_mfu_cap",
                    "achieved_mfu", "device")}}
        print(json.dumps({"metric": f"train_batch_sweep_{args.setting}",
                          **row}), flush=True)
        rows.append(row)

    clean = [r for r in rows if r["ok"] and r.get("fps")]
    summary = {
        "setting": args.setting,
        "mode": args.mode,
        "branch": "field",
        "rows": rows,
        "batch_opt": max(clean, key=lambda r: r["fps"])["batch"]
        if clean else None,
        "batch_opt_fps": max(clean, key=lambda r: r["fps"])["fps"]
        if clean else None,
    }
    if not args.cpu:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(summary, f, indent=1)
        _log(f"wrote {args.out}")
    print(json.dumps({"metric": "train_batch_sweep_summary", **{
        k: summary[k] for k in ("setting", "batch_opt", "batch_opt_fps")}}),
        flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
