"""Minimal repro of the (2,1024) fused-graph TPU kernel fault.

Round-2 finding (docs/PERFORMANCE.md "Known TPU runtime fault"):
``hier_levels=((4,512),(2,1024))`` reliably kills the TPU runtime with
"UNAVAILABLE: kernel fault" when the hier cascade is FUSED into one jitted
graph with the backbone+decoder at batch 22, while keep=896 runs clean and
the same cascade with externally-fed pyramids also runs clean.  The fault
reproduces with the fused Pallas SDF MLP disabled, so it is pure XLA TPU
codegen/runtime, not our custom call.

This script shrinks the repro to a standalone, self-reporting run:

    python -m hoisdf_tpu.tools.repro_fused_fault              # expect FAULT
    python -m hoisdf_tpu.tools.repro_fused_fault --keep 896   # expect PASS
    python -m hoisdf_tpu.tools.repro_fused_fault --dump-hlo /tmp/fault.hlo

Exit codes: 0 = ran clean (fault fixed on this libtpu — lift the cap in
config.hier_levels), 3 = faulted as documented.  The HLO dump is the
artifact to attach to an upstream XLA report; its fingerprint (module hash)
is printed before execution so the failing graph is identified even though
the fault kills the client.

A faulted TPU needs minutes to recover — run nothing else against the chip
right after, and verify recovery with a trivial matmul in a NEW process.
"""

from __future__ import annotations

import argparse
import hashlib
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--keep", type=int, default=1024,
                   help="2-cells-level keep (1024 faults, 896 passes)")
    p.add_argument("--batch", type=int, default=22)
    p.add_argument("--dump-hlo", default=None, metavar="PATH",
                   help="write the optimized-before-run HLO text here")
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU (never faults; sanity check the graph)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hoisdf_tpu.config import get_config
    from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
    from hoisdf_tpu.mano.layer import ManoBuffers
    from hoisdf_tpu.mano.model import make_synthetic_mano
    from hoisdf_tpu.models.hoisdf import build_model
    from hoisdf_tpu.train import make_eval_step

    cfg = get_config(
        "dexycb",
        sdf_infer_mode="hier",
        # the documented fault condition is SHARED levels on both fields
        # with the round-2 unmerged token gathers (both knobs pre-date
        # their round-3 default flips — pin them so the repro graph stays
        # the one that faulted)
        hier_levels=((4, 512), (2, args.keep)),
        hier_levels_obj=None,
        merged_field_queries=False,
        compute_dtype="bfloat16",
        # the fault reproduces without the Pallas kernel — keep it OFF so
        # the repro indicts pure XLA codegen
        fused_sdf_infer=False,
    )
    model = build_model(cfg)
    mano = ManoBuffers.from_model(make_synthetic_mano(0))

    batch_np = synthetic_batch(cfg, batch_size=args.batch, train=False)
    inputs, _ = split_inputs_targets(batch_np)
    inputs = {k: jnp.asarray(v) for k, v in inputs.items()}

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        inputs1 = {k: jnp.asarray(v[:1]) for k, v in inputs.items()}
        variables = model.init({"params": jax.random.PRNGKey(0)}, inputs1,
                               use_presampled=False, train=False,
                               supervise_sdf=True)

    eval_step = make_eval_step(cfg, model, mano)
    lowered = eval_step.lower(
        variables["params"], variables.get("batch_stats", {}), inputs
    )
    hlo = lowered.as_text()
    fingerprint = hashlib.sha256(hlo.encode()).hexdigest()[:16]
    print(f"[repro] hier_levels=((4,512),(2,{args.keep})) batch={args.batch} "
          f"stablehlo_fingerprint={fingerprint} "
          f"({len(hlo.splitlines())} lines)", flush=True)
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)
        print(f"[repro] HLO written to {args.dump_hlo}", flush=True)

    print("[repro] compiling + executing one step "
          "(TPU first-compile can take many minutes)...", flush=True)
    try:
        out = lowered.compile()(
            variables["params"], variables.get("batch_stats", {}), inputs
        )
        jax.block_until_ready(out)
    except Exception as exc:  # noqa: BLE001 — the fault is the finding
        print(f"[repro] FAULT reproduced: {type(exc).__name__}: "
              f"{str(exc)[:300]}", flush=True)
        print("RESULT FAULT", flush=True)
        return 3
    print("[repro] ran clean — the documented fault does NOT reproduce on "
          "this jax/libtpu; consider lifting the keep=896 cap "
          "(config.hier_levels).", flush=True)
    print("RESULT PASS", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
