"""Serving API: load a checkpoint once, predict hand+object pose per batch.

A production-facing wrapper the reference lacks (its only entry points are
the train/test scripts): jitted eval forward + MANO head, fixed batch shape
with automatic padding, per-call latency stats, and a dynamic micro-batching
front-end (``BatchingServer``) that coalesces concurrent single-frame
requests into full device batches — batch-22 throughput is ~4x the
sequential batch-1 rate on TPU (docs/PERFORMANCE.md batch-scaling table),
so a server must batch to reach it.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future, InvalidStateError
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.config import Config, get_config
from hoisdf_tpu.ops import wire
from hoisdf_tpu.data.synthetic import split_inputs_targets, synthetic_batch
from hoisdf_tpu.mano.layer import ManoBuffers
from hoisdf_tpu.mano.model import load_mano_npz, make_synthetic_mano
from hoisdf_tpu.models.hoisdf import build_model
from hoisdf_tpu.train import make_eval_step
from hoisdf_tpu.utils import checkpoint as ckpt_util
from hoisdf_tpu.utils.profiling import StepStats

INPUT_KEYS = (
    "img", "cam_intr", "mano_root", "obj_center_cam", "bbox_hand", "bbox_obj",
)

# Outputs a serving caller gets (all batch-leading).  Everything else the
# eval step computes (per-layer vote/cls intermediates [L,B,...], decoder
# head maps) is dropped AT TRACE TIME so it is never transferred off the
# device: device->host pulls dominate serving cost on remote-attached
# accelerators (measured ~37 ms/transfer constant + ~26 MB/s over the axon
# tunnel; the internals are ~22 MB/batch).
SERVE_KEYS = (
    "mano_joints", "mano_verts", "mano_shape", "hand_joints",
    "obj_rot", "obj_trans",
)


class Predictor:
    """Fixed-batch jitted predictor.

    Inputs per frame: img [H,W,3] float in [0,1] (the eval crop), cam_intr
    [3,3], mano_root [3] (hand root in camera space), obj_center_cam [3],
    bbox_hand/bbox_obj [4].  Outputs: MANO joints/verts (root-relative,
    metres), aggregated vote joints, object rot (axis-angle) and relative
    translation.
    """

    def __init__(
        self,
        cfg: Optional[Config] = None,
        ckpt_dir: Optional[str] = None,
        batch_size: int = 8,
        transfer_dtype: str = "float32",
    ):
        """``transfer_dtype``: wire format for the image batch.

        ``"float32"`` (default) ships the normalized [0,1] crop as-is —
        the parity path.  ``"uint8"`` ships raw bytes and normalizes
        ON DEVICE via a host-computed 256-entry f32 LUT — bit-identical
        to the host pipeline's ``image_io.to_float_image`` (a plain
        device-side /255 is 1 ulp off: XLA rewrites it to
        multiply-by-reciprocal): 4x fewer host->device bytes per batch.  Input transfer
        is the serving bottleneck on remote-attached chips (measured
        ~57 f/s capacity at f32 vs ~65 ms/batch device time over the axon
        tunnel — docs/PERFORMANCE.md "Serving under load"), and u8 is what
        a camera produces anyway.  Callers submitting u8 frames get
        bit-exact f32-path outputs; f32 frames are re-quantized with
        rint(img*255) (lossy only if the source was not u8).
        """
        if transfer_dtype not in ("float32", "uint8"):
            raise ValueError(f"transfer_dtype {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        self.cfg = cfg or get_config(
            "dexycb", sdf_infer_mode="hier", compute_dtype="bfloat16"
        )
        self.batch_size = batch_size
        self.model = build_model(self.cfg)
        mano_model = (
            load_mano_npz(self.cfg.mano_model_path)
            if self.cfg.mano_model_path else make_synthetic_mano(0)
        )
        self.mano = ManoBuffers.from_model(mano_model)

        sample = synthetic_batch(self.cfg, batch_size, train=False)
        inputs, _ = split_inputs_targets(sample)
        if self.transfer_dtype == "uint8":
            inputs["img"] = self._quantize_img(inputs["img"])
        self._template = {
            k: jnp.asarray(v) for k, v in inputs.items() if k in INPUT_KEYS
        }
        # Initialize on the host CPU backend with a batch-1 presampled
        # forward (params are batch/branch independent) — same cold-start
        # trick as bench.py: the accelerator sees zero init traffic, no
        # init-graph compile over the remote tunnel, no eager HBM spike.
        init_np, _ = split_inputs_targets(
            synthetic_batch(self.cfg, batch_size=1, train=True)
        )
        with jax.default_device(jax.devices("cpu")[0]):
            variables = self.model.init(
                {"params": jax.random.PRNGKey(0),
                 "sample_noise": jax.random.PRNGKey(1),
                 "dropout": jax.random.PRNGKey(2)},
                {k: jnp.asarray(v[:1]) for k, v in init_np.items()},
                use_presampled=True, dist_range=0.03, train=False,
            )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if ckpt_dir:
            restored = ckpt_util.restore_snapshot(
                ckpt_dir,
                {"params": self.params, "batch_stats": self.batch_stats,
                 "opt_state": None, "step": 0},
            )
            if restored is None:
                raise FileNotFoundError(f"no snapshot under {ckpt_dir}")
            self.params = restored["params"]
            self.batch_stats = restored["batch_stats"]
        # pin weights on the serving device (they were created on host CPU)
        device = jax.devices()[0]
        self.params = jax.device_put(self.params, device)
        self.batch_stats = jax.device_put(self.batch_stats, device)
        # Serving never has GT SDF sample points; disable that branch.
        self._eval_step = make_eval_step(
            self.cfg, self.model, self.mano, supervise_sdf=False
        )
        # Packed serving step: keep only SERVE_KEYS and flatten them into
        # ONE [B, D] f32 array, so a batch costs a single device->host
        # transfer instead of one RPC per output (see SERVE_KEYS note).
        shapes = jax.eval_shape(
            self._eval_step, self.params, self.batch_stats, self._template
        )
        self._pack_layout = [
            (k, tuple(shapes[k].shape)) for k in SERVE_KEYS if k in shapes
        ]

        # u8 wire format: normalize on device, BIT-exactly, via the shared
        # LUT codec (ops/wire.py — rewrite-proof vs XLA's multiply-by-
        # reciprocal /255; trace-time no-op for the f32 wire).
        @jax.jit
        def _packed_step(params, batch_stats, inputs):
            inputs = wire.decode_inputs(inputs, self.cfg.compute_dtype)
            preds = self._eval_step(params, batch_stats, inputs)
            return jnp.concatenate(
                [preds[k].reshape(batch_size, -1).astype(jnp.float32)
                 for k, _ in self._pack_layout],
                axis=1,
            )

        self._packed_step = _packed_step
        self.stats = StepStats()

    # To the u8 wire format (ops/wire.py): u8 passes through untouched (the
    # exact case); [0,1] float crops are re-quantized with rint — lossless
    # iff the float came from a u8 source divided by 255.
    _quantize_img = staticmethod(wire.quantize_image_u8)

    def warmup(self) -> None:
        jax.block_until_ready(
            self._packed_step(self.params, self.batch_stats, self._template)
        )

    def predict_async(self, frames: Dict[str, np.ndarray]):
        """Enqueue one eval step WITHOUT blocking on the result.

        Returns ``(handle, n)`` — an in-flight device value (pass it to
        :meth:`materialize`) still being computed under JAX async dispatch.
        Until it is materialized the host is free to assemble/dispatch the
        next batch, which is how a serving loop hides the per-dispatch RPC
        constant (~29 ms over the axon tunnel, docs/PERFORMANCE.md).
        """
        n = frames["img"].shape[0]
        if n > self.batch_size:
            raise ValueError(f"batch {n} > predictor batch {self.batch_size}")
        batch = {}
        for k in INPUT_KEYS:
            if k not in frames and k in self._template:
                batch[k] = self._template[k]
                continue
            v = np.asarray(frames[k])
            if k == "img":
                if self.transfer_dtype == "uint8":
                    v = self._quantize_img(v)
                elif v.dtype == np.uint8:
                    # f32 wire format but a u8 frame: host-side normalize
                    v = v.astype(np.float32) / 255.0
            if n < self.batch_size:
                pad = np.repeat(v[-1:], self.batch_size - n, axis=0)
                v = np.concatenate([v, pad], axis=0)
            batch[k] = jnp.asarray(v)
        return self._packed_step(self.params, self.batch_stats, batch), n

    def materialize(self, handle, n: int) -> Dict[str, np.ndarray]:
        """Pull a ``predict_async`` result to host numpy (blocks until the
        step finishes; ONE device->host transfer) and unpack it to the
        per-key dict, trimmed to the ``n`` live rows.  Per-layer internals
        (``hand_off``/``hand_cls``/``decoder_heads``) are not part of the
        packed serving outputs — consume those via ``make_eval_step``."""
        flat = np.asarray(handle)
        out, off = {}, 0
        for k, shape in self._pack_layout:
            size = int(np.prod(shape[1:], dtype=np.int64))
            out[k] = flat[:n, off:off + size].reshape((n,) + shape[1:])
            off += size
        return out

    def predict(self, frames: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """frames: dict of per-frame arrays with leading dim N <= batch_size
        (padded internally).  Returns numpy outputs trimmed to N."""
        with self.stats.measure():
            handle, n = self.predict_async(frames)
            jax.block_until_ready(handle)
        return self.materialize(handle, n)

    def latency_summary(self) -> Dict[str, float]:
        return self.stats.summary()


class BatchingServer:
    """Dynamic micro-batching front-end over a :class:`Predictor`.

    Callers (any number of threads) submit ONE frame at a time and get a
    ``concurrent.futures.Future`` back.  Two pipeline stages serve them:

    * the **dispatcher** thread drains the request queue, coalesces up to
      ``predictor.batch_size`` frames — waiting at most ``max_wait_ms``
      after the first frame arrives for stragglers — and *enqueues* one
      jitted eval step (``predict_async``, non-blocking);
    * the **completer** thread materializes each step's outputs (the only
      blocking point) and scatters per-frame results to the futures.

    The bounded hand-off queue (``pipeline_depth``, default 2) keeps that
    many steps in flight, so batch assembly + dispatch RPC overlap device
    execution — the same async-dispatch pipelining the eval benchmark uses
    (~29 ms/dispatch hidden, docs/PERFORMANCE.md).  Under load the server
    approaches the pipelined batch-N throughput; an idle single request
    pays at most ``max_wait_ms`` plus one step.  A failing step propagates
    to exactly the futures of its batch; the server stays up.
    """

    def __init__(self, predictor: Predictor, max_wait_ms: float = 5.0,
                 pipeline_depth: int = 2):
        self.predictor = predictor
        self.max_wait_s = max_wait_ms / 1e3
        self._q: "queue.Queue" = queue.Queue()
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max(1, pipeline_depth))
        self._closed = False
        # orders every submit() against close()'s sentinel: nothing can be
        # enqueued after the sentinel, so the dispatcher serves ALL accepted
        # requests before shutting down
        self._submit_lock = threading.Lock()
        self.batches_dispatched = 0
        self.frames_served = 0
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop, daemon=True)
        self._dispatcher.start()
        self._completer.start()

    def submit(self, frame: Dict[str, np.ndarray]) -> "Future":
        """frame: dict of per-frame arrays WITHOUT a leading batch dim
        (``img [H,W,3]``, ``cam_intr [3,3]``, ...).  Returns a Future whose
        result is the per-frame output dict (leading dim stripped)."""
        fut: "Future" = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchingServer is closed")
            self._q.put((frame, fut))
        return fut

    def _dispatch_loop(self) -> None:
        bs = self.predictor.batch_size
        stop = False
        while not stop:
            item = self._q.get()
            if item is None:
                break
            pending: List[tuple] = [item]
            deadline = time.monotonic() + self.max_wait_s
            while len(pending) < bs:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                pending.append(nxt)
            self._dispatch_batch(pending)
        self._inflight.put(None)  # completer: drain and exit

    @staticmethod
    def _fail(futures, exc) -> None:
        for fut in futures:
            try:
                fut.set_exception(exc)
            except InvalidStateError:  # racing caller already cancelled it
                pass

    def _dispatch_batch(self, pending: List[tuple]) -> None:
        # claim each future; callers may have .cancel()ed while queued, and
        # setting a result on a cancelled Future raises InvalidStateError,
        # which would kill the worker thread
        pending = [
            (f, fut) for f, fut in pending if fut.set_running_or_notify_cancel()
        ]
        if not pending:
            return
        try:
            # batch assembly inside the try: a malformed frame (ragged
            # shapes, missing key) must fail THIS batch's futures, not kill
            # the dispatcher thread and strand every later request
            frames = {
                k: np.stack([np.asarray(f[k]) for f, _ in pending])
                for k in INPUT_KEYS if k in pending[0][0]
            }
            preds, _n = self.predictor.predict_async(frames)
        except Exception as exc:  # bad inputs / dispatch error: this batch only
            self._fail([fut for _, fut in pending], exc)
            return
        self.batches_dispatched += 1
        # blocks when pipeline_depth steps are already in flight
        self._inflight.put((pending, preds))

    def _complete_loop(self) -> None:
        while True:
            item = self._inflight.get()
            if item is None:
                return
            pending, preds = item
            try:
                out = self.predictor.materialize(preds, len(pending))
            except Exception as exc:  # device-side failure of THIS step
                self._fail([fut for _, fut in pending], exc)
                continue
            self.frames_served += len(pending)
            for i, (_, fut) in enumerate(pending):
                fut.set_result({k: v[i] for k, v in out.items()})

    def close(self) -> None:
        """Serve every request accepted before close(), then stop both
        pipeline stages.  The submit lock orders all accepted requests ahead
        of the shutdown sentinel, so none can be stranded behind it."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._q.put(None)
        self._dispatcher.join()
        self._completer.join()
        # belt-and-braces: the lock makes post-sentinel items impossible, but
        # fail loudly rather than hang forever if that invariant ever breaks
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                self._fail([item[1]], RuntimeError("BatchingServer closed"))

    def __enter__(self) -> "BatchingServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


def run_poisson_load(
    server: BatchingServer,
    frames: List[Dict[str, np.ndarray]],
    rate_hz: float,
    duration_s: float,
    seed: int = 0,
) -> Dict[str, object]:
    """Open-loop Poisson load driver for :class:`BatchingServer`.

    Submits single frames (round-robin from ``frames``) with exponential
    inter-arrival gaps at ``rate_hz`` for ``duration_s`` seconds, without
    waiting for completions (open loop: an overloaded server builds a
    backlog instead of throttling the generator, unlike the closed-loop
    ``bench_components.py --serve`` clients).  Waits for every submitted
    request, then reports::

        {"offered_hz", "goodput_hz", "completed", "elapsed_s",
         "latencies_s": sorted per-request latencies}

    ``goodput_hz`` counts completions over the window from first submit to
    last completion, so at overload it converges to server capacity.
    Shared driver for the serving benchmark and the CPU saturation
    regression test (reference has no serving subsystem; spec'd here).
    """
    rng = np.random.RandomState(seed)
    latencies: List[float] = []
    lock = threading.Lock()
    # Future.set_result wakes result() waiters BEFORE invoking done
    # callbacks, so the driver could build the report while the last
    # callbacks are still pending; each callback releases this semaphore
    # and the driver acquires once per submit before reading `latencies`.
    done_sem = threading.Semaphore(0)
    futs = []
    t_start = time.perf_counter()
    t_end = t_start + duration_s
    next_t = t_start
    i = 0
    while True:
        now = time.perf_counter()
        if now >= t_end:
            break
        if now < next_t:
            time.sleep(min(next_t - now, 1e-3))
            continue
        t0 = time.perf_counter()

        def _done(fut, t0=t0):
            try:
                if not fut.cancelled() and fut.exception() is None:
                    with lock:
                        latencies.append(time.perf_counter() - t0)
            finally:
                done_sem.release()

        fut = server.submit(frames[i % len(frames)])
        fut.add_done_callback(_done)
        futs.append(fut)
        i += 1
        next_t += rng.exponential(1.0 / rate_hz)
    for fut in futs:
        try:
            fut.result(timeout=600)
        except Exception:
            pass
    deadline = time.monotonic() + 60.0
    for _ in futs:  # every callback has run before the report is built
        if not done_sem.acquire(timeout=max(deadline - time.monotonic(),
                                            1e-3)):
            break
    elapsed = time.perf_counter() - t_start
    with lock:
        lats = sorted(latencies)
    return {
        "offered_hz": rate_hz,
        "submitted": len(futs),
        "completed": len(lats),
        "elapsed_s": elapsed,
        "goodput_hz": len(lats) / elapsed if elapsed > 0 else 0.0,
        "latencies_s": lats,
    }
