"""Metric parity checks against straightforward numpy recomputation."""

import jax.numpy as jnp
import numpy as np

from hoisdf_tpu.metrics import (
    EvalUtil,
    add_s,
    eval_batched_obj_direct,
    eval_hand_joint,
    fscore,
    obj_metrics_dexycb,
)


def test_mje_pamje():
    rng = np.random.RandomState(0)
    gt = rng.randn(4, 21, 3).astype(np.float64)
    pred = gt + rng.randn(4, 21, 3) * 0.01
    mje, pamje = eval_hand_joint(jnp.asarray(pred), jnp.asarray(gt))
    want = np.linalg.norm(pred - gt, axis=-1).mean()
    np.testing.assert_allclose(float(mje), want, rtol=1e-6)
    assert float(pamje) <= float(mje) + 1e-9  # alignment can only help


def test_pamje_invariant_to_similarity():
    rng = np.random.RandomState(1)
    gt = rng.randn(2, 21, 3)
    # pred = similarity transform of gt => PA-MJE ~ 0
    theta = 0.3
    rot = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]]
    )
    pred = 1.3 * gt @ rot.T + 0.5
    _, pamje = eval_hand_joint(jnp.asarray(pred), jnp.asarray(gt))
    assert float(pamje) < 1e-6


def test_add_s_numpy_parity():
    rng = np.random.RandomState(2)
    a = rng.randn(2, 50, 3)
    b = rng.randn(2, 50, 3)
    got = np.asarray(add_s(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        d = np.linalg.norm(b[i][None] - a[i][:, None], axis=-1)
        np.testing.assert_allclose(got[i], d.min(axis=1).mean(), rtol=1e-6)


def test_obj_metrics_zero_for_perfect_pred():
    rng = np.random.RandomState(3)
    mesh = rng.randn(2, 100, 3).astype(np.float32)
    rot = rng.randn(2, 3).astype(np.float32)
    trans = rng.randn(2, 3).astype(np.float32) * 0.1
    out = eval_batched_obj_direct(
        jnp.asarray(rot), jnp.asarray(trans), jnp.asarray(rot), jnp.asarray(trans),
        jnp.asarray(mesh),
    )
    assert float(out["ADDS"].max()) < 1e-5
    assert float(out["MCE"].max()) < 1e-5
    assert float(out["OCE"].max()) < 1e-7


def test_fscore_perfect_and_disjoint():
    pts = jnp.asarray(np.random.RandomState(4).randn(50, 3))
    assert float(fscore(pts, pts, 1e-3)) == 1.0
    far = pts + 100.0
    assert float(fscore(pts, far, 1e-3)) == 0.0


def test_evalutil_auc():
    ev = EvalUtil(num_kp=3)
    rng = np.random.RandomState(5)
    for _ in range(20):
        gt = rng.randn(3, 3)
        ev.feed(gt, gt + 0.01)  # constant 1cm-ish error
    epe_mean, epe_med, auc, curve, thr = ev.get_measures(0, 0.05, 20)
    np.testing.assert_allclose(epe_mean, np.sqrt(3 * 0.01**2), rtol=1e-6)
    assert 0.5 < auc < 1.0
    assert curve[0] == 0.0 and curve[-1] == 1.0


def test_mesh_metrics_batch_matches_per_sample_loop():
    """The batched dexycb_full mesh-metrics path (one device call per
    batch, VERDICT r3 #7) must reproduce the per-sample reference
    computation exactly: vmapped rigid_align + correspondence EPE +
    pairwise F-scores vs one-mesh-at-a-time calls."""
    import time

    import jax
    import jax.numpy as jnp

    from hoisdf_tpu.metrics import fscore, mesh_metrics_batch
    from hoisdf_tpu.ops.rotations import rigid_align

    rng = np.random.RandomState(7)
    b, n = 4, 96  # small mesh keeps the O(n^2) CPU test fast
    gt = rng.randn(b, n, 3).astype(np.float32) * 0.05
    pred = (gt + rng.randn(b, n, 3).astype(np.float32) * 0.004)
    threshs = (0.005, 0.015)

    mm = jax.device_get(
        mesh_metrics_batch(jnp.asarray(gt), jnp.asarray(pred), threshs)
    )

    for i in range(b):
        gv, pv = jnp.asarray(gt[i]), jnp.asarray(pred[i])
        aligned = rigid_align(pv, gv)
        np.testing.assert_allclose(
            mm["epe_dist"][i], np.linalg.norm(gt[i] - pred[i], axis=-1),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            mm["epe_dist_aligned"][i],
            np.linalg.norm(gt[i] - np.asarray(aligned), axis=-1),
            atol=1e-5,
        )
        for j, t in enumerate(threshs):
            np.testing.assert_allclose(
                mm["fscores"][i][j], float(fscore(gv, pv, t)), atol=1e-6
            )
            np.testing.assert_allclose(
                mm["fscores_aligned"][i][j], float(fscore(gv, aligned, t)),
                atol=1e-6,
            )

    # The batched call must beat the per-sample loop (5 device round-trips
    # per mesh).  Warm both paths first so this times steady-state dispatch,
    # not compilation; best-of-3 per path + a plain "faster" bar keeps the
    # test robust to GC/scheduler hiccups on the loaded 1-CPU CI box.
    def loop_path():
        for i in range(b):
            gv, pv = jnp.asarray(gt[i]), jnp.asarray(pred[i])
            aligned = rigid_align(pv, gv)
            for t in threshs:
                float(fscore(gv, pv, t))
                float(fscore(gv, aligned, t))

    def batch_path():
        jax.device_get(
            mesh_metrics_batch(jnp.asarray(gt), jnp.asarray(pred), threshs)
        )

    def best_of(fn, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    loop_path(); batch_path()  # warm (compiles)
    t_loop = best_of(loop_path)
    t_batch = best_of(batch_path)
    assert t_batch < t_loop, (t_batch, t_loop)
