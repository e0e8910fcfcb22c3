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
