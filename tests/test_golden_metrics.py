"""Eval-metric parity vs the reference implementations on synthetic data.

Pins ``metrics.py`` against golden outputs of the reference's
``eval_batched_obj_direct`` (both dataset branches, common/metrics.py:116-185),
``eval_hand_joint`` (:213-232) and ``calculate_fscore``
(common/eval_util.py:117-140) — beyond the existing self-recompute tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hoisdf_tpu.metrics import (
    eval_batched_obj_direct,
    eval_hand_joint,
    fscore_pr,
)

TOL = dict(atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def g(golden):
    return golden("metrics")


def _point_avg(g):
    # point-vote averaging happens caller-side here (metrics.py:120-121 /
    # our evaluate.py does the same mean before the call)
    return g["obj_rot_out"].mean(axis=1), g["obj_trans_out"].mean(axis=1)


def test_obj_metrics_dexycb_branch(g):
    rot, trans = _point_avg(g)
    tmpl = g["templates"][np.asarray(g["obj_cls"]) - 1]  # 1-based ids (:146)
    out = eval_batched_obj_direct(
        jnp.asarray(rot), jnp.asarray(trans),
        jnp.asarray(g["gt_rot"]), jnp.asarray(g["gt_trans"]),
        jnp.asarray(tmpl), ho3d=False,
    )
    assert out["ADDS"].shape[0] == int(g["dexycb_n"])
    np.testing.assert_allclose(
        float(out["ADDS"].mean()), float(g["dexycb_ADDS"]), **TOL)
    np.testing.assert_allclose(
        float(out["MCE"].mean()), float(g["dexycb_MCE"]), **TOL)
    np.testing.assert_allclose(
        float(out["OCE"].mean()), float(g["dexycb_OCE"]), **TOL)


def test_obj_metrics_ho3d_branch(g):
    rot, trans = _point_avg(g)
    used = np.asarray(g["ho3d_used"])  # pitcher_base excluded (:131-142)
    assert used.sum() == int(g["ho3d_n"])
    tmpl = g["templates"][np.asarray(g["ho3d_cls_ids"])[used]]
    out = eval_batched_obj_direct(
        jnp.asarray(rot[used]), jnp.asarray(trans[used]),
        jnp.asarray(g["gt_rot"][used]), jnp.asarray(g["gt_trans"][used]),
        jnp.asarray(tmpl), ho3d=True,
    )
    np.testing.assert_allclose(
        float(out["ADDS"].mean()), float(g["ho3d_ADDS"]), **TOL)
    np.testing.assert_allclose(
        float(out["MME"].mean()), float(g["ho3d_MME"]), **TOL)


def test_eval_hand_joint(g):
    mje, pamje = eval_hand_joint(
        jnp.asarray(g["hand_pred"]), jnp.asarray(g["hand_gt"])
    )
    np.testing.assert_allclose(float(mje), float(g["MJE"]), **TOL)
    np.testing.assert_allclose(float(pamje), float(g["PAMJE"]), **TOL)


@pytest.mark.parametrize("th,fk,pk,rk", [(0.005, "f5", "p5", "r5"),
                                         (0.015, "f15", None, None)])
def test_fscore(g, th, fk, pk, rk):
    f, p, r = fscore_pr(
        jnp.asarray(g["fscore_gt"]), jnp.asarray(g["fscore_pred"]), th
    )
    np.testing.assert_allclose(float(f), float(g[fk]), **TOL)
    if pk is not None:
        # reference's recall is pred->gt, precision gt->pred (eval_util:127-131)
        np.testing.assert_allclose(float(p), float(g[pk]), **TOL)
        np.testing.assert_allclose(float(r), float(g[rk]), **TOL)
