"""Random-hand demo helper.

Parity target: ``manopth/manopth/demo.py:10-15`` (``generate_random_hand``) —
the subject of the reference's only unit test (manopth/test/test_demo.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hoisdf_tpu.mano.layer import ManoLayer
from hoisdf_tpu.mano.model import ManoModel, make_synthetic_mano


def generate_random_hand(
    batch_size: int = 1,
    ncomps: int = 6,
    model: ManoModel | None = None,
    seed: int = 0,
):
    """Sample random PCA pose + shape and run the MANO layer.

    Returns a dict with 'verts' [B,778,3] and 'joints' [B,21,3] (mm).
    """
    model = model or make_synthetic_mano(0)
    layer = ManoLayer(model, use_pca=True, ncomps=ncomps, center_idx=None)
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    pose = jax.random.normal(k1, (batch_size, ncomps + 3))
    shape = jax.random.normal(k2, (batch_size, 10))
    verts, joints = layer(pose, shape)
    return {"verts": verts, "joints": joints}
