"""bf16 training-path gradients through every layer kind (guards the
conv-transpose dtype consistency and the reduce_window max-monoid gradient
that the full flagship dryrun depends on)."""

import numpy as np

import jax
import jax.numpy as jnp

from double_yolo_kaist_tpu.models import layers as L


def test_bf16_grad_conv_maxpool_mish():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 16, 16, 8), np.float32), jnp.bfloat16)
    p = L.init_conv(jax.random.PRNGKey(0), 3, 8, 16)
    p["bn"], s = L.init_bn(16)

    def f(p, x):
        y, _ = L.conv_bn_act(x, p, s, pad=1, act="mish", bn=True, train=True)
        y = L.max_pool(y, 5, (1, 1), 2)
        y = L.max_pool(y, 2, (2, 2), 0)
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(f))(p, x)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l, np.float32)).all() for l in leaves)
    assert any(np.abs(np.asarray(l, np.float32)).max() > 0 for l in leaves)


def test_bf16_grad_se_fusion_upsample():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((2, 8, 8, 16), np.float32), jnp.bfloat16)
    p_se, _ = L.init_node_params(
        jax.random.PRNGKey(1),
        type("N", (), {"kind": "se", "in_ch": 16, "squeeze_ch": 8})())
    w = jnp.zeros((2,))

    def f(w, x):
        y = L.squeeze_excitation(x, p_se)
        y = L.weighted_fusion(y, [x], w)
        y = L.upsample_nearest(y, 2)
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(f))(w, x)
    assert np.isfinite(np.asarray(g, np.float32)).all()
