"""utils/amp.cast_float_params: which leaves are cast and why.

flax consumes norm scale/bias (and BatchNorm running stats) at f32
precision even under a bf16 module dtype (``force_float32_reductions``),
so pre-casting those would change numerics; Dense/Conv/Embed weights are
promoted to the module dtype at use, so pre-casting them is bit-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from image_captioning_ml_project_tpu.utils.amp import cast_float_params


def test_norm_params_and_stats_stay_f32():
    variables = {
        "params": {
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
            "norm1": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
            "scale_only_norm": {"scale": jnp.ones((4,))},
            "clip": {"logit_scale": jnp.asarray(2.6592)},
            "swin": {"relative_position_bias_table": jnp.zeros((9, 2))},
        },
        "batch_stats": {
            "bn": {"mean": jnp.zeros((4,)), "var": jnp.ones((4,))},
        },
    }
    out = cast_float_params(variables)
    p = out["params"]
    assert p["dense"]["kernel"].dtype == jnp.bfloat16
    assert p["dense"]["bias"].dtype == jnp.bfloat16
    assert p["norm1"]["scale"].dtype == jnp.float32
    assert p["norm1"]["bias"].dtype == jnp.float32
    assert p["scale_only_norm"]["scale"].dtype == jnp.float32
    assert p["clip"]["logit_scale"].dtype == jnp.float32
    assert p["swin"]["relative_position_bias_table"].dtype == jnp.float32
    assert out["batch_stats"]["bn"]["mean"].dtype == jnp.float32
    assert out["batch_stats"]["bn"]["var"].dtype == jnp.float32


def test_bias_only_norm_stays_f32():
    # LayerNorm(use_scale=False) leaves only a bias; it must not be cast
    # (flax consumes it at f32 — casting would break eval_state's
    # bit-identity guarantee)
    tree = {"norm": {"bias": jnp.zeros((4,))},
            "dense": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))}}
    out = cast_float_params(tree)
    assert out["norm"]["bias"].dtype == jnp.float32
    assert out["dense"]["bias"].dtype == jnp.bfloat16


def test_non_float32_leaves_untouched():
    tree = {"a": {"kernel": jnp.ones((2,), jnp.bfloat16)},
            "b": {"kernel": jnp.arange(3)}}
    out = cast_float_params(tree)
    assert out["a"]["kernel"].dtype == jnp.bfloat16
    assert out["b"]["kernel"].dtype == jnp.int32


def test_layernorm_precast_equivalence_rationale():
    """The empirical fact the skip rule encodes: a pre-cast LayerNorm
    scale/bias changes outputs (flax keeps them f32), a pre-cast Dense
    kernel does not — and cast_float_params therefore preserves full
    bit-identity on a LN+Dense stack with non-trivial params."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16), jnp.bfloat16)

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16, dtype=jnp.bfloat16)(x)
            return nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)(x)

    blk = Block()
    v = blk.init(jax.random.PRNGKey(1), x)
    v = jax.tree_util.tree_map(
        lambda a: a + jax.random.normal(
            jax.random.PRNGKey(2), a.shape) * 0.1, v)

    y_master = blk.apply(v, x)
    y_precast = blk.apply(cast_float_params(v), x)
    np.testing.assert_array_equal(np.asarray(y_master, np.float32),
                                  np.asarray(y_precast, np.float32))

    # blanket-casting everything (including the LN params) is NOT exact
    v_all = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, v)
    y_blanket = blk.apply(v_all, x)
    assert not bool(
        (np.asarray(y_master, np.float32)
         == np.asarray(y_blanket, np.float32)).all())
