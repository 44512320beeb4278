"""bilinear_upsample_3d must match the reference's literal formulation
(ones conv3d_transpose stride s + ones/s^3 smoothing conv, both
channel-summing — reference bilinear_upsampling.py:130-141)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.models.upsample import bilinear_upsample_3d


def _literal(x, s):
    b, d, h, w, c = x.shape
    ones = jnp.ones((s, s, s, c, c), x.dtype)
    deconv = jax.lax.conv_transpose(
        x, ones, (s, s, s), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    smooth = jnp.full((s, s, s, c, c), 1.0 / s ** 3, x.dtype)
    return jax.lax.conv_general_dilated(
        deconv, smooth, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@pytest.mark.parametrize("scale", [2, 4])
def test_matches_literal(scale, rng):
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 5, 3)).astype(np.float32))
    got = bilinear_upsample_3d(x, scale)
    want = _literal(x, scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_attention_2d_shapes(rng):
    from pointunet_tpu.models import (
        ChannelWiseAttention2D,
        SpatialAttention2D,
    )

    x = jnp.asarray(rng.standard_normal((2, 12, 14, 8)).astype(np.float32))
    sa = SpatialAttention2D(8)
    v = sa.init(jax.random.PRNGKey(0), x)
    gate = sa.apply(v, x)
    assert gate.shape == x.shape
    assert float(jnp.min(gate)) >= 0.0 and float(jnp.max(gate)) <= 1.0

    ca = ChannelWiseAttention2D()
    v = ca.init(jax.random.PRNGKey(0), x)
    out = ca.apply(v, x)
    assert out.shape == x.shape
