"""FastConv must be a numerics- and checkpoint-compatible nn.Conv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from pointunet_tpu.models.fastconv import FastConv

KERNELS = [
    (3, 3, 3),
    (1, 9, 9),
    (9, 1, 9),
    (9, 9, 1),
    (9, 1, 1),
    (1, 1, 1),
]


@pytest.mark.parametrize("kernel", KERNELS)
def test_matches_nn_conv(kernel, rng, monkeypatch):
    monkeypatch.setenv("POINTUNET_FASTCONV", "1")  # force decomposition on CPU
    x = jnp.asarray(rng.standard_normal((2, 6, 10, 11, 5)).astype(np.float32))
    ref = nn.Conv(4, kernel, padding="SAME")
    fast = FastConv(4, kernel, padding="SAME")
    variables = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(variables, x)
    got = fast.apply(variables, x)  # same param tree by construction
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_strided_fallback_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 8, 3)).astype(np.float32))
    ref = nn.Conv(6, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
    fast = FastConv(6, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
    variables = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(fast.apply(variables, x)),
        np.asarray(ref.apply(variables, x)),
        rtol=1e-5, atol=1e-6,
    )


def test_dilated_fallback_matches(rng):
    x = jnp.asarray(rng.standard_normal((1, 9, 9, 9, 3)).astype(np.float32))
    ref = nn.Conv(2, (3, 3, 3), kernel_dilation=(3, 3, 3), padding="SAME")
    fast = FastConv(2, (3, 3, 3), kernel_dilation=(3, 3, 3), padding="SAME")
    variables = ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(fast.apply(variables, x)),
        np.asarray(ref.apply(variables, x)),
        rtol=1e-5, atol=1e-6,
    )


def test_param_tree_named_conv():
    """Auto-naming must produce Conv_<i> so saliency checkpoints written
    before the FastConv swap keep loading."""

    class Parent(nn.Module):
        @nn.compact
        def __call__(self, x):
            return FastConv(2, (1, 1, 1))(x)

    v = Parent().init(jax.random.PRNGKey(0), jnp.zeros((1, 2, 2, 2, 3)))
    assert list(v["params"].keys()) == ["Conv_0"]
    assert set(v["params"]["Conv_0"].keys()) == {"kernel", "bias"}
    assert v["params"]["Conv_0"]["kernel"].shape == (1, 1, 1, 3, 2)


def test_bf16_dtype(rng, monkeypatch):
    monkeypatch.setenv("POINTUNET_FASTCONV", "1")
    x = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)).astype(np.float32))
    fast = FastConv(8, (3, 3, 3), dtype=jnp.bfloat16)
    v = fast.init(jax.random.PRNGKey(0), x)
    y = fast.apply(v, x)
    assert y.dtype == jnp.bfloat16
    assert v["params"]["kernel"].dtype == jnp.float32


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_fused_upsample_conv_exact(scale, rng):
    """fused_upsample_conv3d == conv3d_SAME(nearest_upsample(x))."""
    from pointunet_tpu.models.fastconv import (
        _nearest_upsample, fused_upsample_conv3d)

    x = jnp.asarray(rng.standard_normal((1, 3, 4, 5, 6)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 6, 7)).astype(np.float32))
    want = jax.lax.conv_general_dilated(
        _nearest_upsample(x, scale), w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    got = fused_upsample_conv3d(x, w, scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("scale", [2, 4])
def test_fastconv_upsample_field(scale, rng, monkeypatch):
    """FastConv(upsample=s) == nearest-repeat then plain conv, for both the
    fused path and the explicit-repeat fallback (env-disabled)."""
    x = jnp.asarray(rng.standard_normal((1, 3, 4, 4, 5)).astype(np.float32))
    ref = nn.Conv(4, (3, 3, 3), padding="SAME")
    variables = ref.init(jax.random.PRNGKey(0), x)
    from pointunet_tpu.models.fastconv import _nearest_upsample

    want = ref.apply(variables, _nearest_upsample(x, scale))
    for env in ("1", "0"):
        monkeypatch.setenv("POINTUNET_FUSED_UPSAMPLE", env)
        monkeypatch.setenv("POINTUNET_FASTCONV", "0")
        got = FastConv(4, (3, 3, 3), padding="SAME", upsample=scale).apply(
            variables, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
