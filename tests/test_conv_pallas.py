"""conv3d_3x3_pallas vs lax.conv_general_dilated (interpret on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointunet_tpu.ops import conv_pallas


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    if jax.default_backend() != "tpu":
        monkeypatch.setattr(
            conv_pallas.pl, "pallas_call",
            functools.partial(conv_pallas.pl.pallas_call, interpret=True),
        )
        # re-jit per test so the patched pallas_call is traced
        monkeypatch.setattr(
            conv_pallas, "conv3d_3x3_pallas",
            jax.jit(
                conv_pallas.conv3d_3x3_pallas.__wrapped__,
                static_argnames=("bz", "by"),
            ),
        )
    yield


def _ref_conv(x, w):
    return jax.lax.conv_general_dilated(
        x[None], w, (1, 1, 1), "SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )[0]


@pytest.mark.parametrize("shape,cin,cout", [
    ((8, 16, 24, 8), 8, 16),     # divisible z/y
    ((7, 13, 24, 8), 8, 4),      # pad-to-block z/y
    ((5, 9, 16, 16), 16, 8),
])
def test_conv_pallas_matches_xla(shape, cin, cout):
    z, y, xw, _ = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((z, y, xw, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, cin, cout)) * 0.1,
                    jnp.float32)
    got = conv_pallas.conv3d_3x3_pallas(x, w, bz=4, by=8)
    want = _ref_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_conv_pallas_batched():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 8, 8)) * 0.1, jnp.float32)
    got = conv_pallas.conv3d_3x3_pallas_batched(x, w)
    want = jnp.stack([_ref_conv(x[b], w) for b in range(2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
