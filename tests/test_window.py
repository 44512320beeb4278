import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.ops.window import sliding_window_inference, window_positions


def test_window_positions_match_reference():
    # reference eval.py:141-143 with D=155, crop 64, step 48
    np.testing.assert_array_equal(window_positions(155, 64, 48), [0, 48, 96])
    np.testing.assert_array_equal(window_positions(240, 160, 118), [0, 118])
    # patch larger than volume -> single window at 0
    np.testing.assert_array_equal(window_positions(32, 64, 48), [0])


def test_sliding_window_identity_model(rng):
    """With an identity 'model', averaging covered windows must return the
    original volume wherever it is covered."""
    vol = rng.standard_normal((10, 12, 12, 2)).astype(np.float32)

    def model(x):
        return x  # (1, pd, ph, pw, 2) -> itself

    out = sliding_window_inference(
        jnp.asarray(vol), model, (4, 6, 6), (3, 4, 4), num_classes=2
    )
    out = np.asarray(out)
    assert out.shape == vol.shape
    np.testing.assert_allclose(out, vol, rtol=1e-5, atol=1e-6)


def test_sliding_window_counts_overlap(rng):
    """A constant-one model must return exactly 1.0 after count division."""
    vol = rng.standard_normal((9, 9, 9, 1)).astype(np.float32)

    def model(x):
        return jnp.ones(x.shape[:-1] + (3,), jnp.float32)

    out = sliding_window_inference(
        jnp.asarray(vol), model, (4, 4, 4), (2, 3, 3), num_classes=3
    )
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)
