"""A/B the fused Pallas 3x3x3 conv vs the shipped conv paths on TPU.

Shapes = the attention stage's full-res tail at the BraTS ROI window
(192, 208, 155 -> z-padded 160): the convs the r4 locator measured at
2-16% MFU (docs/ATTENTION_STAGE.md). Honest relay timing: scalar-sum
fetch, >=5 reps, median.

Run (TPU):  PYTHONPATH=. python docs/profile_conv_pallas.py
"""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from pointunet_tpu.models.fastconv import fast_conv3d
from pointunet_tpu.ops.conv_pallas import conv3d_3x3_pallas

SHAPES = [
    # (label, (Z, Y, X, Cin), Cout)
    ("c1_16to64", (160, 208, 192, 16), 64),
    ("c12_128to64", (160, 208, 192, 128), 64),
    ("tail_64to64", (160, 208, 192, 64), 64),
    ("final_128to2", (160, 208, 192, 128), 2),
]


def timed(fn, *args, reps=7):
    f = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    float(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(*args))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    dt = jnp.bfloat16
    out = {}
    for label, shape, cout in SHAPES:
        z, y, xw, cin = shape
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.float32).astype(dt)
        w = (jax.random.normal(key, (3, 3, 3, cin, cout), jnp.float32)
             * 0.05).astype(dt)

        t_native = timed(
            lambda a, b: jax.lax.conv_general_dilated(
                a[None], b, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )[0], x, w,
        )
        t_fast = timed(lambda a, b: fast_conv3d(a[None], b, 0)[0], x, w)
        t_pallas = timed(conv3d_3x3_pallas, x, w)

        # correctness spot-check on-chip at a REDUCED spatial shape (the
        # full-shape f32 reference plus the timed jits' buffers exceeds
        # HBM when several 128-channel shapes run back to back)
        xs_ = x[:16, :24]
        ref = fast_conv3d(xs_[None].astype(jnp.float32),
                          w.astype(jnp.float32), 0)[0]
        got = conv3d_3x3_pallas(xs_, w).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(got - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        del ref, got, x, w
        jax.clear_caches()
        flop = 2 * z * y * xw * 27 * cin * cout
        out[label] = {
            "xla_native_ms": round(t_native, 2),
            "fast_conv3d_ms": round(t_fast, 2),
            "pallas_ms": round(t_pallas, 2),
            "pallas_mfu": round(flop / (t_pallas / 1e3) / 197e12, 3),
            "rel_err_vs_f32": round(err, 5),
        }
        print(label, out[label], flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "perf", "conv_pallas_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
