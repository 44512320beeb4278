"""Background prefetch iterator (the QueueInput role)."""
import time

import numpy as np
import pytest

from pointunet_tpu.data.prefetch import PrefetchIterator, prefetch, prefetch_map


def test_prefetch_preserves_order_and_items():
    items = list(range(57))
    out = list(prefetch(iter(items), buffer_size=4))
    assert out == items


def test_prefetch_disabled_passthrough():
    src = iter([1, 2, 3])
    assert prefetch(src, buffer_size=0) is src


def test_prefetch_overlaps_producer_and_consumer():
    """With a buffer, slow production overlaps slow consumption."""

    def slow_gen(n, dt):
        for i in range(n):
            time.sleep(dt)
            yield i

    n, dt = 8, 0.05
    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(n, dt), buffer_size=4):
        time.sleep(dt)  # consumer work
    overlapped = time.perf_counter() - t0
    # serial would be ~2*n*dt = 0.8 s; overlapped should be well under
    assert overlapped < 1.7 * n * dt, overlapped


def test_prefetch_propagates_exception():
    def bad_gen():
        yield 1
        raise ValueError("boom")

    it = PrefetchIterator(bad_gen(), buffer_size=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_close_stops_producer():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    it = PrefetchIterator(gen(), buffer_size=2)
    next(it)
    it.close()
    time.sleep(0.2)
    n_after = len(produced)
    time.sleep(0.3)
    assert len(produced) == n_after  # producer stopped


def test_prefetch_map_ordered():
    def f(x):
        time.sleep(0.01 * (x % 3))
        return x * x

    out = list(prefetch_map(f, list(range(20)), num_threads=3))
    assert out == [x * x for x in range(20)]


def test_trainer_fit_uses_prefetch(rng):
    """SaliencyTrainer.fit consumes a generator through the prefetcher and
    still trains (2 tiny steps)."""
    import jax.numpy as jnp

    from pointunet_tpu.core import TrainConfig, pancreas_saliency_config
    from pointunet_tpu.train.saliency import SaliencyTrainer

    cfg = pancreas_saliency_config(
        patch_size=(16, 32, 32), base_filter=4, batch_size=1, depth=3,
        remat=False, deep_supervision=False, steps_per_epoch=2,
    )
    trainer = SaliencyTrainer(
        cfg, TrainConfig(donate_state=False, prefetch_buffers=2),
        attention=False,
    )
    state = trainer.init_state()

    def batches():
        while True:
            img = rng.standard_normal((1, 16, 32, 32, 1)).astype(np.float32)
            w = np.ones((1, 16, 32, 32), np.float32)
            lab = np.zeros((1, 16, 32, 32), np.int32)
            lab[:, 4:10, 8:20, 8:20] = 1
            yield img, w, lab

    state = trainer.fit(state, batches(), max_steps=2)
    assert int(state.step) == 2
