"""Training/eval for the saliency-attention 3D U-Net (stage 1).

TPU-first redesign of the reference tensorpack driver (reference
SaliencyAttention/train.py:44-118, 263-296):

* Momentum SGD (0.9) with the reference's stepped lr schedule
  (BASE_LR=0.01, drops at epochs 20/70/110/150/280 — train.py:276-281)
  and L2 weight decay 1e-5 on conv kernels (train.py:100-107);
* per-sample weighted soft-dice loss over softmax (model.py:592-618);
* one jit per step; batches sharded over the mesh's data axis under GSPMD;
* whole-volume eval through the jitted sliding-window op (ops/window.py)
  instead of the reference's per-window host loop.
"""
from __future__ import annotations

import functools
import time
from typing import Any, Callable, Iterable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import core as flax_core

from ..core.config import SaliencyConfig, TrainConfig
from ..models.losses import saliency_dice_loss
from ..models.saliency_unet import SaliencyUNet, UNet3D, init_saliency_unet
from ..ops.window import sliding_window_inference
from .metrics import binary_dice


class SaliencyTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array


def _kernel_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(p, "key", None) == "kernel" for p in path
        ),
        params,
    )


class SaliencyTrainer:
    def __init__(
        self,
        config: SaliencyConfig,
        train_config: Optional[TrainConfig] = None,
        mesh=None,
        attention: bool = True,
    ):
        self.cfg = config
        self.tcfg = train_config or TrainConfig()
        self.mesh = mesh
        self.attention = attention
        self.model = (SaliencyUNet if attention else UNet3D)(config)
        if self.tcfg.debug_nans:
            from ..core.debug import enable_nan_trap

            enable_nan_trap(True)
        self._schedule = self._make_schedule()
        self._tx_template = None
        self._predict_cache = {}
        self._build_steps()

    def _make_schedule(self):
        cfg = self.cfg
        # optax.piecewise_constant_schedule multiplies the scales passed at
        # each boundary CUMULATIVELY, so each boundary's scale must be the
        # ratio to the PREVIOUS value, not to base_lr — otherwise the lr
        # collapses (e.g. 5e-5 instead of 5e-4 after the second drop)
        prev = cfg.base_lr
        boundaries = {}
        for epoch, value in cfg.lr_schedule:
            boundaries[int(epoch * cfg.steps_per_epoch)] = value / prev
            prev = value
        return optax.piecewise_constant_schedule(cfg.base_lr, boundaries)

    def _make_tx(self, params):
        return optax.chain(
            optax.add_decayed_weights(
                self.cfg.weight_decay, mask=_kernel_mask(params)
            ),
            optax.sgd(self._schedule, momentum=0.9),
        )

    def init_state(self, seed: int = 0) -> SaliencyTrainState:
        rng = jax.random.PRNGKey(seed)
        _, variables = init_saliency_unet(
            rng, self.cfg, attention=self.attention
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", flax_core.freeze({}))
        self.tx = self._make_tx(params)
        opt_state = self.tx.init(params)
        return SaliencyTrainState(
            params, batch_stats, opt_state, jnp.zeros((), jnp.int32), rng
        )

    def _apply(self, params, batch_stats, images, train):
        variables = {"params": params}
        has_bn = bool(jax.tree_util.tree_leaves(batch_stats))
        if has_bn:
            variables["batch_stats"] = batch_stats
        if train and has_bn:
            logits, mutated = self.model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            return logits, mutated["batch_stats"]
        logits = self.model.apply(variables, images, train=train)
        return logits, batch_stats

    def _build_steps(self):
        def micro_loss(params, batch_stats, images, weights, labels):
            logits, bs = self._apply(params, batch_stats, images, train=True)
            if labels.ndim == logits.ndim:
                # mixed one-hot targets (MIXUP path, reference
                # model.py:550-618)
                from ..models.losses import saliency_dice_loss_mixup

                loss = saliency_dice_loss_mixup(logits, weights, labels)
            else:
                loss = saliency_dice_loss(logits, weights, labels)
            return loss, bs

        def train_step(state: SaliencyTrainState, images, weights, labels):
            """Gradient accumulation over size-1 micro-batches.

            One (64,160,160) sample's backward peaks ~12 GB even with block
            remat, so the reference's batch of 2 runs as a lax.scan of
            per-sample grads — identical math (the dice loss is a
            batch-mean of per-sample terms) at half the activation memory.
            """
            grad_fn = jax.value_and_grad(micro_loss, has_aux=True)
            b = images.shape[0]

            def body(carry, micro):
                grads_acc, loss_acc, bs = carry
                im, w, lab = micro
                (loss, bs), grads = grad_fn(
                    state.params, bs, im[None], w[None], lab[None]
                )
                grads_acc = jax.tree_util.tree_map(
                    lambda a, g: a + g, grads_acc, grads
                )
                return (grads_acc, loss_acc + loss, bs), None

            zero_grads = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (grads, loss, batch_stats), _ = jax.lax.scan(
                body,
                (zero_grads, jnp.zeros((), jnp.float32), state.batch_stats),
                (images, weights, labels),
            )
            grads = jax.tree_util.tree_map(lambda g: g / b, grads)
            loss = loss / b

            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
            return (
                SaliencyTrainState(
                    params, batch_stats, opt_state, state.step + 1, state.rng
                ),
                {"loss": loss},
            )

        self.train_step = jax.jit(train_step, donate_argnums=(0,))

        def predict_patch(state: SaliencyTrainState, images):
            logits, _ = self._apply(
                state.params, state.batch_stats, images, train=False
            )
            return jax.nn.softmax(logits, axis=-1)

        self.predict_patch = jax.jit(predict_patch)

    def predict_volume(
        self,
        state: SaliencyTrainState,
        volume_dhwc: jax.Array,
        dynamic_shape: bool = False,
    ) -> np.ndarray:
        """Sliding-window softmax probabilities for one (D, H, W, C) volume.

        dynamic_shape grows the patch to cover the whole volume in one
        window (reference DYNAMIC_SHAPE_PRED, eval.py:195-284) at the cost
        of a per-shape compile.
        """
        cfg = self.cfg
        if dynamic_shape:
            patch = tuple(
                max(((s + 15) // 16) * 16, p)
                for s, p in zip(volume_dhwc.shape[:3],
                                cfg.inference_patch_size)
            )
        else:
            patch = tuple(cfg.inference_patch_size)

        # jit caches by function identity: memoize per patch size so eval
        # over N volumes compiles once per shape, not once per volume
        fn = self._predict_cache.get(patch)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    self._sliding_window, patch=patch
                )
            )
            self._predict_cache[patch] = fn
        return np.asarray(
            fn(volume_dhwc, state.params, state.batch_stats)
        )

    def _sliding_window(self, volume, params, batch_stats, *, patch):
        cfg = self.cfg

        def model_fn(window):
            logits, _ = self._apply(params, batch_stats, window, train=False)
            return jax.nn.softmax(logits, axis=-1)

        return sliding_window_inference(
            volume,
            model_fn,
            patch,
            (cfg.xstep, cfg.ystep, cfg.zstep),
            cfg.num_class,
        )

    # view transposes (reference utils.transpose_volumes + the inverse
    # transposes in segment_one_image, eval.py:370-378)
    _DIR_FWD = {"axial": (0, 1, 2), "sagittal": (2, 0, 1), "coronal": (1, 0, 2)}
    _DIR_INV = {"axial": (0, 1, 2), "sagittal": (1, 2, 0), "coronal": (1, 0, 2)}

    def predict_volume_tta(
        self,
        state: SaliencyTrainState,
        volume_dhwc,
        direction: str = "axial",
        test_flip: bool = False,
    ) -> np.ndarray:
        """predict_volume with view transposition and optional flip TTA
        (reference DIRECTION / TEST_FLIP, eval.py:355-411)."""
        vol = np.asarray(volume_dhwc)
        fwd = self._DIR_FWD[direction] + (3,)
        inv = self._DIR_INV[direction] + (3,)
        probs = self.predict_volume(
            state, jnp.asarray(np.transpose(vol, fwd))
        ).transpose(inv)
        if test_flip:
            flipped = self.predict_volume(
                state, jnp.asarray(np.transpose(vol[:, :, ::-1], fwd))
            ).transpose(inv)[:, :, ::-1]
            probs = 0.5 * (probs + flipped)
        return probs

    def predict_volume_multiview(
        self, states, volume_dhwc, test_flip: bool = False
    ) -> np.ndarray:
        """Average axial/sagittal/coronal model predictions (reference
        MULTI_VIEW path, eval.py:301-315). ``states`` is a list of three
        train states in that direction order."""
        directions = ("axial", "sagittal", "coronal")
        probs = None
        for state, direction in zip(states, directions):
            p = self.predict_volume_tta(
                state, volume_dhwc, direction, test_flip
            )
            probs = p if probs is None else probs + p
        return probs / len(states)

    def evaluate(
        self, state, records, log: Callable = print
    ) -> float:
        """Whole-volume binary dice over held-out records
        (reference train.py:120-157 EvalCallback -> eval_pancreas)."""
        dices = []
        for rec in records:
            vol = np.moveaxis(rec.image, 0, -1)       # (D, H, W, C)
            probs = self.predict_volume(state, jnp.asarray(vol))
            pred = probs.argmax(-1)
            dices.append(binary_dice(pred, rec.label))
        mean = float(np.mean(dices)) if dices else 0.0
        log(f"eval mean dice: {mean:.4f} over {len(dices)} volumes")
        return mean

    def fit(
        self,
        state: SaliencyTrainState,
        batch_iter: Iterable,
        eval_records=None,
        checkpointer=None,
        log: Callable = print,
        max_steps: Optional[int] = None,
        metrics=None,
    ) -> SaliencyTrainState:
        """``metrics``: optional core.metrics_sink.MetricsLogger — scalar
        parity with tensorpack's moving summaries (reference train.py:109)."""
        cfg = self.cfg
        total = max_steps or cfg.steps_per_epoch * cfg.max_epoch
        best = -1.0
        t0 = time.time()
        from ..data.prefetch import prefetch

        batch_iter = prefetch(batch_iter, self.tcfg.prefetch_buffers)
        for i, (images, weights, labels) in enumerate(batch_iter):
            if i >= total:
                break
            state, m = self.train_step(
                state,
                jnp.asarray(images),
                jnp.asarray(weights),
                jnp.asarray(labels),
            )
            step = int(state.step)
            if step % self.tcfg.log_every == 0:
                dt = (time.time() - t0) * 1000 / self.tcfg.log_every
                log(
                    f"Step {step:08d} dice_loss={float(m['loss']):.4f} "
                    f"---{dt:8.2f} ms/batch"
                )
                if metrics is not None:
                    metrics.log(
                        step,
                        loss=float(m["loss"]),
                        lr=float(self._schedule(step)),
                        ms_per_batch=dt,
                    )
                t0 = time.time()
            epoch_end = step % cfg.steps_per_epoch == 0
            if epoch_end:
                epoch = step // cfg.steps_per_epoch
                # periodic snapshot every 20 epochs (reference ModelSaver,
                # train.py:273-275)
                if checkpointer is not None and epoch % 20 == 0:
                    checkpointer.save(state, step)
                if eval_records is not None and epoch % cfg.eval_epoch == 0:
                    dice = self.evaluate(state, eval_records, log)
                    if metrics is not None:
                        metrics.log(step, eval_dice=dice, epoch=epoch)
                    if dice > best:
                        best = dice
                        if checkpointer is not None:
                            checkpointer.save(state, step, dice)
        return state
