"""Training harness: jitted steps, data-parallel mesh, checkpoints.

TPU-native replacement for the reference's Keras fit machinery
(reference ``scripts/training/train_local.py`` + keras_models train_step):

- One jitted train step with params/optimizer-state DONATED (in-place HBM
  update, no copies).
- Data parallelism: the batch is sharded over a 1-D mesh axis; params and
  optimizer state are replicated.  The loss is a global mean, so XLA
  inserts the gradient psum over ICI automatically -- there is no
  per-replica loss rescaling (the reference divides by
  ``num_replicas_in_sync``; that bookkeeping disappears under pjit).
- GAN discriminator gating runs inside the step as ``lax.cond`` on the
  t_balance EMA carried in the train state (reference tf.cond :682-691).
- Checkpoints: flat-npz params + optimizer state + EMA + step, with
  best/latest retention like the reference's ModelCheckpoint pair
  (train_local.py:116-129).
- NaN termination (reference TerminateOnNaN, keras_callbacks.py:111-122)
  and early stopping (train_local.py:130-136).
"""

from __future__ import annotations

import collections
import dataclasses
import json
import os
import queue as queue_mod
import threading
import time
from typing import Any, Callable, Dict, Iterable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from joshupscale_tpu.export.importer import (
    flatten_params,
    unflatten_into,
)
from joshupscale_tpu.training.schedules import get_learning_rate


# ---------------------------------------------------------------------------
# Freezing


def freeze_mask(params, frozen_paths: Tuple[str, ...], trainable: bool = True):
    """Pytree of 0/1 multipliers: 0 for frozen subtrees (dotted paths)."""

    def walk(tree, path):
        if isinstance(tree, dict):
            return {
                k: walk(v, f"{path}.{k}" if path else str(k))
                for k, v in tree.items()
            }
        if isinstance(tree, list):
            return [
                walk(v, f"{path}.{i}" if path else str(i))
                for i, v in enumerate(tree)
            ]
        frozen = (not trainable) or any(
            path == p or path.startswith(p + ".") for p in frozen_paths
        )
        return 0.0 if frozen else 1.0

    return walk(params, "")


def apply_mask(grads, mask):
    return jax.tree_util.tree_map(lambda g, m: g * m, grads, mask)


# ---------------------------------------------------------------------------
# Batch-norm moving-stat merge


def _set_path(tree, parts, stats):
    if not parts:
        return {**tree, **stats}
    head = parts[0]
    if isinstance(tree, dict):
        return {
            **tree,
            head: _set_path(tree[head], parts[1:], stats),
        }
    if isinstance(tree, list):
        i = int(head)
        out = list(tree)
        out[i] = _set_path(tree[i], parts[1:], stats)
        return out
    raise KeyError(f"Cannot descend into {type(tree)} at {head}")


def merge_bn_updates(params, updates: Dict[str, dict],
                     strip_prefixes: Tuple[str, ...] = ("",)):
    """Write collected moving-stat updates back into the param tree.

    ``updates`` maps dotted paths (as recorded by Mutables) to dicts of
    new stat values.  ``strip_prefixes`` are tried in order; a path whose
    prefix matches none is ignored (it belongs to another param group).
    When several updates target the same path (e.g. discriminator real
    and fake calls), the later entry wins -- one moving-average update
    per step, matching the order-of-magnitude of the reference's
    sequential assign_adds.
    """
    for path, stats in updates.items():
        for prefix in strip_prefixes:
            if prefix and not path.startswith(prefix):
                continue
            rel = path[len(prefix):] if prefix else path
            params = _set_path(params, rel.split("."), stats)
            break
    return params


# ---------------------------------------------------------------------------
# Train states


@dataclasses.dataclass
class TrainState:
    """Single-group state (FRVSR)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree(self):
        return {
            "params": self.params,
            "opt_state": self.opt_state,
            "step": self.step,
        }


@dataclasses.dataclass
class GANTrainState:
    """Two-group state (generator+flow, discriminator) plus EMA gating."""

    gen_params: Any
    discr_params: Any
    gen_opt_state: Any
    discr_opt_state: Any
    ema: Dict[str, jnp.ndarray]
    step: jnp.ndarray

    def tree(self):
        return {
            "gen_params": self.gen_params,
            "discr_params": self.discr_params,
            "gen_opt_state": self.gen_opt_state,
            "discr_opt_state": self.discr_opt_state,
            "ema": self.ema,
            "step": self.step,
        }


def init_train_state(params, optimizer) -> "TrainState":
    """Fresh FRVSR train state.

    Copies the param arrays: the jitted steps DONATE their state, so a
    state must own its buffers -- registry BuiltModels share param arrays
    between trainers (e.g. frvsr and gan reference the same flow tree),
    and donating shared arrays deletes them under the other trainer.
    """
    params = jax.tree_util.tree_map(jnp.array, params)
    return TrainState(
        params, optimizer.init(params), jnp.zeros((), jnp.int32)
    )


def init_gan_state(trainer, gen_params, discr_params, gen_optimizer,
                   discr_optimizer) -> "GANTrainState":
    """Fresh GAN train state (copies params; see init_train_state)."""
    gen_params = jax.tree_util.tree_map(jnp.array, gen_params)
    discr_params = jax.tree_util.tree_map(jnp.array, discr_params)
    return GANTrainState(
        gen_params=gen_params,
        discr_params=discr_params,
        gen_opt_state=gen_optimizer.init(gen_params),
        discr_opt_state=discr_optimizer.init(discr_params),
        ema=trainer.init_ema(),
        step=jnp.zeros((), jnp.int32),
    )


# ---------------------------------------------------------------------------
# Step builders


def make_optimizer(learning_rate=0.0005) -> optax.GradientTransformation:
    """Adam with Keras defaults (reference compile(): Adam(lr))."""
    return optax.adam(get_learning_rate(learning_rate), b1=0.9, b2=0.999,
                      eps=1e-7)


def build_frvsr_step(
    trainer,
    optimizer: optax.GradientTransformation,
    mask=None,
    l2_reg: float = 0.0,
    mesh: Optional[Mesh] = None,
    steps_per_execution: int = 1,
) -> Callable:
    """Jitted FRVSR train step: (state, batch, rng) -> (state, metrics).

    ``steps_per_execution > 1`` compiles a ``lax.scan`` over K optimizer
    steps into ONE executable (the TPU analog of the reference's
    ``steps_per_execution`` / ``unrolled_steps_per_execution`` knobs,
    train_local.py:169-171): the batch argument becomes a stacked
    (K, B, ...) tree and host dispatch overhead is paid once per K.
    """
    k = int(steps_per_execution)

    def step(params, opt_state, step_no, batch, rng):
        (_, aux), grads = jax.value_and_grad(
            trainer.loss, has_aux=True
        )(params, batch, rng, l2_reg)
        if mask is not None:
            grads = apply_mask(grads, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = merge_bn_updates(params, aux["bn_updates"])
        return params, opt_state, step_no + 1, aux["metrics"]

    if k > 1:
        inner = step

        def step(params, opt_state, step_no, batches, rng):
            def body(carry, batch):
                p, o, s = carry
                sub_rng = jax.random.fold_in(rng, s)
                p, o, s, metrics = inner(p, o, s, batch, sub_rng)
                return (p, o, s), metrics

            (params, opt_state, step_no), metrics = jax.lax.scan(
                body, (params, opt_state, step_no), batches
            )
            metrics = jax.tree_util.tree_map(
                lambda m: m.mean(), metrics
            )
            return params, opt_state, step_no, metrics

    jit_kwargs: Dict[str, Any] = {"donate_argnums": (0, 1, 2)}
    data = None
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(
            mesh,
            P(None, mesh.axis_names[0]) if k > 1
            else P(mesh.axis_names[0]),
        )
        jit_kwargs["in_shardings"] = (repl, repl, repl, data, repl)
        jit_kwargs["out_shardings"] = (repl, repl, repl, repl)
    jitted = jax.jit(step, **jit_kwargs)

    def run(state: TrainState, batch, rng):
        params, opt_state, step_no, metrics = jitted(
            state.params, state.opt_state, state.step, batch, rng
        )
        return TrainState(params, opt_state, step_no), metrics

    run.steps_per_execution = k
    run.input_sharding = data  # fit()'s stager pre-places batches
    return run


def build_gan_step(
    trainer,
    gen_optimizer: optax.GradientTransformation,
    discr_optimizer: optax.GradientTransformation,
    vgg_params,
    gen_mask=None,
    discr_mask=None,
    l2_reg: float = 0.0,
    mesh: Optional[Mesh] = None,
    steps_per_execution: int = 1,
) -> Callable:
    """Jitted GAN train step with t_balance-gated discriminator update.

    ``steps_per_execution > 1``: lax.scan over K optimizer steps per
    executable (batch becomes a stacked (K, B, ...) tree), like
    build_frvsr_step.
    """
    cfg = trainer.config()
    t1_threshold = cfg["t_balance1_threshold"]
    k = int(steps_per_execution)

    def step(gen_params, discr_params, gen_opt, discr_opt, ema, step_no,
             vgg_p, batch, rng):
        def loss_fn(gp, dp):
            y = trainer.forward(
                gp, dp, vgg_p, batch["input"], batch["target"], rng,
                training=True,
            )
            terms = trainer.compute_losses(y, ema, gp, dp, l2_reg)
            return (
                (terms["gen_loss"], terms["discr_loss"]),
                (terms, y["bn_updates"]),
            )

        # Shared forward, two cotangent pulls (one tape, two losses).
        (gen_loss, discr_loss), vjp, (terms, bn_updates) = jax.vjp(
            loss_fn, gen_params, discr_params, has_aux=True
        )
        one = jnp.ones_like(gen_loss)
        zero = jnp.zeros_like(gen_loss)
        gen_grads = vjp((one, zero))[0]
        discr_grads = vjp((zero, one))[1]
        if gen_mask is not None:
            gen_grads = apply_mask(gen_grads, gen_mask)
        if discr_mask is not None:
            discr_grads = apply_mask(discr_grads, discr_mask)

        gen_updates, gen_opt = gen_optimizer.update(
            gen_grads, gen_opt, gen_params
        )
        gen_params = optax.apply_updates(gen_params, gen_updates)
        gen_params = merge_bn_updates(
            gen_params, bn_updates, strip_prefixes=("gen.",)
        )

        ema = trainer.update_ema(
            ema, terms["t_balance1"], terms["t_balance2"]
        )

        def train_discr(args):
            dp, dopt = args
            updates, dopt = discr_optimizer.update(discr_grads, dopt, dp)
            dp = optax.apply_updates(dp, updates)
            return dp, dopt, jnp.int32(1)

        def skip_discr(args):
            dp, dopt = args
            return dp, dopt, jnp.int32(0)

        if t1_threshold is not None:
            discr_params, discr_opt, trained = jax.lax.cond(
                ema["t_balance1"] < t1_threshold,
                train_discr,
                skip_discr,
                (discr_params, discr_opt),
            )
        else:
            discr_params, discr_opt, trained = train_discr(
                (discr_params, discr_opt)
            )
        ema = {**ema, "discr_steps": ema["discr_steps"] + trained}
        discr_params = merge_bn_updates(
            discr_params, bn_updates,
            strip_prefixes=("discr.real.", "discr.fake."),
        )

        metrics = {
            k: v
            for k, v in terms.items()
            if k not in ("gen_loss", "discr_loss")
        }
        metrics["gen_loss"] = gen_loss
        metrics["discr_loss"] = discr_loss
        metrics["discr_steps"] = ema["discr_steps"]
        metrics["t_balance1_avg"] = ema["t_balance1"]
        metrics["t_balance2_avg"] = ema["t_balance2"]
        return (gen_params, discr_params, gen_opt, discr_opt, ema,
                step_no + 1, metrics)

    if k > 1:
        inner_gan = step

        def step(gen_params, discr_params, gen_opt, discr_opt, ema,
                 step_no, vgg_p, batches, rng):
            def body(carry, batch):
                gp, dp, go, do, e, s = carry
                sub_rng = jax.random.fold_in(rng, s)
                gp, dp, go, do, e, s, metrics = inner_gan(
                    gp, dp, go, do, e, s, vgg_p, batch, sub_rng
                )
                return (gp, dp, go, do, e, s), metrics

            carry, metrics = jax.lax.scan(
                body,
                (gen_params, discr_params, gen_opt, discr_opt, ema,
                 step_no),
                batches,
            )
            # Per-step losses average over the K inner steps (like
            # build_frvsr_step); only the CUMULATIVE counters/EMA
            # snapshots take the last value -- m[-1] on the losses
            # would make epoch metrics a one-in-K subsample.
            cumulative = ("discr_steps", "t_balance1_avg",
                          "t_balance2_avg")
            metrics = {
                name: (m[-1] if name in cumulative else m.mean())
                for name, m in metrics.items()
            }
            return carry + (metrics,)

    jit_kwargs: Dict[str, Any] = {"donate_argnums": (0, 1, 2, 3, 4, 5)}
    data = None
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(
            mesh,
            P(None, mesh.axis_names[0]) if k > 1
            else P(mesh.axis_names[0]),
        )
        jit_kwargs["in_shardings"] = (
            repl, repl, repl, repl, repl, repl, repl, data, repl
        )
        jit_kwargs["out_shardings"] = tuple([repl] * 7)
    jitted = jax.jit(step, **jit_kwargs)

    def run(state: GANTrainState, batch, rng):
        (gp, dp, gopt, dopt, ema, step_no, metrics) = jitted(
            state.gen_params, state.discr_params, state.gen_opt_state,
            state.discr_opt_state, state.ema, state.step, vgg_params,
            batch, rng,
        )
        return GANTrainState(gp, dp, gopt, dopt, ema, step_no), metrics

    run.steps_per_execution = k
    run.input_sharding = data  # fit()'s stager pre-places batches
    return run


# ---------------------------------------------------------------------------
# Checkpointing (flat npz of the full train state)


def save_checkpoint(path: str, state_tree) -> None:
    """Save a train state.  ``.npz`` paths use the flat-archive format;
    other paths use Orbax (async-capable, sharding-aware -- the
    TPU-idiomatic choice for large multi-host states)."""
    if path.endswith(".npz"):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        flat = flatten_params(jax.device_get(state_tree))
        np.savez(path, **flat)
        return
    import orbax.checkpoint as ocp

    # Store the flat dotted-path dict: stable across optax NamedTuple
    # versions and symmetric with the npz format.
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path),
            flatten_params(jax.device_get(state_tree)),
            force=True,
        )


def load_checkpoint(path: str, template_tree):
    if path.endswith(".npz"):
        with np.load(path, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}
        return unflatten_into(template_tree, flat)
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(path))
    return unflatten_into(template_tree, restored)


# ---------------------------------------------------------------------------
# Fit loop


class MeanAccumulator:
    """Host-side running means of step metrics (reference keras Mean
    trackers)."""

    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    def update(self, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            val = float(np.asarray(v))
            self._sums[k] = self._sums.get(k, 0.0) + val
            self._counts[k] = self._counts.get(k, 0) + 1

    def result(self) -> Dict[str, float]:
        return {
            k: self._sums[k] / max(self._counts[k], 1) for k in self._sums
        }

    def reset(self) -> None:
        self._sums.clear()
        self._counts.clear()


class TensorBoardLogger:
    """Scalar summaries via tf.summary (reference logs through Keras'
    TensorBoard callback).  No-op if tensorflow is unavailable."""

    def __init__(self, log_dir: str):
        try:
            import tensorflow as tf

            self._writer = tf.summary.create_file_writer(log_dir)
            self._tf = tf
        except Exception:  # pragma: no cover - tf missing
            self._writer = None

    def scalars(self, metrics: Dict[str, float], step: int) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, v, step=step)
            self._writer.flush()

    def histograms(self, params, step: int) -> None:
        """Weight histograms (reference logs them every 20 epochs)."""
        if self._writer is None:
            return
        from joshupscale_tpu.export.importer import flatten_params

        with self._writer.as_default():
            for path, arr in flatten_params(params).items():
                self._tf.summary.histogram(path, arr, step=step)
            self._writer.flush()

    def images(self, tag: str, frames, step: int) -> None:
        """(N, H, W, 3) uint8 RGB frames."""
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.image(tag, frames, step=step,
                                   max_outputs=4)
            self._writer.flush()


@jax.jit
def _normalize_u8_tree(batch):
    return jax.tree_util.tree_map(
        lambda x: (x.astype(jnp.float32) / 255.0 - 0.5)
        if x.dtype == jnp.uint8 else x,
        batch,
    )


def device_normalize(batch):
    """uint8 batches -> [-0.5, 0.5] f32 via a SEPARATE tiny program.

    Shipping u8 quarters the host->HBM transfer per step (the tfrecords
    TPU input layout), but feeding u8 straight into the jitted train
    step hangs the XLA:TPU worker (execution never returns, even at toy
    sizes -- see CLAUDE.md round-3 gotcha).  Running the convert as its
    own program first -- the mirror of the serving engine's deferred
    display -- keeps u8 out of the train graph while keeping the
    transfer win.  Float batches pass through untouched.
    """
    leaves = jax.tree_util.tree_leaves(batch)
    if not any(getattr(x, "dtype", None) == np.uint8 for x in leaves):
        return batch
    return _normalize_u8_tree(batch)


class _InputStager:
    """Background thread staging host batches onto the device.

    The round-5 fit-cost probe (tools/fit_cost_probe.py, real v5e via
    the tunnel) measured the synchronous ``jnp.asarray(batch)`` H2D as
    +230 ms/step at 8.4 MB/step (~46 MB/s tunnel bandwidth) — larger
    than the 163 ms GAN step itself.  The transfer is network-bound,
    not CPU-bound, so a single stager thread overlaps it with device
    compute even on this 1-core host: it pulls the next host batch,
    ``jax.device_put``s it (to the step's input sharding when the step
    is mesh-partitioned), runs the u8→f32 normalize program, and parks
    it in a 1-deep queue for the dispatch loop — the training-input
    analog of the serving engine's double-buffered ``process_async``.
    """

    _STOP = object()

    def __init__(self, batch_iter: Iterator, sharding=None,
                 depth: int = 1):
        self._q: "queue_mod.Queue" = queue_mod.Queue(maxsize=max(depth, 1))
        self._cancel = threading.Event()

        def _stage(batch):
            if sharding is not None:
                batch = jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sharding), batch)
            else:
                batch = jax.device_put(batch)
            return device_normalize(batch)

        def worker():
            try:
                for batch in batch_iter:
                    staged = _stage(batch)
                    while not self._cancel.is_set():
                        try:
                            self._q.put(staged, timeout=0.1)
                            break
                        except queue_mod.Full:
                            continue
                    else:
                        return
                self._put_forever((self._STOP, None))
            except BaseException as exc:  # forwarded to the consumer
                self._put_forever((self._STOP, exc))

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def _put_forever(self, item):
        while not self._cancel.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue_mod.Full:
                continue

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if isinstance(item, tuple) and item and item[0] is self._STOP:
            self.close()
            if item[1] is not None:
                raise item[1]
            raise StopIteration
        return item

    def close(self):
        self._cancel.set()


def fit(
    step_fn: Callable,
    state,
    train_data: Iterable[Dict[str, np.ndarray]],
    epochs: int,
    steps_per_epoch: int,
    rng: jax.Array,
    val_fn: Optional[Callable] = None,
    val_data: Optional[Iterable[Dict[str, np.ndarray]]] = None,
    checkpoint_dir: Optional[str] = None,
    monitor: str = "loss",
    early_stopping_patience: Optional[int] = None,
    log_fn: Callable[[str], None] = print,
    epoch_callback: Optional[Callable] = None,
    tensorboard_dir: Optional[str] = None,
    profile_dir: Optional[str] = None,
    profile_batch: Tuple[int, int] = (5, 10),
    metric_lag: Optional[int] = None,
    stage_inputs: bool = True,
    cache_val_on_device: bool = False,
):
    """Generic epoch loop: train, validate, checkpoint best+latest.

    Terminates on non-finite monitored metrics (reference TerminateOnNaN).
    When ``profile_dir`` is set, a ``jax.profiler`` trace covers global
    training steps ``profile_batch[0]..profile_batch[1]`` inclusive (the
    reference profiles batches 5-10 via the TensorBoard callback unless
    --disable-profile, train_local.py:106-110); view with TensorBoard or
    ``tools/profile_step.py``'s trace parser.

    ``metric_lag`` bounds how many executions' metric trees stay
    un-fetched on device; ``None`` (default) holds every tree until
    epoch end and fetches them all in ONE ``jax.device_get`` — the
    fit-cost probe measured per-metric fetching at +220 ms/step and
    even a per-step tree fetch at +75 ms/step through the tunnel.
    ``0`` restores the fully synchronous loop.  Epoch results are
    identical in every mode.

    ``stage_inputs`` runs host→device batch staging on a background
    thread (overlapped with device compute; see ``_InputStager``).
    Returns (state, history).
    """
    history = []
    best = float("inf")
    stale = 0
    acc = MeanAccumulator()
    pending_metrics = collections.deque()
    val_device_cache: list = []
    global_step = 0
    profiling = False
    tb = TensorBoardLogger(tensorboard_dir) if tensorboard_dir else None
    spe = getattr(step_fn, "steps_per_execution", 1)
    if spe > 1 and steps_per_epoch % spe:
        log_fn(
            f"steps_per_epoch={steps_per_epoch} is not a multiple of "
            f"steps_per_execution={spe}; running "
            f"{max(steps_per_epoch // spe, 1) * spe} steps per epoch"
        )

    def _host_batches():
        """Fully-formed host batches (incl. the K-step stacking)."""
        it = iter(train_data)

        def _next():
            # PEP 479 turns a leaking StopIteration into an opaque
            # RuntimeError mid-training; name the real cause instead.
            try:
                return next(it)
            except StopIteration:
                raise ValueError(
                    "train_data ran out of batches: the training "
                    "stream must be infinite (add a RepeatOp / repeat "
                    "the iterable) or cover epochs * steps_per_epoch "
                    "batches") from None

        while True:
            if spe > 1:
                group = [_next() for _ in range(spe)]
                yield jax.tree_util.tree_map(
                    lambda *xs: np.stack(xs), *group
                )
            else:
                yield _next()

    if stage_inputs:
        batch_iter: Iterator = _InputStager(
            _host_batches(),
            sharding=getattr(step_fn, "input_sharding", None),
        )
    else:
        batch_iter = map(device_normalize, _host_batches())

    def _drain_pending():
        """Fetch every held metric tree in one batched transfer."""
        if not pending_metrics:
            return
        for tree in jax.device_get(list(pending_metrics)):
            acc.update(tree)
        pending_metrics.clear()

    try:
        for epoch in range(epochs):
            acc.reset()
            t0 = time.time()
            executions = max(steps_per_epoch // spe, 1)
            for _ in range(executions):
                batch = next(batch_iter)
                rng, step_rng = jax.random.split(rng)
                if profile_dir is not None:
                    if not profiling and global_step >= profile_batch[0]:
                        jax.profiler.start_trace(profile_dir)
                        profiling = True
                    elif profiling and global_step > profile_batch[1]:
                        jax.profiler.stop_trace()
                        profiling = False
                state, metrics = step_fn(state, batch, step_rng)
                global_step += spe
                # Defer the metric fetch: jax dispatch is async, but
                # fetching a metric blocks the host until the step
                # finishes (a full round-trip per ARRAY through a remote
                # tunnel), serializing host batch prep against device
                # compute.  Holding the trees on device (scalars; bytes,
                # not MBs) and fetching them in one batched device_get at
                # epoch end costs ~one round-trip per EPOCH.
                pending_metrics.append(metrics)
                if metric_lag is not None and len(pending_metrics) > metric_lag:
                    acc.update(jax.device_get(pending_metrics.popleft()))
            _drain_pending()
            train_metrics = acc.result()
            if any(not np.isfinite(v) for v in train_metrics.values()):
                log_fn(f"epoch {epoch}: non-finite metric, terminating: "
                       f"{train_metrics}")
                break

            entry = {"epoch": epoch, "time": time.time() - t0,
                     **{f"train_{k}": v for k, v in train_metrics.items()}}
            if val_fn is not None and val_data is not None:
                vacc = MeanAccumulator()
                # Deterministic per-batch val rng: the FRVSR/GAN forward
                # draws a random first-frame pre_warp; a fresh key per
                # epoch would make val_loss (the checkpoint/early-stop
                # monitor) jitter by the draw instead of by the model.
                if val_device_cache:
                    # Opt-in (cache_val_on_device): the val set is
                    # immutable, so epochs 2+ skip the synchronous H2D
                    # re-upload + re-normalize of every batch (~8 MB,
                    # ~180 ms per batch through the tunnel).
                    for val_i, batch in enumerate(val_device_cache):
                        vacc.update(val_fn(state, batch,
                                           jax.random.fold_in(
                                               jax.random.PRNGKey(0),
                                               val_i)))
                else:
                    for val_i, batch in enumerate(val_data):
                        staged = device_normalize(jax.device_put(batch))
                        if cache_val_on_device:
                            val_device_cache.append(staged)
                        vacc.update(val_fn(state, staged,
                                           jax.random.fold_in(
                                               jax.random.PRNGKey(0),
                                               val_i)))
                entry.update(
                    {f"val_{k}": v for k, v in vacc.result().items()}
                )

            history.append(entry)
            if tb is not None:
                tb.scalars(
                    {k: v for k, v in entry.items()
                     if k not in ("epoch",) and isinstance(v, float)},
                    step=epoch,
                )
            log_fn(
                f"epoch {epoch}: "
                + " ".join(f"{k}={v:.4g}" for k, v in entry.items()
                           if k != "epoch")
            )

            if checkpoint_dir is not None:
                tree = state.tree() if hasattr(state, "tree") else state
                save_checkpoint(
                    os.path.join(checkpoint_dir, "latest.npz"), tree
                )
                with open(os.path.join(checkpoint_dir, "history.json"),
                          "w") as f:
                    json.dump(history, f)
            # Best-tracking runs with or without a checkpoint dir:
            # early stopping must not be coupled to checkpoint writes.
            current = entry.get(f"val_{monitor}",
                                entry.get(f"train_{monitor}"))
            if current is not None and current < best:
                best = current
                stale = 0
                if checkpoint_dir is not None:
                    save_checkpoint(
                        os.path.join(checkpoint_dir, "best.npz"),
                        state.tree() if hasattr(state, "tree")
                        else state,
                    )
            else:
                stale += 1
            if epoch_callback is not None:
                epoch_callback(epoch, state, entry)
            # Keras EarlyStopping: stop once `wait >= patience`
            # non-improving epochs have accumulated (reference
            # train_local.py:130-136).
            if (early_stopping_patience is not None
                    and stale >= early_stopping_patience):
                log_fn(f"early stopping at epoch {epoch}")
                break
    finally:
        # A raise out of the loop (compile error, user interrupt,
        # callback failure) must not leave an open profiler trace
        # or the stager thread spinning on q.put forever while
        # pinning staged device batches.
        if profiling:
            jax.profiler.stop_trace()
        if isinstance(batch_iter, _InputStager):
            batch_iter.close()
    return state, history
