"""Learning-rate schedules (config parity with reference
``scripts/training/models.py`` LR_SCHEDULES :29-33 / get_learning_rate
:63-87): constant, exponential decay, piecewise constant."""

from __future__ import annotations

from typing import Any, Dict, Union

import optax


def get_learning_rate(lr: Union[float, Dict[str, Any]]):
    """Resolve a config value to an optax schedule or float."""
    if isinstance(lr, (int, float)):
        return float(lr)
    if not isinstance(lr, dict):
        raise TypeError(f"Unknown learning rate config: {lr!r}")
    name = lr.get("name")
    if name == "constant":
        return float(lr["value"])
    if name == "exponential":
        # Keras ExponentialDecay(initial_learning_rate, decay_steps,
        # decay_rate, staircase).
        return optax.exponential_decay(
            init_value=float(lr["initial_learning_rate"]),
            transition_steps=int(lr["decay_steps"]),
            decay_rate=float(lr["decay_rate"]),
            staircase=bool(lr.get("staircase", False)),
        )
    if name == "piecewise":
        # Keras PiecewiseConstantDecay(boundaries, values): values[0]
        # applies while step <= boundaries[0] (inclusive), but
        # optax.join_schedules switches AT the boundary count -- shift
        # by one so the reference's step-for-step LR sequence is
        # reproduced exactly.
        boundaries = [int(b) + 1 for b in lr["boundaries"]]
        values = [float(v) for v in lr["values"]]
        return optax.join_schedules(
            schedules=[optax.constant_schedule(v) for v in values],
            boundaries=boundaries,
        )
    raise ValueError(f"Unknown learning rate type: {name}")
