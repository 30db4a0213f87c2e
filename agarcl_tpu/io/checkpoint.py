"""Native full-state checkpoints (batched pytrees).

The reference's JSON snapshots (io/snapshot.py) are lossy — recombine timers,
virus food-hit counters, and the tick counter are dropped
(SURVEY §5 checkpoint/resume). This module stores the COMPLETE GameState
pytree (single env or a whole vectorized batch) losslessly, so long
continual-RL runs can stop and resume bit-exactly.

Format: numpy .npz of every leaf + a small JSON header of the EnvConfig used
to create it (validated on load).
"""

from __future__ import annotations

import dataclasses
import json

import jax
import numpy as np

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState, zero_state


def save_checkpoint(path: str, cfg: EnvConfig, state: GameState) -> None:
    leaves = {f.name: np.asarray(getattr(state, f.name))
              for f in dataclasses.fields(state)}
    header = json.dumps(dataclasses.asdict(cfg))
    np.savez_compressed(path, __config__=np.frombuffer(
        header.encode(), dtype=np.uint8), **leaves)


def load_checkpoint(path: str, cfg: EnvConfig = None):
    """Returns (cfg, state). If cfg is given, it must match the stored one."""
    with np.load(path) as data:
        header = json.loads(bytes(data["__config__"]).decode())
        stored_cfg = EnvConfig(**header)
        if cfg is not None and cfg != stored_cfg:
            raise ValueError(
                f"checkpoint config mismatch: stored {stored_cfg} != {cfg}")
        cfg = stored_cfg
        template = zero_state(cfg)
        kw = {f.name: jax.numpy.asarray(data[f.name])
              for f in dataclasses.fields(template)}
    return cfg, GameState(**kw)
