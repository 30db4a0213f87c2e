"""RAM (flat-vector) observations.

The reference *declares* a "ram" observation mode but never implements it
(gym_agario/AgarioEnv.py:52 accepts the string; _make_environment's assert at
AgarioEnv.py:211 rejects it; tests/ram_env_test.py targets a never-registered
env id — SURVEY §4). This module supplies the missing capability with a
fixed-shape ego-centric feature vector per agent:

  [ centroid_x/W, centroid_y/H, total_mass,
    per own cell slot (max_cells): rel_x, rel_y, mass, vel_x, vel_y, alive,
    K_p nearest pellets: rel_x, rel_y, alive,
    K_v nearest viruses: rel_x, rel_y, mass, alive,
    per player pid (num_players): rel_x, rel_y, total_mass, alive ]

Relative positions are in world units; dead/padded entries are zero. The
other-player block keeps one slot per pid (including self, zeroed) so shapes
stay static.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState


@dataclasses.dataclass(frozen=True)
class RamObsConfig:
    num_pellets: int = 32   # K_p nearest pellets
    num_viruses: int = 8    # K_v nearest viruses


def ram_size(cfg: EnvConfig, ocfg: RamObsConfig) -> int:
    kp = min(ocfg.num_pellets, cfg.pellet_capacity)
    kv = min(ocfg.num_viruses, cfg.virus_capacity)
    return 3 + cfg.max_cells * 6 + kp * 3 + kv * 4 + cfg.num_players * 4


def ram_frame(cfg: EnvConfig, ocfg: RamObsConfig,
              state: GameState) -> jnp.ndarray:
    """(A, ram_size) f32 observation for every agent."""
    A = cfg.num_agents
    centroid = state.player_centroid()           # (P,2)
    pmass = state.player_mass().astype(jnp.float32)
    palive = state.player_alive()

    me = centroid[:A]                            # (A,2)
    feats = [me / jnp.asarray([cfg.arena_width, cfg.arena_height],
                              jnp.float32),
             pmass[:A, None]]

    # own cells
    rel = state.cell_pos[:A] - me[:, None, :]
    a = state.cell_alive[:A][..., None].astype(jnp.float32)
    cells = jnp.concatenate(
        [rel * a, state.cell_mass[:A][..., None].astype(jnp.float32) * a,
         state.cell_vel[:A] * a, a], axis=-1)    # (A, Cc, 6)
    feats.append(cells.reshape(A, -1))

    def nearest(pos, alive, k, extra=None):
        rel = pos[None, :, :] - me[:, None, :]   # (A, N, 2)
        d2 = jnp.sum(rel * rel, axis=-1)
        d2 = jnp.where(alive[None, :], d2, jnp.inf)
        _, idx = jax.lax.top_k(-d2, k)           # k nearest
        sel_rel = jnp.take_along_axis(rel, idx[..., None], axis=1)
        sel_alive = jnp.take_along_axis(
            jnp.broadcast_to(alive[None, :], d2.shape), idx, axis=1)
        af = sel_alive[..., None].astype(jnp.float32)
        cols = [sel_rel * af]
        if extra is not None:
            sel_extra = jnp.take_along_axis(
                jnp.broadcast_to(extra[None, :].astype(jnp.float32),
                                 d2.shape), idx, axis=1)
            cols.append(sel_extra[..., None] * af)
        cols.append(af)
        return jnp.concatenate(cols, axis=-1).reshape(A, -1)

    feats.append(nearest(state.pellet_pos, state.pellet_alive,
                         min(ocfg.num_pellets, cfg.pellet_capacity)))
    feats.append(nearest(state.virus_pos, state.virus_alive,
                         min(ocfg.num_viruses, cfg.virus_capacity),
                         extra=state.virus_mass))

    # all players relative to each agent; self slot zeroed
    P = cfg.num_players
    rel_o = centroid[None, :, :] - me[:, None, :]            # (A, P, 2)
    self_mask = (jnp.arange(P)[None, :] == jnp.arange(A)[:, None])
    keep = (palive[None, :] & ~self_mask)[..., None].astype(jnp.float32)
    players = jnp.concatenate(
        [rel_o, jnp.broadcast_to(pmass[None, :, None], (A, P, 1)),
         jnp.ones((A, P, 1), jnp.float32)], axis=-1) * keep   # (A, P, 4)
    feats.append(players.reshape(A, -1))
    return jnp.concatenate(feats, axis=-1)
