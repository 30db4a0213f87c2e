"""GoBigger-style structured observations.

Reproduces GoBiggerObservation
(/root/reference/environment/envs/GoBiggerEnvironment.hpp:26-548): per agent,
padded tables of the entities whose grid-projected location falls inside the
view window (same window law as the grid obs: clamp(2*mass, 100, 300),
GoBiggerEnvironment.hpp:423-425), with positions relative to the player:

  foods  (pellets):       rel_x, rel_y, radius, score
  viruses:                rel_x, rel_y, radius, score, vel=(0,0)   [hpp:475-483]
  spores (ejected mass):  rel_x, rel_y, radius, score, vel=(0,0), owner
  clones (OWN cells only; the reference stores only `pl->cells` per player —
          other players' cells never appear, GoBiggerEnvironment.hpp:536-538):
                          rel_x, rel_y, radius, score, vel, direction,
                          owner, team_id=0

Quirks kept: spore `owner` is the *observing* player's pid (hpp:494-501);
virus/spore velocities are hardcoded (0,0); can_eject/can_split are
initialized true and never updated (hpp:715-717).

The device-side frame is a dict of fixed-shape arrays + validity masks;
`to_player_states` converts to reference-shaped Python objects at the rim.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.engine import geometry as G
from agarcl_tpu.state import GameState
from agarcl_tpu.obs.grid import _to_grid


@dataclasses.dataclass(frozen=True)
class GoBiggerObsConfig:
    map_width: int = 512
    map_height: int = 512
    frame_limit: int = 1000
    grid_size: int = 128   # the inclusion window discretization


def gobigger_frame(cfg: EnvConfig, ocfg: GoBiggerObsConfig,
                   state: GameState) -> Dict[str, jnp.ndarray]:
    """Device-side structured frame: dict of (A, K, F) arrays + (A, K) masks."""
    A = cfg.num_agents
    Gs = ocfg.grid_size
    centroid = state.player_centroid()[:A]
    pmass = state.player_mass().astype(jnp.float32)
    view = jnp.clip(2.0 * pmass[:A], 100.0, 300.0)[:, None]

    def in_window(pos, alive):
        gx, gy, inside = _to_grid(pos[None, :, :], centroid[:, None, :],
                                  view[..., None], Gs)
        return inside & alive[None, :]

    rel = lambda pos: pos[None, :, :] - centroid[:, None, :]

    # foods = pellets
    pellet_pos, pellet_alive = state.pellet_xy_alive(cfg)
    p_ok = in_window(pellet_pos, pellet_alive)
    rad_p = G.radius(jnp.float32(1.0))
    foods = jnp.concatenate([
        rel(pellet_pos) * p_ok[..., None],
        jnp.broadcast_to(rad_p, p_ok.shape)[..., None] * p_ok[..., None],
        jnp.ones_like(p_ok, jnp.float32)[..., None] * p_ok[..., None],
    ], axis=-1)

    v_ok = in_window(state.virus_pos, state.virus_alive)
    viruses = jnp.concatenate([
        rel(state.virus_pos) * v_ok[..., None],
        jnp.broadcast_to(G.radius(state.virus_mass)[None], v_ok.shape)[..., None],
        jnp.broadcast_to(state.virus_mass.astype(jnp.float32)[None],
                         v_ok.shape)[..., None],
        jnp.zeros(v_ok.shape + (2,), jnp.float32),   # velocity pinned (0,0)
    ], axis=-1) * v_ok[..., None]

    f_ok = in_window(state.food_pos, state.food_alive)
    rad_f = G.radius(jnp.float32(10.0))
    pid_col = jnp.arange(A, dtype=jnp.float32)[:, None, None]
    spores = jnp.concatenate([
        rel(state.food_pos) * f_ok[..., None],
        jnp.broadcast_to(rad_f, f_ok.shape)[..., None] * f_ok[..., None],
        jnp.full(f_ok.shape + (1,), 10.0) * f_ok[..., None],
        jnp.zeros(f_ok.shape + (2,), jnp.float32),
        jnp.broadcast_to(pid_col, f_ok.shape + (1,)) * f_ok[..., None],
    ], axis=-1)

    # clones: own cells only
    own_pos = state.cell_pos[:A]
    own_alive = state.cell_alive[:A]
    own_mass = state.cell_mass[:A]
    own_vel = state.cell_vel[:A]
    gx, gy, inside = _to_grid(own_pos, centroid[:, None, :], view[..., None],
                              Gs)
    c_ok = inside & own_alive
    crel = own_pos - centroid[:, None, :]
    clones = jnp.concatenate([
        crel * c_ok[..., None],
        G.radius(own_mass)[..., None] * c_ok[..., None],
        own_mass.astype(jnp.float32)[..., None] * c_ok[..., None],
        own_vel * c_ok[..., None],
        G.direction(own_vel)[..., None] * c_ok[..., None],
        jnp.broadcast_to(pid_col, c_ok.shape + (1,)) * c_ok[..., None],
        jnp.zeros(c_ok.shape + (1,), jnp.float32),   # team_id
    ], axis=-1)

    return dict(
        foods=foods, foods_mask=p_ok,
        viruses=viruses, viruses_mask=v_ok,
        spores=spores, spores_mask=f_ok,
        clones=clones, clones_mask=c_ok,
        score=pmass[:A],
        last_frame=jnp.broadcast_to(state.ticks, (A,)),
    )


# --------------------------------------------------------------------- rim
@dataclasses.dataclass
class FoodInfo:
    position: tuple
    radius: float
    score: float


@dataclasses.dataclass
class VirusInfo:
    position: tuple
    radius: float
    score: float
    velocity: tuple


@dataclasses.dataclass
class SporeInfo:
    position: tuple
    radius: float
    score: float
    velocity: tuple
    owner: int


@dataclasses.dataclass
class CloneInfo:
    position: tuple
    radius: float
    score: float
    velocity: tuple
    direction: float
    owner: int
    team_id: int


@dataclasses.dataclass
class PlayerState:
    player_id: int
    food_infos: List[FoodInfo]
    virus_infos: List[VirusInfo]
    spore_infos: List[SporeInfo]
    clone_infos: List[CloneInfo]
    team_name: str
    score: float
    can_eject: bool = True   # reference never updates these (hpp:715-717)
    can_split: bool = True


@dataclasses.dataclass
class GlobalState:
    map_width: int
    map_height: int
    frame_limit: int
    last_frame_count: int
    team_num: int


def to_player_states(cfg: EnvConfig, ocfg: GoBiggerObsConfig,
                     frame: Dict) -> tuple:
    """Host-side conversion to reference-shaped (GlobalState, {pid: PlayerState})."""
    f = {k: np.asarray(v) for k, v in frame.items()}
    A = cfg.num_agents
    players = {}
    for a in range(A):
        foods = [FoodInfo(tuple(r[:2]), float(r[2]), float(r[3]))
                 for r in f["foods"][a][f["foods_mask"][a]]]
        viruses = [VirusInfo(tuple(r[:2]), float(r[2]), float(r[3]),
                             (float(r[4]), float(r[5])))
                   for r in f["viruses"][a][f["viruses_mask"][a]]]
        spores = [SporeInfo(tuple(r[:2]), float(r[2]), float(r[3]),
                            (float(r[4]), float(r[5])), int(r[6]))
                  for r in f["spores"][a][f["spores_mask"][a]]]
        clones = [CloneInfo(tuple(r[:2]), float(r[2]), float(r[3]),
                            (float(r[4]), float(r[5])), float(r[6]),
                            int(r[7]), int(r[8]))
                  for r in f["clones"][a][f["clones_mask"][a]]]
        players[a] = PlayerState(a, foods, viruses, spores, clones, "",
                                 float(np.asarray(f["score"][a]).reshape(-1)[0]))
    gs = GlobalState(ocfg.map_width, ocfg.map_height, ocfg.frame_limit,
                     int(np.asarray(f["last_frame"]).reshape(-1)[0]), A)
    return gs, players


def batch_player_states(cfg: EnvConfig, ocfg: GoBiggerObsConfig,
                        frame: Dict, env: int) -> tuple:
    """Rim conversion for one env of a VecEnv batch: slice the leading env
    axis off every array in the batched frame, then convert as usual."""
    one = {k: np.asarray(v)[env] for k, v in frame.items()}
    return to_player_states(cfg, ocfg, one)
