"""Grid observations: ego-centric multi-channel integer grids.

Channel semantics follow GridObservation
(/root/reference/environment/envs/GridEnvironment.hpp:91-123,188-209):

  per frame: [ out-of-bounds (0 / -1),
               pellet presence (entity mass at bin), pellet total-mass,
               virus presence, virus total-mass,
               own-cells total-mass,
               other-cells min-mass, other-cells max-mass ]

with each observe_* flag removing its channels. Entities bin at their center
via gx = trunc(G*dx/view + G/2) with view = clamp(2*player_mass, 100, 300)
(GridEnvironment.hpp:251-279); truncation (not floor) matches the C int cast.

Pinned deviations (documented):
- "at_least" channels use scatter-max instead of vector-iteration-order
  overwrite (identical for pellets, which all have mass 1).
- The reference wrapper calls _partial_observation once with tick_index=0, so
  with the default num_frames=1 < ticks_per_step its frame_index is negative
  and grid observations are never written (GridEnvironment.hpp:425-431 — the
  grid path is also broken at AgarioEnv.py:226). We implement the documented
  intent: the last num_frames ticks of a step each contribute a frame.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from agarcl_tpu.config import EnvConfig
from agarcl_tpu.state import GameState

_INF = jnp.int32(2**30)


@dataclasses.dataclass(frozen=True)
class GridObsConfig:
    num_frames: int = 1
    grid_size: int = 128
    observe_cells: bool = True
    observe_others: bool = True
    observe_viruses: bool = True
    observe_pellets: bool = True
    # Output dtype. DEFAULT int16 (saturating): the (N, C, G, G) frame
    # write is the measured floor of the fused grid kernel at large
    # batches, and int16 halves it (1.38M vs 0.78M env-steps/s at
    # 64x64/8192, BASELINE.md round 4). Saturation analysis — why int16
    # is safe as the default:
    #   oob is -1/0, pellet presence 0/1, pellet count <= capacity (512),
    #   virus max/total mass <= virus capacity * max virus mass
    #   (26 * 170 = 4420) — all far below 32767. The only channels that
    #   can saturate are the cell total/min/max mass sums: a single bin
    #   exceeds 32767 only when co-located cell masses sum past it; the
    #   task suite's own cap is mode-3's 23000 win condition and a lone
    #   cell's mass at the int16 bound renders identically, so values
    #   clamp (never wrap) only in extreme multi-giant pileups, where the
    #   obs still reads "huge". "int32" opts back into exact values (the
    #   reference-compatible gym wrapper keeps int32 so its observation
    #   space matches GridEnvironment.hpp:91-123 exactly); "int8" quarters
    #   the write cost but caps at 127 — mass channels become effectively
    #   presence bits; pick it only when the policy reads geometry.
    out_dtype: str = "int16"

    @property
    def channels_per_frame(self) -> int:
        return int(1 + self.observe_cells + 2 * self.observe_others
                   + 2 * self.observe_viruses + 2 * self.observe_pellets)

    @property
    def jnp_dtype(self):
        assert self.out_dtype in ("int32", "int16", "int8"), self.out_dtype
        return dict(int32=jnp.int32, int16=jnp.int16,
                    int8=jnp.int8)[self.out_dtype]


def _to_grid(pos, center, view, G):
    """World -> grid bin with C-style trunc cast; returns (gx, gy, inside)."""
    diff = pos - center
    g = jnp.trunc(G * diff / view + G / 2.0).astype(jnp.int32)
    gx, gy = g[..., 0], g[..., 1]
    inside = (gx >= 0) & (gx < G) & (gy >= 0) & (gy < G)
    return gx, gy, inside


def grid_frame(cfg: EnvConfig, ocfg: GridObsConfig,
               state: GameState) -> jnp.ndarray:
    """(A, channels_per_frame, G, G) int32 — one frame per agent."""
    A = cfg.num_agents
    G = ocfg.grid_size
    centroid = state.player_centroid()[:A]                   # (A,2)
    pmass = state.player_mass()[:A].astype(jnp.float32)
    view = jnp.clip(2.0 * pmass, 100.0, 300.0)[:, None]      # (A,1)

    def bins(pos, alive):
        gx, gy, inside = _to_grid(pos[None, :, :], centroid[:, None, :],
                                  view[..., None], G)
        return gx, gy, inside & alive[None, :]

    def scat(pos, alive, mass, op, unroll=False):
        """Rasterize entities per agent; (A, G, G) int32.

        "add" avoids TPU scatters entirely: the grid is two one-hot
        matmuls, einsum('aeg,aeh->agh') — integer-exact in f32 (HIGHEST
        precision; all channel sums < 2^24) and MXU-shaped. "max"/"min"
        with unroll=True (small entity counts: viruses, cells) become a
        chain of elementwise maxes XLA fuses into one kernel; otherwise
        they fall back to scatter (multi-player paths).
        """
        gx, gy, ok = bins(pos, alive)
        if op == "add":
            v = mass.astype(jnp.float32)[None, :] * ok       # (A, Ne)
            iota = jnp.arange(G, dtype=jnp.int32)
            ohx = (gx[..., None] == iota).astype(jnp.float32)
            ohy = (gy[..., None] == iota).astype(jnp.float32)
            out = jnp.einsum('aeg,aeh->agh', ohx * v[..., None], ohy,
                             precision=jax.lax.Precision.HIGHEST)
            return jnp.round(out).astype(jnp.int32)
        if op in ("max", "min") and unroll:
            m = jnp.where(ok, mass.astype(jnp.int32)[None, :], 0)
            acc = jnp.zeros((A, G, G), jnp.int32) if op == "max" \
                else jnp.full((A, G, G), _INF)
            iota = jnp.arange(G, dtype=jnp.int32)
            for e in range(gx.shape[1]):
                cell = ((gx[:, e, None, None] == iota[:, None])
                        & (gy[:, e, None, None] == iota[None, :]))
                val = jnp.where(
                    cell & ok[:, e, None, None],
                    m[:, e, None, None],
                    0 if op == "max" else _INF)
                acc = (jnp.maximum(acc, val) if op == "max"
                       else jnp.minimum(acc, val))
            return acc if op == "max" else jnp.where(acc == _INF, 0, acc)
        gx = jnp.where(ok, gx, G)                            # dropped
        m = mass.astype(jnp.int32)[None, :] * ok
        if op == "max":
            out = jnp.zeros((A, G, G), jnp.int32)
            return out.at[jnp.arange(A)[:, None], gx, gy].max(
                jnp.where(ok, m, 0), mode="drop")
        if op == "min":
            out = jnp.full((A, G, G), _INF)
            out = out.at[jnp.arange(A)[:, None], gx, gy].min(
                jnp.where(ok, m, _INF), mode="drop")
            return jnp.where(out == _INF, 0, out)
        raise ValueError(op)

    chans = []
    # out-of-bounds channel (GridEnvironment.hpp:240-248)
    ij = jnp.arange(G, dtype=jnp.float32)
    dx = (ij[:, None] - G / 2.0) * view[:, :, None] / G      # (A,G,1)
    dy = (ij[None, :] - G / 2.0) * view[:, :, None] / G      # broadcast below
    wx = centroid[:, 0:1, None] + dx                         # (A,G,1)
    wy = centroid[:, 1:2, None] + (ij[None, None, :] - G / 2.0) * view[:, :, None] / G
    in_bounds = ((wx >= 0) & (wx < cfg.arena_width)
                 & (wy >= 0) & (wy < cfg.arena_height))      # (A,G,G)
    chans.append(jnp.where(in_bounds, 0, -1).astype(jnp.int32))

    if ocfg.observe_pellets:
        pellet_pos, pellet_alive = state.pellet_xy_alive(cfg)
        ones = jnp.ones_like(pellet_alive, jnp.int32)
        counts = scat(pellet_pos, pellet_alive, ones, "add")
        # presence (scatter-max of ones) == count clipped to 1
        chans.append(jnp.minimum(counts, 1))
        chans.append(counts)
    if ocfg.observe_viruses:
        chans.append(scat(state.virus_pos, state.virus_alive,
                          state.virus_mass, "max", unroll=True))
        chans.append(scat(state.virus_pos, state.virus_alive,
                          state.virus_mass, "add"))

    P, Cc = state.cell_mass.shape
    flat_pos = state.cell_pos.reshape(P * Cc, 2)
    flat_mass = state.cell_mass.reshape(P * Cc)
    flat_alive = state.cell_alive.reshape(P * Cc)
    owner = jnp.repeat(jnp.arange(P), Cc)

    if ocfg.observe_cells:
        own = jnp.zeros((A, P * Cc), bool)
        for a_idx in range(A):
            own = own.at[a_idx].set(flat_alive & (owner == a_idx))
        # per-agent alive mask differs -> loop channels per agent via masks
        out = []
        for a_idx in range(A):
            out.append(scat(flat_pos, own[a_idx], flat_mass, "add")[a_idx])
        chans.append(jnp.stack(out))
    if ocfg.observe_others:
        if P == 1:
            # single-player worlds have no other cells; both channels are 0
            zeros = jnp.zeros((A, G, G), jnp.int32)
            chans.append(zeros)
            chans.append(zeros)
        else:
            unroll = P * Cc <= 64
            mins, maxs = [], []
            for a_idx in range(A):
                others = flat_alive & (owner != a_idx)
                mins.append(scat(flat_pos, others, flat_mass, "min",
                                 unroll=unroll)[a_idx])
                maxs.append(scat(flat_pos, others, flat_mass, "max",
                                 unroll=unroll)[a_idx])
            chans.append(jnp.stack(mins))
            chans.append(jnp.stack(maxs))

    out = jnp.stack(chans, axis=1)                           # (A, C, G, G)
    if ocfg.out_dtype != "int32":
        info = jnp.iinfo(ocfg.jnp_dtype)
        out = jnp.clip(out, info.min, info.max).astype(ocfg.jnp_dtype)
    return out


def grid_observe(cfg: EnvConfig, ocfg: GridObsConfig,
                 state: GameState) -> jnp.ndarray:
    """Single-frame convenience wrapper: (A, C, G, G)."""
    return grid_frame(cfg, ocfg, state)
