"""Scalar game-math laws, vectorized.

Formulas follow the reference exactly:
- mass<->radius: /root/reference/agario/core/utils.hpp:8-16 (MASS_AREA_RADIO=1)
- speed laws:    /root/reference/agario/engine/Engine.hpp:1296-1302
- velocity ops:  /root/reference/agario/core/types.hpp:152-258
- boundary:      /root/reference/agario/engine/Engine.hpp:695-698
"""

from __future__ import annotations

import jax.numpy as jnp

from agarcl_tpu import constants as C


def radius(mass):
    """radius = sqrt(mass / pi) (utils.hpp:8-11)."""
    return jnp.sqrt(jnp.asarray(mass, jnp.float32) / jnp.pi)


def max_speed(mass):
    """v_max = 300 * mass^-0.439 (Engine.hpp:1300-1302).

    Pinned as the negative-exponent PRODUCT, not the division: XLA's
    algebraic simplifier rewrites `c / pow(m, e)` into `c * pow(m, -e)`
    (measured on CPU: the rewritten form differs from the division form
    on 35% of integer masses by 1 ulp — the round-5 mode-6 parity
    bisection), so writing the product explicitly makes the law
    compiler-independent; oracle.cpp::max_speed mirrors it."""
    m = jnp.asarray(mass, jnp.float32)
    return C.CELL_MAX_SPEED * jnp.power(jnp.maximum(m, 1.0), -0.439)


def split_speed(mass):
    """clamp(3 * v_max^1.2, 20, 130) (Engine.hpp:1296-1298)."""
    return jnp.clip(3.0 * jnp.power(max_speed(mass), 1.2), 20.0, 130.0)


def vec_norm(v, axis=-1, keepdims=False):
    """Euclidean norm, pinned for 2-vectors as sqrt(x*x + y*y) in the
    ELEMENTWISE form: XLA-CPU contracts it to sqrt(fma(x, x, y*y))
    (measured — the reduce-sum form lowers to a different contraction),
    and oracle.cpp::norm mirrors std::fmaf(x, x, y*y) bit-for-bit."""
    ax = axis if axis >= 0 else v.ndim + axis
    if v.shape[ax] == 2 and ax == v.ndim - 1:
        x, y = v[..., 0], v[..., 1]
        n = jnp.sqrt(x * x + y * y)
        return n[..., None] if keepdims else n
    return jnp.sqrt(jnp.sum(v * v, axis=axis, keepdims=keepdims))


def normed(v, axis=-1):
    """Safe unit vector; zero stays zero (reference would NaN)."""
    n = vec_norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, 1e-12)


def clamp_speed(v, limit, axis=-1):
    """Velocity::clamp_speed(0, limit): rescale only if speed > limit
    (types.hpp:186-191)."""
    speed = vec_norm(v, axis=axis, keepdims=True)
    lim = jnp.asarray(limit, jnp.float32)[..., None]
    scale = jnp.where(speed > lim, lim / jnp.maximum(speed, 1e-12), 1.0)
    return v * scale


def decelerate(v, decel, dt, axis=-1):
    """Velocity::decelerate: shrink magnitude by decel*dt, stopping at zero
    (types.hpp:212-228). Zero velocity stays zero (reference hits NaN ratios
    that also resolve to zero)."""
    mag = vec_norm(v, axis=axis, keepdims=True)
    ratio = v / jnp.maximum(mag, 1e-12)
    dv = ratio * (decel * dt)
    return jnp.where(jnp.abs(dv) <= jnp.abs(v), v - dv, 0.0)


def direction(v):
    """Velocity::direction() — the reference's quirky atan(dx/dy) convention
    (types.hpp:178-185); (0,0) pinned to angle 0.

    v: (..., 2) -> (...)
    """
    dx, dy = v[..., 0], v[..., 1]
    both_zero = (dx == 0.0) & (dy == 0.0)
    # atan(dx/0) -> atan(+-inf) = +-pi/2, matching C
    ratio = jnp.where(dy == 0.0, jnp.sign(dx) * jnp.inf,
                      dx / jnp.where(dy == 0.0, 1.0, dy))
    ang = jnp.arctan(ratio)
    ang = jnp.where(dx < 0, jnp.where(dy > 0, ang + jnp.pi, ang - jnp.pi), ang)
    return jnp.where(both_zero, 0.0, ang)


def boundary_clamp(pos, rad, arena_w, arena_h):
    """x = max(0, max(min(x, W - r), r)) per axis (Engine.hpp:695-698, SPEC Q8).

    pos: (..., 2); rad: (...)
    """
    hi = jnp.stack([arena_w - rad, arena_h - rad], axis=-1)
    lo = jnp.stack([rad, rad], axis=-1)
    return jnp.maximum(0.0, jnp.maximum(jnp.minimum(pos, hi), lo))


def collides(r_a, r_b, dist2):
    """Ball::collides_with — center of one inside the larger radius
    (Ball.hpp:31-34): max(r_a, r_b)^2 >= dist^2."""
    rm = jnp.maximum(r_a, r_b)
    return rm * rm >= dist2


def touches(r_a, r_b, dist2):
    """Ball::touches — sum of radii (Ball.hpp:36-43)."""
    rs = r_a + r_b
    return rs * rs >= dist2
