"""Reference-drift tests: agarcl_tpu vs the ACTUAL reference engine.

Compiles /root/reference's engine headless (renderable=false — the
configuration agario/CMakeLists.txt:155-183 builds without OpenGL) behind
the drift/ref_shim.cpp C ABI and compares behavior *distributions* under
identical scripted policies. Exact trajectories cannot match (the
reference seeds std::srand with wall-clock time, Engine.hpp:49, and bots
draw from std::rand); these tests pin distribution-level agreement so the
SPEC.md deviations (same-tick food eats, virus-spawn cap, pinned RNG,
tick-based recombine) stay behaviorally negligible. The committed
DRIFT.md report (python -m drift.report) is the full-matrix version.
"""

import numpy as np
import pytest

from drift import harness


@pytest.fixture(scope="module")
def ref_available():
    try:
        harness.build_ref()
    except Exception as e:          # no reference checkout / toolchain
        pytest.skip(f"reference engine unavailable: {e}")
    return True


SEEDS = list(range(1, 13))
STEPS = 120
KS_CRIT = 1.63 * np.sqrt(2 / len(SEEDS))   # two-sample KS, alpha=0.01


def test_drift_chase_distributions(ref_available):
    """Greedy pellet chase: eating-heavy play. Mean mass trajectory, final
    mass distribution, and eat counts must match the real engine."""
    kw = dict(mode=4, num_pellets=200, num_viruses=2, arena=100)
    ref = harness.run_reference(SEEDS, STEPS, policy="chase", **kw)
    ours = harness.run_ours(SEEDS, STEPS, policy="chase", **kw)
    rows = harness.compare(ref, ours, STEPS)
    for cp in (STEPS // 4 + 1, STEPS // 2 + 1, STEPS):
        r, o = rows[f"mean_mass@{cp}"]
        assert abs(o - r) / r < 0.10, (cp, r, o)
    assert rows["final_mass_ks"] < KS_CRIT, rows["final_mass_ks"]
    r, o = rows["mean_food_eaten"]
    assert abs(o - r) / r < 0.10, (r, o)
    r, o = rows["mean_pellets"]
    assert abs(o - r) / r < 0.05, (r, o)


def test_drift_virus_spawn_cap(ref_available):
    """The one-virus-spawn-per-tick cap (engine/eating.py vs
    Engine.hpp:661-687) must not visibly change virus-count dynamics even
    under adversarial feeding straight into viruses."""
    kw = dict(mode=4, num_pellets=300, num_viruses=6, arena=80)
    ref = harness.run_reference(SEEDS, STEPS, policy="virusfeed", **kw)
    ours = harness.run_ours(SEEDS, STEPS, policy="virusfeed", **kw)
    rows = harness.compare(ref, ours, STEPS)
    r, o = rows["mean_virus_traj"]
    assert abs(o - r) / r < 0.05, (r, o)
    # the cap can delay a same-tick double spawn by one tick at most;
    # the max live-virus count must agree within 1
    r, o = rows["max_virus_traj"]
    assert abs(o - r) <= 1, (r, o)


def test_drift_same_tick_food_edibility(ref_available):
    """Foods ejected this tick are edible next tick in agarcl_tpu
    (engine/tick.py:24-26) vs same-tick in the reference
    (Engine.hpp:1011-1025). Under continuous self-feeding the live-food
    distributions and mass must still track."""
    kw = dict(mode=4, num_pellets=200, num_viruses=2, arena=100)
    ref = harness.run_reference(SEEDS, STEPS, policy="selffeed", **kw)
    ours = harness.run_ours(SEEDS, STEPS, policy="selffeed", **kw)
    rows = harness.compare(ref, ours, STEPS)
    r, o = rows[f"mean_mass@{STEPS}"]
    assert abs(o - r) / r < 0.10, (r, o)
    # mean live foods differ by at most ~one food's worth of lifetime
    r, o = rows["mean_food_traj"]
    assert abs(o - r) < 1.0, (r, o)
