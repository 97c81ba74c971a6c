"""Benchmark harness contract tests (measure.py; reference envs/measure_env.py).

The TPU numbers live in results/bench/; these tests pin the harness API
(row schema, batch rounding, env dispatch) on tiny CPU workloads so a
refactor cannot silently break the driver's bench.py invocation.
"""
import pytest

from neuralplane_tpu.measure import (measure_combat_step,
                                     measure_combat_sweep, measure_env_step)


def test_measure_env_step_schema():
    row = measure_env_step(4, steps=3)
    assert row["n"] == 4 and row["steps"] == 3
    assert row["s_per_step"] > 0 and row["agent_steps_per_s"] > 0
    assert row["resident_state_mb"] > 0


@pytest.mark.parametrize("env_name,agents", [
    ("SingleCombat", 2), ("SingleCombatShoot", 2),
    ("MultipleCombat", 4), ("MultipleCombatShoot", 4),
])
def test_measure_combat_step_rounds_to_groups(env_name, agents):
    row = measure_combat_step(10, steps=2, env_name=env_name)
    assert row["env"] == env_name
    assert row["n"] == (10 // agents) * agents   # whole env groups
    assert row["s_per_step"] > 0
    assert row["inner_fdm_steps"] in (1, 5)


def test_measure_combat_sweep_streams_rows():
    gen = measure_combat_sweep(max_exp=1, steps=1)
    first = next(gen)                            # generator: rows stream out
    assert first["env"] == "SingleCombat" and first["n"] == 10
