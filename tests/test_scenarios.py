"""Seeded deterministic workload scenarios vs python model
(reference internal/tests/scenarios + DST runner)."""

import pytest

from knoxdb_tpu.testing.scenario import run_scenario


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_workload_model_equivalence(seed, tmp_path):
    rep = run_scenario(seed, str(tmp_path / f"s{seed}"), steps=40)
    assert all(v > 0 for v in rep.values()), rep


def test_scenario_is_deterministic(tmp_path):
    r1 = run_scenario(99, str(tmp_path / "a"), steps=25)
    r2 = run_scenario(99, str(tmp_path / "b"), steps=25)
    assert r1 == r2
