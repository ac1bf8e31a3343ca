"""LinearAnnealing unit tests (SURVEY.md §4: schedule interpolation)."""

import pytest

from prosper_tpu.engine.anneal import LinearAnnealing


def test_constant_and_defaults():
    a = LinearAnnealing(10)
    assert a["T"] == 1.0
    assert a["Ncut_factor"] == 0.0
    assert a["partial"] == 1.0
    assert a["anneal_prior"] is False


def test_piecewise_linear_fractional():
    a = LinearAnnealing(101)
    a["T"] = [(0.0, 4.0), (0.5, 1.0)]
    assert a.value_at("T", 0) == 4.0
    assert a.value_at("T", 50) == pytest.approx(1.0)
    assert a.value_at("T", 25) == pytest.approx(2.5)
    assert a.value_at("T", 100) == 1.0


def test_absolute_positions():
    a = LinearAnnealing(100)
    a["W_noise"] = [(10, 2.0), (20, 0.0)]
    assert a.value_at("W_noise", 0) == 2.0
    assert a.value_at("W_noise", 15) == pytest.approx(1.0)
    assert a.value_at("W_noise", 99) == 0.0


def test_iteration_and_finished():
    a = LinearAnnealing(3)
    seen = 0
    while not a.finished:
        a.next()
        seen += 1
    assert seen == 3
    with pytest.raises(StopIteration):
        a.next()


def test_reset_and_scalars():
    a = LinearAnnealing(10)
    a["T"] = [(0.0, 2.0), (1.0, 1.0)]
    a.next(); a.next()
    a.reset(0)
    s = a.as_scalars()
    assert s["beta"] == pytest.approx(0.5)
    assert s["step"] == 0.0
