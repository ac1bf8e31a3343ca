"""Native C++ enumerator vs the numpy reference path (exact equality)."""

import os
import subprocess

import numpy as np
import pytest

from prosper_tpu.core import states as st

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "native", "libprosper_enum.so")


@pytest.fixture(scope="module")
def native_lib():
    if not os.path.exists(LIB):
        build = os.path.join(ROOT, "native", "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build native enumerator: {e}")
    # reset the cached handle in case an earlier import missed the lib
    st._NATIVE_CHECKED = False
    lib = st._native_lib()
    if lib is None:
        pytest.skip("native lib not loadable")
    return lib


@pytest.mark.parametrize("Hp,gamma,values", [
    (10, 5, [-1.0, 1.0, 2.0]),     # large DSC-style space (81891 states)
    (12, 4, [1.0]),                # binary
    (9, 4, [-1.0, 1.0]),           # ternary
])
def test_native_matches_numpy(native_lib, Hp, gamma, values):
    sp_n = st.discrete_state_space(Hp, gamma, values, native_min_states=0)
    sp_p = st.discrete_state_space(Hp, gamma, values, use_native=False)
    assert sp_n.S == sp_p.S
    np.testing.assert_array_equal(sp_n.states, sp_p.states)
    np.testing.assert_array_equal(sp_n.value_counts, sp_p.value_counts)
    np.testing.assert_array_equal(sp_n.abs_states, sp_p.abs_states)
    np.testing.assert_allclose(sp_n.outer, sp_p.outer)


def test_native_count(native_lib):
    from math import comb
    expected = sum(comb(10, k) * 3 ** k for k in range(2, 6))
    assert native_lib.prosper_enum_count(10, 5, 3, 2) == expected
