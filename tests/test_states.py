"""State-space enumeration unit tests (SURVEY.md §4: state-matrix counts)."""

from math import comb

import numpy as np
import pytest

from prosper_tpu.core.states import (
    binary_state_space,
    discrete_state_space,
    n_multi_states,
    ternary_state_space,
)


@pytest.mark.parametrize("Hp,gamma", [(4, 2), (6, 3), (8, 5), (5, 5)])
def test_binary_counts(Hp, gamma):
    sp = binary_state_space(Hp, gamma)
    expected = sum(comb(Hp, k) for k in range(2, gamma + 1))
    assert sp.S == expected == n_multi_states(Hp, gamma, 1)
    assert set(np.unique(sp.states)) <= {0.0, 1.0}
    counts = sp.states.sum(axis=1)
    assert counts.min() >= 2 and counts.max() <= gamma
    np.testing.assert_array_equal(sp.abs_states, counts)


def test_ternary_counts():
    sp = ternary_state_space(6, 3)
    expected = sum(comb(6, k) * 2 ** k for k in range(2, 4))
    assert sp.S == expected
    assert set(np.unique(sp.states)) <= {-1.0, 0.0, 1.0}


def test_states_unique_and_outer():
    sp = discrete_state_space(5, 3, values=[-1.0, 2.0])
    rows = {tuple(r) for r in sp.states}
    assert len(rows) == sp.S  # no duplicates
    outer = np.einsum("sh,sk->shk", sp.states, sp.states).reshape(sp.S, -1)
    np.testing.assert_allclose(sp.outer, outer)
    # value counts sum to |support|
    np.testing.assert_array_equal(sp.value_counts.sum(axis=1), sp.abs_states)


def test_validation():
    with pytest.raises(ValueError):
        discrete_state_space(4, 5, values=[1.0])  # gamma > Hp
    with pytest.raises(ValueError):
        discrete_state_space(4, 2, values=[0.0, 1.0])  # zero in values


def test_gsc_level_plan_covers_all_states():
    """The level plan partitions the state axis into contiguous size-m
    groups with valid active-slot indices (core/gscstep.py)."""
    import numpy as np

    from prosper_tpu.core import states as states_mod
    from prosper_tpu.core.gscstep import _gsc_level_plan

    for Hp, gamma in ((5, 3), (6, 4), (8, 4)):
        space = states_mod.binary_state_space(Hp, gamma)
        act = np.asarray(space.states) > 0.5
        plan = _gsc_level_plan(act)
        total = 0
        for off, idx in plan:
            S_m, m = idx.shape
            assert off == total
            total += S_m
            for j in range(S_m):
                np.testing.assert_array_equal(
                    np.flatnonzero(act[off + j]), idx[j])
        assert total == act.shape[0]


def test_gsc_shard_level_arrays_partition_states():
    """The level-ALIGNED shard layout (state sharding keeping the fast
    solver, core/gscstep.py) must cover every global state exactly once
    across shards, mark padding invalid, and agree with the E/EE one-hot
    gather tensors."""
    import numpy as np

    from prosper_tpu.core import states as states_mod
    from prosper_tpu.core.gscstep import _gsc_shard_level_arrays

    for Hp, gamma, P in ((5, 3, 2), (6, 4, 4), (5, 2, 8)):
        space = states_mod.binary_state_space(Hp, gamma)
        act = np.asarray(space.states) > 0.5
        S_loc, levels, st, sv, ab = _gsc_shard_level_arrays(act, P)
        assert st.shape == (P, S_loc, Hp)
        assert sv.shape == ab.shape == (P, S_loc)
        # every shard has identical static level structure by construction;
        # valid states across shards partition the global enumeration
        seen = set()
        for r in range(P):
            for k in range(S_loc):
                if sv[r, k] > 0:
                    key = tuple(np.flatnonzero(st[r, k] > 0.5))
                    assert key not in seen
                    seen.add(key)
                    assert ab[r, k] == len(key)
        want = {tuple(np.flatnonzero(a)) for a in act}
        assert seen == want
        # E tensors reproduce the per-slot one-hots of the states array
        for m, L_m, E_np, EE_np, sl in levels:
            assert E_np.shape == (m, P, L_m, Hp)
            recon = E_np.sum(axis=0)                     # (P, L_m, Hp)
            np.testing.assert_array_equal(recon, st[:, sl])
            for i in range(m):
                for j in range(i + 1):
                    ee = EE_np[i, j].reshape(P, L_m, Hp, Hp)
                    np.testing.assert_allclose(
                        ee, E_np[i][..., :, None] * E_np[j][..., None, :])


def test_subset_dp_plan_parents_drop_largest_slot():
    """Every DP-plan child extends its parent by exactly its largest
    active slot (core/maxstep.py)."""
    import numpy as np

    from prosper_tpu.core import states as states_mod
    from prosper_tpu.core.maxstep import _subset_dp_plan

    space = states_mod.binary_state_space(7, 4)
    act = np.asarray(space.states) > 0.5
    plan = _subset_dp_plan(np.asarray(space.states))
    sizes = act.sum(axis=1)
    off = 0
    prev_rows = None
    for level, (parent_pos, add_slot) in enumerate(plan, start=2):
        rows = np.flatnonzero(sizes == level)
        for j, r in enumerate(rows):
            sup = np.flatnonzero(act[r])
            assert add_slot[j] == sup[-1]
            if level == 2:
                assert parent_pos[j] == sup[0]
            else:
                parent_sup = np.flatnonzero(act[prev_rows[parent_pos[j]]])
                np.testing.assert_array_equal(parent_sup, sup[:-1])
        prev_rows = rows
        off += rows.size
