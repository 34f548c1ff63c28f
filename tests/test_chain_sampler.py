"""Feasibility-filtered chain sampler (multistep_sequences equivalent)."""

import numpy as np
import pytest

from hulc_tpu.evaluation import chain_sampler as cs
from hulc_tpu.evaluation.tasks import ALL_TASKS, SceneObsTasks


def base_state(**overrides):
    s = {
        "led": 0,
        "lightbulb": 0,
        "slider": "right",
        "drawer": "closed",
        "red_block": "table",
        "blue_block": "table",
        "pink_block": "table",
        "grasped": 0,
    }
    s.update(overrides)
    return s


def test_rule_inventory_covers_all_34_tasks():
    assert set(cs.TASK_RULES) == set(ALL_TASKS)
    assert len(cs.TASK_RULES) == 34


def test_articulated_preconditions():
    s = base_state()
    assert cs.feasible_effects(s, "open_drawer") == [{"drawer": "open"}]
    assert cs.feasible_effects(s, "close_drawer") == []
    assert cs.feasible_effects(s, "move_slider_left") == [{"slider": "left"}]
    assert cs.feasible_effects(s, "move_slider_right") == []
    assert cs.feasible_effects(s, "turn_on_led") == [{"led": 1}]
    assert cs.feasible_effects(s, "turn_off_led") == []
    opened = cs.apply_effect(s, {"drawer": "open"})
    assert cs.feasible_effects(opened, "open_drawer") == []
    assert cs.feasible_effects(opened, "close_drawer") == [{"drawer": "closed"}]


def test_slider_accessibility():
    # door on the right exposes the LEFT compartment
    s = base_state(red_block="slider_left", slider="right")
    assert cs.feasible_effects(s, "lift_red_block_slider")
    s2 = base_state(red_block="slider_left", slider="left")
    assert cs.feasible_effects(s2, "lift_red_block_slider") == []
    # lifting from the table needs the block on the table + empty gripper
    assert cs.feasible_effects(s, "lift_red_block_table") == []
    assert cs.feasible_effects(s, "lift_blue_block_table")
    held = base_state(blue_block="grasped", grasped=1)
    assert cs.feasible_effects(held, "lift_pink_block_table") == []


def test_place_and_drawer_interactions():
    held = base_state(red_block="grasped", grasped=1, drawer="open", slider="left")
    # accessible (right) slot is free -> place_in_slider feasible
    assert cs.feasible_effects(held, "place_in_slider") == [
        {"red_block": "slider_right", "grasped": 0}
    ]
    # occupied accessible slot blocks placement
    blocked = dict(held, blue_block="slider_right")
    assert cs.feasible_effects(blocked, "place_in_slider") == []
    assert cs.feasible_effects(held, "place_in_drawer") == [
        {"red_block": "drawer", "grasped": 0}
    ]
    closed = dict(held, drawer="closed")
    assert cs.feasible_effects(closed, "place_in_drawer") == []
    # lift from the drawer needs it open
    in_drawer = base_state(pink_block="drawer", drawer="open")
    assert cs.feasible_effects(in_drawer, "lift_pink_block_drawer")
    assert cs.feasible_effects(dict(in_drawer, drawer="closed"), "lift_pink_block_drawer") == []
    # push_into_drawer: any tabletop block, one effect alternative each
    opened = base_state(drawer="open")
    effects = cs.feasible_effects(opened, "push_into_drawer")
    assert len(effects) == 3
    assert {"red_block": "drawer"} in effects


def test_stack_unstack():
    held = base_state(red_block="grasped", grasped=1)
    assert cs.feasible_effects(held, "stack_block") == [{"red_block": "stacked", "grasped": 0}]
    # no tabletop base -> cannot stack
    no_base = dict(held, blue_block="slider_left", pink_block="drawer")
    assert cs.feasible_effects(no_base, "stack_block") == []
    stacked = base_state(red_block="stacked")
    assert cs.feasible_effects(stacked, "unstack_block") == [{"red_block": "table"}]
    assert cs.feasible_effects(base_state(), "unstack_block") == []


def test_valid_initial_states_constraints():
    states = cs.valid_initial_states()
    assert len(states) > 100
    for s in states:
        assert s["grasped"] == 0
        placements = [s[b] for b in cs.BLOCK_KEYS]
        assert all(p in ("table", "slider_left", "slider_right") for p in placements)
        assert placements.count("slider_left") <= 1
        assert placements.count("slider_right") <= 1


def test_get_sequences_protocol_set():
    pairs = cs.get_sequences(200, seed=0)
    assert pairs == cs.get_sequences(200, seed=0)  # deterministic
    assert pairs != cs.get_sequences(200, seed=1)
    used = set()
    for initial, chain in pairs:
        assert len(chain) == 5
        assert len(set(chain)) == 5  # no repeats within a chain
        assert cs.chain_is_feasible(initial, chain) or _replayable(initial, chain)
        used.update(chain)
    # inverse-frequency balancing must cover the whole inventory in 200 chains
    assert used == set(ALL_TASKS)


def _replayable(initial, chain):
    """chain_is_feasible takes the FIRST effect alternative; accept a chain if
    any alternative path replays (matches the sampler's choice freedom)."""

    def rec(state, rest):
        if not rest:
            return True
        for eff in cs.feasible_effects(state, rest[0]):
            if rec(cs.apply_effect(state, eff), rest[1:]):
                return True
        return False

    return rec(dict(initial), list(chain))


def test_initial_state_to_obs_matches_oracle_regions():
    state = base_state(
        red_block="slider_left", blue_block="table", pink_block="table",
        slider="left", drawer="open", led=1, lightbulb=0,
    )
    robot, scene = cs.initial_state_to_obs(state)
    assert robot.shape == (15,) and scene.shape == (24,)
    oracle = SceneObsTasks()
    info = {"scene_obs": scene}
    assert oracle._contacts(info, "block_red") == {"plank"}  # slider region
    assert oracle._contacts(info, "block_blue") == {"table"}
    assert round(float(scene[5])) == 1 and round(float(scene[4])) == 0
    # drawer-open joint exceeds the oracle's open_drawer threshold from closed
    assert scene[1] > 0.12

    in_drawer = cs.apply_effect(state, {"pink_block": "drawer"})
    _, scene2 = cs.initial_state_to_obs(in_drawer)
    assert oracle._contacts({"scene_obs": scene2}, "block_pink") == {"drawer"}


def test_restricted_pool_guard():
    with pytest.raises(ValueError, match="without feasibility rules"):
        cs.get_sequences(1, tasks=["not_a_task"])
    # a tiny but workable pool still produces feasible chains
    pool = ["open_drawer", "close_drawer", "turn_on_led", "turn_off_led", "move_slider_left"]
    pairs = cs.get_sequences(5, seed=0, tasks=pool)
    for initial, chain in pairs:
        assert _replayable(initial, chain)
