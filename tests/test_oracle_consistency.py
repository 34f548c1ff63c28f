"""Internal-consistency check of the task oracle (VERDICT r2 #6).

The annotation pipeline (data.language.annotate_play_data) and the rollout
oracle (evaluation.tasks.SceneObsTasks) are the two consumers of scene_obs
task semantics. This test builds labeled synthetic play traces — one episode
per task family, with a single known task event each — and asserts that

  1. the annotation pipeline detects exactly the labeled task per episode, and
  2. the oracle, asked directly over the episode endpoints, agrees.

Families covered: doors (drawer/slider), lights (bulb/led), rotate, push,
lift, stack/unstack, push_into_drawer. The place_* family is excluded by
construction: it requires a ``gripper`` contact in start_info, which
scene_obs-only traces cannot express (the position-derived contact fallback
never emits "gripper") — documented in tasks.py.
"""

import numpy as np
import pytest

from hulc_tpu.data.language import annotate_play_data
from hulc_tpu.evaluation.tasks import SceneObsTasks

T = 40  # frames per episode
RAMP = slice(8, 21)  # motion frames
TABLE_Z = 0.46


def _ramp(a, b):
    """T-length scalar trace moving a->b across RAMP, constant elsewhere."""
    out = np.full(T, a, np.float64)
    n = RAMP.stop - RAMP.start
    out[RAMP] = np.linspace(a, b, n)
    out[RAMP.stop:] = b
    return out


def _block(scene, name, x, y, z, rz=None):
    sl = {"red": slice(6, 12), "blue": slice(12, 18), "pink": slice(18, 24)}[name]
    scene[:, sl.start + 0] = x
    scene[:, sl.start + 1] = y
    scene[:, sl.start + 2] = z
    if rz is not None:
        scene[:, sl.start + 5] = rz


def _base_episode():
    """Static scene: everything at rest, blocks parked on the table."""
    scene = np.zeros((T, 24), np.float64)
    _block(scene, "red", -0.15, 0.30, TABLE_Z)
    _block(scene, "blue", 0.00, 0.30, TABLE_Z)
    _block(scene, "pink", 0.15, 0.30, TABLE_Z)
    return scene


def labeled_episodes():
    eps = []

    def add(task):
        scene = _base_episode()
        eps.append((task, scene))
        return scene

    add("open_drawer")[:, 1] = _ramp(0.0, 0.2)
    add("close_drawer")[:, 1] = _ramp(0.2, 0.0)
    add("move_slider_left")[:, 0] = _ramp(0.0, 0.2)
    add("move_slider_right")[:, 0] = _ramp(0.2, 0.0)
    add("turn_on_lightbulb")[:, 4] = (np.arange(T) >= 15).astype(np.float64)
    s = add("turn_off_led")
    s[:, 5] = (np.arange(T) < 15).astype(np.float64)

    s = add("rotate_red_block_left")
    _block(s, "red", -0.15, 0.30, TABLE_Z)
    s[:, 6 + 5] = _ramp(0.0, 1.2)  # +68.8 deg about z

    s = add("push_blue_block_right")
    s[:, 12 + 0] = _ramp(0.0, 0.13)  # x; z stays on the table (supported)

    s = add("lift_pink_block_table")
    s[:, 18 + 2] = _ramp(TABLE_Z, TABLE_Z + 0.07)

    s = add("stack_block")  # red onto blue: xy converge, z +0.045
    s[:, 6 + 0] = _ramp(-0.15, 0.0)
    s[:, 6 + 1] = _ramp(0.30, 0.30)
    s[:, 6 + 2] = _ramp(TABLE_Z, TABLE_Z + 0.045)

    s = add("unstack_block")  # red leaves the stack back to the table
    s[:, 6 + 0] = _ramp(0.0, -0.15)
    s[:, 6 + 1] = 0.30
    s[:, 6 + 2] = _ramp(TABLE_Z + 0.045, TABLE_Z)

    s = add("push_into_drawer")  # blue: table -> inside the drawer box
    s[:, 12 + 0] = _ramp(0.25, 0.18)
    s[:, 12 + 1] = _ramp(0.30, 0.05)
    s[:, 12 + 2] = _ramp(TABLE_Z, 0.36)
    return eps


class _TraceStore:
    """EpisodeStore stand-in over in-memory scene_obs traces."""

    def __init__(self, episodes):
        self.scene = np.concatenate([scene for _, scene in episodes])
        self.episode_ranges = [
            (i * T, (i + 1) * T - 1) for i in range(len(episodes))
        ]

    def get_window(self, t, n):
        return {"scene_obs": self.scene[t : t + n]}


def test_annotation_detector_and_oracle_agree_per_family():
    episodes = labeled_episodes()
    store = _TraceStore(episodes)
    oracle = SceneObsTasks()
    anns = annotate_play_data(store, oracle, window=16, prior_steps_window=16, stride=4)

    by_episode = {}
    for _, task, (start, end) in anns:
        ep_idx = end // T
        by_episode.setdefault(ep_idx, []).append(task)

    for i, (label, _) in enumerate(episodes):
        # 1. the annotation pipeline found exactly the labeled event
        assert by_episode.get(i) == [label], (
            f"episode {i} labeled {label!r}: pipeline detected {by_episode.get(i)}"
        )
        # 2. the oracle agrees when asked directly over the episode endpoints
        a, b = store.episode_ranges[i]
        start_info = {"scene_obs": store.scene[a]}
        end_info = {"scene_obs": store.scene[b]}
        assert oracle.get_task_info(start_info, end_info) == {label}, (
            f"episode {i}: oracle disagrees with label {label!r}"
        )


def test_annotation_end_frame_is_oracle_consistent():
    """The bisected completion frame really is the first frame at which the
    oracle reads the task as done (from the annotation's start context)."""
    episodes = labeled_episodes()
    store = _TraceStore(episodes)
    oracle = SceneObsTasks()
    anns = annotate_play_data(store, oracle, window=16, prior_steps_window=16, stride=4)
    assert len(anns) == len(episodes)
    for _, task, (start, end) in anns:
        ep_a = (end // T) * T
        start_info = {"scene_obs": store.scene[ep_a]}
        assert task in oracle.get_task_info_for_set(
            start_info, {"scene_obs": store.scene[end]}, {task}
        )
        if end - 1 > ep_a:
            assert task not in oracle.get_task_info_for_set(
                start_info, {"scene_obs": store.scene[end - 1]}, {task}
            )


def test_oracle_task_table_matches_reference_yaml():
    """The oracle's task parameterization (names, rotate degrees, push
    directions, door joints/thresholds, lift heights/surfaces, light ids,
    push_into_drawer block set) must equal the reference's vendored
    new_playtable_tasks.yaml — the single source of truth the real
    calvin_env Tasks is instantiated from."""
    import yaml

    from tests.conftest import REFERENCE_ROOT
    from hulc_tpu.evaluation import tasks as T

    path = REFERENCE_ROOT / "conf/callbacks/rollout/tasks/new_playtable_tasks.yaml"
    spec = yaml.safe_load(path.read_text())["tasks"]

    assert set(spec) == set(T.ALL_TASKS)

    for name, args in spec.items():
        kind = args[0]
        if kind == "rotate_object":
            block, deg = T.ROTATE_TASKS[name]
            assert (block, deg) == (args[1], args[2]), name
        elif kind == "push_object":
            block, dx = T.PUSH_TASKS[name]
            assert (block, dx) == (args[1], args[2]), name
            assert args[3] == 0, name  # y_direction always 0 in the protocol
        elif kind == "move_door_rel":
            idx, thr = T.DOOR_TASKS[name]
            # scene_obs layout: slider=0 (base__slide), drawer=1 (base__drawer)
            assert idx == {"base__slide": 0, "base__drawer": 1}[args[1]], name
            assert thr == args[2], name
        elif kind == "lift_object":
            block, dz, surf = T.LIFT_TASKS[name]
            assert (block, dz) == (args[1], args[2]), name
            assert surf == {"base_link": "table", "plank_link": "slider",
                            "drawer_link": "drawer"}[args[4]], name
        elif kind == "toggle_light":
            idx, frm, to = T.LIGHT_TASKS[name]
            # scene_obs layout: lightbulb=4, led=5
            assert idx == {"lightbulb": 4, "led": 5}[args[1]], name
            assert (frm, to) == (args[2], args[3]), name
        elif kind == "place_object":
            surf = T.PLACE_TASKS[name]
            assert surf == {"plank_link": "slider", "drawer_link": "drawer"}[args[2]], name
        elif kind == "push_object_into":
            assert name == "push_into_drawer"
            assert set(args[1]) == set(T.BLOCKS), name
        elif kind in ("stack_objects", "unstack_objects"):
            assert name in ("stack_block", "unstack_block")
        else:
            raise AssertionError(f"unknown base task {kind} for {name}")
