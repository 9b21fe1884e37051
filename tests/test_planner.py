"""Planner tests on hand-built SDF volumes (box room with known free space)."""
import jax
import numpy as np
import pytest

from naruto_tpu.config import make_config
from naruto_tpu.config.schema import deep_update
from naruto_tpu.planner import init_planner
from naruto_tpu.planner.aggregation import make_aggregator, make_goal_space
from naruto_tpu.planner.collision import (
    is_collision_free, query_sdf_np, trilinear_interpolation_np,
)
from naruto_tpu.planner.rotation import rotation_planning
from naruto_tpu.planner.rrt import RRTPlanner


def box_room_sdf(shape=(30, 30, 20), wall=3):
    """SDF (voxel units): distance to nearest wall; interior positive."""
    X, Y, Z = shape
    x, y, z = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                          indexing="ij")
    d = np.minimum.reduce([
        x - wall, X - 1 - wall - x,
        y - wall, Y - 1 - wall - y,
        z - wall, Z - 1 - wall - z]).astype(np.float32)
    return d


class TestCollision:
    def test_interp_matches_exact_at_vertices(self):
        vol = np.random.default_rng(0).normal(size=(5, 5, 5)).astype(np.float32)
        out = trilinear_interpolation_np(vol, np.array([[1.0, 2.0, 3.0]]))
        np.testing.assert_allclose(out[0], vol[1, 2, 3], rtol=1e-6)

    def test_free_line(self):
        sdf = box_room_sdf()
        n, free = is_collision_free(np.array([10.0, 10, 10]),
                                    np.array([20.0, 20, 10]), sdf)
        assert free and n >= 1

    def test_blocked_line(self):
        sdf = box_room_sdf()
        n, free = is_collision_free(np.array([15.0, 15, 10]),
                                    np.array([0.0, 15, 10]), sdf)
        assert not free

    def test_prefix_count_semantics(self):
        sdf = box_room_sdf()
        # heading toward a wall: some free steps before the block
        n, free = is_collision_free(np.array([15.0, 15, 10]),
                                    np.array([2.0, 15, 10]), sdf, step_size=1)
        assert not free
        assert 0 <= n < 13


class TestRotation:
    def test_step_cap(self):
        R0 = np.eye(3)
        from scipy.spatial.transform import Rotation
        R1 = Rotation.from_euler("z", 45, degrees=True).as_matrix()
        rots = rotation_planning(R0, [R1], max_rot_deg=10.0)
        # consecutive rotations differ by <= ~11.25 deg (45/4 steps)
        for a, b in zip(rots[:-1], rots[1:]):
            ang = Rotation.from_matrix(a.T @ b).magnitude() * 180 / np.pi
            assert ang <= 11.5
        # endpoint included
        np.testing.assert_allclose(rots[-1], R1, atol=1e-5)
        # first element is the start rotation (consumed as a no-op)
        np.testing.assert_allclose(rots[0], R0, atol=1e-6)

    def test_greedy_ordering(self):
        from scipy.spatial.transform import Rotation
        R0 = np.eye(3)
        near = Rotation.from_euler("z", 20, degrees=True).as_matrix()
        far = Rotation.from_euler("z", 170, degrees=True).as_matrix()
        rots = rotation_planning(R0, [far, near], max_rot_deg=30.0)
        # near target must be visited before far
        angs = [Rotation.from_matrix(r).magnitude() * 180 / np.pi
                for r in rots]
        i_near = int(np.argmin([abs(a - 20) for a in angs]))
        i_far = int(np.argmin([abs(a - 170) for a in angs]))
        assert i_near < i_far


class TestRRT:
    def test_reaches_goal_in_open_room(self):
        sdf = box_room_sdf()
        rrt = RRTPlanner(sdf.shape, step_size=1.0, step_amplifier=10,
                         rng=np.random.default_rng(0))
        rrt.start_new_plan(np.array([10.0, 10, 10]),
                           np.array([20.0, 20, 12]), sdf)
        assert rrt.run()
        path = rrt.find_path()
        assert len(path) >= 2
        np.testing.assert_allclose(path[0], [20, 20, 12])  # goal first
        np.testing.assert_allclose(path[-1], [10, 10, 10], atol=1.01)
        # path segments are collision free
        for a, b in zip(path[:-1], path[1:]):
            _, free = is_collision_free(a, b, sdf)
            assert free

    def test_unreachable_goal(self):
        sdf = box_room_sdf()
        # goal inside the wall
        rrt = RRTPlanner(sdf.shape, max_iter=200, step_size=1.0,
                         rng=np.random.default_rng(0))
        rrt.start_new_plan(np.array([15.0, 15, 10]),
                           np.array([1.0, 1.0, 1.0]), sdf)
        assert not rrt.run()

    def test_reachable_mask(self):
        sdf = box_room_sdf()
        rrt = RRTPlanner(sdf.shape, step_size=1.0, step_amplifier=10,
                         rng=np.random.default_rng(0))
        rrt.start_new_plan(np.array([15.0, 15, 10]), np.zeros(3), sdf)
        rrt.run_full()
        mask = rrt.get_reachable_mask()
        assert mask.shape == sdf.shape
        assert mask[15, 15, 10] == 1.0     # start reachable
        assert mask[1, 1, 1] == 0.0        # inside wall unreachable
        # free interior should be mostly covered
        interior = mask[6:24, 6:24, 6:14]
        assert interior.mean() > 0.85

    @staticmethod
    def _two_room_sdf(door: bool) -> np.ndarray:
        """Nontrivial map: two rooms split by a wall at x=20 with an
        optional door (y 18..22). Free space sdf=5, walls sdf=-1."""
        sdf = np.full((40, 40, 10), 5.0, dtype=np.float32)
        sdf[0, :, :] = sdf[-1, :, :] = -1.0
        sdf[:, 0, :] = sdf[:, -1, :] = -1.0
        sdf[:, :, 0] = sdf[:, :, -1] = -1.0
        sdf[20, :, :] = -1.0
        if door:
            sdf[20, 18:23, 1:9] = 5.0
        return sdf

    def test_run_full_mask_equivalence_nontrivial(self):
        """Pins run_full's capped growth against a flood-fill ground truth
        (VERDICT r4 weak #7): on a two-room map the mask must cover the
        start room's free space AND everything through the door, and with
        the door closed it must be SOUND — zero leakage into the
        disconnected room. Guards 'saturates coverage' as a tested claim
        rather than an assertion (PARITY #3; ref grows full voxel count,
        rrt.py:350-355)."""
        from collections import deque

        for door in (True, False):
            sdf = self._two_room_sdf(door)
            rrt = RRTPlanner(sdf.shape, step_size=1.0, step_amplifier=10,
                             rng=np.random.default_rng(3))
            rrt.start_new_plan(np.array([10.0, 20, 5]), np.zeros(3), sdf)
            rrt.run_full()
            mask = rrt.get_reachable_mask()

            # flood-fill GT over comfortably-free voxels (6-connectivity,
            # 1 voxel clear of any wall so the trilinear collision
            # primitive cannot disagree at the boundary)
            free = sdf >= 5.0
            clear = free.copy()
            for ax in range(3):
                for s in (-1, 1):
                    clear &= np.roll(free, s, axis=ax)
            gt = np.zeros_like(clear)
            start = (10, 20, 5)
            gt[start] = True
            q = deque([start])
            while q:
                x, y, z = q.popleft()
                for dx, dy, dz in ((1, 0, 0), (-1, 0, 0), (0, 1, 0),
                                   (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                    n = (x + dx, y + dy, z + dz)
                    if 0 <= n[0] < 40 and 0 <= n[1] < 40 and 0 <= n[2] < 10 \
                            and clear[n] and not gt[n]:
                        gt[n] = True
                        q.append(n)
            covered = mask[gt].mean()
            assert covered > 0.80, (door, covered)
            # soundness: the far room (x>20) gets no mask when sealed;
            # through the door it must be substantially explored
            far = mask[22:39, 1:39, 1:9]
            far_gt = gt[22:39, 1:39, 1:9]
            if door:
                assert far[far_gt].mean() > 0.70, far[far_gt].mean()
            else:
                assert far.max() == 0.0, "mask leaked through a sealed wall"


class TestAggregation:
    def test_goal_scores_point_at_uncertainty(self):
        shape = (30, 30, 20)
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[24, 24, 10] = 5.0  # one very uncertain surface-ish voxel
        gs = make_goal_space(shape, 0.1, gs_z_levels=[8, 10, 12])
        agg_fn = make_aggregator(shape, gs, 0.1, top_k=100, subset=100,
                                 sensing_range=(0.5, 2.0), safe_sdf=0.8)
        out = agg_fn(uncert, sdf, jax.random.PRNGKey(0))
        assert bool(out.any_valid)
        aggre = np.asarray(out.gs_aggre)
        gi = np.unravel_index(aggre.argmax(), aggre.shape)
        goal = np.array([gs.x_range[gi[0]], gs.y_range[gi[1]],
                         gs.z_range[gi[2]]])
        # best goal within sensing range (5..20 voxels) of the uncertain voxel
        d = np.linalg.norm(goal - np.array([24, 24, 10]))
        assert 5.0 < d < 20.0

    def test_unsafe_goals_excluded(self):
        shape = (30, 30, 20)
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[4, 4, 10] = 5.0  # uncertainty right at the wall
        gs = make_goal_space(shape, 0.1, gs_z_levels=[10])
        agg_fn = make_aggregator(shape, gs, 0.1, top_k=50, subset=50,
                                 sensing_range=(0.0, 2.0), safe_sdf=0.8)
        out = agg_fn(uncert, sdf, jax.random.PRNGKey(0))
        cols = np.asarray(out.collections).reshape(*out.gs_aggre.shape, -1)
        # goals at border / near wall contribute nothing
        aggre = np.asarray(out.gs_aggre)
        assert aggre[0, 0, 0] == 0.0

    def test_subset_weighting_flag(self):
        """PARITY deviation #12: default draws the target subset weighted
        toward NONZERO top-k entries; subset_nonzero_weighted=False is the
        exact-reference fallback (unweighted arbitrary slice of the top-k,
        ref naruto_planner.py:625-630)."""
        shape = (20, 20, 12)
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        # 8 nonzero uncertain voxels in a volume of 4800: an unweighted
        # 8-of-400 draw almost surely misses most of them; the weighted
        # draw must hit all 8.
        nz_idx = [(10, 10, 6), (11, 10, 6), (10, 11, 6), (11, 11, 6),
                  (9, 10, 6), (10, 9, 6), (9, 9, 6), (11, 9, 6)]
        for i, j, k in nz_idx:
            uncert[i, j, k] = 5.0
        gs = make_goal_space(shape, 0.1, gs_z_levels=[6])

        def chosen_nonzero(weighted):
            agg_fn = make_aggregator(
                shape, gs, 0.1, top_k=400, subset=8,
                sensing_range=(0.0, 2.0), safe_sdf=0.8,
                subset_nonzero_weighted=weighted)
            out = agg_fn(uncert, sdf, jax.random.PRNGKey(3))
            tv = np.asarray(out.topk_vxl)
            return sum(uncert[tuple(v)] > 0 for v in tv)

        assert chosen_nonzero(True) == 8     # all picks land on signal
        assert chosen_nonzero(False) <= 4    # reference draw mostly misses

    def test_subset_flag_threads_from_config(self):
        cfg = deep_update(_planner_cfg(),
                          {"planner": {"subset_nonzero_weighted": False}})
        pl = init_planner(cfg)
        assert pl.pcfg.subset_nonzero_weighted is False


def _planner_cfg():
    cfg = make_config("Replica", "office0", num_iter=100)
    bound = ((-1.5, 1.4), (-1.5, 1.4), (-1.0, 0.9))  # 30x30x20 at 0.1
    return deep_update(cfg, {
        "mapper": {"bound": bound, "marching_cubes_bound": bound},
        "planner": {"gs_z_levels": [8, 10, 12]},
    })


class TestPlannerFSM:
    def test_full_planning_cycle(self):
        cfg = _planner_cfg()
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()

        shape = planner.vol_shape
        assert shape == (30, 30, 20)
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 4.0
        uncert[20, 8, 10] = 3.0
        vols = [uncert, sdf]

        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))

        states = []
        for i in range(60):
            planner.update_step(i)
            pose = planner.main(vols, pose, is_new_vols=(i % 5 == 0))
            states.append(planner.state)
        # FSM progressed through the full cycle
        assert "planning" in states
        assert "movingToGoal" in states
        assert "rotatingAtStart" in states
        # agent actually moved
        start = planner.vox2loc(np.array([15.0, 15, 10]))
        assert np.linalg.norm(pose[:3, 3] - start) > 0.2
        # pose stays inside the room's free space
        vox = planner.loc2vox(pose[:3, 3])
        assert query_sdf_np(sdf, vox[None])[0] > 0

    def test_rotation_validity(self):
        cfg = _planner_cfg()
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        sdf = box_room_sdf(planner.vol_shape)
        uncert = np.zeros(planner.vol_shape, dtype=np.float32)
        uncert[22, 22, 10] = 4.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))
        for i in range(30):
            planner.update_step(i)
            pose = planner.main([uncert, sdf], pose, is_new_vols=(i == 0))
            R = pose[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
            assert np.linalg.det(R) > 0.9


class TestFSMTransitions:
    """Exact transition contract (ref naruto_planner.py:162-229)."""

    def _mk(self):
        cfg = _planner_cfg()
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        sdf = box_room_sdf(planner.vol_shape)
        uncert = np.zeros(planner.vol_shape, dtype=np.float32)
        uncert[21:24, 21:24, 9:12] = 4.0   # realistic surface-patch blob
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))
        return planner, [uncert, sdf], pose

    def test_collision_on_first_move_after_rotations_empty(self):
        """VERDICT r4 weak #8: the rotation list empties (rotatingAtStart ->
        movingToGoal) and a collision fires on that very first move step.
        Contract: the FSM lands in 'staying' with the collision counted,
        the pose does not advance into the obstacle, and the NEXT planning
        cycle rebuilds rots/path fresh (no stale-list crash or leak)."""
        planner, vols, pose = self._mk()
        seq = []
        collided = False
        for i in range(80):
            planner.update_step(i)
            prev_state, prev_pos = planner.state, pose[:3, 3].copy()
            if (prev_state == "movingToGoal" and not collided
                    and not planner.rots and planner.path):
                # wall off the next path node so detect_collision fires on
                # exactly the step the rotation list has just emptied
                vols[1] = vols[1].copy()
                nxt = np.round(planner.path[-1]).astype(int)
                lo = np.maximum(nxt - 2, 0)
                vols[1][lo[0]:nxt[0] + 3, lo[1]:nxt[1] + 3,
                        lo[2]:nxt[2] + 3] = -1.0
                collided = True
            pose = planner.main(vols, pose, is_new_vols=(i % 5 == 0))
            seq.append(planner.state)
            if collided and planner.state == "staying":
                # collision registered; pose must not have advanced
                np.testing.assert_allclose(pose[:3, 3], prev_pos, atol=1e-6)
                break
        assert collided, "scenario never reached movingToGoal with empty rots"
        assert planner.stats["collisions"] >= 1
        assert "staying" in seq
        # recovery: the planner replans and the FSM keeps cycling
        vols[1] = box_room_sdf(planner.vol_shape)   # clear the wall
        for j in range(80, 140):
            planner.update_step(j)
            pose = planner.main(vols, pose, is_new_vols=True)
            seq.append(planner.state)
        assert "movingToGoal" in seq[seq.index("staying"):], \
            "planner never recovered after the collision"

    def test_canonical_sequence(self):
        planner, vols, pose = self._mk()
        seq = []
        for i in range(80):
            planner.update_step(i)
            pose = planner.main(vols, pose, is_new_vols=(i == 0))
            seq.append(planner.state)
        # collapse consecutive duplicates
        collapsed = [s for j, s in enumerate(seq)
                     if j == 0 or s != seq[j - 1]]
        # canonical order: planning -> rotPlanStart -> rotatingStart ->
        # movingToGoal -> rotPlanGoal -> rotatingGoal -> ...
        want = ["planning", "rotationPlanningAtStart", "rotatingAtStart",
                "movingToGoal", "rotationPlanningAtGoal", "rotatingAtGoal"]
        assert collapsed[:6] == want, collapsed[:8]

    def test_unreachable_goal_goes_staying(self):
        planner, vols, pose = self._mk()
        # surround the agent with walls: no goal is reachable. Plan at a
        # step > 0 (at step 0 the reference forces the SDF empty —
        # naruto_planner.py:436-438 — so the first plan always "succeeds").
        sdf = np.full(planner.vol_shape, -1.0, dtype=np.float32)
        sdf[13:18, 13:18, 8:13] = 2.0   # only a small pocket is free
        vols = [vols[0], sdf]
        planner.update_step(5)
        planner.main(vols, pose, is_new_vols=True)   # staying -> planning
        assert planner.state == "planning"
        planner.update_step(6)
        planner.main(vols, pose, is_new_vols=False)
        # goal unreachable -> staying
        assert planner.state == "staying"

    def test_staying_waits_for_new_map(self):
        planner, vols, pose = self._mk()
        planner.state = "staying"
        planner.update_step(0)
        planner.main(vols, pose, is_new_vols=False)
        assert planner.state == "staying"
        planner.main(vols, pose, is_new_vols=True)
        assert planner.state == "planning"


class TestTravMaskDecay:
    def test_decay_resets_stale_mask(self):
        """planner.trav_mask_decay=k resets the traversability mask to ones
        every k-th plan, so regions masked out by an early failed RRT are
        retried against the improved map (opt-in deviation; default 0 =
        exact reference lifecycle, naruto_planner.py:330-393)."""
        cfg = deep_update(_planner_cfg(), {"planner": {"trav_mask_decay": 2}})
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()

        shape = planner.vol_shape
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 4.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))

        planner.update_step(0)
        planner.state = "planning"
        planner.compute_next_state_pose(pose, [uncert, sdf])
        # poison the mask as a failed RRT would
        planner.traversability_mask = np.zeros(shape, dtype=np.float32)
        planner.update_step(1)
        planner.state = "planning"
        planner.compute_next_state_pose(pose, [uncert, sdf])
        # 2nd plan (events len 1 -> not yet 2): mask still stale? The decay
        # fires when len(events) % k == 0, i.e. before the 3rd plan here.
        planner.update_step(2)
        planner.state = "planning"
        planner.compute_next_state_pose(pose, [uncert, sdf])
        assert planner.stats["mask_decays"] >= 1
        assert planner.traversability_mask.max() == 1.0
        assert planner.stats_summary()["mask_decays"] >= 1

    def test_default_keeps_reference_lifecycle(self):
        cfg = _planner_cfg()
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        shape = planner.vol_shape
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 4.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))
        for i in range(4):
            planner.update_step(i)
            planner.state = "planning"
            planner.compute_next_state_pose(pose, [uncert, sdf])
        assert planner.stats["mask_decays"] == 0


class TestGoalRepeatPenalty:
    def test_repeat_penalty_moves_off_dominant_goal(self):
        """planner.goal_repeat_penalty discounts a goal's aggregated score
        by 1/(1+p*visits): with two uncertainty hotspots the argmax leaves
        the dominant goal after it has been chosen, instead of re-picking
        it every plan (the weak-seed signature: goal_repeat_max 9/41)."""
        cfg = deep_update(_planner_cfg(),
                          {"planner": {"goal_repeat_penalty": 1.0}})
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()

        shape = planner.vol_shape
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 5.0       # dominant hotspot
        uncert[8, 8, 10] = 3.0         # secondary hotspot
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))

        goals = []
        for i in range(3):
            planner.update_step(i)
            planner.state = "planning"
            planner.compute_next_state_pose(pose, [uncert, sdf])
            goals.append(tuple(planner.stats["events"][-1]["goal_vxl"]))
        # the same goal is never chosen three times in a row under p=1.0
        assert len(set(goals)) >= 2

    def test_collision_charges_a_visit(self):
        """A move-time collision counts as a failed ATTEMPT at the current
        goal: the penalty accrues without re-choosing it, so a
        collision->staying->replan livelock (raycast seed_1999: 159 plans
        of one truly-impassable goal, trav mask never rebuilt because RRT
        succeeds on the optimistic SDF) discounts the goal away."""
        cfg = deep_update(_planner_cfg(),
                          {"planner": {"goal_repeat_penalty": 1.0}})
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        shape = planner.vol_shape
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 5.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))

        planner.update_step(0)
        planner.state = "planning"
        planner.compute_next_state_pose(pose, [uncert, sdf])
        gi = planner._last_goal_gi
        assert planner._goal_visits[gi] == 1   # charged at choice

        # steer the next hop into a wall voxel: the line check collides
        planner.state = "movingToGoal"
        planner.path = [np.array([0.0, 15.0, 10.0])]
        planner.update_state([uncert, sdf], pose, is_new_vols=True)
        assert planner.state == "staying"
        assert planner._goal_visits[gi] == 2   # charged again on collision

    def test_penalty_off_tracks_nothing(self):
        """Default p=0.0 keeps the exact reference argmax: no visit
        tracking, no score modification. (Goal IDENTITY between plans
        still jitters with the aggregation's random target subset, so the
        off-behavior contract is 'no discounting machinery engaged'.)"""
        cfg = _planner_cfg()
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        shape = planner.vol_shape
        sdf = box_room_sdf(shape)
        uncert = np.zeros(shape, dtype=np.float32)
        uncert[22, 22, 10] = 5.0
        uncert[8, 8, 10] = 3.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))
        for i in range(3):
            planner.update_step(i)
            planner.state = "planning"
            planner.compute_next_state_pose(pose, [uncert, sdf])
        assert planner._goal_visits == {}


class TestCollisionSimOverride:
    """planner.collision_sim_override: a phantom wall in the learned SDF
    (sdf_free=False) must not trap the agent when a simulator ERP probe
    shows real clearance at the next pose — the raycast seed_1999
    livelock (142 collision->staying cycles, all logged with
    invalid_ratio=0.000). Default 0.0 keeps the reference's SDF-only
    Replica combo (ref naruto_planner.py:573-575)."""

    class _StubSim:
        def __init__(self, min_dist, invalid_frac=0.0):
            self.min_dist = min_dist
            self.invalid_frac = invalid_frac
            self.probes = 0

        def simulate(self, pose, return_erp=False, **kw):
            self.probes += 1
            erp = np.full((8, 16), max(self.min_dist, 1.0), np.float32)
            erp[0, 0] = self.min_dist
            n_inv = int(round(self.invalid_frac * erp.size))
            erp.flat[1:1 + n_inv] = 1e8
            return None, None, None, erp

        def probe_erp_dist(self, pose):
            # planner probes go through the distance-only interface
            # (sim.base.Simulator.probe_erp_dist); mirror its fallback
            return self.simulate(pose, return_erp=True)[3]

    def _mk(self, override, sim):
        cfg = deep_update(_planner_cfg(), {
            "planner": {"collision_sim_override": override}})
        planner = init_planner(cfg)
        planner.init_data(cfg.mapper.bound_np)
        planner.init_local_planner()
        planner.update_sim(sim)
        phantom = np.full(planner.vol_shape, -1.0, dtype=np.float32)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))
        nxt = planner.vox2loc(np.array([16.0, 15, 10]))
        return planner, phantom, pose, nxt

    def test_clear_probe_overrides_phantom(self):
        sim = self._StubSim(min_dist=0.5)
        planner, sdf, pose, nxt = self._mk(0.05, sim)
        assert planner.detect_collision(sdf, pose, nxt) is False
        assert sim.probes == 1
        assert planner.stats_summary()["collision_overrides"] == 1

    def test_tight_probe_keeps_collision(self):
        sim = self._StubSim(min_dist=0.02)     # < 5cm real clearance
        planner, sdf, pose, nxt = self._mk(0.05, sim)
        assert planner.detect_collision(sdf, pose, nxt) is True

    def test_invalid_region_keeps_collision(self):
        sim = self._StubSim(min_dist=0.5, invalid_frac=0.9)
        planner, sdf, pose, nxt = self._mk(0.05, sim)
        assert planner.detect_collision(sdf, pose, nxt) is True

    def test_default_off_never_probes(self):
        sim = self._StubSim(min_dist=0.5)
        planner, sdf, pose, nxt = self._mk(0.0, sim)
        assert planner.detect_collision(sdf, pose, nxt) is True
        assert sim.probes == 0

    def test_free_sdf_never_probes(self):
        sim = self._StubSim(min_dist=0.5)
        planner, _, pose, nxt = self._mk(0.05, sim)
        free = box_room_sdf(planner.vol_shape)
        assert planner.detect_collision(free, pose, nxt) is False
        assert sim.probes == 0


class TestLazyVolumeConsumption:
    """The engine hands the planner a LazyVolumes view (mapper.py); only
    states that actually read the volumes may materialize it — the
    rotating/rotation-planning majority must not block the host on the
    device queue (PERFORMANCE.md host/device pipelining)."""

    class _Guard:
        """List-like volumes that record (or forbid) materialization."""
        def __init__(self, vols):
            self.vols = vols
            self.reads = 0

        def __getitem__(self, i):
            self.reads += 1
            return self.vols[i]

        def __iter__(self):
            self.reads += 1
            return iter(self.vols)

        def __len__(self):
            return 2

    def test_rotating_states_never_read_volumes(self):
        planner = init_planner(_planner_cfg())
        planner.init_data(planner.cfg.mapper.bound_np)
        planner.init_local_planner()
        sdf = box_room_sdf(planner.vol_shape)
        uncert = np.zeros(planner.vol_shape, dtype=np.float32)
        uncert[21:24, 21:24, 9:12] = 4.0
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = planner.vox2loc(np.array([15.0, 15, 10]))

        reads_by_state = {}
        for i in range(60):
            planner.update_step(i)
            guard = self._Guard([uncert, sdf])
            state_before = planner.state
            pose = planner.main(guard, pose, is_new_vols=(i == 0))
            reads_by_state.setdefault(planner.state, 0)
            reads_by_state[planner.state] += guard.reads
        # every rotation-side state must have run AND read nothing
        for s in ("rotationPlanningAtStart", "rotatingAtStart",
                  "rotationPlanningAtGoal", "rotatingAtGoal"):
            assert s in reads_by_state, (s, reads_by_state)
            assert reads_by_state[s] == 0, (s, reads_by_state)
        # the planning state must have read them (aggregation)
        assert reads_by_state.get("planning", 0) > 0, reads_by_state

    def test_mapper_returns_lazy_list_like(self):
        from naruto_tpu.mapping.mapper import LazyVolumes
        import jax.numpy as jnp

        lv = LazyVolumes(jnp.ones((2, 2, 2)), jnp.zeros((2, 2, 2)))
        assert len(lv) == 2
        u, s = lv
        assert u.shape == (2, 2, 2) and float(s.max()) == 0.0
        assert isinstance(lv[0], np.ndarray)
        lv.ready()   # idempotent after materialization
