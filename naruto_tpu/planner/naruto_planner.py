"""The NARUTO active planner: a 7-state FSM over uncertainty-guided goals.

Behavioral contract from src/planner/naruto_planner.py (C17 in SURVEY.md):
  states: staying -> planning -> rotationPlanningAtStart -> rotatingAtStart
          -> movingToGoal -> rotationPlanningAtGoal -> rotatingAtGoal ->
          planning; collision or unreachable goal -> staying.
Per planning round: filter the uncertainty volume by the traversability mask,
aggregate uncertainty over the goal space (aggregation.py), pick the argmax
goal and its top-obs_per_goal look-at targets, plan a path with RRT
(rrt.py); if aggregation found no valid pairs, compute a fresh
traversability mask (dense RRT growth) and retry; if the RRT fails twice,
derive the traversability mask from tree reachability so the next round
avoids unreachable goals (ref :403-460). While moving, each step pops one
path node, orients the camera at the current look-at target, and runs
collision detection (SDF line check + simulated ERP distance, combination
depending on dataset — ref :512-594).
"""
from __future__ import annotations

import time
from typing import Dict, List, Optional

import jax
import numpy as np

from naruto_tpu.config.schema import MainConfig
from naruto_tpu.geometry.pose import lookat_rotation
from naruto_tpu.geometry.voxel import loc2vox, volume_shape, vox2loc
from naruto_tpu.planner.aggregation import (
    AggregationOutputs, make_aggregator, make_goal_space,
)
from naruto_tpu.planner.collision import is_collision_free
from naruto_tpu.planner.rotation import rotation_planning
from naruto_tpu.planner.rrt import RRTPlanner
from naruto_tpu.utils.printer import InfoPrinter
from naruto_tpu.utils.timer import Timer


class NarutoPlanner:
    def __init__(self, cfg: MainConfig,
                 printer: Optional[InfoPrinter] = None):
        self.cfg = cfg
        self.pcfg = cfg.planner
        self.printer = printer or InfoPrinter(quiet=True)
        self.timer = Timer()
        self.step = 0
        self.state = "staying"
        self.sim = None
        self.path: List[np.ndarray] = []
        self.lookat_tgts: List[np.ndarray] = []
        self.rots: List[np.ndarray] = []
        self.is_goal_reachable = False
        self.rng = np.random.default_rng(cfg.general.seed)
        self._agg_key = jax.random.PRNGKey(cfg.general.seed + 7)
        # exploration diagnostics (VERDICT r3 weak#3/next#6: weak seeds
        # correlate with exploration stalls, never instrumented): per-plan
        # events + per-step state dwell, dumped by Engine.finalize as
        # planner_stats.json and summarized by stats_summary().
        self.stats: Dict = {"events": [], "state_steps": {},
                            "collisions": 0, "mask_refilters": 0,
                            "mask_decays": 0}
        self._goal_visits: Dict = {}    # goal-space index -> times chosen
        self._last_goal_gi = None       # goal-space index of current plan

    # -------------------------------------------------------------- wiring
    def update_step(self, step: int) -> None:
        self.step = step

    # ------------------------------------------------- mitigation state IO
    # ADVICE r4: the goal-repeat penalty counters are load-bearing under the
    # rescue config; a full-state resume that resets them can re-enter the
    # exact livelock the mitigation breaks. Engine persists this dict in
    # the checkpoint header and restores it on resume.
    def export_state(self) -> Dict:
        # goal indices are 3-tuples (unravel_index of the goal-space
        # argmax) — serialize as "x,y,z" keys / [x,y,z] lists for JSON
        return {"goal_visits": {",".join(str(int(i)) for i in k): int(v)
                                for k, v in self._goal_visits.items()},
                "last_goal_gi": (None if self._last_goal_gi is None
                                 else [int(i) for i in self._last_goal_gi]),
                # FSM position: a resumed run continues the in-flight plan
                # instead of restarting at "staying" (which would waste a
                # planning cycle and desynchronize from the saved poses)
                "fsm": {
                    "state": self.state,
                    "path": [[float(v) for v in np.asarray(p)]
                             for p in self.path],
                    "lookat_tgts": [[float(v) for v in np.asarray(t)]
                                    for t in self.lookat_tgts],
                    "rots": [np.asarray(r).reshape(-1).tolist()
                             for r in self.rots],
                    "is_goal_reachable": bool(self.is_goal_reachable),
                    "agg_key": [int(v) for v in np.asarray(self._agg_key)],
                }}

    def restore_state(self, blob: Dict) -> None:
        self._goal_visits = {
            tuple(int(i) for i in k.split(",")): int(v)
            for k, v in blob.get("goal_visits", {}).items()}
        gi = blob.get("last_goal_gi")
        self._last_goal_gi = None if gi is None else tuple(
            int(i) for i in gi)
        fsm = blob.get("fsm")
        if fsm:
            self.state = fsm["state"]
            self.path = [np.asarray(p, np.float32) for p in fsm["path"]]
            self.lookat_tgts = [np.asarray(t, np.float32)
                                for t in fsm["lookat_tgts"]]
            self.rots = [np.asarray(r, np.float32).reshape(3, 3)
                         for r in fsm["rots"]]
            self.is_goal_reachable = bool(fsm["is_goal_reachable"])
            if fsm.get("agg_key") is not None:
                self._agg_key = jax.numpy.asarray(
                    fsm["agg_key"], dtype=jax.numpy.uint32)
            # NOT restored: the numpy RRT rng (a resumed run's tree
            # sampling diverges from the uninterrupted one — documented)

    def update_sim(self, sim) -> None:
        self.sim = sim

    def init_data(self, bound) -> None:
        self.bbox = np.asarray(bound, dtype=np.float32)
        # single source of truth: the planner volume IS the mapper's
        # uncertainty/SDF volume (ref configs/default.py:100 ties them)
        self.voxel_size = self.cfg.mapper.voxel_size
        self.vol_shape = volume_shape(self.bbox, self.voxel_size)
        self.goal_space = make_goal_space(self.vol_shape, self.voxel_size,
                                          self.pcfg.gs_z_levels)
        self.aggregate = make_aggregator(
            self.vol_shape, self.goal_space, self.voxel_size,
            top_k=self.pcfg.uncert_top_k,
            subset=self.pcfg.uncert_top_k_subset,
            sensing_range=tuple(self.pcfg.gs_sensing_range),
            safe_sdf=self.pcfg.safe_sdf,
            subset_nonzero_weighted=self.pcfg.subset_nonzero_weighted)
        self.traversability_mask = np.ones(self.vol_shape, dtype=np.float32)

    def init_local_planner(self) -> None:
        self.local_planner = RRTPlanner(
            vol_shape=self.vol_shape,
            max_iter=self.pcfg.rrt_max_iter,
            step_size=self.pcfg.rrt_step_size,
            maxz=self.pcfg.rrt_maxz,
            z_levels=self.pcfg.rrt_z_levels,
            step_amplifier=self.pcfg.rrt_step_amplifier,
            collision_thre=self.pcfg.collision_thre,
            enable_direct_line=self.pcfg.enable_direct_line,
            rng=self.rng)

    def vox2loc(self, vox):
        return vox2loc(vox, self.bbox, self.voxel_size)

    def loc2vox(self, loc):
        return loc2vox(loc, self.bbox, self.voxel_size)

    # ----------------------------------------------------------------- API
    def main(self, uncert_sdf_vols: List[np.ndarray], cur_pose: np.ndarray,
             is_new_vols: bool) -> np.ndarray:
        self.update_state(uncert_sdf_vols, cur_pose, is_new_vols)
        self.printer(f"Current state: {self.state}", self.step, "Planner")
        ss = self.stats["state_steps"]
        ss[self.state] = ss.get(self.state, 0) + 1
        return self.compute_next_state_pose(cur_pose, uncert_sdf_vols)

    # --------------------------------------------------------- state update
    def update_state(self, uncert_sdf_vols, cur_pose, is_new_vols) -> None:
        # volumes may be a LazyVolumes view — index it only in the one
        # branch that reads it, so rotating/planning transitions never
        # force the device->host pull
        s = self.state
        if s == "planning":
            self.state = ("rotationPlanningAtStart" if self.is_goal_reachable
                          else "staying")
        elif s == "rotationPlanningAtStart":
            self.state = "rotatingAtStart"
        elif s == "rotatingAtStart":
            self.state = "movingToGoal" if not self.rots else "rotatingAtStart"
        elif s == "movingToGoal":
            if not self.path:
                self.state = "rotationPlanningAtGoal"
            else:
                next_loc = self.vox2loc(self.path[-1])
                if self.detect_collision(uncert_sdf_vols[1], cur_pose,
                                         next_loc):
                    self.state = "staying"
                    self.stats["collisions"] += 1
                    if (self.pcfg.goal_repeat_penalty > 0.0
                            and self._last_goal_gi is not None):
                        # a collision is a FAILED attempt at this goal:
                        # charge it a visit so the repeat penalty accrues
                        # per attempt, not per choice (the seed_1999
                        # livelock re-plans the same truly-impassable
                        # goal 159x; choice-only accrual discounts it
                        # too slowly to break the loop)
                        self._goal_visits[self._last_goal_gi] = \
                            self._goal_visits.get(self._last_goal_gi, 0) + 1
        elif s == "rotationPlanningAtGoal":
            self.state = "rotatingAtGoal"
        elif s == "rotatingAtGoal":
            self.state = "planning" if not self.rots else "rotatingAtGoal"
        elif s == "staying":
            self.state = "planning" if is_new_vols else "staying"

    # ------------------------------------------------------- pose computing
    def compute_next_state_pose(self, cur_pose, uncert_sdf_vols) -> np.ndarray:
        s = self.state
        if s == "planning":
            t0 = time.time()
            out = self.uncertainty_aware_planning(uncert_sdf_vols, cur_pose)
            self.stats["plan_wall_s"] = (self.stats.get("plan_wall_s", 0.0)
                                         + time.time() - t0)
            self.is_goal_reachable = out["is_goal_reachable"]
            self.lookat_tgts = out["lookat_tgts"]
            self.path = out["path"]
            return cur_pose.copy()
        if s == "rotationPlanningAtStart":
            self.rots = self._plan_rotations(cur_pose, [self.lookat_tgts[0]])
            return cur_pose.copy()
        if s in ("rotatingAtStart", "rotatingAtGoal"):
            rot = self.rots.pop(0)
            new_pose = cur_pose.copy()
            new_pose[:3, :3] = rot
            return new_pose
        if s == "movingToGoal":
            node = self.path.pop()
            next_loc = self.vox2loc(node)
            rot = lookat_rotation(next_loc, self.lookat_tgts[0],
                                  np.asarray(self.pcfg.up_dir))
            new_pose = cur_pose.copy()
            new_pose[:3, :3] = rot
            new_pose[:3, 3] = next_loc
            return new_pose
        if s == "rotationPlanningAtGoal":
            self.rots = self._plan_rotations(cur_pose, self.lookat_tgts)
            return cur_pose.copy()
        if s == "staying":
            return cur_pose.copy()
        raise NotImplementedError(s)

    def _plan_rotations(self, cur_pose, lookat_locs) -> List[np.ndarray]:
        rots = [lookat_rotation(cur_pose[:3, 3], loc,
                                np.asarray(self.pcfg.up_dir))
                for loc in lookat_locs]
        return rotation_planning(cur_pose[:3, :3], rots,
                                 self.pcfg.max_rot_deg)

    # ------------------------------------------------------------- planning
    def uncertainty_aware_planning(self, uncert_sdf_vols, cur_pose) -> Dict:
        uncert_vol, sdf_vol = uncert_sdf_vols
        if self.step == 0:
            self.traversability_mask = np.ones(self.vol_shape,
                                               dtype=np.float32)
        decay = self.pcfg.trav_mask_decay
        if (decay > 0 and self.stats["events"]
                and len(self.stats["events"]) % decay == 0):
            # mitigation (schema: PlannerConfig.trav_mask_decay): retry
            # stale masked-out regions against the improved map
            self.stats["mask_decays"] = self.stats.get("mask_decays", 0) + 1
            self.traversability_mask = np.ones(self.vol_shape,
                                               dtype=np.float32)
        if self.pcfg.enable_uncert_filtering:
            uncert_vol = uncert_vol * self.traversability_mask

        valid, agg = self._aggregate(uncert_vol, sdf_vol)
        if not valid and self.pcfg.enable_uncert_filtering:
            self.printer("No valid goals; computing traversability mask",
                         self.step, "Planner")
            self.stats["mask_refilters"] += 1
            self.traversability_mask = self.compute_traversability_mask(
                uncert_sdf_vols[1], cur_pose)
            uncert_vol = uncert_vol * self.traversability_mask
            valid, agg = self._aggregate(uncert_vol, sdf_vol)

        goal_vxl, lookat_tgts = self.goal_search(agg)
        self.stats["events"].append({
            "step": int(self.step),
            "uncert_mass": float(np.asarray(uncert_vol).sum()),
            "goal_vxl": [int(v) for v in goal_vxl],
            "pos_vxl": [int(v) for v in self.loc2vox(cur_pose[:3, 3])],
        })

        if self.pcfg.enable_eval:
            self.timer.start("path_planning", "Planner")
        path, reachable, trav_mask = self.path_planning(sdf_vol, cur_pose,
                                                        goal_vxl)
        if self.pcfg.enable_eval:
            self.timer.end("path_planning")
            self.local_planner.update_eval(
                reachable, self.timer.get_last_timing("path_planning"), path)
            self.local_planner.print_eval_result(self.printer)
        if trav_mask is not None:
            self.traversability_mask = trav_mask
        ev = self.stats["events"][-1]
        ev["reachable"] = bool(reachable)
        ev["path_len"] = len(path)
        return {"path": path, "is_goal_reachable": reachable,
                "lookat_tgts": lookat_tgts}

    def stats_summary(self) -> Dict:
        """Aggregate the exploration diagnostics: dwell per state, plan
        count, unreachable-goal count, goal-repeat concentration, and the
        uncertainty-mass trajectory (first/min/last) — the quantities the
        weak-seed diagnosis (VERDICT r3 #6) needs."""
        ev = self.stats["events"]
        goals = [tuple(e["goal_vxl"]) for e in ev]
        from collections import Counter
        rep = Counter(goals).most_common(1)
        masses = [e["uncert_mass"] for e in ev]
        return {
            "n_plans": len(ev),
            "n_unreachable": sum(1 for e in ev
                                 if not e.get("reachable", True)),
            "goal_repeat_max": (rep[0][1] if rep else 0),
            "goal_repeat_vxl": (list(rep[0][0]) if rep else None),
            "collisions": self.stats["collisions"],
            "collision_overrides": self.stats.get("collision_overrides", 0),
            "mask_refilters": self.stats["mask_refilters"],
            "mask_decays": self.stats.get("mask_decays", 0),
            "state_steps": dict(self.stats["state_steps"]),
            "uncert_mass_first": masses[0] if masses else None,
            "uncert_mass_min": min(masses) if masses else None,
            "uncert_mass_last": masses[-1] if masses else None,
            # host wall-clock decomposition (glb/MP3D runs are host-bound;
            # these separate sim probes from goal-search+RRT planning)
            "plan_wall_s": round(self.stats.get("plan_wall_s", 0.0), 1),
            "probe_wall_s": round(self.stats.get("probe_wall_s", 0.0), 1),
            "n_probes": self.stats.get("n_probes", 0),
        }

    def _aggregate(self, uncert_vol, sdf_vol):
        self._agg_key, k = jax.random.split(self._agg_key)
        agg = self.aggregate(uncert_vol, sdf_vol, k)
        valid = bool(agg.any_valid) or self.pcfg.force_uncert_aggre
        if not valid:
            self.printer("Warning: no valid (goal, target) pairs",
                         self.step, "Planner")
        return valid, agg

    def goal_search(self, agg: AggregationOutputs):
        """Argmax goal + top-k uncertain visible targets from it
        (ref goal_search_v2, naruto_planner.py:462-510)."""
        gs_aggre = np.asarray(agg.gs_aggre)
        collections = np.asarray(agg.collections)
        topk_vxl = np.asarray(agg.topk_vxl)

        pen = self.pcfg.goal_repeat_penalty
        if pen > 0.0 and self._goal_visits:
            # mitigation (schema: PlannerConfig.goal_repeat_penalty):
            # discount goals already chosen so unresolvable uncertainty
            # can't monopolize the plan budget
            gs_aggre = gs_aggre.copy()
            for gi_v, n in self._goal_visits.items():
                gs_aggre[gi_v] /= 1.0 + pen * n

        flat_idx = int(gs_aggre.argmax())
        gi = np.unravel_index(flat_idx, gs_aggre.shape)
        self._last_goal_gi = gi
        if pen > 0.0:
            self._goal_visits[gi] = self._goal_visits.get(gi, 0) + 1
        goal_vxl = np.array([self.goal_space.x_range[gi[0]],
                             self.goal_space.y_range[gi[1]],
                             self.goal_space.z_range[gi[2]]], dtype=np.float64)

        per_goal = collections.reshape(*gs_aggre.shape, -1)[gi]
        k = min(self.pcfg.obs_per_goal, per_goal.shape[0])
        order = np.argsort(-per_goal)[:k]
        n_pos = max(int((per_goal[order] > 0).sum()), 1)
        order = order[:n_pos]
        lookat_tgts = [self.vox2loc(topk_vxl[j].astype(np.float64))
                       for j in order]
        return goal_vxl, lookat_tgts

    def path_planning(self, sdf_vol, cur_pose, goal_vxl):
        """RRT with one retry and reachability-mask fallback
        (ref path_planning_v2, naruto_planner.py:403-460)."""
        if self.step == 0:
            sdf_vol = np.full_like(sdf_vol, 100.0)  # initial map is unknown
        cur_vxl = self.loc2vox(cur_pose[:3, 3])
        self.local_planner.start_new_plan(cur_vxl, goal_vxl, sdf_vol)
        reachable = self.local_planner.run()
        trav_mask = None
        if not reachable:
            self.printer("RRT retry (densify)", self.step, "Planner")
            reachable = self.local_planner.run()
            if not reachable:
                self.printer("Updating traversability mask from RRT tree",
                             self.step, "Planner")
                trav_mask = self.local_planner.get_reachable_mask()
        path = self.local_planner.find_path()
        return path, reachable, trav_mask

    def compute_traversability_mask(self, sdf, pose) -> np.ndarray:
        cur_vxl = self.loc2vox(pose[:3, 3])
        self.local_planner.start_new_plan(cur_vxl, np.zeros(3), sdf)
        self.local_planner.run_full()
        return self.local_planner.get_reachable_mask()

    # ------------------------------------------------------------ collision
    def detect_collision(self, sdf_vol, cur_pose, next_pt_loc) -> bool:
        """SDF line check + simulated ERP probes (ref detect_collision_v2,
        naruto_planner.py:512-594; combination depends on dataset)."""
        dataset = self.cfg.general.dataset
        dist_closest, invalid_ratio = np.inf, 0.0
        if self.sim is not None and dataset in ("MP3D", "NARUTO"):
            next_pose = cur_pose.copy()
            next_pose[:3, 3] = next_pt_loc
            t0 = time.time()
            erp_dist = np.asarray(self.sim.probe_erp_dist(next_pose))
            self.stats["probe_wall_s"] = (
                self.stats.get("probe_wall_s", 0.0) + time.time() - t0)
            self.stats["n_probes"] = self.stats.get("n_probes", 0) + 1
            dist_closest = float(erp_dist.min())
            invalid_ratio = float((erp_dist > 1e6).mean())

        cur_vxl = self.loc2vox(cur_pose[:3, 3])
        next_vxl = self.loc2vox(next_pt_loc)
        _, sdf_free = is_collision_free(next_vxl, cur_vxl, sdf_vol,
                                        step_size=self.pcfg.rrt_step_size)

        thre = self.pcfg.invalid_region_ratio_thre
        if dataset == "Replica":
            detected = not sdf_free
        elif dataset == "MP3D":
            detected = invalid_ratio > thre or not sdf_free
        elif dataset == "NARUTO":
            detected = (dist_closest < self.pcfg.collision_dist_thre
                        or invalid_ratio > thre or not sdf_free)
        else:
            detected = not sdf_free

        override = self.pcfg.collision_sim_override
        if detected and override > 0.0 and self.sim is not None:
            # mitigation (schema: PlannerConfig.collision_sim_override):
            # the learned SDF cannot trap the agent in real free space —
            # probe the simulator at the next pose (lazily; parity
            # combos for MP3D/NARUTO probed above) and override the SDF
            # verdict when the world shows clearance.
            if np.isinf(dist_closest):
                next_pose = cur_pose.copy()
                next_pose[:3, 3] = next_pt_loc
                t0 = time.time()
                erp_dist = np.asarray(self.sim.probe_erp_dist(next_pose))
                self.stats["probe_wall_s"] = (
                    self.stats.get("probe_wall_s", 0.0) + time.time() - t0)
                self.stats["n_probes"] = self.stats.get("n_probes", 0) + 1
                dist_closest = float(erp_dist.min())
                invalid_ratio = float((erp_dist > 1e6).mean())
            if dist_closest >= override and invalid_ratio <= thre:
                self.stats["collision_overrides"] = \
                    self.stats.get("collision_overrides", 0) + 1
                self.printer(
                    f"Collision OVERRIDDEN by sim probe (clearance="
                    f"{dist_closest * 100:.1f}cm, invalid_ratio="
                    f"{invalid_ratio:.3f})", self.step, "Planner")
                return False
        if detected:
            # only report probe values that were actually measured —
            # Replica's parity combo never probes, and logging the 0.0
            # default as "invalid_ratio=0.000" misled the r4 seed_1999
            # diagnosis into reading it as a clear-space measurement
            probe = (f"dist_closest={dist_closest:.3f}, "
                     f"invalid_ratio={invalid_ratio:.3f}"
                     if np.isfinite(dist_closest) else "sim unprobed")
            self.printer(
                f"Collision detected (sdf_free={sdf_free}, {probe})",
                self.step, "Planner")
        return detected
