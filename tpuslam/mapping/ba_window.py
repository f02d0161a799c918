"""Sliding-window BA over the mapper's keyframes (north-star config 2).

The reference back-end is pose-graph-only (/root/reference/src/slam/src/
core/HyperGraph.cpp:57-208); BA is the blueprint's "new design territory"
(SURVEY.md §2.7 item 5).  This module connects the mapper's data to the
TPU BA solver (optim/ba.py):

  * landmark association comes from the bag-of-words dictionary the
    mapper already maintains: a visual word observed in >= 2 full nodes
    of the window IS a landmark track (word ids are NNDR-unique per
    node, Mapper.cpp:413-484 / VWDictionary.cpp:40-115);
  * observations are the keypoint pixels of those word hits; landmark
    positions initialize from the first observing node's
    stereo-triangulated 3D point (metric scale -> 1 gauge-fixed camera
    suffices);
  * windows slide over the full-node trajectory with overlap; each
    refined window chains through its fixed first camera, and
    intermediate (feature-less) nodes ride along on their relative
    transform to the preceding full node.

All arrays are fixed-capacity and masked, so one XLA program serves
every window.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..geometry import transform as T
from ..geometry.camera import StereoCameraModel


@dataclass
class BAWindow:
    node_ids: list[int]          # full-node ids, window order
    Tcw: np.ndarray              # (W,4,4) cam-from-world (optical)
    lms: np.ndarray              # (L,3) world landmarks (padded)
    obs_cam: np.ndarray          # (O,) int32
    obs_lm: np.ndarray           # (O,) int32
    obs_uv: np.ndarray           # (O,2) float32
    obs_valid: np.ndarray        # (O,) bool
    n_landmarks: int
    n_obs: int


def extract_window(mapper, node_ids: list[int],
                   camera: StereoCameraModel,
                   poses: dict[int, np.ndarray] | None = None,
                   max_landmarks: int = 1024,
                   max_obs: int = 4096,
                   reproj_gate_px: float = 10.0) -> BAWindow | None:
    """Build fixed-capacity BA arrays for the given full nodes.

    `poses` overrides node poses (e.g. pose-graph-optimized ones).
    Returns None if fewer than 2 tracks exist.
    """
    local_t = camera.local_transform
    nodes = [mapper.nodes[i] for i in node_ids]
    get_pose = (lambda n: poses[n.id]) if poses is not None \
        else (lambda n: n.pose)

    # per-node: word -> kpt index, keeping only words unique in the node
    word_maps = []
    for node in nodes:
        seen: dict[int, int] = {}
        dup: set[int] = set()
        for w, ki in node.words:
            if w <= 0:
                continue
            if w in seen:
                dup.add(w)
            else:
                seen[w] = ki
        word_maps.append({w: ki for w, ki in seen.items() if w not in dup})

    # tracks: word present in >= 2 nodes of the window
    counts: dict[int, int] = {}
    for wm in word_maps:
        for w in wm:
            counts[w] = counts.get(w, 0) + 1
    track_words = [w for w, c in sorted(counts.items()) if c >= 2]
    if len(track_words) < 2:
        return None
    track_words = track_words[:max_landmarks]
    lm_index = {w: i for i, w in enumerate(track_words)}

    W = len(nodes)
    Tcw = np.zeros((W, 4, 4), np.float32)
    world_from_robot = []
    for ci, node in enumerate(nodes):
        pose = get_pose(node)
        Tcw[ci] = T.inverse(T.compose(pose, local_t))
        world_from_robot.append(np.asarray(pose, np.float64))

    lms = np.zeros((max_landmarks, 3), np.float32)
    lm_init = np.zeros(len(track_words), bool)
    obs_cam = np.zeros((max_obs,), np.int32)
    obs_lm = np.zeros((max_obs,), np.int32)
    obs_uv = np.zeros((max_obs, 2), np.float32)
    obs_valid = np.zeros((max_obs,), bool)

    fx, fy = camera.fx_l, camera.fy_l
    cx, cy = camera.cx_l, camera.cy_l
    n_obs = 0
    for ci, (node, wm) in enumerate(zip(nodes, word_maps)):
        kpts = node.frame.kpts
        kpts3d = node.frame.kpts3d
        for w, ki in wm.items():
            li = lm_index.get(w)
            if li is None or n_obs >= max_obs or ki >= len(kpts):
                continue
            if not lm_init[li]:
                p = kpts3d[ki]
                if not np.all(np.isfinite(p)):
                    continue  # wait for an observing node with valid 3D
                pw = world_from_robot[ci] @ np.append(p, 1.0)
                lms[li] = pw[:3]
                lm_init[li] = True
            else:
                # association gate: a visual word is only NNDR-unique,
                # not geometrically verified — repeated texture aliases
                # words across physical points, and one aliased track
                # (hundreds of px of residual) is enough to throw the LM
                # far outside Huber's linear region.  The VO poses are
                # good to a few px here, so reproject the initialized
                # landmark and drop observations beyond the gate.
                pc = Tcw[ci].astype(np.float64) @ np.append(lms[li], 1.0)
                if pc[2] <= 0.1:
                    continue
                u = pc[0] / pc[2] * fx + cx
                v = pc[1] / pc[2] * fy + cy
                err = np.hypot(u - kpts[ki, 0], v - kpts[ki, 1])
                if err > reproj_gate_px:
                    continue
            obs_cam[n_obs] = ci
            obs_lm[n_obs] = li
            obs_uv[n_obs] = kpts[ki, :2]
            obs_valid[n_obs] = True
            n_obs += 1

    # drop observations of tracks that never got a finite 3D init
    obs_valid[:n_obs] &= lm_init[obs_lm[:n_obs]]
    # drop single-observation tracks (unconstrained free landmarks)
    cnt = np.bincount(obs_lm[:n_obs][obs_valid[:n_obs]],
                      minlength=max_landmarks)
    obs_valid[:n_obs] &= cnt[obs_lm[:n_obs]] >= 2

    if int(obs_valid.sum()) < 6:
        return None
    return BAWindow(node_ids=node_ids, Tcw=Tcw, lms=lms,
                    obs_cam=obs_cam, obs_lm=obs_lm, obs_uv=obs_uv,
                    obs_valid=obs_valid, n_landmarks=len(track_words),
                    n_obs=n_obs)


def _reproj_errs_np(Tcw: np.ndarray, lms: np.ndarray, intr,
                    obs_cam: np.ndarray, obs_lm: np.ndarray,
                    obs_uv: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Pixel reprojection errors of the observations `idx` (numpy)."""
    fx, fy, cx, cy = intr
    P = Tcw[obs_cam[idx]].astype(np.float64)
    X = lms[obs_lm[idx]].astype(np.float64)
    pc = np.einsum("kij,kj->ki", P[:, :3, :3], X) + P[:, :3, 3]
    z = pc[:, 2]
    bad = z <= 0.1
    z = np.where(bad, 1.0, z)
    u = pc[:, 0] / z * fx + cx
    v = pc[:, 1] / z * fy + cy
    err = np.hypot(u - obs_uv[idx, 0], v - obs_uv[idx, 1])
    return np.where(bad, np.inf, err)


def _holdout_accepts(win, camera, Tcw_new: np.ndarray,
                     lms_new: np.ndarray, hold_idx: np.ndarray) -> bool:
    """Held-out acceptance: both the median and the 90th percentile of
    held-out reprojection errors must not worsen.  The p90 guard catches
    solves that sharpen the bulk while yanking a minority of the
    geometry (round-4 finding: a median-only gate accepted a global
    solve that degraded trajectory ATE 0.64 -> 1.05 m)."""
    intr_np = (camera.fx_l, camera.fy_l, camera.cx_l, camera.cy_l)
    e0 = _reproj_errs_np(win.Tcw.astype(np.float64), win.lms, intr_np,
                         win.obs_cam, win.obs_lm, win.obs_uv, hold_idx)
    e1 = _reproj_errs_np(Tcw_new, lms_new, intr_np, win.obs_cam,
                         win.obs_lm, win.obs_uv, hold_idx)
    e0 = np.where(np.isfinite(e0), e0, 1e6)
    e1 = np.where(np.isfinite(e1), e1, 1e6)
    return (np.median(e1) <= np.median(e0) and
            np.percentile(e1, 90) <= np.percentile(e0, 90))


def _holdout_split(obs_valid: np.ndarray, obs_lm: np.ndarray,
                   every: int = 5):
    """Deterministic holdout: every `every`-th valid observation whose
    track keeps >= 2 solve-set observations.  Returns (solve_mask,
    holdout_idx)."""
    valid_idx = np.nonzero(obs_valid)[0]
    cnt = np.bincount(obs_lm[valid_idx],
                      minlength=int(obs_lm.max()) + 1 if len(obs_lm) else 1)
    eligible = valid_idx[cnt[obs_lm[valid_idx]] >= 3]
    # cap holds per track so every track keeps >= 2 solve observations
    # (a flat stride can strip a 3-observation track to 1)
    hold = []
    held: dict[int, int] = {}
    for i in eligible[::every]:
        lm = int(obs_lm[i])
        if held.get(lm, 0) < cnt[lm] - 2:
            held[lm] = held.get(lm, 0) + 1
            hold.append(i)
    hold = np.asarray(hold, dtype=valid_idx.dtype)
    solve = obs_valid.copy()
    solve[hold] = False
    return solve, hold


def refine_trajectory_ba(mapper, poses: dict[int, np.ndarray],
                         camera: StereoCameraModel,
                         window: int = 8, stride: int = 4,
                         iterations: int = 8,
                         huber_delta: float = 4.0,
                         max_landmarks: int = 1024,
                         max_obs: int = 4096,
                         max_correction_m: float = 0.5,
                         holdout_gate: bool = True,
                         solver=None) -> dict[int, np.ndarray]:
    """Sliding-window BA refinement of a trajectory.

    `poses` maps node id -> robot pose (typically the pose-graph
    optimizer's output).  Full nodes are refined window by window (the
    first camera of each window is gauge-fixed, so consecutive windows
    chain); intermediate nodes follow the preceding full node by their
    original relative transform.  Returns the refined pose dict.

    Acceptance gate (`holdout_gate`): BA can only *overfit* a trajectory
    that is already below the landmark noise floor — the solver is
    monotone on its own cost by construction, so the solve-set chi2
    cannot detect it.  Every 5th observation is held out of the solve;
    a window is applied only if the held-out median reprojection error
    does not worsen.  On drifted trajectories the geometry genuinely
    improves and held-out error drops with it; on already-good ones the
    no-evidence windows are rejected and BA is a no-op instead of a
    regression (round-3 bench: windowed BA worsened ATE 0.32 -> 0.46 m).

    `solver` defaults to optim.ba.ba_solve; dist.mesh.make_sharded_ba_step
    products are drop-in (same signature minus static args).
    """
    import jax.numpy as jnp
    from ..optim.ba import ba_solve

    full_ids = [nid for nid in sorted(poses)
                if nid in mapper.nodes and mapper.nodes[nid].weight >= 0
                and mapper.nodes[nid].words]
    if len(full_ids) < 3:
        return dict(poses)

    intr = jnp.asarray([camera.fx_l, camera.fy_l,
                        camera.cx_l, camera.cy_l], jnp.float32)
    local_t = camera.local_transform
    refined = {nid: np.asarray(p, np.float64).copy()
               for nid, p in poses.items()}

    starts = list(range(0, max(len(full_ids) - window, 0) + 1, stride))
    if not starts:
        starts = [0]
    for s in starts:
        ids = full_ids[s:s + window]
        if len(ids) < 3:
            continue
        win = extract_window(mapper, ids, camera, poses=refined,
                             max_landmarks=max_landmarks, max_obs=max_obs)
        if win is None:
            continue
        def solve(mask):
            if solver is None:
                T_, l_, _ = ba_solve(
                    jnp.asarray(win.Tcw), jnp.asarray(win.lms), intr,
                    jnp.asarray(win.obs_cam), jnp.asarray(win.obs_lm),
                    jnp.asarray(win.obs_uv), jnp.asarray(mask),
                    n_cams=win.Tcw.shape[0], n_lms=win.lms.shape[0],
                    iterations=iterations, huber_delta=huber_delta)
            else:
                T_, l_, _ = solver(
                    jnp.asarray(win.Tcw), jnp.asarray(win.lms), intr,
                    jnp.asarray(win.obs_cam), jnp.asarray(win.obs_lm),
                    jnp.asarray(win.obs_uv), jnp.asarray(mask))
            return np.asarray(T_, np.float64), np.asarray(l_)

        if holdout_gate:
            solve_valid, hold_idx = _holdout_split(win.obs_valid,
                                                   win.obs_lm)
            if len(hold_idx):
                Tcw_g, lms_g = solve(solve_valid)
                if not _holdout_accepts(win, camera, Tcw_g, lms_g,
                                        hold_idx):
                    continue  # no held-out evidence of improvement
            # accepted: refit on ALL observations (validate on holdout,
            # solve on everything — the gated solve is weaker by 20%)
        Tcw_new, lms_new = solve(win.obs_valid)
        # trust region: BA refines poses the graph already placed well;
        # a window whose solution moves a camera further than
        # max_correction_m is mis-associated (word aliasing) or
        # degenerate (far-landmark-only) and must not be applied — one
        # such window otherwise poisons every later window through the
        # gauge chaining (observed: 741 m ATE from a single blow-up)
        deltas = [np.linalg.norm(
            np.linalg.inv(Tcw_new[ci])[:3, 3] -
            np.linalg.inv(win.Tcw[ci].astype(np.float64))[:3, 3])
            for ci in range(len(ids))]
        if max(deltas) > max_correction_m:
            continue
        for ci, nid in enumerate(ids):
            if ci == 0:
                continue  # gauge-fixed
            # cam-from-world -> robot pose
            refined[nid] = np.linalg.inv(Tcw_new[ci]) @ \
                np.linalg.inv(local_t)

    # carry intermediate nodes along with their preceding full node
    all_ids = sorted(poses)
    last_full = None
    for nid in all_ids:
        node = mapper.nodes.get(nid)
        is_full = (node is not None and node.weight >= 0 and node.words)
        if is_full:
            last_full = nid
        elif last_full is not None:
            rel = np.linalg.inv(np.asarray(poses[last_full], np.float64)) \
                @ np.asarray(poses[nid], np.float64)
            refined[nid] = refined[last_full] @ rel
    return {nid: p.astype(np.float32) for nid, p in refined.items()}


def refine_trajectory_global_ba(mapper, poses: dict[int, np.ndarray],
                                camera: StereoCameraModel,
                                max_landmarks: int = 4096,
                                max_obs: int = 16384,
                                iterations: int = 15,
                                huber_delta: float = 8.0,
                                reproj_gate_px: float = 10.0
                                ) -> dict[int, np.ndarray]:
    """One global bundle adjustment over ALL full nodes.

    Where the sliding window (refine_trajectory_ba) can only polish local
    geometry — its gauge chaining preserves accumulated drift by
    construction — the global solve ties every pair of keyframes that
    share visual-word landmark tracks.  On a revisiting trajectory those
    tracks span the loop, so global BA closes loops from raw reprojection
    constraints alone — measured on the pre-precision-fix build: the
    209-frame out-and-back improved from ATE 1.18 m / t_err 1.03 % (VO
    only) to 0.92 m / 0.78 %.  When odometry is already below the
    landmark noise floor (word tracks initialize from single-view stereo
    depth), the solve is near-neutral instead — tools/demo_ba_loop.py
    measured (round 5): on 0.05 m/step random-walk drift the solve with
    huber_delta 8 recovers ATE 0.2-0.4 m -> ~0.00 on every seed, while
    the round-4 default of 2 px down-weighted exactly the residuals that
    carry the drift signal and made the solve erratic (ratios 0.7-2.2
    across seeds; tests/test_ba.py test_global_ba_strictly_improves_
    drifted pins the recovery).  Gauge: the first full
    node is fixed; intermediate nodes ride along on their relative
    transform (as in the windowed variant).
    """
    import jax.numpy as jnp
    from ..optim.ba import ba_solve

    full_ids = [nid for nid in sorted(poses)
                if nid in mapper.nodes and mapper.nodes[nid].weight >= 0
                and mapper.nodes[nid].words]
    if len(full_ids) < 3:
        return dict(poses)
    # scale the observation budget with the trajectory: ~96 word hits per
    # full node is the measured ceiling, and extract_window fills obs in
    # node order — a fixed cap on a long trajectory would silently leave
    # the LAST keyframes without any reprojection constraint
    max_obs = max(max_obs, 512 * len(full_ids))
    max_landmarks = max(max_landmarks, 256 * len(full_ids))
    # the tight association gate is load-bearing: widening it to admit
    # the observations of a heavily-drifted initialization also admits
    # word aliases, and the solve then diverges (measured: gate 60-100
    # turns a 1.1 m-ATE initialization into 1.5-8 m).  Global BA is a
    # REFINER of already-reasonable trajectories, not a re-localizer.
    win = extract_window(mapper, full_ids, camera, poses=poses,
                         max_landmarks=max_landmarks, max_obs=max_obs,
                         reproj_gate_px=reproj_gate_px)
    if win is None:
        return dict(poses)
    if win.n_obs >= max_obs or win.n_landmarks >= max_landmarks:
        import warnings
        warnings.warn(
            f"global BA capacity saturated (obs {win.n_obs}/{max_obs}, "
            f"landmarks {win.n_landmarks}/{max_landmarks}): trailing "
            "keyframes may be under-constrained", stacklevel=2)

    intr = jnp.asarray([camera.fx_l, camera.fy_l,
                        camera.cx_l, camera.cy_l], jnp.float32)

    def solve(mask):
        T_, l_, _ = ba_solve(
            jnp.asarray(win.Tcw), jnp.asarray(win.lms), intr,
            jnp.asarray(win.obs_cam), jnp.asarray(win.obs_lm),
            jnp.asarray(win.obs_uv), jnp.asarray(mask),
            n_cams=win.Tcw.shape[0], n_lms=win.lms.shape[0],
            iterations=iterations, huber_delta=huber_delta)
        return np.asarray(T_, np.float64), np.asarray(l_)

    solve_valid, hold_idx = _holdout_split(win.obs_valid, win.obs_lm)
    if len(hold_idx):
        Tcw_g, lms_g = solve(solve_valid)
        if not _holdout_accepts(win, camera, Tcw_g, lms_g, hold_idx):
            return dict(poses)  # no held-out evidence of improvement
    # accepted: refit on ALL observations (validate on holdout, solve on
    # everything — the gated solve is weaker by the held-out 20%)
    Tcw_new, _ = solve(win.obs_valid)
    local_t = camera.local_transform
    refined = {nid: np.asarray(p, np.float64).copy()
               for nid, p in poses.items()}
    for ci, nid in enumerate(full_ids):
        if ci == 0:
            continue  # gauge-fixed
        refined[nid] = np.linalg.inv(Tcw_new[ci]) @ np.linalg.inv(local_t)

    # carry intermediate nodes along with their preceding full node
    all_ids = sorted(poses)
    last_full = None
    for nid in all_ids:
        node = mapper.nodes.get(nid)
        is_full = (node is not None and node.weight >= 0 and node.words)
        if is_full:
            last_full = nid
        elif last_full is not None:
            rel = np.linalg.inv(np.asarray(poses[last_full], np.float64)) \
                @ np.asarray(poses[nid], np.float64)
            refined[nid] = refined[last_full] @ rel
    return {nid: p.astype(np.float32) for nid, p in refined.items()}
