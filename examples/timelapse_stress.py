"""BASELINE config #5 stress run: tiles x views x timepoints.

Synthetic multi-tile timelapse driven through the full production path:

  define (TIFF stacks + master XML)
    -> per-timepoint CLUSTER JOBS (detect + per-tile registration,
       job XMLs; the reference's Toggle_Cluster_Options split)
    -> Merge_Cluster_Jobs
    -> timelapse STABILIZATION against a reference timepoint
    -> per-timepoint STREAMING fusion (disk -> disk, block-wise)

Peak RSS is logged per stage: only ONE timepoint's views are ever in
memory (the reference's per-timepoint streaming, SURVEY.md section 5),
and fusion streams blocks, so memory stays flat as T grows.

Scale knobs (env):
  SPIM_STRESS_TPS=20  SPIM_STRESS_TILES=2,2,2  SPIM_STRESS_VIEWS=6
  SPIM_STRESS_TILE_SIZE=96  SPIM_STRESS_LITE=1 (tiny smoke config)

Defaults = config #5 (8 tiles x 6 views x 20 timepoints).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

_root = Path(__file__).resolve().parent.parent
if str(_root) not in sys.path:
    sys.path.insert(0, str(_root))

from spim_registration_tpu.core.dataset import Dataset, ViewDescription
from spim_registration_tpu.core.dataset import ViewTransform
from spim_registration_tpu.core.imgloaders import (
    save_tiff_stack,
    tiff_stack_loader,
)
from spim_registration_tpu.core.xml_io import save_dataset
from spim_registration_tpu.detect.dog import DoGParameters, detect_beads
from spim_registration_tpu.fuse.bounding_box import BoundingBox
from spim_registration_tpu.fuse.weighted_avg import FusionParameters
from spim_registration_tpu.fuse.streaming import fuse_views_streaming
from spim_registration_tpu.match.pairwise import PairwiseParameters, match_pair
from spim_registration_tpu.native_blocks import RawVolumeStore
from spim_registration_tpu.pipeline.cluster import (
    find_job_xmls,
    merge_cluster_jobs,
    run_job,
)
from spim_registration_tpu.pipeline.run import (
    RegistrationConfig,
    register_views,
)
from spim_registration_tpu.utils.simulation import (
    render_beads,
    rotation_about_axis,
)


def rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def log(msg):
    print(f"[rss {rss_mb():7.0f} MB] {msg}", flush=True)


def build_config():
    lite = os.environ.get("SPIM_STRESS_LITE") == "1"
    if lite:
        return dict(tps=3, tiles=(1, 1, 2), views=2, tile_size=48,
                    beads_per_tile=40, overlap=0.25)
    return dict(
        tps=int(os.environ.get("SPIM_STRESS_TPS", "20")),
        tiles=tuple(int(x) for x in os.environ.get(
            "SPIM_STRESS_TILES", "2,2,2").split(",")),
        views=int(os.environ.get("SPIM_STRESS_VIEWS", "6")),
        tile_size=int(os.environ.get("SPIM_STRESS_TILE_SIZE", "96")),
        beads_per_tile=120, overlap=0.25)


def main(workdir: str | None = None, budget_mb: float = 8192.0):
    cfg = build_config()
    T, G, V, E = (cfg["tps"], cfg["tiles"], cfg["views"],
                  cfg["tile_size"])
    step = E * (1.0 - cfg["overlap"])
    n_tiles = int(np.prod(G))
    world_dims = tuple(int(step * (g - 1) + E) for g in G)
    log(f"config: {T} tps x {n_tiles} tiles x {V} views, tile {E}^3, "
        f"world {world_dims}")

    tmp = workdir or tempfile.mkdtemp(prefix="spim_stress_")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(42)

    # ---- world ground truth: bead cloud + per-tp drift (random walk)
    n_beads = cfg["beads_per_tile"] * n_tiles
    world0 = rng.uniform(8, np.asarray(world_dims, float) - 8,
                         (n_beads, 3))
    drifts = np.cumsum(
        np.vstack([np.zeros(3), rng.normal(0, 1.2, (T - 1, 3))]), axis=0)

    tile_ids = [(a, b, c) for a in range(G[0]) for b in range(G[1])
                for c in range(G[2])]
    tile_origin = {t: np.array(t) * step for t in tile_ids}

    def nominal_model(tile, v):
        """View v of a tile: rotation about the tile center (y axis),
        then translation to the tile's world position."""
        ang = 360.0 / V * v
        R = rotation_about_axis(1, ang)
        c = np.full(3, E / 2.0)
        A = np.concatenate([R, (c - R @ c)[:, None]], axis=1)
        A[:, 3] += tile_origin[tile]
        return A

    # true models = nominal + small pose perturbation (what registration
    # must recover); same perturbation for all tps (rigid acquisition)
    perturb = {}
    for ti, tile in enumerate(tile_ids):
        for v in range(V):
            if v == 0:
                perturb[(tile, v)] = np.zeros(3)
            else:
                perturb[(tile, v)] = rng.uniform(-1.5, 1.5, 3)

    def true_model(tile, v):
        A = nominal_model(tile, v).copy()
        A[:, 3] += perturb[(tile, v)]
        return A

    def render_view(tp, tile, v):
        A = true_model(tile, v)
        A4 = np.vstack([A, [0, 0, 0, 1]])
        inv = np.linalg.inv(A4)[:3]
        pts_w = world0 + drifts[tp]
        pts_v = pts_w @ inv[:, :3].T + inv[:, 3]
        vol = render_beads(pts_v, (E, E, E), 1.7)
        return (vol + rng.normal(0, 0.003, vol.shape)).astype(np.float32)

    # ---- stage A: define (TIFFs + master XML), one tp in RAM at a time
    t0 = time.time()
    ds = Dataset(base_path=tmp)
    for tp in range(T):
        for ti, tile in enumerate(tile_ids):
            for v in range(V):
                setup = ti * V + v
                vol = render_view(tp, tile, v)
                save_tiff_stack(os.path.join(
                    tmp, f"tp{tp}_setup{setup}.tif"), vol)
                vd = ViewDescription(view_id=(tp, setup), tile=ti,
                                     angle=int(360 / V * v),
                                     size=(E, E, E))
                vd.transforms = [ViewTransform(
                    "nominal", nominal_model(tile, v))]
                ds.add_view(vd)
    ds.loader = tiff_stack_loader(tmp)
    master = os.path.join(tmp, "dataset.xml")
    save_dataset(ds, master)
    log(f"defined {T * n_tiles * V} views in {time.time()-t0:.1f}s")

    # ---- stage B: per-timepoint cluster jobs (detect + per-tile register)
    dparams = DoGParameters(sigma=1.8, threshold=0.008)
    reg_cfg = RegistrationConfig(
        detection=dparams,
        pairwise=PairwiseParameters(model="affine", max_points=512))

    def process_tp(job_ds: Dataset, tp: int):
        job_ds.loader = tiff_stack_loader(tmp)
        for ti, tile in enumerate(tile_ids):
            setups = [ti * V + v for v in range(V)]
            vols = [job_ds.get_image((tp, s)) for s in setups]
            points = []
            for s, vol in zip(setups, vols):
                pts, resp = detect_beads(vol, dparams)
                job_ds.set_interest_points((tp, s), "beads", pts, resp)
                points.append(pts)
            nominals = [nominal_model(tile, v) for v in range(V)]
            res = register_views(None, reg_cfg, points=points,
                                 initial_models=nominals)
            for s, model in zip(setups, res.models):
                vd = job_ds.views[(tp, s)]
                vd.transforms = [ViewTransform("registered", model)]

    t0 = time.time()
    for tp in range(T):
        run_job(master, tp, process_tp)
    merged = merge_cluster_jobs(master, find_job_xmls(tmp))
    merged.loader = tiff_stack_loader(tmp)
    log(f"cluster jobs + merge: {time.time()-t0:.1f}s")

    # ---- stage C: stabilization against the reference timepoint
    t0 = time.time()
    ref_tp = T // 2
    pools = {}
    for tp in range(T):
        parts = []
        for (vtp, s), vd in merged.views.items():
            # one view per tile (s % V == 0): pooling all 48 views puts
            # ~48 near-duplicate copies of every bead in the pool, which
            # degenerates the kNN descriptor constellations
            if vtp != tp or s % V != 0 \
                    or "beads" not in vd.interest_points:
                continue
            A = vd.model()
            pts = vd.interest_points["beads"].points
            parts.append(pts @ A[:, :3].T + A[:, 3])
        pool = np.concatenate(parts) if parts else np.zeros((0, 3))
        # tile overlaps still duplicate beads across tiles: merge them
        from spim_registration_tpu.pipeline.timelapse import _dedupe

        pools[tp] = _dedupe(pool, min_distance=1.5)
    stab_params = PairwiseParameters(
        method="rgldm", ratio_of_distance=3.0, model="translation",
        max_points=min(1024, max(len(p) for p in pools.values())))
    residuals = {}
    for tp in range(T):
        if tp == ref_tp:
            residuals[tp] = 0.0
            continue
        res = match_pair(pools[tp], pools[ref_tp], stab_params,
                         seed=99 + tp)
        assert res.valid, f"stabilization failed at tp {tp}"
        residuals[tp] = res.mean_error
        S4 = np.vstack([res.model, [0, 0, 0, 1]])
        for (vtp, s), vd in merged.views.items():
            if vtp == tp:
                A4 = np.vstack([vd.model(), [0, 0, 0, 1]])
                vd.transforms = [ViewTransform("stabilized",
                                               (S4 @ A4)[:3])]
        # recovered drift ~ -(drift_tp - drift_ref)
        want = drifts[ref_tp] - drifts[tp]
        err = np.linalg.norm(res.model[:, 3] - want)
        log(f"tp {tp}: stabilization residual {res.mean_error:.3f} px, "
            f"drift error {err:.3f} px")
    save_dataset(merged, master)
    max_resid = max(residuals.values())
    log(f"stabilization: {time.time()-t0:.1f}s, max residual "
        f"{max_resid:.3f} px")

    # ---- stage D: per-timepoint streaming fusion (disk -> disk)
    t0 = time.time()
    bbox = BoundingBox("world", (0, 0, 0), world_dims)
    fparams = FusionParameters(z_chunk=32)
    fused_paths = []
    for tp in range(T):
        setups = sorted(s for (vtp, s) in merged.views if vtp == tp)
        stores = []
        models = []
        for s in setups:
            vol = merged.get_image((tp, s))
            st = RawVolumeStore(os.path.join(tmp, f"view_tp{tp}_{s}.raw"),
                                vol.shape, create=True)
            st.write_block((0, 0, 0), vol)
            stores.append(st)
            models.append(merged.views[(tp, s)].model())
        out = RawVolumeStore(os.path.join(tmp, f"fused_tp{tp}.raw"),
                             bbox.shape, create=True)
        fuse_views_streaming(stores, models, bbox, out, fparams,
                             block=(32, 128, 128))
        fused_paths.append(out.path)
        for s in setups:  # free the per-tp raw inputs
            os.unlink(os.path.join(tmp, f"view_tp{tp}_{s}.raw"))
    log(f"streaming fusion of {T} tps -> {world_dims} volumes in "
        f"{time.time()-t0:.1f}s")

    peak = rss_mb()
    summary = {
        "tps": T, "tiles": n_tiles, "views_per_tile": V,
        "world_dims": list(world_dims),
        "max_stabilization_residual_px": max_resid,
        "peak_rss_mb": peak, "budget_mb": budget_mb,
        "fused": fused_paths[:2] + ["..."] if len(fused_paths) > 2
        else fused_paths,
    }
    print(json.dumps(summary))
    assert max_resid < 0.5, max_resid
    assert peak < budget_mb, (peak, budget_mb)
    log("OK")
    return summary


if __name__ == "__main__":
    main()
