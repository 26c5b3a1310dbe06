"""Command-line interface — the headless execution surface.

Reference parity: the macro-recordable plugin surface + `spim.headless.*`
(SURVEY.md sections 2.2, 2.10, L5): every pipeline stage as a subcommand
operating on a dataset XML, re-loading and re-saving it around each stage
(the checkpoint philosophy).

    python -m spim_registration_tpu.cli simulate --out ds/ --views 4
    python -m spim_registration_tpu.cli detect   ds/dataset.xml
    python -m spim_registration_tpu.cli register ds/dataset.xml
    python -m spim_registration_tpu.cli fuse     ds/dataset.xml --out fused.tif
    python -m spim_registration_tpu.cli deconvolve ds/dataset.xml --out psi.tif
    python -m spim_registration_tpu.cli resave   ds/dataset.xml --h5 data.h5
    python -m spim_registration_tpu.cli info     ds/dataset.xml
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List

import numpy as np


def _dataset_with_loader(xml_path: str):
    from spim_registration_tpu.core.imgloaders import (
        hdf5_loader,
        npy_loader,
        tiff_stack_loader,
    )
    from spim_registration_tpu.core.xml_io import load_dataset

    ds = load_dataset(xml_path)
    base = ds.base_path
    h5 = os.path.join(base, "data.h5")
    czis = [f for f in os.listdir(base) if f.endswith(".czi")]
    zarrs = [f for f in sorted(os.listdir(base))
             if os.path.exists(os.path.join(base, f, "meta.json"))]
    n5s = [f for f in sorted(os.listdir(base)) if f.endswith(".n5")
           and os.path.isdir(os.path.join(base, f))]
    if os.path.exists(h5):
        ds.loader = hdf5_loader(h5)
    elif zarrs:
        from spim_registration_tpu.core.zarr_store import zarr_loader

        ds.loader = zarr_loader(os.path.join(base, zarrs[0]))
    elif n5s:
        from spim_registration_tpu.core.zarr_store import n5_bdv_loader

        ds.loader = n5_bdv_loader(os.path.join(base, n5s[0]))
    elif czis:
        from spim_registration_tpu.core.czi import czi_loader

        ds.loader = czi_loader(os.path.join(base, sorted(czis)[0]))
    elif any("_MMStack_Pos" in f for f in os.listdir(base)):
        from spim_registration_tpu.core.micromanager import (
            micromanager_loader,
        )

        ds.loader = micromanager_loader(base)
    elif any(f.endswith(".npy") for f in os.listdir(base)):
        ds.loader = npy_loader(base)
    else:
        ds.loader = tiff_stack_loader(base)
    return ds


def _mesh_from_args(args):
    """Resolve the production execution mesh: `--mesh z=8`/`auto`, or
    (under `--multihost`) all global devices on a z axis by default.
    Returns None for the single-device engines — the mesh-aware dispatch
    point of every compute stage (VERDICT r3 next #1)."""
    from spim_registration_tpu.parallel.mesh import mesh_from_spec

    spec = getattr(args, "mesh", None)
    if spec is None and getattr(args, "multihost", False):
        spec = "auto"
    return mesh_from_spec(spec)


def _is_primary() -> bool:
    """Only process 0 writes XML/TIFF/manifests on a multi-host run
    (every process computes; outputs are allgathered to all)."""
    import jax

    return jax.process_index() == 0


def _load_config(args):
    from spim_registration_tpu.pipeline.config import (
        RunConfig,
        apply_overrides,
        from_json,
    )

    cfg = from_json(args.config) if getattr(args, "config", None) \
        else RunConfig()
    overrides: Dict[str, object] = {}
    for ov in getattr(args, "set", []) or []:
        key, _, val = ov.partition("=")
        try:
            overrides[key] = json.loads(val)
        except json.JSONDecodeError:
            overrides[key] = val
    return apply_overrides(cfg, overrides) if overrides else cfg


def _detect_format(base_path: str, fmt: str) -> str:
    if fmt != "auto":
        return fmt
    import glob

    if base_path.endswith(".czi") or glob.glob(
            os.path.join(base_path, "*.czi")):
        return "czi"
    if glob.glob(os.path.join(base_path, "*_MMStack_Pos*.tif*")):
        return "micromanager"
    return "pattern"


def cmd_define(args):
    from spim_registration_tpu.core.xml_io import save_dataset

    fmt = _detect_format(args.base_path, args.format)
    if fmt == "czi":
        import glob

        from spim_registration_tpu.core.czi import define_dataset_czi

        path = args.base_path if args.base_path.endswith(".czi") \
            else sorted(glob.glob(os.path.join(args.base_path, "*.czi")))[0]
        ds = define_dataset_czi(path)
        base = os.path.dirname(os.path.abspath(path))
    elif fmt == "micromanager":
        from spim_registration_tpu.core.micromanager import (
            define_dataset_micromanager,
        )

        ds = define_dataset_micromanager(args.base_path)
        base = args.base_path
    elif fmt == "dhm":
        from spim_registration_tpu.core.dhm import define_dataset_dhm

        ds = define_dataset_dhm(args.base_path)
        base = args.base_path
    else:
        from spim_registration_tpu.core.define import define_dataset

        ds = define_dataset(args.base_path, args.pattern,
                            voxel_size=tuple(args.voxel_size))
        base = args.base_path
    xml = os.path.join(base, "dataset.xml")
    save_dataset(ds, xml)
    print(f"defined {len(ds.views)} views "
          f"({len(ds.timepoints())} tp x {len(ds.setups())} setups) "
          f"-> {xml}")


def cmd_simulate(args):
    from spim_registration_tpu.core.dataset import Dataset, ViewDescription
    from spim_registration_tpu.core.xml_io import save_dataset
    from spim_registration_tpu.utils.simulation import make_multiview_scene

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    shape = tuple(args.shape)
    psf_sigmas = None
    if args.blur:
        psf_sigmas = [(2.5, 1.0, 1.0), (1.0, 1.0, 2.5), (2.0, 1.2, 1.2),
                      (1.2, 1.2, 2.0), (1.8, 1.0, 1.4), (1.4, 1.0, 1.8)]
    ds = Dataset(base_path=args.out)
    for tp in range(args.timepoints):
        scene = make_multiview_scene(
            rng, n_views=args.views, shape=shape, n_beads=args.beads,
            bead_sigma=args.bead_sigma, psf_sigmas=psf_sigmas)
        for s, vol in enumerate(scene.volumes):
            np.save(os.path.join(args.out, f"tp{tp}_setup{s}.npy"),
                    vol.astype(np.float32))
            vd = ViewDescription(view_id=(tp, s), angle=s, size=shape)
            ds.add_view(vd)
            np.save(os.path.join(args.out, f"truth_tp{tp}_setup{s}.npy"),
                    scene.models[s])
    xml = os.path.join(args.out, "dataset.xml")
    save_dataset(ds, xml)
    print(f"wrote {xml} ({args.timepoints} tp x {args.views} views)")


def cmd_detect(args):
    from spim_registration_tpu.core.xml_io import save_dataset
    from spim_registration_tpu.detect.dog import detect_beads_dataset

    ds = _dataset_with_loader(args.xml)
    cfg = _load_config(args)
    if getattr(args, "method", "dog") == "dom":
        # integral-image Difference-of-Mean (ProcessDOM): faster,
        # coarser; config under `dom.*` (radius1/radius2/threshold)
        from spim_registration_tpu.detect.dom import detect_beads_dom

        mesh = _mesh_from_args(args)
        pstr = (f"DoM r1={cfg.dom.radius1} r2={cfg.dom.radius2} "
                f"t={cfg.dom.threshold}")
        for vid in sorted(ds.views):
            if mesh is not None:  # z-sharded DoM (no silent single-dev)
                from spim_registration_tpu.parallel.sharded_detect import (
                    sharded_detect_beads_dom,
                )

                pts, resp = sharded_detect_beads_dom(
                    np.asarray(ds.get_image(vid)), cfg.dom, mesh,
                    axis_name=mesh.axis_names[-1])
            else:
                pts, resp = detect_beads_dom(
                    np.asarray(ds.get_image(vid)), cfg.dom)
            ds.set_interest_points(vid, cfg.label, pts, resp,
                                   parameters=pstr)
    else:
        detect_beads_dataset(ds, label=cfg.label, params=cfg.detection,
                             mesh=_mesh_from_args(args))
    if not _is_primary():
        return
    save_dataset(ds, args.xml)
    counts = {}
    for vid in sorted(ds.views):
        ips = ds.views[vid].interest_points.get(cfg.label)
        counts[str(vid)] = 0 if ips is None else len(ips.points)
        print(f"view {vid}: {counts[str(vid)]} points")
    from spim_registration_tpu.utils.manifest import write_manifest

    write_manifest(ds.base_path, "detect", cfg.detection,
                   {"points_per_view": counts})


def cmd_register(args):
    from spim_registration_tpu.core.xml_io import save_dataset
    from spim_registration_tpu.pipeline.run import (
        RegistrationConfig,
        register_views,
    )

    ds = _dataset_with_loader(args.xml)
    cfg = _load_config(args)
    rc = RegistrationConfig(detection=cfg.detection, pairwise=cfg.pairwise,
                            global_opt=cfg.global_opt)
    for tp in ds.timepoints():
        views = ds.views_of_timepoint(tp)
        if getattr(args, "channel", None) is not None:
            # per-channel registration (the reference GUI's "process
            # channels separately" mode)
            views = [v for v in views if v.channel == args.channel]
            if not views:
                print(f"tp {tp}: no views with channel {args.channel}",
                      file=sys.stderr)
                continue
        pts = []
        have_pts = all(cfg.label in v.interest_points for v in views)
        vols = None
        mesh = _mesh_from_args(args)
        if have_pts:
            pts = [np.asarray(v.interest_points[cfg.label].points)
                   for v in views]
            res = register_views(None, rc, points=pts, mesh=mesh)
        else:
            vols = [ds.get_image(v.view_id) for v in views]
            res = register_views(vols, rc, mesh=mesh)
        for v, vd in enumerate(views):
            vd.set_transform("registration", res.models[v])
        if not _is_primary():
            continue
        print(f"tp {tp}: residual mean={res.mean_error:.4f} "
              f"max={res.max_error:.4f} px")
        from spim_registration_tpu.utils.manifest import write_manifest

        write_manifest(ds.base_path, "register", rc, {
            "timepoint": tp,
            "mean_error_px": res.mean_error,
            "max_error_px": res.max_error,
            "pairs": {f"{i}-{j}": {
                "candidates": r.num_candidates,
                "inliers": r.num_inliers,
                "valid": r.valid,
                "mean_error_px": r.mean_error,
            } for (i, j), r in res.pair_results.items()},
            "timings_s": res.timings,
        })
    if _is_primary():
        save_dataset(ds, args.xml)


def _resolve_bbox(ds, args, vols, models):
    """Fusion ROI: a NAMED bounding box persisted in the XML
    (PreDefinedBoundingBox; `--bbox NAME`) or the maximal box of the
    transformed view corners (AutomaticBoundingBox; default)."""
    from spim_registration_tpu.fuse.bounding_box import maximal_bounding_box

    name = getattr(args, "bbox", None)
    if name:
        if name not in ds.bounding_boxes:
            raise KeyError(
                f"bounding box {name!r} not in dataset (have: "
                f"{sorted(ds.bounding_boxes)})")
        return ds.bounding_boxes[name]
    return maximal_bounding_box([v.shape for v in vols], models)


def cmd_fuse(args):
    from spim_registration_tpu.fuse.weighted_avg import fuse_views

    ds = _dataset_with_loader(args.xml)
    cfg = _load_config(args)
    mesh = _mesh_from_args(args)
    for tp in ds.timepoints():
        views = ds.views_of_timepoint(tp)
        vols = [ds.get_image(v.view_id) for v in views]
        models = [v.model() for v in views]
        bbox = _resolve_bbox(ds, args, vols, models)
        if getattr(args, "out_of_core", False):
            if mesh is not None:
                print("note: streaming fusion is disk-IO-bound and runs "
                      "single-device by design (fuse/streaming.py); "
                      "--mesh applies to the in-memory path only",
                      file=sys.stderr)
            out = _fuse_out_of_core(args, cfg, tp, vols, models, bbox)
            if _is_primary() and out is not None:
                _export_volume(args, ds, out, tp, bbox, "fused")
            continue
        if mesh is not None:
            from spim_registration_tpu.parallel import sharded_fuse_views

            out = sharded_fuse_views(vols, models, bbox, cfg.fusion,
                                     mesh=mesh,
                                     axis_name=mesh.axis_names[-1])
        else:
            out = fuse_views(vols, models, bbox, cfg.fusion)
        if _is_primary():
            _export_volume(args, ds, out, tp, bbox, "fused")


def _fuse_out_of_core(args, cfg, tp, vols, models, bbox):
    """CLI streaming fusion: views staged into disk stores, fused
    block-wise into a disk-resident output (`fuse/streaming.py`).
    Returns the fused array for export, or None when `--out` ends in
    .raw (the store IS the output)."""
    from spim_registration_tpu.fuse.streaming import fuse_views_streaming
    from spim_registration_tpu.native_blocks import RawVolumeStore

    workdir = args.ooc_workdir or (str(args.out) + f".ooc_tp{tp}")
    os.makedirs(workdir, exist_ok=True)
    stores = []
    for i, v in enumerate(vols):
        arr = np.asarray(v, np.float32)
        st = RawVolumeStore(os.path.join(workdir, f"view{i}.raw"),
                            tuple(arr.shape), create=True)
        st.write_block((0, 0, 0), arr)
        stores.append(st)
        del arr
    out_path = (str(args.out) if str(args.out).endswith(".raw")
                else os.path.join(workdir, "fused.raw"))
    out_store = RawVolumeStore(out_path, bbox.shape, create=True)
    fuse_views_streaming(stores, models, bbox, out_store, cfg.fusion)
    print(f"tp {tp}: streaming fusion done (output at {out_path})",
          file=sys.stderr)
    if str(args.out).endswith(".raw"):
        return None
    return out_store.read_block((0, 0, 0), bbox.shape)


def _export_volume(args, ds, out, tp, bbox, what):
    """Shared fuse/deconvolve export: TIFF / npy, or APPEND as a new
    view setup into an existing BDV-HDF5 (+XML update) — the reference's
    AppendSpimData2HDF5 export target (--append-hdf5)."""
    from spim_registration_tpu.core.imgloaders import save_tiff_stack

    if getattr(args, "append_hdf5", None):
        from spim_registration_tpu.core.resave import append_fused_hdf5

        vid = append_fused_hdf5(ds, args.append_hdf5, out, timepoint=tp,
                                bbox=bbox, xml_path=args.xml)
        print(f"tp {tp}: {what} {out.shape} appended as setup "
              f"{vid[1]} -> {args.append_hdf5} (+{args.xml})")
        return
    n_tp = len(ds.timepoints())
    path = args.out.replace("{tp}", str(tp)) if "{tp}" in args.out \
        else (args.out if n_tp == 1 else f"tp{tp}_{args.out}")
    if path.endswith(".npy"):
        np.save(path, out)
    elif path.endswith(".zarr") or path.endswith(".n5"):
        from spim_registration_tpu.core.zarr_store import create_volume

        driver = "zarr" if path.endswith(".zarr") else "n5"
        vol = create_volume(path, out.shape, dtype="float32",
                            driver=driver)
        vol.write(np.asarray(out, np.float32))
    else:
        save_tiff_stack(path, out)
    print(f"tp {tp}: {what} {out.shape} -> {path}")


def cmd_deconvolve(args):
    from spim_registration_tpu.core.imgloaders import save_tiff_stack
    from spim_registration_tpu.deconv import (
        deconvolve,
        extract_psf,
        prepare_views_for_deconvolution,
    )

    ds = _dataset_with_loader(args.xml)
    cfg = _load_config(args)
    mesh = _mesh_from_args(args)
    for tp in ds.timepoints():
        views = ds.views_of_timepoint(tp)
        vols = [ds.get_image(v.view_id) for v in views]
        models = [v.model() for v in views]
        psfs = []
        for v, vol in zip(views, vols):
            ips = v.interest_points.get(cfg.label)
            if ips is None or len(ips.points) < 5:
                print(f"view {v.view_id}: no interest points; run detect "
                      "first", file=sys.stderr)
                return 1
            psf, _n = extract_psf(vol, v.model(), np.asarray(ips.points))
            psfs.append(psf)
        bbox = _resolve_bbox(ds, args, vols, models)
        if getattr(args, "out_of_core", False):
            out = _deconvolve_out_of_core(args, cfg, ds, tp, views, vols,
                                          models, psfs, bbox, mesh)
            if _is_primary() and out is not None:
                _export_volume(args, ds, out, tp, bbox, "deconvolved")
            continue
        prep = prepare_views_for_deconvolution(vols, models, psfs, bbox)
        if mesh is not None:
            from spim_registration_tpu.parallel import sharded_deconvolve

            # a "view" mesh axis runs views data-parallel (requires the
            # parallel update scheme); the last axis z-shards psi
            view_axis = ("view" if "view" in mesh.axis_names[:-1]
                         else None)
            out = sharded_deconvolve(prep, cfg.deconvolution, mesh,
                                     axis_name=mesh.axis_names[-1],
                                     view_axis=view_axis)
        else:
            out = deconvolve(prep, cfg.deconvolution)
        if _is_primary():
            _export_volume(args, ds, out, tp, bbox, "deconvolved")


def _deconvolve_out_of_core(args, cfg, ds, tp, views, vols, models,
                            psfs, bbox, mesh):
    """CLI out-of-core deconvolution: streamed prep (one source view
    resident at a time) -> disk-resident BlockedDeconvolutionRunner
    (mesh-composable). Returns the psi array for export, or None when
    `--out` ends in .raw (the psi store IS the output — volumes beyond
    RAM are never materialized)."""
    from spim_registration_tpu.deconv.blocked import (
        BlockedDeconvolutionRunner,
    )
    from spim_registration_tpu.deconv.prep_streamed import (
        prepare_views_streamed,
    )
    from spim_registration_tpu.native_blocks import RawVolumeStore

    workdir = args.ooc_workdir or (str(args.out) + f".ooc_tp{tp}")
    inputs = prepare_views_streamed(
        lambda v: np.asarray(vols[v]), models, psfs, bbox, workdir)
    Z, Y, X = bbox.shape
    psi_path = (str(args.out) if str(args.out).endswith(".raw")
                else os.path.join(workdir, "psi.raw"))
    psi = RawVolumeStore(psi_path, (Z, Y, X), create=True)
    runner = BlockedDeconvolutionRunner(
        inputs, psi, cfg.deconvolution, block_z=args.block_z,
        mesh=mesh, axis_name=(mesh.axis_names[-1] if mesh is not None
                              else "z"))
    runner.run()
    print(f"tp {tp}: out-of-core deconvolution done (psi at {psi_path})",
          file=sys.stderr)
    if str(args.out).endswith(".raw"):
        return None
    return psi.read_block((0, 0, 0), (Z, Y, X))


def cmd_define_bbox(args):
    """Persist a named bounding box in the XML (the reference's
    PreDefinedBoundingBox / AutomaticBoundingBox-from-detections): give
    explicit --min/--max, or --from-points LABEL to box the transformed
    interest points plus --margin."""
    from spim_registration_tpu.core.dataset import BoundingBox
    from spim_registration_tpu.core.xml_io import save_dataset

    ds = _dataset_with_loader(args.xml)
    if args.from_points:
        from spim_registration_tpu.fuse.bounding_box import (
            bounding_box_from_points,
        )

        pts = []
        for v in ds.views.values():
            ips = v.interest_points.get(args.from_points)
            if ips is None or not len(ips.points):
                continue
            A = v.model()
            pts.append(np.asarray(ips.points) @ A[:, :3].T + A[:, 3])
        if not pts:
            print(f"no interest points labeled {args.from_points!r}; "
                  "run detect first", file=sys.stderr)
            return 1
        bb = bounding_box_from_points(np.concatenate(pts),
                                      margin=args.margin, name=args.name)
    elif args.min is not None and args.max is not None:
        bb = BoundingBox(args.name, tuple(args.min), tuple(args.max))
    else:
        print("give --min Z Y X and --max Z Y X, or --from-points LABEL",
              file=sys.stderr)
        return 1
    ds.bounding_boxes[args.name] = bb
    save_dataset(ds, args.xml)
    print(f"bounding box {args.name!r}: min={bb.min} max={bb.max} "
          f"shape={bb.shape} -> {args.xml}")


def cmd_tune(args):
    """Headless InteractiveDoG analog: sweep sigma x threshold on one
    view, print the peak-count table and a suggested threshold."""
    from spim_registration_tpu.detect.tune import (
        suggest_threshold,
        sweep_detection,
    )

    ds = _dataset_with_loader(args.xml)
    vid = tuple(args.view) if args.view else sorted(ds.views)[0]
    vol = ds.get_image(tuple(vid))
    table = sweep_detection(vol)
    sigmas = sorted({s for s, _ in table})
    thresholds = sorted({t for _, t in table})
    print("peaks per (sigma x threshold):")
    print("sigma\\thr " + " ".join(f"{t:>8g}" for t in thresholds))
    for s in sigmas:
        print(f"{s:>8g} " + " ".join(f"{table[(s, t)]:>8d}"
                                     for t in thresholds))
    sug = suggest_threshold(vol, sigma=args.sigma,
                            expected_points=args.expected_points)
    print(f"suggested threshold (sigma={args.sigma}"
          + (f", ~{args.expected_points} points" if args.expected_points
             else "") + f"): {sug:.5f}")
    return 0


def cmd_icp_refine(args):
    """ICP refinement of already-registered views (the reference's
    IterativeClosestPointPairwise run after a descriptor registration)."""
    from spim_registration_tpu.core.xml_io import save_dataset
    from spim_registration_tpu.match.icp import ICPParameters, icp_refine

    ds = _dataset_with_loader(args.xml)
    cfg = _load_config(args)
    params = ICPParameters(max_distance=args.max_distance)
    for tp in ds.timepoints():
        views = ds.views_of_timepoint(tp)
        pts_world = []
        for v in views:
            ips = v.interest_points.get(cfg.label)
            if ips is None:
                print(f"view {v.view_id}: no interest points; run detect "
                      "first", file=sys.stderr)
                return 1
            A = v.model()
            pts_world.append(np.asarray(ips.points) @ A[:, :3].T + A[:, 3])
        ref = 0
        for i, v in enumerate(views):
            if i == ref:
                continue
            M, matches, err, iters = icp_refine(
                pts_world[i], pts_world[ref], params=params)
            M4 = np.vstack([M, [0, 0, 0, 1]])
            A4 = np.vstack([v.model(), [0, 0, 0, 1]])
            v.set_transform("icp", (M4 @ A4)[:3])
            print(f"tp {tp} view {v.view_id}: icp {len(matches)} matches, "
                  f"residual {err:.4f} px in {iters} iters")
    save_dataset(ds, args.xml)
    return 0


def cmd_cluster_job(args):
    """One per-timepoint cluster job: detect + register that timepoint,
    write job_tp<N>.xml (Toggle_Cluster_Options / per-job XML analog)."""
    from spim_registration_tpu.detect.dog import detect_beads_dataset
    from spim_registration_tpu.pipeline.cluster import run_job
    from spim_registration_tpu.pipeline.run import (
        RegistrationConfig,
        register_views,
    )

    cfg = _load_config(args)
    stages = args.stages.split(",")

    mesh = _mesh_from_args(args)

    def process(ds, tp):
        ds.loader = _dataset_with_loader(args.xml).loader
        vids = [v.view_id for v in ds.views_of_timepoint(tp)]
        if "detect" in stages:
            detect_beads_dataset(ds, view_ids=vids, label=cfg.label,
                                 params=cfg.detection, mesh=mesh)
        if "register" in stages:
            views = ds.views_of_timepoint(tp)
            pts = [np.asarray(v.interest_points[cfg.label].points)
                   for v in views]
            rc = RegistrationConfig(detection=cfg.detection,
                                    pairwise=cfg.pairwise,
                                    global_opt=cfg.global_opt)
            res = register_views(None, rc, points=pts, mesh=mesh)
            for v, vd in enumerate(views):
                vd.set_transform("registration", res.models[v])
            print(f"tp {tp}: residual mean={res.mean_error:.4f} px")

    out = run_job(args.xml, args.tp, process, out_xml=args.out)
    print(f"job tp={args.tp} -> {out}")


def cmd_cluster_merge(args):
    from spim_registration_tpu.pipeline.cluster import (
        find_job_xmls,
        merge_cluster_jobs,
    )

    jobs = args.jobs or find_job_xmls(os.path.dirname(
        os.path.abspath(args.xml)))
    if not jobs:
        print("no job XMLs found", file=sys.stderr)
        return 1
    merge_cluster_jobs(args.xml, jobs, out_xml=args.out)
    print(f"merged {len(jobs)} jobs into {args.out or args.xml}")


def cmd_resave(args):
    from spim_registration_tpu.core.xml_io import save_dataset

    ds = _dataset_with_loader(args.xml)
    if args.format == "hdf5":
        from spim_registration_tpu.core.resave import resave_hdf5

        out = args.out or args.h5 or os.path.join(ds.base_path, "data.h5")
        resave_hdf5(ds, out, max_levels=args.levels)
    elif args.format == "zarr":
        from spim_registration_tpu.core.zarr_store import resave_zarr

        out = args.out or os.path.join(ds.base_path, "data.zarr")
        resave_zarr(ds, out, max_levels=args.levels)
    elif args.format == "n5":
        from spim_registration_tpu.core.zarr_store import resave_n5_bdv

        out = args.out or os.path.join(ds.base_path, "data.n5")
        resave_n5_bdv(ds, out, max_levels=args.levels)
    else:
        raise SystemExit(f"unknown resave format {args.format!r}")
    save_dataset(ds, args.xml)
    print(f"resaved to {out}")


def cmd_info(args):
    ds = _dataset_with_loader(args.xml) if args.load_images else None
    if ds is None:
        from spim_registration_tpu.core.xml_io import load_dataset
        ds = load_dataset(args.xml)
    print(f"dataset: {args.xml}")
    print(f"timepoints: {ds.timepoints()}")
    print(f"setups: {ds.setups()}")
    for vid, vd in sorted(ds.views.items()):
        labels = {k: len(v.points) for k, v in vd.interest_points.items()}
        print(f"  view {vid}: angle={vd.angle} size={vd.size} "
              f"transforms={[t.name for t in vd.transforms]} "
              f"points={labels}")


def main(argv=None):
    p = argparse.ArgumentParser(prog="spim-tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--config", help="RunConfig JSON file")
        sp.add_argument("--set", action="append", metavar="KEY=VAL",
                        help="dotted config override, e.g. "
                             "detection.sigma=2.0")
        sp.add_argument("--profile", metavar="DIR",
                        help="write a jax.profiler trace of this stage")
        sp.add_argument("--multihost", action="store_true",
                        help="initialize jax.distributed from "
                             "COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID")
        sp.add_argument("--mesh", metavar="SPEC",
                        help="run this stage on a device mesh: 'auto' "
                             "(all devices, z axis), 'z=8', or "
                             "'view=2,z=4'; default single-device "
                             "(--multihost implies auto)")

    sp = sub.add_parser("define",
                        help="define a dataset from files on disk")
    sp.add_argument("base_path")
    sp.add_argument("--pattern", default="tp{tp}_setup{setup}.npy",
                    help="filename pattern with {tp} and {setup} or "
                         "{angle}/{channel}/{illum}/{tile} placeholders")
    sp.add_argument("--format", default="auto",
                    choices=["auto", "pattern", "czi", "micromanager",
                             "dhm"])
    sp.add_argument("--voxel-size", type=float, nargs=3,
                    default=[1.0, 1.0, 1.0], metavar=("Z", "Y", "X"))
    sp.set_defaults(fn=cmd_define)

    sp = sub.add_parser("simulate", help="generate a synthetic dataset")
    sp.add_argument("--out", required=True)
    sp.add_argument("--views", type=int, default=4)
    sp.add_argument("--timepoints", type=int, default=1)
    sp.add_argument("--beads", type=int, default=120)
    sp.add_argument("--shape", type=int, nargs=3, default=[96, 96, 96])
    sp.add_argument("--bead-sigma", type=float, default=1.7)
    sp.add_argument("--blur", action="store_true",
                    help="apply per-view anisotropic PSF blur")
    sp.add_argument("--seed", type=int, default=0)
    sp.set_defaults(fn=cmd_simulate)

    for name, fn in (("detect", cmd_detect), ("register", cmd_register)):
        sp = sub.add_parser(name)
        sp.add_argument("xml")
        if name == "detect":
            sp.add_argument("--method", default="dog",
                            choices=("dog", "dom"),
                            help="DoG (default) or integral-image "
                                 "Difference-of-Mean")
        if name == "register":
            sp.add_argument("--channel", type=int, default=None,
                            help="register only this channel "
                                 "(default: all views together)")
        common(sp)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("define-bbox", help="persist a named bounding "
                        "box (explicit or from detections)")
    sp.add_argument("xml")
    sp.add_argument("name")
    sp.add_argument("--min", type=int, nargs=3, metavar=("Z", "Y", "X"))
    sp.add_argument("--max", type=int, nargs=3, metavar=("Z", "Y", "X"))
    sp.add_argument("--from-points", metavar="LABEL",
                    help="box the transformed interest points with this "
                         "label")
    sp.add_argument("--margin", type=int, default=10)
    sp.set_defaults(fn=cmd_define_bbox)

    sp = sub.add_parser("tune", help="sweep DoG sigma/threshold on one "
                        "view (InteractiveDoG analog)")
    sp.add_argument("xml")
    sp.add_argument("--view", type=int, nargs=2, metavar=("TP", "SETUP"))
    sp.add_argument("--sigma", type=float, default=1.8)
    sp.add_argument("--expected-points", type=int, default=None)
    common(sp)
    sp.set_defaults(fn=cmd_tune)

    sp = sub.add_parser("icp-refine", help="ICP-refine registered views "
                        "against view 0 (per timepoint)")
    sp.add_argument("xml")
    sp.add_argument("--max-distance", type=float, default=5.0)
    common(sp)
    sp.set_defaults(fn=cmd_icp_refine)

    sp = sub.add_parser("fuse")
    sp.add_argument("xml")
    sp.add_argument("--out", default="fused.tif")
    sp.add_argument("--bbox", metavar="NAME",
                    help="use this named bounding box from the XML "
                         "instead of the automatic maximal box")
    sp.add_argument("--append-hdf5", metavar="H5",
                    help="append output as a new view setup into this "
                         "existing BDV-HDF5 (+XML update) instead of "
                         "writing TIFF/npy")
    sp.add_argument("--out-of-core", action="store_true",
                    help="stream the fusion through disk-resident blocks "
                         "(fuse/streaming.py; larger-than-memory outputs)")
    sp.add_argument("--ooc-workdir", metavar="DIR",
                    help="work directory for the streaming stores "
                         "(default: <out>.ooc)")
    common(sp)
    sp.set_defaults(fn=cmd_fuse)

    sp = sub.add_parser("deconvolve")
    sp.add_argument("xml")
    sp.add_argument("--out", default="deconvolved.tif")
    sp.add_argument("--bbox", metavar="NAME",
                    help="use this named bounding box from the XML "
                         "instead of the automatic maximal box")
    sp.add_argument("--append-hdf5", metavar="H5",
                    help="append output as a new view setup into this "
                         "existing BDV-HDF5 (+XML update)")
    sp.add_argument("--out-of-core", action="store_true",
                    help="stream the deconvolution through disk-resident "
                         "blocks (volumes beyond RAM/HBM; composes with "
                         "--mesh: z-blocks round-robin across devices)")
    sp.add_argument("--ooc-workdir", metavar="DIR",
                    help="work directory for the out-of-core stores "
                         "(default: <out>.ooc)")
    sp.add_argument("--block-z", type=int,
                    help="out-of-core z-block height (default: auto)")
    common(sp)
    sp.set_defaults(fn=cmd_deconvolve)

    sp = sub.add_parser("cluster-job",
                        help="run one per-timepoint job (detect+register)")
    sp.add_argument("xml")
    sp.add_argument("--tp", type=int, required=True)
    sp.add_argument("--stages", default="detect,register")
    sp.add_argument("--out", help="job XML path (default job_tp<N>.xml)")
    common(sp)
    sp.set_defaults(fn=cmd_cluster_job)

    sp = sub.add_parser("cluster-merge",
                        help="fold job XMLs back into the master XML")
    sp.add_argument("xml")
    sp.add_argument("jobs", nargs="*")
    sp.add_argument("--out")
    sp.set_defaults(fn=cmd_cluster_merge)

    sp = sub.add_parser("resave")
    sp.add_argument("xml")
    sp.add_argument("--h5")
    sp.add_argument("--out")
    sp.add_argument("--format", default="hdf5",
                    choices=("hdf5", "zarr", "n5"))
    sp.add_argument("--levels", type=int, default=4)
    sp.set_defaults(fn=cmd_resave)

    sp = sub.add_parser("info")
    sp.add_argument("xml")
    sp.add_argument("--load-images", action="store_true")
    sp.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    # persistent XLA compilation cache: production re-runs on identical
    # shapes skip the (up to minutes-scale) TPU compile entirely; disable
    # with SPIM_COMPILE_CACHE=0
    if os.environ.get("SPIM_COMPILE_CACHE") != "0":
        from spim_registration_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()
    if getattr(args, "multihost", False):
        from spim_registration_tpu.parallel.multihost import (
            initialize_multihost,
        )

        initialize_multihost()
    try:
        if getattr(args, "profile", None):
            from spim_registration_tpu.utils.profiling import xla_trace

            with xla_trace(args.profile):
                return args.fn(args) or 0
        return args.fn(args) or 0
    except (FileNotFoundError, KeyError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    except BrokenPipeError:  # stdout closed early (e.g. piped to head)
        return 0


if __name__ == "__main__":
    sys.exit(main())
