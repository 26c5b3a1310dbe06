"""Timelapse stabilization, cluster job split/merge, and utility tools."""

import os

import numpy as np
import pytest

from spim_registration_tpu.core.dataset import Dataset, ViewDescription
from spim_registration_tpu.core.imgloaders import memory_loader
from spim_registration_tpu.core.xml_io import load_dataset, save_dataset
from spim_registration_tpu.detect.dog import DoGParameters
from spim_registration_tpu.match.pairwise import PairwiseParameters
from spim_registration_tpu.pipeline import RegistrationConfig
from spim_registration_tpu.pipeline.cluster import (
    find_job_xmls,
    merge_cluster_jobs,
    run_job,
    split_timepoints,
)
from spim_registration_tpu.pipeline.timelapse import register_timeseries
from spim_registration_tpu.pipeline.tools import (
    apply_transformation,
    duplicate_transformation,
    max_project,
    remove_detections,
    specify_calibration,
    thin_out_detections,
    visualize_detections,
)
from spim_registration_tpu.utils.simulation import (
    make_multiview_scene,
    render_beads,
)


def test_timelapse_stabilization(rng):
    """Config #5-lite: 3 timepoints x 2 views; timepoint drift must be
    removed by stabilization against the reference timepoint."""
    base = make_multiview_scene(rng, n_views=2, shape=(80, 80, 80),
                                n_beads=110, max_perturb_deg=4.0,
                                noise=0.003)
    volumes_by_tp = {0: base.volumes}
    drifts = {0: np.zeros(3)}
    for tp in (1, 2):
        drift = rng.uniform(-3, 3, 3)
        drifts[tp] = drift
        vols = []
        for v in range(2):
            pts = base.view_points[v] - drift  # whole sample drifts
            vols.append(render_beads(pts, (80, 80, 80), 1.7)
                        + rng.normal(0, 0.003, (80, 80, 80)
                                     ).astype(np.float32))
        volumes_by_tp[tp] = vols

    cfg = RegistrationConfig(
        detection=DoGParameters(sigma=1.8, threshold=0.008),
        pairwise=PairwiseParameters(model="affine", max_points=256))
    res = register_timeseries(volumes_by_tp, cfg, reference_tp=0)

    for tp in (1, 2):
        S = res.stabilization[tp]
        # stabilization should translate by ~+drift (map tp frame onto ref)
        np.testing.assert_allclose(S[:, 3], drifts[tp], atol=0.3)
        st = [s for s in res.statistics if s.timepoint == tp][0]
        assert st.valid and st.mean_error < 0.5


def _mini_dataset(rng, tmp_path, n_tp=2, n_views=2):
    ds = Dataset(base_path=str(tmp_path))
    vols = {}
    scene = make_multiview_scene(rng, n_views=n_views, shape=(48, 48, 48),
                                 n_beads=30, noise=0.003)
    for tp in range(n_tp):
        for s in range(n_views):
            vd = ViewDescription(view_id=(tp, s), size=(48, 48, 48))
            ds.add_view(vd)
            vols[(tp, s)] = scene.volumes[s]
    ds.loader = memory_loader(vols)
    return ds, vols


def test_cluster_jobs_roundtrip(rng, tmp_path):
    ds, vols = _mini_dataset(rng, tmp_path)
    master = str(tmp_path / "master.xml")
    save_dataset(ds, master)

    def process(dataset, tp):
        # a stand-in per-tp stage: set a transform + detections
        for s in range(2):
            dataset.views[(tp, s)].set_transform(
                "registration", np.concatenate(
                    [np.eye(3), np.full((3, 1), float(tp + s))], axis=1))
            dataset.set_interest_points(
                (tp, s), "beads", rng.uniform(0, 48, (5, 3)))

    jobs = []
    for tp in split_timepoints(ds):
        jobs.append(run_job(master, tp, process))
    assert find_job_xmls(str(tmp_path)) == sorted(jobs)

    merged = merge_cluster_jobs(master, jobs)
    for tp in range(2):
        for s in range(2):
            A = merged.views[(tp, s)].model()
            np.testing.assert_allclose(A[:, 3], [tp + s] * 3)
            assert len(merged.views[(tp, s)].interest_points["beads"].points) == 5
    # master.xml rewritten + backup exists
    assert os.path.exists(master + "~1")


def test_tools(rng, tmp_path):
    ds, vols = _mini_dataset(rng, tmp_path, n_tp=1)
    A = np.concatenate([np.eye(3), np.ones((3, 1))], axis=1)
    apply_transformation(ds, [(0, 0)], A, name="shift")
    np.testing.assert_allclose(ds.views[(0, 0)].model()[:, 3], [1, 1, 1])
    duplicate_transformation(ds, (0, 0), [(0, 1)])
    np.testing.assert_allclose(ds.views[(0, 1)].model()[:, 3], [1, 1, 1])

    specify_calibration(ds, (2.0, 0.5, 0.5))
    M = ds.views[(0, 0)].model()
    # z scaled 4x relative to y/x, applied before the shift
    assert abs(M[0, 0] - 4.0) < 1e-9 and abs(M[1, 1] - 1.0) < 1e-9

    pts = np.array([[10.0, 10, 10], [10, 10, 11], [30, 30, 30]])
    ds.set_interest_points((0, 0), "beads", pts, np.array([1.0, 0.5, 2.0]))
    thin_out_detections(ds, [(0, 0)], "beads", min_distance=2.0)
    kept = ds.views[(0, 0)].interest_points["beads"].points
    assert len(kept) == 2  # the two 1-px-apart points collapse to one

    vis = visualize_detections(ds, (0, 0), "beads")
    assert vis.shape == (48, 48, 48) and vis.max() > 0.5

    remove_detections(ds, [(0, 0)], "beads")
    assert "beads" not in ds.views[(0, 0)].interest_points

    mp = max_project(vols[(0, 0)], axis=0)
    assert mp.shape == (48, 48)
    np.testing.assert_allclose(mp, vols[(0, 0)].max(axis=0))
