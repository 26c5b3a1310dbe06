"""RunConfig serialization + CLI end-to-end."""

import os
import sys

import numpy as np
import pytest

from spim_registration_tpu.pipeline.config import (
    RunConfig,
    apply_overrides,
    from_json,
    to_json,
)


def test_config_roundtrip(tmp_path):
    cfg = RunConfig()
    path = str(tmp_path / "cfg.json")
    to_json(cfg, path)
    cfg2 = from_json(path)
    assert cfg2 == cfg


def test_config_overrides():
    cfg = RunConfig()
    cfg2 = apply_overrides(cfg, {
        "detection.sigma": 2.5,
        "pairwise.model": "rigid",
        "pairwise.ransac.max_epsilon": 3.0,
        "deconvolution.num_iterations": 42,
    })
    assert cfg2.detection.sigma == 2.5
    assert cfg2.pairwise.model == "rigid"
    assert cfg2.pairwise.ransac.max_epsilon == 3.0
    assert cfg2.deconvolution.num_iterations == 42
    # original untouched
    assert cfg.detection.sigma == 1.8


def test_config_unknown_key_rejected():
    with pytest.raises(KeyError):
        apply_overrides(RunConfig(), {"detection.nope": 1})


def test_cli_simulate_detect_register(tmp_path):
    from spim_registration_tpu.cli import main

    out = str(tmp_path / "ds")
    assert main(["simulate", "--out", out, "--views", "2", "--shape",
                 "48", "48", "48", "--beads", "60", "--seed", "3"]) == 0
    xml = os.path.join(out, "dataset.xml")
    assert os.path.exists(xml)
    assert main(["detect", xml, "--set", "detection.threshold=0.01"]) == 0
    assert main(["register", xml]) == 0
    assert main(["fuse", xml, "--out",
                 os.path.join(out, "fused.npy")]) == 0
    fused = np.load(os.path.join(out, "fused.npy"))
    assert fused.ndim == 3 and np.all(np.isfinite(fused))
    # zarr export target (r3): same volume through the TensorStore path
    try:
        import tensorstore  # noqa: F401

        zpath = os.path.join(out, "fused.zarr")
        assert main(["fuse", xml, "--out", zpath]) == 0
        from spim_registration_tpu.core.zarr_store import open_volume

        zv = open_volume(zpath).read()
        np.testing.assert_allclose(zv, fused, atol=1e-6)
    except ImportError:
        pass
    assert main(["info", xml]) == 0
    # round-2: the headless tuner + ICP refinement surface
    assert main(["tune", xml, "--expected-points", "60"]) == 0
    assert main(["icp-refine", xml]) == 0


def test_cli_define_bbox_and_fuse(tmp_path):
    """Named bounding boxes: define-bbox (explicit + from-points)
    persists to the XML; fuse --bbox uses it (PreDefinedBoundingBox)."""
    import numpy as np

    from spim_registration_tpu.cli import main

    out = str(tmp_path / "ds")
    xml = out + "/dataset.xml"
    assert main(["simulate", "--out", out, "--views", "2", "--shape",
                 "40", "40", "40", "--beads", "30"]) == 0
    assert main(["define-bbox", xml, "roi", "--min", "4", "4", "4",
                 "--max", "36", "36", "36"]) == 0
    fpath = str(tmp_path / "fused_roi.npy")
    assert main(["fuse", xml, "--out", fpath, "--bbox", "roi"]) == 0
    assert np.load(fpath).shape == (32, 32, 32)
    # from detections
    assert main(["detect", xml]) == 0
    assert main(["define-bbox", xml, "beadbox", "--from-points", "beads",
                 "--margin", "5"]) == 0
    from spim_registration_tpu.core.xml_io import load_dataset

    ds = load_dataset(xml)
    assert "roi" in ds.bounding_boxes and "beadbox" in ds.bounding_boxes
    # unknown name errors cleanly
    assert main(["fuse", xml, "--out", fpath, "--bbox", "nope"]) == 2


def test_cli_detect_dom(tmp_path):
    """`detect --method dom` (ProcessDOM) stores interest points from the
    integral-image Difference-of-Mean detector; `--set dom.*` overrides
    reach it through the config tree."""
    from spim_registration_tpu.cli import main
    from spim_registration_tpu.core.xml_io import load_dataset

    out = str(tmp_path / "ds")
    xml = out + "/dataset.xml"
    assert main(["simulate", "--out", out, "--views", "2", "--shape",
                 "40", "40", "40", "--beads", "25"]) == 0
    assert main(["detect", xml, "--method", "dom",
                 "--set", "dom.threshold=0.003"]) == 0
    ds = load_dataset(xml)
    for vid, vd in ds.views.items():
        ips = vd.interest_points["beads"]
        assert len(ips.points) >= 10, (vid, len(ips.points))
        assert "DoM" in ips.parameters
