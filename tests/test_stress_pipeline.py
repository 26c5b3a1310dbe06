"""Config #5 stress pipeline (lite): cluster split + stabilization +
streaming fusion completes under a memory budget with sub-0.5 px
stabilization residual (VERDICT r1 item 9)."""

import os
import sys
from pathlib import Path

_EXAMPLES = Path(__file__).resolve().parent.parent / "examples"
if str(_EXAMPLES) not in sys.path:
    sys.path.insert(0, str(_EXAMPLES))


def test_stress_pipeline_lite(tmp_path, monkeypatch):
    monkeypatch.setenv("SPIM_STRESS_LITE", "1")
    import timelapse_stress

    summary = timelapse_stress.main(workdir=str(tmp_path), budget_mb=6144)
    assert summary["max_stabilization_residual_px"] < 0.5
    assert summary["peak_rss_mb"] < 6144
    # fused outputs exist and are world-sized
    import numpy as np

    from spim_registration_tpu.native_blocks import RawVolumeStore

    st = RawVolumeStore(str(tmp_path / "fused_tp0.raw"),
                        summary["world_dims"])
    out = st.read_block((0, 0, 0), summary["world_dims"])
    assert np.isfinite(out).all() and out.max() > 0.1
