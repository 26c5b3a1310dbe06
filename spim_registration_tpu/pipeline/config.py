"""Typed run configuration serialized to the run manifest.

Reference parity (SURVEY.md section 5 config row): the reference scatters
parameters over GenericDialog `default*` statics (Gen-2) and a ~100-field
`SPIMConfiguration` bean (Gen-1). Here one dataclass tree covers every
stage; `to_json`/`from_json` give the manifest round-trip and the CLI is a
thin parser over it.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional

from spim_registration_tpu.deconv.lucy_richardson import (
    DeconvolutionParameters,
)
from spim_registration_tpu.detect.dog import DoGParameters
from spim_registration_tpu.detect.dom import DoMParameters
from spim_registration_tpu.fuse.weighted_avg import FusionParameters
from spim_registration_tpu.fuse.weights import (
    BlendingParameters,
    ContentBasedParameters,
)
from spim_registration_tpu.match.pairwise import PairwiseParameters
from spim_registration_tpu.models.ransac import RansacParameters
from spim_registration_tpu.solve.global_opt import GlobalOptParameters


@dataclasses.dataclass(frozen=True)
class RunConfig:
    detection: DoGParameters = DoGParameters()
    # integral-image Difference-of-Mean detection (ProcessDOM) — used by
    # `cli detect --method dom`
    dom: DoMParameters = DoMParameters()
    pairwise: PairwiseParameters = PairwiseParameters()
    # pipeline opt-in: wrong-link trimming on (see run.py note)
    global_opt: GlobalOptParameters = GlobalOptParameters(
        outlier_trim_rounds=2)
    fusion: FusionParameters = FusionParameters()
    deconvolution: DeconvolutionParameters = DeconvolutionParameters()
    label: str = "beads"


_NESTED = {
    "detection": DoGParameters,
    "dom": DoMParameters,
    "pairwise": PairwiseParameters,
    "global_opt": GlobalOptParameters,
    "fusion": FusionParameters,
    "deconvolution": DeconvolutionParameters,
    "ransac": RansacParameters,
    "blending": BlendingParameters,
    "content": ContentBasedParameters,
}


def _to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {f.name: _to_dict(getattr(obj, f.name))
                for f in dataclasses.fields(obj)}
    if isinstance(obj, tuple):
        return list(obj)
    return obj


def _from_dict(cls, data: dict):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        if f.name in _NESTED and isinstance(v, dict):
            v = _from_dict(_NESTED[f.name], v)
        elif isinstance(v, list):
            v = tuple(v)
        kwargs[f.name] = v
    return cls(**kwargs)


def to_json(cfg: RunConfig, path: Optional[str] = None) -> str:
    s = json.dumps(_to_dict(cfg), indent=2)
    if path:
        with open(path, "w") as f:
            f.write(s + "\n")
    return s


def from_json(src: str) -> RunConfig:
    """Parse a RunConfig from a JSON string or a path to one."""
    try:
        data = json.loads(src)
    except json.JSONDecodeError:
        with open(src) as f:
            data = json.load(f)
    return _from_dict(RunConfig, data)


def apply_overrides(cfg: RunConfig, overrides: dict) -> RunConfig:
    """Apply dotted-path overrides, e.g. {'detection.sigma': 2.0}."""
    data = _to_dict(cfg)
    for key, value in overrides.items():
        node = data
        parts = key.split(".")
        for p in parts[:-1]:
            node = node[p]
        if parts[-1] not in node:
            raise KeyError(f"unknown config key {key!r}")
        node[parts[-1]] = value
    return _from_dict(RunConfig, data)
