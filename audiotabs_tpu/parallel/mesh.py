"""Device mesh construction.

The reference's only parallelism is job-level Celery workers (SURVEY.md
§2c); here the scale-out plane is a jax.sharding.Mesh. The default is a 1-D
"data" mesh over all devices (BASELINE config 5: 64 songs over a v5e-8);
MESH_SHAPE/MESH_AXES env knobs allow e.g. "4,2" / "data,model" so model
parallelism is a config change, not a rewrite.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(shape: tuple[int, ...] | None = None, axes: tuple[str, ...] = ("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    if int(np.prod(shape)) > len(devices):
        raise ValueError(f"mesh shape {shape} needs {np.prod(shape)} devices, have {len(devices)}")
    n = int(np.prod(shape))
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axes)


def default_mesh() -> Mesh:
    from .. import config

    s = config.settings
    if s.MESH_SHAPE:
        shape = tuple(int(x) for x in s.MESH_SHAPE.split(","))
        axes = tuple(a.strip() for a in s.MESH_AXES.split(","))
        return make_mesh(shape, axes)
    return make_mesh()
