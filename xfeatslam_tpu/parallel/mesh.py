"""Mesh construction helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, data_axis: int = None):
    """(data, model) mesh over the available devices.

    The model axis stays small (<=2 by default) — XFeat's widest layer is
    128 channels, so deep model sharding is not profitable; throughput comes
    from the data axis.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if data_axis is None:
        model = 2 if n % 2 == 0 and n >= 4 else 1
        data_axis = n // model
    model = n // data_axis
    arr = np.array(devs).reshape(data_axis, model)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
