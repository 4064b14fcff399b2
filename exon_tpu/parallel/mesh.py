"""Device mesh construction for distributed query execution.

Axes convention:
  * ``shard``  — data-partition axis (files / row ranges). The primary axis:
    scans split across it, shuffles exchange over it.
  * ``lane``   — optional intra-operator axis (wide sort/join stages can
    subdivide work); degree 1 unless requested.

On a v5p pod slice, ``shard`` should be laid out over ICI-adjacent devices so
all_to_all shuffles stay on ICI; multi-host DCN crossings happen only at the
(rare) final gather.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, lane: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            # dev/test fallback: virtual CPU devices (needs
            # jax_num_cpu_devices set before backend init)
            try:
                cpus = jax.devices("cpu")
                if len(cpus) >= n_devices:
                    devices = cpus
            except RuntimeError:
                pass
        if n_devices is not None and len(devices) < n_devices:
            raise ValueError(
                f"need {n_devices} devices, have {len(devices)}")
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % lane != 0:
        raise ValueError(f"{n} devices not divisible by lane={lane}")
    arr = np.asarray(devices).reshape(n // lane, lane)
    return Mesh(arr, ("shard", "lane"))


_DEFAULT: Optional[Mesh] = None


def default_mesh() -> Mesh:
    global _DEFAULT
    if _DEFAULT is None:
        _DEFAULT = make_mesh()
    return _DEFAULT


def set_default_mesh(mesh: Mesh) -> None:
    global _DEFAULT
    _DEFAULT = mesh
