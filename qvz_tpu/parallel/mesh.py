"""Device mesh construction for data-parallel scaling over reads.

The reference is single-threaded C (SURVEY.md section 2: no parallelism of
any kind); the natural and only data axis of the QVZ problem is reads, so
the framework scales with a 1-D mesh over the "reads" axis: statistics and
centroid accumulators are shard-local integer partial sums merged with
psum (exact), codebooks/tables are replicated, and the quantization pass
is embarrassingly parallel. ICI carries the (tiny) collective traffic.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

READS_AXIS = "reads"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (READS_AXIS,))


def pad_to_multiple(n: int, k: int) -> int:
    return -(-n // k) * k
