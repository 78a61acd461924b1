"""Device-mesh helpers.

Axis conventions for the framework:

* ``stream`` — contiguous time segments of one long audio stream
  (sequence parallelism with overlap-save halos),
* ``channel`` — independent audio channels / receivers (data parallelism),

Multi-host pods: call jax.distributed.initialize() before building a mesh;
jax.devices() then spans all hosts and the same code shards over ICI/DCN.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "make_freq_mesh", "make_stage_mesh", "P",
           "NamedSharding"]


def make_mesh(stream: int = 1, channel: int = 1,
              devices=None) -> Mesh:
    """Build a (channel, stream) mesh over the available devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    need = stream * channel
    if need > len(devices):
        raise ValueError(
            f"mesh {channel}x{stream} needs {need} devices, "
            f"have {len(devices)}")
    grid = np.array(devices[:need]).reshape(channel, stream)
    return Mesh(grid, axis_names=("channel", "stream"))


def make_stage_mesh(stages: int = 2, devices=None) -> Mesh:
    """1-D ``stage`` mesh for the pipelined decode (parallel/pipeline.py)."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if stages > len(devices):
        raise ValueError(f"stage mesh needs {stages} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:stages]), axis_names=("stage",))


def make_freq_mesh(freq: int, devices=None) -> Mesh:
    """1-D ``freq`` mesh for tensor-parallel single-slot decoding
    (parallel/tensor.py): the slot's frequency grid is sharded over it."""
    devices = list(jax.devices()) if devices is None else list(devices)
    if freq > len(devices):
        raise ValueError(f"freq mesh needs {freq} devices, "
                         f"have {len(devices)}")
    return Mesh(np.array(devices[:freq]), axis_names=("freq",))
