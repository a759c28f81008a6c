"""Device meshes and sharding layouts.

The reference is strictly single-GPU (SURVEY.md §2.6: batch_size=1, no
torch.distributed anywhere). The TPU rebuild's parallel axis is the *view
batch*: each chip renders + encodes a slice of the views, and texture
gradients are reduced over ICI (XLA inserts the psum from the sharding
annotations — no hand-written collectives needed for DP).

Axes:
- ``views``: data parallelism over the per-step view batch.
- ``style`` (optional outer axis): embarrassingly parallel multi-style
  sweeps — one independent optimization per style, no gradient traffic
  (rides DCN across slices if present).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stylemesh_tpu.data.schema import ViewBatch


def make_mesh(devices=None, axis_name="views"):
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def replicate_sharding(mesh):
    return NamedSharding(mesh, P())


def view_batch_sharding(batch: ViewBatch, mesh, axis_name="views"):
    """Pytree of shardings for a ViewBatch: split every leaf on its leading
    (view) dimension. Usable directly as a jit in_sharding."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda _: s, batch)


def shard_view_batch(batch: ViewBatch, mesh, axis_name="views"):
    """Place a host ViewBatch onto the mesh, views split across chips."""
    s = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
