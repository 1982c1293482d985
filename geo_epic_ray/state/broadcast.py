"""Broadcast small side tables once per job (ray.put), read per actor.

The reference loads its side state (BallTrees, rasters, parameter tables)
per *process* from files (geoEpic/utils/raster_utils.py:165-236,
geoEpic/io/parmio.py:6-34). The Ray-native equivalent: the driver puts the
Arrow table in the object store once; every actor pins it zero-copy in
``__init__`` — never re-shipped per batch, never re-read per task.
"""

from __future__ import annotations

from typing import Any

import ray


def put_once(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def get(ref):
    """ray.get that tolerates being handed a plain object (tests without a
    live Ray session)."""
    if isinstance(ref, ray.ObjectRef):
        return ray.get(ref)
    return ref
