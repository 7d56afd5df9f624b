"""Frozen-geometry pinning for materialized incremental indexes.

Every maintainer (minhash, passages, embedding) freezes some geometry at
state creation — shingle construction, band/width counts, chunk sizes,
hyperplane strides.  A maintainer reopened over existing state with
DIFFERENT geometry (changed code constants in a newer build, or a
different constructor argument) would silently mis-bucket every future
delta against history — candidates quietly stop matching, no error ever
surfaces.  Like any production LSH/index state, the geometry therefore
rides WITH the state: pinned to a json at creation, verified on reopen,
removed when the state is dropped (a rebuilt index may re-geometry
freely).

The reference's analogue is its table catalog pinning column types with
the stored data (catalog/src/bootstrap.rs) — config lives with the bytes
it shaped, never only in code.
"""

from __future__ import annotations

import json
import os

from ..commit import write_json_atomic


def geometry_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_geometry.json")


def pin_geometry(state_dir: str, geometry: dict) -> None:
    """Persist ``geometry`` at first open; on reopen verify it matches —
    a mismatch raises instead of silently mis-bucketing future deltas."""
    path = geometry_path(state_dir)
    if os.path.exists(path):
        with open(path) as fh:
            stored = json.load(fh)
        if stored != geometry:
            raise ValueError(
                f"frozen index geometry mismatch: state at {state_dir} "
                f"was built with {stored}, reopened with {geometry} — "
                f"re-building the state is required to change geometry"
            )
        return
    os.makedirs(state_dir, exist_ok=True)
    write_json_atomic(path, geometry)


def unpin_geometry(state_dir: str) -> None:
    path = geometry_path(state_dir)
    if os.path.exists(path):
        os.unlink(path)
