"""TPU-friendly row lookup.

XLA gathers of [N] rows cost ~1.3 ms per call at N=262k on a v5e — they
dominate the integrator once intersection is fast. For small tables the
one-hot/matmul formulation runs on the MXU at ~5x the speed, and its
transpose (scatter-add of gradients into the table) is again a matmul. The
integrator funnels every per-ray table lookup (materials, triangle
attributes, light vertices) through ``take_rows`` so the whole hot path is
gather-free for typical scenes; big tables fall back to a real gather.

Every one-hot matmul here runs at ``Precision.HIGHEST``: TPU f32 matmuls
default to bf16 passes, which would silently round the gathered VALUES
(a 0/1 matmul is only a gather if the data operand stays exact). This was
a real bug: the Cornell light's y=3.836 rounded to bf16 3.84375 — above
the ceiling at 3.8416 — so on the TPU XLA path every NEE shadow ray was
self-occluded and direct lighting vanished. CPU tests never see it (CPU
matmuls are exact); only on-chip runs do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Max table rows for the one-hot path. Memory for the one-hot operand is
# N x rows x 4B (e.g. 262k rays x 128 rows = 134 MB, transient).
#
# Default 0 = always use real gathers. Measured end-to-end on a v5e chip
# (Cornell 512^2, 4 spp, 4 bounces): isolated gathers bench 5x slower than
# one-hot matmuls, but inside the fused render XLA overlaps gather latency
# with the Pallas sweeps and the one-hot variant was ~20% SLOWER overall
# (44.9 -> 35.7 Mrays/s). The packed-lookup API stays: it is the
# correctness mechanism for shard-local attribute resolution (ring mode)
# and a tuning knob for gather-bound scenes.
ONEHOT_ROWS = 0


def take_rows(table: jax.Array, idx: jax.Array,
              onehot_rows: int | None = None) -> jax.Array:
    """``table[idx]`` with an MXU-friendly lowering for small tables.

    table: [R, ...c] float array; idx: integer array of any shape.
    Returns [*idx.shape, ...c]. Differentiable w.r.t. ``table`` (the
    one-hot transpose is the exact scatter-add a gather would need).
    """
    if onehot_rows is None:
        onehot_rows = ONEHOT_ROWS  # read at call time: tunable/testable
    r = table.shape[0]
    if r > onehot_rows:
        return table[idx]
    flat_idx = idx.reshape(-1)
    onehot = (
        flat_idx[:, None] == jnp.arange(r, dtype=flat_idx.dtype)[None, :]
    ).astype(table.dtype)
    flat_tab = table.reshape(r, -1)
    out = jnp.dot(onehot, flat_tab, preferred_element_type=table.dtype,
                  precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + table.shape[1:])


def cm_take(table_cm: jax.Array, idx: jax.Array,
            onehot_rows: int = 128) -> jax.Array:
    """Component-major lookup: table_cm [C, R] indexed by ``idx`` of any
    shape → [C, *idx.shape], minor-dim DENSE.

    The row-major gather ``table.T[:, idx]`` materializes a [K, C] result
    with C (=3) padded to 128 lanes — profiling showed those intermediates
    dominating the render. For small R this is instead a [C, R] @ [R, K]
    one-hot matmul whose output is born in the dense layout; large R falls
    back to the gather (big-scene path, already kernel-dominated).
    """
    c, r = table_cm.shape
    flat = idx.reshape(-1)
    if r > onehot_rows:
        out = table_cm[:, flat]
    else:
        onehot = (
            flat[None, :] == jnp.arange(r, dtype=flat.dtype)[:, None]
        ).astype(table_cm.dtype)
        out = jnp.dot(table_cm, onehot,
                      preferred_element_type=table_cm.dtype,
                      precision=jax.lax.Precision.HIGHEST)
    return out.reshape((c,) + idx.shape)


def take_columns_packed(tables: list[jax.Array], idx: jax.Array,
                        onehot_rows: int | None = None) -> list[jax.Array]:
    """Look up the same rows of several [R, ...] float tables with ONE
    matmul: concatenates columns, takes rows, splits back.

    In gather mode (table too big / one-hot disabled) this does SEPARATE
    direct gathers — packing + re-slicing materializes intermediates that
    XLA otherwise fuses straight into consumers (measured ~20% end-to-end
    regression on the TPU render when packed)."""
    if onehot_rows is None:
        onehot_rows = ONEHOT_ROWS
    if tables[0].shape[0] > onehot_rows:
        return [t[idx] for t in tables]
    cols = []
    shapes = []
    for t in tables:
        flat = t.reshape(t.shape[0], -1)
        shapes.append(t.shape[1:])
        cols.append(flat)
    packed = jnp.concatenate(cols, axis=1)
    taken = take_rows(packed, idx, onehot_rows)
    out = []
    start = 0
    for flat, shape in zip(cols, shapes):
        width = flat.shape[1]
        piece = taken[..., start:start + width]
        out.append(piece.reshape(idx.shape + shape))
        start += width
    return out
