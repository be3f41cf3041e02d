"""Pallas TPU kernels for the engine's hot cross-lane primitives.

XLA's associative_scan decomposes into ~6 slice/pad ops per log-step, none
of which fuse — at 2^17 lanes that is ~150 kernel launches and milliseconds
of pure dispatch.  These kernels do the whole scan in one launch:

  * prefix_sum_f32: two-level blocked scan — within-row inclusive prefix via
    an MXU matmul with an upper-triangular ones matrix, row carries via a
    second (tiny) matmul level.
  * prefix_max_f32: log-shift scan on the lane axis plus a row-carry
    log-shift on the sublane axis, all on VMEM.

Both require len(x) % 128 == 0 and len(x) <= 128*128*128; callers fall back
to jax.lax.associative_scan otherwise (tuun_tpu.engine.graph._cumsum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# A plain Python float: a jnp scalar here would be captured as a kernel
# constant, which pallas_call rejects.
NEG_BIG = -3.0e38


def _tri_inclusive(n: int):
    """U[k, j] = 1 if k <= j — x @ U gives the within-row inclusive prefix.
    (iota must be integer-typed inside Mosaic.)"""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (row <= col).astype(jnp.float32)


def _tri_exclusive(n: int):
    """S[k, j] = 1 if k < j — x @ S gives the exclusive prefix."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (row < col).astype(jnp.float32)


def _prefix_sum_kernel(x_ref, o_ref, *, rows: int):
    """Hillis-Steele doubling on both axes, all VPU passes on VMEM.

    (An MXU triangular-matmul formulation is mathematically neater but
    f32-exact matmuls compile ~400x slower through Mosaic here.)
    """
    y1 = x_ref[:]  # [rows, LANE]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    k = 1
    while k < LANE:
        shifted = pltpu.roll(y1, k, 1)
        y1 = y1 + jnp.where(col >= k, shifted, 0.0)
        k *= 2
    # Row carry: exclusive prefix sum of row totals via sublane doubling.
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    m = jnp.broadcast_to(y1[:, LANE - 1:LANE], (rows, LANE))
    carry = jnp.zeros((rows, LANE), jnp.float32)
    k = 1
    while k < rows:
        shifted = pltpu.roll(m, k, 0)
        contrib = jnp.where(rowi >= k, shifted, 0.0)
        carry = carry + contrib
        m = m + contrib
        k *= 2
    o_ref[:] = y1 + carry


def _prefix_max_kernel(x_ref, o_ref, *, rows: int):
    x = x_ref[:]  # [rows, LANE]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    # Within-row running max: log-shift along lanes.
    k = 1
    while k < LANE:
        shifted = pltpu.roll(x, k, 1)
        x = jnp.maximum(x, jnp.where(col >= k, shifted, NEG_BIG))
        k *= 2
    # Row carry (exclusive running max of previous rows' maxes): log-shift
    # doubling on the sublane axis, kept at [rows, LANE] for clean tiling.
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    m = jnp.broadcast_to(x[:, LANE - 1:LANE], (rows, LANE))
    carry = jnp.full((rows, LANE), NEG_BIG, jnp.float32)
    k = 1
    while k < rows:
        shifted = pltpu.roll(m, k, 0)
        contrib = jnp.where(rowi >= k, shifted, NEG_BIG)
        carry = jnp.maximum(carry, contrib)
        m = jnp.maximum(m, contrib)
        k *= 2
    o_ref[:] = jnp.maximum(x, carry)


def _supported(n: int) -> bool:
    return n % LANE == 0 and 0 < n <= LANE * LANE * LANE


@functools.partial(jax.jit, static_argnames=())
def _id(x):
    return x


def prefix_sum_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D f32 array in one Pallas kernel."""
    n = x.shape[0]
    if not _supported(n):
        return jax.lax.associative_scan(jnp.add, x)
    rows = n // LANE
    out = pl.pallas_call(
        functools.partial(_prefix_sum_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32).reshape(rows, LANE))
    return out.reshape(n)


def prefix_max_f32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max of a 1-D f32 array in one Pallas kernel."""
    n = x.shape[0]
    if not _supported(n):
        return jax.lax.associative_scan(jnp.maximum, x)
    rows = n // LANE
    out = pl.pallas_call(
        functools.partial(_prefix_max_kernel, rows=rows),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x.astype(jnp.float32).reshape(rows, LANE))
    return out.reshape(n)


def pallas_available() -> bool:
    """True when running on a TPU backend where these kernels compile."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    kind = (getattr(dev, "device_kind", "") or "").lower()
    plat = (getattr(dev, "platform", "") or "").lower()
    return "tpu" in kind or plat in ("tpu",)
