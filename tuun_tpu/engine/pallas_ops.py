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
import math

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


def _prefix_sum_kernel(x_ref, o_ref, carry_ref, *, rows: int):
    """Hillis-Steele doubling on both axes, all VPU passes on VMEM.

    One grid step scans `rows` rows; the running total over prior tiles
    rides in SMEM scratch (TPU grids execute in order, so the carry is
    race-free).  (An MXU triangular-matmul formulation is mathematically
    neater but f32-exact matmuls compile ~400x slower through Mosaic.)
    """
    @pl.when(pl.program_id(0) == 0)
    def _init_carry():
        carry_ref[0] = 0.0

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
    total = y1 + carry + carry_ref[0]
    o_ref[:] = total
    carry_ref[0] = total[rows - 1, LANE - 1]


def _prefix_max_kernel(x_ref, o_ref, carry_ref, *, rows: int):
    @pl.when(pl.program_id(0) == 0)
    def _init_carry():
        carry_ref[0] = NEG_BIG

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
    total = jnp.maximum(jnp.maximum(x, carry), carry_ref[0])
    o_ref[:] = total
    carry_ref[0] = total[rows - 1, LANE - 1]


def _supported(n: int) -> bool:
    return n % LANE == 0 and 0 < n <= LANE * LANE * LANE


@functools.partial(jax.jit, static_argnames=())
def _id(x):
    return x


# Rows per sequential grid step: bounds VMEM to a handful of [CHUNK,
# LANE] planes (a single whole-array block OOMs scoped VMEM at 2^20
# lanes) while keeping each step big enough to fill the VPU.
PREFIX_CHUNK = 1024


def _prefix_call(kernel, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    import math

    n = x.shape[0]
    rows = n // LANE
    chunk = math.gcd(rows, PREFIX_CHUNK)
    out = pl.pallas_call(
        functools.partial(kernel, rows=chunk),
        grid=(rows // chunk,),
        in_specs=[pl.BlockSpec((chunk, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((chunk, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(x.astype(jnp.float32).reshape(rows, LANE))
    return out.reshape(n)


def prefix_sum_f32(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix sum of a 1-D f32 array in one Pallas kernel."""
    if not _supported(x.shape[0]):
        return jax.lax.associative_scan(jnp.add, x)
    return _prefix_call(_prefix_sum_kernel, x, interpret)


def prefix_max_f32(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive running max of a 1-D f32 array in one Pallas kernel."""
    if not _supported(x.shape[0]):
        return jax.lax.associative_scan(jnp.maximum, x)
    return _prefix_call(_prefix_max_kernel, x, interpret)


# ---------------------------------------------------------------------------
# Affine scan (IIR feedback) — the whole recurrence in one launch
# ---------------------------------------------------------------------------
#
# y[i] = ff[i] - sum_j a_j[i] * y[i-1-j] is an affine map of the J-deep
# history vector h: h_i = A_i h_{i-1} + b_i with A_i in companion form.
# graph.CFilter's fast mode runs this as jax.lax.associative_scan over
# [N, J, J] matrices, which XLA fragments into ~150 unfused slice/pad
# kernels per block — measured as THE dominant cost of filtered voices
# (harmonica: 229 fusions, 17ms/block).  This kernel runs the entire scan
# in one launch: Kogge-Stone doubling over the lane axis, then the sublane
# axis, then a sequential grid over row-chunks with the running affine map
# carried in SMEM scratch (TPU grids execute in order, so the carry is
# race-free).  Matrix entries live as [rows, LANE] f32 planes; composition
# (A2 @ A1, A2 @ b1 + b2) is unrolled elementwise VPU arithmetic — no MXU
# (f32-exact matmuls compile pathologically slowly through Mosaic here).


def _identity_entry(j: int, k: int) -> float:
    return 1.0 if j == k else 0.0


def _affine_scan_kernel(a_ref, ff_ref, live_ref, h0_ref, o_ref, carry_ref,
                        *, rows: int, J: int):
    """One grid step: scan `rows` rows of the affine recurrence.

    a_ref    f32[J, rows, LANE]   feedback coefficients a_j[i]
    ff_ref   f32[rows, LANE]      feed-forward drive b[i] (first component)
    live_ref f32[rows, LANE]      1.0 on live lanes, 0.0 -> identity map
    h0_ref   f32[1, J]    (SMEM)  initial history [y[-1] ... y[-J]]
    o_ref    f32[J, rows, LANE]   h planes: o[j][i] = y[i-j]
    carry_ref f32[J, J+1] (SMEM)  running affine map over all prior tiles
    """
    @pl.when(pl.program_id(0) == 0)
    def _init_carry():
        for j in range(J):
            for k in range(J):
                carry_ref[j, k] = _identity_entry(j, k)
            carry_ref[j, J] = 0.0

    live = live_ref[:] != 0.0
    # Companion-form planes; dead lanes carry the identity map so they
    # pass state through unchanged (matches graph._feedback's masking).
    A = [[None] * J for _ in range(J)]
    b = [None] * J
    zeros = jnp.zeros((rows, LANE), jnp.float32)
    for k in range(J):
        A[0][k] = jnp.where(live, -a_ref[k],
                            _identity_entry(0, k))
    for j in range(1, J):
        for k in range(J):
            A[j][k] = jnp.where(live, _identity_entry(j - 1, k),
                                _identity_entry(j, k)) + zeros
    b[0] = jnp.where(live, ff_ref[:], 0.0)
    for j in range(1, J):
        b[j] = zeros

    def compose(Ac, bc, Ap, bp):
        """(cur) after (prev): returns (Ac @ Ap, Ac @ bp + bc)."""
        nA = [[None] * J for _ in range(J)]
        nb = [None] * J
        for j in range(J):
            accb = bc[j]
            for m in range(J):
                accb = accb + Ac[j][m] * bp[m]
            nb[j] = accb
            for k in range(J):
                acc = None
                for m in range(J):
                    t = Ac[j][m] * Ap[m][k]
                    acc = t if acc is None else acc + t
                nA[j][k] = acc
        return nA, nb

    def select(cond, X, Y):
        return jnp.where(cond, X, Y)

    # Within-row inclusive scan: lane-axis doubling.
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 1)
    k = 1
    while k < LANE:
        Ap = [[pltpu.roll(A[j][m], k, 1) for m in range(J)]
              for j in range(J)]
        bp = [pltpu.roll(b[j], k, 1) for j in range(J)]
        nA, nb = compose(A, b, Ap, bp)
        ok = col >= k
        A = [[select(ok, nA[j][m], A[j][m]) for m in range(J)]
             for j in range(J)]
        b = [select(ok, nb[j], b[j]) for j in range(J)]
        k *= 2

    # Exclusive row carry: sublane-axis doubling over row totals.
    rowi = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE), 0)
    tot_A = [[jnp.broadcast_to(A[j][m][:, LANE - 1:LANE], (rows, LANE))
              for m in range(J)] for j in range(J)]
    tot_b = [jnp.broadcast_to(b[j][:, LANE - 1:LANE], (rows, LANE))
             for j in range(J)]
    car_A = [[jnp.full((rows, LANE), _identity_entry(j, m), jnp.float32)
              for m in range(J)] for j in range(J)]
    car_b = [jnp.zeros((rows, LANE), jnp.float32) for _ in range(J)]
    k = 1
    while k < rows:
        ok = rowi >= k
        Ap = [[select(ok, pltpu.roll(tot_A[j][m], k, 0),
                      _identity_entry(j, m)) for m in range(J)]
              for j in range(J)]
        bp = [select(ok, pltpu.roll(tot_b[j], k, 0), 0.0)
              for j in range(J)]
        car_A, car_b = compose(car_A, car_b, Ap, bp)
        tot_A, tot_b = compose(tot_A, tot_b, Ap, bp)
        k *= 2

    # Fold the inter-tile carry (scalars from SMEM) under the row carry.
    c_A = [[carry_ref[j, m] for m in range(J)] for j in range(J)]
    c_b = [carry_ref[j, J] for j in range(J)]
    prev_A, prev_b = compose(car_A, car_b, c_A, c_b)
    # Full per-lane map = within-row map after the row/tile prefix.
    A, b = compose(A, b, prev_A, prev_b)

    # Apply to the initial history and emit all J components.
    for j in range(J):
        acc = b[j]
        for m in range(J):
            acc = acc + A[j][m] * h0_ref[0, m]
        o_ref[j] = acc

    # New inter-tile carry: the full map at the tile's last element.
    for j in range(J):
        for m in range(J):
            carry_ref[j, m] = A[j][m][rows - 1, LANE - 1]
        carry_ref[j, J] = b[j][rows - 1, LANE - 1]


# Rows per sequential grid step: bounds VMEM to (J^2+J+3) planes of
# [CHUNK, LANE] while keeping each step big enough to fill the VPU.
AFFINE_CHUNK = 256


def affine_scan_f32(a_rows: jnp.ndarray, ff: jnp.ndarray,
                    live: jnp.ndarray, h0: jnp.ndarray,
                    interpret: bool = False):
    """Scans y[i] = ff[i] - sum_j a_rows[i, j] * y[i-1-j] in one launch.

    a_rows f32[N, J]; ff f32[N]; live bool[N] (dead lanes pass history
    through unchanged); h0 f32[J] = [y[-1] ... y[-J]].
    Returns (h f32[N, J] with h[i, j] = y[i-j], hist f32[J] = final
    history [y[N-1] ... y[N-J]]), or None when the shape is unsupported
    (caller falls back to jax.lax.associative_scan).
    """
    n, J = a_rows.shape
    if n % LANE != 0 or J < 1 or J > 4:
        return None
    rows = n // LANE
    chunk = min(rows, AFFINE_CHUNK)
    if rows % chunk != 0:
        return None
    a_planes = a_rows.T.reshape(J, rows, LANE).astype(jnp.float32)
    ff2 = ff.reshape(rows, LANE).astype(jnp.float32)
    live2 = live.reshape(rows, LANE).astype(jnp.float32)
    h0_2d = h0.reshape(1, J).astype(jnp.float32)
    grid = (rows // chunk,)
    out = pl.pallas_call(
        functools.partial(_affine_scan_kernel, rows=chunk, J=J),
        grid=grid,
        in_specs=[
            pl.BlockSpec((J, chunk, LANE), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, J), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((J, chunk, LANE), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((J, rows, LANE), jnp.float32),
        scratch_shapes=[pltpu.SMEM((J, J + 1), jnp.float32)],
        interpret=interpret,
    )(a_planes, ff2, live2, h0_2d)
    h = out.reshape(J, n).T  # [N, J]
    hist = out[:, rows - 1, LANE - 1]  # [J] final history
    return h, hist


def pallas_available() -> bool:
    """True when running on a TPU backend where these kernels compile."""
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover
        return False
    kind = (getattr(dev, "device_kind", "") or "").lower()
    plat = (getattr(dev, "platform", "") or "").lower()
    return "tpu" in kind or plat in ("tpu",)
