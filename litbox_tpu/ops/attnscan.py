"""Pallas attenuation scan: the RBT per-row deposit recurrence in ONE pass.

Computes, independently per rotated-field row, the inclusive affine scan

    O[x] = t[x] * O[x-1] + src[x] * sqrt(t[x])

for all three color channels (the analytic line-integral deposit of
sim/rbt.attenuation_scan; reference estimator: WriteSample stratified
deposits, /root/reference/Assets/Resources/ForwardMonteCarlo.compute:121-128).

jax.lax.associative_scan lowers to ~2*log2(S) full passes over the (D, S, S)
state in HBM — measured 25 ms at S=640/D=128 (runs/prof_resolve.py), pure
bandwidth. This kernel instead runs the Hillis-Steele doubling ladder on
VMEM-resident tiles: HBM traffic is exactly one read of t, one read of each
src channel and one write of each deposit channel (1.47 GB at S=640/D=128,
~2 ms at v5e's ~800 GB/s).

The affine composition for segments L (earlier) then R (later) is
    A = A_R * A_L,  B = A_R * B_L + B_R
where a segment's (A, B) maps the incoming accumulator O to A*O + B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 128  # rows per grid step; 3 src + 3 out + t + ladder temps fit VMEM


def _scan_kernel_factory(width: int, n_steps: int):
    def kernel(t_ref, s0_ref, s1_ref, s2_ref, o0_ref, o1_ref, o2_ref):
        t = t_ref[0]
        sqrt_t = jnp.sqrt(t)
        lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
        outs = (o0_ref, o1_ref, o2_ref)
        for c, s_ref in enumerate((s0_ref, s1_ref, s2_ref)):
            a = t
            b = s_ref[0] * sqrt_t
            for k in range(n_steps):
                sh = 1 << k
                # left-neighbor state at distance sh (identity for x < sh)
                a_l = pltpu.roll(a, sh, axis=1)
                b_l = pltpu.roll(b, sh, axis=1)
                live = lane >= sh
                b = jnp.where(live, a * b_l, 0.0) + b
                a = jnp.where(live, a * a_l, a)
            outs[c][0] = b

    return kernel


@functools.partial(jax.jit, static_argnames=("group", "n_groups", "src_offset"))
def attenuation_scan_rows(t: jax.Array, src0: jax.Array, src1: jax.Array,
                          src2: jax.Array, group: int = 0,
                          n_groups: int = 1, src_offset: int = 0) -> tuple:
    """Per-row affine scan of 3 channels over (D, S, S) fields.

    Returns (dep0, dep1, dep2), each (D//n_groups, S, S) float32:
    dep[d, y, x] = sum_{k<=x} src[d, y, k]*sqrt(t[d, y, k]) * prod_{j in (k, x]} t[d, y, j].

    group/n_groups (static) scan ONLY the bins d == group (mod n_groups):
    the strided selection happens in the BlockSpec index_map, so the kernel
    reads exactly the group's blocks from HBM — no sliced-copy of the
    (D, S, S) inputs (a materialized `t[group::n_groups]` gather measured
    ~3 ms of the ~12 ms grouped resolve at S=640/D=128,
    runs/prof_groups.py vs prof_resolve6.py).

    src_offset (static): the src arrays may carry a LEADING TRACER AXIS
    flattened tracer-major to (T*D, S, S) while t stays (D, S, S) — the
    dual-tracer pair shares one set of rotated transport fields (same
    scene), so scanning tracer k's block means reading src blocks at
    src_offset = k*D while t blocks stay at the bin index. Pure index-map
    arithmetic; no sliced copy of the (T*D, S, S) sources.
    """
    d, rows, width = t.shape
    assert width % 128 == 0, width  # lane alignment for pltpu.roll
    assert d % n_groups == 0 and 0 <= group < n_groups
    assert src0.shape[0] >= src_offset + d
    dg = d // n_groups
    blk = ROW_BLOCK
    while rows % blk:
        blk //= 2
    n_steps = max(int(np.ceil(np.log2(width))), 1)
    kernel = _scan_kernel_factory(width, n_steps)
    t_spec = pl.BlockSpec((1, blk, width),
                          lambda i, j: (group + i * n_groups, j, 0))
    src_spec = pl.BlockSpec(
        (1, blk, width),
        lambda i, j: (src_offset + group + i * n_groups, j, 0))
    out_spec = pl.BlockSpec((1, blk, width), lambda i, j: (i, j, 0))
    out = pl.pallas_call(
        kernel,
        grid=(dg, rows // blk),
        in_specs=[t_spec] + [src_spec] * 3,
        out_specs=(out_spec, out_spec, out_spec),
        out_shape=tuple(jax.ShapeDtypeStruct((dg, rows, width), jnp.float32)
                        for _ in range(3)),
        interpret=jax.default_backend() != "tpu",
    )(t, src0, src1, src2)
    return out
