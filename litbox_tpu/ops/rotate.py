"""Batched image rotation via Pallas shear kernels.

Rotation decomposes into three shears (Paeth): R(t) = Sx(a) Sy(b) Sx(a)
with a = -tan(t/2), b = sin(t). A shear is a per-row 1-D resample with a
row-dependent fractional shift — on TPU that is two dynamic lane rolls and
a lerp per row, bandwidth-bound, where XLA's per-row dynamic-slice lowering
measured ~2 GB/s and a factorized tent-matmul costs P*S^2 MACs per bin.

Angles outside [-45, 45] degrees are handled by a quadrant pre-rotation
(jnp.rot90 layout ops). The batch axis carries a DIFFERENT angle per image
(the RBT engine's direction bins), with per-bin shear coefficients
scalar-prefetched into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_BLOCK = 8

# Static coefficient bounds of the Paeth decomposition: the quadrant
# pre-rotation leaves residual angles in [-45, 45] degrees, so
# |alpha| = |tan(res/2)| <= tan(22.5deg), |beta| = |sin(res)| <= sin(45deg).
# These bound the integer-shift span inside an 8-row block and hence the
# number of statically shifted copies each row selects among — the previous
# conservative bound of 1.0 cost 10 roll iterations per x-shear where the
# true residual range needs 6.
ALPHA_BOUND = 0.41422  # tan(pi/8) + eps
BETA_BOUND = 0.70712   # sin(pi/4) + eps


def _shear_math(coef, row0, row_div, elem_scale, n_texels, center, width,
                k_max, block):
    """Shared shear arithmetic: returns the sheared (ROW_BLOCK, width) f32
    block for rows [row0, row0+ROW_BLOCK) of an image whose per-row shift is
    coef * (row//row_div + 0.5 - center) texels along the lane axis."""
    lane_texel = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, width), 1) // elem_scale
    ss = []
    for r in range(ROW_BLOCK):
        rt = ((row0 + r) // row_div).astype(jnp.float32)
        ss.append(coef * (rt + 0.5 - center))
    s_vec = jnp.stack(ss).reshape(ROW_BLOCK, 1)
    i_vec = jnp.floor(s_vec).astype(jnp.int32)
    f_vec = s_vec - i_vec.astype(jnp.float32)
    base = jnp.minimum(i_vec[0, 0], i_vec[ROW_BLOCK - 1, 0])
    res = i_vec - base  # (8, 1) in [0, k_max)

    # Shifts must be non-negative: Mosaic's dynamic rotate mishandles
    # negative shifts on multi-vreg rows (observed off-by-128 lanes).
    rolled = pltpu.roll(block, (-base * elem_scale) % width, axis=1)

    acc = jnp.zeros((ROW_BLOCK, width), jnp.float32)
    src_texel = lane_texel + i_vec  # (8, W) sampled texel for v0
    valid0 = (src_texel >= 0) & (src_texel < n_texels)
    valid1 = (src_texel + 1 >= 0) & (src_texel + 1 < n_texels)
    for k in range(k_max + 1):
        shifted = pltpu.roll(rolled, (-k * elem_scale) % width, axis=1)
        w0 = jnp.where((res == k) & valid0, 1.0 - f_vec * jnp.ones((1, width)), 0.0)
        w1 = jnp.where((res == k - 1) & valid1, f_vec * jnp.ones((1, width)), 0.0)
        acc = acc + shifted.astype(jnp.float32) * (w0 + w1)
    return acc


def _super_rows(rows: int) -> int:
    """Rows per grid step: the largest power-of-two multiple of ROW_BLOCK
    dividing `rows`, capped at 128. Per-(8, W) blocks cost one grid step per
    1.9 k elements (~10k steps at S=640/D=128) and the per-step overhead
    dominated the kernel; super-blocks amortize it ~16x while keeping the
    8-row shear span (k_max) unchanged."""
    sup = ROW_BLOCK
    while sup < 128 and rows % (sup * 2) == 0:
        sup *= 2
    return sup


def _shear_kernel_factory(row_div: int, elem_scale: int, n_texels: int,
                          center: float, width: int, k_max: int, n_sub: int):
    def kernel(coef_ref, img_ref, out_ref):
        # Per-row shifts; within an 8-row sub-block they span at most k_max
        # texels, so each sub-block is rolled ONCE by the common base and
        # each row selects among k_max statically shifted copies — all
        # (8, W) vector ops (per-row (1, W) rolls waste 7/8 of the
        # sublanes). n_sub sub-blocks are processed per grid step.
        d = pl.program_id(0)
        jsup = pl.program_id(1)
        coef = coef_ref[d]
        for sub in range(n_sub):
            row0 = (jsup * n_sub + sub) * ROW_BLOCK
            acc = _shear_math(coef, row0, row_div, elem_scale, n_texels,
                              center, width, k_max,
                              img_ref[0, sub * ROW_BLOCK:(sub + 1) * ROW_BLOCK])
            out_ref[0, sub * ROW_BLOCK:(sub + 1) * ROW_BLOCK] = acc.astype(out_ref.dtype)

    return kernel


def _shear_reduce_kernel_factory(row_div: int, elem_scale: int, n_texels: int,
                                 center: float, width: int, k_max: int,
                                 row_off: int, n_sub: int, n_per: int):
    def kernel(coef_ref, img_ref, out_ref):
        # Grid is (row_superblocks, N) with N innermost: the output block
        # stays VMEM-resident while every bin of a group accumulates into
        # it, so each summed image is written to HBM ONCE instead of one
        # full (N, R, W) write plus a full re-read by a separate reduction.
        # With n_per < N the batch is G = N/n_per groups (planar channels)
        # and the output block advances per group.
        j = pl.program_id(0)
        d = pl.program_id(1)
        coef = coef_ref[d]
        first = d % n_per == 0
        for sub in range(n_sub):
            lo = sub * ROW_BLOCK
            acc = _shear_math(coef, row_off + j * n_sub * ROW_BLOCK + lo,
                              row_div, elem_scale, n_texels, center, width,
                              k_max, img_ref[0, lo:lo + ROW_BLOCK])

            @pl.when(first)
            def _():
                out_ref[0, lo:lo + ROW_BLOCK] = acc.astype(out_ref.dtype)

            @pl.when(jnp.logical_not(first))
            def _():
                out_ref[0, lo:lo + ROW_BLOCK] = (out_ref[0, lo:lo + ROW_BLOCK]
                                                 + acc.astype(out_ref.dtype))

    return kernel


@functools.partial(jax.jit, static_argnames=("row_div", "elem_scale",
                                             "n_texels", "coef_bound"))
def shear(img: jax.Array, coef: jax.Array, row_div: int, elem_scale: int,
          n_texels: int, coef_bound: float = 1.0) -> jax.Array:
    """out[d, r, l] = img[d, r, l + round-interp(coef[d] * (r//row_div + .5 - c))].

    img (D, R, W); the shift axis is the lane axis in units of `elem_scale`
    lanes per texel (3 for channel-interleaved x shears, 1 otherwise).
    coef_bound is a STATIC bound on max |coef| — it sets the number of
    shifted copies in the kernel's inner loop.
    """
    d, rows, width = img.shape
    assert rows % ROW_BLOCK == 0, rows
    pad = (-width) % 128  # tpu.dynamic_rotate requires 128-aligned lanes
    if pad:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, pad)))
    k_max = int(np.ceil(ROW_BLOCK * coef_bound / row_div)) + 1
    sup = _super_rows(rows)
    kernel = _shear_kernel_factory(row_div, elem_scale, n_texels,
                                   n_texels / 2.0, width + pad, k_max,
                                   sup // ROW_BLOCK)
    wp = width + pad
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(d, rows // sup),
        in_specs=[pl.BlockSpec((1, sup, wp), lambda i, j, c: (i, j, 0))],
        out_specs=pl.BlockSpec((1, sup, wp), lambda i, j, c: (i, j, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
        interpret=jax.default_backend() != "tpu",
    )(coef, img)
    return out[..., :width] if pad else out


@functools.partial(jax.jit, static_argnames=("row_div", "elem_scale",
                                             "n_texels", "coef_bound",
                                             "row_lo", "row_hi", "groups"))
def shear_reduce(img: jax.Array, coef: jax.Array, row_div: int,
                 elem_scale: int, n_texels: int, coef_bound: float,
                 row_lo: int, row_hi: int, groups: int = 1) -> jax.Array:
    """Final-pass shear: apply each image's shear to rows [row_lo, row_hi)
    only and SUM over the batch (bin) axis in-kernel. Returns
    (groups, row_hi - row_lo, W) summed per contiguous group of N/groups
    images (groups=3 is the planar-channel display path), or
    (row_hi - row_lo, W) for groups=1. row_lo/row_hi must be
    ROW_BLOCK-aligned."""
    d, rows, width = img.shape
    assert row_lo % ROW_BLOCK == 0 and row_hi % ROW_BLOCK == 0
    assert 0 <= row_lo < row_hi <= rows and d % groups == 0
    n_per = d // groups
    pad = (-width) % 128
    if pad:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, pad)))
    k_max = int(np.ceil(ROW_BLOCK * coef_bound / row_div)) + 1
    wp = width + pad
    # Super-block size must divide both the range and the start offset.
    sup = ROW_BLOCK
    while (sup < 128 and (row_hi - row_lo) % (sup * 2) == 0
           and row_lo % (sup * 2) == 0):
        sup *= 2
    kernel = _shear_reduce_kernel_factory(row_div, elem_scale, n_texels,
                                          n_texels / 2.0, wp, k_max, row_lo,
                                          sup // ROW_BLOCK, n_per)
    nblk = (row_hi - row_lo) // sup
    lo_blk = row_lo // sup
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblk, d),
        in_specs=[pl.BlockSpec((1, sup, wp),
                               lambda j, i, c: (i, j + lo_blk, 0))],
        out_specs=pl.BlockSpec((1, sup, wp),
                               lambda j, i, c: (i // n_per, j, 0)),
    )
    out = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((groups, row_hi - row_lo, wp),
                                       jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(coef, img)
    out = out[..., :width] if pad else out
    return out if groups > 1 else out[0]


def _shear_pipeline(pre: jax.Array, alpha: jax.Array, beta: jax.Array,
                    d: int, s: int, c: int,
                    reduce_rows: tuple[int, int] | None):
    """Three-shear pipeline over pre-quadrant-rotated images.

    reduce_rows=(row_lo, row_hi) fuses the final x-shear with the sum over
    the bin axis and restricts it to output rows [row_lo, row_hi) — the
    rotate-back display path only needs the central H rows, and summing
    in-kernel saves a full (D, S, S, C) HBM round-trip.
    """
    flat = pre.reshape(d, s, s * c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s,
                 coef_bound=ALPHA_BOUND)
    # Vertical shear: transpose so y is the lane axis.
    t = flat.reshape(d, s, s, c).transpose(0, 2, 3, 1).reshape(d, s * c, s)
    t = shear(t, beta, row_div=c, elem_scale=1, n_texels=s,
              coef_bound=BETA_BOUND)
    flat = t.reshape(d, s, c, s).transpose(0, 3, 1, 2).reshape(d, s, s * c)
    if reduce_rows is not None:
        lo, hi = reduce_rows
        out = shear_reduce(flat, alpha, row_div=1, elem_scale=c, n_texels=s,
                           coef_bound=ALPHA_BOUND, row_lo=lo, row_hi=hi)
        return out.reshape(hi - lo, s, c)
    flat = shear(flat, alpha, row_div=1, elem_scale=c, n_texels=s,
                 coef_bound=ALPHA_BOUND)
    return flat.reshape(d, s, s, c)


def rotate_bins(images: jax.Array, angles: jax.Array,
                reduce_rows: tuple[int, int] | None = None) -> jax.Array:
    """Rotate each (S, S, C) image in (D, S, S, C) by its own angle:
    out[d][p] = images[d][R(angles[d]) (p - c) + c], zero outside.

    With reduce_rows=(lo, hi): returns sum_d out[d][lo:hi] as (hi-lo, S, C)
    (the fused rotate-and-accumulate display path)."""
    d, s, s2, c = images.shape
    assert s == s2 and s % ROW_BLOCK == 0

    # Quadrant pre-rotation: sampling with R(t) = R(tr) R90^k means first
    # re-laying the image by R90^k (a rot90 of the array), then the residual.
    k = jnp.round(angles / (np.pi / 2)).astype(jnp.int32) % 4
    residual = angles - jnp.round(angles / (np.pi / 2)) * (np.pi / 2)

    rots = [images,
            jnp.rot90(images, 1, axes=(1, 2)),
            jnp.rot90(images, 2, axes=(1, 2)),
            jnp.rot90(images, 3, axes=(1, 2))]
    sel = jnp.stack(rots)  # (4, D, S, S, C)
    pre = jnp.take_along_axis(sel, k[None, :, None, None, None], axis=0)[0]

    alpha = -jnp.tan(residual / 2.0)
    beta = jnp.sin(residual)
    return _shear_pipeline(pre, alpha, beta, d, s, c, reduce_rows)


def rotate_bins_uniform(images: jax.Array, angles: tuple,
                        reduce_rows: tuple[int, int] | None = None) -> jax.Array:
    """rotate_bins with STATIC per-image angles: the quadrant pre-rotation
    becomes static group slices + rot90 (the traced-angle version stacks 4
    full copies and gathers — ~x4 memory traffic)."""
    d, s, s2, c = images.shape
    assert s == s2 and s % ROW_BLOCK == 0 and len(angles) == d

    ks = [int(round(a / (np.pi / 2))) % 4 for a in angles]
    residual = [a - round(a / (np.pi / 2)) * (np.pi / 2) for a in angles]

    groups = []
    start = 0
    for i in range(1, d + 1):
        if i == d or ks[i] != ks[start]:
            groups.append((start, i, ks[start]))
            start = i
    pre = jnp.concatenate([
        jnp.rot90(images[a:b], k, axes=(1, 2)) if k else images[a:b]
        for a, b, k in groups], axis=0)

    alpha = jnp.asarray([-np.tan(t / 2.0) for t in residual], jnp.float32)
    beta = jnp.asarray([np.sin(t) for t in residual], jnp.float32)
    return _shear_pipeline(pre, alpha, beta, d, s, c, reduce_rows)


def _shear_block_dyn(coef, row0, block, s: int, center: float):
    """Sheared (ROW_BLOCK, s) block with a DYNAMIC tap count.

    out[r, l] = lerp(block[r, l + i_r], block[r, l + i_r + 1], f_r) with
    s_r = coef * (row0 + r + 0.5 - center), i_r = floor(s_r), f_r = frac;
    zero where the source texel falls outside [0, s).

    Two optimizations over _shear_math (the static-bound kernel):
      * the shifted-copy loop runs to the block's ACTUAL shift span + 2
        (a traced fori_loop bound) instead of the static worst case — the
        average bin's |coef| is half the bound, so the average block needs
        ~3 iterations where the static loop always pays 6-9;
      * per-iteration work is one roll + two (row-broadcast) multiply-adds
        into separate accumulators per tap; boundary validity is applied
        ONCE per block after the loop instead of twice per iteration.
    """
    rvec = row0 + jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, 1), 0)
    svec = coef * (rvec.astype(jnp.float32) + 0.5 - center)
    ivec = jnp.floor(svec).astype(jnp.int32)
    fvec = svec - ivec.astype(jnp.float32)
    base = jnp.min(ivec)
    res = ivec - base
    rolled = pltpu.roll(block, (-base) % s, axis=1)

    def body(k, accs):
        acc0, acc1 = accs
        shifted = pltpu.roll(rolled, (-k) % s, axis=1)
        a0 = jnp.where(res == k, 1.0 - fvec, 0.0)
        a1 = jnp.where(res == k - 1, fvec, 0.0)
        return acc0 + shifted * a0, acc1 + shifted * a1

    zero = jnp.zeros((ROW_BLOCK, s), jnp.float32)
    acc0, acc1 = jax.lax.fori_loop(jnp.int32(0), jnp.max(res) + 2, body,
                                   (zero, zero))
    lanes = jax.lax.broadcasted_iota(jnp.int32, (ROW_BLOCK, s), 1)
    src0 = lanes + ivec
    valid0 = (src0 >= 0) & (src0 < s)
    valid1 = (src0 >= -1) & (src0 < s - 1)
    return jnp.where(valid0, acc0, 0.0) + jnp.where(valid1, acc1, 0.0)


def _rot3sum_kernel_factory(s: int, run_starts: tuple, nblk: int):
    """Whole-image fused 3-shear rotation + in-kernel sum over a bin run.

    Per grid step (one bin): x-shear the VMEM-resident (S, S) image into
    scratch, transpose, y-shear, transpose back, final x-shear accumulated
    into the run's output block. The separate-pass pipeline pays 3
    compute-bound kernel round-trips plus 2 HBM transposes; here the image
    never leaves VMEM between shears.
    """
    center = s / 2.0

    def kernel(alpha_ref, beta_ref, img_ref, out_ref, t1, t2):
        d = pl.program_id(0)
        a = alpha_ref[d]
        b = beta_ref[d]
        first = d == run_starts[0]
        for st in run_starts[1:]:
            first = jnp.logical_or(first, d == st)

        def pass1(i, _):
            ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
            t1[pl.ds(ro, ROW_BLOCK), :] = _shear_block_dyn(
                a, ro, img_ref[0, pl.ds(ro, ROW_BLOCK), :], s, center)
            return 0

        jax.lax.fori_loop(0, nblk, pass1, 0)
        t2[:] = jnp.swapaxes(t1[:], 0, 1)

        def pass2(i, _):
            ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
            t1[pl.ds(ro, ROW_BLOCK), :] = _shear_block_dyn(
                b, ro, t2[pl.ds(ro, ROW_BLOCK), :], s, center)
            return 0

        jax.lax.fori_loop(0, nblk, pass2, 0)
        t2[:] = jnp.swapaxes(t1[:], 0, 1)

        def pass3(i, _):
            ro = pl.multiple_of(i * ROW_BLOCK, ROW_BLOCK)
            v = _shear_block_dyn(a, ro, t2[pl.ds(ro, ROW_BLOCK), :], s, center)

            @pl.when(first)
            def _():
                out_ref[0, pl.ds(ro, ROW_BLOCK), :] = v

            @pl.when(jnp.logical_not(first))
            def _():
                out_ref[0, pl.ds(ro, ROW_BLOCK), :] = (
                    out_ref[0, pl.ds(ro, ROW_BLOCK), :] + v)

            return 0

        jax.lax.fori_loop(0, nblk, pass3, 0)

    return kernel


# VMEM budget of the fused kernel: img block (x2 pipeline) + 2 scratch
# planes + out block (x2) = ~7 plane buffers of S*S*4 bytes.
FUSED_VMEM_LIMIT = 14 * 1024 * 1024


def rotate_planar_sum_fused(channels: tuple, base_angles: tuple,
                            delta) -> jax.Array:
    """Fused planar rotate-and-accumulate: sum_d R(base_angles[d] + delta)
    applied to image d of each channel plane; returns (C, S, S).

    NOT the production resolve path: measured SLOWER than the batched
    quadrant-run pipeline (rotate_planar_sum) once single-element-index DCE
    artifacts were removed from the profile — 53.3 vs 32.9 ms full bins,
    14.0 vs 8.2 ms at 1/4 bins at S=640/D=128 (runs/prof_resolve6.py). The
    per-channel pallas_call repeats the two whole-image in-VMEM transposes
    three times (once per channel), which the batched pipeline amortizes.
    Kept as the VMEM-resident reference implementation for arbitrary traced
    deltas with zero static-bound widening.

    The kernel computes per-quadrant-run partial sums WITHOUT the rot90
    pre-rotation of rotate_planar_sum; the epilogue applies rot90 to the
    R <= 5 run partials instead (rotations about a common center commute,
    so R(res) then rot90 equals rot90 then R(res) up to bilinear
    interpolation order — validated against the dense rotation reference
    in tests/test_pallas_ops.py).

    No static coefficient bound exists (tap counts are dynamic), so any
    traced `delta` works with zero extra cost.
    """
    c = len(channels)
    d, s, s2 = channels[0].shape
    assert s == s2 and s % ROW_BLOCK == 0 and s % 128 == 0
    assert len(base_angles) == d
    groups = _quadrant_groups(base_angles)
    base_res = np.asarray(
        [a - round(a / (np.pi / 2)) * (np.pi / 2) for a in base_angles],
        np.float32)
    residual = jnp.asarray(base_res) + jnp.asarray(delta, jnp.float32)
    alpha = -jnp.tan(residual / 2.0)
    beta = jnp.sin(residual)
    run_starts = tuple(g[0] for g in groups)

    def out_index(i, a_, b_):
        r = jnp.int32(0)
        for st in run_starts[1:]:
            r = r + (i >= st).astype(jnp.int32)
        return (r, 0, 0)

    kernel = _rot3sum_kernel_factory(s, run_starts, s // ROW_BLOCK)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(d,),
        in_specs=[pl.BlockSpec((1, s, s), lambda i, a_, b_: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, s, s), out_index),
        scratch_shapes=[pltpu.VMEM((s, s), jnp.float32),
                        pltpu.VMEM((s, s), jnp.float32)],
    )
    outs = []
    for ch in channels:
        parts = pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((len(groups), s, s), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(alpha, beta, ch)
        total = jnp.zeros((s, s), jnp.float32)
        for ri, (_, _, k) in enumerate(groups):
            part = parts[ri]
            total = total + (jnp.rot90(part, k, axes=(0, 1)) if k else part)
        outs.append(total)
    return jnp.stack(outs, 0)


def _quadrant_groups(angles) -> list:
    """Contiguous runs of equal quadrant index k = round(a / 90deg) % 4.
    RBT bin angles are monotonic, so runs stay contiguous and concatenation
    preserves bin order."""
    ks = [int(round(a / (np.pi / 2))) % 4 for a in angles]
    groups, start = [], 0
    for i in range(1, len(angles) + 1):
        if i == len(angles) or ks[i] != ks[start]:
            groups.append((start, i, ks[start]))
            start = i
    return groups


def rotate_planar_sum(channels: tuple, base_angles: tuple, delta,
                      max_delta: float, row_lo: int, row_hi: int) -> jax.Array:
    """Planar-channel rotate-and-accumulate: the RBT display resolve path.

    channels: C arrays of (D, S, S), one per color plane (the Pallas
    attenuation scan's native outputs — no channel-interleave pass needed).
    Image d of every channel rotates by base_angles[d] + delta, all results
    sum over d per channel, restricted to output rows [row_lo, row_hi).
    Returns (C, row_hi - row_lo, S).

    base_angles are STATIC: the quadrant pre-rotation is resolved at trace
    time to contiguous rot90 slices (2D-minor transposes — the channel-last
    rot90 of rotate_bins measured 11.7 ms of a 33 ms rotate at S=640/D=128,
    runs/prof_rotate.py). The traced scalar `delta` (|delta| <= max_delta,
    e.g. the per-frame jitter phase * 2pi/D) folds into the shear residuals,
    whose static coefficient bounds widen by max_delta — so a jittered fan
    costs the same as the static one instead of the 4-copy gather
    pre-rotation of rotate_bins."""
    c = len(channels)
    d, s, s2 = channels[0].shape
    assert s == s2 and len(base_angles) == d
    groups = _quadrant_groups(base_angles)
    base_res = np.asarray(
        [a - round(a / (np.pi / 2)) * (np.pi / 2) for a in base_angles],
        np.float32)
    residual = jnp.asarray(base_res) + jnp.asarray(delta, jnp.float32)
    a_bound = float(np.tan((np.pi / 4 + max_delta) / 2.0)) + 1e-4
    b_bound = float(np.sin(min(np.pi / 4 + max_delta, np.pi / 2))) + 1e-4

    pre = jnp.concatenate([
        jnp.rot90(ch[a:b], k, axes=(1, 2)) if k else ch[a:b]
        for ch in channels for a, b, k in groups], axis=0)  # (C*D, S, S)

    alpha = jnp.tile(-jnp.tan(residual / 2.0), c)
    beta = jnp.tile(jnp.sin(residual), c)
    flat = shear(pre, alpha, row_div=1, elem_scale=1, n_texels=s,
                 coef_bound=a_bound)
    t = flat.transpose(0, 2, 1)
    t = shear(t, beta, row_div=1, elem_scale=1, n_texels=s,
              coef_bound=b_bound)
    flat = t.transpose(0, 2, 1)
    return shear_reduce(flat, alpha, row_div=1, elem_scale=1, n_texels=s,
                        coef_bound=a_bound, row_lo=row_lo, row_hi=row_hi,
                        groups=c)
