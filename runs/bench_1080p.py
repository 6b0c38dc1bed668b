"""1080p pipeline benchmark (BASELINE target 2: 1080p denoised >= 60 FPS).

The reference's 1080p architecture is quarter-res simulation bound to the
camera (BindSimulationToCamera.cs:6 resolutionScale = 1/4) with the denoiser
cleaning the quarter-res lightmap and the display blit upscaling. Here the
whole frame is ONE jitted program:

  RBT trace at 480x272 (realtime profile; --photons/--bounce to change)
  -> resolve (scan + rotate-back)  -> HDR
  -> UNet denoise (channels-as-batch mono passes, bf16 params optional)
  -> 4x bilinear upsample to 1920x1088 -> Uchimura tonemap

Prints per-stage and fused ms/frame with the tunnel-RTT methodology of
bench.py (chained frames in one scan, single scalar fetch).

EVERY large array — rotated fields, GBuffer, scene, model weights — is
threaded through jit as an ARGUMENT. Closing over any of them bakes it into
the HLO as a constant and the tunnel's remote-compile endpoint rejects the
multi-hundred-MB payload (HTTP 413, runs/bench1080_f32.log round 1).

--pair benches the TRUE production frame (VERDICT r3 next #4) on the
NATIVE TRACER AXIS (round 5): ONE rbt_trace_frame(n_tracers=2) call traces
both tracers' photons in a combined batch into a tracer-major (2D, S, S)
source buffer (same total ray budget as the single-tracer mode, so the
non-denoised estimate has identical variance), ONE alternating grouped
resolve per frame refreshes tracer r%2's group (r//2)%K (so per-frame
resolve cost equals the single-tracer mode's; each tracer's partials
refresh at half cadence — the same bounded-lag trade grouped resolve
already makes), and the display runs AIAccelerator blend='auto' — one
batched UNet pass over the pair (engine.pipeline.denoise_pair_hdr),
per-frame k from nn.infer.blend_pair_symmetric, blended pair mean ->
upsample -> tonemap. --pair-seq keeps the round-4 two-sequential-traces
path as an ablation (36.5 ms vs this path, runs/bench1080_r4_pair.log).

bf16 display precision defaults from REALTIME_1080P.bf16_display (the
profile is the single source of truth); --f32 overrides for ablations.

Usage: python runs/bench_1080p.py [checkpoint.npz] [--f32] [--photons N]
         [--bounce N] [--bins D] [--frames N] [--pair|--pair-seq]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

from litbox_tpu.core.types import REALTIME_1080P as PROF

SIM_W, SIM_H = PROF.sim_width, PROF.sim_height
OUT_W, OUT_H = PROF.out_width, PROF.out_height


def arg(flag, default, cast=int):
    return cast(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default


# Defaults come from THE pinned production profile
# (litbox_tpu.core.types.REALTIME_1080P); flags exist for ablation sweeps
# only — headline numbers must use the defaults.
PHOTONS = arg("--photons", PROF.photons)
BOUNCE_PHOTONS = arg("--bounce", PROF.bounce_photons)
N_BINS = arg("--bins", PROF.n_bins)
FRAMES = arg("--frames", 5)
# Angular group-interleaved display resolve (tracers.RBTForwardIntegrator
# resolve_groups): each frame resolves bins d == t (mod K) at 1/K cost and
# composes K cached partial rates. 1 = full resolve every frame.
GROUPS = arg("--groups", PROF.resolve_groups)


def build():
    from litbox_tpu.core import luts
    from litbox_tpu.scene import SceneBuilder, rasterize
    from litbox_tpu.sim import rbt

    rng = np.random.default_rng(0)
    cloud = rng.uniform(0.0, 1.0, (256, 256)).astype(np.float32)
    for _ in range(3):
        cloud = (np.roll(cloud, 1, 0) + np.roll(cloud, -1, 0)
                 + np.roll(cloud, 1, 1) + np.roll(cloud, -1, 1) + cloud) / 5.0
    b = SceneBuilder(texture_size=256)
    b.add_point_light((SIM_W * 0.5, SIM_H * 0.55), radius=4.0,
                      color=(1.0, 0.85, 0.6), intensity=2.0, bounces=2)
    b.add_sprite((SIM_W / 2, SIM_H / 2), (SIM_W / 2, SIM_H / 2),
                 color=(1, 1, 1, 1), log_density=-1.0,
                 texture=np.stack([cloud] * 3 + [cloud], -1))
    scene = b.build(max_lights=2, max_shapes=2)
    gb = rasterize(scene, SIM_H, SIM_W)
    brdf = jnp.asarray(luts.brdf_lut())
    fields = rbt.precompute_rotated_fields(gb, n_bins=N_BINS)
    return scene, gb, brdf, fields


def measure_rtt() -> float:
    float(jnp.float32(1.0) + 1)
    return min(
        (lambda t0: (float(jnp.sin(jnp.float32(i))), time.perf_counter() - t0)[1])(
            time.perf_counter())
        for i in range(3))


def main():
    from litbox_tpu.nn.train import TrainConfig, Trainer, load_train_config
    from litbox_tpu.engine.pipeline import denoise_hdr
    from litbox_tpu.post.tonemap import UchimuraShape, tonemap_uchimura
    from litbox_tpu.sim import rbt
    from litbox_tpu.sim.oracle import to_hdr

    flag_values = {sys.argv[sys.argv.index(f) + 1]
                   for f in ("--photons", "--bounce", "--bins", "--frames",
                             "--groups", "--pad", "--unet", "--feats", "--reps")
                   if f in sys.argv}
    ckpt = next((a for a in sys.argv[1:] if not a.startswith("--")
                 and a not in flag_values), None)
    # Display precision defaults from the pinned profile (ADVICE r4 #3);
    # --f32 is the ablation override (--bf16 stays accepted for back-compat).
    use_bf16 = PROF.bf16_display and "--f32" not in sys.argv

    scene, gb, brdf, fields = build()
    # --rgb / --pad zeros / --unet / --feats: bench the realtime display
    # variant (one RGB UNet pass, zero padding, sized to the display budget)
    # with random weights before a checkpoint exists.
    tcfg = (load_train_config(ckpt) if ckpt
            else TrainConfig(transform=TransformConfig_default(),
                             rgb="--rgb" in sys.argv,
                             unet_size=arg("--unet", 5),
                             initial_features=arg("--feats", 32),
                             padding_mode=arg("--pad", "reflect", str)))
    trainer = Trainer(tcfg)
    if ckpt:
        trainer.load(ckpt)
        print("loaded", ckpt)
    variables = {"params": trainer.params, "batch_stats": trainer.batch_stats}
    if use_bf16:
        variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if isinstance(x, jnp.ndarray) and x.dtype == jnp.float32 else x,
            variables)
    model = trainer.model

    def denoise(hdr, model_vars):
        if use_bf16:
            hdr = hdr.astype(jnp.bfloat16)
        out = denoise_hdr(model, model_vars, hdr, tcfg.transform)
        return out.astype(jnp.float32)

    def upsample(x):  # (H, W, 3) -> (OUT_H, OUT_W, 3) bilinear
        return jax.image.resize(x, (OUT_H, OUT_W, 3), "bilinear")

    # All stages take their operands as ARGUMENTS (see module docstring).
    def trace(fields, src, gb, lights, field_textures, brdf, key):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, lights, field_textures, brdf, key,
            PHOTONS, jnp.int32(-1), max_bounces=2,
            bounce_photons=BOUNCE_PHOTONS, mc_direct=True,
            analytic_direct=False, enable_brdf=False, light_kinds=(1,),
            hist_direct=True)
        return src

    def resolve(fields, src):
        return rbt.resolve_raw(fields, src, SIM_H, SIM_W)

    def resolve_group(fields, src, cache, i):
        """One interleaved display resolve: refresh slot i%K of the cached
        (K, H, W, 3) group partials, return (new cache, composed raw)."""
        t = i % GROUPS
        part = jax.lax.switch(t, [
            (lambda f, s, g=g: rbt.resolve_raw(f, s, SIM_H, SIM_W,
                                               group=g, n_groups=GROUPS))
            for g in range(GROUPS)], fields, src)
        cache = jax.lax.dynamic_update_index_in_dim(cache, part, t, 0)
        return cache, cache.sum(0)

    def display(raw, iters, gb, model_vars):
        hdr = to_hdr(raw, iters, gb, finalize_outscatter=True)
        den = denoise(hdr, model_vars)
        return tonemap_uchimura(upsample(den) * 0.5, UchimuraShape())

    # per-stage timers. trace/resolve chain FRAMES times inside one jit;
    # display and the fused frame are single-call (a UNet inside lax.scan
    # produced a 20+ minute XLA compile) and timed by RTT subtraction.
    @jax.jit
    def trace_frames(fields, src, gb, lights, ftex, brdf, key):
        def body(src, i):
            return trace(fields, src, gb, lights, ftex, brdf,
                         jax.random.fold_in(key, i)), 0.0
        src, _ = jax.lax.scan(body, src, jnp.arange(FRAMES))
        return src[0][0, 0, 0]

    @jax.jit
    def resolve_frames(fields, src):
        # The 1-element carry-add forces a fresh resolve per iteration
        # (a loop-invariant src lets XLA hoist the whole resolve and the
        # stage reads amortized — round 1's "13.7 ms" artifact).
        cache0 = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))

        def body(carry, i):
            c, cache = carry
            srci = tuple(ch.at[0, 0, 0].add(c * 1e-30) for ch in src)
            if GROUPS > 1:
                cache, raw = resolve_group(fields, srci, cache, i)
            else:
                raw = resolve(fields, srci)
            return (c + raw[0, 0, 0], cache), 0.0
        (c, _), _ = jax.lax.scan(body, (jnp.float32(0.0), cache0),
                                 jnp.arange(FRAMES))
        return c

    @jax.jit
    def display_once(raw, gb, model_vars):
        return display(raw, jnp.float32(1.0), gb, model_vars)[0, 0, 0]

    # The fused frame is timed over FUSED_REPS UNROLLED frames chained
    # through the source accumulator (the actual production loop: trace ->
    # grouped resolve -> display each frame). Single-call RTT subtraction
    # has ~5 ms of tunnel noise; unrolling amortizes it. lax.scan is not an
    # option (a UNet inside scan compiled 20+ minutes round 1).
    FUSED_REPS = arg("--reps", 4)

    # --skip-trace / --skip-resolve / --skip-display: drop a stage from the
    # fused loop to attribute the fused-vs-stage-sum gap.
    SKIP_TRACE = "--skip-trace" in sys.argv
    SKIP_RESOLVE = "--skip-resolve" in sys.argv
    SKIP_DISPLAY = "--skip-display" in sys.argv

    @jax.jit
    def fused_frames(fields, src, cache, gb, lights, ftex, brdf, key,
                     model_vars):
        acc = jnp.float32(0.0)
        raw = jnp.zeros((SIM_H, SIM_W, 3))
        for r in range(FUSED_REPS):
            if not SKIP_TRACE:
                src = trace(fields, src, gb, lights, ftex, brdf,
                            jax.random.fold_in(key, r))
            if SKIP_RESOLVE:
                raw = raw + src[0][0, :SIM_H, :SIM_W, None] * 1e-30
            elif GROUPS > 1:
                cache, raw = resolve_group(fields, src, cache, jnp.int32(r))
            else:
                raw = resolve(fields, src)
            if SKIP_DISPLAY:
                acc = acc + raw[0, 0, 0]
            else:
                # Benchmark-only: with GROUPS>1 the cache slots were resolved
                # at different accumulation counts, so dividing by r+1 makes
                # per-frame brightness inconsistent (timing unaffected; the
                # tracer normalizes each partial by its resolve-time count).
                acc = acc + display(raw, jnp.float32(r + 1.0), gb,
                                    model_vars)[0, 0, 0]
        return acc

    # PIPELINED: the production realtime loop — ONE jitted frame-step
    # (trace -> grouped resolve -> display), dispatched once per frame with
    # NO host sync between frames (Simulation.step + lazy display read), a
    # single scalar fetch at the end. Dispatches queue through the async
    # tunnel and execute back-to-back on device, so XLA's cross-dispatch
    # pipelining matches lax.scan's (the unrolled FUSED program loses ~2x on
    # the trace stage to scan — see bench1080_r3_skip*.log) while donation
    # keeps src/cache in place like a scan carry.
    @functools.partial(jax.jit, donate_argnames=("src", "cache"))
    def frame_step(fields, src, cache, gb, lights, ftex, brdf, key, r,
                   model_vars):
        src = trace(fields, src, gb, lights, ftex, brdf, key)
        if GROUPS > 1:
            cache, raw = resolve_group(fields, src, cache, r)
        else:
            raw = resolve(fields, src)
        pix = display(raw, (r + 1).astype(jnp.float32), gb, model_vars)[0, 0, 0]
        return src, cache, pix

    def pipelined_frames(n_frames: int) -> float:
        src = rbt.zero_sources(fields)
        cache = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
        key = jax.random.key(7)
        # warm (compile) + drain
        src, cache, pix = frame_step(fields, src, cache, gb, lights, ftex,
                                     brdf, key, jnp.int32(0), variables)
        float(pix)
        t0 = time.perf_counter()
        for r in range(1, n_frames + 1):
            src, cache, pix = frame_step(
                fields, src, cache, gb, lights, ftex, brdf,
                jax.random.fold_in(key, r), jnp.int32(r), variables)
        float(pix)  # the only host sync: forces the whole dispatch chain
        return (time.perf_counter() - t0 - rtt) / n_frames

    # ---- TRUE production frame, NATIVE TRACER AXIS (round 5) ----
    # One combined trace call (n_tracers=2, full PHOTONS/BOUNCE budget
    # split internally), tracer-major (2D, S, S) sources, ONE alternating
    # grouped resolve per frame. See module docstring.
    def trace_pair(fields, src2, gb, lights, ftex, brdf, key):
        src2, _ = rbt.rbt_trace_frame(
            fields, src2, gb, lights, ftex, brdf, key,
            PHOTONS, jnp.int32(-1), max_bounces=2,
            bounce_photons=BOUNCE_PHOTONS, mc_direct=True,
            analytic_direct=False, enable_brdf=False, light_kinds=(1,),
            hist_direct=True, n_tracers=2)
        return src2

    def resolve_group_pair(fields, src2, cache, i):
        """Refresh ONE (tracer, group) partial: tracer i%2, group (i//2)%K.
        cache is (2, K, H, W, 3); returns (cache, raw_a, raw_b)."""
        slot = i % (2 * GROUPS)
        part = jax.lax.switch(slot, [
            (lambda f, s, t=t, g=g: rbt.resolve_raw(
                f, s, SIM_H, SIM_W, group=g, n_groups=GROUPS, tracer=t))
            for g in range(GROUPS) for t in range(2)], fields, src2)
        t = slot % 2
        g = slot // 2
        cache = jax.lax.dynamic_update_slice(cache, part[None, None],
                                             (t, g, 0, 0, 0))
        return cache, cache[0].sum(0), cache[1].sum(0)

    @functools.partial(jax.jit, donate_argnames=("src2", "cache"))
    def frame_step_pair_native(fields, src2, cache, gb, lights, ftex, brdf,
                               key, r, model_vars):
        from litbox_tpu.nn.infer import (PRODUCTION_FLOOR_GATE, PRODUCTION_K_FLOOR, blend_pair_symmetric)

        src2 = trace_pair(fields, src2, gb, lights, ftex, brdf, key)
        if GROUPS > 1:
            cache, raw_a, raw_b = resolve_group_pair(fields, src2, cache, r)
        else:
            raw_a = rbt.resolve_raw(fields, src2, SIM_H, SIM_W, tracer=0)
            raw_b = rbt.resolve_raw(fields, src2, SIM_H, SIM_W, tracer=1)
        iters = (r + 1).astype(jnp.float32)
        hdr_a = to_hdr(raw_a, iters, gb, finalize_outscatter=True)
        hdr_b = to_hdr(raw_b, iters, gb, finalize_outscatter=True)
        out_a, out_b = denoise_pair(hdr_a, hdr_b, model_vars)
        disp, k = blend_pair_symmetric(out_a, out_b, hdr_a, hdr_b, k_floor=PRODUCTION_K_FLOOR, floor_gate=PRODUCTION_FLOOR_GATE)
        pix = tonemap_uchimura(upsample(disp) * 0.5,
                               UchimuraShape())[0, 0, 0]
        return src2, cache, pix + 0.0 * k

    # ---- FAST production pair frame (round 5, --pair-fast) ----
    # Three measured levers stacked on the native tracer axis:
    #   1. DEFERRED SCATTER: the per-frame scatter into the (2D, S, S)
    #      sources is full-target-copy bound (~5.2 ms; /tmp/prof_scatter_r5:
    #      cost tracks target bytes, not update count). Frames stage their
    #      deposit streams (rbt_frame_deposits) in a small (K, M) pending
    #      buffer (in-place dynamic_update_slice) and ONE scatter flushes K
    #      frames' worth every K-th frame — amortized ~2.4 ms. The display
    #      lags the newest <K frames of photons, the same bounded-staleness
    #      trade the grouped resolve already makes.
    #   2. Alternating per-tracer grouped resolve (as --pair).
    #   3. SINGLE-PASS DISPLAY with k ON A CADENCE: every CAL-th frame runs
    #      the batched pair UNet, displays the EXACT pair composition, and
    #      refreshes k; other frames run ONE UNet pass on the pair mean and
    #      display x + k*(net(x)-x). Measured quality-equivalent on every
    #      held-out tier (+1.18 vs +1.21 RT0; /tmp/eval_meanpass r5 log,
    #      table in NOTES_ROUND5.md).
    FLUSH_K = arg("--flush", 8)
    CAL = arg("--cal", 8)

    def frame_deposits(fields, gb, lights, ftex, brdf, key):
        return rbt.rbt_frame_deposits(
            fields, gb, lights, ftex, brdf, key,
            PHOTONS, jnp.int32(-1), max_bounces=2,
            bounce_photons=BOUNCE_PHOTONS, mc_direct=True,
            analytic_direct=False, enable_brdf=False, light_kinds=(1,),
            hist_direct=True, n_tracers=2)

    # key and r live IN the donated device carry: the host loop enqueues
    # zero new device data per frame (a per-frame host-side fold_in +
    # jnp.int32(r) is one extra dispatch + transfer each frame over the
    # ~27 ms-RTT tunnel; measured ~0.4 ms/frame of the pipelined figure).
    @functools.partial(jax.jit, donate_argnames=(
        "src2", "cache", "pend_flat", "pend_vals", "r"))
    def frame_step_pair_fast(fields, src2, cache, pend_flat, pend_vals,
                             k_prev, gb, lights, ftex, brdf, key, r,
                             model_vars):
        from litbox_tpu.nn.infer import (PRODUCTION_FLOOR_GATE, PRODUCTION_K_FLOOR, blend_pair_symmetric)

        frame_key = jax.random.fold_in(key, r)
        flat, vals, _ = frame_deposits(fields, gb, lights, ftex, brdf,
                                       frame_key)
        slot = r % FLUSH_K
        pend_flat = jax.lax.dynamic_update_index_in_dim(pend_flat, flat,
                                                        slot, 0)
        pend_vals = jax.lax.dynamic_update_index_in_dim(pend_vals, vals,
                                                        slot, 0)
        src2 = jax.lax.cond(
            slot == FLUSH_K - 1,
            lambda s: rbt._inject_flat(s, pend_flat.reshape(-1),
                                       pend_vals.reshape(-1, 3)),
            lambda s: s, src2)
        cache, raw_a, raw_b = resolve_group_pair(fields, src2, cache, r)
        iters = (r + 1).astype(jnp.float32)

        def calib(_):
            hdr_a = to_hdr(raw_a, iters, gb, finalize_outscatter=True)
            hdr_b = to_hdr(raw_b, iters, gb, finalize_outscatter=True)
            out_a, out_b = denoise_pair(hdr_a, hdr_b, model_vars)
            disp, k = blend_pair_symmetric(out_a, out_b, hdr_a, hdr_b, k_floor=PRODUCTION_K_FLOOR, floor_gate=PRODUCTION_FLOOR_GATE)
            return disp, k

        def fast(_):
            hdr_x = to_hdr((raw_a + raw_b) * 0.5, iters, gb,
                           finalize_outscatter=True)
            out_x = denoise(hdr_x, model_vars)
            return hdr_x + k_prev * (out_x - hdr_x), k_prev

        disp, k = jax.lax.cond(r % CAL == 0, calib, fast, 0)
        # The 4x upsample + tonemap touches 1920x1088x3 pixels — run it at
        # the profile's display precision (bf16_display), not f32: the
        # resize is bandwidth-bound and the tonemapped output is the final
        # displayed precision anyway.
        if use_bf16:
            disp = disp.astype(jnp.bfloat16)
        pix = tonemap_uchimura(upsample(disp) * 0.5,
                               UchimuraShape())[0, 0, 0]
        return src2, cache, pend_flat, pend_vals, k, r + 1, pix

    def pipelined_frames_pair_fast(n_frames: int) -> float:
        src2 = rbt.zero_sources(fields, n_tracers=2)
        cache = jnp.zeros((2, GROUPS, SIM_H, SIM_W, 3))
        key = jax.random.key(7)
        flat0, vals0, _ = jax.jit(frame_deposits)(fields, gb, lights, ftex,
                                                  brdf, key)
        m = flat0.shape[0]
        pend_flat = jnp.zeros((FLUSH_K, m), flat0.dtype)
        # Unwritten slots must be harmless: index 0 with value 0.
        pend_vals = jnp.zeros((FLUSH_K, m, 3))
        k = jnp.float32(0.5)
        r = jnp.int32(0)
        src2, cache, pend_flat, pend_vals, k, r, pix = frame_step_pair_fast(
            fields, src2, cache, pend_flat, pend_vals, k, gb, lights, ftex,
            brdf, key, r, variables)
        float(pix)
        t0 = time.perf_counter()
        for _ in range(n_frames):
            src2, cache, pend_flat, pend_vals, k, r, pix = frame_step_pair_fast(
                fields, src2, cache, pend_flat, pend_vals, k, gb, lights,
                ftex, brdf, key, r, variables)
        float(pix)
        return (time.perf_counter() - t0 - rtt) / n_frames

    def pipelined_frames_pair_native(n_frames: int) -> float:
        src2 = rbt.zero_sources(fields, n_tracers=2)
        cache = jnp.zeros((2, GROUPS, SIM_H, SIM_W, 3))
        key = jax.random.key(7)
        src2, cache, pix = frame_step_pair_native(
            fields, src2, cache, gb, lights, ftex, brdf, key,
            jnp.int32(0), variables)
        float(pix)
        t0 = time.perf_counter()
        for r in range(1, n_frames + 1):
            src2, cache, pix = frame_step_pair_native(
                fields, src2, cache, gb, lights, ftex, brdf,
                jax.random.fold_in(key, r), jnp.int32(r), variables)
        float(pix)
        return (time.perf_counter() - t0 - rtt) / n_frames

    # ---- round-4 sequential pair (ablation; --pair-seq) ----
    def trace_half(fields, src, gb, lights, ftex, brdf, key):
        src, _ = rbt.rbt_trace_frame(
            fields, src, gb, lights, ftex, brdf, key,
            PHOTONS // 2, jnp.int32(-1), max_bounces=2,
            bounce_photons=BOUNCE_PHOTONS // 2, mc_direct=True,
            analytic_direct=False, enable_brdf=False, light_kinds=(1,),
            hist_direct=True)
        return src

    def denoise_pair(a, b, model_vars):
        from litbox_tpu.engine.pipeline import denoise_pair_hdr

        if use_bf16:
            a16, b16 = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
        else:
            a16, b16 = a, b
        out_a, out_b = denoise_pair_hdr(model, model_vars, a16, b16,
                                        tcfg.transform)
        return out_a.astype(jnp.float32), out_b.astype(jnp.float32)

    @functools.partial(jax.jit, donate_argnames=(
        "src_a", "src_b", "cache_a", "cache_b"))
    def frame_step_pair(fields, src_a, src_b, cache_a, cache_b, gb, lights,
                        ftex, brdf, key, r, model_vars):
        from litbox_tpu.nn.infer import (PRODUCTION_FLOOR_GATE, PRODUCTION_K_FLOOR, blend_pair_symmetric)

        ka, kb = jax.random.split(key)
        src_a = trace_half(fields, src_a, gb, lights, ftex, brdf, ka)
        src_b = trace_half(fields, src_b, gb, lights, ftex, brdf, kb)
        if GROUPS > 1:
            cache_a, raw_a = resolve_group(fields, src_a, cache_a, r)
            cache_b, raw_b = resolve_group(fields, src_b, cache_b, r)
        else:
            raw_a = resolve(fields, src_a)
            raw_b = resolve(fields, src_b)
        iters = (r + 1).astype(jnp.float32)
        hdr_a = to_hdr(raw_a, iters, gb, finalize_outscatter=True)
        hdr_b = to_hdr(raw_b, iters, gb, finalize_outscatter=True)
        out_a, out_b = denoise_pair(hdr_a, hdr_b, model_vars)
        disp, k = blend_pair_symmetric(out_a, out_b, hdr_a, hdr_b, k_floor=PRODUCTION_K_FLOOR, floor_gate=PRODUCTION_FLOOR_GATE)
        pix = tonemap_uchimura(upsample(disp) * 0.5,
                               UchimuraShape())[0, 0, 0]
        return src_a, src_b, cache_a, cache_b, pix + 0.0 * k

    # --pair-vmap: identical math, but the two tracers' trace stage runs as
    # ONE vmapped XLA program over a stacked (2, ...) source pytree — the
    # pair mode's cost gap vs single-tracer is dominated by duplicated
    # fixed costs in two sequential trace graphs (36.5 vs 17.4 ms,
    # runs/bench1080_r4_pair.log), and batching lets XLA share/widen them.
    # Verified exactly equal to the sequential pair on CPU (bin-level 0.0
    # diff) before benching.
    @functools.partial(jax.jit, donate_argnames=(
        "src2", "cache_a", "cache_b"))
    def frame_step_pair_vmap(fields, src2, cache_a, cache_b, gb, lights,
                             ftex, brdf, key, r, model_vars):
        from litbox_tpu.nn.infer import (PRODUCTION_FLOOR_GATE, PRODUCTION_K_FLOOR, blend_pair_symmetric)

        keys = jnp.stack(jax.random.split(key))
        src2 = jax.vmap(
            lambda s, k: trace_half(fields, s, gb, lights, ftex, brdf, k)
        )(src2, keys)
        src_a = jax.tree.map(lambda x: x[0], src2)
        src_b = jax.tree.map(lambda x: x[1], src2)
        if GROUPS > 1:
            cache_a, raw_a = resolve_group(fields, src_a, cache_a, r)
            cache_b, raw_b = resolve_group(fields, src_b, cache_b, r)
        else:
            raw_a = resolve(fields, src_a)
            raw_b = resolve(fields, src_b)
        iters = (r + 1).astype(jnp.float32)
        hdr_a = to_hdr(raw_a, iters, gb, finalize_outscatter=True)
        hdr_b = to_hdr(raw_b, iters, gb, finalize_outscatter=True)
        out_a, out_b = denoise_pair(hdr_a, hdr_b, model_vars)
        disp, k = blend_pair_symmetric(out_a, out_b, hdr_a, hdr_b, k_floor=PRODUCTION_K_FLOOR, floor_gate=PRODUCTION_FLOOR_GATE)
        pix = tonemap_uchimura(upsample(disp) * 0.5,
                               UchimuraShape())[0, 0, 0]
        return src2, cache_a, cache_b, pix + 0.0 * k

    def pipelined_frames_pair_vmap(n_frames: int) -> float:
        src2 = jax.tree.map(lambda x: jnp.stack([x, x]),
                            rbt.zero_sources(fields))
        cache_a = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
        cache_b = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
        key = jax.random.key(7)
        src2, cache_a, cache_b, pix = frame_step_pair_vmap(
            fields, src2, cache_a, cache_b, gb, lights, ftex, brdf,
            key, jnp.int32(0), variables)
        float(pix)
        t0 = time.perf_counter()
        for r in range(1, n_frames + 1):
            src2, cache_a, cache_b, pix = frame_step_pair_vmap(
                fields, src2, cache_a, cache_b, gb, lights, ftex,
                brdf, jax.random.fold_in(key, r), jnp.int32(r), variables)
        float(pix)
        return (time.perf_counter() - t0 - rtt) / n_frames

    def pipelined_frames_pair(n_frames: int) -> float:
        src_a = rbt.zero_sources(fields)
        src_b = rbt.zero_sources(fields)
        cache_a = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
        cache_b = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
        key = jax.random.key(7)
        src_a, src_b, cache_a, cache_b, pix = frame_step_pair(
            fields, src_a, src_b, cache_a, cache_b, gb, lights, ftex, brdf,
            key, jnp.int32(0), variables)
        float(pix)
        t0 = time.perf_counter()
        for r in range(1, n_frames + 1):
            src_a, src_b, cache_a, cache_b, pix = frame_step_pair(
                fields, src_a, src_b, cache_a, cache_b, gb, lights, ftex,
                brdf, jax.random.fold_in(key, r), jnp.int32(r), variables)
        float(pix)
        return (time.perf_counter() - t0 - rtt) / n_frames

    rtt = measure_rtt()
    print(f"rtt {rtt*1000:.1f} ms  photons {PHOTONS} + {BOUNCE_PHOTONS} bounce, "
          f"bins {N_BINS}, bf16={use_bf16}", flush=True)
    src0 = rbt.zero_sources(fields)
    key = jax.random.key(0)
    lights, ftex = scene.lights, scene.field_textures

    if "--pair-vmap" in sys.argv:
        t_pv = min(pipelined_frames_pair_vmap(30) for _ in range(2))
        print(f"PAIR-VMAP PIPELINE (batched dual trace, auto-blend display): "
              f"{t_pv*1000:7.2f} ms/frame = {1.0/t_pv:.1f} FPS (target 60)",
              flush=True)
    if "--pair-prof" in sys.argv:
        # Stage attribution for the native pair frame: trace / resolve /
        # display timed separately with the same chaining methodology as
        # the single-tracer stage timers.
        @jax.jit
        def trace_pair_frames(fields, src2, gb, lights, ftex, brdf, key):
            def body(src2, i):
                return trace_pair(fields, src2, gb, lights, ftex, brdf,
                                  jax.random.fold_in(key, i)), 0.0
            src2, _ = jax.lax.scan(body, src2, jnp.arange(FRAMES))
            return src2[0][0, 0, 0]

        @jax.jit
        def resolve_pair_frames(fields, src2):
            cache0 = jnp.zeros((2, GROUPS, SIM_H, SIM_W, 3))

            def body(carry, i):
                c, cache = carry
                srci = tuple(ch.at[0, 0, 0].add(c * 1e-30) for ch in src2)
                cache, raw_a, raw_b = resolve_group_pair(fields, srci, cache, i)
                return (c + raw_a[0, 0, 0] + raw_b[0, 0, 0], cache), 0.0
            (c, _), _ = jax.lax.scan(body, (jnp.float32(0.0), cache0),
                                     jnp.arange(FRAMES))
            return c

        @jax.jit
        def display_pair_once(raw_a, raw_b, gb, model_vars):
            from litbox_tpu.nn.infer import (PRODUCTION_FLOOR_GATE, PRODUCTION_K_FLOOR, blend_pair_symmetric)

            hdr_a = to_hdr(raw_a, jnp.float32(1.0), gb, finalize_outscatter=True)
            hdr_b = to_hdr(raw_b, jnp.float32(1.0), gb, finalize_outscatter=True)
            out_a, out_b = denoise_pair(hdr_a, hdr_b, model_vars)
            disp, k = blend_pair_symmetric(out_a, out_b, hdr_a, hdr_b, k_floor=PRODUCTION_K_FLOOR, floor_gate=PRODUCTION_FLOOR_GATE)
            return tonemap_uchimura(upsample(disp) * 0.5,
                                    UchimuraShape())[0, 0, 0] + 0.0 * k

        def time_fn2(name, fn, *args, per_frame=FRAMES):
            float(fn(*args))
            float(fn(*args))
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(*args))
                best = min(best, time.perf_counter() - t0 - rtt)
            dt = best / per_frame
            print(f"{name}: {dt*1000:7.2f} ms/frame", flush=True)
            return dt

        src20 = rbt.zero_sources(fields, n_tracers=2)
        time_fn2("pair trace  ", trace_pair_frames, fields, src20, gb, lights,
                 ftex, brdf, key)
        src21 = jax.jit(functools.partial(trace_pair))(
            fields, rbt.zero_sources(fields, n_tracers=2), gb, lights, ftex,
            brdf, key)
        time_fn2("pair resolve", resolve_pair_frames, fields, src21)
        raw_a1 = rbt.resolve_raw(fields, src21, SIM_H, SIM_W, tracer=0)
        raw_b1 = rbt.resolve_raw(fields, src21, SIM_H, SIM_W, tracer=1)
        time_fn2("pair display", display_pair_once, raw_a1, raw_b1, gb,
                 variables, per_frame=1)
        return
    if "--pair-fast" in sys.argv:
        t_pf = min(pipelined_frames_pair_fast(32) for _ in range(2))
        print(f"PAIR-FAST PIPELINE (deferred scatter K={FLUSH_K}, "
              f"single-pass display, k-cadence {CAL}): "
              f"{t_pf*1000:7.2f} ms/frame = {1.0/t_pf:.1f} FPS (target 60)",
              flush=True)
        return
    if "--pair-seq" in sys.argv:
        t_pair = min(pipelined_frames_pair(30) for _ in range(2))
        print(f"PAIR-SEQ PIPELINE (r4 ablation: dual tracer "
              f"{PHOTONS//2}+{BOUNCE_PHOTONS//2} x2, auto-blend display): "
              f"{t_pair*1000:7.2f} ms/frame = "
              f"{1.0/t_pair:.1f} FPS (target 60)", flush=True)
        return
    if "--pair" in sys.argv:
        t_pair = min(pipelined_frames_pair_native(30) for _ in range(2))
        print(f"PAIR PIPELINE (native tracer axis: one trace of "
              f"{PHOTONS}+{BOUNCE_PHOTONS} over 2 tracers, alternating "
              f"grouped resolve, auto-blend display): "
              f"{t_pair*1000:7.2f} ms/frame = "
              f"{1.0/t_pair:.1f} FPS (target 60)", flush=True)
        return

    def time_fn(name, fn, *args, per_frame=FRAMES):
        float(fn(*args))
        float(fn(*args))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(*args))
            best = min(best, time.perf_counter() - t0 - rtt)
        dt = best / per_frame
        print(f"{name}: {dt*1000:7.2f} ms/frame", flush=True)
        return dt

    t_trace = time_fn("trace  ", trace_frames, fields, src0, gb, lights, ftex,
                      brdf, key)
    src1 = jax.jit(trace)(fields, src0, gb, lights, ftex, brdf, key)
    t_resolve = time_fn("resolve", resolve_frames, fields, src1)
    raw1 = jax.jit(resolve)(fields, src1)
    t_display = time_fn("display", display_once, raw1, gb, variables, per_frame=1)
    cache0 = jnp.zeros((GROUPS, SIM_H, SIM_W, 3))
    t_fused = time_fn("FUSED  ", fused_frames, fields, src0, cache0, gb,
                      lights, ftex, brdf, key, variables,
                      per_frame=FUSED_REPS)
    t_pipe = min(pipelined_frames(30) for _ in range(2))
    print(f"PIPELINE: {t_pipe*1000:7.2f} ms/frame", flush=True)
    fps = 1.0 / t_pipe
    print(f"1080p pipelined: {t_pipe*1000:.2f} ms/frame = {fps:.1f} FPS "
          f"(target 60; stages {t_trace*1e3:.1f}+{t_resolve*1e3:.1f}+{t_display*1e3:.1f}; "
          f"unrolled fused {t_fused*1000:.2f} ms)")


def TransformConfig_default():
    from litbox_tpu.nn.unet import TransformConfig

    return TransformConfig(normalize_input=True)


if __name__ == "__main__":
    main()
