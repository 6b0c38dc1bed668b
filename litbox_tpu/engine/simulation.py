"""Simulation frame loop (reference: Assets/Scripts/Simulation/Simulation.cs).

Dual-tracer driver: two independent tracer instances per frame purely to
estimate temporal variance (Simulation.cs:78), realtime vs reference modes,
profile loading, dirty-scene invalidation, convergence-threshold stopping,
importance-map refresh scheduling, and perf counters. The data-dependent
"run until converged" loop stays host-side with a scalar readback every
`measurement_interval` frames (mirroring the async GPU readback pattern,
Simulation.cs:434-438, 469-493) while every per-frame kernel is jitted.
"""

from __future__ import annotations

import dataclasses
import enum
import time
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.types import GBuffer, SimulationProfile
from ..post.tracer_post import compute_cv_and_mips, importance_pyramid, measure_convergence
from ..scene.gbuffer import rasterize
from ..scene.scene import Scene
from ..sim.tracers import HybridTracer, LightTransportTracer


def _pytree_equal(a, b) -> bool:
    import numpy as np

    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    if ta != tb or len(la) != len(lb):
        return False
    return all(x is y or np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(la, lb))


def _substrate_unchanged(prev, scene) -> bool:
    """True when nothing that feeds the GBuffer rasterizer differs."""
    return (_pytree_equal(prev.shapes, scene.shapes)
            and _pytree_equal(prev.textures, scene.textures))


class Strategy(enum.Enum):
    LIGHT_TRANSPORT = "light_transport"
    HYBRID = "hybrid"


class Mode(enum.Enum):
    REALTIME = "realtime"
    REFERENCE = "reference"


@dataclasses.dataclass
class Simulation:
    width: int = 256
    height: int = 256
    strategy: Strategy = Strategy.LIGHT_TRANSPORT
    mode: Mode = Mode.REALTIME
    rays_per_frame: int = 65536
    photon_bounces: int = -1
    integration_interval: float = 0.1
    frame_limit: int = -1
    convergence_threshold: float = -1.0
    measurement_interval: int = 100
    seed: int = 0
    # 'rbt' (production), 'oracle' (reference semantics), or 'rbt-paired'
    # (round 5: both variance tracers in ONE combined RBT trace per frame —
    # the native tracer axis; LIGHT_TRANSPORT only).
    engine: str = "rbt"
    # Hybrid-strategy forward->backward refresh cadence: 1 = reference
    # cadence (HybridTracer.cs:17, backward re-reads the forward HDR every
    # frame); REALTIME mode opts into 4 to amortize the RBT resolve unless
    # set explicitly (tracers.HybridTracer docstring).
    forward_refresh_interval: int | None = None

    def __post_init__(self):
        self._tracers = None
        self._strategy_built = None
        self._scene: Scene | None = None
        self._gbuffer: GBuffer | None = None
        self._dirty = True
        self._lights_dirty = False
        self._scene_id = 0
        self.iterations_since_clear = 0
        self.has_converged = False
        self.convergence_progress = -1.0
        self.convergence_start_time = 0.0
        self._output_hdr = None
        self._variance_map = None
        self._outputs_stale = False
        self.importance_map = None
        # Consumer-driven pyramid generation: stays False until something
        # that actually reads the pyramid attaches (diag picker IMPORTANCE
        # view, a guided-sampling experiment) — see
        # _should_update_importance_map.
        self.wants_importance_map = False
        self.photon_writes_per_second = 0.0
        self.photons_per_second = 0.0
        self._last_perf = None
        self.on_step: list[Callable[[int], None]] = []
        self.on_converged: list[Callable[[], None]] = []
        self.on_convergence_update: list[Callable[[float], None]] = []
        self._key = jax.random.key(self.seed)

    # ----- scene management -----

    def set_scene(self, scene: Scene):
        """Set/replace the scene with fine-grained change detection.

        The reference's ChangeManager registers per-field pollers so a light
        move invalidates only the 'dirtyFrame' group while substrate edits
        also rebuild the GBuffer (PhotonerComponent.cs:6-91,
        ChangeManager.cs:9-94). Scenes here are immutable pytrees, so the
        equivalent is structural diffing on assignment: if only lights
        changed, accumulation resets but the GBuffer — and therefore the RBT
        engine's rotated-field precompute, which is keyed on GBuffer
        identity — is reused. Animated realtime scenes that move lights pay
        zero per-frame precompute.
        """
        prev = self._scene
        self._scene = scene
        if prev is not None and _substrate_unchanged(prev, scene):
            if not _pytree_equal(prev.lights, scene.lights):
                self._lights_dirty = True
            return
        self.invalidate()

    def invalidate(self):
        """Mark the whole scene dirty (reference: ChangeManager-driven
        OnInvalidated('dirtyFrame'), Simulation.cs:122-131)."""
        self._dirty = True

    def load_profile(self, profile: SimulationProfile):
        """Apply a run profile (Simulation.cs:133-141)."""
        self.frame_limit = profile.frame_limit
        self.rays_per_frame = profile.rays_per_frame
        self.integration_interval = profile.integration_interval
        self.photon_bounces = profile.photon_bounces
        self.has_converged = False
        self.iterations_since_clear = 0
        self._dirty = True

    def _refresh_outputs(self):
        if self._outputs_stale:
            mean, cv, _ = compute_cv_and_mips(
                self._tracers[0].tracer_output, self._tracers[1].tracer_output)
            self._output_hdr = mean
            self._variance_map = cv
            self._outputs_stale = False

    @property
    def simulation_output_hdr(self):
        self._refresh_outputs()
        return self._output_hdr

    @property
    def display_hdr(self):
        """Realtime display image: tracer-pair mean of the display outputs
        (grouped approximate resolve when resolve_groups > 1 on the RBT
        engine). Quality-bearing consumers — convergence, dataset writes —
        read simulation_output_hdr, which is always the exact resolve."""
        a, b = self._tracers
        return (a.display_output + b.display_output) * 0.5

    @property
    def variance_map(self):
        self._refresh_outputs()
        return self._variance_map

    @property
    def gbuffer(self) -> GBuffer | None:
        return self._gbuffer

    @property
    def tracer_a(self):
        return self._tracers[0]

    @property
    def tracer_b(self):
        return self._tracers[1]

    @property
    def is_running(self) -> bool:
        if self.frame_limit != -1:
            return self.iterations_since_clear < self.frame_limit
        return not self.has_converged

    # ----- internals -----

    def _validate_tracers(self):
        if self._strategy_built != (self.strategy, self.engine):
            if self.engine == "rbt-paired":
                # Native tracer axis (round 5): both tracers in ONE
                # combined RBT trace per frame (sim.tracers.PairedTracerView
                # — view 0 drives the shared work, outputs are per-tracer).
                if self.strategy != Strategy.LIGHT_TRANSPORT:
                    raise ValueError(
                        "engine='rbt-paired' supports the LIGHT_TRANSPORT "
                        "strategy only (Hybrid keeps per-tracer backward "
                        "accumulators; use engine='rbt')")
                from ..sim.tracers import make_paired_light_transport

                self._tracers = make_paired_light_transport()
                self._strategy_built = (self.strategy, self.engine)
                self._dirty = True
            else:
                if self.strategy == Strategy.LIGHT_TRANSPORT:
                    make = lambda: LightTransportTracer(engine=self.engine)
                else:
                    refresh = self.forward_refresh_interval
                    if refresh is None:
                        refresh = 4 if self.mode == Mode.REALTIME else 1
                    make = lambda: HybridTracer(engine=self.engine,
                                                forward_refresh_interval=refresh)
                self._tracers = [make(), make()]
                self._strategy_built = (self.strategy, self.engine)
                self._dirty = True
        for t in self._tracers:
            t.forward.integration_interval = self.integration_interval
            t.forward.rays_to_emit = self.rays_per_frame
            t.forward.override_bounce_count = (
                None if self.photon_bounces == -1 else self.photon_bounces)
            t.forward.max_bounces = self._max_bounces()
            if isinstance(t, HybridTracer):
                t.backward.integration_interval = self.integration_interval

    def _max_bounces(self) -> int:
        if self.photon_bounces != -1:
            return max(1, self.photon_bounces)
        if self._scene is None:
            return 2
        import numpy as np

        b = np.asarray(self._scene.lights.bounces)
        act = np.asarray(self._scene.lights.active)
        return int(max(1, (b * act).max()))

    def _should_update_importance_map(self) -> bool:
        """Refresh schedule 1/10/100 (Simulation.cs:368-373), gated on an
        attached consumer.

        CONSUMER GATING (deviation, round-3): nothing in the production
        engine reads the pyramid — the reference's guided scatter is
        commented out (BackwardMonteCarlo.compute:98-99) and ours is a
        library sampler (sim.materials.scatter_importance_guided, unit-
        tested) with the same no-live-consumer status. Generating it on the
        schedule anyway costs TWO forward resolves per refresh (the pyramid
        reads both tracers' early radiance), so it now runs only after a
        consumer declares itself by setting `wants_importance_map` (the
        diagnostic picker's IMPORTANCE view does; see
        refresh_importance_map for the on-demand path).

        Deviation from the reference: the map is also generated on the very
        first iteration. The reference checks after the counter increment so
        its `iterations == 0` branch is unreachable and its hybrid backward
        pass silently no-ops until frame 10 (BackwardMonteCarlo.cs Integrate's
        ImportanceMap null guard); generating at frame 1 removes that wart
        without changing converged results.
        """
        if not self.wants_importance_map:
            return False
        i = self.iterations_since_clear
        if i <= 1:
            # Realtime resets the counter every frame, so this branch would
            # regenerate the pyramid (and force two forward resolves) per
            # frame; the reference explicitly suppresses it there
            # (Simulation.cs:370 returns mode != Realtime at iteration 0).
            return self.mode != Mode.REALTIME
        if i < 100:
            return i % 10 == 0
        return i % 100 == 0

    def refresh_importance_map(self):
        """On-demand pyramid for a consumer attaching mid-run (diag picker).

        Uses the same radiance sources as the scheduled refresh (the hybrid
        tracer's forward early radiance; the forward-only strategy has no
        early radiance, so its exact outputs stand in). Also flips
        wants_importance_map so subsequent frames keep the map fresh on the
        reference's 1/10/100 schedule."""
        self.wants_importance_map = True
        if self._tracers is None:
            return None
        rads = [t.early_radiance if t.early_radiance is not None
                else t.tracer_output for t in self._tracers]
        self.importance_map = importance_pyramid(rads[0], rads[1])
        return self.importance_map

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    # ----- frame loop -----

    def step(self):
        """One simulation frame (reference: Update + LateUpdate,
        Simulation.cs:323-467)."""
        if self._scene is None:
            raise RuntimeError("step() called with no scene set")
        self._validate_tracers()

        # GBuffer (and the RBT field precompute keyed on it) rebuilds only
        # when the substrate actually changed — a light move or realtime
        # frame reset keeps it (fine-grained dirty groups, ChangeManager.cs).
        if self._dirty or self._gbuffer is None:
            self._gbuffer = rasterize(self._scene, self.height, self.width)
        if self._dirty or self._lights_dirty or self.mode == Mode.REALTIME:
            self.has_converged = False
            self.iterations_since_clear = 0
            self._scene_id += 1
            self._dirty = False
            self._lights_dirty = False

        if not self.is_running:
            return

        if self.iterations_since_clear == 0:
            self.convergence_progress = -1.0
            self.convergence_start_time = time.monotonic()
            for t in self._tracers:
                t.gbuffer = self._gbuffer
                t.new_scene()

        self.iterations_since_clear += 1

        for t in self._tracers:
            t.begin_trace(self._scene, self._next_key())

        # Gate check FIRST: evaluating early_radiance on the hybrid tracer
        # builds a full forward resolve, which is exactly the cost the
        # consumer gating exists to avoid.
        if (self._should_update_importance_map()
                and all(t.early_radiance is not None for t in self._tracers)):
            self.importance_map = importance_pyramid(
                self._tracers[0].early_radiance, self._tracers[1].early_radiance)

        for t in self._tracers:
            t.end_trace(self.importance_map, self._next_key())

        # Outputs resolve lazily: with the RBT engine the lightmap resolve
        # (scan + rotate-back) costs far more than a frame's photon work, so
        # it only runs when the output is actually read (display, convergence
        # measurement, dataset writes) — the reference computes CV every
        # frame only because it is nearly free on its GPU.
        self._outputs_stale = True

        for cb in self.on_step:
            cb(self.iterations_since_clear)

        fire_converged = False
        if self.frame_limit != -1 and self.iterations_since_clear >= self.frame_limit:
            self.has_converged = True
            fire_converged = True

        if (self.measurement_interval
                and self.iterations_since_clear % self.measurement_interval == 0
                or (self.iterations_since_clear == 1 and self.convergence_threshold > 0)):
            self._measure_convergence(initial=self.iterations_since_clear == 1)

        if fire_converged:
            for cb in self.on_converged:
                cb()

    def _measure_convergence(self, initial: bool):
        if self.has_converged:
            return
        self.convergence_progress = float(measure_convergence(self.variance_map))
        for cb in self.on_convergence_update:
            cb(self.convergence_progress)
        if not initial and 0 < self.convergence_threshold > self.convergence_progress:
            self.has_converged = True
            for cb in self.on_converged:
                cb()

    def run(self, max_frames: int | None = None):
        """Drive until converged / frame limit (host-side while loop around
        the jitted frame, per SURVEY.md section 7 'hard parts')."""
        frames = 0
        while self.is_running:
            self.step()
            frames += 1
            if max_frames is not None and frames >= max_frames:
                break
            if self.mode == Mode.REALTIME and self.frame_limit == -1:
                break  # realtime frames are independent; caller drives the loop
        return self.simulation_output_hdr

    def update_performance_metrics(self):
        """Throughput counters (Simulation.cs:440-461, ITracer perf metrics).

        photons_per_second is the UNIFORM metric (emitted photons/s,
        identical units for every `engine=` and for bench.py — see
        ForwardIntegrator.photon_count). photon_writes_per_second keeps the
        reference's MWrites semantics, whose units differ by engine
        (deposits for oracle, photons for RBT — ForwardIntegrator
        .write_count) and is comparable across runs of one engine only."""
        if self._tracers is None:  # no frame traced yet (tracers build lazily)
            return
        now = time.monotonic()
        total_writes = sum(t.forward_write_count for t in self._tracers)
        total_photons = sum(t.forward_photon_count for t in self._tracers)
        if self._last_perf is not None:
            dt = now - self._last_perf[0]
            if dt > 0:
                self.photon_writes_per_second = (total_writes - self._last_perf[1]) / dt
                self.photons_per_second = (total_photons - self._last_perf[2]) / dt
        self._last_perf = (now, total_writes, total_photons)

    @property
    def estimated_convergence_time(self) -> float:
        if self.convergence_threshold <= 0 or self.convergence_progress <= 0:
            return float("inf")
        elapsed = time.monotonic() - self.convergence_start_time
        return elapsed * self.convergence_progress / self.convergence_threshold

    @property
    def estimated_remaining_convergence_time(self) -> float:
        return self.estimated_convergence_time - (time.monotonic() - self.convergence_start_time)
