"""litbox-tpu: a TPU-native 2D light-transport engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
ETLang/litbox (a Unity/HLSL real-time 2D photon-transport engine with a
PyTorch denoiser). The compute path is jitted JAX with Pallas kernels for
the hot ops; scenes are pytrees; multi-chip scaling uses `jax.sharding`
meshes with XLA collectives.

Layer map (mirrors reference SURVEY.md section 1):
  io/       EXR/PNG codecs                         (ref: Util/TextureExtensions.cs)
  core/     pytree types, LUT builders, RNG        (ref: Util/LUT.cs, Random.cginc)
  scene/    lights, shapes, scene graph            (ref: Assets/Scripts/Lights, Shapes)
  sim/      photon transport engines               (ref: *.compute, SimulationCommon.cginc)
  post/     CV/mips, importance, convergence, tone (ref: TracerPostProcessing.compute, ...)
  engine/   frame loop, profiles, events           (ref: Simulation.cs)
  nn/       UNet denoiser, HdrLoss, training       (ref: litbox_model.py, litbox_loss.py)
  data/     substrate generator, dataset factory   (ref: TrainingSubstrate.cs, TrainingManager.cs)
  parallel/ device-mesh sharding of the sim + nn
  diag/     buffer inspection, analysis filters    (ref: SimulationTexturePicker.cs, Analysis.compute)
"""

__version__ = "0.1.0"
