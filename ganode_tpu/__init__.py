"""ganode_tpu — a TPU-native framework for video GANs driven by neural differential equations.

This is a from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
research codebase chechaohp/gan-ode ("GAN with Neural ODEs for Video Generation"):

* ``ganode_tpu.ode``      — differential-equation solver core (fixed-step RK, adaptive
  Dormand-Prince, Euler-Maruyama SDE, cubic-spline-controlled CDE, ODE-RNN), replacing
  torchdiffeq / torchsde / torchcde with ``lax.scan``/``lax.while_loop`` steppers and
  checkpointed or continuous-adjoint backprop.
* ``ganode_tpu.nn``       — pytree module layer (convs in NHWC, GRU cell, spectral norm,
  conditional batch norm, GResBlock / continuous-depth ODE block).
* ``ganode_tpu.models``   — the MoCoGAN model zoo: one VideoGenerator with pluggable
  motion samplers (gru | ode | sde | cde | ode_rnn) and all five discriminators.
* ``ganode_tpu.train``    — jitted alternating-Adam GAN training and the functional
  ODE-GAN trainer (optimizer-as-ODE, euler/rk2/rk4 in parameter space).
* ``ganode_tpu.data``     — rotated-MNIST builder/loaders and the UCF101 offline
  decode -> packed-shard -> device pipeline.
* ``ganode_tpu.parallel`` — ``jax.sharding`` mesh / data-parallel utilities (ICI
  collectives via XLA, not NCCL).
* ``ganode_tpu.ops``      — Pallas TPU kernels for the hot paths (fused RK4 motion
  solve, fused GRU scan), the MXU-folded conv gradient, and the int8-quantized
  serving trunk.
* ``ganode_tpu.runtime``  — native C++ data runtime (mmap + threaded prefetch ring).
* ``ganode_tpu.eval``     — Inception Score / Fréchet distance with persistable
  trained feature models.
* ``ganode_tpu.compat_torch`` — import the reference's trained torch checkpoints
  (scripts/import_reference_checkpoint.py is the CLI).
"""

__version__ = "0.1.0"
