"""cheetah_pose_estimation_tpu — TPU-native cheetah 3D pose/trajectory reconstruction.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
``zicodasilva/cheetah_pose_estimation`` stack (SymPy + Pyomo + IPOPT on CPU):

* 17-link rigid-body cheetah skeleton, forward kinematics to 24 DLC markers
  (spec: reference ``cheetah.py:109-200``, ``acinoset_misc.py:1581-1659``);
* pinhole + equidistant-fisheye camera models, triangulation and monocular ray
  initialisation (spec: ``acinoset_misc.py:1332-1453,1663-1696``);
* trajectory estimation ("FTE") as batched trust-region Gauss-Newton/LM over a
  block-banded normal system instead of a Pyomo NLP handed to IPOPT+MA97
  (spec: ``acinoset_opt.py:539-963``);
* learned pose/motion priors (PCA, GMM, windowed linear autoregression)
  trained and evaluated in JAX (spec: ``acinoset_models.py``);
* physics-based mode with full manipulator-equation EOM derived by autodiff of
  link energies, friction-polygon contacts and GRF estimation
  (spec: ``acinoset_opt.py:120-270,693-1048``).

Everything differentiable and jit-compiled; whole trials vmap-batched and
sharded over a TPU mesh via ``jax.sharding``.
"""

__version__ = "0.1.0"
