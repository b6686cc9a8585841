"""TinyDiffusionModels-TPU: a TPU-native JAX/XLA/Pallas diffusion framework.

A from-scratch rebuild of the capabilities of LiamConnell/TinyDiffusionModels
(reference: /root/reference) designed TPU-first:

- Diffusion math is one pure-functional module (``core``) shared by every
  workload, replacing the reference's copy-pasted per-script schedule tables
  (reference src/mnist.py:23-42 vs src/shakespeare.py:25-44).
- Models are pytrees of parameters plus pure ``apply`` functions (``models``).
- Training steps are single jitted, donated-buffer functions; the 1000-step
  ancestral sampler is one ``lax.scan`` that stays HBM-resident (``sample``).
- Data parallelism is a mesh/sharding concern (``parallel``), orthogonal to
  model code, using jax.sharding + collectives over ICI.
- Hot ops have hand-written Pallas TPU kernels behind a registry with pure-XLA
  reference implementations (``ops``).
- Checkpoints round-trip with PyTorch ``.pth`` files via a dependency-free
  torch-pickle codec (``io``).

Environment variables are loaded from ``.env`` on import, matching the
reference's package bootstrap (reference src/__init__.py:1-2).
"""

from tinydiffusionmodels_tpu._env import load_dotenv as _load_dotenv

_load_dotenv()

__version__ = "0.1.0"
