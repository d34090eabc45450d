"""score_sde_pytorch_tpu: TPU-native score-based generative modeling framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild with the capability surface of
yang-song/score_sde_pytorch. See SURVEY.md at the repo root for the reference
structural analysis this build follows.
"""

__version__ = "0.1.0"
