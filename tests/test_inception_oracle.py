"""Forward parity: JAX inception.py vs an independent torch oracle.

tests/torch_inception_oracle.py re-implements the FID InceptionV3 from the
same documented schema in torch primitives; agreement on random unfolded
weights pins the wiring (branch concat order, pooling variants, stride/pad
placement) AND load_params' BN folding — a transposed branch or wrong pool
in either implementation becomes a test failure instead of a silently
wrong first real-weights FID (VERDICT r4 #5; the behavior stood in for is
the reference's TF-Hub graph, /root/reference/evaluation.py:35-40).
"""
import os
import tempfile

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from score_sde_pytorch_tpu import inception  # noqa: E402
from tests import torch_inception_oracle as oracle  # noqa: E402


@pytest.fixture(scope="module")
def state_dict():
  return oracle.random_state_dict(seed=3)


@pytest.fixture(scope="module")
def x299():
  rng = np.random.default_rng(11)
  return rng.uniform(-1.0, 1.0, (2, 299, 299, 3)).astype(np.float32)


@pytest.mark.slow  # two full 299px InceptionV3 forwards on CPU
def test_forward_parity_vs_torch_oracle(state_dict, x299, tmp_path):
  npz = tmp_path / "inception_random.npz"
  np.savez(npz, **state_dict)
  params = inception.load_params(str(npz))  # validates + folds BN

  import jax.numpy as jnp
  pool_jax, logits_jax = inception._forward(params, jnp.asarray(x299))
  pool_t, logits_t = oracle.forward(state_dict,
                                    np.transpose(x299, (0, 3, 1, 2)))

  assert pool_jax.shape == (2, 2048) and pool_t.shape == (2, 2048)
  np.testing.assert_allclose(np.asarray(pool_jax), pool_t,
                             atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(logits_jax), logits_t,
                             atol=1e-4, rtol=1e-4)


def test_load_params_rejects_truncated_npz(tmp_path):
  sd = oracle.random_state_dict(seed=0)
  sd.pop("Mixed_7b.branch_pool.conv.weight")
  sd.pop("Mixed_6c.branch7x7_2.bn.running_var")
  npz = tmp_path / "bad.npz"
  np.savez(npz, **sd)
  with pytest.raises(ValueError, match="missing Mixed_"):
    inception.load_params(str(npz))


def test_load_params_rejects_wrong_shapes(tmp_path):
  sd = oracle.random_state_dict(seed=0)
  # HWIO instead of OIHW — the classic converter mistake
  w = sd["Conv2d_1a_3x3.conv.weight"]
  sd["Conv2d_1a_3x3.conv.weight"] = np.transpose(w, (2, 3, 1, 0))
  npz = tmp_path / "bad_shape.npz"
  np.savez(npz, **sd)
  with pytest.raises(ValueError, match="Conv2d_1a_3x3.conv.weight"):
    inception.load_params(str(npz))
