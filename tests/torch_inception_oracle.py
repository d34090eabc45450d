"""Independent torch implementation of the FID InceptionV3 forward.

Purpose (VERDICT r4 #5): `score_sde_pytorch_tpu.inception` is a from-scratch
JAX reimplementation of the network behind the reference's TF-Hub graph
(/root/reference/evaluation.py:35-40). Its wiring (branch concat order,
pooling variants, stride/pad placement, BN folding) was previously pinned
only by self-consistent invariants — a transposed branch or wrong pool would
pass all of them and silently corrupt the first real-weights FID. This file
is a SECOND, independent implementation of the same documented schema
(the pytorch-fid "frozen inception v3 2015" architecture, consuming the
exact state_dict layout tools/convert_inception_weights.py exports), written
in torch primitives. tests/test_inception_oracle.py asserts forward parity
between the two on random weights — a wiring disagreement becomes a test
failure.

Deliberately NOT a torchvision import: torchvision's InceptionV3 differs
from the FID network (1000 vs 1008 classes, aux head, pool details), and an
import would test nothing about the wiring.
"""
import numpy as np
import torch
import torch.nn.functional as F

BN_EPS = 1e-3


def _conv_bn(sd, x, name, stride=1, padding=0):
  w = sd[f"{name}.conv.weight"]
  y = F.conv2d(x, w, stride=stride, padding=padding)
  y = F.batch_norm(y, sd[f"{name}.bn.running_mean"],
                   sd[f"{name}.bn.running_var"], sd[f"{name}.bn.weight"],
                   sd[f"{name}.bn.bias"], training=False, eps=BN_EPS)
  return F.relu(y)


def _avg3(x):
  return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


def _block_a(sd, x, name):
  b1 = _conv_bn(sd, x, f"{name}.branch1x1")
  b5 = _conv_bn(sd, x, f"{name}.branch5x5_1")
  b5 = _conv_bn(sd, b5, f"{name}.branch5x5_2", padding=2)
  bd = _conv_bn(sd, x, f"{name}.branch3x3dbl_1")
  bd = _conv_bn(sd, bd, f"{name}.branch3x3dbl_2", padding=1)
  bd = _conv_bn(sd, bd, f"{name}.branch3x3dbl_3", padding=1)
  bp = _conv_bn(sd, _avg3(x), f"{name}.branch_pool")
  return torch.cat([b1, b5, bd, bp], 1)


def _block_b(sd, x, name):
  b3 = _conv_bn(sd, x, f"{name}.branch3x3", stride=2)
  bd = _conv_bn(sd, x, f"{name}.branch3x3dbl_1")
  bd = _conv_bn(sd, bd, f"{name}.branch3x3dbl_2", padding=1)
  bd = _conv_bn(sd, bd, f"{name}.branch3x3dbl_3", stride=2)
  bp = F.max_pool2d(x, 3, stride=2)
  return torch.cat([b3, bd, bp], 1)


def _block_c(sd, x, name):
  b1 = _conv_bn(sd, x, f"{name}.branch1x1")
  b7 = _conv_bn(sd, x, f"{name}.branch7x7_1")
  b7 = _conv_bn(sd, b7, f"{name}.branch7x7_2", padding=(0, 3))
  b7 = _conv_bn(sd, b7, f"{name}.branch7x7_3", padding=(3, 0))
  bd = _conv_bn(sd, x, f"{name}.branch7x7dbl_1")
  bd = _conv_bn(sd, bd, f"{name}.branch7x7dbl_2", padding=(3, 0))
  bd = _conv_bn(sd, bd, f"{name}.branch7x7dbl_3", padding=(0, 3))
  bd = _conv_bn(sd, bd, f"{name}.branch7x7dbl_4", padding=(3, 0))
  bd = _conv_bn(sd, bd, f"{name}.branch7x7dbl_5", padding=(0, 3))
  bp = _conv_bn(sd, _avg3(x), f"{name}.branch_pool")
  return torch.cat([b1, b7, bd, bp], 1)


def _block_d(sd, x, name):
  b3 = _conv_bn(sd, x, f"{name}.branch3x3_1")
  b3 = _conv_bn(sd, b3, f"{name}.branch3x3_2", stride=2)
  b7 = _conv_bn(sd, x, f"{name}.branch7x7x3_1")
  b7 = _conv_bn(sd, b7, f"{name}.branch7x7x3_2", padding=(0, 3))
  b7 = _conv_bn(sd, b7, f"{name}.branch7x7x3_3", padding=(3, 0))
  b7 = _conv_bn(sd, b7, f"{name}.branch7x7x3_4", stride=2)
  bp = F.max_pool2d(x, 3, stride=2)
  return torch.cat([b3, b7, bp], 1)


def _block_e(sd, x, name, pool):
  b1 = _conv_bn(sd, x, f"{name}.branch1x1")
  b3 = _conv_bn(sd, x, f"{name}.branch3x3_1")
  b3 = torch.cat([
      _conv_bn(sd, b3, f"{name}.branch3x3_2a", padding=(0, 1)),
      _conv_bn(sd, b3, f"{name}.branch3x3_2b", padding=(1, 0))], 1)
  bd = _conv_bn(sd, x, f"{name}.branch3x3dbl_1")
  bd = _conv_bn(sd, bd, f"{name}.branch3x3dbl_2", padding=1)
  bd = torch.cat([
      _conv_bn(sd, bd, f"{name}.branch3x3dbl_3a", padding=(0, 1)),
      _conv_bn(sd, bd, f"{name}.branch3x3dbl_3b", padding=(1, 0))], 1)
  if pool == "avg":
    bp = _avg3(x)
  else:
    bp = F.max_pool2d(x, 3, stride=1, padding=1)
  bp = _conv_bn(sd, bp, f"{name}.branch_pool")
  return torch.cat([b1, b3, bd, bp], 1)


@torch.no_grad()
def forward(state_dict, x_nchw):
  """x_nchw: float tensor in [-1, 1], shape [N, 3, 299, 299].
  Returns (pool_3 [N, 2048], logits [N, num_classes] or None)."""
  sd = {k: torch.as_tensor(np.asarray(v), dtype=torch.float32)
        for k, v in state_dict.items()}
  x = torch.as_tensor(x_nchw, dtype=torch.float32)
  x = _conv_bn(sd, x, "Conv2d_1a_3x3", stride=2)
  x = _conv_bn(sd, x, "Conv2d_2a_3x3")
  x = _conv_bn(sd, x, "Conv2d_2b_3x3", padding=1)
  x = F.max_pool2d(x, 3, stride=2)
  x = _conv_bn(sd, x, "Conv2d_3b_1x1")
  x = _conv_bn(sd, x, "Conv2d_4a_3x3")
  x = F.max_pool2d(x, 3, stride=2)
  x = _block_a(sd, x, "Mixed_5b")
  x = _block_a(sd, x, "Mixed_5c")
  x = _block_a(sd, x, "Mixed_5d")
  x = _block_b(sd, x, "Mixed_6a")
  x = _block_c(sd, x, "Mixed_6b")
  x = _block_c(sd, x, "Mixed_6c")
  x = _block_c(sd, x, "Mixed_6d")
  x = _block_c(sd, x, "Mixed_6e")
  x = _block_d(sd, x, "Mixed_7a")
  x = _block_e(sd, x, "Mixed_7b", pool="avg")
  x = _block_e(sd, x, "Mixed_7c", pool="max")
  pool = x.mean(dim=(2, 3))
  logits = None
  if "fc.weight" in sd:
    logits = pool @ sd["fc.weight"].t() + sd["fc.bias"]
  return pool.numpy(), None if logits is None else logits.numpy()


def random_state_dict(seed=0, num_classes=1008):
  """Random UNFOLDED weights in the converter's state_dict layout (conv
  OIHW + live BN stats), for parity tests that also exercise BN folding."""
  from score_sde_pytorch_tpu.inception import weight_spec
  rng = np.random.default_rng(seed)
  sd = {}
  for name, kh, kw, cin, cout in weight_spec():
    fan_in = kh * kw * cin
    sd[f"{name}.conv.weight"] = rng.normal(
        0, 1 / np.sqrt(fan_in), (cout, cin, kh, kw)).astype(np.float32)
    sd[f"{name}.bn.weight"] = rng.uniform(0.5, 1.5, cout).astype(np.float32)
    sd[f"{name}.bn.bias"] = rng.normal(0, 0.1, cout).astype(np.float32)
    sd[f"{name}.bn.running_mean"] = rng.normal(0, 0.1, cout).astype(
        np.float32)
    sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 1.5, cout).astype(
        np.float32)
  sd["fc.weight"] = rng.normal(0, 0.02, (num_classes, 2048)).astype(
      np.float32)
  sd["fc.bias"] = np.zeros((num_classes,), np.float32)
  return sd
