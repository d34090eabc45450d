"""NCSN / NCSNv2 RefineNet-style score networks (flax, NHWC).

Rebuild of /root/reference/models/ncsnv2.py:43-415 — 64/128/256px size
variants plus the noise-conditional NCSNv1. Output of the v2 models is
divided by sigma[y] (the model predicts score·sigma).

Note: the reference's NCSN passes its *unconditional* norm constructor into
conditional blocks (ncsnv2.py:141), which would crash if instantiated; the
conditional norm is what the architecture means, so here NCSN uses
`get_normalization(config, conditional=True)` directly.
"""
from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from score_sde_pytorch_tpu.models import layers, utils
from score_sde_pytorch_tpu.models.layers import (
    CondRefineBlock, ConditionalResidualBlock, NCSNConv, RefineBlock,
    ResidualBlock)
from score_sde_pytorch_tpu.models.normalization import get_normalization

Array = jax.Array


def get_network(config):
  """Size dispatch (reference ncsnv2.py:31-40)."""
  size = config.data.image_size
  if size < 96:
    return functools.partial(NCSNv2, config=config)
  elif 96 <= size <= 128:
    return functools.partial(NCSNv2_128, config=config)
  elif 128 < size <= 256:
    return functools.partial(NCSNv2_256, config=config)
  raise NotImplementedError(
      f"No network suitable for {size}px implemented yet.")


def _model_options(config):
  """Shared TPU options for the RefineNet family (same API as NCSN++):
  ``config.model.dtype`` ∈ {float32, bfloat16} sets the conv compute dtype
  (params stay fp32, norms fp32); ``config.model.remat`` rematerializes
  blocks in the backward pass (jax.checkpoint)."""
  dtype = (jnp.bfloat16 if config.model.get("dtype", "float32") == "bfloat16"
           else None)
  use_remat = bool(config.model.get("remat", False))
  Res = (nn.remat(ResidualBlock, prevent_cse=False) if use_remat
         else ResidualBlock)
  Ref = (nn.remat(RefineBlock, prevent_cse=False, static_argnums=(2,))
         if use_remat else RefineBlock)
  return dtype, Res, Ref


def _res_pair(norm, act, out_ch, dilation=1, down_first=False,
              adjust_padding=False, name=None, block_cls=ResidualBlock):
  """Two ResidualBlocks: optional 'down' on the first (reference res1..res5)."""
  def apply(x):
    h = block_cls(out_ch, norm, resample="down" if down_first else None,
                  act=act, dilation=dilation,
                  adjust_padding=adjust_padding, name=f"{name}_0")(x)
    return block_cls(out_ch, norm, resample=None, act=act,
                     dilation=dilation, name=f"{name}_1")(h)
  return apply


@utils.register_model(name="ncsnv2_64")
class NCSNv2(nn.Module):
  """NCSNv2 for <96px (reference ncsnv2.py:43-130)."""
  config: Any

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    config = self.config
    nf = config.model.nf
    act = layers.get_act(config.model.nonlinearity)
    norm = get_normalization(config)
    dtype, Res, Ref = _model_options(config)
    h = x if config.data.centered else 2 * x - 1.0

    with layers.conv_dtype(dtype):
      out = NCSNConv(nf, kernel=3, name="begin_conv")(h)
      adjust = config.data.image_size == 28
      layer1 = _res_pair(norm, act, nf, name="res1", block_cls=Res)(out)
      layer2 = _res_pair(norm, act, 2 * nf, down_first=True, name="res2",
                         block_cls=Res)(layer1)
      layer3 = _res_pair(norm, act, 2 * nf, dilation=2, down_first=True,
                         name="res3", block_cls=Res)(layer2)
      layer4 = _res_pair(norm, act, 2 * nf, dilation=4, down_first=True,
                         adjust_padding=adjust, name="res4",
                         block_cls=Res)(layer3)

      ref1 = Ref(2 * nf, act, start=True, name="refine1")(
          [layer4], layer4.shape[1:3])
      ref2 = Ref(2 * nf, act, name="refine2")(
          [layer3, ref1], layer3.shape[1:3])
      ref3 = Ref(nf, act, name="refine3")(
          [layer2, ref2], layer2.shape[1:3])
      out = Ref(nf, act, end=True, name="refine4")(
          [layer1, ref3], layer1.shape[1:3])

      out = norm(name="normalizer")(out)
      out = act(out)
      out = NCSNConv(x.shape[-1], kernel=3, name="end_conv")(out)

    out = out.astype(jnp.float32)
    sigmas = jnp.asarray(utils.get_sigmas(config))
    used_sigmas = sigmas[y.astype(jnp.int32)].reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))
    return out / used_sigmas


@utils.register_model(name="ncsn")
class NCSN(nn.Module):
  """Noise-conditional NCSNv1 (reference ncsnv2.py:133-219)."""
  config: Any

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    config = self.config
    nf = config.model.nf
    num_classes = config.model.num_scales
    act = layers.get_act(config.model.nonlinearity)
    norm = get_normalization(config, conditional=True)
    dtype, _, _ = _model_options(config)
    use_remat = bool(config.model.get("remat", False))
    CondRes = (nn.remat(ConditionalResidualBlock, prevent_cse=False)
               if use_remat else ConditionalResidualBlock)
    CondRef = (nn.remat(CondRefineBlock, prevent_cse=False,
                        static_argnums=(3,))
               if use_remat else CondRefineBlock)
    yi = y.astype(jnp.int32)
    h = x if config.data.centered else 2 * x - 1.0

    with layers.conv_dtype(dtype):
      out = NCSNConv(nf, kernel=3, name="begin_conv")(h)
      adjust = config.data.image_size == 28

      def cond_pair(out_ch, dilation=1, down_first=False,
                    adjust_padding=False, name=None):
        def apply(xx):
          hh = CondRes(
              out_ch, num_classes, norm,
              resample="down" if down_first else None,
              act=act, dilation=dilation, adjust_padding=adjust_padding,
              name=f"{name}_0")(xx, yi)
          return CondRes(
              out_ch, num_classes, norm, resample=None, act=act,
              dilation=dilation, name=f"{name}_1")(hh, yi)
        return apply

      layer1 = cond_pair(nf, name="res1")(out)
      layer2 = cond_pair(2 * nf, down_first=True, name="res2")(layer1)
      layer3 = cond_pair(2 * nf, dilation=2, down_first=True,
                         name="res3")(layer2)
      layer4 = cond_pair(2 * nf, dilation=4, down_first=True,
                         adjust_padding=adjust, name="res4")(layer3)

      ref1 = CondRef(2 * nf, num_classes, norm, act, start=True,
                     name="refine1")([layer4], yi, layer4.shape[1:3])
      ref2 = CondRef(2 * nf, num_classes, norm, act, name="refine2")(
          [layer3, ref1], yi, layer3.shape[1:3])
      ref3 = CondRef(nf, num_classes, norm, act, name="refine3")(
          [layer2, ref2], yi, layer2.shape[1:3])
      out = CondRef(nf, num_classes, norm, act, end=True,
                    name="refine4")([layer1, ref3], yi, layer1.shape[1:3])

      out = norm(nf, num_classes, name="normalizer")(out, yi)
      out = act(out)
      out = NCSNConv(x.shape[-1], kernel=3, name="end_conv")(out)
    return out.astype(jnp.float32)


@utils.register_model(name="ncsnv2_128")
class NCSNv2_128(nn.Module):
  """NCSNv2 for 96–128px (reference ncsnv2.py:222-313)."""
  config: Any

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    config = self.config
    nf = config.model.nf
    act = layers.get_act(config.model.nonlinearity)
    norm = get_normalization(config)
    dtype, Res, Ref = _model_options(config)
    h = x if config.data.centered else 2 * x - 1.0

    with layers.conv_dtype(dtype):
      out = NCSNConv(nf, kernel=3, name="begin_conv")(h)
      layer1 = _res_pair(norm, act, nf, name="res1", block_cls=Res)(out)
      layer2 = _res_pair(norm, act, 2 * nf, down_first=True, name="res2",
                         block_cls=Res)(layer1)
      layer3 = _res_pair(norm, act, 2 * nf, down_first=True, name="res3",
                         block_cls=Res)(layer2)
      layer4 = _res_pair(norm, act, 4 * nf, dilation=2, down_first=True,
                         name="res4", block_cls=Res)(layer3)
      layer5 = _res_pair(norm, act, 4 * nf, dilation=4, down_first=True,
                         name="res5", block_cls=Res)(layer4)

      ref1 = Ref(4 * nf, act, start=True, name="refine1")(
          [layer5], layer5.shape[1:3])
      ref2 = Ref(2 * nf, act, name="refine2")(
          [layer4, ref1], layer4.shape[1:3])
      ref3 = Ref(2 * nf, act, name="refine3")(
          [layer3, ref2], layer3.shape[1:3])
      ref4 = Ref(nf, act, name="refine4")(
          [layer2, ref3], layer2.shape[1:3])
      out = Ref(nf, act, end=True, name="refine5")(
          [layer1, ref4], layer1.shape[1:3])

      out = norm(name="normalizer")(out)
      out = act(out)
      out = NCSNConv(x.shape[-1], kernel=3, name="end_conv")(out)

    out = out.astype(jnp.float32)
    sigmas = jnp.asarray(utils.get_sigmas(config))
    used_sigmas = sigmas[y.astype(jnp.int32)].reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))
    return out / used_sigmas


@utils.register_model(name="ncsnv2_256")
class NCSNv2_256(nn.Module):
  """NCSNv2 for 128–256px (reference ncsnv2.py:316-415)."""
  config: Any

  @nn.compact
  def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
    config = self.config
    nf = config.model.nf
    act = layers.get_act(config.model.nonlinearity)
    norm = get_normalization(config)
    dtype, Res, Ref = _model_options(config)
    h = x if config.data.centered else 2 * x - 1.0

    with layers.conv_dtype(dtype):
      out = NCSNConv(nf, kernel=3, name="begin_conv")(h)
      layer1 = _res_pair(norm, act, nf, name="res1", block_cls=Res)(out)
      layer2 = _res_pair(norm, act, 2 * nf, down_first=True, name="res2",
                         block_cls=Res)(layer1)
      layer3 = _res_pair(norm, act, 2 * nf, down_first=True, name="res3",
                         block_cls=Res)(layer2)
      layer31 = _res_pair(norm, act, 2 * nf, down_first=True, name="res31",
                          block_cls=Res)(layer3)
      layer4 = _res_pair(norm, act, 4 * nf, dilation=2, down_first=True,
                         name="res4", block_cls=Res)(layer31)
      layer5 = _res_pair(norm, act, 4 * nf, dilation=4, down_first=True,
                         name="res5", block_cls=Res)(layer4)

      ref1 = Ref(4 * nf, act, start=True, name="refine1")(
          [layer5], layer5.shape[1:3])
      ref2 = Ref(2 * nf, act, name="refine2")(
          [layer4, ref1], layer4.shape[1:3])
      ref31 = Ref(2 * nf, act, name="refine31")(
          [layer31, ref2], layer31.shape[1:3])
      ref3 = Ref(2 * nf, act, name="refine3")(
          [layer3, ref31], layer3.shape[1:3])
      ref4 = Ref(nf, act, name="refine4")(
          [layer2, ref3], layer2.shape[1:3])
      out = Ref(nf, act, end=True, name="refine5")(
          [layer1, ref4], layer1.shape[1:3])

      out = norm(name="normalizer")(out)
      out = act(out)
      out = NCSNConv(x.shape[-1], kernel=3, name="end_conv")(out)

    out = out.astype(jnp.float32)
    sigmas = jnp.asarray(utils.get_sigmas(config))
    used_sigmas = sigmas[y.astype(jnp.int32)].reshape(
        (x.shape[0],) + (1,) * (x.ndim - 1))
    return out / used_sigmas
