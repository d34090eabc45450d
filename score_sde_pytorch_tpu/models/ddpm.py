"""DDPM U-Net (Ho et al. 2020) score network, flax NHWC.

Rebuild of /root/reference/models/ddpm.py:39-181.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from score_sde_pytorch_tpu.models import layers, utils

Array = jax.Array

conv3x3 = layers.ddpm_conv3x3
default_initializer = layers.default_init


@utils.register_model(name="ddpm")
class DDPM(nn.Module):
  config: Any

  @nn.compact
  def __call__(self, x: Array, labels: Array, train: bool = False) -> Array:
    config = self.config
    act = layers.get_act(config.model.nonlinearity)
    nf = config.model.nf
    ch_mult = config.model.ch_mult
    num_res_blocks = config.model.num_res_blocks
    attn_resolutions = config.model.attn_resolutions
    dropout = config.model.dropout
    resamp_with_conv = config.model.resamp_with_conv
    num_resolutions = len(ch_mult)
    deterministic = not train

    def resnet_block(out_ch=None, name=None):
      return layers.ResnetBlockDDPM(act=act, out_ch=out_ch, dropout=dropout,
                                    name=name)

    if config.model.conditional:
      temb = layers.get_timestep_embedding(labels, nf)
      temb = nn.Dense(nf * 4, kernel_init=default_initializer(),
                      bias_init=nn.initializers.zeros, name="Dense_t0")(temb)
      temb = nn.Dense(nf * 4, kernel_init=default_initializer(),
                      bias_init=nn.initializers.zeros,
                      name="Dense_t1")(act(temb))
    else:
      temb = None

    h = x if config.data.centered else 2 * x - 1.0

    hs = [conv3x3(nf, name="conv_in")(h)]
    for i_level in range(num_resolutions):
      for i_block in range(num_res_blocks):
        h = resnet_block(out_ch=nf * ch_mult[i_level],
                         name=f"down_{i_level}_block_{i_block}")(
            hs[-1], temb, deterministic=deterministic)
        if h.shape[1] in attn_resolutions:
          h = layers.AttnBlock(name=f"down_{i_level}_attn_{i_block}")(h)
        hs.append(h)
      if i_level != num_resolutions - 1:
        hs.append(layers.Downsample(with_conv=resamp_with_conv,
                                    name=f"down_{i_level}_downsample")(hs[-1]))

    h = hs[-1]
    h = resnet_block(name="mid_block_0")(h, temb, deterministic=deterministic)
    h = layers.AttnBlock(name="mid_attn")(h)
    h = resnet_block(name="mid_block_1")(h, temb, deterministic=deterministic)

    for i_level in reversed(range(num_resolutions)):
      for i_block in range(num_res_blocks + 1):
        h = resnet_block(out_ch=nf * ch_mult[i_level],
                         name=f"up_{i_level}_block_{i_block}")(
            jnp.concatenate([h, hs.pop()], axis=-1), temb,
            deterministic=deterministic)
      if h.shape[1] in attn_resolutions:
        h = layers.AttnBlock(name=f"up_{i_level}_attn")(h)
      if i_level != 0:
        h = layers.Upsample(with_conv=resamp_with_conv,
                            name=f"up_{i_level}_upsample")(h)

    assert not hs
    h = act(layers.GroupNorm(num_groups=layers._legacy_groups(h.shape[-1]), epsilon=1e-6, name="norm_out")(h))
    h = conv3x3(x.shape[-1], init_scale=0.0, name="conv_out")(h)

    if config.model.scale_by_sigma:
      sigmas = jnp.asarray(utils.get_sigmas(config))
      used_sigmas = sigmas[labels.astype(jnp.int32)].reshape(
          (x.shape[0],) + (1,) * (x.ndim - 1))
      h = h / used_sigmas
    return h
