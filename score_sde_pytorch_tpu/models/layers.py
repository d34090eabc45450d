"""Common NN layers (NCSN/DDPM lineage), flax.linen, NHWC.

TPU-native rebuild of /root/reference/models/layers.py. All modules are
written channels-last (the TPU-native layout; the channel dim rides the
128-lane axis) and parameterised the flax way — HWIO conv kernels, explicit
PRNG threading, `deterministic` flags for dropout.
"""
from __future__ import annotations

import contextlib
import contextvars
import math
from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# Trace-scoped computation dtype for the NCSN-lineage convs (NCSNConv and
# everything built on it). The NCSN++ family threads an explicit ``dtype``
# attribute instead; the RefineNet zoo (CRP/RCU/MSF/Refine/Residual blocks)
# picks this up from the enclosing model's scope.
_CONV_DTYPE: contextvars.ContextVar = contextvars.ContextVar(
    "ncsn_conv_dtype", default=None)


@contextlib.contextmanager
def conv_dtype(dtype):
  """Set the computation dtype for NCSN-lineage convs in this trace scope
  (params stay fp32; bf16 compute halves HBM traffic on TPU)."""
  token = _CONV_DTYPE.set(dtype)
  try:
    yield
  finally:
    _CONV_DTYPE.reset(token)


def get_act(name: str) -> Callable[[Array], Array]:
  """Activation from config name (reference layers.py:29-41)."""
  name = name.lower()
  if name == "elu":
    return jax.nn.elu
  if name == "relu":
    return jax.nn.relu
  if name == "lrelu":
    return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
  if name == "swish":
    return jax.nn.silu
  raise NotImplementedError(f"activation function {name} does not exist!")


def default_init(scale: float = 1.0):
  """DDPM initializer: variance_scaling(scale, fan_avg, uniform).

  (The reference's `variance_scaling` at layers.py:54-91 is itself a port of
  this JAX initializer back to torch.)
  """
  scale = 1e-10 if scale == 0 else scale
  return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def ncsn_init(scale: float = 1.0):
  """NCSNv1/v2 conv init: torch's default kaiming-uniform(a=√5) × scale.

  torch default ≡ U(−1/√fan_in, 1/√fan_in) ≡ variance_scaling(1/3, fan_in,
  uniform); multiplying weights by `scale` multiplies the variance by scale².
  (reference layers.py:44-52,100-106)
  """
  scale = 1e-10 if scale == 0 else scale
  return nn.initializers.variance_scaling(scale ** 2 / 3.0, "fan_in", "uniform")


def DDPMConv(features, kernel=3, stride=1, dilation=1, use_bias=True,
             init_scale=1.0, padding="SAME", name=None, dtype=None):
  """3x3/1x1 conv with DDPM init (reference layers.py:108-131).

  Returns a plain nn.Conv (no wrapper module → flat param paths). ``dtype``
  is the computation dtype (params stay fp32); bf16 compute halves HBM
  traffic on TPU."""
  return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                 kernel_dilation=(dilation, dilation), padding=padding,
                 use_bias=use_bias, kernel_init=default_init(init_scale),
                 bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def ddpm_conv3x3(features, stride=1, use_bias=True, dilation=1, init_scale=1.0,
                 padding="SAME", name=None, dtype=None):
  return DDPMConv(features, kernel=3, stride=stride, use_bias=use_bias,
                  dilation=dilation, init_scale=init_scale, padding=padding,
                  name=name, dtype=dtype)


def ddpm_conv1x1(features, stride=1, use_bias=True, init_scale=1.0, name=None,
                 dtype=None):
  return DDPMConv(features, kernel=1, stride=stride, use_bias=use_bias,
                  init_scale=init_scale, name=name, dtype=dtype)


def NCSNConv(features, kernel=3, stride=1, dilation=1, use_bias=True,
             init_scale=1.0, padding="SAME", name=None, dtype=None):
  """Conv with (scaled) torch-default init (reference layers.py:44,100).

  ``dtype`` is the computation dtype; when None it falls back to the
  trace-scoped :func:`conv_dtype` setting (how the RefineNet models get
  bf16 compute without threading a dtype through every block)."""
  if dtype is None:
    dtype = _CONV_DTYPE.get()
  return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                 kernel_dilation=(dilation, dilation), padding=padding,
                 use_bias=use_bias, kernel_init=ncsn_init(init_scale),
                 bias_init=nn.initializers.zeros, name=name, dtype=dtype)


def ncsn_conv3x3(features, stride=1, use_bias=True, dilation=1, init_scale=1.0,
                 padding="SAME", name=None):
  return NCSNConv(features, kernel=3, stride=stride, use_bias=use_bias,
                  dilation=dilation, init_scale=init_scale, padding=padding,
                  name=name)


def ncsn_conv1x1(features, stride=1, use_bias=True, init_scale=1.0, name=None):
  return NCSNConv(features, kernel=1, stride=stride, use_bias=use_bias,
                  init_scale=init_scale, name=name)


def _legacy_groups(c: int) -> int:
  """GroupNorm(32) with a divisibility fallback for small test channels.

  The reference hardcodes 32 groups (layers.py:560,633,645) which requires
  c % 32 == 0; identical for all real configs (nf >= 128)."""
  return 32 if c % 32 == 0 else math.gcd(c, 32)


class GroupNorm(nn.Module):
  """GroupNorm with fp32 statistics and input-dtype normalization.

  TPU-native replacement for ``nn.GroupNorm(dtype=float32)``: the mean/var
  reductions run in fp32 (the cast fuses into the reduce — no fp32 copy of
  the activation is materialized), but the normalize+affine is applied in
  the INPUT dtype as a single fused ``x * a + b``. In bf16 models this
  halves the elementwise HBM traffic around every conv vs upcasting the
  whole activation to fp32; in fp32 models it is numerically equivalent to
  flax/torch GroupNorm up to fp32 rounding (golden-tested ≤1e-4 vs the
  reference, tests/test_interop.py). Param tree matches nn.GroupNorm
  ({scale, bias} of shape [C]) so checkpoints/interop are unchanged.
  """
  num_groups: int = 32
  epsilon: float = 1e-6

  @nn.compact
  def __call__(self, x: Array) -> Array:
    c = x.shape[-1]
    g = self.num_groups
    assert c % g == 0, (c, g)
    scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
    bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

    xg = x.reshape(x.shape[:-1] + (g, c // g)).astype(jnp.float32)
    red_axes = tuple(range(1, x.ndim - 1)) + (x.ndim,)  # spatial + in-group
    mean = jnp.mean(xg, axis=red_axes, keepdims=True)
    var = jnp.mean(jnp.square(xg), axis=red_axes, keepdims=True) - \
        jnp.square(mean)
    # E[x²]−E[x]² can go slightly negative under catastrophic cancellation
    # (near-constant activations with large mean, e.g. VE scales) — clamp
    # before rsqrt so it can never produce NaN.
    var = jnp.maximum(var, 0.0)
    rstd = jax.lax.rsqrt(var + self.epsilon)
    # fold params into per-(batch, channel) a, b; tiny fp32 tensors
    shape = x.shape[:1] + (1,) * (x.ndim - 2) + (c,)
    a = (rstd * scale.reshape((g, c // g))).reshape(shape)
    b = (bias.reshape((g, c // g)) - mean * rstd *
         scale.reshape((g, c // g))).reshape(shape)
    # per-element math in fp32 (fuses into the elementwise kernel — only
    # the input/output dtype tensors touch HBM), output in input dtype
    return (x.astype(jnp.float32) * a + b).astype(x.dtype)


def get_timestep_embedding(timesteps: Array, embedding_dim: int,
                           max_positions: int = 10000) -> Array:
  """Sinusoidal timestep embedding (reference layers.py:515-529)."""
  assert timesteps.ndim == 1
  half_dim = embedding_dim // 2
  emb = math.log(max_positions) / (half_dim - 1)
  emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
  emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
  emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
  if embedding_dim % 2 == 1:
    emb = jnp.pad(emb, [(0, 0), (0, 1)])
  assert emb.shape == (timesteps.shape[0], embedding_dim)
  return emb


class NIN(nn.Module):
  """1x1 'network-in-network' via contraction (reference layers.py:546-555)."""
  num_units: int
  init_scale: float = 0.1
  dtype: Any = None

  @nn.compact
  def __call__(self, x: Array) -> Array:
    in_dim = x.shape[-1]
    w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
    b = self.param("b", nn.initializers.zeros, (self.num_units,))
    if self.dtype is not None:
      x, w = x.astype(self.dtype), w.astype(self.dtype)
    return jnp.einsum("...c,cd->...d", x, w) + b.astype(x.dtype)


class AttnBlock(nn.Module):
  """Legacy DDPM channel-wise self-attention (reference layers.py:558-581).

  NHWC formulation: logits over the flattened H·W grid, one dense softmax
  (the grids are ≤16×16 in every shipped config — SURVEY.md §5).
  """

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    hid = GroupNorm(num_groups=_legacy_groups(c), epsilon=1e-6)(x)
    q = NIN(c, name="NIN_0")(hid)
    k = NIN(c, name="NIN_1")(hid)
    v = NIN(c, name="NIN_2")(hid)
    # [B, HW, C] matmul formulation (MXU-tiled); identical math to the
    # reference's bhwc,bijc->bhwij einsum.
    n = h * w
    qf, kf, vf = (z.reshape(b, n, c) for z in (q, k, v))
    logits = jnp.einsum("bnc,bmc->bnm", qf, kf) * (c ** -0.5)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bnm,bmc->bnc", attn, vf).reshape(b, h, w, c)
    out = NIN(c, init_scale=0.0, name="NIN_3")(out)
    return x + out


class Upsample(nn.Module):
  """Nearest-neighbour 2x upsample, optional conv (reference layers.py:584-595)."""
  with_conv: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    y = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
    if self.with_conv:
      y = ddpm_conv3x3(c, name="Conv_0")(y)
    return y


class Downsample(nn.Module):
  """2x downsample: strided conv (asymmetric SAME pad) or avg-pool
  (reference layers.py:598-616)."""
  with_conv: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    if self.with_conv:
      # Emulate torch F.pad (0,1,0,1): pad only bottom/right.
      y = ddpm_conv3x3(c, stride=2, padding=[(0, 1), (0, 1)], name="Conv_0")(x)
    else:
      y = nn.avg_pool(x, (2, 2), strides=(2, 2))
    assert y.shape == (b, h // 2, w // 2, c)
    return y


class ResnetBlockDDPM(nn.Module):
  """Legacy DDPM resblock (reference layers.py:619-662)."""
  act: Callable[[Array], Array]
  out_ch: Optional[int] = None
  conv_shortcut: bool = False
  dropout: float = 0.1

  @nn.compact
  def __call__(self, x: Array, temb: Optional[Array] = None,
               deterministic: bool = True) -> Array:
    in_ch = x.shape[-1]
    out_ch = self.out_ch or in_ch
    h = self.act(GroupNorm(num_groups=_legacy_groups(in_ch), epsilon=1e-6, name="GroupNorm_0")(x))
    h = ddpm_conv3x3(out_ch, name="Conv_0")(h)
    if temb is not None:
      h += nn.Dense(out_ch, kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                    name="Dense_0")(self.act(temb))[:, None, None, :]
    h = self.act(GroupNorm(num_groups=_legacy_groups(out_ch), epsilon=1e-6, name="GroupNorm_1")(h))
    h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
    h = ddpm_conv3x3(out_ch, init_scale=0.0, name="Conv_1")(h)
    if in_ch != out_ch:
      if self.conv_shortcut:
        x = ddpm_conv3x3(out_ch, name="Conv_2")(x)
      else:
        x = NIN(out_ch, name="NIN_0")(x)
    return x + h


# ---------------------------------------------------------------------------
# NCSNv1/v2 (RefineNet) building blocks — reference layers.py:133-507
# ---------------------------------------------------------------------------


class CRPBlock(nn.Module):
  """Chained residual pooling (reference layers.py:133-154)."""
  features: int
  n_stages: int
  act: Callable = jax.nn.relu
  maxpool: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = self.act(x)
    path = x
    pool = nn.max_pool if self.maxpool else nn.avg_pool
    for i in range(self.n_stages):
      path = pool(path, (5, 5), strides=(1, 1), padding="SAME")
      path = ncsn_conv3x3(self.features, use_bias=False, name=f"Conv_{i}")(path)
      x = path + x
    return x


class CondCRPBlock(nn.Module):
  """Conditional CRP (reference layers.py:157-181)."""
  features: int
  n_stages: int
  num_classes: int
  normalizer: Any
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    x = self.act(x)
    path = x
    for i in range(self.n_stages):
      path = self.normalizer(self.features, self.num_classes, bias=True,
                             name=f"Norm_{i}")(path, y)
      path = nn.avg_pool(path, (5, 5), strides=(1, 1), padding="SAME")
      path = ncsn_conv3x3(self.features, use_bias=False, name=f"Conv_{i}")(path)
      x = path + x
    return x


class RCUBlock(nn.Module):
  """Residual conv unit (reference layers.py:184-206)."""
  features: int
  n_blocks: int
  n_stages: int
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x: Array) -> Array:
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = self.act(x)
        x = ncsn_conv3x3(self.features, use_bias=False,
                         name=f"Conv_{i + 1}_{j + 1}")(x)
      x = x + residual
    return x


class CondRCUBlock(nn.Module):
  """Conditional RCU (reference layers.py:209-234)."""
  features: int
  n_blocks: int
  n_stages: int
  num_classes: int
  normalizer: Any
  act: Callable = jax.nn.relu

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    for i in range(self.n_blocks):
      residual = x
      for j in range(self.n_stages):
        x = self.normalizer(self.features, self.num_classes, bias=True,
                            name=f"Norm_{i + 1}_{j + 1}")(x, y)
        x = self.act(x)
        x = ncsn_conv3x3(self.features, use_bias=False,
                         name=f"Conv_{i + 1}_{j + 1}")(x)
      x = x + residual
    return x


def _bilinear_resize(x: Array, shape: Tuple[int, int]) -> Array:
  """Bilinear resize matching torch align_corners=True semantics."""
  b, h, w, c = x.shape
  th, tw = shape
  if (th, tw) == (h, w):
    return x
  # align_corners=True: sample positions linspace(0, size-1, target)
  rows = jnp.linspace(0.0, h - 1.0, th)
  cols = jnp.linspace(0.0, w - 1.0, tw)
  r0 = jnp.clip(jnp.floor(rows).astype(jnp.int32), 0, h - 1)
  r1 = jnp.clip(r0 + 1, 0, h - 1)
  c0 = jnp.clip(jnp.floor(cols).astype(jnp.int32), 0, w - 1)
  c1 = jnp.clip(c0 + 1, 0, w - 1)
  fr = (rows - r0).reshape(1, th, 1, 1)
  fc = (cols - c0).reshape(1, 1, tw, 1)
  top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
  bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
  return top * (1 - fr) + bot * fr


class MSFBlock(nn.Module):
  """Multi-scale fusion (reference layers.py:237-253)."""
  features: int

  @nn.compact
  def __call__(self, xs: Sequence[Array], shape: Tuple[int, int]) -> Array:
    total = None
    for i, xi in enumerate(xs):
      h = ncsn_conv3x3(self.features, use_bias=True, name=f"Conv_{i}")(xi)
      h = _bilinear_resize(h, shape)
      total = h if total is None else total + h
    return total


class CondMSFBlock(nn.Module):
  """Conditional MSF (reference layers.py:256-274)."""
  features: int
  num_classes: int
  normalizer: Any

  @nn.compact
  def __call__(self, xs: Sequence[Array], y: Array,
               shape: Tuple[int, int]) -> Array:
    total = None
    for i, xi in enumerate(xs):
      h = self.normalizer(xi.shape[-1], self.num_classes, bias=True,
                          name=f"Norm_{i}")(xi, y)
      h = ncsn_conv3x3(self.features, use_bias=True, name=f"Conv_{i}")(h)
      h = _bilinear_resize(h, shape)
      total = h if total is None else total + h
    return total


class RefineBlock(nn.Module):
  """RefineNet block (reference layers.py:277-310)."""
  features: int
  act: Callable = jax.nn.relu
  start: bool = False
  end: bool = False
  maxpool: bool = True

  @nn.compact
  def __call__(self, xs: Sequence[Array], output_shape: Tuple[int, int]) -> Array:
    hs = []
    for i, xi in enumerate(xs):
      hs.append(RCUBlock(xi.shape[-1], 2, 2, self.act,
                         name=f"RCU_{i}")(xi))
    if len(xs) > 1:
      h = MSFBlock(self.features, name="MSF")(hs, output_shape)
    else:
      h = hs[0]
    h = CRPBlock(self.features, 2, self.act, maxpool=self.maxpool,
                 name="CRP")(h)
    return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                    name="RCU_out")(h)


class CondRefineBlock(nn.Module):
  """Conditional RefineNet block (reference layers.py:313-348)."""
  features: int
  num_classes: int
  normalizer: Any
  act: Callable = jax.nn.relu
  start: bool = False
  end: bool = False

  @nn.compact
  def __call__(self, xs: Sequence[Array], y: Array,
               output_shape: Tuple[int, int]) -> Array:
    hs = []
    for i, xi in enumerate(xs):
      hs.append(CondRCUBlock(xi.shape[-1], 2, 2, self.num_classes,
                             self.normalizer, self.act,
                             name=f"RCU_{i}")(xi, y))
    if len(xs) > 1:
      h = CondMSFBlock(self.features, self.num_classes, self.normalizer,
                       name="MSF")(hs, y, output_shape)
    else:
      h = hs[0]
    h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer,
                     self.act, name="CRP")(h, y)
    return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                        self.num_classes, self.normalizer, self.act,
                        name="RCU_out")(h, y)


class ConvMeanPool(nn.Module):
  """Conv then 2x mean-pool (reference layers.py:351-366)."""
  output_dim: int
  kernel_size: int = 3
  biases: bool = True
  adjust_padding: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    if self.adjust_padding:
      x = jnp.pad(x, [(0, 0), (1, 0), (1, 0), (0, 0)])
    pad = self.kernel_size // 2
    out = NCSNConv(self.output_dim, kernel=self.kernel_size,
                   use_bias=self.biases,
                   padding=[(pad, pad), (pad, pad)], name="Conv_0")(x)
    return (out[:, ::2, ::2, :] + out[:, 1::2, ::2, :]
            + out[:, ::2, 1::2, :] + out[:, 1::2, 1::2, :]) / 4.0


class MeanPoolConv(nn.Module):
  """2x mean-pool then conv (reference layers.py:369-379)."""
  output_dim: int
  kernel_size: int = 3
  biases: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    x = (x[:, ::2, ::2, :] + x[:, 1::2, ::2, :]
         + x[:, ::2, 1::2, :] + x[:, 1::2, 1::2, :]) / 4.0
    return NCSNConv(self.output_dim, kernel=self.kernel_size,
                    use_bias=self.biases, name="Conv_0")(x)


class UpsampleConv(nn.Module):
  """Pixel-shuffle 2x upsample then conv (reference layers.py:382-394)."""
  output_dim: int
  kernel_size: int = 3
  biases: bool = True

  @nn.compact
  def __call__(self, x: Array) -> Array:
    b, h, w, c = x.shape
    # cat 4 copies channel-wise then depth-to-space == nearest upsample here
    y = jnp.concatenate([x, x, x, x], axis=-1)
    y = y.reshape(b, h, w, 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * 2, w * 2, c)
    return NCSNConv(self.output_dim, kernel=self.kernel_size,
                    use_bias=self.biases, name="Conv_0")(y)


class ResidualBlock(nn.Module):
  """NCSNv2 residual block (reference layers.py:453-507)."""
  output_dim: int
  normalization: Any
  resample: Optional[str] = None
  act: Callable = jax.nn.elu
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x: Array) -> Array:
    input_dim = x.shape[-1]
    h = self.normalization(name="Norm_0")(x)
    h = self.act(h)
    if self.resample == "down":
      if self.dilation > 1:
        h = ncsn_conv3x3(input_dim, dilation=self.dilation, name="Conv_0")(h)
        h = self.normalization(name="Norm_1")(h)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_1")(h)
        shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                name="Shortcut")(x)
      else:
        h = ncsn_conv3x3(input_dim, name="Conv_0")(h)
        h = self.normalization(name="Norm_1")(h)
        h = self.act(h)
        h = ConvMeanPool(self.output_dim, 3,
                         adjust_padding=self.adjust_padding, name="Conv_1")(h)
        shortcut = ConvMeanPool(self.output_dim, 1,
                                adjust_padding=self.adjust_padding,
                                name="Shortcut")(x)
    elif self.resample is None:
      if self.dilation > 1:
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_0")(h)
        h = self.normalization(name="Norm_1")(h)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_1")(h)
        if self.output_dim != input_dim:
          shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                  name="Shortcut")(x)
        else:
          shortcut = x
      else:
        h = ncsn_conv3x3(self.output_dim, name="Conv_0")(h)
        h = self.normalization(name="Norm_1")(h)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, name="Conv_1")(h)
        if self.output_dim != input_dim:
          shortcut = ncsn_conv1x1(self.output_dim, name="Shortcut")(x)
        else:
          shortcut = x
    else:
      raise ValueError("invalid resample value")
    return shortcut + h


class ConditionalResidualBlock(nn.Module):
  """Noise-conditional NCSNv1 residual block (reference layers.py:397-450)."""
  output_dim: int
  num_classes: int
  normalization: Any
  resample: Optional[str] = None
  act: Callable = jax.nn.elu
  adjust_padding: bool = False
  dilation: int = 1

  @nn.compact
  def __call__(self, x: Array, y: Array) -> Array:
    input_dim = x.shape[-1]
    h = self.normalization(input_dim, self.num_classes, name="Norm_0")(x, y)
    h = self.act(h)
    if self.resample == "down":
      if self.dilation > 1:
        h = ncsn_conv3x3(input_dim, dilation=self.dilation, name="Conv_0")(h)
        h = self.normalization(input_dim, self.num_classes, name="Norm_1")(h, y)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_1")(h)
        shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                name="Shortcut")(x)
      else:
        h = ncsn_conv3x3(input_dim, name="Conv_0")(h)
        h = self.normalization(input_dim, self.num_classes, name="Norm_1")(h, y)
        h = self.act(h)
        h = ConvMeanPool(self.output_dim, 3,
                         adjust_padding=self.adjust_padding, name="Conv_1")(h)
        shortcut = ConvMeanPool(self.output_dim, 1,
                                adjust_padding=self.adjust_padding,
                                name="Shortcut")(x)
    elif self.resample is None:
      if self.dilation > 1:
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_0")(h)
        h = self.normalization(self.output_dim, self.num_classes,
                               name="Norm_1")(h, y)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="Conv_1")(h)
        if self.output_dim != input_dim:
          shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                  name="Shortcut")(x)
        else:
          shortcut = x
      else:
        h = ncsn_conv3x3(self.output_dim, name="Conv_0")(h)
        h = self.normalization(self.output_dim, self.num_classes,
                               name="Norm_1")(h, y)
        h = self.act(h)
        h = ncsn_conv3x3(self.output_dim, name="Conv_1")(h)
        if self.output_dim != input_dim:
          shortcut = ncsn_conv1x1(self.output_dim, name="Shortcut")(x)
        else:
          shortcut = x
    else:
      raise ValueError("invalid resample value")
    return shortcut + h
