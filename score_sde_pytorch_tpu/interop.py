"""Reference-checkpoint interop: convert torch .pth weights to flax params.

Lets users of yang-song/score_sde_pytorch load their trained checkpoints into
this framework (SURVEY.md §7 "checkpoint interop"). The reference stores
models as a flat ``nn.ModuleList`` consumed positionally
(/root/reference/models/ncsnpp.py:232-381, ddpm.py:113-181); this module
replays the exact construction order to build an index→flax-name map, then
converts each tensor's layout:

* conv weights  OIHW → HWIO
* linear weights (out,in) → (in,out)
* GroupNorm weight/bias → scale/bias
* NIN W/b and norm params pass through

Entry point: :func:`torch_state_dict_to_flax(state_dict, config)` where
``state_dict`` maps ``all_modules.<idx>.<param>`` → numpy arrays (load the
.pth with ``torch.load(..., map_location='cpu')`` and call ``.numpy()``, or
pass any mapping of numpy arrays — no torch dependency here).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


# Reference params registered with requires_grad=False. The reference
# ExponentialMovingAverage filters shadow_params to trainable params only
# (reference models/ema.py:29,49,61), so the export direction must exclude
# these rows or every shadow param after them misaligns by one on
# ema.copy_to(model.parameters()). The only such param in the whole reference
# zoo is GaussianFourierProjection.W (reference models/layerspp.py:37), used
# by every NCSN++ config with embedding_type='fourier'.
_NON_TRAINABLE_FLAX_PATHS = frozenset({"FourierProj/W"})


def _conv(prefix_t, prefix_f, out):
  out.append((f"{prefix_t}.weight", f"{prefix_f}/kernel", "conv"))
  out.append((f"{prefix_t}.bias", f"{prefix_f}/bias", "copy"))


def _conv_nobias(prefix_t, prefix_f, out):
  out.append((f"{prefix_t}.weight", f"{prefix_f}/kernel", "conv"))


def _dense(prefix_t, prefix_f, out):
  out.append((f"{prefix_t}.weight", f"{prefix_f}/kernel", "dense"))
  out.append((f"{prefix_t}.bias", f"{prefix_f}/bias", "copy"))


def _groupnorm(prefix_t, prefix_f, out):
  out.append((f"{prefix_t}.weight", f"{prefix_f}/scale", "copy"))
  out.append((f"{prefix_t}.bias", f"{prefix_f}/bias", "copy"))


def _nin(prefix_t, prefix_f, out):
  out.append((f"{prefix_t}.W", f"{prefix_f}/W", "copy"))
  out.append((f"{prefix_t}.b", f"{prefix_f}/b", "copy"))


def _attn(idx, name, out):
  base = f"all_modules.{idx}"
  _groupnorm(f"{base}.GroupNorm_0", f"{name}/GroupNorm_0", out)
  for i in range(4):
    _nin(f"{base}.NIN_{i}", f"{name}/NIN_{i}", out)


def _resblock(idx, name, out, *, resblock_type, in_ch, out_ch, up=False,
              down=False, temb=True):
  """ResnetBlockDDPMpp / ResnetBlockBigGANpp parameter rows
  (reference layerspp.py:166-274)."""
  base = f"all_modules.{idx}"
  _groupnorm(f"{base}.GroupNorm_0", f"{name}/GroupNorm_0", out)
  _conv(f"{base}.Conv_0", f"{name}/Conv_0", out)
  if temb:
    _dense(f"{base}.Dense_0", f"{name}/Dense_0", out)
  _groupnorm(f"{base}.GroupNorm_1", f"{name}/GroupNorm_1", out)
  _conv(f"{base}.Conv_1", f"{name}/Conv_1", out)
  if resblock_type == "biggan":
    if in_ch != out_ch or up or down:
      _conv(f"{base}.Conv_2", f"{name}/Conv_2", out)
  else:
    if in_ch != out_ch:
      _nin(f"{base}.NIN_0", f"{name}/NIN_0", out)


def _updown_sample(idx, name, out, *, with_conv, fir):
  base = f"all_modules.{idx}"
  if not with_conv:
    return
  if fir:
    out.append((f"{base}.Conv2d_0.weight", f"{name}/Conv2d_0/weight",
                "conv"))
    out.append((f"{base}.Conv2d_0.bias", f"{name}/Conv2d_0/bias", "copy"))
  else:
    _conv(f"{base}.Conv_0", f"{name}/Conv_0", out)


def ncsnpp_param_map(config) -> List[Tuple[str, str, str]]:
  """Replay NCSNpp construction (reference ncsnpp.py:69-230) to produce
  (torch_key, flax_path, transform) rows."""
  rows: List[Tuple[str, str, str]] = []
  m = config.model
  nf = m.nf
  ch_mult = tuple(m.ch_mult)
  num_res_blocks = m.num_res_blocks
  num_resolutions = len(ch_mult)
  attn_resolutions = tuple(m.attn_resolutions)
  all_resolutions = [config.data.image_size // (2 ** i)
                     for i in range(num_resolutions)]
  fir = m.fir
  resamp_with_conv = m.resamp_with_conv
  resblock_type = m.resblock_type.lower()
  progressive = m.progressive.lower()
  progressive_input = m.progressive_input.lower()
  embedding_type = m.embedding_type.lower()
  combine_method = m.progressive_combine.lower()
  channels = config.data.num_channels

  idx = 0
  if embedding_type == "fourier":
    rows.append((f"all_modules.{idx}.W", "FourierProj/W", "copy"))
    idx += 1
  if m.conditional:
    _dense(f"all_modules.{idx}", "Dense_t0", rows); idx += 1
    _dense(f"all_modules.{idx}", "Dense_t1", rows); idx += 1

  _conv(f"all_modules.{idx}", "conv_in", rows); idx += 1

  hs_c = [nf]
  in_ch = nf
  input_pyramid_ch = channels
  for i_level in range(num_resolutions):
    for i_block in range(num_res_blocks):
      out_ch = nf * ch_mult[i_level]
      _resblock(idx, f"down_{i_level}_block_{i_block}", rows,
                resblock_type=resblock_type, in_ch=in_ch, out_ch=out_ch)
      idx += 1
      in_ch = out_ch
      if all_resolutions[i_level] in attn_resolutions:
        _attn(idx, f"down_{i_level}_attn_{i_block}", rows); idx += 1
      hs_c.append(in_ch)
    if i_level != num_resolutions - 1:
      if resblock_type == "ddpm":
        _updown_sample(idx, f"down_{i_level}_downsample", rows,
                       with_conv=resamp_with_conv, fir=fir)
      else:
        _resblock(idx, f"down_{i_level}_downsample", rows,
                  resblock_type=resblock_type, in_ch=in_ch, out_ch=in_ch,
                  down=True)
      idx += 1
      if progressive_input == "input_skip":
        _conv(f"all_modules.{idx}.Conv_0", f"combine_{i_level}/Conv_0", rows)
        idx += 1
        if combine_method == "cat":
          in_ch *= 2
      elif progressive_input == "residual":
        # pyramid_downsample with conv (Conv2dFused)
        rows.append((f"all_modules.{idx}.Conv2d_0.weight",
                     f"pyramid_downsample_{i_level}/Conv2d_0/weight", "conv"))
        rows.append((f"all_modules.{idx}.Conv2d_0.bias",
                     f"pyramid_downsample_{i_level}/Conv2d_0/bias", "copy"))
        idx += 1
        input_pyramid_ch = in_ch
      hs_c.append(in_ch)

  _resblock(idx, "mid_block_0", rows, resblock_type=resblock_type,
            in_ch=in_ch, out_ch=in_ch); idx += 1
  _attn(idx, "mid_attn", rows); idx += 1
  _resblock(idx, "mid_block_1", rows, resblock_type=resblock_type,
            in_ch=in_ch, out_ch=in_ch); idx += 1

  pyramid_ch = 0
  for i_level in reversed(range(num_resolutions)):
    for i_block in range(num_res_blocks + 1):
      out_ch = nf * ch_mult[i_level]
      _resblock(idx, f"up_{i_level}_block_{i_block}", rows,
                resblock_type=resblock_type, in_ch=in_ch + hs_c.pop(),
                out_ch=out_ch)
      idx += 1
      in_ch = out_ch
    if all_resolutions[i_level] in attn_resolutions:
      _attn(idx, f"up_{i_level}_attn", rows); idx += 1
    if progressive != "none":
      if i_level == num_resolutions - 1:
        _groupnorm(f"all_modules.{idx}", f"pyramid_norm_{i_level}", rows)
        idx += 1
        _conv(f"all_modules.{idx}", f"pyramid_conv_{i_level}", rows)
        idx += 1
        pyramid_ch = channels if progressive == "output_skip" else in_ch
      else:
        if progressive == "output_skip":
          _groupnorm(f"all_modules.{idx}", f"pyramid_norm_{i_level}", rows)
          idx += 1
          _conv(f"all_modules.{idx}", f"pyramid_conv_{i_level}", rows)
          idx += 1
          pyramid_ch = channels
        elif progressive == "residual":
          rows.append((f"all_modules.{idx}.Conv2d_0.weight",
                       f"pyramid_upsample_{i_level}/Conv2d_0/weight", "conv"))
          rows.append((f"all_modules.{idx}.Conv2d_0.bias",
                       f"pyramid_upsample_{i_level}/Conv2d_0/bias", "copy"))
          idx += 1
          pyramid_ch = in_ch
    if i_level != 0:
      if resblock_type == "ddpm":
        _updown_sample(idx, f"up_{i_level}_upsample", rows,
                       with_conv=resamp_with_conv, fir=fir)
      else:
        _resblock(idx, f"up_{i_level}_upsample", rows,
                  resblock_type=resblock_type, in_ch=in_ch, out_ch=in_ch,
                  up=True)
      idx += 1

  if progressive != "output_skip":
    _groupnorm(f"all_modules.{idx}", "norm_out", rows); idx += 1
    _conv(f"all_modules.{idx}", "conv_out", rows); idx += 1
  return rows


def ddpm_param_map(config) -> List[Tuple[str, str, str]]:
  """Replay DDPM construction (reference ddpm.py:41-107)."""
  rows: List[Tuple[str, str, str]] = []
  m = config.model
  nf = m.nf
  ch_mult = tuple(m.ch_mult)
  num_res_blocks = m.num_res_blocks
  num_resolutions = len(ch_mult)
  attn_resolutions = tuple(m.attn_resolutions)
  all_resolutions = [config.data.image_size // (2 ** i)
                     for i in range(num_resolutions)]
  resamp_with_conv = m.resamp_with_conv

  def legacy_resblock(idx, name, in_ch, out_ch):
    base = f"all_modules.{idx}"
    _groupnorm(f"{base}.GroupNorm_0", f"{name}/GroupNorm_0", rows)
    _conv(f"{base}.Conv_0", f"{name}/Conv_0", rows)
    if m.conditional:
      _dense(f"{base}.Dense_0", f"{name}/Dense_0", rows)
    else:
      # Reference modules own Dense_0 params even when conditional=False
      # (ddpm.py:57 passes temb_dim unconditionally) but never use them;
      # our flax module creates the layer lazily, so consume-and-drop. The
      # third slot carries the torch shape — nn.Linear(4nf, out_ch) keeps
      # weight (out_ch, 4nf)/bias (out_ch,) — so the export direction can
      # emit correctly-shaped zeros for every block.
      rows.append((f"{base}.Dense_0.weight", None, (out_ch, nf * 4)))
      rows.append((f"{base}.Dense_0.bias", None, (out_ch,)))
    _groupnorm(f"{base}.GroupNorm_1", f"{name}/GroupNorm_1", rows)
    _conv(f"{base}.Conv_1", f"{name}/Conv_1", rows)
    if in_ch != out_ch:
      _nin(f"{base}.NIN_0", f"{name}/NIN_0", rows)

  def legacy_attn(idx, name):
    base = f"all_modules.{idx}"
    _groupnorm(f"{base}.GroupNorm_0", f"{name}/GroupNorm_0", rows)
    for i in range(4):
      _nin(f"{base}.NIN_{i}", f"{name}/NIN_{i}", rows)

  idx = 0
  if m.conditional:
    _dense(f"all_modules.{idx}", "Dense_t0", rows); idx += 1
    _dense(f"all_modules.{idx}", "Dense_t1", rows); idx += 1
  _conv(f"all_modules.{idx}", "conv_in", rows); idx += 1

  hs_c = [nf]
  in_ch = nf
  for i_level in range(num_resolutions):
    for i_block in range(num_res_blocks):
      out_ch = nf * ch_mult[i_level]
      legacy_resblock(idx, f"down_{i_level}_block_{i_block}", in_ch, out_ch)
      idx += 1
      in_ch = out_ch
      if all_resolutions[i_level] in attn_resolutions:
        legacy_attn(idx, f"down_{i_level}_attn_{i_block}"); idx += 1
      hs_c.append(in_ch)
    if i_level != num_resolutions - 1:
      if resamp_with_conv:
        _conv(f"all_modules.{idx}.Conv_0",
              f"down_{i_level}_downsample/Conv_0", rows)
      idx += 1
      hs_c.append(in_ch)

  legacy_resblock(idx, "mid_block_0", in_ch, in_ch); idx += 1
  legacy_attn(idx, "mid_attn"); idx += 1
  legacy_resblock(idx, "mid_block_1", in_ch, in_ch); idx += 1

  for i_level in reversed(range(num_resolutions)):
    for i_block in range(num_res_blocks + 1):
      out_ch = nf * ch_mult[i_level]
      legacy_resblock(idx, f"up_{i_level}_block_{i_block}",
                      in_ch + hs_c.pop(), out_ch)
      idx += 1
      in_ch = out_ch
    if all_resolutions[i_level] in attn_resolutions:
      legacy_attn(idx, f"up_{i_level}_attn"); idx += 1
    if i_level != 0:
      if resamp_with_conv:
        _conv(f"all_modules.{idx}.Conv_0",
              f"up_{i_level}_upsample/Conv_0", rows)
      idx += 1

  _groupnorm(f"all_modules.{idx}", "norm_out", rows); idx += 1
  _conv(f"all_modules.{idx}", "conv_out", rows); idx += 1
  return rows


def _in2plus(prefix_t, prefix_f, out, bias=True):
  """InstanceNorm2dPlus params (reference normalization.py:157-178):
  alpha/gamma/beta vectors pass through unchanged."""
  out.append((f"{prefix_t}.alpha", f"{prefix_f}/alpha", "copy"))
  out.append((f"{prefix_t}.gamma", f"{prefix_f}/gamma", "copy"))
  if bias:
    out.append((f"{prefix_t}.beta", f"{prefix_f}/beta", "copy"))


def _v2_resblock(t, f, out, *, resample, dilation, has_shortcut,
                 adjust_padding=False):
  """NCSNv2 ResidualBlock rows (reference layers.py:453-507). Torch names
  are attributes (normalize1/conv1/...); ConvMeanPool nests its conv as
  ``.conv`` (``.conv.1`` behind the ZeroPad2d Sequential when
  adjust_padding, reference layers.py:355-363). Row order follows the
  reference's REGISTRATION order — conv1, normalize2, conv2, shortcut,
  normalize1 last (layers.py:462-492) — which the export direction's
  parameters()-order EMA contract depends on."""
  _conv(f"{t}.conv1", f"{f}/Conv_0", out)
  _in2plus(f"{t}.normalize2", f"{f}/Norm_1", out)
  if resample == "down" and dilation == 1:
    seq = ".1" if adjust_padding else ""
    _conv(f"{t}.conv2.conv{seq}", f"{f}/Conv_1/Conv_0", out)
    _conv(f"{t}.shortcut.conv{seq}", f"{f}/Shortcut/Conv_0", out)
  else:
    _conv(f"{t}.conv2", f"{f}/Conv_1", out)
    if resample == "down" or has_shortcut:
      _conv(f"{t}.shortcut", f"{f}/Shortcut", out)
  _in2plus(f"{t}.normalize1", f"{f}/Norm_0", out)


def _rcu_rows(t, f, out, n_blocks, n_stages=2):
  """RCUBlock convs: torch ``{b}_{s}_conv`` attrs, bias-free
  (reference layers.py:184-206)."""
  for b in range(1, n_blocks + 1):
    for s in range(1, n_stages + 1):
      _conv_nobias(f"{t}.{b}_{s}_conv", f"{f}/Conv_{b}_{s}", out)


def _refine_rows(t, f, out, *, n_inputs, start=False, end=False):
  """RefineBlock rows (reference layers.py:277-310): per-input adapt RCUs,
  MSF fusion convs (absent when start), CRP convs, output RCU (3 blocks
  when end)."""
  for i in range(n_inputs):
    _rcu_rows(f"{t}.adapt_convs.{i}", f"{f}/RCU_{i}", out, 2)
  _rcu_rows(f"{t}.output_convs", f"{f}/RCU_out", out, 3 if end else 1)
  if not start:
    for i in range(n_inputs):
      _conv(f"{t}.msf.convs.{i}", f"{f}/MSF/Conv_{i}", out)
  for i in range(2):
    _conv_nobias(f"{t}.crp.convs.{i}", f"{f}/CRP/Conv_{i}", out)


def ncsnv2_param_map(config) -> List[Tuple[str, str, str]]:
  """NCSNv2 64/128/256 map (reference ncsnv2.py:43-130,222-313,316-415).

  Unlike NCSN++/DDPM these are named-attribute models (no positional
  ModuleList replay) — the map walks the attribute tree. Only the shipped
  ``InstanceNorm++`` normalization is supported.

  NOTE on the reference: as shipped, this family cannot run — two latent
  bugs make it (a) non-constructible (``ncsn_conv3x3(bias=False)`` hits
  ``conv.bias.data`` on a None bias, reference layers.py:114, used by every
  RCU/CRP block) and (b) shape-inconsistent in the dilated ResidualBlocks
  (``padding=1`` with dilation>1 shrinks the main path more than the
  shortcut, layers.py:108-116,507 — the upstream ermongroup/ncsnv2 code
  these were ported from uses ``padding=dilation``). This map (and our
  models) implement the upstream-correct semantics; the interop parity test
  patches the two reference bugs the same way to compare numerics."""
  if config.model.normalization != "InstanceNorm++":
    raise NotImplementedError(
        f"ncsnv2 interop supports InstanceNorm++ only, "
        f"got {config.model.normalization}")
  name = config.model.name
  nf = config.model.nf
  adjust = config.data.image_size == 28
  # (torch attr, resample of block 0, dilation, adjust_padding);
  # every pair's second block is (out→out, resample=None) — no shortcut.
  if name == "ncsnv2_64":
    res = [("res1", None, 1, False), ("res2", "down", 1, False),
           ("res3", "down", 2, False), ("res4", "down", 4, adjust)]
    refines = ["refine1", "refine2", "refine3", "refine4"]
  elif name == "ncsnv2_128":
    res = [("res1", None, 1, False), ("res2", "down", 1, False),
           ("res3", "down", 1, False), ("res4", "down", 2, False),
           ("res5", "down", 4, False)]
    refines = ["refine1", "refine2", "refine3", "refine4", "refine5"]
  elif name == "ncsnv2_256":
    res = [("res1", None, 1, False), ("res2", "down", 1, False),
           ("res3", "down", 1, False), ("res31", "down", 1, False),
           ("res4", "down", 2, False), ("res5", "down", 4, False)]
    refines = ["refine1", "refine2", "refine31", "refine3", "refine4",
               "refine5"]
  else:
    raise NotImplementedError(f"unknown ncsnv2 variant {name}")
  del nf  # channel counts do not affect the row structure

  rows: List[Tuple[str, str, str]] = []
  _conv("begin_conv", "begin_conv", rows)
  _in2plus("normalizer", "normalizer", rows)
  _conv("end_conv", "end_conv", rows)
  for attr, resample, dilation, adj in res:
    _v2_resblock(f"{attr}.0", f"{attr}_0", rows, resample=resample,
                 dilation=dilation, has_shortcut=False, adjust_padding=adj)
    _v2_resblock(f"{attr}.1", f"{attr}_1", rows, resample=None,
                 dilation=dilation, has_shortcut=False)
  for k, attr in enumerate(refines):
    _refine_rows(attr, attr, rows, n_inputs=1 if k == 0 else 2,
                 start=k == 0, end=k == len(refines) - 1)
  return rows


def _transform(arr: np.ndarray, kind: str) -> np.ndarray:
  if kind == "conv":
    assert arr.ndim == 4, arr.shape
    return np.transpose(arr, (2, 3, 1, 0))  # OIHW → HWIO
  if kind == "dense":
    assert arr.ndim == 2
    return arr.T
  return arr


def _insert(tree: Dict, path: str, value: np.ndarray):
  parts = path.split("/")
  node = tree
  for p in parts[:-1]:
    node = node.setdefault(p, {})
  node[parts[-1]] = value


def torch_state_dict_to_flax(state_dict: Dict[str, np.ndarray],
                             config) -> Dict:
  """Convert a reference model state_dict (numpy values) to a flax params
  tree for the equivalent model here. Raises if any torch key is missing or
  left unconsumed (structural check)."""
  rows = _param_rows(config)

  # The reference wraps in DataParallel → keys may carry "module." prefix;
  # `sigmas` is a buffer, not a param.
  cleaned = {}
  for k, v in state_dict.items():
    k = k[len("module."):] if k.startswith("module.") else k
    if k == "sigmas":
      continue
    cleaned[k] = np.asarray(v)

  tree: Dict = {}
  consumed = set()
  for torch_key, flax_path, kind in rows:
    if torch_key not in cleaned:
      raise KeyError(f"reference checkpoint missing {torch_key}")
    consumed.add(torch_key)
    if flax_path is None:  # consume-and-drop (unused reference params)
      continue
    _insert(tree, flax_path, _transform(cleaned[torch_key], kind))
  leftovers = set(cleaned) - consumed
  if leftovers:
    raise ValueError(f"unconsumed reference params: {sorted(leftovers)[:8]}"
                     f" (+{max(0, len(leftovers) - 8)} more)")
  return tree


def _param_rows(config) -> List[Tuple[str, str, str]]:
  name = config.model.name
  if name == "ncsnpp":
    return ncsnpp_param_map(config)
  if name == "ddpm":
    return ddpm_param_map(config)
  if name in ("ncsnv2_64", "ncsnv2_128", "ncsnv2_256"):
    return ncsnv2_param_map(config)
  raise NotImplementedError(f"interop for model {name} not implemented")


def _inverse_transform(arr: np.ndarray, kind: str) -> np.ndarray:
  if kind == "conv":
    assert arr.ndim == 4, arr.shape
    return np.transpose(arr, (3, 2, 0, 1))  # HWIO → OIHW
  if kind == "dense":
    assert arr.ndim == 2
    return arr.T
  return arr


def _lookup(tree: Dict, path: str) -> np.ndarray:
  node = tree
  for p in path.split("/"):
    node = node[p]
  return np.asarray(node)


def flax_params_to_torch_state_dict(params: Dict, config,
                                    module_prefix: bool = False
                                    ) -> Dict[str, np.ndarray]:
  """Inverse of :func:`torch_state_dict_to_flax`: export a flax params tree
  (e.g. the trained EMA params) as a reference-layout state_dict of numpy
  arrays, in the reference model's parameter-registration order.

  With ``module_prefix=True`` keys carry the ``module.`` prefix the
  reference's ``torch.nn.DataParallel`` wrapper expects (reference
  models/utils.py:93) — required when loading through the reference's own
  ``utils.restore_checkpoint``; use :func:`export_torch_checkpoint` for a
  complete .pth that restore consumes directly. Without the prefix the
  dict loads into a bare (unwrapped) reference model via
  ``model.load_state_dict(sd)`` — strict=True works: the ``sigmas`` buffer
  all three reference families register in ``__init__`` before any module
  (reference ncsnpp.py:42, ddpm.py:44, ncsnv2.py:52) is emitted first,
  recomputed from config exactly as the reference does
  (``torch.tensor(get_sigmas(config))`` → float64). Reference params the
  import map drops — e.g. DDPM's unused unconditional Dense_0 — are
  emitted as correctly-shaped zeros (the drop rows carry their torch
  shape)."""
  prefix = "module." if module_prefix else ""
  out: Dict[str, np.ndarray] = {}
  out[prefix + "sigmas"] = np.exp(np.linspace(
      np.log(config.model.sigma_max), np.log(config.model.sigma_min),
      config.model.num_scales))  # float64, matching torch.tensor(ndarray)
  for torch_key, flax_path, kind in _param_rows(config):
    if flax_path is None:
      # kind carries the torch shape for consume-and-drop rows.
      out[prefix + torch_key] = np.zeros(kind, np.float32)
      continue
    out[prefix + torch_key] = _inverse_transform(_lookup(params, flax_path),
                                                 kind)
  return out


def export_torch_checkpoint(params: Dict, config, path: str,
                            step: int = 0) -> None:
  """Write a COMPLETE reference-consumable .pth checkpoint (requires torch).

  The reference's ``utils.restore_checkpoint`` (reference utils.py:7-19)
  indexes ``loaded['optimizer']/['model']/['ema']/['step']`` and loads the
  model dict into a DataParallel wrapper — a bare params export satisfies
  none of that. This emits all four:

  - ``model``: ``module.``-prefixed state_dict (DataParallel layout),
    including the ``module.sigmas`` buffer — the exported dict matches the
    reference's own save_checkpoint schema key-for-key (strict=True loads).
  - ``ema``: the reference ``ExponentialMovingAverage`` schema
    (reference models/ema.py:91-98) — ``decay`` from
    ``config.model.ema_rate``, ``num_updates=step``, ``shadow_params``
    matching ``[p for p in model.parameters() if p.requires_grad]`` in
    order (reference models/ema.py:29) — i.e. registration order MINUS the
    non-trainable GaussianFourierProjection.W of fourier-embedding NCSN++
    models (pinned against the live reference model in
    tests/test_interop.py).
  - ``optimizer``: a fresh torch Adam state_dict over ``model.parameters()``
    (ALL params, trainable or not — reference run_lib passes
    ``model.parameters()`` straight to losses.get_optimizer) with the
    reference hyperparameters, so ``optimizer.load_state_dict`` succeeds
    and training resumes with reset moments.
  - ``step``.
  """
  import torch
  sd = flax_params_to_torch_state_dict(params, config, module_prefix=True)
  param_keys = ["module." + tk for tk, _, _ in _param_rows(config)]
  shadow_keys = ["module." + tk for tk, fp, _ in _param_rows(config)
                 if fp not in _NON_TRAINABLE_FLAX_PATHS]
  all_params = [torch.from_numpy(np.ascontiguousarray(sd[k]).copy())
                for k in param_keys]
  optim_cfg = config.get("optim", None)
  tensors = [torch.nn.Parameter(t.clone()) for t in all_params]
  opt = torch.optim.Adam(
      tensors,
      lr=optim_cfg.lr if optim_cfg else 2e-4,
      betas=((optim_cfg.beta1 if optim_cfg else 0.9), 0.999),
      eps=optim_cfg.eps if optim_cfg else 1e-8,
      weight_decay=optim_cfg.weight_decay if optim_cfg else 0)
  ckpt = {
      "model": {k: torch.from_numpy(np.ascontiguousarray(v).copy())
                for k, v in sd.items()},
      "ema": {"decay": float(config.model.ema_rate),
              "num_updates": int(step),
              "shadow_params": [
                  torch.from_numpy(np.ascontiguousarray(sd[k]).copy())
                  for k in shadow_keys]},
      "optimizer": opt.state_dict(),
      "step": int(step),
  }
  torch.save(ckpt, path)


def load_torch_checkpoint(path: str, config) -> Dict:
  """Load a reference .pth checkpoint file and convert the EMA-free model
  params (requires torch; CPU is enough)."""
  import torch
  ckpt = torch.load(path, map_location="cpu", weights_only=False)
  model_sd = ckpt["model"] if "model" in ckpt else ckpt
  np_sd = {k: v.detach().cpu().numpy() for k, v in model_sd.items()}
  return torch_state_dict_to_flax(np_sd, config)
