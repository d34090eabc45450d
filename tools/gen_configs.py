"""Generate the leaf config files (hyperparameter tables from the reference's
38 shipped configs, re-expressed in the declarative builder style)."""
import os

ROOT = os.path.join(os.path.dirname(__file__), "..",
                    "score_sde_pytorch_tpu", "configs")

# Shared model blocks -------------------------------------------------------

NCSNPP = dict(name="'ncsnpp'", normalization="'GroupNorm'",
              nonlinearity="'swish'", nf=128, attn_resolutions="(16,)",
              resamp_with_conv=True, conditional=True,
              fir_kernel="[1, 3, 3, 1]", skip_rescale=True,
              resblock_type="'biggan'", progressive_combine="'sum'",
              attention_type="'ddpm'", conv_size=3)

DDPM_M = dict(name="'ddpm'", normalization="'GroupNorm'",
              nonlinearity="'swish'", nf=128, attn_resolutions="(16,)",
              resamp_with_conv=True, conditional=True)

NCSN_M = dict(name="'ncsn'", scale_by_sigma=False,
              normalization="'InstanceNorm++'", nonlinearity="'elu'",
              nf=128, interpolation="'bilinear'")

# amsgrad is carried for schema parity with the reference configs; the
# reference itself never reads it (reference losses.py:26-35 passes only
# lr/betas/eps/weight_decay to torch Adam) — ours honors amsgrad=True.
NCSN_OPT = dict(weight_decay=0, optimizer="'Adam'", lr="1e-3", beta1=0.9,
                amsgrad=False, eps="1e-8", warmup=0, grad_clip="-1.")
NCSNV2_OPT = dict(NCSN_OPT, lr="1e-4")


def m(base, **kw):
  d = dict(base)
  d.update(kw)
  return d


def fmt(v):
  return str(v)


# (path, base, ref, sections) ----------------------------------------------

CONFIGS = []


def add(path, base, ref, **sections):
  CONFIGS.append((path, base, ref, sections))


PC_RD_L = dict(method="'pc'", predictor="'reverse_diffusion'",
               corrector="'langevin'")
PC_EM = dict(method="'pc'", predictor="'euler_maruyama'", corrector="'none'")
PC_AS = dict(method="'pc'", predictor="'ancestral_sampling'",
             corrector="'none'")
PC_RD = dict(method="'pc'", predictor="'reverse_diffusion'",
             corrector="'none'")

# --- VE --------------------------------------------------------------------

VE_CIFAR_NCSNPP = m(NCSNPP, scale_by_sigma=True, ema_rate=0.999,
                    ch_mult="(1, 2, 2, 2)", num_res_blocks=4, fir=True,
                    progressive="'none'", progressive_input="'residual'",
                    init_scale="0.")

add("ve/cifar10_ncsnpp_continuous.py", "cifar10",
    "configs/ve/cifar10_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True),
    sampling=PC_RD_L,
    model=m(VE_CIFAR_NCSNPP, fourier_scale=16))

add("ve/cifar10_ncsnpp.py", "cifar10", "configs/ve/cifar10_ncsnpp.py",
    training=dict(sde="'vesde'", continuous=False),
    sampling=PC_RD_L,
    model=m(VE_CIFAR_NCSNPP, init_scale="0.0",
            embedding_type="'positional'"))

add("ve/cifar10_ncsnpp_deep_continuous.py", "cifar10",
    "configs/ve/cifar10_ncsnpp_deep_continuous.py",
    training=dict(sde="'vesde'", continuous=True, n_iters=950001),
    sampling=PC_RD_L,
    model=m(VE_CIFAR_NCSNPP, num_res_blocks=8, fourier_scale=16,
            init_scale="0.0"))

add("ve/cifar10_ddpm.py", "cifar10", "configs/ve/cifar10_ddpm.py",
    training=dict(sde="'vesde'", continuous=False),
    sampling=PC_RD_L,
    model=m(DDPM_M, scale_by_sigma=True, ema_rate=0.999,
            ch_mult="(1, 2, 2, 2)", num_res_blocks=2, conv_size=3))

add("ve/celeba_ncsnpp.py", "celeba", "configs/ve/celeba_ncsnpp.py",
    training=dict(sde="'vesde'", continuous=False),
    sampling=PC_RD_L,
    model=m(VE_CIFAR_NCSNPP, sigma_begin=90, init_scale="0.0",
            embedding_type="'positional'"))

VE_LSUN_NCSNPP = m(NCSNPP, scale_by_sigma=True, ema_rate=0.999,
                   ch_mult="(1, 1, 2, 2, 2, 2, 2)", num_res_blocks=2,
                   fir=True, progressive="'output_skip'",
                   progressive_input="'input_skip'", init_scale="0.",
                   fourier_scale=16, remat=True)

add("ve/bedroom_ncsnpp_continuous.py", "lsun",
    "configs/ve/bedroom_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True),
    sampling=PC_RD_L,
    data=dict(category="'bedroom'"),
    model=VE_LSUN_NCSNPP)

add("ve/church_ncsnpp_continuous.py", "lsun",
    "configs/ve/church_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True),
    sampling=PC_RD_L,
    data=dict(category="'church_outdoor'"),
    model=m(VE_LSUN_NCSNPP, sigma_max=380))

add("ve/celebahq_256_ncsnpp_continuous.py", "lsun",
    "configs/ve/celebahq_256_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True),
    sampling=PC_RD_L,
    data=dict(dataset="'CelebAHQ'", image_size=256, tfrecords_path="''"),
    model=m(VE_LSUN_NCSNPP, sigma_max=348))

add("ve/ffhq_256_ncsnpp_continuous.py", "lsun",
    "configs/ve/ffhq_256_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True),
    sampling=PC_RD_L,
    data=dict(dataset="'FFHQ'", image_size=256, tfrecords_path="''"),
    model=m(VE_LSUN_NCSNPP, sigma_max=348))

VE_1024 = m(NCSNPP, scale_by_sigma=True, sigma_max=1348, num_scales=2000,
            ema_rate=0.9999, sigma_min=0.01, nf=16,
            ch_mult="(1, 2, 4, 8, 16, 32, 32, 32)", num_res_blocks=1,
            dropout="0.", fir=True, progressive="'output_skip'",
            progressive_input="'input_skip'", init_scale="0.",
            fourier_scale=16, embedding_type="'fourier'", remat=True)

add("ve/celebahq_ncsnpp_continuous.py", "lsun",
    "configs/ve/celebahq_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True, batch_size=8,
                  reduce_mean=False),
    sampling=m(PC_RD_L, snr=0.15),
    eval=dict(batch_size=1024, begin_ckpt=1, end_ckpt=96),
    data=dict(dataset="'CelebAHQ'", image_size=1024, tfrecords_path="''"),
    model=VE_1024, optim=dict(amsgrad=False))

add("ve/ffhq_ncsnpp_continuous.py", "lsun",
    "configs/ve/ffhq_ncsnpp_continuous.py",
    training=dict(sde="'vesde'", continuous=True, batch_size=8,
                  reduce_mean=True),
    sampling=m(PC_RD_L, snr=0.15),
    eval=dict(batch_size=1024, begin_ckpt=1, end_ckpt=96),
    data=dict(dataset="'FFHQ'", image_size=1024, tfrecords_path="''"),
    model=VE_1024, optim=dict(amsgrad=False))

# --- VE legacy NCSN / NCSNv2 ----------------------------------------------

for ds, base in (("cifar10", "cifar10"), ("celeba", "celeba")):
  snr5, snr124 = (("0.316", "0.176") if ds == "cifar10"
                  else ("0.316", "0.128"))
  scales124 = 232 if ds == "cifar10" else 500
  # reference ve/ncsn/celeba.py:26 carries a dead `training.loss` key
  # (read nowhere); ported verbatim for schema parity.
  add(f"ve/ncsn/{ds}.py", base, f"configs/ve/ncsn/{ds}.py",
      training=(dict(sde="'vesde'", loss="'vesde'", continuous=False)
                if ds == "celeba" else
                dict(sde="'vesde'", continuous=False)),
      sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                    n_steps_each=100, snr=snr5),
      model=m(NCSN_M, sigma_max=1, num_scales=10, ema_rate="0."),
      optim=NCSN_OPT)
  add(f"ve/ncsn/{ds}_5.py", base, f"configs/ve/ncsn/{ds}_5.py",
      training=dict(sde="'vesde'", continuous=False),
      sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                    n_steps_each=100, snr=snr5),
      model=m(NCSN_M, sigma_max=1, num_scales=10, ema_rate=0.999),
      optim=NCSN_OPT)
  add(f"ve/ncsn/{ds}_124.py", base, f"configs/ve/ncsn/{ds}_124.py",
      training=dict(sde="'vesde'", continuous=False),
      sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                    n_steps_each=5, snr=snr124),
      model=m(NCSN_M, num_scales=scales124, ema_rate="0."),
      optim=NCSN_OPT)
  add(f"ve/ncsn/{ds}_1245.py", base, f"configs/ve/ncsn/{ds}_1245.py",
      training=dict(sde="'vesde'", continuous=False),
      sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                    n_steps_each=5, snr=snr124),
      model=m(NCSN_M, num_scales=scales124, ema_rate=0.999),
      optim=NCSN_OPT)

add("ve/ncsnv2/cifar10.py", "cifar10", "configs/ve/ncsnv2/cifar10.py",
    training=dict(sde="'vesde'", continuous=False),
    sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                  n_steps_each=5, snr=0.176),
    model=dict(name="'ncsnv2_64'", scale_by_sigma=True, num_scales=232,
               ema_rate=0.999, normalization="'InstanceNorm++'",
               nonlinearity="'elu'", nf=128, interpolation="'bilinear'"),
    optim=NCSNV2_OPT)

add("ve/ncsnv2/celeba.py", "celeba", "configs/ve/ncsnv2/celeba.py",
    training=dict(sde="'vesde'", continuous=False),
    sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                  n_steps_each=5, snr=0.128),
    model=dict(name="'ncsnv2_64'", scale_by_sigma=True, num_scales=500,
               ema_rate=0.999, normalization="'InstanceNorm++'",
               nonlinearity="'elu'", nf=128, interpolation="'bilinear'"),
    optim=NCSNV2_OPT)

# reference ve/ncsnv2/bedroom.py:28 sets `training.continuouse` — a typo'd
# dead key (the real `continuous` stays at the lsun base's True, and the
# discrete-SMLD branch is selected by continuous=False... which the typo
# MISSES: the reference trains this leaf with the continuous loss). We port
# the typo key for schema parity but keep continuous=False — the value the
# leaf plainly intended and the one matching the ncsnv2 paper protocol.
add("ve/ncsnv2/bedroom.py", "lsun", "configs/ve/ncsnv2/bedroom.py",
    training=dict(sde="'vesde'", continuous=False, continuouse=False,
                  batch_size=128),
    sampling=dict(method="'pc'", predictor="'none'", corrector="'ald'",
                  n_steps_each=3, snr=0.095),
    data=dict(category="'bedroom'", image_size=128),
    model=dict(name="'ncsnv2_128'", scale_by_sigma=True, sigma_max=190,
               num_scales=1086, ema_rate=0.9999, sigma_min=0.01,
               normalization="'InstanceNorm++'", nonlinearity="'elu'",
               nf=128, interpolation="'bilinear'"),
    optim=NCSNV2_OPT)

# --- VP --------------------------------------------------------------------

VP_DDPMPP = m(NCSNPP, scale_by_sigma=False, ema_rate=0.9999,
              ch_mult="(1, 2, 2, 2)", num_res_blocks=4, fir=False,
              progressive="'none'", progressive_input="'none'",
              init_scale="0.", embedding_type="'positional'",
              fourier_scale=16)
VP_NCSNPP = m(VP_DDPMPP, fir=True, progressive_input="'residual'")

add("vp/cifar10_ddpmpp.py", "cifar10", "configs/vp/cifar10_ddpmpp.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS, data=dict(centered=True), model=VP_DDPMPP)

add("vp/cifar10_ddpmpp_continuous.py", "cifar10",
    "configs/vp/cifar10_ddpmpp_continuous.py",
    training=dict(sde="'vpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True), model=VP_DDPMPP)

add("vp/cifar10_ddpmpp_deep_continuous.py", "cifar10",
    "configs/vp/cifar10_ddpmpp_deep_continuous.py",
    training=dict(sde="'vpsde'", continuous=True, reduce_mean=True,
                  n_iters=950001),
    sampling=PC_EM, data=dict(centered=True),
    model=m(VP_DDPMPP, num_res_blocks=8))

add("vp/cifar10_ncsnpp.py", "cifar10", "configs/vp/cifar10_ncsnpp.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_RD, data=dict(centered=True),
    model=m(VP_NCSNPP, init_scale="0.0"))

add("vp/cifar10_ncsnpp_continuous.py", "cifar10",
    "configs/vp/cifar10_ncsnpp_continuous.py",
    training=dict(sde="'vpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True), model=VP_NCSNPP)

add("vp/cifar10_ncsnpp_deep_continuous.py", "cifar10",
    "configs/vp/cifar10_ncsnpp_deep_continuous.py",
    training=dict(sde="'vpsde'", continuous=True, reduce_mean=True,
                  n_iters=950001),
    sampling=PC_EM, data=dict(centered=True),
    model=m(VP_NCSNPP, num_res_blocks=8, init_scale="0.0"))

# --- VP DDPM legacy --------------------------------------------------------

VP_DDPM32 = m(DDPM_M, scale_by_sigma=False, ema_rate=0.9999,
              ch_mult="(1, 2, 2, 2)", num_res_blocks=2)
VP_DDPM_BIG = m(DDPM_M, scale_by_sigma=False, num_scales=1000,
                ema_rate=0.9999, ch_mult="(1, 1, 2, 2, 4, 4)",
                num_res_blocks=2)

add("vp/ddpm/cifar10.py", "cifar10", "configs/vp/ddpm/cifar10.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS, data=dict(centered=True), model=VP_DDPM32)

add("vp/ddpm/cifar10_continuous.py", "cifar10",
    "configs/vp/ddpm/cifar10_continuous.py",
    training=dict(sde="'vpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True), model=VP_DDPM32)

add("vp/ddpm/cifar10_unconditional.py", "cifar10",
    "configs/vp/ddpm/cifar10_unconditional.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS, data=dict(centered=True),
    model=m(VP_DDPM32, conditional=False))

add("vp/ddpm/bedroom.py", "lsun", "configs/vp/ddpm/bedroom.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS, data=dict(category="'bedroom'", centered=True),
    model=VP_DDPM_BIG, optim=dict(lr="2e-5"))

add("vp/ddpm/church.py", "lsun", "configs/vp/ddpm/church.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS, data=dict(category="'church_outdoor'", centered=True),
    model=VP_DDPM_BIG, optim=dict(lr="2e-5"))

add("vp/ddpm/celebahq.py", "lsun", "configs/vp/ddpm/celebahq.py",
    training=dict(sde="'vpsde'", continuous=False, reduce_mean=True),
    sampling=PC_AS,
    data=dict(dataset="'CelebAHQ'", centered=True, image_size=256,
              tfrecords_path="''"),
    model=VP_DDPM_BIG, optim=dict(lr="2e-5"))

# --- subVP -----------------------------------------------------------------

add("subvp/cifar10_ddpm_continuous.py", "cifar10",
    "configs/subvp/cifar10_ddpm_continuous.py",
    training=dict(sde="'subvpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True),
    model=m(DDPM_M, scale_by_sigma=False, ema_rate=0.9999,
            ch_mult="(1, 2, 2, 2)", num_res_blocks=2))

add("subvp/cifar10_ddpmpp_continuous.py", "cifar10",
    "configs/subvp/cifar10_ddpmpp_continuous.py",
    training=dict(sde="'subvpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True), model=VP_DDPMPP)

add("subvp/cifar10_ddpmpp_deep_continuous.py", "cifar10",
    "configs/subvp/cifar10_ddpmpp_deep_continuous.py",
    training=dict(sde="'subvpsde'", continuous=True, reduce_mean=True,
                  n_iters=950001),
    sampling=PC_EM, data=dict(centered=True),
    model=m(VP_DDPMPP, num_res_blocks=8))

add("subvp/cifar10_ncsnpp_continuous.py", "cifar10",
    "configs/subvp/cifar10_ncsnpp_continuous.py",
    training=dict(sde="'subvpsde'", continuous=True, reduce_mean=True),
    sampling=PC_EM, data=dict(centered=True), model=VP_NCSNPP)

add("subvp/cifar10_ncsnpp_deep_continuous.py", "cifar10",
    "configs/subvp/cifar10_ncsnpp_deep_continuous.py",
    training=dict(sde="'subvpsde'", continuous=True, reduce_mean=True,
                  n_iters=950001),
    sampling=PC_EM, data=dict(centered=True),
    model=m(VP_NCSNPP, num_res_blocks=8, init_scale="0.0"))


def emit():
  for path, base, ref, sections in CONFIGS:
    full = os.path.join(ROOT, path)
    os.makedirs(os.path.dirname(full), exist_ok=True)
    lines = [f'"""Hyperparameters of reference {ref} (declarative form)."""',
             "from score_sde_pytorch_tpu.configs.builder import declare",
             "", "get_config = declare(", f"    {base!r},"]
    for sec, values in sections.items():
      inner = ", ".join(f"{k}={fmt(v)}" for k, v in values.items())
      lines.append(f"    {sec}=dict({inner}),")
    lines.append(")")
    with open(full, "w") as f:
      f.write("\n".join(lines) + "\n")
  print(f"wrote {len(CONFIGS)} configs")


if __name__ == "__main__":
  emit()
